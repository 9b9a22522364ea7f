"""Shared per-pair machinery for the UCG pair styles.

All four styles share the same skeleton: gather neighbor positions/types/state
from the padded full list, evaluate the 2×2 state-combination table block, and
mix with per-atom state weights.  The per-atom-owned (newton-off) formulation
means each directed pair (i, j) contributes only to atom i's tallies; summing
over the full list reproduces the reference's half-list + reverse-comm totals
exactly (SURVEY.md §2.3 "TPU-native equivalent").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core.state import Box
from lammps_ucg_dev_tpu.models.typemap import UCGTypeParams
from lammps_ucg_dev_tpu.ops.neighbor import NeighborList
from lammps_ucg_dev_tpu.ops.table import TableBank


def take2d(arr: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    """arr[i, j] for a small 2-D-indexed table via a single flat-index take.
    TPU-critical: two-axis advanced indexing lowers to a pathologically slow
    gather (~10× the flat take) — see TableBank docstring."""
    n1 = arr.shape[1]
    flat = arr.reshape((arr.shape[0] * n1,) + arr.shape[2:])
    return jnp.take(flat, i * n1 + j, axis=0)


def pair_geometry(x: jax.Array, box: Box, nbr: NeighborList):
    """Gather neighbor indices and displacements.

    Returns (j_clipped, valid_mask, dr, rsq) with shapes
    (N,K), (N,K), (N,K,3), (N,K). dr = x_i - x_j (minimum image).
    """
    n = x.shape[0]
    j = nbr.idx
    valid = j < n
    jc = jnp.where(valid, j, 0)
    xj = jnp.take(x, jc, axis=0)
    dr = box.min_image(x[:, None, :] - xj)
    rsq = jnp.sum(dr * dr, axis=-1)
    return jc, valid, dr, rsq


def eval_state_block(bank: TableBank, tp: UCGTypeParams, ti: jax.Array,
                     tj: jax.Array, rsq: jax.Array, within: jax.Array):
    """Evaluate the up-to-4 state-combination tables for every pair.

    ti: (N, 1) actual types of i (broadcast), tj: (N, K) of j.
    Returns (e4, fp4, oob_lo, oob_hi): e4/fp4 have shape (N, K, 2, 2) with
    axes [..., si, sj], zeroed outside ``within``.
    """
    t4 = take2d(tp.tab4, ti, tj)                        # (N, K, 2, 2)
    rsq4 = rsq[..., None, None]
    e4, fp4, lo, hi = bank.interp(t4, rsq4)
    w = within[..., None, None]
    e4 = jnp.where(w, e4, 0.0)
    fp4 = jnp.where(w, fp4, 0.0)
    oob_lo = jnp.sum(jnp.where(w, lo, False))
    oob_hi = jnp.sum(jnp.where(w, hi, False))
    return e4, fp4, oob_lo, oob_hi


def lambda_weights(tp: UCGTypeParams, typ: jax.Array, lam: jax.Array):
    """Per-atom state weights: [1-λ, λ] for UCG atoms, [1, 0] otherwise
    (unifies the reference's four per-pair scenarios,
    pair_table_ucgld.cpp:219-519)."""
    is_ucg = tp.n_states[typ] > 1
    w1 = jnp.where(is_ucg, lam, 0.0)
    return jnp.stack([1.0 - w1, w1], axis=-1)           # (N, 2)


def prob_weights(tp: UCGTypeParams, typ: jax.Array, p1: jax.Array):
    """Per-atom state weights from a probability-of-state-1 array."""
    is_ucg = tp.n_states[typ] > 1
    w1 = jnp.where(is_ucg, p1, 0.0)
    return jnp.stack([1.0 - w1, w1], axis=-1)


def mix(e4: jax.Array, wi: jax.Array, wj: jax.Array):
    """Σ_{si,sj} wi[si] wj[sj] e4[..., si, sj] → (N, K)."""
    return jnp.einsum("ns,nkt,nkst->nk", wi, wj, e4)


def pair_virial(fmix: jax.Array, dr: jax.Array):
    """Per-pair virial tensor components, full-list double counting halved.
    Order: xx yy zz xy xz yz (LAMMPS convention)."""
    w = 0.5 * fmix
    vxx = jnp.sum(w * dr[..., 0] * dr[..., 0])
    vyy = jnp.sum(w * dr[..., 1] * dr[..., 1])
    vzz = jnp.sum(w * dr[..., 2] * dr[..., 2])
    vxy = jnp.sum(w * dr[..., 0] * dr[..., 1])
    vxz = jnp.sum(w * dr[..., 0] * dr[..., 2])
    vyz = jnp.sum(w * dr[..., 1] * dr[..., 2])
    return jnp.stack([vxx, vyy, vzz, vxy, vxz, vyz])


def softmax_posterior(scores: jax.Array, is_ucg: jax.Array,
                      clip_lo: float = 1e-6):
    """ucgp = clamp(softmax(scores)[1]) as in FixUCGState::post_force
    (fix_ucgstate.cpp:105-111): exp clamp at 700, result clamped to
    [1e-6, 1-1e-6]; 1 for non-UCG atoms."""
    s = jnp.minimum(scores, 700.0)
    s = s - jnp.max(s, axis=-1, keepdims=True)  # stable; ratios unchanged
    ex = jnp.exp(s)
    p1 = ex[..., 1] / jnp.sum(ex, axis=-1)
    p1 = jnp.clip(p1, clip_lo, 1.0 - clip_lo)
    return jnp.where(is_ucg, p1, 1.0)


def map_row_chunks(fn, n: int, chunk: int, row_args: tuple):
    """Row-chunked evaluation for per-atom-owned pair passes.

    ``fn(row_args) -> (rowwise_tree, reduced_tree)`` where rowwise outputs
    have the chunk rows as leading dim and reduced outputs are summed across
    chunks.  Because every tally in this framework is per-atom-owned, row
    chunking is exact; it bounds peak memory at ``chunk × K`` intermediates
    (what makes 1M-bead single-chip runs fit in HBM)."""
    if chunk and n % chunk == 0 and n > chunk:
        nc = n // chunk
        shaped = tuple(a.reshape((nc, chunk) + a.shape[1:]) for a in row_args)
        rows, red = jax.lax.map(fn, shaped)
        rows = jax.tree_util.tree_map(
            lambda a: a.reshape((n,) + a.shape[2:]), rows)
        red = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), red)
        return rows, red
    return fn(row_args)
