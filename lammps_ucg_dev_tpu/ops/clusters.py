"""Cluster pair lists — the data structure for the fused Pallas pair kernel.

Motivation (measured, see commit history): XLA gather costs ~4.2 ns per
INDEX on v5e regardless of fetch width, so per-pair attribute gathers put a
hard ~40 ns/pair floor on the XLA pair loop.  Grouping atoms into clusters of
``CL = 8`` consecutive cell-sorted rows turns per-pair random access into
per-cluster-pair CONTIGUOUS access (dynamic slices, not gathers), cutting
index counts by ~CL× for the list and enabling a Pallas kernel that reads
neighbor attributes with VMEM dynamic slices.

This is the GROMACS-style cluster (i-cluster × j-cluster) pairlist adapted to
TPU vector shapes: an i-cluster's 8 atoms map to sublanes, 16 j-clusters pack
into the 128-lane axis.

Built under jit at reneighbor cadence:
  1. atoms must be cell-sorted (SimConfig.sort_atoms)
  2. candidate j-clusters from the 27-cell stencil at cluster granularity
  3. pruned by cluster bounding spheres at distance cutoff + skin
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import Box, pytree_dataclass
from lammps_ucg_dev_tpu.ops import neighbor as nbrmod

CL = 8   # atoms per cluster (one vreg sublane dimension)


@pytree_dataclass(meta_fields=("kc",))
class ClusterList:
    """Pruned cluster pair list.

    jcl[i, k] = index of the k-th candidate j-cluster of i-cluster i
    (padded with n_clusters). Atom row r belongs to cluster r // CL."""

    jcl: jax.Array          # (n_icl, KC) int32
    x0: jax.Array           # positions at build time (displacement check)
    overflow: jax.Array     # () bool
    max_occupancy: jax.Array
    kc: int

    @property
    def n_clusters(self) -> int:
        return self.jcl.shape[0]


@dataclasses.dataclass(frozen=True)
class ClusterSpec:
    cutoff: float
    skin: float
    kc: int                  # max j-clusters per i-cluster
    cells_per_side: tuple
    cell_capacity: int       # in CLUSTERS per cell
    chunk: int = 2048

    @property
    def rc(self):
        return self.cutoff + self.skin


def make_spec(n_atoms: int, box_lengths, cutoff: float, skin: float = 0.4,
              kc: int | None = None, chunk: int = 2048) -> ClusterSpec:
    L = np.asarray(box_lengths, dtype=np.float64)
    rc = cutoff + skin
    cps = np.maximum(np.floor(L / rc).astype(int), 1)
    if np.any(cps < 3):
        raise ValueError("cluster list needs >= 3 cells per side")
    vol = float(np.prod(L))
    rho = n_atoms / vol
    cell_vol = float(np.prod(L / cps))
    mean_cl = rho * cell_vol / CL
    cell_cap = int(math.ceil(mean_cl + 4.0 * math.sqrt(max(mean_cl, 1.0)) + 3))
    if kc is None:
        # clusters whose bounding spheres reach within rc of the i-cluster
        # sphere: volume of (rc + 2*r_cl) ball in cluster units, with slack
        r_cl = 0.75 * (CL / rho) ** (1 / 3)
        vol_reach = 4.0 / 3.0 * math.pi * (rc + 2 * r_cl) ** 3
        kc = int(math.ceil(1.4 * rho * vol_reach / CL)) + 8
    return ClusterSpec(cutoff=cutoff, skin=skin, kc=kc,
                       cells_per_side=tuple(int(c) for c in cps),
                       cell_capacity=cell_cap, chunk=chunk)


def sort_order(x: jax.Array, box: Box, spec: ClusterSpec) -> jax.Array:
    """Cell-major atom ordering (the kernel's required layout)."""
    cps = np.asarray(spec.cells_per_side)
    cid, _ = nbrmod._cell_index(x, box, cps)
    return jnp.argsort(cid, stable=True).astype(jnp.int32)


def build(x: jax.Array, box: Box, spec: ClusterSpec) -> ClusterList:
    """Build the pruned cluster pair list over CELL-SORTED positions.

    Atom rows are grouped CL at a time (clusters may straddle a cell
    boundary; the bounding-sphere prune keeps the list correct regardless —
    cells only seed candidates, geometry decides)."""
    n = x.shape[0]
    if n % CL:
        raise ValueError(f"n_atoms must be a multiple of {CL}")
    n_icl = n // CL
    cps = np.asarray(spec.cells_per_side)
    ncells = int(np.prod(cps))
    CC = spec.cell_capacity
    KC = spec.kc

    xc = x.reshape(n_icl, CL, 3)
    center = jnp.mean(xc, axis=1)
    radius = jnp.sqrt(jnp.max(
        jnp.sum(box.min_image(xc - center[:, None, :]) ** 2, axis=-1), axis=1))

    # register clusters in cells by their center
    cid, c3 = nbrmod._cell_index(center, box, cps)
    order = jnp.argsort(cid, stable=True).astype(jnp.int32)
    sorted_cid = cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(n_icl, dtype=jnp.int32) - first.astype(jnp.int32)
    cell_overflow = jnp.max(rank) >= CC
    cell_cl = jnp.full((ncells, CC), n_icl, dtype=jnp.int32)
    cell_cl = cell_cl.at[sorted_cid, jnp.clip(rank, 0, CC - 1)].set(order)

    offs = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                     for k in (-1, 0, 1)], dtype=np.int64)
    rc = spec.rc
    cps_a = jnp.asarray(cps, jnp.int32)

    chunk = min(spec.chunk, n_icl)
    n_pad = int(-(-n_icl // chunk) * chunk)
    pad = n_pad - n_icl
    c3_p = jnp.pad(c3, ((0, pad), (0, 0)))
    ctr_p = jnp.pad(center, ((0, pad), (0, 0)))
    rad_p = jnp.pad(radius, (0, pad))
    self_p = jnp.pad(jnp.arange(n_icl, dtype=jnp.int32), (0, pad),
                     constant_values=n_icl)

    def per_chunk(args):
        c3_c, ctr_c, rad_c, self_c = args
        nc3 = (c3_c[:, None, :] + jnp.asarray(offs, jnp.int32)[None]) % cps_a
        ncid = (nc3[..., 0] * cps[1] + nc3[..., 1]) * cps[2] + nc3[..., 2]
        cand = cell_cl[ncid].reshape(c3_c.shape[0], 27 * CC)
        cc = jnp.clip(cand, 0, n_icl - 1)
        d = box.min_image(ctr_c[:, None, :] - center[cc])
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
        reach = rc + rad_c[:, None] + radius[cc]
        mask = (cand != n_icl) & (dist < reach)
        # keep self-cluster too (intra-cluster pairs handled by the kernel)
        return nbrmod._compact_topk(cand, mask, KC, n_icl)

    jcl_c, count_c = jax.lax.map(
        per_chunk,
        (c3_p.reshape(-1, chunk, 3), ctr_p.reshape(-1, chunk, 3),
         rad_p.reshape(-1, chunk), self_p.reshape(-1, chunk)),
    )
    jcl = jcl_c.reshape(n_pad, KC)[:n_icl]
    count = count_c.reshape(n_pad)[:n_icl]
    mx = jnp.max(count).astype(jnp.int32)
    return ClusterList(
        jcl=jcl.astype(jnp.int32),
        x0=x,
        overflow=cell_overflow | (mx > KC),
        max_occupancy=mx,
        kc=KC,
    )


def as_neighbor_list(cl: ClusterList, n_atoms: int) -> "nbrmod.NeighborList":
    """Expand the cluster list into a padded atom neighbor list (for reuse of
    the XLA pair styles and for validation).  Entry j==n_atoms padding; self
    is excluded by the pair kernels' i!=j masking via index compare."""
    n_icl = cl.n_clusters
    KC = cl.kc
    # atoms of j-cluster k: rows k*CL .. k*CL+CL-1
    base = jnp.where(cl.jcl < n_icl, cl.jcl * CL, n_atoms)    # (n_icl, KC)
    cols = base[:, :, None] + jnp.arange(CL, dtype=jnp.int32)[None, None, :]
    cols = jnp.where(base[:, :, None] < n_atoms, cols, n_atoms)
    idx_cl = cols.reshape(n_icl, KC * CL)
    idx = jnp.repeat(idx_cl, CL, axis=0)                      # (N, KC*CL)
    # mask self
    self_idx = jnp.arange(n_atoms, dtype=jnp.int32)[:, None]
    idx = jnp.where(idx == self_idx, n_atoms, idx)
    return nbrmod.NeighborList(
        idx=idx, x0=cl.x0, overflow=cl.overflow,
        max_occupancy=cl.max_occupancy * CL, capacity=KC * CL)
