"""``pair_style table_ucgld`` — λ-dynamics UCG tabulated pair style.

Physics (PairTable_UCGLD::compute, /root/reference/UCG/pair_table_ucgld.cpp:111-541):

* mixed pair energy/force over state combinations with λ weights
  ``w_i = [1-λ_i, λ_i]``:
      E_ij = Σ_{s,s'} w_i[s] w_j[s'] u_ss'(r)          (:507-509)
* λ-forces (−dU/dλ):
      ucgf_i -= λ_j (u11-u01) + (1-λ_j)(u10-u00)       (:514-517)
* pseudolikelihood softmax scores at the CURRENT discrete states:
      score_i[s] -= u_{s, state_j}(r) / kT             (:492-502)
* chemical-potential pre-pass per UCG atom:
      ucgf_i -= μ1-μ0 ;  score_i[1] -= (μ1-μ0)/kT      (:170-180)

TPU-native formulation: full neighbor list, per-atom-owned tallies.  The
four reference scenarios collapse into one vectorized expression because
non-UCG atoms get weight [1, 0] and state 0 (see models/common.py).  Summing
our directed-pair tallies over the full list equals the reference's half-list
+ newton-on + reverse-comm totals.

Because every tally is per-atom-owned (no scatter), the pair loop is
row-parallel: with ``params.chunk > 0`` the (N, K) work is evaluated in row
chunks under ``lax.map``, bounding peak memory at
``chunk × K × 4 × (e,f)`` — this is what makes 1M-bead single-chip runs fit
in HBM.

Intentional deviation from reference (catalogued, SURVEY.md §7.4): the
reference's scenario 2 stashes u00/u01 keyed on a stale ``si`` (:330-331);
we implement the intended sj-keyed mixing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core.state import Box, ForceOut, SimState, pytree_dataclass
from lammps_ucg_dev_tpu.models import common
from lammps_ucg_dev_tpu.models.typemap import UCGTypeParams
from lammps_ucg_dev_tpu.ops.neighbor import NeighborList
from lammps_ucg_dev_tpu.ops.table import TableBank


@pytree_dataclass(meta_fields=("chunk",))
class UCGLDParams:
    bank: TableBank
    tp: UCGTypeParams
    kT: jax.Array      # scalar; pulled from the thermostat fix at init time
                       # (pair_table_ucgld.cpp:872-881)
    chunk: int = 0     # row-chunk size for the pair loop (0 = unchunked)
    cheb: "object | None" = None   # ChebBank for the fused Pallas kernel path
                                   # (ops/pallas_pair.py); None = XLA path


def compute(state: SimState, nbr: NeighborList, params: UCGLDParams) -> ForceOut:
    x, typ, lam = state.x, state.typ, state.ucgl
    bank, tp = params.bank, params.tp
    box = state.box
    n = x.shape[0]
    kT = params.kT

    wi_all = common.lambda_weights(tp, typ, lam)            # (N, 2)
    is_ucg = tp.n_states[typ] > 1
    ucgstate = state.ucgstate

    fast = bool(bank.uniform) and tp.pair_pack is not None
    if fast:
        # gather-minimal path: 3 row-gathers per pair (atom row, table row,
        # pair-type row) instead of ~9 elementwise gathers — TPU gathers cost
        # ~4 ns/INDEX regardless of row width, so packing contiguous rows is
        # the dominant optimization (see TableBank docstring).  For
        # single-type systems the pair-type row is a CONSTANT: 2 gathers.
        ntypes1 = tp.cutsq.shape[0]
        single_type = ntypes1 == 2   # types are 1-based; (T+1) == 2
        NT = bank.n_tables
        L = bank.nbins
        atompack = jnp.concatenate([
            x,
            wi_all[:, 1:2],
            ucgstate.astype(x.dtype)[:, None],
            typ.astype(x.dtype)[:, None],
        ], axis=1)                                          # (N, 6)
        inn0 = bank.innersq[0]
        invd0 = bank.invdelta[0]

    def rows(args):
        """Per-row-block pair evaluation; everything per-atom-owned."""
        idx_r, xi, ti_r, wi_r = args
        valid = idx_r < n
        jc = jnp.where(valid, idx_r, 0)

        if fast:
            jrow = jnp.take(atompack, jc, axis=0)           # (rows, K, 6)
            xj = jrow[..., :3]
            dr = box.min_image(xi[:, None, :] - xj)
            rsq = jnp.sum(dr * dr, axis=-1)
            w1j = jrow[..., 3]
            jstate_f = jrow[..., 4]
            if single_type:
                prow = jnp.broadcast_to(
                    tp.pair_pack[3][None, None, :],
                    rsq.shape + (tp.pair_pack.shape[1],))
            else:
                tj = jrow[..., 5].astype(jnp.int32)
                ptype = ti_r[:, None] * ntypes1 + tj
                prow = jnp.take(tp.pair_pack, ptype, axis=0)  # (rows,K,1+4NT)
            within = valid & (rsq < prow[..., 0])

            xbin = (rsq - inn0) * invd0
            it = jnp.clip(xbin.astype(jnp.int32), 0, L - 2)
            frac = (xbin - it.astype(xbin.dtype))[..., None]
            trow = jnp.take(bank.upacked, it, axis=0)       # (rows, K, NT*4)
            trow = trow.reshape(trow.shape[:-1] + (NT, 4))
            e_all = trow[..., 0] + frac * trow[..., 1]      # (rows, K, NT)
            f_all = trow[..., 2] + frac * trow[..., 3]
            oh = prow[..., 1:].reshape(prow.shape[:-1] + (4, NT))
            e4 = jnp.einsum("nkct,nkt->nkc", oh, e_all)
            fp4 = jnp.einsum("nkct,nkt->nkc", oh, f_all)
            e4 = e4.reshape(e4.shape[:-1] + (2, 2))
            fp4 = fp4.reshape(fp4.shape[:-1] + (2, 2))
            lo = rsq < inn0
            hi = xbin >= (L - 1)
            w4 = within[..., None, None]
            e4 = jnp.where(w4, e4, 0.0)
            fp4 = jnp.where(w4, fp4, 0.0)
            wj = jnp.stack([1.0 - w1j, w1j], axis=-1)       # (rows, K, 2)
            jstate = jnp.where(within, jstate_f > 0.5, False)
            oob_lo = jnp.sum(jnp.where(within, lo, False))
            oob_hi = jnp.sum(jnp.where(within, hi, False))
        else:
            xj = jnp.take(x, jc, axis=0)
            dr = box.min_image(xi[:, None, :] - xj)
            rsq = jnp.sum(dr * dr, axis=-1)
            ti = ti_r[:, None]
            tj = typ[jc]
            within = valid & (rsq < common.take2d(tp.cutsq, ti, tj))

            t4 = common.take2d(tp.tab4, ti, tj)
            e4, fp4, lo, hi = bank.interp(t4, rsq[..., None, None])
            w4 = within[..., None, None]
            e4 = jnp.where(w4, e4, 0.0)
            fp4 = jnp.where(w4, fp4, 0.0)
            wj = wi_all[jc]                                 # (rows, K, 2)
            jstate = jnp.where(within, ucgstate[jc] > 0, False)
            oob_lo = jnp.sum(jnp.where(w4, lo, False))
            oob_hi = jnp.sum(jnp.where(w4, hi, False))

        fmix = common.mix(fp4, wi_r, wj)
        emix = common.mix(e4, wi_r, wj)

        f_r = jnp.sum(fmix[..., None] * dr, axis=1)
        pe_r = 0.5 * jnp.sum(emix)
        vir_r = common.pair_virial(fmix, dr)

        du = e4[..., 1, :] - e4[..., 0, :]                  # (rows, K, 2)
        lamf_r = -jnp.einsum("nkt,nkt->n", wj, du)

        # pseudolikelihood tallies at the partner's current discrete state
        u_at_js = jnp.where(jstate[..., None], e4[..., :, 1], e4[..., :, 0])
        scores_r = -jnp.sum(u_at_js, axis=1) / kT

        return f_r, lamf_r, scores_r, pe_r, vir_r, oob_lo, oob_hi

    chunk = params.chunk
    if chunk and n % chunk == 0 and n > chunk:
        nc = n // chunk
        f, lamf, scores, pe_c, vir_c, lo_c, hi_c = jax.lax.map(
            rows,
            (nbr.idx.reshape(nc, chunk, -1), x.reshape(nc, chunk, 3),
             typ.reshape(nc, chunk), wi_all.reshape(nc, chunk, 2)),
        )
        f = f.reshape(n, 3)
        lamf = lamf.reshape(n)
        scores = scores.reshape(n, 2)
        pe = jnp.sum(pe_c)
        virial = jnp.sum(vir_c, axis=0)
        oob_lo = jnp.sum(lo_c)
        oob_hi = jnp.sum(hi_c)
    else:
        f, lamf, scores, pe, virial, oob_lo, oob_hi = rows(
            (nbr.idx, x, typ, wi_all))

    ucgforce = jnp.where(is_ucg, lamf - tp.mu_diff[typ], 0.0)
    scores = scores.at[:, 1].add(-tp.mu_diff[typ] / kT)
    scores = jnp.where(is_ucg[:, None], scores, 0.0)

    return ForceOut(
        f=f,
        ucgforce=ucgforce,
        scores=scores,
        pe=pe,
        virial=virial,
        oob_low=oob_lo,
        oob_high=oob_hi,
    )


def potential_energy(x: jax.Array, lam: jax.Array, state: SimState,
                     nbr: NeighborList, params: UCGLDParams) -> jax.Array:
    """Mixed potential energy as a function of (x, λ) — used by tests to
    verify f = -∂E/∂x and ucgforce = -∂E/∂λ by autodiff, and for the λ
    chemical-potential term E_mu = Σ_i λ_i (μ1-μ0)."""
    st = state
    box: Box = st.box
    bank, tp = params.bank, params.tp
    jc, valid, dr, rsq = common.pair_geometry(x, box, nbr)
    ti, tj = st.typ[:, None], st.typ[jc]
    within = valid & (rsq < common.take2d(tp.cutsq, ti, tj))
    e4, _, _, _ = common.eval_state_block(bank, tp, ti, tj, rsq, within)
    wi = common.lambda_weights(tp, st.typ, lam)
    emix = common.mix(e4, wi, wi[jc])
    is_ucg = tp.n_states[st.typ] > 1
    e_mu = jnp.sum(jnp.where(is_ucg, lam * tp.mu_diff[st.typ], 0.0))
    return 0.5 * jnp.sum(emix) + e_mu
