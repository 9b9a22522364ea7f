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


def compute(state: SimState, nbr: NeighborList, params: UCGLDParams) -> ForceOut:
    x, typ, lam = state.x, state.typ, state.ucgl
    bank, tp = params.bank, params.tp
    box = state.box
    n = x.shape[0]
    kT = params.kT

    wi_all = common.lambda_weights(tp, typ, lam)            # (N, 2)
    is_ucg = tp.n_states[typ] > 1
    ucgstate = state.ucgstate

    def rows(args):
        """Per-row-block pair evaluation; everything per-atom-owned."""
        idx_r, xi, ti_r, wi_r = args
        valid = idx_r < n
        jc = jnp.where(valid, idx_r, 0)
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

        wj = wi_all[jc]                                     # (rows, K, 2)
        fmix = common.mix(fp4, wi_r, wj)
        emix = common.mix(e4, wi_r, wj)

        f_r = jnp.sum(fmix[..., None] * dr, axis=1)
        pe_r = 0.5 * jnp.sum(emix)
        vir_r = common.pair_virial(fmix, dr)

        du = e4[..., 1, :] - e4[..., 0, :]                  # (rows, K, 2)
        lamf_r = -jnp.einsum("nkt,nkt->n", wj, du)

        jstate = jnp.where(within, ucgstate[jc], 0)
        u_at_js = jnp.take_along_axis(
            e4, jstate[:, :, None, None].astype(jnp.int32), axis=3
        )[..., 0]                                           # (rows, K, 2)
        scores_r = -jnp.sum(u_at_js, axis=1) / kT

        oob_lo = jnp.sum(jnp.where(w4, lo, False))
        oob_hi = jnp.sum(jnp.where(w4, hi, False))
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
