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


@pytree_dataclass()
class UCGLDParams:
    bank: TableBank
    tp: UCGTypeParams
    kT: jax.Array      # scalar; pulled from the thermostat fix at init time
                       # (pair_table_ucgld.cpp:872-881)


def compute(state: SimState, nbr: NeighborList, params: UCGLDParams) -> ForceOut:
    x, typ, lam = state.x, state.typ, state.ucgl
    bank, tp = params.bank, params.tp
    n = x.shape[0]

    jc, valid, dr, rsq = common.pair_geometry(x, state.box, nbr)
    ti = typ[:, None]
    tj = typ[jc]
    within = valid & (rsq < tp.cutsq[ti, tj])

    e4, fp4, oob_lo, oob_hi = common.eval_state_block(bank, tp, ti, tj, rsq, within)

    wi = common.lambda_weights(tp, typ, lam)           # (N, 2)
    wj = wi[jc]                                        # (N, K, 2)

    fmix = common.mix(fp4, wi, wj)                     # (N, K)
    emix = common.mix(e4, wi, wj)

    f = jnp.sum(fmix[..., None] * dr, axis=1)
    pe = 0.5 * jnp.sum(emix)
    virial = common.pair_virial(fmix, dr)

    # λ-force: -Σ_j Σ_s' w_j[s'] (u[1,s'] - u[0,s']), plus the μ pre-pass
    is_ucg = tp.n_states[typ] > 1
    du = e4[..., 1, :] - e4[..., 0, :]                 # (N, K, 2)
    lamf = -jnp.einsum("nkt,nkt->n", wj, du)
    ucgforce = jnp.where(is_ucg, lamf - tp.mu_diff[typ], 0.0)

    # pseudolikelihood scores at current discrete neighbor states
    jstate = jnp.where(within, state.ucgstate[jc], 0)
    u_at_js = jnp.take_along_axis(
        e4, jstate[:, :, None, None].astype(jnp.int32), axis=3
    )[..., 0]                                          # (N, K, 2) over si
    scores = -jnp.sum(u_at_js, axis=1) / params.kT
    scores = scores.at[:, 1].add(-tp.mu_diff[typ] / params.kT)
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
    within = valid & (rsq < tp.cutsq[ti, tj])
    e4, _, _, _ = common.eval_state_block(bank, tp, ti, tj, rsq, within)
    wi = common.lambda_weights(tp, st.typ, lam)
    emix = common.mix(e4, wi, wi[jc])
    is_ucg = tp.n_states[st.typ] > 1
    e_mu = jnp.sum(jnp.where(is_ucg, lam * tp.mu_diff[st.typ], 0.0))
    return 0.5 * jnp.sum(emix) + e_mu
