"""``pair_style table_rleucg_interface`` — mean-field RLE-UCG with local-density
CV (the original Jin & Pak formulation; multi-state capable).

Physics (PairTable_RLEUCG_INTERFACE::compute,
/root/reference/UCG/pair_table_rleucg_interface.cpp:177-505), three phases:

1. density CV → substate probabilities (:231-276): atom types ARE substates;
   for multi-state actual types, p₀ = 0.5+0.5·tanh((ρ-ρ*)/0.1ρ*) with ∂p/∂ρ;
   the LAST substate's probability is implicit (1 - Σ others).
2. mean-field mixed pair forces Σ_αβ p_α p_β f_αβ applied per-atom-owned
   (:321-441, the reference itself only writes f[i]); one-body entropic
   (-kT ln p_s, + kT ln p_last) and chemical-potential forces (:296-317);
   two-body energy feedback into the probability force
   pf_s -= Σ_β p_β (u_sβ - u_{last,β}) (:427-435).
3. CV back-force pf·∂p/∂ρ distributed over density-contributing neighbors
   via w'(r)/r (:444-502).

Intentional deviations (catalogued; compat flags reproduce the literal code):
* ``feedback="always"`` (default): the two-body probability feedback fires for
  every directed pair.  The reference fires it ONLY for ghost-j pairs
  (:418-436), which makes the CV physics depend on the rank count and
  silently disables it entirely on a single rank; ``feedback="never"``
  reproduces that single-rank behavior.
* ``conservative_sign=True`` (default): the CV back-force uses
  dw/dr = -proximity_der so that F = -∇E exactly (verified against autodiff
  of the explicit mean-field functional in tests); False reproduces the
  reference's +proximity_der convention (:480).
* the threshold function takes per-type (ρ*, R) parameters (the reference
  hard-codes actual type 1, :92-99).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core.state import ForceOut, SimState, pytree_dataclass
from lammps_ucg_dev_tpu.models import common, density
from lammps_ucg_dev_tpu.ops.neighbor import NeighborList
from lammps_ucg_dev_tpu.ops.table import TableBank

_PEPS = 1e-12


@pytree_dataclass(meta_fields=("max_states", "feedback", "conservative_sign"))
class RLEUCGParams:
    bank: TableBank
    tabSS: jax.Array            # (S+1, S+1, Smax, Smax)
    cutsq: jax.Array            # (S+1, S+1)
    n_states: jax.Array         # (A+1,) per actual type
    actual_from_state: jax.Array  # (S+1,)
    use_entropy: jax.Array      # (A+1,)
    mu: jax.Array               # (S+1,) chemical potential per substate type
    cv_threshold: jax.Array     # (A+1,)
    threshold_radius: jax.Array  # (A+1,)
    kT: jax.Array
    max_states: int = 2
    feedback: str = "always"
    conservative_sign: bool = True


def make_params(builder, st, kT: float, feedback: str = "always",
                conservative_sign: bool = True, dtype=jnp.float32) -> RLEUCGParams:
    bank, tabSS, cutsq = builder.build(dtype=dtype)
    return RLEUCGParams(
        bank=bank, tabSS=tabSS, cutsq=cutsq,
        n_states=jnp.asarray(st.n_states_per_type, jnp.int32),
        actual_from_state=jnp.asarray(st.actual_from_formal, jnp.int32),
        use_entropy=jnp.asarray(st.use_entropy, jnp.int32),
        mu=jnp.asarray(st.chemical_potentials, dtype),
        cv_threshold=jnp.asarray(st.cv_thresholds, dtype),
        threshold_radius=jnp.asarray(st.threshold_radii, dtype),
        kT=jnp.asarray(kT, dtype),
        max_states=int(st.max_states), feedback=feedback,
        conservative_sign=conservative_sign,
    )


def substate_probs(params: RLEUCGParams, typ: jax.Array, rho: jax.Array):
    """(probs (N, Smax), partial (N, Smax)) with implicit last state."""
    Smax = params.max_states
    act = params.actual_from_state[typ]
    ns = params.n_states[act]                              # (N,)
    p_thr, partial_thr = density.threshold_prob_and_partial(
        rho, jnp.maximum(params.cv_threshold[act], _PEPS))

    s = jnp.arange(Smax, dtype=jnp.int32)[None, :]
    multi = (ns > 1)[:, None]
    explicit = (s < (ns - 1)[:, None]) & multi
    last = s == (ns - 1)[:, None]

    # only substate 0 has an explicit (threshold) probability (:270)
    pexp = jnp.where((s == 0) & explicit, p_thr[:, None], 0.0)
    sum_exp = jnp.sum(pexp, axis=1, keepdims=True)
    probs = jnp.where(explicit, pexp, jnp.where(last, 1.0 - sum_exp, 0.0))
    probs = jnp.where(multi, probs, jnp.where(s == 0, 1.0, 0.0))
    partial = jnp.where((s == 0) & explicit, partial_thr[:, None], 0.0)
    return probs, partial


def compute(state: SimState, nbr: NeighborList, params: RLEUCGParams) -> ForceOut:
    x, typ = state.x, state.typ
    bank = params.bank
    kT = params.kT
    Smax = params.max_states

    jc, valid, dr, rsq = common.pair_geometry(x, state.box, nbr)
    ti = typ[:, None]
    tj = typ[jc]
    within = valid & (rsq < common.take2d(params.cutsq, ti, tj))
    r = jnp.sqrt(jnp.where(within, rsq, 1.0))

    act = params.actual_from_state[typ]
    ns = params.n_states[act]
    radius = jnp.maximum(params.threshold_radius[act], _PEPS)

    # ---- phase 1: density -> substate probabilities -----------------------
    w_prox = jnp.where(within, density.proximity(r, radius[:, None]), 0.0)
    rho = jnp.sum(w_prox, axis=1)
    probs, partial = substate_probs(params, typ, rho)      # (N, Smax)

    # ---- phase 2: mean-field mixed forces + probability forces ------------
    tSS = common.take2d(params.tabSS, ti, tj)                 # (N, K, Smax, Smax)
    eS, fpS, lo, hi = bank.interp(tSS, rsq[..., None, None])
    w = within[..., None, None]
    eS = jnp.where(w, eS, 0.0)
    fpS = jnp.where(w, fpS, 0.0)
    oob_lo = jnp.sum(jnp.where(w, lo, False))
    oob_hi = jnp.sum(jnp.where(w, hi, False))

    wA = probs
    wB = probs[jc]                                         # (N, K, Smax)
    fmix = jnp.einsum("ns,nkt,nkst->nk", wA, wB, fpS)
    emix = jnp.einsum("ns,nkt,nkst->nk", wA, wB, eS)

    f = jnp.sum(fmix[..., None] * dr, axis=1)
    pe = 0.5 * jnp.sum(emix)
    virial = common.pair_virial(fmix, dr)

    s_idx = jnp.arange(Smax, dtype=jnp.int32)[None, :]
    multi = (ns > 1)[:, None]
    explicit = (s_idx < (ns - 1)[:, None]) & multi

    # one-body probability forces (:296-317)
    ent = (params.use_entropy[act] == 1)[:, None] & multi
    logp = jnp.log(jnp.maximum(probs, _PEPS))
    p_last = jnp.take_along_axis(probs, jnp.maximum(ns - 1, 0)[:, None], axis=1)
    log_plast = jnp.log(jnp.maximum(p_last, _PEPS))
    mu_s = params.mu[jnp.minimum(typ[:, None] + s_idx, params.mu.shape[0] - 1)]
    pforce = jnp.where(explicit,
                       -mu_s + jnp.where(ent, -kT * logp + kT * log_plast, 0.0),
                       0.0)

    # two-body energy feedback (:427-435), intended: every directed pair
    if params.feedback == "always":
        ub = jnp.einsum("nkt,nkst->nks", wB, eS)           # Σ_β p_β u_sβ
        u_last = jnp.take_along_axis(
            ub, jnp.broadcast_to(jnp.maximum(ns - 1, 0)[:, None, None],
                                 (ub.shape[0], ub.shape[1], 1)), axis=2)[..., 0]
        fb = -(ub - u_last[..., None])                     # (N, K, Smax)
        pforce = pforce + jnp.where(explicit[:, None, :],
                                    jnp.where(within[..., None], fb, 0.0),
                                    0.0).sum(axis=1)
    elif params.feedback != "never":
        raise ValueError(f"unknown feedback mode {params.feedback!r}")

    # ---- phase 3: CV back-force (:444-502) --------------------------------
    cvf = jnp.sum(pforce * partial, axis=-1)               # (N,)
    sign = -1.0 if params.conservative_sign else 1.0
    g_i = sign * density.proximity_der(r, radius[:, None])
    g_j = sign * density.proximity_der(r, radius[jc])
    fcv_pair = jnp.where(within, cvf[:, None] * g_i + cvf[jc] * g_j, 0.0) / r
    f = f + jnp.sum(fcv_pair[..., None] * dr, axis=1)
    virial = virial + common.pair_virial(fcv_pair, dr)

    zeros = jnp.zeros_like(rho)
    return ForceOut(
        f=f, ucgforce=zeros, scores=jnp.zeros((x.shape[0], 2), x.dtype),
        pe=pe, virial=virial, oob_low=oob_lo, oob_high=oob_hi,
    )


def potential_energy(x: jax.Array, state: SimState, nbr: NeighborList,
                     params: RLEUCGParams) -> jax.Array:
    """Explicit mean-field free-energy functional E(x) — pair mixing +
    chemical potential + entropy — differentiable through ρ(x) → p(ρ).
    Used by tests to verify F_total = -∇E (pair + CV chain rule)."""
    st = state
    jc, valid, dr, rsq = common.pair_geometry(x, st.box, nbr)
    ti, tj = st.typ[:, None], st.typ[jc]
    within = valid & (rsq < common.take2d(params.cutsq, ti, tj))
    r = jnp.sqrt(jnp.where(within, rsq, 1.0))
    act = params.actual_from_state[st.typ]
    ns = params.n_states[act]
    radius = jnp.maximum(params.threshold_radius[act], _PEPS)
    w_prox = jnp.where(within, density.proximity(r, radius[:, None]), 0.0)
    rho = jnp.sum(w_prox, axis=1)
    probs, _ = substate_probs(params, st.typ, rho)

    tSS = common.take2d(params.tabSS, ti, tj)
    eS, _, _, _ = params.bank.interp(tSS, rsq[..., None, None])
    eS = jnp.where(within[..., None, None], eS, 0.0)
    emix = jnp.einsum("ns,nkt,nkst->nk", probs, probs[jc], eS)

    Smax = params.max_states
    s_idx = jnp.arange(Smax, dtype=jnp.int32)[None, :]
    multi = (ns > 1)[:, None]
    state_mask = (s_idx < ns[:, None]) & multi
    ent = (params.use_entropy[act] == 1)[:, None]
    logp = jnp.log(jnp.maximum(probs, _PEPS))
    mu_s = params.mu[jnp.minimum(st.typ[:, None] + s_idx, params.mu.shape[0] - 1)]
    explicit = (s_idx < (ns - 1)[:, None]) & multi
    e_one = jnp.sum(jnp.where(explicit, mu_s * probs, 0.0)) + params.kT * jnp.sum(
        jnp.where(state_mask & ent, probs * logp, 0.0))
    return 0.5 * jnp.sum(emix) + e_one
