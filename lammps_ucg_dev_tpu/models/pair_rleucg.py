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


@pytree_dataclass(meta_fields=("max_states", "feedback", "conservative_sign",
                               "chunk"))
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
    chunk: int = 0                  # row-chunk size (0 = unchunked)
    cheb: "object | None" = None    # ChebBank for the fused Pallas kernel
                                    # path (ops/pallas_pair.py); None = XLA


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


def compute(state: SimState, nbr: NeighborList, params: RLEUCGParams,
            xchg=None) -> ForceOut:
    """``xchg`` (optional): halo exchange of per-atom derived quantities
    between phases — the TPU-native analogue of the reference's
    ``comm->forward_comm(this)`` of (prob, partial, force) per substate
    (pair_table_rleucg_interface.cpp:277-278, pack/unpack :104-160).  A
    spatial slab driver passes a callable replacing ghost rows with owner
    values; applied to ρ after phase 1 and the CV force after phase 2
    (ghost values computed locally would see truncated neighborhoods).
    None = single-domain (identity)."""
    if xchg is None:
        xchg = lambda a: a
    x, typ = state.x, state.typ
    bank = params.bank
    kT = params.kT
    Smax = params.max_states
    n = x.shape[0]
    chunk = params.chunk
    idx = nbr.idx

    act = params.actual_from_state[typ]
    ns = params.n_states[act]
    radius_all = jnp.maximum(params.threshold_radius[act], _PEPS)

    def geom(idx_r, xi):
        valid = idx_r < n
        jc = jnp.where(valid, idx_r, 0)
        xj = jnp.take(x, jc, axis=0)
        dr = state.box.min_image(xi[:, None, :] - xj)
        rsq = jnp.sum(dr * dr, axis=-1)
        return jc, valid, dr, rsq

    # ---- phase 1 (chunked): density -> substate probabilities -------------
    def pass1(args):
        idx_r, xi, ti_r, rad_r = args
        jc, valid, dr, rsq = geom(idx_r, xi)
        within = valid & (rsq < common.take2d(params.cutsq, ti_r[:, None],
                                              typ[jc]))
        r = jnp.sqrt(jnp.where(within, rsq, 1.0))
        w_prox = jnp.where(within, density.proximity(r, rad_r[:, None]), 0.0)
        return (jnp.sum(w_prox, axis=1),), ()

    (rho,), _ = common.map_row_chunks(pass1, n, chunk,
                                      (idx, x, typ, radius_all))
    rho = xchg(rho)
    probs_all, partial = substate_probs(params, typ, rho)  # (N, Smax)

    # ---- phase 2 (chunked): mean-field forces + probability feedback ------
    s_idx = jnp.arange(Smax, dtype=jnp.int32)[None, :]
    multi = (ns > 1)[:, None]
    explicit_all = (s_idx < (ns - 1)[:, None]) & multi

    # one-body probability forces (:296-317)
    ent = (params.use_entropy[act] == 1)[:, None] & multi
    logp = jnp.log(jnp.maximum(probs_all, _PEPS))
    p_last = jnp.take_along_axis(probs_all, jnp.maximum(ns - 1, 0)[:, None],
                                 axis=1)
    log_plast = jnp.log(jnp.maximum(p_last, _PEPS))
    mu_s = params.mu[jnp.minimum(typ[:, None] + s_idx, params.mu.shape[0] - 1)]
    pforce_one = jnp.where(
        explicit_all,
        -mu_s + jnp.where(ent, -kT * logp + kT * log_plast, 0.0), 0.0)

    def pass2(args):
        idx_r, xi, ti_raw, wA, explicit_r, nslast_r = args
        ti = ti_raw[:, None]
        jc, valid, dr, rsq = geom(idx_r, xi)
        tj = typ[jc]
        within = valid & (rsq < common.take2d(params.cutsq, ti, tj))
        tSS = common.take2d(params.tabSS, ti, tj)   # (rows, K, Smax, Smax)
        eS, fpS, lo, hi = bank.interp(tSS, rsq[..., None, None])
        w = within[..., None, None]
        eS = jnp.where(w, eS, 0.0)
        fpS = jnp.where(w, fpS, 0.0)
        oob_lo = jnp.sum(jnp.where(w, lo, False))
        oob_hi = jnp.sum(jnp.where(w, hi, False))

        wB = probs_all[jc]                                  # (rows, K, Smax)
        fmix = jnp.einsum("ns,nkt,nkst->nk", wA, wB, fpS)
        emix = jnp.einsum("ns,nkt,nkst->nk", wA, wB, eS)
        f_r = jnp.sum(fmix[..., None] * dr, axis=1)
        pe_r = 0.5 * jnp.sum(emix)
        vir_r = common.pair_virial(fmix, dr)

        pf_r = jnp.zeros(wA.shape, wA.dtype)
        if params.feedback == "always":
            # two-body energy feedback (:427-435): every directed pair
            ub = jnp.einsum("nkt,nkst->nks", wB, eS)        # Σ_β p_β u_sβ
            u_last = jnp.take_along_axis(
                ub, jnp.broadcast_to(nslast_r[:, None, None],
                                     (ub.shape[0], ub.shape[1], 1)),
                axis=2)[..., 0]
            fb = -(ub - u_last[..., None])                  # (rows, K, Smax)
            pf_r = jnp.where(explicit_r[:, None, :],
                             jnp.where(within[..., None], fb, 0.0),
                             0.0).sum(axis=1)
        elif params.feedback != "never":
            raise ValueError(f"unknown feedback mode {params.feedback!r}")
        return (f_r, pf_r), (pe_r, vir_r, oob_lo, oob_hi)

    (f, pforce_fb), (pe, virial, oob_lo, oob_hi) = common.map_row_chunks(
        pass2, n, chunk,
        (idx, x, typ, probs_all, explicit_all, jnp.maximum(ns - 1, 0)))
    pforce = pforce_one + pforce_fb

    # ---- phase 3 (chunked): CV back-force (:444-502) -----------------------
    cvf_all = xchg(jnp.sum(pforce * partial, axis=-1))      # (N,)
    sign = -1.0 if params.conservative_sign else 1.0

    def pass3(args):
        idx_r, xi, ti_r, cvf_r, rad_r = args
        jc, valid, dr, rsq = geom(idx_r, xi)
        within = valid & (rsq < common.take2d(params.cutsq, ti_r[:, None],
                                              typ[jc]))
        r = jnp.sqrt(jnp.where(within, rsq, 1.0))
        g_i = sign * density.proximity_der(r, rad_r[:, None])
        g_j = sign * density.proximity_der(r, radius_all[jc])
        fcv_pair = jnp.where(
            within, cvf_r[:, None] * g_i + cvf_all[jc] * g_j, 0.0) / r
        fcv_r = jnp.sum(fcv_pair[..., None] * dr, axis=1)
        return (fcv_r,), (common.pair_virial(fcv_pair, dr),)

    (fcv,), (vir_cv,) = common.map_row_chunks(
        pass3, n, chunk, (idx, x, typ, cvf_all, radius_all))

    zeros = jnp.zeros_like(rho)
    return ForceOut(
        f=f + fcv, ucgforce=zeros, scores=jnp.zeros((n, 2), x.dtype),
        pe=pe, virial=virial + vir_cv, oob_low=oob_lo, oob_high=oob_hi,
    )


compute.supports_halo_xchg = True


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
