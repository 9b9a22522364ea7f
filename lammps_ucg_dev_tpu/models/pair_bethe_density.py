"""``pair_style table_ucg_bethe_density`` — Bethe UCG with local-density CV
priors and entropic back-forces.

Physics (PairTable_UCG_Bethe_Density::compute,
/root/reference/UCG/pair_table_ucg_bethe_density.cpp:133-758), three phases:

1. Per-atom local density ρ_i = Σ_j w(r_ij) within the pair cutoff
   (:219-255); priors for density-CV types from the sigmoid threshold
   p1 = 0.5 + 0.5 tanh((ρ-ρ*)/0.1ρ*) and its ∂p/∂ρ; chemical-potential
   Boltzmann priors for non-density UCG types (:257-270).

   NOTE state ordering: the reference assigns the threshold value to
   ``prior_prob[i][0]`` (:251) — i.e. the probability of the FIRST listed
   state grows with density — and the complement to state 1.

2. Pair mixing by the Bethe two-point distribution over the density priors
   (:528-658), with per-state "prior-probability force" accumulators:
     one-body (density types only, :302-314):
        entropy: pf_s -= kT ln(p_s) · (1 - n_i)
        pf_s -= μ_s ;  score_s -= μ_s / kT
     UCG-CG pairs (:514-518):  pf_0 -= u00 + kT ln p_0 ; pf_1 -= u10 + kT ln p_1
     UCG-UCG pairs (:650-656): pf_0 -= (u10-u00 + kT ln(p10/p00))
                               pf_1 -= (u11-u01 + kT ln(p11/p01))
   plus pseudolikelihood score tallies and the fused posterior update
   ucgp = softmax(scores)[1] (:669-696).

3. CV back-force: F = Σ_j (cvf_i g(r) + cvf_j g(r)) (x_i-x_j)/r with
   cvf = Σ_s pf_s · ∂p_s/∂ρ (:698-733).

Intentional deviations (catalogued, SURVEY.md §7.4 — each gated by a compat
flag where meaningful):
* ``backforce_derivative=True`` (default): use dw/dr = -proximity_der in the
  back-force chain rule (the correct gradient, as P4 does at
  pair_table_rleucg_interface.cpp:480); False reproduces the reference's
  w(r)/r form (:719).  The sign convention is fixed by the autodiff check in
  tests (F_cv must be the exact CV chain-rule part of -∇F_Bethe).
* the one-body entropy factor uses the REAL within-cutoff neighbor count
  (the reference uses the padded neighbor-list length ``numneigh``, :289,
  which is skin- and rebuild-cadence-dependent; it computes ``real_jnum``
  but never uses it, :244).
* CG-CG pair energies are counted once (the reference tallies them twice,
  :395-407: full evdwl per directed visit with no 0.5).
* posterior softmax indexes n_states by TYPE (the reference's
  ``n_states_per_type[i]`` atom-index bug, :679).
* the Bethe root here keeps the guards of P2 (J clamp, Q<0 branch, D clamp);
  the reference's P3 copy drops them (:608-619).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core.state import ForceOut, SimState, pytree_dataclass
from lammps_ucg_dev_tpu.models import common, density
from lammps_ucg_dev_tpu.models.pair_bethe import bethe_pij
from lammps_ucg_dev_tpu.models.typemap import UCGTypeParams
from lammps_ucg_dev_tpu.ops.neighbor import NeighborList
from lammps_ucg_dev_tpu.ops.table import TableBank

_PEPS = 1e-12


@pytree_dataclass(meta_fields=("method", "backforce_derivative", "pair_cv",
                               "chunk"))
class BetheDensityParams:
    bank: TableBank
    tp: UCGTypeParams
    kT: jax.Array
    method: str = "bethe"
    backforce_derivative: bool = True
    pair_cv: str = "conservative"   # "conservative" | "reference"
    chunk: int = 0                  # row-chunk size (0 = unchunked)
    cheb: "object | None" = None    # ChebBank for the fused Pallas kernel
                                    # path (ops/pallas_pair.py); None = XLA


def make_params(bank: TableBank, tp: UCGTypeParams, kT: float,
                method: str = "bethe", backforce_derivative: bool = True,
                pair_cv: str = "conservative",
                dtype=jnp.float32) -> BetheDensityParams:
    return BetheDensityParams(bank=bank, tp=tp, kT=jnp.asarray(kT, dtype),
                              method=method,
                              backforce_derivative=backforce_derivative,
                              pair_cv=pair_cv)


def _priors(params: BetheDensityParams, typ, rho):
    """(prior (N,2) with [p0, p1], partial0 (N,)) — threshold priors for
    density types; Boltzmann for chemical-potential types; [1,0] otherwise.
    p0 is the threshold value (grows with density), partial = ∂p0/∂ρ."""
    tp = params.tp
    is_ucg = tp.n_states[typ] > 1
    use_den = (tp.use_density[typ] == 1) & is_ucg

    p_thr, partial_thr = density.threshold_prob_and_partial(
        rho, jnp.maximum(tp.cv_threshold[typ], _PEPS))

    mu0 = tp.mu[tp.formal[typ, 0]]
    mu1 = tp.mu[tp.formal[typ, 1]]
    b0 = jnp.exp(-mu0 / params.kT)
    b1 = jnp.exp(-mu1 / params.kT)
    p_cp0 = b0 / (b0 + b1)

    p0 = jnp.where(use_den, p_thr, jnp.where(is_ucg, p_cp0, 1.0))
    partial0 = jnp.where(use_den, partial_thr, 0.0)
    return jnp.stack([p0, 1.0 - p0], axis=-1), partial0


def compute(state: SimState, nbr: NeighborList,
            params: BetheDensityParams, xchg=None) -> ForceOut:
    """``xchg`` (optional): halo exchange of per-atom derived quantities —
    the analogue of the reference's phase-boundary ``comm->forward_comm``
    (P4 does it at pair_table_rleucg_interface.cpp:277-278; P3's is a no-op
    bug, SURVEY.md §7.4).  A spatial slab driver passes a callable that
    replaces ghost rows with the owner's values; it is applied to ρ after
    phase 1 (ghost densities computed locally see truncated neighborhoods)
    and to the CV force after phase 2 (ghost cv forces additionally embed
    pair sums needing 2·rc of context).  None = single-domain (identity).

    Precision note (measured, 8k fluid at ρ=0.6): the prior-force term
    kT·log(p11/p01) is catastrophically ill-conditioned as p01 = pj1 − p11
    → 0 (strongly correlated pairs) — in f32 THIS XLA PATH differs from
    its own f64 run by up to ~80% of the force max on most rows; the
    trajectory impact stays small because the term enters the CV force
    through the small ∂p/∂ρ factor (cvf shifts ~0.7%).  Reference decks
    that need strict P3 prior forces should run f64 (this path); the f32
    fused kernel carries the same intrinsic envelope."""
    if xchg is None:
        xchg = lambda a: a
    x, typ = state.x, state.typ
    bank, tp = params.bank, params.tp
    kT = params.kT
    n = x.shape[0]
    chunk = params.chunk
    idx = nbr.idx

    is_ucg = tp.n_states[typ] > 1
    use_den = (tp.use_density[typ] == 1) & is_ucg
    use_ent = (tp.use_entropy[typ] == 1)
    radius_all = jnp.maximum(tp.threshold_radius[typ], _PEPS)

    def geom(idx_r, xi):
        valid = idx_r < n
        jc = jnp.where(valid, idx_r, 0)
        xj = jnp.take(x, jc, axis=0)
        dr = state.box.min_image(xi[:, None, :] - xj)
        rsq = jnp.sum(dr * dr, axis=-1)
        return jc, valid, dr, rsq

    # ---- phase 1 (chunked): density --------------------------------------
    def pass1(args):
        idx_r, xi, ti_r, rad_r = args
        jc, valid, dr, rsq = geom(idx_r, xi)
        within = valid & (rsq < common.take2d(tp.cutsq, ti_r[:, None], typ[jc]))
        r = jnp.sqrt(jnp.where(within, rsq, 1.0))
        w_prox = jnp.where(within, density.proximity(r, rad_r[:, None]), 0.0)
        return (jnp.sum(w_prox, axis=1), jnp.sum(within, axis=1)), ()

    (rho, n_real), _ = common.map_row_chunks(
        pass1, n, chunk, (idx, x, typ, radius_all))
    rho = xchg(rho)

    prior, partial0 = _priors(params, typ, rho)       # (N,2), (N,)
    pi1_all = prior[:, 1]
    logp_all = jnp.log(jnp.maximum(prior, _PEPS))     # (N, 2)

    # one-body terms (:302-314), density types only
    mu_i = tp.mu[tp.formal[typ]]                      # (N, 2)
    one_body = -mu_i - jnp.where(
        (use_ent & use_den)[:, None],
        kT * logp_all * (1.0 - n_real.astype(logp_all.dtype))[:, None], 0.0)

    # ---- phase 2 (chunked): Bethe-mixed forces + prior-force accumulators -
    def pass2(args):
        idx_r, xi, ti_raw, pi1_r, logp_r = args
        ti = ti_raw[:, None]
        jc, valid, dr, rsq = geom(idx_r, xi)
        tj = typ[jc]
        within = valid & (rsq < common.take2d(tp.cutsq, ti, tj))
        e4, fp4, oob_lo, oob_hi = common.eval_state_block(
            bank, tp, ti, tj, rsq, within)
        pj1 = pi1_all[jc]
        p4 = bethe_pij(e4, pi1_r[:, None], pj1, kT, params.method)
        p4 = jnp.where(within[..., None, None], p4, 0.0)

        emix = jnp.sum(p4 * e4, axis=(-1, -2))
        fmix = jnp.sum(p4 * fp4, axis=(-1, -2))
        f_r = jnp.sum(fmix[..., None] * dr, axis=1)
        pe_r = 0.5 * jnp.sum(emix)
        vir_r = common.pair_virial(fmix, dr)
        is_ucg_j = (tp.n_states[tj] > 1) & within
        logp = logp_r

    # pair accumulators
    #   CG partner (:514-518): pf_s -= u_{s0} + kT ln p_s  — this is exactly
    #   -∂F_pair/∂p_s of the Bethe functional, so the literal form is already
    #   conservative for UCG-CG pairs.
    #   UCG partner (:650-656): the reference accumulates
    #     pf_0 -= (u10-u00 + kT ln(p10/p00)),  pf_1 -= (u11-u01 + kT ln(p11/p01))
    #   but at the Bethe optimum these two expressions are EQUAL (both are
    #   ∂F_pair/∂p_i1 along the two feasible directions; the consistency
    #   identity p11 p00/(p10 p01) = e^{-J/kT} makes their difference vanish),
    #   so coupling them with ∂p0/∂ρ = -∂p1/∂ρ cancels the UCG-UCG CV force
    #   identically — the reference's own comment at :654 shows this was not
    #   realized.  "conservative" (default) keeps the single reduced
    #   derivative in the state-1 slot so that F = -∇F_Bethe exactly;
    #   "reference" transcribes the literal (self-cancelling) pair.
        # stable log(p11/p01) from the closed-form root (bethe_log_ratio):
        # the naive log-diff of p4 entries loses up to ~80% of the force
        # max in f32 as p01 -> 0 (PARITY 3b) — resolved round 4
        J = (e4[..., 1, 1] + e4[..., 0, 0]
             - e4[..., 0, 1] - e4[..., 1, 0])
        from lammps_ucg_dev_tpu.models.pair_bethe import bethe_log_ratio

        lr = bethe_log_ratio(jnp.where(within, J, 0.0), pi1_r[:, None],
                             pj1, kT, params.method)
        pf_pair_ucg1 = -(e4[..., 1, 1] - e4[..., 0, 1] + kT * lr)
        if params.pair_cv == "reference":
            logp4 = jnp.log(jnp.maximum(p4, _PEPS))
            pf_pair_ucg0 = -(e4[..., 1, 0] - e4[..., 0, 0]
                             + kT * (logp4[..., 1, 0] - logp4[..., 0, 0]))
        elif params.pair_cv == "conservative":
            pf_pair_ucg0 = jnp.zeros_like(pf_pair_ucg1)
        else:
            raise ValueError(f"unknown pair_cv mode {params.pair_cv!r}")
        pf_pair_cg0 = -(e4[..., 0, 0] + kT * logp[:, None, 0])
        pf_pair_cg1 = -(e4[..., 1, 0] + kT * logp[:, None, 1])

        pf0 = jnp.where(is_ucg_j, pf_pair_ucg0, pf_pair_cg0)
        pf1 = jnp.where(is_ucg_j, pf_pair_ucg1, pf_pair_cg1)
        uden_r = (tp.use_density[ti_raw] == 1) & (tp.n_states[ti_raw] > 1)
        gate = within & uden_r[:, None]
        pf_r = jnp.stack([
            jnp.sum(jnp.where(gate, pf0, 0.0), axis=1),
            jnp.sum(jnp.where(gate, pf1, 0.0), axis=1),
        ], axis=-1)

        # pseudolikelihood scores (:488,597-603)
        jstate = jnp.where(within, state.ucgstate[jc] > 0, False)
        u_at_js = jnp.where(jstate[..., None], e4[..., :, 1], e4[..., :, 0])
        scores_r = -jnp.sum(u_at_js, axis=1) / kT
        return (f_r, pf_r, scores_r), (pe_r, vir_r, oob_lo, oob_hi)

    (f, pforce, scores), (pe, virial, oob_lo, oob_hi) = common.map_row_chunks(
        pass2, n, chunk, (idx, x, typ, pi1_all, logp_all))

    pforce = pforce + jnp.where(use_den[:, None], one_body, 0.0)
    scores = scores - jnp.where(use_den[:, None], mu_i / kT, 0.0)
    scores = jnp.where(is_ucg[:, None], scores, 0.0)
    ucgp = common.softmax_posterior(scores, is_ucg)

    # ---- phase 3 (chunked): CV back-force (:698-733) -----------------------
    # pforce index s couples through ∂p_s/∂ρ with ∂p1/∂ρ = -∂p0/∂ρ = -partial0
    # under the reference's [0]-is-threshold ordering (:251-254).
    partial = jnp.stack([partial0, -partial0], axis=-1)
    cvf_all = jnp.sum(pforce * partial, axis=-1)      # (N,)
    cvf_all = xchg(jnp.where(use_den, cvf_all, 0.0))

    def pass3(args):
        idx_r, xi, ti_r, cvf_r, rad_r = args
        jc, valid, dr, rsq = geom(idx_r, xi)
        within = valid & (rsq < common.take2d(tp.cutsq, ti_r[:, None], typ[jc]))
        r = jnp.sqrt(jnp.where(within, rsq, 1.0))
        if params.backforce_derivative:
            # correct chain rule: dρ/dx_i uses dw/dr = -proximity_der
            g_i = -density.proximity_der(r, rad_r[:, None])
            g_j = -density.proximity_der(r, radius_all[jc])
        else:
            # reference-literal w(r)/r form (:719), positive convention
            g_i = density.proximity(r, rad_r[:, None])
            g_j = density.proximity(r, radius_all[jc])
        fcv_pair = jnp.where(
            within, cvf_r[:, None] * g_i + cvf_all[jc] * g_j, 0.0) / r
        fcv_r = jnp.sum(fcv_pair[..., None] * dr, axis=1)
        return (fcv_r,), (common.pair_virial(fcv_pair, dr),)

    (fcv,), (vir_cv,) = common.map_row_chunks(
        pass3, n, chunk, (idx, x, typ, cvf_all, radius_all))

    return ForceOut(
        f=f + fcv, ucgforce=jnp.zeros_like(rho), scores=scores, pe=pe,
        virial=virial + vir_cv, ucgp=ucgp, oob_low=oob_lo, oob_high=oob_hi,
    )


compute.supports_halo_xchg = True
