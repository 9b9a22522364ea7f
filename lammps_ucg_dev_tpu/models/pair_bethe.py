"""``pair_style table_ucg_bethe`` — self-consistent two-state UCG with the
Bethe (pair) approximation.

Physics (PairTable_UCG_Bethe::compute, /root/reference/UCG/pair_table_ucg_bethe.cpp:88-630):

* per-atom priors: from the previous step's self-consistent probabilities
  (pi1 = ucgl_i for the i-role, pj1 = ucgp_j for the j-role, :199-253) or, on
  the first evaluation (``ucgp < -0.999`` sentinel), from chemical potentials
  (± uniform noise) or ucgl, per the ``prior`` flag (:179-253).
* closed-form Bethe two-point distribution (:544-581):
      J   = u11 + u00 - u01 - u10
      b   = exp(-J/kT),  a = expm1(-J/kT)
      Q   = (pi1 + pj1) a + 1
      D   = max(Q² - 4 a b pi1 pj1, 0)
      p11 = 2 b pi1 pj1 / (Q + √D)     (or (Q-√D)/2a if Q<0; pi1·pj1 if |a|<ε
                                        or ``method mf``)
      p00 = 1 + p11 - pi1 - pj1 ;  p10 = pi1 - p11 ;  p01 = pj1 - p11
* mixed energy/force = Σ p_ss' u_ss' (:603-604); no dU/dp force term because
  p11 satisfies the variational principle (:510-511 analog).
* softmax scores: chemical-potential init (:155-162); pseudolikelihood tallies
  at current discrete states (``pseudo yes``, :526-539) or full-SCE conditional
  expectations (``pseudo no``, :583-601).
* overflow guard: J/kT < -709 → clamp to -700 kT (:545-548).

TPU-native notes:
* The Bethe closed form degenerates exactly to the reference's scenarios 1-3
  when either partner is single-state (prior weight [1, 0] ⇒ p11 = p10 = 0),
  so the whole pair loop is ONE vectorized kernel — no scenario branching.
* Full-list per-atom-owned tallies (each directed pair contributes to i only);
  equal to the half-list + reverse-comm totals whenever ucgl == ucgp, which
  fix ucgstate enforces every step (transient first-step orderings differ at
  the level of the reference's arbitrary pair ordering).

Intentional deviations (catalogued, SURVEY.md §7.4): scenario-2 stale-``si``
stash fixed (:373-374); the full-SCE conditional expectations use the correct
u-pairing score_i[s] -= Σ_s' p(s'|s) u(s,s')/kT (the reference's coefficient
pairing at :585-599 mixes conditionals across states).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core.state import ForceOut, SimState, pytree_dataclass
from lammps_ucg_dev_tpu.models import common
from lammps_ucg_dev_tpu.models.typemap import UCGTypeParams
from lammps_ucg_dev_tpu.ops.neighbor import NeighborList
from lammps_ucg_dev_tpu.ops.table import TableBank

_EPSILONE = 1.0e-6
_PEPS = 1.0e-12


@pytree_dataclass(meta_fields=("method", "pseudo", "prior_mode", "chunk"))
class BetheParams:
    bank: TableBank
    tp: UCGTypeParams
    kT: jax.Array
    prior_ptype: jax.Array     # (T+1, 2) Boltzmann priors from chem potentials
                               # (init_style, :1056-1077)
    noise_level: jax.Array     # scalar
    method: str = "bethe"      # "bethe" | "mf"
    pseudo: bool = True        # pseudolikelihood vs full-SCE scores
    prior_mode: str = "ucgl"   # "ucgl" | "chemical_potential" | "chemical_potential_noise"
    chunk: int = 0             # row-chunk size for the pair loop (0 = unchunked)
    cheb: "object | None" = None   # ChebBank for the fused Pallas kernel
                                   # path (ops/pallas_pair.py); None = XLA


def make_params(bank: TableBank, tp: UCGTypeParams, kT: float,
                method: str = "bethe", pseudo: bool = True,
                prior_mode: str = "ucgl", noise_level: float = 0.0,
                dtype=jnp.float32) -> BetheParams:
    """Precompute per-type Boltzmann priors (init_style, :1056-1077)."""
    mu0 = tp.mu[tp.formal[:, 0]]
    mu1 = tp.mu[tp.formal[:, 1]]
    e0 = jnp.exp(-mu0 / kT)
    e1 = jnp.exp(-mu1 / kT)
    p0 = jnp.where(tp.n_states > 1, e0 / (e0 + e1), 1.0)
    prior_ptype = jnp.stack([p0, 1.0 - p0], axis=-1).astype(dtype)
    return BetheParams(
        bank=bank, tp=tp, kT=jnp.asarray(kT, dtype),
        prior_ptype=prior_ptype, noise_level=jnp.asarray(noise_level, dtype),
        method=method, pseudo=pseudo, prior_mode=prior_mode,
    )


def _priors(state: SimState, params: BetheParams):
    """(prior_i1, prior_j1): P(state=1) for the i-role (from ucgl) and the
    j-role (from ucgp); sentinel atoms use the prior flag (:179-253)."""
    tp = params.tp
    typ = state.typ
    is_ucg = tp.n_states[typ] > 1
    unassigned = state.ucgp < -0.999

    if params.prior_mode == "chemical_potential":
        p1_flag = params.prior_ptype[typ, 1]
    elif params.prior_mode == "chemical_potential_noise":
        key = jax.random.fold_in(state.key, 0x5EED)
        u = jnp.take(jax.random.uniform(key, (state.rng_n,),
                                        dtype=state.ucgl.dtype),
                     state.tag - 1)
        noise = (u - 0.5) * 2.0 * params.noise_level
        p0 = jnp.clip(params.prior_ptype[typ, 0] + noise, 0.0, 0.999999)
        p1_flag = 1.0 - p0
    elif params.prior_mode == "ucgl":
        p1_flag = state.ucgl
    else:
        raise ValueError(f"unknown prior mode {params.prior_mode!r}")

    pi1 = jnp.where(unassigned, p1_flag, state.ucgl)
    pj1 = jnp.where(unassigned, p1_flag, state.ucgp)
    pi1 = jnp.where(is_ucg, pi1, 0.0)
    pj1 = jnp.where(is_ucg, pj1, 0.0)
    return pi1, pj1


def bethe_pij(u4: jax.Array, pi1: jax.Array, pj1: jax.Array, kT,
              method: str = "bethe"):
    """Closed-form Bethe two-point distribution (:544-581).

    u4: (..., 2, 2) state-pair energies; pi1/pj1 broadcastable to u4[..., 0, 0].
    Returns p4 (..., 2, 2) with axes [si, sj].
    """
    J = u4[..., 1, 1] + u4[..., 0, 0] - u4[..., 0, 1] - u4[..., 1, 0]
    J = jnp.maximum(J, -700.0 * kT)                    # overflow guard (:545-548)
    x = -J / kT
    b = jnp.exp(x)
    a = jnp.expm1(x)

    if method == "mf":
        p11 = pi1 * pj1
    else:
        Q = (pi1 + pj1) * a + 1.0
        D = jnp.maximum(Q * Q - 4.0 * a * b * pi1 * pj1, 0.0)
        sqD = jnp.sqrt(D)
        # numerically-stable root selection (:564-577)
        root_pos = 2.0 * b * pi1 * pj1 / (Q + sqD)
        root_neg = (Q - sqD) / (2.0 * jnp.where(jnp.abs(a) < _EPSILONE, 1.0, a))
        p11 = jnp.where(Q < 0.0, root_neg, root_pos)
        p11 = jnp.where(jnp.abs(a) < _EPSILONE, pi1 * pj1, p11)

    p00 = 1.0 + p11 - pi1 - pj1
    p10 = pi1 - p11
    p01 = pj1 - p11
    return jnp.stack(
        [jnp.stack([p00, p01], axis=-1), jnp.stack([p10, p11], axis=-1)],
        axis=-2,
    )


def bethe_log_ratio(J, pi1, pj1, kT, method: str = "bethe"):
    """Numerically stable log(p11/p01) of the Bethe two-point distribution.

    The naive form log(p11/(pj1-p11)) is catastrophically ill-conditioned as
    p01 = pj1 - p11 -> 0 (strongly correlated pairs) — measured f32 error up
    to ~80%% of the P3 prior-force max on a dense fluid (PARITY 3b).  This
    evaluates the ratio from the closed-form root directly: with
    b = e^{-J/kT}, the exact identities

        E := Q - 2 b pi1 = b (pj1 - pi1) + (1 - pi1 - pj1)
        D  = E^2 + 4 b pi1 (1 - pi1)          (sum of positives!)
        p11/p01 = 2 b pi1 / (E + sqrt(D))                    [E >= 0]
                = (sqrt(D) - E) / (2 (1 - pi1))              [E <  0]

    carry no cancellation anywhere (the E<0 branch is the rationalized
    form).  At J -> 0 both reduce exactly to the mean-field pi1/(1-pi1).
    Large |J|: the x >= 0 regime evaluates scaled by 1/b so b^2 never
    overflows (works at the reference's J > -700 kT clamp even in f32).
    """
    if method == "mf":
        return (jnp.log(jnp.maximum(pi1, _PEPS))
                - jnp.log(jnp.maximum(1.0 - pi1, _PEPS)))
    x = jnp.minimum(-J / kT, 700.0)
    e1 = pj1 - pi1
    e0 = 1.0 - pi1 - pj1
    c4 = 4.0 * pi1 * (1.0 - pi1)
    t = jnp.exp(-jnp.abs(x))                      # e^{-|x|} in (0, 1]
    # x >= 0 regime (b >= 1): all quantities scaled by 1/b
    Es = e1 + e0 * t
    Ds = jnp.sqrt(jnp.maximum(Es * Es + c4 * t, 0.0))
    lr_pos = jnp.where(
        Es >= 0.0,
        jnp.log(jnp.maximum(2.0 * pi1, _PEPS))
        - jnp.log(jnp.maximum(Es + Ds, _PEPS)),
        x + jnp.log(jnp.maximum(Ds - Es, _PEPS))
        - jnp.log(jnp.maximum(2.0 * (1.0 - pi1), _PEPS)))
    # x < 0 regime (b = t <= 1): unscaled
    Eu = e1 * t + e0
    Du = jnp.sqrt(jnp.maximum(Eu * Eu + c4 * t, 0.0))
    lr_neg = jnp.where(
        Eu >= 0.0,
        x + jnp.log(jnp.maximum(2.0 * pi1, _PEPS))
        - jnp.log(jnp.maximum(Eu + Du, _PEPS)),
        jnp.log(jnp.maximum(Du - Eu, _PEPS))
        - jnp.log(jnp.maximum(2.0 * (1.0 - pi1), _PEPS)))
    return jnp.where(x >= 0.0, lr_pos, lr_neg)


def compute(state: SimState, nbr: NeighborList, params: BetheParams) -> ForceOut:
    x, typ = state.x, state.typ
    bank, tp = params.bank, params.tp
    box = state.box
    n = x.shape[0]
    kT = params.kT

    pi1_all, pj1_all = _priors(state, params)
    is_ucg = tp.n_states[typ] > 1
    ucgstate = state.ucgstate

    fast = bool(bank.uniform) and tp.pair_pack is not None
    if fast:
        # gather-minimal path (see pair_ucgld): 3 row-gathers per pair
        ntypes1 = tp.cutsq.shape[0]
        single_type = ntypes1 == 2
        NT = bank.n_tables
        L = bank.nbins
        atompack = jnp.concatenate([
            x,
            pj1_all[:, None],
            ucgstate.astype(x.dtype)[:, None],
            typ.astype(x.dtype)[:, None],
            is_ucg.astype(x.dtype)[:, None],
        ], axis=1)                                          # (N, 7)
        inn0 = bank.innersq[0]
        invd0 = bank.invdelta[0]

    def rows(args):
        idx_r, xi, ti_r, pi1_r = args
        valid = idx_r < n
        jc = jnp.where(valid, idx_r, 0)

        if fast:
            jrow = jnp.take(atompack, jc, axis=0)
            xj = jrow[..., :3]
            dr = box.min_image(xi[:, None, :] - xj)
            rsq = jnp.sum(dr * dr, axis=-1)
            pj1_j = jrow[..., 3]
            jstate = jrow[..., 4] > 0.5
            is_ucg_j = jrow[..., 6] > 0.5
            if single_type:
                prow = jnp.broadcast_to(
                    tp.pair_pack[3][None, None, :],
                    rsq.shape + (tp.pair_pack.shape[1],))
            else:
                tj = jrow[..., 5].astype(jnp.int32)
                ptype = ti_r[:, None] * ntypes1 + tj
                prow = jnp.take(tp.pair_pack, ptype, axis=0)
            within = valid & (rsq < prow[..., 0])

            xbin = (rsq - inn0) * invd0
            it = jnp.clip(xbin.astype(jnp.int32), 0, L - 2)
            frac = (xbin - it.astype(xbin.dtype))[..., None]
            trow = jnp.take(bank.upacked, it, axis=0)
            trow = trow.reshape(trow.shape[:-1] + (NT, 4))
            e_all = trow[..., 0] + frac * trow[..., 1]
            f_all = trow[..., 2] + frac * trow[..., 3]
            oh = prow[..., 1:].reshape(prow.shape[:-1] + (4, NT))
            e4 = jnp.einsum("nkct,nkt->nkc", oh, e_all)
            fp4 = jnp.einsum("nkct,nkt->nkc", oh, f_all)
            e4 = e4.reshape(e4.shape[:-1] + (2, 2))
            fp4 = fp4.reshape(fp4.shape[:-1] + (2, 2))
            w4 = within[..., None, None]
            e4 = jnp.where(w4, e4, 0.0)
            fp4 = jnp.where(w4, fp4, 0.0)
            oob_lo = jnp.sum(jnp.where(within, rsq < inn0, False))
            oob_hi = jnp.sum(jnp.where(within, xbin >= (L - 1), False))
        else:
            xj = jnp.take(x, jc, axis=0)
            dr = box.min_image(xi[:, None, :] - xj)
            rsq = jnp.sum(dr * dr, axis=-1)
            ti = ti_r[:, None]
            tj = typ[jc]
            within = valid & (rsq < common.take2d(tp.cutsq, ti, tj))
            e4, fp4, oob_lo, oob_hi = common.eval_state_block(
                bank, tp, ti, tj, rsq, within)
            pj1_j = pj1_all[jc]
            jstate = jnp.where(within, ucgstate[jc] > 0, False)
            is_ucg_j = tp.n_states[tj] > 1

        pj1_j = jnp.where(within, pj1_j, 0.0)
        p4 = bethe_pij(e4, pi1_r[:, None], pj1_j, kT, params.method)
        p4 = jnp.where(within[..., None, None], p4, 0.0)

        emix = jnp.sum(p4 * e4, axis=(-1, -2))
        fmix = jnp.sum(p4 * fp4, axis=(-1, -2))

        f_r = jnp.sum(fmix[..., None] * dr, axis=1)
        pe_r = 0.5 * jnp.sum(emix)
        vir_r = common.pair_virial(fmix, dr)

        if params.pseudo:
            # pseudolikelihood at current discrete neighbor states (:526-539);
            # UCG-nonUCG pairs use jstate = 0, identical to the reference's
            # ungated scenario-3 tallies (:443-447)
            u_at_js = jnp.where(jstate[..., None], e4[..., :, 1], e4[..., :, 0])
            pair_scores = -u_at_js / kT
        else:
            # full-SCE: score_i[s] -= Σ_s' p(s'|s) u(s, s') / kT for UCG-UCG
            # pairs (:583-601, intended conditional pairing); scenario-3 style
            # pseudolikelihood tallies for UCG-nonUCG pairs (:443-447)
            pi = jnp.stack([1.0 - pi1_r, pi1_r], axis=-1)[:, None, :, None]
            cond = p4 / jnp.maximum(pi, _EPSILONE)      # p(sj | si)
            sce = -jnp.sum(cond * e4, axis=3) / kT      # (rows, K, 2)
            plain = -e4[..., 0] / kT                    # partner single-state
            pair_scores = jnp.where((is_ucg_j & within)[..., None], sce, plain)

        scores_r = jnp.sum(jnp.where(within[..., None], pair_scores, 0.0), axis=1)
        return f_r, scores_r, pe_r, vir_r, oob_lo, oob_hi

    chunk = params.chunk
    if chunk and n % chunk == 0 and n > chunk:
        nc = n // chunk
        f, scores, pe_c, vir_c, lo_c, hi_c = jax.lax.map(
            rows,
            (nbr.idx.reshape(nc, chunk, -1), x.reshape(nc, chunk, 3),
             typ.reshape(nc, chunk), pi1_all.reshape(nc, chunk)),
        )
        f = f.reshape(n, 3)
        scores = scores.reshape(n, 2)
        pe = jnp.sum(pe_c)
        virial = jnp.sum(vir_c, axis=0)
        oob_lo = jnp.sum(lo_c)
        oob_hi = jnp.sum(hi_c)
    else:
        f, scores, pe, virial, oob_lo, oob_hi = rows(
            (nbr.idx, x, typ, pi1_all))

    # chemical-potential initialization (:155-162)
    mu_i = params.tp.mu[tp.formal[typ]]                 # (N, 2)
    scores = scores - mu_i / kT
    scores = jnp.where(is_ucg[:, None], scores, 0.0)

    return ForceOut(
        f=f, ucgforce=jnp.zeros_like(pi1_all), scores=scores, pe=pe,
        virial=virial, oob_low=oob_lo, oob_high=oob_hi,
    )
