"""Tests for the density-CV styles: P3 (table_ucg_bethe_density) and
P4 (table_rleucg_interface).

The load-bearing check is conservativity: with the corrected back-force
(derivative chain rule, conservative sign) the TOTAL force must equal -∇E of
the explicit free-energy functional — pair mixing + chemical potential +
entropy — autodiffed through ρ(x) → p(ρ) → pij.  This pins every sign and
index convention at once.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
from lammps_ucg_dev_tpu.models import (density, pair_bethe, pair_bethe_density,
                                       pair_rleucg)
from lammps_ucg_dev_tpu.models.typemap import RLEUCGBuilder, TablePairBuilder
from lammps_ucg_dev_tpu.ops import neighbor as nb

KT = 0.8
RC = 2.5

P3_SETTINGS = """2 3 2
1 1
2 2
2 3 density entropy
6.0 1.5
0.0 0.2
"""

P3_SETTINGS_NOENT = P3_SETTINGS.replace("entropy", "no_entropy")

P4_SETTINGS = """2 3
2 density use_entropy
5.0 1.5
0.4
1 density no_entropy
"""


def _p3_build(settings_text, dtype=jnp.float64):
    st = parse_state_settings(settings_text, "bethe_density")
    b = TablePairBuilder("linear", 3000, st)
    mk = lambda e: (helpers.make_soft_table(e, RC, n=3000), RC)
    b.pair_coeff(1, 1, 1, 1, [mk(1.0)])
    b.pair_coeff(1, 2, 1, 2, [mk(0.8), mk(0.5)])
    b.pair_coeff(2, 2, 2, 2, [mk(0.9), mk(0.55), mk(0.55), mk(0.3)])
    bank, tp = b.build(dtype=dtype)
    return st, bank, tp


def _p4_build(dtype=jnp.float64):
    st = parse_state_settings(P4_SETTINGS, "rleucg")
    b = RLEUCGBuilder("linear", 3000, st)
    mk = lambda e: helpers.make_soft_table(e, RC, n=3000)
    # substate types: 1, 2 (states of actual 1), 3 (actual 2)
    b.pair_coeff(1, 1, mk(1.0), RC)
    b.pair_coeff(1, 2, mk(0.7), RC)
    b.pair_coeff(1, 3, mk(0.8), RC)
    b.pair_coeff(2, 2, mk(0.4), RC)
    b.pair_coeff(2, 3, mk(0.5), RC)
    b.pair_coeff(3, 3, mk(0.9), RC)
    return st, b


def _fluid_state(rng, n, L, types, dtype=jnp.float64):
    x = helpers.random_fluid(rng, n, L)
    box = Box.create([0, 0, 0], [L, L, L], dtype=dtype)
    return SimState.create(
        x=x, typ=types, ucgstate=rng.integers(0, 2, n),
        ucgl=rng.uniform(0.2, 0.8, n), box=box, dtype=dtype)


# ---------------------------------------------------------------------------
# P4
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("feedback", ["always", "never"])
def test_p4_force_is_minus_grad(rng, feedback):
    st, b = _p4_build()
    n, L = 40, 7.0
    # base substate types: 1 (2-state actual) or 3 (1-state actual)
    types = np.where(rng.uniform(size=n) < 0.7, 1, 3).astype(np.int32)
    state = _fluid_state(rng, n, L, types)
    spec = nb.make_spec(n, [L] * 3, RC, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    params = pair_rleucg.make_params(b, st, KT, feedback=feedback,
                                     dtype=jnp.float64)
    out = jax.jit(pair_rleucg.compute)(state, nbr, params)
    assert int(out.oob_low) == 0 and int(out.oob_high) == 0

    if feedback == "always":
        # total force (pair + CV back-force) == -dE/dx of the explicit
        # mean-field functional
        grad = jax.grad(
            lambda x: pair_rleucg.potential_energy(x, state, nbr, params)
        )(state.x)
        np.testing.assert_allclose(np.asarray(out.f), -np.asarray(grad),
                                   atol=2e-3, rtol=1e-3)
    # momentum conservation either way
    np.testing.assert_allclose(np.asarray(jnp.sum(out.f, axis=0)),
                               np.zeros(3), atol=1e-10)


def test_p4_compat_flags_change_answer(rng):
    st, b = _p4_build()
    n, L = 30, 6.5
    types = np.where(rng.uniform(size=n) < 0.7, 1, 3).astype(np.int32)
    state = _fluid_state(rng, n, L, types)
    spec = nb.make_spec(n, [L] * 3, RC, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    p_default = pair_rleucg.make_params(b, st, KT, dtype=jnp.float64)
    p_literal = dataclasses.replace(p_default, feedback="never",
                                    conservative_sign=False)
    f0 = pair_rleucg.compute(state, nbr, p_default).f
    f1 = pair_rleucg.compute(state, nbr, p_literal).f
    assert not np.allclose(np.asarray(f0), np.asarray(f1))


@pytest.mark.quick
def test_p4_substate_probs_multistate():
    """3-state actual type: explicit p0 from threshold, middle state 0,
    last implicit."""
    text = "1 3\n3 density no_entropy\n4.0 1.2\n0.1 0.2\n"
    st = parse_state_settings(text, "rleucg")
    params_ns = jnp.asarray(st.n_states_per_type, jnp.int32)
    assert st.max_states == 3
    # direct check of the probability builder
    b = RLEUCGBuilder("linear", 500, st)
    mk = lambda e: helpers.make_soft_table(e, RC, n=600)
    b.pair_coeff("*", "*", mk(0.5), RC)
    params = pair_rleucg.make_params(b, st, KT, dtype=jnp.float64)
    typ = jnp.asarray([1, 1], jnp.int32)
    rho = jnp.asarray([4.0, 8.0], jnp.float64)
    probs, partial = pair_rleucg.substate_probs(params, typ, rho)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=1)), 1.0, atol=1e-12)
    p_thr = 0.5 + 0.5 * np.tanh((np.asarray(rho) - 4.0) / 0.4)
    np.testing.assert_allclose(np.asarray(probs[:, 0]), p_thr, atol=1e-12)
    np.testing.assert_allclose(np.asarray(probs[:, 1]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(probs[:, 2]), 1 - p_thr, atol=1e-12)


# ---------------------------------------------------------------------------
# P3
# ---------------------------------------------------------------------------

def _p3_free_energy(x, state, nbr, params, n_real_fixed):
    """Explicit Bethe free-energy functional for P3 (density priors):
    F = Σ_pairs [Σ pij u + kT Σ pij ln pij] − kT Σ_i den·ent·(n_i−1) Σ_s p ln p
    + Σ_i den Σ_s μ_s p_s, with p(ρ(x)) and pij the closed-form optimum.
    (The −(n−1) one-site term is the Bethe entropy correction
    S_B = Σ_pair S_ij − Σ_i (n_i−1) S_i with S = −Σ p ln p.)"""
    from lammps_ucg_dev_tpu.models import common

    tp = params.tp
    jc, valid, dr, rsq = common.pair_geometry(x, state.box, nbr)
    ti, tj = state.typ[:, None], state.typ[jc]
    within = valid & (rsq < tp.cutsq[ti, tj])
    r = jnp.sqrt(jnp.where(within, rsq, 1.0))
    radius = jnp.maximum(tp.threshold_radius[state.typ], 1e-12)
    rho = jnp.sum(jnp.where(within, density.proximity(r, radius[:, None]), 0.0),
                  axis=1)
    prior, _ = pair_bethe_density._priors(params, state.typ, rho)
    pi1 = prior[:, 1]
    e4, _, _, _ = common.eval_state_block(params.bank, tp, ti, tj, rsq, within)
    p4 = pair_bethe.bethe_pij(e4, pi1[:, None], pi1[jc], params.kT,
                              params.method)
    p4 = jnp.where(within[..., None, None], p4, 0.0)
    logp4 = jnp.log(jnp.maximum(p4, 1e-12))
    e_pair = 0.5 * jnp.sum(p4 * (e4 + params.kT * logp4))

    is_ucg = tp.n_states[state.typ] > 1
    use_den = (tp.use_density[state.typ] == 1) & is_ucg
    ent = (tp.use_entropy[state.typ] == 1) & use_den
    logp = jnp.log(jnp.maximum(prior, 1e-12))
    s_ent = jnp.sum(prior * logp, axis=1)
    e_ent = -params.kT * jnp.sum(
        jnp.where(ent, (n_real_fixed - 1.0) * s_ent, 0.0))
    mu_i = tp.mu[tp.formal[state.typ]]
    e_mu = jnp.sum(jnp.where(use_den, jnp.sum(mu_i * prior, axis=1), 0.0))
    return e_pair + e_ent + e_mu


@pytest.mark.parametrize("settings_text,label", [
    (P3_SETTINGS, "entropy"), (P3_SETTINGS_NOENT, "no_entropy")])
def test_p3_force_is_minus_grad(rng, settings_text, label):
    st, bank, tp = _p3_build(settings_text)
    n, L = 40, 7.0
    types = np.where(rng.uniform(size=n) < 0.75, 2, 1).astype(np.int32)
    state = _fluid_state(rng, n, L, types)
    spec = nb.make_spec(n, [L] * 3, RC, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    params = pair_bethe_density.make_params(bank, tp, KT, dtype=jnp.float64)
    out = jax.jit(pair_bethe_density.compute)(state, nbr, params)

    # fixed neighbor counts for the entropy factor (non-differentiable int)
    from lammps_ucg_dev_tpu.models import common
    jc, valid, _, rsq = common.pair_geometry(state.x, state.box, nbr)
    within = valid & (rsq < tp.cutsq[state.typ[:, None], state.typ[jc]])
    n_real = jnp.sum(within, axis=1).astype(jnp.float64)

    grad = jax.grad(
        lambda x: _p3_free_energy(x, state, nbr, params, n_real)
    )(state.x)
    np.testing.assert_allclose(np.asarray(out.f), -np.asarray(grad),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.sum(out.f, axis=0)),
                               np.zeros(3), atol=1e-10)


def test_p3_posterior_and_scores(rng):
    """Pseudolikelihood scores and fused posterior: verify against a direct
    scalar recomputation."""
    st, bank, tp = _p3_build(P3_SETTINGS)
    n, L = 30, 6.5
    types = np.where(rng.uniform(size=n) < 0.75, 2, 1).astype(np.int32)
    state = _fluid_state(rng, n, L, types)
    spec = nb.make_spec(n, [L] * 3, RC, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    params = pair_bethe_density.make_params(bank, tp, KT, dtype=jnp.float64)
    out = pair_bethe_density.compute(state, nbr, params)

    eval_tab = helpers.make_tables_eval(bank)
    tab4 = np.asarray(tp.tab4)
    cutsq = np.asarray(tp.cutsq)
    x = np.asarray(state.x)
    typ = np.asarray(state.typ)
    ust = np.asarray(state.ucgstate)
    mu = st.chemical_potentials
    formal = st.formal_from_actual
    scores_ref = np.zeros((n, 2))
    for i in range(n):
        if st.n_states_per_type[typ[i]] <= 1:
            continue
        if st.use_density[typ[i]]:
            for s in range(2):
                scores_ref[i][s] -= mu[formal[typ[i]][s]] / KT
        for j in range(n):
            if i == j:
                continue
            d = x[i] - x[j]
            d -= 6.5 * np.round(d / 6.5)
            rsq = float(d @ d)
            if rsq >= cutsq[typ[i]][typ[j]]:
                continue
            js = ust[j] if st.n_states_per_type[typ[j]] > 1 else 0
            for s in range(2):
                e_, _ = eval_tab(tab4[typ[i], typ[j], s, js], rsq)
                scores_ref[i][s] -= e_ / KT
    np.testing.assert_allclose(np.asarray(out.scores), scores_ref, atol=1e-9)
    # posterior = clamped softmax of scores
    p = np.asarray(out.ucgp)
    is_ucg = st.n_states_per_type[typ] > 1
    expect = np.clip(1 / (1 + np.exp(scores_ref[:, 0] - scores_ref[:, 1])),
                     1e-6, 1 - 1e-6)
    np.testing.assert_allclose(p[is_ucg], expect[is_ucg], rtol=1e-9)
    np.testing.assert_allclose(p[~is_ucg], 1.0)


@pytest.mark.quick
def test_p3_backforce_compat_flag(rng):
    st, bank, tp = _p3_build(P3_SETTINGS)
    n, L = 30, 6.5
    types = np.full(n, 2, np.int32)
    state = _fluid_state(rng, n, L, types)
    spec = nb.make_spec(n, [L] * 3, RC, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    p_corr = pair_bethe_density.make_params(bank, tp, KT, dtype=jnp.float64)
    p_lit = dataclasses.replace(p_corr, backforce_derivative=False)
    f0 = pair_bethe_density.compute(state, nbr, p_corr).f
    f1 = pair_bethe_density.compute(state, nbr, p_lit).f
    assert not np.allclose(np.asarray(f0), np.asarray(f1))


@pytest.mark.parametrize("style", ["p3", "p4"])
def test_density_styles_chunked_match(rng, style):
    n, L = 48, 7.5
    if style == "p3":
        st, bank, tp = _p3_build(P3_SETTINGS)
        types = np.where(rng.uniform(size=n) < 0.75, 2, 1).astype(np.int32)
        state = _fluid_state(rng, n, L, types)
        params = pair_bethe_density.make_params(bank, tp, KT, dtype=jnp.float64)
        compute = pair_bethe_density.compute
    else:
        st, b = _p4_build()
        types = np.where(rng.uniform(size=n) < 0.7, 1, 3).astype(np.int32)
        state = _fluid_state(rng, n, L, types)
        params = pair_rleucg.make_params(b, st, KT, dtype=jnp.float64)
        compute = pair_rleucg.compute
    spec = nb.make_spec(n, [L] * 3, RC, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    out1 = compute(state, nbr, params)
    out2 = compute(state, nbr, dataclasses.replace(params, chunk=16))
    np.testing.assert_allclose(np.asarray(out1.f), np.asarray(out2.f),
                               atol=1e-12)
    np.testing.assert_allclose(float(out1.pe), float(out2.pe), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out1.virial),
                               np.asarray(out2.virial), atol=1e-10)
