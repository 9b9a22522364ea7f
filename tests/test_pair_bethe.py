"""Tests for pair_style table_ucg_bethe (P2): closed-form pij properties,
scalar-oracle golden match, prior modes, self-consistent stepping."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.fixes import langevin as fl
from lammps_ucg_dev_tpu.fixes import ucgstate as fs
from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
from lammps_ucg_dev_tpu.models import pair_bethe
from lammps_ucg_dev_tpu.ops import neighbor as nb
from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

KT = 0.8


def test_bethe_pij_properties(rng):
    """The closed form must satisfy the marginal constraints and the Bethe
    consistency condition p11 p00 / (p10 p01) = exp(-J/kT)."""
    for _ in range(200):
        u = rng.normal(0, 1.0, (2, 2))
        pi1 = rng.uniform(0.02, 0.98)
        pj1 = rng.uniform(0.02, 0.98)
        p = np.asarray(pair_bethe.bethe_pij(
            jnp.asarray(u), jnp.asarray(pi1), jnp.asarray(pj1), KT))
        # marginals
        np.testing.assert_allclose(p[1, 0] + p[1, 1], pi1, atol=1e-12)
        np.testing.assert_allclose(p[0, 1] + p[1, 1], pj1, atol=1e-12)
        np.testing.assert_allclose(p.sum(), 1.0, atol=1e-12)
        # all probabilities physical
        assert np.all(p >= -1e-12), (u, pi1, pj1, p)
        # Bethe condition (variational optimum of the pair free energy)
        J = u[1, 1] + u[0, 0] - u[0, 1] - u[1, 0]
        if np.all(p > 1e-10):
            np.testing.assert_allclose(
                p[1, 1] * p[0, 0] / (p[1, 0] * p[0, 1]), np.exp(-J / KT),
                rtol=1e-8)
        # matches the scalar reference transcription
        np.testing.assert_allclose(
            p, helpers.bethe_pij_scalar(u, pi1, pj1, KT), atol=1e-12)


def test_bethe_pij_variational():
    """p11 minimizes the 2-site Bethe free energy at fixed marginals
    (dF/dp11 = 0 ⇒ the 'no dU/dp force term' claim, :627-628)."""
    u = np.array([[0.3, -0.2], [0.1, -0.5]])
    pi1, pj1 = 0.4, 0.7

    def free_energy(p11):
        p = np.array([[1 + p11 - pi1 - pj1, pj1 - p11], [pi1 - p11, p11]])
        ent = np.sum(p * np.log(p))
        # Bethe: subtract single-site entropies (fixed by marginals) — constant
        return float(np.sum(p * u) + KT * ent)

    p = helpers.bethe_pij_scalar(u, pi1, pj1, KT)
    p11 = p[1, 1]
    eps = 1e-6
    d = (free_energy(p11 + eps) - free_energy(p11 - eps)) / (2 * eps)
    assert abs(d) < 1e-6


def test_degenerate_single_state_partner():
    """pj1 = 0 (non-UCG partner) collapses pij to prior products — the
    scenario-2/3 limit."""
    u = np.array([[0.3, -0.2], [0.1, -0.5]])
    p = np.asarray(pair_bethe.bethe_pij(jnp.asarray(u), jnp.asarray(0.35),
                                        jnp.asarray(0.0), KT))
    np.testing.assert_allclose(p[:, 1], 0.0, atol=1e-14)
    np.testing.assert_allclose(p[0, 0], 0.65, atol=1e-12)
    np.testing.assert_allclose(p[1, 0], 0.35, atol=1e-12)


def _setup(rng, pseudo, mixed=True, n=36, L=7.0):
    if mixed:
        st, bank, tp, rc = helpers.build_mixed()
    else:
        st, bank, tp, rc = helpers.build_two_state()
    x = helpers.random_fluid(rng, n, L)
    ntypes = st.n_actual_types
    typ = (np.ones(n, np.int32) if ntypes == 1
           else rng.integers(1, ntypes + 1, n).astype(np.int32))
    p_assigned = rng.uniform(0.05, 0.95, n)
    is1 = st.n_states_per_type[typ] == 1
    p_assigned[is1] = 1.0
    ucgstate = rng.integers(0, 2, n).astype(np.int32)
    ucgstate[is1] = 0
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    # steady-state invariant: ucgl == ucgp (fix ucgstate sets both)
    state = SimState.create(x=x, typ=typ, ucgl=p_assigned, ucgp=p_assigned,
                            ucgstate=ucgstate, box=box, dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, rc, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    params = pair_bethe.make_params(bank, tp, KT, pseudo=pseudo,
                                    dtype=jnp.float64)
    return st, bank, tp, rc, state, nbr, params


@pytest.mark.parametrize("pseudo", [True, False])
@pytest.mark.parametrize("method", ["bethe", "mf"])
def test_matches_scalar_oracle(rng, pseudo, method):
    st, bank, tp, rc, state, nbr, params = _setup(rng, pseudo)
    params = dataclasses.replace(params, method=method)
    out = jax.jit(pair_bethe.compute)(state, nbr, params)

    eval_tab = helpers.make_tables_eval(bank)
    tab4 = np.asarray(tp.tab4)
    F = st.n_formal_types
    tabindex = np.zeros((F + 1, F + 1), dtype=int)
    for i in range(1, st.n_actual_types + 1):
        for j in range(1, st.n_actual_types + 1):
            for si in range(st.n_states_per_type[i]):
                for sj in range(st.n_states_per_type[j]):
                    tabindex[st.formal_from_actual[i][si],
                             st.formal_from_actual[j][sj]] = tab4[i, j, si, sj]

    ref = helpers.oracle_bethe(
        np.asarray(state.x), np.asarray(state.typ), np.asarray(state.ucgl),
        np.asarray(state.ucgp), np.asarray(state.ucgstate), 7.0, st,
        lambda fi_, fj_, rsq: eval_tab(tabindex[fi_][fj_], rsq),
        np.asarray(tp.cutsq), KT, st.chemical_potentials,
        method=method, pseudo=pseudo,
    )
    np.testing.assert_allclose(np.asarray(out.f), ref["f"], atol=1e-9)
    np.testing.assert_allclose(float(out.pe), ref["pe"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.scores), ref["scores"], atol=1e-9)


def test_first_step_sentinel_priors(rng):
    """ucgp = -1 sentinel → priors from the flag (chemical_potential mode)."""
    st, bank, tp, rc, state, nbr, params = _setup(rng, pseudo=True, mixed=False)
    state = dataclasses.replace(state, ucgp=jnp.full_like(state.ucgp, -1.0))
    params = dataclasses.replace(params, prior_mode="chemical_potential")
    out = jax.jit(pair_bethe.compute)(state, nbr, params)
    assert np.all(np.isfinite(np.asarray(out.f)))

    # noise mode stays within physical bounds and changes the answer
    params_n = dataclasses.replace(params,
                                   prior_mode="chemical_potential_noise",
                                   noise_level=jnp.asarray(0.2))
    out_n = jax.jit(pair_bethe.compute)(state, nbr, params_n)
    assert np.all(np.isfinite(np.asarray(out_n.f)))
    assert not np.allclose(np.asarray(out.f), np.asarray(out_n.f))


def test_self_consistent_stepping(rng):
    """Config-3 style run: bethe pair + fix ucgstate; posteriors feed back as
    next-step priors across steps (SURVEY §3.2); stays finite and bounded."""
    st, bank, tp, rc = helpers.build_two_state()
    n, L = 48, 7.5
    x = helpers.random_fluid(rng, n, L)
    state = SimState.create(
        x=x, v=rng.normal(0, 0.5, (n, 3)), typ=np.ones(n, np.int32),
        ucgl=rng.uniform(0.3, 0.7, n), ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64,
    )
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="nsq")
    params = pair_bethe.make_params(bank, tp, KT, prior_mode="chemical_potential",
                                    dtype=jnp.float64)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(t_start=KT, t_stop=KT, t_period=0.5),
                    ucgstate=fs.UCGStateCfg(mode="default"), reneigh_every=5)
    sim = Simulation(system, state, pair_bethe.compute, params, spec, cfg)
    sim.run(50)
    p = np.asarray(sim.state.ucgp)
    assert np.all((p > 0) & (p < 1))
    assert np.all(np.isfinite(np.asarray(sim.state.x)))
    # ucgl tracks ucgp each step (fix ucgstate default mode)
    np.testing.assert_allclose(np.asarray(sim.state.ucgl), p)


def test_chunked_matches_unchunked(rng):
    st, bank, tp, rc, state, nbr, params = _setup(rng, pseudo=True, n=48, L=8.0)
    out1 = pair_bethe.compute(state, nbr, params)
    out2 = pair_bethe.compute(state, nbr,
                              dataclasses.replace(params, chunk=16))
    np.testing.assert_allclose(np.asarray(out1.f), np.asarray(out2.f),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out1.scores),
                               np.asarray(out2.scores), atol=1e-12)
    np.testing.assert_allclose(float(out1.pe), float(out2.pe), atol=1e-12)
