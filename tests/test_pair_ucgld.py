"""Golden + property tests for pair_style table_ucgld (P1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.fixes import ucgstate as fs
from lammps_ucg_dev_tpu.models import pair_ucgld
from lammps_ucg_dev_tpu.models.typemap import TablePairBuilder
from lammps_ucg_dev_tpu.ops import neighbor as nb
from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation
from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
import pytest

pytestmark = pytest.mark.quick

KT = 0.8


def make_state(rng, n, L, st, two_state_frac=1.0, seed=1):
    x = helpers.random_fluid(rng, n, L)
    ntypes = st.n_actual_types
    if ntypes == 1:
        typ = np.ones(n, dtype=np.int32)
    else:
        typ = rng.integers(1, ntypes + 1, size=n).astype(np.int32)
    lam = rng.uniform(0.05, 0.95, n)
    ucgstate = rng.integers(0, 2, n).astype(np.int32)
    # non-UCG atoms are state 0, λ irrelevant
    is1 = st.n_states_per_type[typ] == 1
    ucgstate[is1] = 0
    v = rng.normal(0, 0.3, (n, 3))
    vl = rng.normal(0, 0.3, n)
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    return SimState.create(
        x=x, v=v, typ=typ, ucgl=lam, ucgstate=ucgstate, ucgvl=vl,
        ucgml=np.full(n, 2.0), box=box, seed=seed, dtype=jnp.float64,
    )


def _setup(rng, n=40, L=7.0, mixed=False):
    if mixed:
        st, bank, tp, rc = helpers.build_mixed()
        builder_settings = helpers.MIXED_SETTINGS
    else:
        st, bank, tp, rc = helpers.build_two_state()
        builder_settings = helpers.TWO_STATE_SETTINGS
    state = make_state(rng, n, L, st)
    spec = nb.make_spec(n, [L] * 3, rc, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(KT))
    return st, bank, tp, rc, state, nbr, params


def test_matches_scalar_oracle(rng):
    """Full-list per-atom-owned tallies == reference half-list + reverse-comm
    totals, vs a scalar NumPy oracle of pair_table_ucgld.cpp:111-541."""
    for mixed in (False, True):
        st, bank, tp, rc, state, nbr, params = _setup(rng, mixed=mixed)
        out = jax.jit(pair_ucgld.compute)(state, nbr, params)

        # oracle over formal-type pairs
        if mixed:
            b = TablePairBuilder("linear", 1200, parse_state_settings(
                helpers.MIXED_SETTINGS, "ucgld"))
        else:
            b = TablePairBuilder("linear", 1200, parse_state_settings(
                helpers.TWO_STATE_SETTINGS, "ucgld"))
        eval_tab = helpers.make_tables_eval(bank)
        cutsq = np.asarray(tp.cutsq)
        tab4 = np.asarray(tp.tab4)

        def tables_eval(fi, fj, rsq):
            # find the actual pair with these formals via tab4 structure
            return eval_tab(tabindex[fi][fj], rsq)

        # rebuild a formal-pair table index from tab4
        F = st.n_formal_types
        tabindex = np.zeros((F + 1, F + 1), dtype=int)
        for i in range(1, st.n_actual_types + 1):
            for j in range(1, st.n_actual_types + 1):
                for si in range(st.n_states_per_type[i]):
                    for sj in range(st.n_states_per_type[j]):
                        fi = st.formal_from_actual[i][si]
                        fj = st.formal_from_actual[j][sj]
                        tabindex[fi][fj] = tab4[i, j, si, sj]

        ref = helpers.oracle_ucgld(
            np.asarray(state.x), np.asarray(state.typ), np.asarray(state.ucgl),
            np.asarray(state.ucgstate), 7.0, st, tables_eval, cutsq, KT,
            st.chemical_potentials,
        )
        np.testing.assert_allclose(np.asarray(out.f), ref["f"], atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.ucgforce), ref["ucgforce"], atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.scores), ref["scores"], atol=1e-10)
        np.testing.assert_allclose(float(out.pe), ref["pe"], atol=1e-10)


def test_momentum_conservation(rng):
    *_, state, nbr, params = _setup(rng)
    out = pair_ucgld.compute(state, nbr, params)
    np.testing.assert_allclose(np.asarray(jnp.sum(out.f, axis=0)),
                               np.zeros(3), atol=1e-11)


def test_lambda_force_is_minus_dE_dlambda(rng):
    """ucgforce == -∂E/∂λ by autodiff (exact: E is bilinear in λ)."""
    *_, state, nbr, params = _setup(rng)
    out = pair_ucgld.compute(state, nbr, params)
    grad = jax.grad(
        lambda lam: pair_ucgld.potential_energy(state.x, lam, state, nbr, params)
    )(state.ucgl)
    is_ucg = np.asarray(params.tp.n_states[state.typ] > 1)
    np.testing.assert_allclose(
        np.asarray(out.ucgforce)[is_ucg], -np.asarray(grad)[is_ucg], atol=1e-10
    )


def test_force_is_minus_dE_dx(rng):
    """f ≈ -∂E/∂x (table f column consistent with e column up to binning)."""
    *_, state, nbr, params = _setup(rng)
    out = pair_ucgld.compute(state, nbr, params)
    grad = jax.grad(
        lambda x: pair_ucgld.potential_energy(x, state.ucgl, state, nbr, params)
    )(state.x)
    np.testing.assert_allclose(np.asarray(out.f), -np.asarray(grad),
                               atol=5e-3, rtol=5e-3)


def test_nve_energy_conservation(rng):
    """NVE λ-dynamics conserves H = KE + KE_λ + PE + Σ λ Δμ (SURVEY §4.1)."""
    st, bank, tp, rc = helpers.build_two_state()
    n, L = 64, 8.0
    state = make_state(rng, n, L, st)
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="nsq")
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(KT))
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    sim = Simulation(system, state, pair_ucgld.compute, params, spec, cfg)
    sim.setup()

    def H():
        row = sim.thermo()
        mu_term = float(jnp.sum(jnp.where(
            tp.n_states[sim.state.typ] > 1,
            sim.state.ucgl * tp.mu_diff[sim.state.typ], 0.0)))
        return row["ke"] + row["ke_lambda"] + row["pe"] + mu_term

    e0 = H()
    sim.run(400)
    e1 = H()
    assert abs(e1 - e0) / max(abs(e0), 1e-10) < 2e-5, (e0, e1)


def test_wall_hard_reflection_and_state(rng):
    st, bank, tp, rc = helpers.build_two_state()
    n, L = 32, 7.0
    state = make_state(rng, n, L, st)
    # large λ velocities to force wall crossings
    state = dataclasses.replace(
        state, ucgvl=jnp.asarray(rng.normal(0, 5.0, n)))
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="nsq")
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(KT))
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld/wall/hard",
                                                bias_potential=True, barrier=0.2),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    sim = Simulation(system, state, pair_ucgld.compute, params, spec, cfg)
    sim.run(200)
    lam = np.asarray(sim.state.ucgl)
    stt = np.asarray(sim.state.ucgstate)
    # λ kicked past the wall once per step at most: reflection keeps it near [0,1]
    assert lam.min() > -0.2 and lam.max() < 1.2
    # discrete state tracks λ threshold (set during initial_integrate, before
    # final-integrate reflection, so compare against the pre-reflection λ drift)
    assert set(np.unique(stt)).issubset({0, 1})


def test_ucgstate_posterior(rng):
    *_, state, nbr, params = _setup(rng)
    out = pair_ucgld.compute(state, nbr, params)
    is_ucg = params.tp.n_states[state.typ] > 1
    key = jax.random.PRNGKey(0)
    st2 = fs.post_force(key, state, out.scores, is_ucg,
                        fs.UCGStateCfg(mode="default"))
    p = np.asarray(st2.ucgp)
    assert np.all((p >= 1e-6) & (p <= 1 - 1e-6))
    np.testing.assert_array_equal(np.asarray(st2.ucgstate), np.round(p).astype(int))
    np.testing.assert_allclose(np.asarray(st2.ucgl), p)
    # softmax identity: p = 1/(1+exp(s0 - s1))
    s = np.asarray(out.scores)
    np.testing.assert_allclose(p, np.clip(1 / (1 + np.exp(s[:, 0] - s[:, 1])),
                                          1e-6, 1 - 1e-6), rtol=1e-10)


def test_asymmetric_cross_tables_use_01_like_reference(rng):
    """pair_coeff with DIFFERENT 01 and 10 tables: the reference's init_one
    symmetrization (pair_table_ucgld.cpp:892) makes the upper-triangular
    (01) table serve BOTH cross state combos; tab4 must reflect that."""
    import numpy as np

    from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
    from lammps_ucg_dev_tpu.models.typemap import TablePairBuilder

    st = parse_state_settings("1 2 2\n1 2\n1 2\n0.0 0.3\n", "ucgld")
    b = TablePairBuilder("linear", 800, st)
    rc = 2.5
    b.pair_coeff(1, 1, 2, 2, [
        (helpers.make_soft_table(1.0, rc), rc),
        (helpers.make_soft_table(0.7, rc), rc),   # 01 file
        (helpers.make_soft_table(0.4, rc), rc),   # 10 file (differs!)
        (helpers.make_soft_table(0.25, rc), rc)])
    bank, tp = b.build(dtype=jnp.float64)
    t4 = np.asarray(tp.tab4)[1, 1]
    assert t4[0, 1] == t4[1, 0] == 1, t4   # both cross combos -> 01 table
    assert t4[0, 0] == 0 and t4[1, 1] == 3
