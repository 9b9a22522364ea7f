"""Tests for fix cluster_switch: connected-component labeling, seed-cluster
locking, MC switching, statistics."""

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import Box, SimState
from lammps_ucg_dev_tpu.fixes import cluster_switch as cs
from lammps_ucg_dev_tpu.ops import neighbor as nb
import pytest

ON, OFF = 1, 2


def _make(positions, types, mols, L=40.0, maxmol=None, probON=1.0,
          cutoff=1.5, mol_seed=1, mol_offset=0):
    n = len(positions)
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    state = SimState.create(x=np.asarray(positions, float), typ=np.asarray(types),
                            mol=np.asarray(mols), box=box, dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, cutoff + 0.5, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    params = cs.make_params(
        ntypes=2, contacts=[(ON, ON), (ON, OFF), (OFF, OFF)],
        atomtypes_on=[ON], atomtypes_off=[OFF], probON=probON, cutoff=cutoff,
        mol_seed=mol_seed, mol_offset=mol_offset,
        maxmol=maxmol or int(max(mols)), dtype=jnp.float64)
    return state, nbr, params


def test_cluster_labeling_chain():
    # mols 1-2-3 chained within contact distance; 4, 5 isolated
    pos = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [10, 0, 0], [20, 0, 0]]
    types = [ON, ON, ON, OFF, ON]
    mols = [1, 2, 3, 4, 5]
    state, nbr, params = _make(pos, types, mols)
    labels, mol_state, present, in_cluster, n_cluster, conv = cs.check_cluster(
        state, nbr, params)
    assert int(n_cluster) == 3
    np.testing.assert_array_equal(np.asarray(in_cluster)[1:6],
                                  [True, True, True, False, False])
    np.testing.assert_array_equal(np.asarray(mol_state)[1:6], [1, 1, 1, 0, 1])


@pytest.mark.quick
def test_switch_locks_cluster_and_flips_rest():
    pos = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [10, 0, 0], [20, 0, 0]]
    types = [ON, ON, ON, OFF, ON]
    mols = [1, 2, 3, 4, 5]
    state, nbr, params = _make(pos, types, mols, probON=1.0)
    key = jax.random.PRNGKey(0)
    st2, stats, info = cs.apply(key, state, nbr, params,
                                cs.ClusterSwitchStats.zeros(jnp.float64))
    t = np.asarray(st2.typ)
    # cluster mols 1-3 locked (still ON)
    np.testing.assert_array_equal(t[:3], [ON, ON, ON])
    # mol 4 was OFF, probON=1 -> flips ON
    assert t[3] == ON
    # mol 5 was ON, probOFF=0 -> stays ON
    assert t[4] == ON
    v = np.asarray(stats.v)
    # eligible: mols 4 (OFF) and 5 (ON); one success (mol 4); cluster size 3
    assert v.tolist() == [2, 1, 1, 1, 1, 0, 3]


def test_switch_off_direction():
    pos = [[0, 0, 0], [10, 0, 0]]
    types = [ON, ON]
    mols = [1, 2]
    state, nbr, params = _make(pos, types, mols, probON=0.0)
    key = jax.random.PRNGKey(1)
    st2, stats, info = cs.apply(key, state, nbr, params,
                                cs.ClusterSwitchStats.zeros(jnp.float64))
    t = np.asarray(st2.typ)
    assert t[0] == ON          # seed locked
    assert t[1] == OFF         # probOFF = 1 -> switched OFF
    assert np.asarray(stats.v)[5] == 1   # successOFF


def test_offset_partner_linking():
    """Partner molecules (m, m-offset) must share a cluster even without a
    direct contact: seed mol 6 (offset 5 -> partner 1) touches nothing, but
    its partner mol 1 is preset into the seed cluster; unrelated mol 8
    (partner 3, absent) stays out."""
    pos = [[0, 0, 0], [30, 0, 0], [10, 0, 0]]
    types = [ON, ON, ON]
    mols = [1, 6, 8]
    state, nbr, params = _make(pos, types, mols, maxmol=8, mol_seed=6,
                               mol_offset=5, probON=0.0)
    labels, mol_state, present, in_cluster, n_cluster, conv = cs.check_cluster(
        state, nbr, params)
    inc = np.asarray(in_cluster)
    assert inc[6] and inc[1]        # partner pair united with seed
    assert not inc[8]               # unrelated switchable mol


@pytest.mark.quick
def test_pbc_contact():
    L = 20.0
    pos = [[0.2, 0, 0], [L - 0.2, 0, 0], [10, 0, 0]]
    types = [ON, ON, OFF]
    mols = [1, 2, 3]
    state, nbr, params = _make(pos, types, mols, L=L)
    *_, in_cluster, n_cluster, conv = cs.check_cluster(state, nbr, params)
    assert int(n_cluster) == 2
    assert np.asarray(in_cluster)[2]


def test_statistics_match_acceptance_rate(rng):
    """probON = 0.5: acceptance fraction over many trials ≈ 0.5."""
    n_mol = 64
    pos = [[4.0 * (i + 1), 0, 0] for i in range(n_mol)]
    types = [OFF] * n_mol
    mols = list(range(1, n_mol + 1))
    state, nbr, params = _make(pos, types, mols, L=400.0, probON=0.5)
    stats = cs.ClusterSwitchStats.zeros(jnp.float64)
    accepted = 0
    trials = 0
    st = state
    for k in range(20):
        # reset types to OFF each round so the direction stays fixed
        st = dataclasses_replace_typ(st, types)
        st2, stats, info = cs.apply(jax.random.PRNGKey(k), st, nbr, params, stats)
        accepted += int(np.asarray(info["accept"]).sum())
        trials += n_mol - 1   # seed (mol 1) locked
    frac = accepted / trials
    assert 0.4 < frac < 0.6, frac


def dataclasses_replace_typ(state, types):
    import dataclasses
    return dataclasses.replace(state, typ=jnp.asarray(np.asarray(types), jnp.int32))


def test_cluster_switch_in_simulation(rng, tmp_path):
    """Config-4 shape: pair style + fix cluster_switch on a cadence inside the
    Simulation loop, with event logs."""
    import helpers
    from lammps_ucg_dev_tpu.core.state import System
    from lammps_ucg_dev_tpu.fixes import integrate as fi
    from lammps_ucg_dev_tpu.fixes import langevin as fl
    from lammps_ucg_dev_tpu.models import pair_ucgld
    from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

    st, bank, tp, rc = helpers.build_mixed()
    n, L = 40, 8.0
    x = helpers.random_fluid(rng, n, L)
    types = rng.integers(1, 3, n).astype(np.int32)
    mols = np.arange(1, n + 1, dtype=np.int32)
    state = SimState.create(
        x=x, v=rng.normal(0, 0.3, (n, 3)), typ=types, mol=mols,
        ucgl=rng.uniform(0.2, 0.8, n),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="nsq")
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    cs_params = cs.make_params(
        ntypes=2, contacts=[(1, 1), (1, 2), (2, 2)], atomtypes_on=[2],
        atomtypes_off=[1], probON=0.5, cutoff=1.3, mol_seed=1, mol_offset=0,
        maxmol=n, dtype=jnp.float64)
    system = System(n_atoms=n, ntypes=2, masses=np.array([0.0, 1.0, 1.0]))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5), reneigh_every=5)
    sim = Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                     cluster_switch=(cs_params, 10), log_dir=str(tmp_path))
    sim.run(30)
    v = np.asarray(sim.cswitch_stats.v)
    assert v[0] > 0                      # attempts happened
    assert (tmp_path / "cluster_assignment.log").exists()
    lines = (tmp_path / "cluster_assignment.log").read_text().strip().splitlines()
    assert len(lines) == 2               # events fire at the START of blocks
    assert lines[0].startswith("10 ") and lines[1].startswith("20 ")
    # types flipped only between the ON/OFF lists
    assert set(np.asarray(sim.state.typ).tolist()).issubset({1, 2})


@pytest.mark.slow
def test_cluster_switch_composes_with_column_kernel(rng):
    """Single-chip fix cluster_switch + the fused column kernel (the
    config-4 composition): the event builds its own right-sized contact
    neighbor list (runtime/sim.py _cswitch_impl), so the discrete outcome
    (flipped types, 7-stat vector) is bit-identical to the
    atom-neighbor-list path evaluated from the same state, and the full
    driver runs events on the kernel path."""
    import dataclasses

    import helpers
    from lammps_ucg_dev_tpu.core.state import System
    from lammps_ucg_dev_tpu.fixes import integrate as fi
    from lammps_ucg_dev_tpu.fixes import langevin as fl
    from lammps_ucg_dev_tpu.models import pair_ucgld
    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk
    from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

    st, bank, tp, rc = helpers.build_mixed(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    types = rng.integers(1, 3, n).astype(np.int32)
    mols = np.arange(1, n + 1, dtype=np.int32)
    state = SimState.create(
        x=x, v=rng.normal(0, 0.3, (n, 3)), typ=types, mol=mols,
        ucgl=rng.uniform(0.2, 0.8, n), ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    assert pk.supports(params, n)
    params_k = dataclasses.replace(params, cheb=chebtab.fit_bank(bank),
                                   chunk=0)
    cs_params = cs.make_params(
        ntypes=2, contacts=[(1, 1), (1, 2), (2, 2)], atomtypes_on=[2],
        atomtypes_off=[1], probON=0.5, cutoff=1.3, mol_seed=1, mol_offset=0,
        maxmol=n, dtype=jnp.float32)
    system = System(n_atoms=n, ntypes=2, masses=np.array([0.0, 1.0, 1.0]))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5), reneigh_every=5)

    spec_k = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    simk = Simulation(system, state, pk.compute_style, params_k, spec_k,
                      cfg, cluster_switch=(cs_params, 10))
    spec_a = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell")
    sima = Simulation(system, state, pair_ucgld.compute, params, spec_a,
                      cfg, cluster_switch=(cs_params, 10))
    assert simk._cs_spec is not None and sima._cs_spec is None

    # same input state through both events: contacts are recomputed from
    # identical positions and the RNG key is identical, so the discrete
    # outcome must match exactly despite the different candidate lists
    s1, v1, i1 = simk._cswitch_jit(state, simk.cswitch_stats)
    s2, v2, i2 = sima._cswitch_jit(state, sima.cswitch_stats)
    np.testing.assert_array_equal(np.asarray(s1.typ), np.asarray(s2.typ))
    np.testing.assert_array_equal(np.asarray(v1.v), np.asarray(v2.v))
    assert bool(i1["converged"]) and not bool(i1["nbr_overflow"])
    assert (np.asarray(s1.typ) != types).sum() > 0, "no flip — no power"

    # the full kernel-path driver runs events end-to-end
    simk.run(15)
    assert np.asarray(simk.cswitch_stats.v)[0] > 0
