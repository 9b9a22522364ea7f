"""Distributed-correctness tests on the virtual 8-device CPU mesh
(SURVEY.md §4.3): multi-device results must equal single-device results —
same physics, different sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.fixes import langevin as fl
from lammps_ucg_dev_tpu.fixes import ucgstate as fs
from lammps_ucg_dev_tpu.models import pair_ucgld
from lammps_ucg_dev_tpu.ops import neighbor as nb
from lammps_ucg_dev_tpu.parallel import domain
from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation


def _build_sim(rng, n=64, L=8.0, method="nsq"):
    st, bank, tp, rc = helpers.build_two_state()
    x = helpers.random_fluid(rng, n, L)
    state = SimState.create(
        x=x, v=rng.normal(0, 0.5, (n, 3)), typ=np.ones(n, np.int32),
        ucgl=rng.uniform(0.2, 0.8, n), ucgstate=rng.integers(0, 2, n),
        ucgvl=rng.normal(0, 0.2, n), ucgml=np.full(n, 2.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method=method)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    return Simulation(system, state, pair_ucgld.compute, params, spec, cfg)


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8


def test_sharded_run_matches_single_device(rng):
    sim1 = _build_sim(rng, n=64)
    sim2 = _build_sim(np.random.default_rng(12345), n=64)

    sim1.run(20)
    mesh = domain.make_mesh(8)
    domain.distribute(sim2, mesh)
    sim2.run(20)

    np.testing.assert_allclose(np.asarray(sim2.state.x),
                               np.asarray(sim1.state.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sim2.state.v),
                               np.asarray(sim1.state.v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sim2.state.ucgl),
                               np.asarray(sim1.state.ucgl), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sim2.state.ucgp),
                               np.asarray(sim1.state.ucgp), atol=1e-12)


def test_sharded_cell_list_matches(rng):
    """Cell-list neighbor build under sharding gives identical physics."""
    sim1 = _build_sim(rng, n=512, L=12.0, method="cell")
    sim2 = _build_sim(np.random.default_rng(12345), n=512, L=12.0,
                      method="cell")
    sim1.run(10)
    domain.distribute(sim2, domain.make_mesh(8))
    sim2.run(10)
    np.testing.assert_allclose(np.asarray(sim2.state.x),
                               np.asarray(sim1.state.x), atol=1e-12)


def test_fused_run_matches_blockwise(rng):
    sim1 = _build_sim(rng)
    sim2 = _build_sim(np.random.default_rng(12345))
    sim1.run(20)
    sim2.setup((0, 20))
    sim2.run_fused(4, run_window=(0, 20))   # 4 blocks x reneigh_every 5
    np.testing.assert_allclose(np.asarray(sim2.state.x),
                               np.asarray(sim1.state.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sim2.state.ucgvl),
                               np.asarray(sim1.state.ucgvl), atol=1e-12)


def test_chunked_pair_matches_unchunked(rng):
    sim1 = _build_sim(rng)
    sim2 = _build_sim(np.random.default_rng(12345))
    sim2.pair_params = dataclasses.replace(sim2.pair_params, chunk=16)
    sim1.run(10)
    sim2.run(10)
    np.testing.assert_allclose(np.asarray(sim2.state.x),
                               np.asarray(sim1.state.x), atol=1e-12)


def test_sorted_atoms_match_unsorted(rng):
    """Cell-order atom sorting changes memory layout, not physics; the dump
    (id-tagged) output is identical."""
    import dataclasses as dc

    from lammps_ucg_dev_tpu.io import dump as dmp

    sim1 = _build_sim(rng, n=512, L=12.0, method="cell")
    sim2 = _build_sim(np.random.default_rng(12345), n=512, L=12.0,
                      method="cell")
    sim2.cfg = dc.replace(sim2.cfg, sort_atoms=True)
    sim1.run(20)
    sim2.run(20)
    # compare by tag (sim2's row order differs)
    tag2 = np.asarray(sim2.state.tag)
    order = np.argsort(tag2)
    np.testing.assert_allclose(np.asarray(sim2.state.x)[order],
                               np.asarray(sim1.state.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sim2.state.ucgl)[order],
                               np.asarray(sim1.state.ucgl), atol=1e-12)


# ---------------------------------------------------------------------------
# sharded coverage for the other pair styles + cluster_switch (P2-P4, F5)
# ---------------------------------------------------------------------------

def _build_style_sim(rng, style, n=256, L=12.0):
    """A Simulation for bethe / bethe_density / rleucg at modest size."""
    from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
    from lammps_ucg_dev_tpu.models import (pair_bethe, pair_bethe_density,
                                           pair_rleucg)
    from lammps_ucg_dev_tpu.models.typemap import RLEUCGBuilder, TablePairBuilder

    x = helpers.random_fluid(rng, n, L)
    kT = 0.8
    rc = 2.5
    if style == "rleucg":
        st = parse_state_settings(
            "2 3\n2 density use_entropy\n5.0 1.5\n0.4\n1 density no_entropy\n",
            "rleucg")
        b = RLEUCGBuilder("linear", 2000, st)
        mk = lambda e: helpers.make_soft_table(e, rc, n=2000)
        for (i, j, e) in ((1, 1, 1.0), (1, 2, 0.7), (1, 3, 0.8),
                          (2, 2, 0.4), (2, 3, 0.5), (3, 3, 0.9)):
            b.pair_coeff(i, j, mk(e), rc)
        typ = np.where(rng.uniform(size=n) < 0.7, 1, 3).astype(np.int32)
        params = pair_rleucg.make_params(b, st, kT, dtype=jnp.float64)
        compute = pair_rleucg.compute
        ntypes = 3
    else:
        if style == "bethe_density":
            st = parse_state_settings(
                "2 3 2\n1 1\n2 2\n2 3 density entropy\n6.0 1.5\n0.0 0.2\n",
                "bethe_density")
        else:
            st = parse_state_settings("2 3 2\n1 1\n2 2\n2 3\n0.0 0.2\n",
                                      "bethe")
        b = TablePairBuilder("linear", 2000, st)
        mk = lambda e: (helpers.make_soft_table(e, rc, n=2000), rc)
        b.pair_coeff(1, 1, 1, 1, [mk(1.0)])
        b.pair_coeff(1, 2, 1, 2, [mk(0.8), mk(0.5)])
        b.pair_coeff(2, 2, 2, 2, [mk(0.9), mk(0.55), mk(0.55), mk(0.3)])
        bank, tp = b.build(dtype=jnp.float64)
        typ = np.where(rng.uniform(size=n) < 0.7, 2, 1).astype(np.int32)
        if style == "bethe_density":
            params = pair_bethe_density.make_params(bank, tp, kT,
                                                    dtype=jnp.float64)
            compute = pair_bethe_density.compute
        else:
            params = pair_bethe.make_params(bank, tp, kT, dtype=jnp.float64)
            compute = pair_bethe.compute
        ntypes = 2
    state = SimState.create(
        x=x, v=rng.normal(0, 0.5, (n, 3)), typ=typ,
        ucgl=rng.uniform(0.2, 0.8, n), ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell")
    system = System(n_atoms=n, ntypes=ntypes,
                    masses=np.ones(ntypes + 1))
    ucfg = None if style == "rleucg" else fs.UCGStateCfg(mode="default")
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=ucfg, reneigh_every=5)
    return Simulation(system, state, compute, params, spec, cfg)


@pytest.mark.parametrize("style", ["bethe", "bethe_density", "rleucg"])
def test_sharded_style_matches_single_device(style):
    """P2/P3/P4 sharded over the 8-device mesh == single-device (verdict:
    multi-device coverage beyond pair_ucgld)."""
    sim1 = _build_style_sim(np.random.default_rng(5), style)
    sim2 = _build_style_sim(np.random.default_rng(5), style)
    sim1.run(10)
    domain.distribute(sim2, domain.make_mesh(8))
    sim2.run(10)
    for name in ("x", "v", "ucgl", "ucgp", "ucgstate"):
        np.testing.assert_allclose(np.asarray(getattr(sim2.state, name)),
                                   np.asarray(getattr(sim1.state, name)),
                                   atol=1e-11, err_msg=name)


def test_sharded_cluster_switch_matches_single_device():
    """F5 under GSPMD sharding: the jitted label-propagation while_loop and
    molecule flips partition over the mesh and match single-device."""
    from lammps_ucg_dev_tpu.fixes import cluster_switch as fcs

    def build(rng):
        sim = _build_sim(rng, n=64, L=16.0)
        # 32 dimer molecules; contact map on type 1 pairs
        mol = np.repeat(np.arange(1, 33), 2).astype(np.int32)
        import dataclasses as dc
        sim.state = dc.replace(sim.state, mol=jnp.asarray(mol))
        params = fcs.make_params(
            ntypes=1, contacts=[(1, 1)], atomtypes_on=[1], atomtypes_off=[1],
            probON=0.5, cutoff=1.5, mol_seed=1, mol_offset=0, maxmol=32,
            dtype=jnp.float64)
        sim.cswitch = (params, 5)
        sim.cswitch_stats = fcs.ClusterSwitchStats.zeros(jnp.float64)
        sim._cswitch_jit = jax.jit(sim._cswitch_impl)
        return sim

    sim1 = build(np.random.default_rng(9))
    sim2 = build(np.random.default_rng(9))
    sim1.run(20)
    domain.distribute(sim2, domain.make_mesh(8))
    sim2.run(20)
    np.testing.assert_allclose(np.asarray(sim2.state.x),
                               np.asarray(sim1.state.x), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(sim2.state.typ),
                                  np.asarray(sim1.state.typ))
    np.testing.assert_allclose(np.asarray(sim2.cswitch_stats.v),
                               np.asarray(sim1.cswitch_stats.v), atol=0)


def test_conditional_reneigh_matches_always_rebuild(rng):
    """neigh_modify check yes (skip rebuilds while no atom moved > skin/2)
    must reproduce the always-rebuild trajectory: both candidate lists are
    supersets of the in-cutoff pairs, and PBC remap rides the rebuild."""
    sim1 = _build_sim(np.random.default_rng(21), n=128, L=9.0)
    sim2 = _build_sim(np.random.default_rng(21), n=128, L=9.0)
    sim2.cfg = dataclasses.replace(sim2.cfg, reneigh_check=False)
    sim1.run(60)
    sim2.run(60)
    # positions agree modulo the box (PBC remap timing differs: the
    # conditional path wraps only at rebuilds)
    dx = np.asarray(sim1.state.box.min_image(sim1.state.x - sim2.state.x))
    assert np.abs(dx).max() < 1e-9
    for name in ("v", "ucgl", "ucgp"):
        np.testing.assert_allclose(np.asarray(getattr(sim1.state, name)),
                                   np.asarray(getattr(sim2.state, name)),
                                   atol=1e-9, err_msg=name)
    # the conditional path must also hold under the fused multi-block driver
    sim3 = _build_sim(np.random.default_rng(21), n=128, L=9.0)
    sim3.run_fused(12, run_window=(0, 60))
    np.testing.assert_allclose(np.asarray(sim3.state.x),
                               np.asarray(sim1.state.x), atol=1e-9)
