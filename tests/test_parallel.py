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
    assert len(jax.devices()) == 8


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
