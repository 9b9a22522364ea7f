"""Bonded force styles (harmonic bond/angle), special-bond exclusions, and
the molecular cluster_switch deck (multi-atom molecules — the reference's
molecule-majority regime, fix_cluster_switch.cpp:799-893)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.models import bonded as bd
from lammps_ucg_dev_tpu.models import pair_ucgld
from lammps_ucg_dev_tpu.ops import neighbor as nb
from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _trimer_state(rng, nmol=8, L=12.0, r0=0.9, theta=120.0):
    """Bent trimers (default 120°): collinear geometry sits at the arccos
    singularity (s = 0) where angle forces spike and the autodiff oracle is
    undefined — keep the dynamics away from it."""
    n = 3 * nmol
    centers = rng.uniform(1, L - 1, (nmol, 3))
    u1 = rng.normal(size=(nmol, 3))
    u1 /= np.linalg.norm(u1, axis=1, keepdims=True)
    p = rng.normal(size=(nmol, 3))
    p -= np.sum(p * u1, axis=1, keepdims=True) * u1
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    th = np.deg2rad(theta)
    u2 = np.cos(th) * u1 + np.sin(th) * p
    x = np.concatenate([centers + r0 * u1, centers, centers + r0 * u2],
                       axis=1).reshape(-1, 3) % L
    x = (x + rng.normal(0, 0.02, x.shape)) % L
    state = SimState.create(
        x=x, v=rng.normal(0, 0.3, (n, 3)), typ=np.ones(n, np.int32),
        mol=np.repeat(np.arange(1, nmol + 1), 3),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    bonds = []
    angles = []
    bid = aid = 1
    for m in range(nmol):
        a = 3 * m + 1
        bonds.append([bid, 1, a, a + 1]); bid += 1
        bonds.append([bid, 1, a + 1, a + 2]); bid += 1
        angles.append([aid, 1, a, a + 1, a + 2]); aid += 1
    return state, np.asarray(bonds), np.asarray(angles)


def test_bond_force_is_minus_grad_energy(rng):
    state, bonds, angles = _trimer_state(rng)
    params = bd.make_params(bonds, {1: (50.0, 0.9)}, angles,
                            {1: (10.0, 160.0)}, dtype=jnp.float64)
    f, pe, vir = bd.compute(state, params)
    g = jax.grad(lambda x: bd.potential_energy(x, state, params))(state.x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-10)
    assert float(pe) > 0.0


@pytest.mark.quick
def test_bond_force_analytic():
    """Two atoms at r = 1.2 with K=3, r0=1.0: |F| = 2*K*(r-r0) toward r0."""
    state = SimState.create(
        x=np.array([[1.0, 1.0, 1.0], [2.2, 1.0, 1.0]]),
        box=Box.create([0, 0, 0], [10, 10, 10], dtype=jnp.float64),
        dtype=jnp.float64)
    params = bd.make_params([[1, 1, 1, 2]], {1: (3.0, 1.0)},
                            dtype=jnp.float64)
    f, pe, vir = bd.compute(state, params)
    np.testing.assert_allclose(float(pe), 3.0 * 0.2**2, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f)[0],
                               [2 * 3.0 * 0.2, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(f)[1],
                               [-2 * 3.0 * 0.2, 0, 0], atol=1e-12)


@pytest.mark.quick
def test_angle_energy_analytic():
    """Right-angle trimer with theta0 = 90 deg has zero energy and force;
    theta0 = 120 deg gives E = K (pi/6)^2."""
    x = np.array([[1.0, 0, 0], [0.0, 0, 0], [0.0, 1.0, 0]]) + 2.0
    state = SimState.create(
        x=x, box=Box.create([0, 0, 0], [10, 10, 10], dtype=jnp.float64),
        dtype=jnp.float64)
    p90 = bd.make_params(angles=[[1, 1, 1, 2, 3]],
                         angle_coeffs={1: (7.0, 90.0)}, dtype=jnp.float64)
    f, pe, _ = bd.compute(state, p90)
    np.testing.assert_allclose(float(pe), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-10)
    p120 = bd.make_params(angles=[[1, 1, 1, 2, 3]],
                          angle_coeffs={1: (7.0, 120.0)}, dtype=jnp.float64)
    _, pe2, _ = bd.compute(state, p120)
    np.testing.assert_allclose(float(pe2), 7.0 * (np.pi / 6) ** 2, rtol=1e-10)


def test_special_tags():
    bonds = [[1, 1, 1, 2], [2, 1, 2, 3]]
    angles = [[1, 1, 1, 2, 3]]
    s = bd.special_tags(4, bonds=bonds, angles=angles)
    assert set(s[0]) - {0} == {2, 3}      # atom 1: 1-2 with 2, 1-3 with 3
    assert set(s[1]) - {0} == {1, 3}
    assert set(s[2]) - {0} == {1, 2}
    assert set(s[3]) - {0} == set()
    # weights (1,1,1) exclude nothing
    s2 = bd.special_tags(4, bonds=bonds, angles=angles, weights=(1., 1., 1.))
    assert not np.any(s2)
    with pytest.raises(NotImplementedError):
        bd.special_tags(4, bonds=bonds, weights=(0.5, 0.0, 0.0))


@pytest.mark.parametrize("method", ["nsq", "cell"])
def test_exclusions_remove_bonded_pairs(rng, method):
    state, bonds, angles = _trimer_state(rng, nmol=12, L=12.0)
    n = state.n_atoms
    spec = nb.make_spec(n, [12.0] * 3, 2.5, 0.4, method=method)
    excl_tags = bd.special_tags(n, bonds=bonds, angles=angles)
    inv = jnp.arange(n, dtype=jnp.int32)  # unsorted: tag-1 == row
    excl = jnp.where(jnp.asarray(excl_tags) > 0,
                     jnp.asarray(excl_tags, jnp.int32) - 1, n)
    nl0 = nb.build(state.x, state.box, spec)
    nl1 = nb.build(state.x, state.box, spec, excl=excl)
    idx0 = np.asarray(nl0.idx)
    idx1 = np.asarray(nl1.idx)
    for row in np.asarray(bonds):
        i, j = row[2] - 1, row[3] - 1
        assert (j in idx0[i]) and (i in idx0[j])   # bonded pair is in range
        assert (j not in idx1[i]) and (i not in idx1[j])
    for row in np.asarray(angles):
        i, k = row[2] - 1, row[4] - 1
        assert (k not in idx1[i]) and (i not in idx1[k])


def test_nve_conservation_with_bonds(rng):
    """Trimers with pair + bond + angle forces under NVE conserve energy."""
    state, bonds, angles = _trimer_state(rng, nmol=16, L=14.0)
    n = state.n_atoms
    st, bank, tp, rc = helpers.build_two_state()
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    bparams = bd.make_params(bonds, {1: (50.0, 0.9)}, angles,
                             {1: (10.0, 120.0)}, dtype=jnp.float64)
    excl = bd.special_tags(n, bonds=bonds, angles=angles)
    spec = nb.make_spec(n, [14.0] * 3, rc, 0.4, method="nsq")
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=0.001, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    reneigh_every=5)
    sim = Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                     bonded=bparams, excl_tags=excl)

    def hamiltonian():
        row = sim.thermo()
        mu = float(jnp.sum(jnp.where(tp.n_states[sim.state.typ] > 1,
                                     sim.state.ucgl * tp.mu_diff[sim.state.typ],
                                     0.0)))
        return row["etotal"] + mu

    sim.setup((0, 200))
    sim.run(10)
    e0 = hamiltonian()
    sim.run(190)
    e1 = hamiltonian()
    assert abs(e1 - e0) / max(abs(e0), 1e-12) < 1e-4


def test_molecular_switch_deck(tmp_path):
    """End-to-end molecular deck: 3-atom bonded molecules under
    cluster_switch — bonds hold molecules together while whole molecules
    flip type; switching statistics move."""
    from make_deck import write_molecular_switch_deck

    from lammps_ucg_dev_tpu.compat.script import ScriptRunner

    deck = write_molecular_switch_deck(str(tmp_path), nmol=27, nsteps=60,
                                       switch_freq=20, thermo_every=20)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_file(deck)
    sim = r.sim
    assert np.all(np.isfinite(np.asarray(sim.state.x)))
    # whole molecules share one type after switching
    typ = np.asarray(sim.state.typ).reshape(-1, 3)
    assert np.all(typ == typ[:, :1])
    # switch attempts were made
    stats = np.asarray(sim.cswitch_stats.v)
    assert stats[0] > 0
    # bonds stayed intact: max bond extension bounded
    x = np.asarray(sim.state.x)
    L = float(np.asarray(sim.state.box.lengths)[0])
    for m in range(typ.shape[0]):
        for (i, j) in ((3 * m, 3 * m + 1), (3 * m + 1, 3 * m + 2)):
            d = x[i] - x[j]
            d -= L * np.round(d / L)
            assert 0.4 < np.linalg.norm(d) < 1.6


def _respa_sim(rng, respa_inner, dt, bond_k=400.0):
    state, bonds, angles = _trimer_state(rng, nmol=16, L=14.0)
    n = state.n_atoms
    st, bank, tp, rc = helpers.build_two_state()
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    bparams = bd.make_params(bonds, {1: (bond_k, 0.9)}, angles,
                             {1: (10.0, 120.0)}, dtype=jnp.float64)
    excl = bd.special_tags(n, bonds=bonds, angles=angles)
    spec = nb.make_spec(n, [14.0] * 3, rc, 0.4, method="nsq")
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=dt, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    reneigh_every=5, respa_inner=respa_inner)
    return Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                      bonded=bparams, excl_tags=excl)


def _drift(sim, tp, nsteps=200):
    def hamiltonian():
        row = sim.thermo()
        mu = float(jnp.sum(jnp.where(tp.n_states[sim.state.typ] > 1,
                                     sim.state.ucgl * tp.mu_diff[sim.state.typ],
                                     0.0)))
        return row["etotal"] + mu

    sim.setup((0, nsteps))
    sim.run(5)
    e0 = hamiltonian()
    sim.run(nsteps - 5)
    return abs(hamiltonian() - e0) / abs(e0)


def test_respa_conserves_energy(rng):
    """2-level r-RESPA (stiff bonds inner, pair outer): at an outer dt too
    large for single-level Verlet, respa_inner=4 conserves energy much
    better (fix_nve_ucgld.cpp:155-173 multi-timestep paths)."""
    _, bank, tp, rc = helpers.build_two_state()
    d_respa = _drift(_respa_sim(np.random.default_rng(3), 4, 0.004), tp)
    d_plain = _drift(_respa_sim(np.random.default_rng(3), 1, 0.004), tp)
    assert d_respa < 2e-4, d_respa
    assert d_respa < d_plain / 5, (d_respa, d_plain)


def test_run_style_respa_deck(tmp_path):
    """run_style respa flows from an input deck into the driver."""
    from make_deck import write_molecular_switch_deck

    from lammps_ucg_dev_tpu.compat.script import ScriptRunner

    deck = write_molecular_switch_deck(str(tmp_path), nmol=16, nsteps=40,
                                       switch_freq=20, thermo_every=20)
    text = open(deck).read().replace(
        "timestep", "run_style respa 2 4 bond 1 pair 2\ntimestep")
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)
    assert r.sim.cfg.respa_inner == 4
    assert np.all(np.isfinite(np.asarray(r.sim.state.x)))


def test_fix_group_masks(tmp_path):
    """fix <group> honors per-atom group masks: atoms outside the
    integrator's group are frozen, and the λ thermostat only heats its
    group (reference mask[i] & groupbit, fix_nve_ucgld.cpp:64)."""
    from make_deck import write_molecular_switch_deck

    from lammps_ucg_dev_tpu.compat.script import ScriptRunner

    write_molecular_switch_deck(str(tmp_path), nmol=27, nsteps=10)
    deck = "\n".join([
        "units lj", "atom_style ucg", "read_data system.data",
        "pair_style table_ucgld linear 1200 mol.settings",
        "pair_coeff 1 1 1 1 mol.table T11 2.5",
        "pair_coeff 1 2 1 1 mol.table T12 2.5",
        "pair_coeff 2 2 1 1 mol.table T22 2.5",
        "bond_style harmonic", "bond_coeff 1 50.0 0.9",
        "angle_style harmonic", "angle_coeff 1 10.0 180.0",
        "neighbor 0.4 bin", "neigh_modify every 5",
        "timestep 0.002",
        "group mobile type 1",
        "velocity all create 0.8 7",
        "fix 1 mobile nve/ucgld",
        "run 20",
    ])
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    x0 = None

    class Cap:
        pass

    r.run_string("\n".join(deck.splitlines()[:-1]))  # everything but run
    x0 = np.asarray(r.state.x).copy()
    typ = np.asarray(r.state.typ)
    r.command("run 20")
    x1 = np.asarray(r.sim.state.x)
    moved = np.linalg.norm(x1 - x0, axis=1)
    assert np.all(moved[typ == 2] == 0.0), "non-group atoms must stay frozen"
    assert np.mean(moved[typ == 1] > 0) > 0.9, "group atoms must move"

    with pytest.raises(ValueError, match="undefined group"):
        rr = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                          log_callback=lambda m: None)
        rr.run_string("\n".join(deck.splitlines()[:-2]
                                + ["fix 9 nosuch nve/ucgld"]))


def test_respa_honors_group_masks(tmp_path):
    """r-RESPA paths must honor the fix group like the Verlet path (review
    finding: respa_outer/inner previously integrated ALL atoms)."""
    from make_deck import write_molecular_switch_deck

    from lammps_ucg_dev_tpu.compat.script import ScriptRunner

    write_molecular_switch_deck(str(tmp_path), nmol=27, nsteps=10)
    deck = "\n".join([
        "units lj", "atom_style ucg", "read_data system.data",
        "pair_style table_ucgld linear 1200 mol.settings",
        "pair_coeff 1 1 1 1 mol.table T11 2.5",
        "pair_coeff 1 2 1 1 mol.table T12 2.5",
        "pair_coeff 2 2 1 1 mol.table T22 2.5",
        "bond_style harmonic", "bond_coeff 1 50.0 0.9",
        "angle_style harmonic", "angle_coeff 1 10.0 180.0",
        "run_style respa 2 4 bond 1 pair 2",
        "neighbor 0.4 bin", "neigh_modify every 5",
        "timestep 0.002",
        "group mobile type 1",
        "velocity all create 0.8 7",
        "fix 1 mobile nve/ucgld",
    ])
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(deck)
    x0 = np.asarray(r.state.x).copy()
    typ = np.asarray(r.state.typ)
    r.command("run 20")
    moved = np.linalg.norm(np.asarray(r.sim.state.x) - x0, axis=1)
    assert np.all(moved[typ == 2] == 0.0), "non-group atoms must stay frozen"
    assert np.mean(moved[typ == 1] > 0) > 0.9

    with pytest.raises(ValueError, match="inner loop"):
        rr = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                          log_callback=lambda m: None)
        rr.run_string("run_style respa 2 0 bond 1 pair 2")


@pytest.mark.quick
def test_group_union_and_stride(tmp_path):
    """Repeated group commands accumulate (LAMMPS additive semantics) and
    i:j:stride ranges honor the stride."""
    from make_deck import write_molecular_switch_deck

    from lammps_ucg_dev_tpu.compat.script import ScriptRunner

    write_molecular_switch_deck(str(tmp_path), nmol=27, nsteps=10)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string("units lj\natom_style ucg\nread_data system.data\n"
                 "group odd id 1:9:2\n")
    assert r.groups["odd"].sum() == 5          # ids 1,3,5,7,9
    r.command("group odd id 2:4")
    assert r.groups["odd"].sum() == 5 + 3 - 1  # union adds 2,4 (3 in both)


# ---- dihedral / improper harmonic (stock styles the molecular atom style
# implies: atom_vec_ucg.cpp:33-96 carries dihedrals/impropers through every
# comm path; forces come from stock dihedral_harmonic / improper_harmonic) --

def _butane_frame(phi_deg):
    """4-atom chain with torsion angle phi (cis = 0 convention): r2 at the
    origin, b2 along x, r1 in the +y half-plane, r4 rotated by phi."""
    phi = np.deg2rad(phi_deg)
    r2 = np.array([3.0, 3.0, 3.0])
    r3 = r2 + [1.0, 0, 0]
    r1 = r2 + np.array([-0.5, 0.866, 0.0])
    r4 = r3 + [0.5, 0.866 * np.cos(phi), 0.866 * np.sin(phi)]
    return np.stack([r1, r2, r3, r4])


def _state_of(x):
    return SimState.create(
        x=x, box=Box.create([0, 0, 0], [10, 10, 10], dtype=jnp.float64),
        dtype=jnp.float64)


@pytest.mark.parametrize("phi,expect_of_k", [
    (0.0, lambda K: 2 * K),        # cis: E = K(1 + cos 0)
    (90.0, lambda K: K),           # E = K(1 + cos 90) = K
    (180.0, lambda K: 0.0),        # trans minimum for d=+1, n=1
])
def test_dihedral_energy_analytic(phi, expect_of_k):
    state = _state_of(_butane_frame(phi))
    p = bd.make_params(dihedrals=[[1, 1, 1, 2, 3, 4]],
                       dihedral_coeffs={1: (5.0, 1.0, 1)},
                       dtype=jnp.float64)
    f, pe, vir = bd.compute(state, p)
    np.testing.assert_allclose(float(pe), expect_of_k(5.0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(f).sum(0), 0.0, atol=1e-10)


@pytest.mark.quick
def test_dihedral_multiplicity_and_sign():
    """E = K[1 + d cos(n phi)]: n = 2 doubles the angle, d = -1 flips."""
    state = _state_of(_butane_frame(90.0))
    p = bd.make_params(dihedrals=[[1, 1, 1, 2, 3, 4]],
                       dihedral_coeffs={1: (3.0, 1.0, 2)}, dtype=jnp.float64)
    _, pe, _ = bd.compute(state, p)
    np.testing.assert_allclose(float(pe), 3.0 * (1 + np.cos(np.pi)),
                               atol=1e-10)                    # = 0
    p2 = bd.make_params(dihedrals=[[1, 1, 1, 2, 3, 4]],
                        dihedral_coeffs={1: (3.0, -1.0, 1)},
                        dtype=jnp.float64)
    _, pe2, _ = bd.compute(state, p2)
    np.testing.assert_allclose(float(pe2), 3.0 * (1 - np.cos(np.pi / 2)),
                               atol=1e-10)                    # = 3


@pytest.mark.quick
def test_improper_energy_analytic():
    """Planar frame: chi = 0 -> E = 0 and zero force at chi0 = 0; the
    chi0 = 30 deg case gives E = K(pi/2 - pi/6)^2 at chi = 90."""
    p0 = bd.make_params(impropers=[[1, 1, 1, 2, 3, 4]],
                        improper_coeffs={1: (4.0, 0.0)}, dtype=jnp.float64)
    f, pe, _ = bd.compute(_state_of(_butane_frame(0.0)), p0)
    np.testing.assert_allclose(float(pe), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-9)
    p30 = bd.make_params(impropers=[[1, 1, 1, 2, 3, 4]],
                         improper_coeffs={1: (4.0, 30.0)}, dtype=jnp.float64)
    _, pe2, _ = bd.compute(_state_of(_butane_frame(90.0)), p30)
    np.testing.assert_allclose(float(pe2), 4.0 * (np.pi / 2 - np.pi / 6) ** 2,
                               rtol=1e-10)


def _tetramer_state(rng, nmol=12, L=14.0):
    """Random non-degenerate 4-atom chains + full topology."""
    n = 4 * nmol
    xs = []
    for m in range(nmol):
        base = rng.uniform(2, L - 2, 3)
        pts = [base]
        for _ in range(3):
            step = rng.normal(size=3)
            step /= np.linalg.norm(step)
            # reject near-collinear continuations (torsion undefined)
            while len(pts) >= 2:
                prev = pts[-1] - pts[-2]
                prev /= np.linalg.norm(prev)
                if abs(step @ prev) < 0.8:
                    break
                step = rng.normal(size=3)
                step /= np.linalg.norm(step)
            pts.append(pts[-1] + 0.9 * step)
        xs.append(np.stack(pts))
    x = np.concatenate(xs) % L
    state = SimState.create(
        x=x, v=rng.normal(0, 0.3, (n, 3)), typ=np.ones(n, np.int32),
        mol=np.repeat(np.arange(1, nmol + 1), 4),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    bonds, angles, diheds, imps = [], [], [], []
    for m in range(nmol):
        a = 4 * m + 1
        for k in range(3):
            bonds.append([3 * m + k + 1, 1, a + k, a + k + 1])
        angles.append([2 * m + 1, 1, a, a + 1, a + 2])
        angles.append([2 * m + 2, 1, a + 1, a + 2, a + 3])
        diheds.append([m + 1, 1, a, a + 1, a + 2, a + 3])
        imps.append([m + 1, 1, a, a + 1, a + 2, a + 3])
    return state, (np.asarray(bonds), np.asarray(angles),
                   np.asarray(diheds), np.asarray(imps))


def test_torsion_force_is_minus_grad_energy(rng):
    state, (bonds, angles, diheds, imps) = _tetramer_state(rng)
    params = bd.make_params(
        bonds, {1: (50.0, 0.9)}, angles, {1: (10.0, 110.0)},
        dihedrals=diheds, dihedral_coeffs={1: (2.0, 1.0, 3)},
        impropers=imps, improper_coeffs={1: (1.5, 35.0)},
        dtype=jnp.float64)
    f, pe, vir = bd.compute(state, params)
    g = jax.grad(lambda x: bd.potential_energy(x, state, params))(state.x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-9)
    assert float(pe) > 0.0
    np.testing.assert_allclose(np.asarray(f).sum(0), 0.0, atol=1e-9)


def test_compute_spatial_matches_compute_torsions(rng):
    """compute_spatial with an identity row map and nloc = n must equal the
    single-chip compute for every term class (incl. 4-body)."""
    state, (bonds, angles, diheds, imps) = _tetramer_state(rng)
    n = state.n_atoms
    params = bd.make_params(
        bonds, {1: (50.0, 0.9)}, angles, {1: (10.0, 110.0)},
        dihedrals=diheds, dihedral_coeffs={1: (2.0, 1.0, 3)},
        impropers=imps, improper_coeffs={1: (1.5, 35.0)},
        dtype=jnp.float64)
    f0, pe0, vir0 = bd.compute(state, params)
    look = lambda t: jnp.asarray(t - 1, jnp.int32)
    rows = {
        "bond": tuple(look(params.bond_tags[:, m]) for m in range(2)),
        "angle": tuple(look(params.angle_tags[:, m]) for m in range(3)),
        "dihedral": tuple(look(params.dihedral_tags[:, m])
                          for m in range(4)),
        "improper": tuple(look(params.improper_tags[:, m])
                          for m in range(4)),
    }
    f1, pe1, vir1 = bd.compute_spatial(state, params, rows, n)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-10)
    np.testing.assert_allclose(float(pe1), float(pe0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vir1), np.asarray(vir0),
                               rtol=1e-9)


def test_nve_conservation_with_torsions(rng):
    """Tetramer chains with pair + all four bonded term classes conserve
    energy under NVE."""
    state, (bonds, angles, diheds, imps) = _tetramer_state(rng, nmol=24,
                                                           L=16.0)
    n = state.n_atoms
    st, bank, tp, rc = helpers.build_two_state()
    state = SimState.create(
        x=np.asarray(state.x), v=np.asarray(state.v),
        typ=np.ones(n, np.int32), mol=np.asarray(state.mol),
        ucgl=np.full(n, 0.5), ucgstate=np.zeros(n, np.int64),
        ucgml=np.full(n, 5.0),
        box=Box.create([0, 0, 0], [16.0] * 3, dtype=jnp.float64),
        dtype=jnp.float64)
    bparams = bd.make_params(
        bonds, {1: (50.0, 0.9)}, angles, {1: (10.0, 110.0)},
        dihedrals=diheds, dihedral_coeffs={1: (2.0, 1.0, 3)},
        impropers=imps, improper_coeffs={1: (1.5, 35.0)},
        dtype=jnp.float64)
    excl = bd.special_tags(n, bonds=bonds, angles=angles, dihedrals=diheds)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    spec = nb.make_spec(n, [16.0] * 3, rc, 0.4, method="nsq")
    cfg = SimConfig(dt=0.001, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld"),
                    reneigh_every=5)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    sim2 = Simulation(system, state, pair_ucgld.compute, params, spec, cfg,
                      bonded=bparams, excl_tags=excl)

    def hamiltonian():
        # conserved quantity under lambda-dynamics: etotal + sum lam*mu_diff
        row = sim2.thermo()
        mu = float(jnp.sum(jnp.where(tp.n_states[sim2.state.typ] > 1,
                                     sim2.state.ucgl
                                     * tp.mu_diff[sim2.state.typ], 0.0)))
        return row["etotal"] + mu

    es = []
    for _ in range(10):
        sim2.run(20)
        es.append(hamiltonian())
    es = np.asarray(es)
    drift = np.abs(es - es[0]).max() / abs(es[0])
    assert drift < 5e-5, f"NVE drift {drift:.2e} with torsion terms"
