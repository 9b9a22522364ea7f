"""End-to-end input-script compatibility tests: a reference-style deck
(data + tables + settings + script) drives the engine."""

import os
import pytest
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from make_deck import write_ucgld_deck  # noqa: E402

from lammps_ucg_dev_tpu.compat.script import ScriptRunner  # noqa: E402
from lammps_ucg_dev_tpu.io import dump as dmp  # noqa: E402


def test_ucgld_deck_runs(tmp_path):
    deck = write_ucgld_deck(str(tmp_path), n=128, nsteps=40, dt=0.002,
                            tablength=800, thermo_every=20)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_file(deck)
    assert len(r.thermo_rows) >= 2
    row = r.thermo_rows[-1]
    assert row["step"] == 40
    assert np.isfinite(row["etotal"])
    lam = np.asarray(r.state.ucgl)
    assert lam.min() > -0.5 and lam.max() < 1.5   # wall keeps λ bounded
    assert row["oob_low"] == 0 and row["oob_high"] == 0


def test_deck_with_dump_and_write_data(tmp_path):
    deck = write_ucgld_deck(str(tmp_path), n=64, nsteps=20, dt=0.002,
                            tablength=800)
    text = open(deck).read()
    text = text.replace(
        "thermo 100",
        "dump d1 all custom 10 traj.lammpstrj id mol type x y z ucgstate ucgl ucgp\n"
        "thermo 10",
    )
    text += "write_data final.data\nwrite_restart final.restart.npz\n"
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)
    snaps = dmp.read_dump(str(tmp_path / "traj.lammpstrj"))
    assert [s.step for s in snaps] == [0, 10, 20]
    assert snaps[0].n_atoms == 64
    assert (tmp_path / "final.data").exists()
    assert (tmp_path / "final.restart.npz").exists()

    # restart continuation: read_restart + identical styles + run
    cont = """units lj
atom_style ucg
read_restart final.restart.npz
pair_style table_ucgld linear 800 ucg.settings
pair_coeff 1 1 2 2 ucg.table UCG_00 2.5 ucg.table UCG_01 2.5 ucg.table UCG_10 2.5 ucg.table UCG_11 2.5
timestep 0.002
fix 1 all nve/ucgld/wall/hard bias_potential 0.1
fix 2 all ucgld/langevin 0.8 0.8 0.5 99
fix 3 all ucgstate ld
thermo 10
run 10
"""
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r2.run_string(cont)
    assert r2.thermo_rows[-1]["step"] == 30   # continued from step 20


def test_rerun_state_assignment(tmp_path):
    """rerun + fix ucgstate: posterior/state assignment over a trajectory
    (read_dump.cpp:899-908 + fix_ucgstate.cpp:165-169)."""
    deck = write_ucgld_deck(str(tmp_path), n=64, nsteps=20, dt=0.002,
                            tablength=800)
    text = open(deck).read().replace(
        "thermo 100",
        "dump d1 all custom 10 traj.lammpstrj id type x y z ucgstate ucgl ucgp\n"
        "thermo 100")
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)

    rerun_deck = """units lj
atom_style ucg
read_data system.data
pair_style table_ucgld linear 800 ucg.settings
pair_coeff 1 1 2 2 ucg.table UCG_00 2.5 ucg.table UCG_01 2.5 ucg.table UCG_10 2.5 ucg.table UCG_11 2.5
timestep 0.002
fix 2 all ucgld/langevin 0.8 0.8 0.5 99
fix 3 all ucgstate
dump d2 all custom 1 rerun_out.lammpstrj id ucgstate ucgl ucgp
rerun traj.lammpstrj dump x y z ucgl
"""
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r2.run_string(rerun_deck)
    out = dmp.read_dump(str(tmp_path / "rerun_out.lammpstrj"))
    assert len(out) == 3
    p = out[-1].fields["ucgp"]
    assert np.all((p > 0) & (p < 1))
    # default-mode ucgstate assignment: state == round(p)
    np.testing.assert_array_equal(out[-1].fields["ucgstate"], np.round(p))


@pytest.mark.quick
def test_bethe_deck_runs(tmp_path):
    from make_deck import write_bethe_deck

    deck = write_bethe_deck(str(tmp_path), n=96, nsteps=30, thermo_every=10)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_file(deck)
    assert r.thermo_rows[-1]["step"] == 30
    p = np.asarray(r.state.ucgp)
    assert np.all((p > 0) & (p < 1))
    assert np.isfinite(r.thermo_rows[-1]["etotal"])


def test_bethe_density_deck_runs(tmp_path):
    from make_deck import write_bethe_density_deck

    deck = write_bethe_density_deck(str(tmp_path), n=96, nsteps=40,
                                    switch_freq=20, thermo_every=20)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_file(deck)
    assert r.thermo_rows[-1]["step"] == 40
    assert np.isfinite(r.thermo_rows[-1]["etotal"])
    # cluster_switch ran and logged
    assert (tmp_path / "cluster_assignment.log").exists()
    assert np.asarray(r.sim.cswitch_stats.v)[0] > 0


@pytest.mark.quick
def test_rleucg_deck_runs(tmp_path):
    from make_deck import write_rleucg_deck

    deck = write_rleucg_deck(str(tmp_path), n=96, nsteps=30, thermo_every=10)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_file(deck)
    assert r.thermo_rows[-1]["step"] == 30
    assert np.isfinite(r.thermo_rows[-1]["etotal"])
    lam = np.asarray(r.state.ucgl)
    assert lam.min() > -0.5 and lam.max() < 1.5


def _run_bethe_density_variant(tmp_path, sub, extra_kw, n=96, nsteps=20):
    from make_deck import write_bethe_density_deck

    d = tmp_path / sub
    deck = write_bethe_density_deck(str(d), n=n, nsteps=nsteps,
                                    switch_freq=1000, thermo_every=0)
    text = open(deck).read()
    if extra_kw:
        text = text.replace("ucg.settings", f"ucg.settings {extra_kw}", 1)
    r = ScriptRunner(workdir=str(d), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)
    return np.asarray(r.state.x)


def test_bethe_density_compat_flags_change_physics(tmp_path):
    """pair_cv / backforce_derivative must be reachable from a deck and must
    change the trajectory (they select between the conservative formulation
    and the reference's literal CV back-force,
    pair_table_ucg_bethe_density.cpp:707-732)."""
    x_def = _run_bethe_density_variant(tmp_path, "a", "")
    x_ref = _run_bethe_density_variant(tmp_path, "b", "pair_cv reference")
    x_nbd = _run_bethe_density_variant(tmp_path, "c",
                                       "backforce_derivative no")
    assert np.abs(x_ref - x_def).max() > 1e-10
    assert np.abs(x_nbd - x_def).max() > 1e-10
    # defaults are reproducible
    x_def2 = _run_bethe_density_variant(tmp_path, "d", "")
    np.testing.assert_array_equal(x_def, x_def2)


def test_ucgstate_mc_seed_changes_stream(tmp_path):
    """fix ucgstate mc SEED rate: the seed must select a distinct MC draw
    stream (fix_ucgstate.cpp:37-67)."""
    from make_deck import write_bethe_deck

    def run(sub, seed):
        d = tmp_path / sub
        deck = write_bethe_deck(str(d), n=96, nsteps=30, thermo_every=0)
        text = open(deck).read().replace(
            "fix 3 all ucgstate", f"fix 3 all ucgstate mc {seed} 0.9")
        r = ScriptRunner(workdir=str(d), dtype=jnp.float64,
                         log_callback=lambda m: None)
        r.run_string(text)
        return np.asarray(r.state.ucgstate)

    s_a = run("a", 12345)
    s_b = run("b", 54321)
    s_a2 = run("c", 12345)
    np.testing.assert_array_equal(s_a, s_a2)   # same seed = same stream
    assert np.any(s_a != s_b)                  # different seed = different


def test_rerun_every_is_timestep_multiple(tmp_path):
    """LAMMPS 'rerun ... every N' processes snapshots whose TIMESTEP is a
    multiple of N (read_dump.cpp), not every Nth snapshot."""
    deck = write_ucgld_deck(str(tmp_path), n=64, nsteps=30, dt=0.002,
                            tablength=800)
    text = open(deck).read().replace(
        "thermo 100",
        "dump d1 all custom 10 traj.lammpstrj id type x y z ucgl\nthermo 100")
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)   # snapshots at steps 0, 10, 20, 30

    rerun_deck = """units lj
atom_style ucg
read_data system.data
pair_style table_ucgld linear 800 ucg.settings
pair_coeff 1 1 2 2 ucg.table UCG_00 2.5 ucg.table UCG_01 2.5 ucg.table UCG_10 2.5 ucg.table UCG_11 2.5
timestep 0.002
fix 2 all ucgld/langevin 0.8 0.8 0.5 99
fix 3 all ucgstate
dump d2 all custom 1 rerun_out.lammpstrj id ucgl
rerun traj.lammpstrj every 20 dump x y z ucgl
"""
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r2.run_string(rerun_deck)
    out = dmp.read_dump(str(tmp_path / "rerun_out.lammpstrj"))
    assert [s.step for s in out] == [0, 20]


def test_restart_persists_settings_and_masses(tmp_path):
    """write_restart stores pair settings + masses (the reference's
    write_restart_settings, pair_table_ucgld.cpp:1431-1471): a continuation
    deck with a MISMATCHED pair_style errors, and per-type masses survive
    without re-declaration."""
    deck = write_ucgld_deck(str(tmp_path), n=64, nsteps=10, dt=0.002,
                            tablength=800)
    text = open(deck).read().replace("read_data system.data",
                                     "read_data system.data\nmass 1 2.5")
    text += "write_restart chk.npz\n"
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)

    head = "units lj\natom_style ucg\nread_restart chk.npz\n"
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r2.run_string(head)
    assert r2.system.masses[1] == 2.5, "masses must persist through restart"

    with pytest.raises(ValueError, match="restart's stored settings"):
        r3 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                          log_callback=lambda m: None)
        r3.run_string(head +
                      "pair_style table_ucgld spline 900 ucg.settings\n")

    with pytest.raises(ValueError, match="units"):
        r4 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                          log_callback=lambda m: None)
        r4.run_string("units real\natom_style ucg\nread_restart chk.npz\n")


@pytest.mark.parametrize("procs,kind", [("3 1 1", "slab"),
                                        ("3 3 1", "pencil")])
@pytest.mark.slow
def test_processors_command_multichip_deck(tmp_path, procs, kind):
    """The LAMMPS ``processors Px Py Pz`` command maps onto the TPU device
    mesh: the SAME deck runs single-device, on Px slabs, and on a Px x Py
    pencil mesh with matching thermo (f64; tag-keyed RNG makes the
    trajectory decomposition-invariant)."""
    logs = []
    deck = write_ucgld_deck(str(tmp_path), n=512, nsteps=40, dt=0.002,
                            tablength=800, thermo_every=20)
    text = open(deck).read()

    r1 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r1.run_string(text)

    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=logs.append)
    r2.run_string(f"processors {procs}\n" + text)
    assert any(kind in m for m in logs if "multi-chip" in m), logs

    assert len(r2.thermo_rows) == len(r1.thermo_rows)
    for a, b in zip(r1.thermo_rows, r2.thermo_rows):
        assert a["step"] == b["step"]
        for k in ("temp", "pe", "ke", "etotal"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-9, err_msg=k)
    o1 = np.argsort(np.asarray(r1.state.tag))
    o2 = np.argsort(np.asarray(r2.state.tag))
    np.testing.assert_allclose(np.asarray(r2.state.v)[o2],
                               np.asarray(r1.state.v)[o1], atol=1e-10)


@pytest.mark.quick
def test_processors_command_validation(tmp_path):
    deck = write_ucgld_deck(str(tmp_path), n=64, nsteps=0)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    with pytest.raises(ValueError, match="Pz must be 1"):
        r.command("processors 2 2 2")
    with pytest.raises(ValueError, match="exceeds"):
        r.command("processors 99 9 1")


@pytest.mark.slow
def test_processors_infeasible_geometry_falls_back_to_gspmd(tmp_path):
    """A ``processors`` deck whose box is too small for the requested cut
    count (4 slabs of width >= cutoff+skin don't fit 48 molecules): the
    runner falls back to the GSPMD atom decomposition instead of erroring
    (bit-exact vs single device)."""
    from make_deck import write_molecular_switch_deck

    deck = write_molecular_switch_deck(str(tmp_path), nmol=48, nsteps=40,
                                       thermo_every=20)
    text = open(deck).read()
    r1 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r1.run_file(deck)
    logs = []
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=logs.append)
    r2.run_string("processors 4 1 1\n" + text)
    assert any("GSPMD" in m for m in logs), logs
    for a, b in zip(r1.thermo_rows, r2.thermo_rows):
        for k in ("temp", "pe", "etotal"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-12, err_msg=k)


@pytest.mark.slow
def test_processors_bonded_deck_uses_spatial(tmp_path):
    """A bonded/exclusion molecular deck with ``processors`` rides the
    SPATIAL slab driver (replicated topology + per-block tag→row maps):
    thermo matches the single-device run to f64 tolerance."""
    from make_deck import write_molecular_ucgld_deck

    deck = write_molecular_ucgld_deck(str(tmp_path), nmol=256, rho=0.25,
                                      nsteps=40, thermo_every=20)
    text = open(deck).read()
    r1 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r1.run_file(deck)
    logs = []
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=logs.append)
    r2.run_string("processors 3 1 1\n" + text)
    assert any("slab" in m for m in logs if "multi-chip" in m), logs
    assert len(r2.thermo_rows) == len(r1.thermo_rows)
    for a, b in zip(r1.thermo_rows, r2.thermo_rows):
        assert a["step"] == b["step"]
        for k in ("temp", "pe", "etotal"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-9, err_msg=k)


@pytest.mark.slow
def test_tetramer_deck_full_topology(tmp_path):
    """Deck with all four bonded term classes (bonds/angles/dihedrals/
    impropers) + 1-2/1-3/1-4 exclusions runs healthily single-chip, and the
    spatial slab run (processors 3 1 1) reproduces its thermo exactly —
    the 4-body terms ride the per-block tag→row maps."""
    from make_deck import write_molecular_tetramer_deck

    deck = write_molecular_tetramer_deck(str(tmp_path), nmol=128, nsteps=40,
                                         thermo_every=20)
    text = open(deck).read()
    r1 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r1.run_file(deck)
    assert len(r1.thermo_rows) == 3
    for row in r1.thermo_rows:
        assert np.isfinite(row["etotal"])
        assert row["temp"] < 3.0
    logs = []
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=logs.append)
    r2.run_string("processors 3 1 1\n" + text)
    assert any("slab" in m for m in logs if "multi-chip" in m), logs
    for a, b in zip(r1.thermo_rows, r2.thermo_rows):
        assert a["step"] == b["step"]
        for k in ("temp", "pe", "etotal"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-9, err_msg=k)


@pytest.mark.slow
def test_respa_deck_rides_spatial(tmp_path):
    """A bonded molecular deck under run_style respa WITH ``processors``
    now rides the spatial slab driver (respa bodies run per device with
    inner-loop x halo refreshes); thermo matches single-chip respa."""
    from make_deck import write_molecular_ucgld_deck

    deck = write_molecular_ucgld_deck(str(tmp_path), nmol=256, rho=0.25,
                                      nsteps=40, thermo_every=20)
    text = open(deck).read().replace(
        "thermo ", "run_style respa 2 2 bond 1 pair 2\nthermo ")
    r1 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r1.run_string(text)
    logs = []
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=logs.append)
    r2.run_string("processors 3 1 1\n" + text)
    assert any("slab" in m for m in logs if "multi-chip" in m), logs
    assert len(r2.thermo_rows) == len(r1.thermo_rows) == 3
    for a, b in zip(r1.thermo_rows, r2.thermo_rows):
        for k in ("temp", "pe", "etotal"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-9, err_msg=k)


def test_write_data_round_trips_topology(tmp_path):
    """LAMMPS write_data re-emits molecular topology: a tetramer deck's
    bonds/angles/dihedrals/impropers survive a write_data -> read_data
    round trip (atom tags are stable, so rows match exactly)."""
    from make_deck import write_molecular_tetramer_deck
    from lammps_ucg_dev_tpu.io import data as dio

    deck = write_molecular_tetramer_deck(str(tmp_path), nmol=32, nsteps=5,
                                         thermo_every=5)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_file(deck)
    r.command("write_data roundtrip.data")
    df2 = dio.read_data(str(tmp_path / "roundtrip.data"))
    df1 = r.datafile
    for name in ("bonds", "angles", "dihedrals", "impropers"):
        a, b = getattr(df1, name), getattr(df2, name)
        assert b is not None and len(b) == len(a), name
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=name)
