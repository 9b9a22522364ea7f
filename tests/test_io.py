"""I/O layer tests: data files, dumps (+ thresholds, rerun ingestion),
binary restart round-trips."""

import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.io import data as dio
from lammps_ucg_dev_tpu.io import dump as dmp
from lammps_ucg_dev_tpu.io import restart as rst
import pytest

pytestmark = pytest.mark.quick


def _state(rng, n=20, L=10.0):
    return SimState.create(
        x=rng.uniform(0, L, (n, 3)), v=rng.normal(0, 1, (n, 3)),
        typ=rng.integers(1, 3, n), mol=rng.integers(1, 5, n),
        q=rng.normal(0, 0.1, n), ucgstate=rng.integers(0, 2, n),
        ucgl=rng.uniform(0, 1, n), ucgvl=rng.normal(0, 1, n),
        ucgml=rng.uniform(1, 3, n), ucgp=rng.uniform(0, 1, n),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)


def test_data_roundtrip(rng, tmp_path):
    state = _state(rng)
    system = System(n_atoms=20, ntypes=2, masses=np.array([0.0, 1.0, 2.5]))
    path = tmp_path / "sys.data"
    dio.write_data(str(path), state, system)
    df = dio.read_data(str(path), atom_style="ucg")
    assert df.n_atoms == 20 and df.n_types == 2
    np.testing.assert_allclose(df.masses, system.masses)
    np.testing.assert_allclose(df.x, np.asarray(state.x), rtol=1e-12)
    np.testing.assert_allclose(df.v, np.asarray(state.v), rtol=1e-12)
    np.testing.assert_allclose(df.q, np.asarray(state.q), rtol=1e-12)
    np.testing.assert_array_equal(df.typ, np.asarray(state.typ))
    np.testing.assert_array_equal(df.mol, np.asarray(state.mol))
    np.testing.assert_array_equal(df.ucgstate, np.asarray(state.ucgstate))
    np.testing.assert_allclose(df.ucgl, np.asarray(state.ucgl), rtol=1e-12)
    np.testing.assert_allclose(df.ucgml, np.asarray(state.ucgml), rtol=1e-12)
    np.testing.assert_allclose(df.ucgvl, np.asarray(state.ucgvl), rtol=1e-12)


def test_data_clamps(tmp_path):
    """data_atom_post behavior: λ clamped to [0,1], state to {0,1}."""
    text = """test deck

2 atoms
1 atom types

0 10 xlo xhi
0 10 ylo yhi
0 10 zlo zhi

Masses

1 1.0

Atoms # ucg

1 1 1 0.0 1.0 1.0 1.0 5 1.7 2.0
2 1 1 0.0 2.0 2.0 2.0 -3 -0.5 2.0
"""
    p = tmp_path / "clamp.data"
    p.write_text(text)
    df = dio.read_data(str(p))
    np.testing.assert_array_equal(df.ucgstate, [1, 0])
    np.testing.assert_allclose(df.ucgl, [1.0, 0.0])


def test_dump_write_read_and_thresholds(rng, tmp_path):
    state = _state(rng)
    path = tmp_path / "traj.lammpstrj"
    w = dmp.DumpWriter(str(path), columns=("id", "type", "x", "y", "z",
                                           "ucgstate", "ucgl", "ucgp"))
    w.write(state, step=0)
    w.write(state, step=10)
    snaps = dmp.read_dump(str(path))
    assert len(snaps) == 2
    assert snaps[1].step == 10
    np.testing.assert_allclose(
        np.sort(snaps[0].fields["ucgl"]),
        np.sort(np.asarray(state.ucgl)), rtol=1e-6)

    # thresholds — including ucgp, which is dead code in the reference
    # (dump_custom.cpp:1199-1204)
    w2 = dmp.DumpWriter(str(tmp_path / "t.lammpstrj"),
                        columns=("id", "ucgp"))
    w2.modify_thresh("ucgp", ">", 0.5)
    w2.write(state, step=0)
    s = dmp.read_dump(str(tmp_path / "t.lammpstrj"))[0]
    assert s.n_atoms == int(np.sum(np.asarray(state.ucgp) > 0.5))
    assert np.all(s.fields["ucgp"] > 0.5)


def test_rerun_ingestion(rng, tmp_path):
    """read_dump/rerun: re-ingest positions + UCG state from a dump."""
    state = _state(rng)
    path = tmp_path / "traj.lammpstrj"
    w = dmp.DumpWriter(str(path), columns=("id", "type", "x", "y", "z",
                                           "ucgstate", "ucgl", "ucgp"))
    w.write(state, step=5)
    snaps = dmp.read_dump(str(path))

    blank = _state(np.random.default_rng(999))
    st2 = dmp.apply_snapshot(blank, snaps[0],
                             fields=("x", "y", "z", "ucgstate", "ucgl", "ucgp"))
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(state.x),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(st2.ucgstate),
                                  np.asarray(state.ucgstate))
    np.testing.assert_allclose(np.asarray(st2.ucgp), np.asarray(state.ucgp),
                               rtol=1e-6)


def test_restart_roundtrip(rng, tmp_path):
    state = _state(rng)
    path = str(tmp_path / "chk.npz")
    rst.write_restart(path, state, extra={"cswitch_stats": np.arange(7.0)})
    st2, extra = rst.read_restart(path, dtype=jnp.float64)
    for field in ("x", "v", "q", "ucgl", "ucgvl", "ucgml", "ucgp"):
        np.testing.assert_allclose(np.asarray(getattr(st2, field)),
                                   np.asarray(getattr(state, field)))
    for field in ("typ", "mol", "ucgstate", "image"):
        np.testing.assert_array_equal(np.asarray(getattr(st2, field)),
                                      np.asarray(getattr(state, field)))
    assert int(st2.step) == int(state.step)
    np.testing.assert_array_equal(extra["cswitch_stats"], np.arange(7.0))
    assert st2.box.periodic == state.box.periodic
