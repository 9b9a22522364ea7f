"""Restricted-triclinic box support (stock-LAMMPS capability of the implied
L0 runtime; the UCG package itself never exercises tilt).  min_image/wrap
against explicit 27-image search, end-to-end pair forces on the nsq path,
and data-file round-trip of the ``xy xz yz`` header."""

import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState
from lammps_ucg_dev_tpu.models import pair_ucgld
from lammps_ucg_dev_tpu.ops import neighbor as nb


def _tilted_box(L=9.0, xy=1.5, xz=-1.0, yz=0.8):
    return Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64,
                      tilt=[xy, xz, yz])


def _h(box):
    return np.asarray(box.h_matrix)


def _brute_min_image(dr, H):
    """Explicit minimum over the 27 neighboring images."""
    shifts = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], np.float64)
    cand = dr[:, None, :] - shifts[None, :, :] @ H.T
    nrm = np.sum(cand**2, axis=-1)
    pick = np.argmin(nrm, axis=1)
    return cand[np.arange(len(dr)), pick]


@pytest.mark.quick
def test_min_image_matches_27_image_search(rng):
    box = _tilted_box()
    H = _h(box)
    # random displacements spanning multiple cells
    dr = rng.uniform(-12, 12, (500, 3))
    got = np.asarray(box.min_image(jnp.asarray(dr)))
    want = _brute_min_image(dr, H)
    # the sequential-rounds min_image is exact for displacements whose true
    # image is within one cell in each direction (the neighbor-list regime)
    r_got = np.linalg.norm(got, axis=1)
    r_want = np.linalg.norm(want, axis=1)
    close = r_want < 3.5          # within a cutoff-like radius
    np.testing.assert_allclose(r_got[close], r_want[close], atol=1e-12)


@pytest.mark.quick
def test_wrap_roundtrip_and_fractional_range(rng):
    box = _tilted_box()
    H = _h(box)
    x = rng.uniform(-15, 25, (300, 3))
    image = jnp.zeros((300, 3), jnp.int32)
    xw, im = box.wrap(jnp.asarray(x), image)
    xw = np.asarray(xw)
    # fractional coordinates inside [0, 1)
    s = np.linalg.solve(H, (xw - np.asarray(box.lo)).T).T
    assert s.min() > -1e-12 and s.max() < 1 + 1e-12
    # unwrap identity: x = x_w + H @ image
    np.testing.assert_allclose(xw + np.asarray(im) @ H.T, x, atol=1e-9)


def test_triclinic_pair_forces_match_explicit_images(rng):
    """table_ucgld on a tilted box (nsq list) == direct sum with explicit
    periodic images."""
    st, bank, tp, rc = helpers.build_two_state()
    L = 9.5
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64,
                     tilt=[1.2, -0.9, 0.7])
    H = _h(box)
    n = 96
    s = rng.uniform(0, 1, (n, 3))
    x = s @ H.T
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), box=box, dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, rc, 0.4, method="nsq")
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float64))
    nbr = nb.build(state.x, state.box, spec)
    out = pair_ucgld.compute(state, nbr, params)

    # oracle: explicit 27-image direct sum using the same table bank
    ev = helpers.make_tables_eval(bank)
    lam = np.asarray(state.ucgl)
    f_ref = np.zeros((n, 3))
    pe_ref = 0.0
    shifts = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], np.float64) @ H.T
    cutsq = float(np.asarray(tp.cutsq)[1, 1])
    t4 = np.asarray(tp.tab4)[1, 1]
    for i in range(n):
        for j in range(n):
            for sft in shifts:
                if i == j and np.all(sft == 0):
                    continue
                d = x[i] - x[j] - sft
                rsq = float(d @ d)
                if rsq >= cutsq:
                    continue
                wi = np.array([1 - lam[i], lam[i]])
                wj = np.array([1 - lam[j], lam[j]])
                for si in range(2):
                    for sj in range(2):
                        e, fp = ev(int(t4[si, sj]), rsq)
                        w = wi[si] * wj[sj]
                        f_ref[i] += w * fp * d
                        pe_ref += 0.5 * w * e
    np.testing.assert_allclose(np.asarray(out.f), f_ref, atol=1e-9)
    np.testing.assert_allclose(float(out.pe), pe_ref, rtol=1e-9)


@pytest.mark.quick
def test_cell_list_rejects_triclinic(rng):
    box = _tilted_box()
    spec = nb.make_spec(512, [9.0] * 3, 2.5, 0.4, method="cell")
    with pytest.raises(ValueError, match="orthogonal"):
        nb.build(jnp.zeros((512, 3), jnp.float64), box, spec)


@pytest.mark.quick
def test_data_file_tilt_roundtrip(tmp_path, rng):
    from lammps_ucg_dev_tpu.io import data as dio
    from lammps_ucg_dev_tpu.core.state import System

    box = _tilted_box()
    n = 16
    s = rng.uniform(0.05, 0.95, (n, 3))
    x = s @ _h(box).T
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), box=box, dtype=jnp.float64)
    system = System(n_atoms=n, ntypes=1, masses=np.ones(2))
    path = str(tmp_path / "tri.data")
    dio.write_data(path, state, system)
    df = dio.read_data(path, atom_style="ucg")
    np.testing.assert_allclose(df.box_tilt, [1.5, -1.0, 0.8], atol=1e-12)
    np.testing.assert_allclose(df.x, x, atol=1e-9)
