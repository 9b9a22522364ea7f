"""Unit tests for the tabulated-potential substrate (SURVEY.md §4.1):
spline fit + all interpolation modes vs an analytic Lennard-Jones potential.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_ucg_dev_tpu.io import table_io
from lammps_ucg_dev_tpu.ops import table as tbl
from lammps_ucg_dev_tpu.ops.spline import spline, splint


def lj(r, eps=1.0, sig=1.0):
    sr6 = (sig / r) ** 6
    e = 4 * eps * (sr6**2 - sr6)
    f = 24 * eps * (2 * sr6**2 - sr6) / r  # -dE/dr
    return e, f


def make_raw(n=1000, rlo=0.8, rhi=3.0):
    r = np.linspace(rlo, rhi, n)
    e, f = lj(r)
    return table_io.RawTable(r=r, e=e, f=f, rflag=table_io.RLINEAR, rlo=rlo, rhi=rhi)


def test_spline_reproduces_cubic():
    # a cubic is represented exactly by a cubic spline with exact end slopes
    x = np.linspace(0.0, 2.0, 30)
    y = 1.0 + 2 * x - 0.5 * x**2 + 0.25 * x**3
    yp = lambda t: 2 - t + 0.75 * t**2
    y2 = spline(x, y, yp(x[0]), yp(x[-1]))
    xq = np.linspace(0.0, 2.0, 257)
    yq = splint(x, y, y2, xq)
    np.testing.assert_allclose(yq, 1.0 + 2 * xq - 0.5 * xq**2 + 0.25 * xq**3,
                               rtol=0, atol=1e-10)


@pytest.mark.parametrize("style", [tbl.LOOKUP, tbl.LINEAR, tbl.SPLINE])
def test_interp_matches_analytic(style):
    raw = make_raw()
    built = tbl.build_table(raw, style, 2000, cut=3.0)
    bank = tbl.TableBank.from_built([built], style, dtype=jnp.float64)

    r = np.linspace(1.0, 2.8, 173)
    rsq = jnp.asarray(r * r)
    t = jnp.zeros_like(rsq, dtype=jnp.int32)
    e, fp, lo, hi = bank.interp(t, rsq)

    e_ref, f_ref = lj(r)
    # stored f is f(r)/r -> force magnitude = fp * r
    # LOOKUP returns the bin-midpoint value (bin width ~4e-3 in r²), so it is
    # inherently first-order; LINEAR/SPLINE interpolate within the bin.
    tol = {tbl.LOOKUP: 3e-2, tbl.LINEAR: 5e-4, tbl.SPLINE: 1e-5}[style]
    np.testing.assert_allclose(np.asarray(e), e_ref, atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(fp) * r, f_ref, atol=10 * tol, rtol=10 * tol)
    assert not np.any(np.asarray(lo))
    assert not np.any(np.asarray(hi))


def test_oob_flags():
    raw = make_raw()
    built = tbl.build_table(raw, tbl.LINEAR, 500, cut=3.0)
    bank = tbl.TableBank.from_built([built], tbl.LINEAR, dtype=jnp.float64)
    rsq = jnp.asarray([0.5**2, 1.5**2, 3.5**2])
    t = jnp.zeros(3, jnp.int32)
    _, _, lo, hi = bank.interp(t, rsq)
    assert np.asarray(lo).tolist() == [True, False, False]
    assert np.asarray(hi).tolist() == [False, False, True]


def test_table_file_roundtrip(tmp_path):
    raw = make_raw(n=200)
    path = tmp_path / "lj.table"
    table_io.write_table_file(str(path), {"LJ": raw})
    back = table_io.read_table_file(str(path), "LJ")
    np.testing.assert_allclose(back.r, raw.r, rtol=1e-12)
    np.testing.assert_allclose(back.e, raw.e, rtol=1e-12)
    np.testing.assert_allclose(back.f, raw.f, rtol=1e-12)
    assert back.rflag == table_io.RLINEAR


def test_force_consistency_check():
    raw = make_raw(n=300)
    assert table_io.check_force_consistency(raw) <= 2  # only inflection points
    bad = table_io.RawTable(r=raw.r, e=raw.e, f=-raw.f)
    assert table_io.check_force_consistency(bad) > 100


def test_rsq_match_shortcut():
    # LINEAR + ninput==tablength + RSQ spacing + rhi==cut -> values used verbatim
    n = 100
    rlo, rhi = 0.9, 2.5
    rsq = rlo**2 + (rhi**2 - rlo**2) * np.arange(n) / (n - 1)
    r = np.sqrt(rsq)
    e, f = lj(r)
    raw = table_io.RawTable(r=r, e=e, f=f, rflag=table_io.RSQ, rlo=rlo, rhi=rhi)
    built = tbl.build_table(raw, tbl.LINEAR, n, cut=rhi)
    np.testing.assert_allclose(built.e, e, rtol=1e-14)
    np.testing.assert_allclose(built.f, f / r, rtol=1e-14)
