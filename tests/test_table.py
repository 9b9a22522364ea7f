"""Unit tests for the tabulated-potential substrate (SURVEY.md §4.1):
spline fit + all interpolation modes vs an analytic Lennard-Jones potential.
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

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


@pytest.mark.parametrize("style", [tbl.LOOKUP, tbl.LINEAR, tbl.SPLINE,
                                   tbl.BITMAP])
def test_interp_matches_analytic(style):
    raw = make_raw()
    # BITMAP tablength is the bit count: 2^12 bins
    built = tbl.build_table(raw, style, 12 if style == tbl.BITMAP else 2000,
                            cut=3.0)
    bank = tbl.TableBank.from_built([built], style, dtype=jnp.float64)

    r = np.linspace(1.0, 2.8, 173)
    rsq = jnp.asarray(r * r)
    t = jnp.zeros_like(rsq, dtype=jnp.int32)
    e, fp, lo, hi = bank.interp(t, rsq)

    e_ref, f_ref = lj(r)
    # stored f is f(r)/r -> force magnitude = fp * r
    # LOOKUP returns the bin-midpoint value (bin width ~4e-3 in r²), so it is
    # inherently first-order; LINEAR/SPLINE interpolate within the bin.
    tol = {tbl.LOOKUP: 3e-2, tbl.LINEAR: 5e-4, tbl.SPLINE: 1e-5,
           tbl.BITMAP: 2e-3}[style]
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


def test_bitmap_bins_cover_range_and_match_stored_edges():
    """Every queried rsq lands in a bin whose stored lower-edge rsq is <= it
    and whose width covers it (exactness at bin edges); the bin index is the
    reference's masked-float-bit lookup (pair_table_ucgld.cpp:252-258)."""
    raw = make_raw()
    built = tbl.build_table(raw, tbl.BITMAP, 10, cut=3.0)
    bank = tbl.TableBank.from_built([built], tbl.BITMAP, dtype=jnp.float64)
    # exactness at the stored bin edges
    keep = (built.rsq >= 1.0) & (built.rsq < 3.0 * 3.0 * 0.999)
    rsq_edges = jnp.asarray(built.rsq[keep])
    t = jnp.zeros_like(rsq_edges, dtype=jnp.int32)
    e, fp, lo, hi = bank.interp(t, rsq_edges)
    np.testing.assert_allclose(np.asarray(e), built.e[keep], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fp), built.f[keep], rtol=1e-12)


def test_bitmap_pair_style_matches_linear(rng):
    """table_ucgld forces with a bitmap bank agree with the linear bank."""
    import helpers
    from lammps_ucg_dev_tpu.core.state import Box, SimState
    from lammps_ucg_dev_tpu.models import pair_ucgld
    from lammps_ucg_dev_tpu.ops import neighbor as nb

    n, L = 128, 10.0
    x = helpers.random_fluid(rng, n, L)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, 2.5, 0.4, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    outs = {}
    for style, length in ((tbl.LINEAR, 4096), (tbl.BITMAP, 12)):
        st, bank, tp, rc = helpers.build_two_state(tabstyle=style,
                                                   tablength=length)
        params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                        kT=jnp.asarray(0.8))
        outs[style] = pair_ucgld.compute(state, nbr, params)
    np.testing.assert_allclose(np.asarray(outs[tbl.BITMAP].f),
                               np.asarray(outs[tbl.LINEAR].f),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(float(outs[tbl.BITMAP].pe),
                               float(outs[tbl.LINEAR].pe), rtol=1e-3)


def test_pair_single_matches_table():
    """Pair::single() analogue: the (0,0)-combo table value at rsq — the
    stock pair_table body every reference style shares
    (pair_table_ucgld.cpp:1474-1520)."""
    import helpers
    from lammps_ucg_dev_tpu.models import pair_single

    st, bank, tp, rc = helpers.build_two_state()
    r = np.linspace(1.0, 2.4, 57)
    e, fp, lo, hi = pair_single.single(bank, tp, 1, 1, jnp.asarray(r * r))
    e_ref, f_ref = helpers.soft_pair(r, eps=1.0, rc=rc)
    np.testing.assert_allclose(np.asarray(e), e_ref, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(fp) * r, f_ref, atol=5e-3,
                               rtol=5e-3)
    assert not np.any(np.asarray(lo)) and not np.any(np.asarray(hi))
    # factor_lj scales both outputs (the special-bonds hook)
    e2, fp2, _, _ = pair_single.single(bank, tp, 1, 1, jnp.asarray(r * r),
                                       factor_lj=0.5)
    np.testing.assert_allclose(np.asarray(e2), 0.5 * np.asarray(e), rtol=1e-12)


def test_pair_single_mixed_matches_lambda_mix():
    """single_mixed == Σ wi wj u_ss' against per-table single() queries."""
    import helpers
    from lammps_ucg_dev_tpu.models import pair_single

    eps = (1.0, 0.6, 0.6, 0.25)
    st, bank, tp, rc = helpers.build_two_state(eps=eps)
    r = np.linspace(1.0, 2.4, 33)
    li, lj_ = 0.3, 0.8
    emix, fmix, lo, hi = pair_single.single_mixed(
        bank, tp, 1, 1, jnp.asarray(r * r), li, lj_)
    w = np.array([(1 - li) * (1 - lj_), (1 - li) * lj_,
                  li * (1 - lj_), li * lj_])
    e_ref = sum(wk * helpers.soft_pair(r, eps=ek, rc=rc)[0]
                for wk, ek in zip(w, eps))
    np.testing.assert_allclose(np.asarray(emix), e_ref, atol=5e-4, rtol=5e-4)


def test_bitmap_below_inner_cutoff_clamps_to_edge():
    """rsq below the table inner cutoff must extrapolate from the repulsive
    edge (like LINEAR's bin-0 clamp), not alias through the periodic
    masked-bit index to a mid-table bin (review finding; the reference
    error->one's here, pair_table single()/compute BITMAP branches)."""
    raw = make_raw()
    built = tbl.build_table(raw, tbl.BITMAP, 10, cut=3.0)
    bank = tbl.TableBank.from_built([built], tbl.BITMAP, dtype=jnp.float64)
    inn = float(built.innersq)
    t = jnp.zeros((3,), jnp.int32)
    e_lo, f_lo, lo, _ = bank.interp(t, jnp.asarray([0.25 * inn, 0.5 * inn,
                                                    0.9 * inn]))
    e_edge, f_edge, _, _ = bank.interp(jnp.zeros((), jnp.int32),
                                       jnp.asarray(inn))
    np.testing.assert_allclose(np.asarray(e_lo), float(e_edge), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f_lo), float(f_edge), rtol=1e-6)
    assert np.all(np.asarray(lo))          # oob_low still reported
