"""Column-window fused Pallas kernel vs XLA pair style — interpret mode on
CPU (the kernel's correctness gate; the TPU-compiled path is additionally
A/B'd against the XLA path in the benchmark)."""

import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace as dataclasses_replace

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState
from lammps_ucg_dev_tpu.models import pair_ucgld
from lammps_ucg_dev_tpu.ops import chebtab, colpack
from lammps_ucg_dev_tpu.ops import pallas_pair as pk


def test_kernel_matches_xla(rng):
    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    cl = colpack.build(state.x, state.box, spec)
    assert not bool(cl.overflow)

    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    assert pk.supports(params, n)
    cheb = chebtab.fit_bank(bank)
    assert float(jnp.max(cheb.max_rel_err)) < 1e-4

    out_k = pk.compute(state, cl, params, cheb, interpret=True)
    out_x = pair_ucgld.compute(state, colpack.as_neighbor_list(cl, n), params)

    scale = float(np.abs(np.asarray(out_x.f)).max())
    np.testing.assert_allclose(np.asarray(out_k.f), np.asarray(out_x.f),
                               atol=3e-5 * scale)
    np.testing.assert_allclose(float(out_k.pe), float(out_x.pe), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_k.ucgforce),
                               np.asarray(out_x.ucgforce), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_k.scores),
                               np.asarray(out_x.scores), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_k.virial),
                               np.asarray(out_x.virial), rtol=1e-5, atol=1e-2)
    assert int(out_k.oob_low) == 0

    # fast variant (observe=False): same forces/λ-forces/scores to within
    # FMA-contraction rounding (the two variants compile to different fused
    # expression trees), no energy/virial accumulation (interior-step kernel)
    out_f = pk.compute(state, cl, params, cheb, interpret=True,
                       observe=False)
    np.testing.assert_allclose(np.asarray(out_f.f), np.asarray(out_k.f),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(out_f.ucgforce),
                               np.asarray(out_k.ucgforce), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.scores),
                               np.asarray(out_k.scores), atol=1e-5)
    assert float(out_f.pe) == 0.0

    # score-free interior variant: identical forces/λ-forces (the dropped
    # eA/eC rows feed only the score tallies), scores come back 0
    out_n = pk.compute(state, cl, params, cheb, interpret=True,
                       observe=False, want_scores=False)
    np.testing.assert_allclose(np.asarray(out_n.f), np.asarray(out_k.f),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(out_n.ucgforce),
                               np.asarray(out_k.ucgforce), atol=1e-5)
    assert float(np.abs(np.asarray(out_n.scores)).max()) == 0.0


def test_bethe_kernel_matches_xla(rng):
    """Fused Bethe kernel (closed-form pij per candidate) vs the XLA
    table_ucg_bethe path on identical candidate sets."""
    from lammps_ucg_dev_tpu.models import pair_bethe

    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    ucgp = rng.uniform(0.1, 0.9, n)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), ucgp=ucgp,
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    cl = colpack.build(state.x, state.box, spec)

    params = pair_bethe.make_params(bank, tp, kT=0.8, dtype=jnp.float32)
    assert pk.supports_bethe(params, n)
    cheb = chebtab.fit_bank(bank)

    out_k = pk.compute_bethe(state, cl, params, cheb, interpret=True)
    out_x = pair_bethe.compute(state, colpack.as_neighbor_list(cl, n), params)

    scale = float(np.abs(np.asarray(out_x.f)).max())
    np.testing.assert_allclose(np.asarray(out_k.f), np.asarray(out_x.f),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(float(out_k.pe), float(out_x.pe), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(out_k.scores),
                               np.asarray(out_x.scores), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_k.virial),
                               np.asarray(out_x.virial), rtol=3e-5, atol=1e-2)

    # mf method and the fast variant
    params_mf = dataclasses_replace(params, method="mf")
    out_kmf = pk.compute_bethe(state, cl, params_mf, cheb, interpret=True)
    out_xmf = pair_bethe.compute(state, colpack.as_neighbor_list(cl, n),
                                 params_mf)
    np.testing.assert_allclose(np.asarray(out_kmf.f), np.asarray(out_xmf.f),
                               atol=5e-5 * scale)

    # full-SCE scores (pseudo=False): conditional-expectation tallies
    params_sce = dataclasses_replace(params, pseudo=False)
    out_ks = pk.compute_bethe(state, cl, params_sce, cheb, interpret=True)
    out_xs = pair_bethe.compute(state, colpack.as_neighbor_list(cl, n),
                                params_sce)
    np.testing.assert_allclose(np.asarray(out_ks.f), np.asarray(out_xs.f),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(out_ks.scores),
                               np.asarray(out_xs.scores), atol=1e-4)
    out_f = pk.compute_bethe(state, cl, params, cheb, interpret=True,
                             observe=False)
    np.testing.assert_allclose(np.asarray(out_f.f), np.asarray(out_k.f),
                               atol=1e-5 * scale)
    assert float(out_f.pe) == 0.0


@pytest.mark.parametrize("tabstyle,tablength", [("spline", 1200),
                                                ("bitmap", 10)])
def test_kernel_matches_xla_spline_bitmap_banks(rng, tabstyle, tablength):
    """Widened kernel table scope: SPLINE and BITMAP banks ride the same
    fused kernel via a Chebyshev fit of each style's EXACT interpolant
    (chebtab._sample_channels replicates TableBank.interp per style), so
    kernel-vs-XLA stays bounded by the reported fit error."""
    st, bank, tp, rc = helpers.build_two_state(tabstyle=tabstyle,
                                               tablength=tablength,
                                               dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    cl = colpack.build(state.x, state.box, spec)

    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    assert chebtab.fittable(bank)
    assert pk.supports(params, n)
    cheb = chebtab.fit_bank(bank)
    fit_err = float(jnp.max(cheb.max_rel_err))
    assert fit_err < 1e-4, fit_err

    out_k = pk.compute(state, cl, params, cheb, interpret=True)
    out_x = pair_ucgld.compute(state, colpack.as_neighbor_list(cl, n),
                               params)
    scale = float(np.abs(np.asarray(out_x.f)).max())
    tol = max(3e-5, 5.0 * fit_err)
    np.testing.assert_allclose(np.asarray(out_k.f), np.asarray(out_x.f),
                               atol=tol * scale)
    np.testing.assert_allclose(float(out_k.pe), float(out_x.pe), rtol=tol)
    np.testing.assert_allclose(np.asarray(out_k.ucgforce),
                               np.asarray(out_x.ucgforce), atol=2.0 * tol)
    # scores accumulate the per-pair fit error over ~90 neighbors / kT
    np.testing.assert_allclose(np.asarray(out_k.scores),
                               np.asarray(out_x.scores), atol=30.0 * tol)


def test_lookup_bank_not_fittable():
    """LOOKUP's staircase is excluded up front (fittable returns False) —
    those decks keep the XLA gather path."""
    _, bank, _, _ = helpers.build_two_state(tabstyle="lookup")
    assert not chebtab.fittable(bank)


def test_bethe_kernel_at_f32_clamp_boundary(rng):
    """Pin the f32 kernel's overflow clamp (-J/kT capped at 40; the
    reference clamps at -700 in f64, pair_table_ucg_bethe.cpp:545-548)
    against the f64 XLA path AT the boundary: a deep-J system whose pair
    distances put -J/kT on both sides of 40.  Past the clamp p11 is
    saturated to the aligned limit min(pi1, pj1) within ~e-40, so the f32
    kernel and the unclamped f64 closed form must agree to f32 tolerance
    on forces, energy, and scores — no kink, no overflow garbage."""
    from lammps_ucg_dev_tpu.models import pair_bethe

    # J(r) = (e11+e00-e01-e10)(1+cos(pi r/rc)) = -19.9*(1+cos(pi r/rc));
    # kT = 0.8 -> -J/kT in [0, 49.75], crossing 40 at r ~ 0.68 rc
    eps = (0.5, 0.2, 0.2, -20.0)
    kT = 0.8
    st32, bank32, tp32, rc = helpers.build_two_state(eps=eps,
                                                     dtype=jnp.float32)
    _, bank64, tp64, _ = helpers.build_two_state(eps=eps,
                                                 dtype=jnp.float64)
    n, L = 384, 9.0
    x = helpers.random_fluid(rng, n, L, min_sep=0.55)
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgp = rng.uniform(0.1, 0.9, n)
    ucgstate = rng.integers(0, 2, n)

    def mk_state(dtype):
        return SimState.create(
            x=x, typ=np.ones(n, np.int32), ucgl=ucgl, ucgstate=ucgstate,
            ucgp=ucgp, box=Box.create([0, 0, 0], [L, L, L]), dtype=dtype)

    st32_s = mk_state(jnp.float32)
    st64_s = mk_state(jnp.float64)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    cl = colpack.build(st32_s.x, st32_s.box, spec)

    # the configuration really straddles the clamp: some pairs below 40,
    # some above (else the test pins nothing)
    d = x[:, None, :] - x[None, :, :]
    d -= L * np.round(d / L)
    r = np.sqrt((d ** 2).sum(-1) + np.eye(n) * 1e9)
    mJkT = 19.9 * (1.0 + np.cos(np.pi * np.minimum(r, rc) / rc)) / kT
    in_range = r < rc
    assert np.any(in_range & (mJkT > 41.0)), "no pair past the clamp"
    assert np.any(in_range & (mJkT > 35.0) & (mJkT < 40.0)), \
        "no pair just below the clamp"

    p32 = pair_bethe.make_params(bank32, tp32, kT=kT, dtype=jnp.float32)
    p64 = pair_bethe.make_params(bank64, tp64, kT=kT, dtype=jnp.float64)
    assert pk.supports_bethe(p32, n)
    cheb = chebtab.fit_bank(bank32)

    out_k = pk.compute_bethe(st32_s, cl, p32, cheb, interpret=True)
    out_64 = pair_bethe.compute(st64_s, colpack.as_neighbor_list(cl, n),
                                p64)

    scale = float(np.abs(np.asarray(out_64.f)).max())
    np.testing.assert_allclose(np.asarray(out_k.f),
                               np.asarray(out_64.f, np.float32),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(float(out_k.pe), float(out_64.pe), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(out_k.scores),
                               np.asarray(out_64.scores, np.float32),
                               atol=2e-3)
    assert np.all(np.isfinite(np.asarray(out_k.f)))


def test_multi_type_bethe_kernel_matches_xla(rng):
    """Fused Bethe kernel with the class-mask multi-type assembly: mixed
    plain-CG (type 1) + 2-state UCG (type 2) system vs the XLA
    table_ucg_bethe path — plain partners ride the same closed form with
    zeroed priors (p11 = p10 = 0 degeneration)."""
    from lammps_ucg_dev_tpu.models import pair_bethe

    st, bank, tp, rc = helpers.build_mixed(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    typ = np.where(rng.uniform(size=n) < 0.4, 1, 2).astype(np.int32)
    state = SimState.create(
        x=x, typ=typ, ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), ucgp=rng.uniform(0.1, 0.9, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    cl = colpack.build(state.x, state.box, spec)

    params = pair_bethe.make_params(bank, tp, kT=0.8, dtype=jnp.float32)
    assert pk.supports_bethe(params, n)
    cheb = chebtab.fit_bank(bank)

    out_k = pk.compute_bethe(state, cl, params, cheb, interpret=True)
    out_x = pair_bethe.compute(state, colpack.as_neighbor_list(cl, n),
                               params)
    scale = float(np.abs(np.asarray(out_x.f)).max())
    np.testing.assert_allclose(np.asarray(out_k.f), np.asarray(out_x.f),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(float(out_k.pe), float(out_x.pe), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(out_k.scores),
                               np.asarray(out_x.scores), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_k.virial),
                               np.asarray(out_x.virial), rtol=3e-5,
                               atol=1e-2)

    params_mf = dataclasses_replace(params, method="mf")
    out_kmf = pk.compute_bethe(state, cl, params_mf, cheb, interpret=True)
    out_xmf = pair_bethe.compute(state, colpack.as_neighbor_list(cl, n),
                                 params_mf)
    np.testing.assert_allclose(np.asarray(out_kmf.f),
                               np.asarray(out_xmf.f), atol=5e-5 * scale)


def test_density_kernel_matches_xla(rng):
    """Fused P3 (table_ucg_bethe_density) 3-pass kernel vs the XLA path:
    density priors, Bethe mixing with prior-force tallies, CV back-force,
    fused posterior — mixed plain (type 1) + density-UCG (type 2) system,
    both backforce_derivative modes, and the score-free interior variant."""
    import test_pair_density_styles as tds
    from dataclasses import replace as dc_replace

    from lammps_ucg_dev_tpu.models import pair_bethe_density

    st3, bank, tp = tds._p3_build(tds.P3_SETTINGS, dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    typ = np.where(rng.uniform(size=n) < 0.35, 1, 2).astype(np.int32)
    state = SimState.create(
        x=x, typ=typ, ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), ucgp=rng.uniform(0.1, 0.9, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, tds.RC, 0.4)
    cl = colpack.build(state.x, state.box, spec)

    params = pair_bethe_density.make_params(bank, tp, 0.8,
                                            dtype=jnp.float32)
    assert pk.supports_density(params, n)
    cheb = chebtab.fit_bank(bank)

    out_k = pk.compute_density(state, cl, params, cheb, interpret=True)
    out_x = pair_bethe_density.compute(
        state, colpack.as_neighbor_list(cl, n), params)

    scale = float(np.abs(np.asarray(out_x.f)).max())
    np.testing.assert_allclose(np.asarray(out_k.f), np.asarray(out_x.f),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(float(out_k.pe), float(out_x.pe), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(out_k.scores),
                               np.asarray(out_x.scores), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_k.ucgp),
                               np.asarray(out_x.ucgp), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_k.virial),
                               np.asarray(out_x.virial), rtol=1e-4,
                               atol=1e-2)
    assert int(out_k.oob_low) == int(out_x.oob_low)

    # reference-literal backforce form
    p_ref = dc_replace(params, backforce_derivative=False)
    out_kr = pk.compute_density(state, cl, p_ref, cheb, interpret=True)
    out_xr = pair_bethe_density.compute(
        state, colpack.as_neighbor_list(cl, n), p_ref)
    np.testing.assert_allclose(np.asarray(out_kr.f), np.asarray(out_xr.f),
                               atol=1e-4 * scale)

    # score-free interior variant: same forces, no posterior overwrite
    out_n = pk.compute_density(state, cl, params, cheb, interpret=True,
                               observe=False, want_scores=False)
    np.testing.assert_allclose(np.asarray(out_n.f), np.asarray(out_k.f),
                               atol=2e-5 * scale)
    assert out_n.ucgp is None
    assert float(out_n.pe) == 0.0

    # pair_cv="reference" (self-cancelling literal form) must refuse
    assert not pk.supports_density(dc_replace(params, pair_cv="reference"),
                                   n)


def test_rleucg_kernel_matches_xla(rng):
    """Fused P4 (table_rleucg_interface) 3-pass kernel vs the XLA path:
    density → substate probabilities, mean-field mixing with the two-body
    probability feedback, CV back-force — 3 substate types (2-substate
    density actual type + plain), both feedback and sign modes."""
    import test_pair_density_styles as tds
    from dataclasses import replace as dc_replace

    from lammps_ucg_dev_tpu.models import pair_rleucg

    st4, b4 = tds._p4_build(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    typ = np.where(rng.uniform(size=n) < 0.7, 1, 3).astype(np.int32)
    state = SimState.create(
        x=x, typ=typ, ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, tds.RC, 0.4)
    cl = colpack.build(state.x, state.box, spec)

    params = pair_rleucg.make_params(b4, st4, 0.8, dtype=jnp.float32)
    assert pk.supports_rleucg(params, n)
    cheb = chebtab.fit_bank(params.bank)
    assert float(jnp.max(cheb.max_rel_err)) < 1e-4

    for fb, sign in (("always", True), ("always", False),
                     ("never", True)):
        p = dc_replace(params, feedback=fb, conservative_sign=sign)
        out_k = pk.compute_rleucg(state, cl, p, cheb, interpret=True)
        out_x = pair_rleucg.compute(state, colpack.as_neighbor_list(cl, n),
                                    p)
        scale = float(np.abs(np.asarray(out_x.f)).max())
        np.testing.assert_allclose(np.asarray(out_k.f),
                                   np.asarray(out_x.f),
                                   atol=1e-4 * scale,
                                   err_msg=f"f ({fb},{sign})")
        np.testing.assert_allclose(float(out_k.pe), float(out_x.pe),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(out_k.virial),
                                   np.asarray(out_x.virial), rtol=1e-4,
                                   atol=1e-2)

    # fast variant (interior): same forces, no observables
    out_k = pk.compute_rleucg(state, cl, params, cheb, interpret=True)
    out_f = pk.compute_rleucg(state, cl, params, cheb, interpret=True,
                              observe=False)
    scale = float(np.abs(np.asarray(out_k.f)).max())
    np.testing.assert_allclose(np.asarray(out_f.f), np.asarray(out_k.f),
                               atol=2e-5 * scale)
    assert float(out_f.pe) == 0.0


def test_kernel_select_gates(rng):
    """ops/kernel_select: eligible system returns a workable
    (fn, spec, params) under force=True; ineligible ones return None."""
    from lammps_ucg_dev_tpu.models import pair_bethe
    from lammps_ucg_dev_tpu.ops.kernel_select import select_pair_kernel

    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))

    sel = select_pair_kernel(params, state, rc, 0.4, force=True)
    assert sel is not None
    fn, spec, kp = sel
    assert isinstance(spec, colpack.ColumnSpec) and kp.cheb is not None
    assert getattr(fn, "fast_variant", None) is not None

    # bethe params select the bethe kernel (both score modes since r3)
    bp = pair_bethe.make_params(bank, tp, 0.8, dtype=jnp.float32)
    assert select_pair_kernel(bp, state, rc, 0.4, force=True) is not None
    bp_sce = dataclasses_replace(bp, pseudo=False)
    assert select_pair_kernel(bp_sce, state, rc, 0.4, force=True) is not None

    # refusals: f64 state, force=False, triclinic box, tiny box
    state64 = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    assert select_pair_kernel(params, state64, rc, 0.4, force=True) is None
    assert select_pair_kernel(params, state, rc, 0.4, force=False) is None
    import dataclasses as dc
    tri = dc.replace(state, box=Box.create([0, 0, 0], [L, L, L],
                                           tilt=[1.0, 0.5, 0.5]))
    assert select_pair_kernel(params, tri, rc, 0.4, force=True) is None
    small = SimState.create(
        x=x[:64] * 0.5, typ=np.ones(64, np.int32),
        ucgl=rng.uniform(0.2, 0.8, 64), ucgstate=rng.integers(0, 2, 64),
        box=Box.create([0, 0, 0], [5.25] * 3), dtype=jnp.float32)
    assert select_pair_kernel(params, small, rc, 0.4, force=True) is None


def test_slot_interior_matches_atom_interior(rng):
    """Simulation slot-major interior residency vs the atom-ordered
    interior: identical physics op-for-op (same kernel inputs, same
    elementwise fixes, same tag-keyed RNG), so trajectories must agree to
    f32 re-association noise.  Covers both the scores-active (ucgstate
    default) and score-free (ld) interior variants, across reneighbor
    blocks with rebuilds."""
    import dataclasses

    from lammps_ucg_dev_tpu.core.state import System
    from lammps_ucg_dev_tpu.fixes import integrate as fi
    from lammps_ucg_dev_tpu.fixes import langevin as fl
    from lammps_ucg_dev_tpu.fixes import ucgstate as fs
    from lammps_ucg_dev_tpu.models import pair_ucgld
    from lammps_ucg_dev_tpu.ops import chebtab
    from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    v = rng.normal(0, 0.9, (n, 3))
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate = rng.integers(0, 2, n)
    ucgvl = rng.normal(0, 0.3, n)

    def mk_state():
        return SimState.create(
            x=x, v=v, typ=np.ones(n, np.int32), ucgl=ucgl,
            ucgstate=ucgstate, ucgvl=ucgvl, ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)

    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    params = dataclasses.replace(params, cheb=chebtab.fit_bank(bank),
                                 chunk=0)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    integ = fi.IntegratorCfg("nve/ucgld/wall/hard", bias_potential=True,
                             barrier=0.1)

    for mode in ("default", "ld"):
        cfg = SimConfig(dt=0.004, units="lj", integrator=integ,
                        langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                        ucgstate=fs.UCGStateCfg(mode=mode),
                        reneigh_every=4)
        sim_s = Simulation(system, mk_state(), pk.compute_style, params,
                           spec, cfg)
        assert sim_s._slot_ok
        assert sim_s._scores_inert == (mode == "ld")
        sim_s.run(8)

        sim_a = Simulation(system, mk_state(), pk.compute_style, params,
                           spec, cfg)
        sim_a._slot_ok = False
        sim_a.run(8)

        dx = np.asarray(sim_a.state.box.min_image(
            sim_s.state.x - sim_a.state.x))
        assert np.abs(dx).max() < 1e-6, f"x ({mode})"
        for name, tol in (("v", 1e-6), ("ucgl", 1e-6), ("ucgvl", 1e-6),
                          ("ucgp", 1e-6)):
            np.testing.assert_allclose(
                np.asarray(getattr(sim_s.state, name)),
                np.asarray(getattr(sim_a.state, name)), atol=tol,
                err_msg=f"{name} ({mode})")
        assert (np.asarray(sim_s.state.ucgstate)
                == np.asarray(sim_a.state.ucgstate)).all()
        np.testing.assert_allclose(float(sim_s._fcarry.pe),
                                   float(sim_a._fcarry.pe), rtol=1e-6)


def test_slot_interior_styles_match(rng):
    """Slot-resident interiors for the bethe and P3 kernels: trajectories
    must match the atom-ordered interiors (same kernel inputs, same
    elementwise fixes) across reneighbor blocks."""
    import dataclasses

    import test_pair_density_styles as tds
    from lammps_ucg_dev_tpu.core.state import System
    from lammps_ucg_dev_tpu.fixes import integrate as fi
    from lammps_ucg_dev_tpu.fixes import langevin as fl
    from lammps_ucg_dev_tpu.fixes import ucgstate as fs
    from lammps_ucg_dev_tpu.models import pair_bethe, pair_bethe_density
    from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    v = rng.normal(0, 0.9, (n, 3))
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate0 = rng.integers(0, 2, n)
    ucgp0 = rng.uniform(0.1, 0.9, n)

    def mk_state(typ):
        return SimState.create(
            x=x, v=v, typ=typ, ucgl=ucgl, ucgstate=ucgstate0, ucgp=ucgp0,
            ucgml=np.full(n, 5.0),
            box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)

    def run_pair(compute, params, typ, cfg, ntypes, rc):
        spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
        system = System(n_atoms=n, ntypes=ntypes,
                        masses=np.array([0.0] + [1.0] * ntypes))
        sim_s = Simulation(system, mk_state(typ), compute, params, spec,
                           cfg)
        assert sim_s._slot_ok
        sim_s.run(8)
        sim_a = Simulation(system, mk_state(typ), compute, params, spec,
                           cfg)
        sim_a._slot_ok = False
        sim_a.run(8)
        dx = np.asarray(sim_a.state.box.min_image(
            sim_s.state.x - sim_a.state.x))
        assert np.abs(dx).max() < 1e-6
        for name in ("v", "ucgl", "ucgvl", "ucgp"):
            np.testing.assert_allclose(
                np.asarray(getattr(sim_s.state, name)),
                np.asarray(getattr(sim_a.state, name)), atol=1e-6,
                err_msg=name)
        assert (np.asarray(sim_s.state.ucgstate)
                == np.asarray(sim_a.state.ucgstate)).all()

    # bethe: scores feed fix ucgstate every interior step (slot_fast)
    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    bp = pair_bethe.make_params(bank, tp, 0.8, dtype=jnp.float32)
    bp = dataclasses.replace(bp, cheb=chebtab.fit_bank(bank), chunk=0)
    cfg_b = SimConfig(dt=0.004, units="lj",
                      integrator=fi.IntegratorCfg("nve/ucgld"),
                      langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                      ucgstate=fs.UCGStateCfg(mode="default"),
                      reneigh_every=4)
    run_pair(pk.compute_style_bethe, bp, np.ones(n, np.int32), cfg_b, 1,
             rc)

    # P3 density: no ucgstate fix -> score-free slot interior + deferred
    # posterior
    st3, bank3, tp3 = tds._p3_build(tds.P3_SETTINGS, dtype=jnp.float32)
    typ3 = np.where(rng.uniform(size=n) < 0.35, 1, 2).astype(np.int32)
    dp = pair_bethe_density.make_params(bank3, tp3, 0.8, dtype=jnp.float32)
    dp = dataclasses.replace(dp, cheb=chebtab.fit_bank(bank3), chunk=0)
    cfg_d = SimConfig(dt=0.004, units="lj",
                      integrator=fi.IntegratorCfg("nve/ucgld"),
                      langevin=None, ucgstate=None, reneigh_every=4)
    run_pair(pk.compute_style_density, dp, typ3, cfg_d, 2, tds.RC)


def test_multi_type_kernel_matches_xla(rng):
    """Class-mask multi-type assembly: mixed plain-CG (type 1, 1-state) +
    UCG (type 2, 2-state) system vs the XLA path on identical candidates."""
    st, bank, tp, rc = helpers.build_mixed(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    typ = np.where(rng.uniform(size=n) < 0.4, 1, 2).astype(np.int32)
    state = SimState.create(
        x=x, typ=typ, ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    cl = colpack.build(state.x, state.box, spec)

    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    assert pk.supports(params, n)
    assert pk._type_classes(tp, bank.n_tables) is not None
    cheb = chebtab.fit_bank(bank)
    assert float(jnp.max(cheb.max_rel_err)) < 1e-4

    out_k = pk.compute(state, cl, params, cheb, interpret=True)
    out_x = pair_ucgld.compute(state, colpack.as_neighbor_list(cl, n), params)

    scale = float(np.abs(np.asarray(out_x.f)).max())
    np.testing.assert_allclose(np.asarray(out_k.f), np.asarray(out_x.f),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(float(out_k.pe), float(out_x.pe), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(out_k.ucgforce),
                               np.asarray(out_x.ucgforce), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_k.scores),
                               np.asarray(out_x.scores), atol=3e-5)


def test_kernel_bonded_exclusion_composition(rng):
    """Bonded terms + special_bonds exclusions composed with the column
    kernel (runtime/sim.py): the kernel evaluates EVERY in-cutoff pair
    including the bonded 1-2/1-3 partners, and the driver subtracts
    ops/pallas_pair.excl_delta — the same Chebyshev fit, the same -1
    inner clamp, the same D-form mixing — so the excluded pairs cancel
    to f32 rounding.  The XLA path (list-side exclusion, the reference's
    mechanism) is the oracle; trajectories of bent-trimer molecules under
    bond+angle+pair forces must agree."""
    import dataclasses

    from lammps_ucg_dev_tpu.core.state import System
    from lammps_ucg_dev_tpu.fixes import integrate as fi
    from lammps_ucg_dev_tpu.fixes import langevin as fl
    from lammps_ucg_dev_tpu.fixes import ucgstate as fs
    from lammps_ucg_dev_tpu.models import bonded as bd
    from lammps_ucg_dev_tpu.ops import neighbor as nb
    from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

    nmol, L = 40, 14.0
    n = 3 * nmol
    centers = rng.uniform(1, L - 1, (nmol, 3))
    u1 = rng.normal(size=(nmol, 3))
    u1 /= np.linalg.norm(u1, axis=1, keepdims=True)
    p = rng.normal(size=(nmol, 3))
    p -= np.sum(p * u1, axis=1, keepdims=True) * u1
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    th = np.deg2rad(120.0)
    u2 = np.cos(th) * u1 + np.sin(th) * p
    x = np.concatenate([centers + 0.9 * u1, centers, centers + 0.9 * u2],
                       axis=1).reshape(-1, 3) % L
    bonds, angles = [], []
    for m in range(nmol):
        a = 3 * m + 1
        bonds.append([2 * m + 1, 1, a, a + 1])
        bonds.append([2 * m + 2, 1, a + 1, a + 2])
        angles.append([m + 1, 1, a, a + 1, a + 2])
    bonds, angles = np.asarray(bonds), np.asarray(angles)

    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    v = rng.normal(0, 0.3, (n, 3))
    ucgl = rng.uniform(0.2, 0.8, n)
    ucgstate = rng.integers(0, 2, n)

    def mk_state():
        return SimState.create(
            x=x, v=v, typ=np.ones(n, np.int32), ucgl=ucgl,
            ucgstate=ucgstate, ucgml=np.full(n, 5.0),
            mol=np.repeat(np.arange(1, nmol + 1), 3),
            box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float32),
            dtype=jnp.float32)

    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    bparams = bd.make_params(bonds, {1: (50.0, 0.9)}, angles,
                             {1: (10.0, 120.0)}, dtype=jnp.float32)
    excl = bd.special_tags(n, bonds=bonds, angles=angles)
    assert np.any(excl)
    system = System(n_atoms=n, ntypes=1, masses=np.array([0.0, 1.0]))
    cfg = SimConfig(dt=0.002, units="lj",
                    integrator=fi.IntegratorCfg("nve/ucgld/wall/hard"),
                    langevin=fl.LangevinCfg(0.8, 0.8, 0.5),
                    ucgstate=fs.UCGStateCfg(mode="default"),
                    reneigh_every=5)

    params_k = dataclasses.replace(params, cheb=chebtab.fit_bank(bank),
                                   chunk=0)
    spec_k = colpack.measure_spec(np.asarray(x), [L] * 3, rc, 0.4)
    sim_k = Simulation(system, mk_state(), pk.compute_style, params_k,
                       spec_k, cfg, bonded=bparams, excl_tags=excl)
    assert sim_k._excl_rows_static is not None
    assert not sim_k._slot_ok           # bonded gates slot residency off

    spec_x = nb.make_spec(n, [L] * 3, rc, 0.4, method="nsq")
    sim_x = Simulation(system, mk_state(), pair_ucgld.compute, params,
                       spec_x, cfg, bonded=bparams, excl_tags=excl)

    # step-0 force pass: the composed kernel fout must match the
    # list-side-excluded XLA fout (fit tolerance + cancellation rounding)
    sim_k.setup((0, 100))
    sim_x.setup((0, 100))
    fk, fx = sim_k._fcarry, sim_x._fcarry
    scale = float(np.abs(np.asarray(fx.f)).max())
    np.testing.assert_allclose(np.asarray(fk.f), np.asarray(fx.f),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(float(fk.pe), float(fx.pe), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(fk.ucgforce),
                               np.asarray(fx.ucgforce), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fk.scores),
                               np.asarray(fx.scores), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fk.virial),
                               np.asarray(fx.virial), rtol=2e-4, atol=0.05)

    # short trajectory across reneighbor blocks
    sim_k.run(15)
    sim_x.run(15)
    dx = np.asarray(sim_x.state.box.min_image(sim_k.state.x
                                              - sim_x.state.x))
    assert np.abs(dx).max() < 5e-4
    for name, tol in (("v", 5e-4), ("ucgl", 1e-4), ("ucgvl", 5e-4),
                      ("ucgp", 1e-3)):
        np.testing.assert_allclose(
            np.asarray(getattr(sim_k.state, name)),
            np.asarray(getattr(sim_x.state, name)), atol=tol, err_msg=name)
    np.testing.assert_allclose(float(sim_k._fcarry.pe),
                               float(sim_x._fcarry.pe), rtol=1e-3)


def test_bethe_kernel_exclusion_delta(rng):
    """excl_delta_bethe: (fused Bethe kernel over ALL pairs) − (delta over
    the exclusion lists) must equal the XLA path with list-side exclusion,
    for both score modes — the composition that keeps bonded
    table_ucg_bethe decks on the kernel.  Also exercises the multi-type
    class-mask branch of _excl_channels via the ucgld delta on a mixed
    system."""
    import dataclasses

    from lammps_ucg_dev_tpu.models import pair_bethe

    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    n, L = 512, 10.5
    x = np.asarray(helpers.random_fluid(rng, n, L, min_sep=0.8))
    # synthetic exclusion pairs: atom 2k+1 moved next to atom 2k (some
    # pairs land below the fluid's min separation — the regime bonded
    # partners actually occupy)
    x[1::2] = (x[0::2] + rng.normal(0, 0.45, (n // 2, 3))) % L
    excl_rows = np.full((n, 2), n, np.int32)
    excl_rows[0::2, 0] = np.arange(1, n, 2)
    excl_rows[1::2, 0] = np.arange(0, n, 2)

    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n), ucgp=rng.uniform(0.1, 0.9, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = colpack.measure_spec(x, [L] * 3, rc, 0.4)
    cl = colpack.build(state.x, state.box, spec)
    assert not bool(cl.overflow)
    cheb = chebtab.fit_bank(bank)

    # list-side-excluded oracle: same candidate set minus the special pairs
    nlist = colpack.as_neighbor_list(cl, n)
    idx = np.asarray(nlist.idx).copy()
    rows = np.arange(n)[:, None]
    for s in range(excl_rows.shape[1]):
        idx[idx == excl_rows[rows[:, 0], s][:, None]] = n
    nbr_x = dataclasses.replace(nlist, idx=jnp.asarray(idx))
    jrows = jnp.asarray(excl_rows)

    for pseudo in (True, False):
        params = pair_bethe.make_params(bank, tp, kT=0.8,
                                        dtype=jnp.float32)
        params = dataclasses.replace(params, pseudo=pseudo, cheb=cheb)
        out_k = pk.compute_bethe(state, cl, params, cheb, interpret=True)
        d = pk.excl_delta_bethe(state, jrows, params)
        out_x = pair_bethe.compute(state, nbr_x, params)
        scale = float(np.abs(np.asarray(out_x.f)).max())
        np.testing.assert_allclose(
            np.asarray(out_k.f) - np.asarray(d.f), np.asarray(out_x.f),
            atol=1e-4 * scale, err_msg=f"f (pseudo={pseudo})")
        np.testing.assert_allclose(
            float(out_k.pe) - float(d.pe), float(out_x.pe), rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out_k.scores) - np.asarray(d.scores),
            np.asarray(out_x.scores), atol=2e-4,
            err_msg=f"scores (pseudo={pseudo})")
        np.testing.assert_allclose(
            np.asarray(out_k.virial) - np.asarray(d.virial),
            np.asarray(out_x.virial), rtol=2e-4, atol=0.05)

    # multi-type class-mask branch via the ucgld delta on a mixed system
    stm, bankm, tpm, rcm = helpers.build_mixed(dtype=jnp.float32)
    typm = rng.integers(1, 3, n).astype(np.int32)
    state_m = SimState.create(
        x=x, typ=typm, ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    params_m = pair_ucgld.UCGLDParams(bank=bankm, tp=tpm,
                                      kT=jnp.asarray(0.8, jnp.float32))
    chebm = chebtab.fit_bank(bankm)
    params_m = dataclasses.replace(params_m, cheb=chebm, chunk=0)
    out_k = pk.compute(state_m, cl, params_m, chebm, interpret=True)
    d = pk.excl_delta(state_m, jrows, params_m)
    out_x = pair_ucgld.compute(state_m, nbr_x, params_m)
    scale = float(np.abs(np.asarray(out_x.f)).max())
    np.testing.assert_allclose(
        np.asarray(out_k.f) - np.asarray(d.f), np.asarray(out_x.f),
        atol=1e-4 * scale, err_msg="f (mixed ucgld)")
    np.testing.assert_allclose(
        np.asarray(out_k.ucgforce) - np.asarray(d.ucgforce),
        np.asarray(out_x.ucgforce), atol=2e-4)
    np.testing.assert_allclose(
        float(out_k.pe) - float(d.pe), float(out_x.pe), rtol=2e-4)
