"""Column/z-page candidate structure: exact pair coverage vs brute force.

This guards the kernel path's correctness-critical property — the round-1
cluster list's stencil bug class (silently dropped pairs) must be impossible:
every pair within cutoff+skin appears in the expanded candidate list, exactly
once (ghost copies dedupe to the same atom id).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from lammps_ucg_dev_tpu.core.state import Box
from lammps_ucg_dev_tpu.ops import colpack
from lammps_ucg_dev_tpu.ops import neighbor as nb

RC, SKIN = 2.5, 0.4


def lattice_fluid(rng, n, rho=0.6, jitter=0.3):
    L = (n / rho) ** (1 / 3)
    m = int(np.ceil(n ** (1 / 3)))
    a = L / m
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    -1).reshape(-1, 3)[:n]
    return np.mod((grid + 0.5) * a + rng.normal(0, jitter, (n, 3)), L), L


def assert_exact_coverage(xn, L, n):
    x = jnp.asarray(xn)
    box = Box.create([0, 0, 0], [L] * 3, dtype=x.dtype)
    spec = colpack.measure_spec(xn, [L] * 3, RC, SKIN)
    cl = colpack.build(x, box, spec)
    assert not bool(cl.overflow), int(cl.max_occupancy)
    nlist = colpack.as_neighbor_list(cl, n)
    ref = nb.build_nsq(x, box, nb.NeighborSpec(cutoff=RC, skin=SKIN,
                                               capacity=300, method="nsq"))
    ridx, kidx = np.asarray(ref.idx), np.asarray(nlist.idx)
    for i in range(n):
        row = kidx[i][kidx[i] < n]
        refs = set(ridx[i][ridx[i] < n].tolist())
        missing = refs - set(row.tolist())
        assert not missing, f"atom {i}: dropped pairs {missing}"
        assert len(row) == len(set(row.tolist())), f"atom {i}: duplicate js"
    return spec, cl


def test_coverage_random_fluid(rng):
    xn = np.asarray(helpers.random_fluid(rng, 768, 12.5, min_sep=0.8))
    assert_exact_coverage(xn, 12.5, 768)


def test_coverage_lattice_moire(rng):
    """Near-crystalline config with strong column-count variance (moire
    between lattice pitch and column width) — the case that breaks naive
    Poisson sizing of windows."""
    xn, L = lattice_fluid(rng, 2048)
    spec, cl = assert_exact_coverage(xn, L, 2048)
    # selection invariant: measured span + page-alignment slack (<= S-1)
    # + drift margin (10) fits the W-slot window, i.e. the realized
    # occupancy leaves at least the drift margin free
    assert int(cl.max_occupancy) <= colpack.W - 10


def test_coverage_boundary_heavy(rng):
    """Atoms piled against the z faces exercise ghost copies on both sides."""
    n, L = 600, 12.5
    xn = np.asarray(helpers.random_fluid(rng, n, L, min_sep=0.8))
    xn[:, 2] = np.mod(xn[:, 2] * 0.3 + L - 1.0, L)   # squash into z ~ [L-1, L+2.75)
    assert_exact_coverage(xn, L, n)


@pytest.mark.quick
def test_overflow_flag_on_undersized_windows(rng):
    """Force a too-small page budget: spans must be flagged, not silently
    dropped."""
    xn, L = lattice_fluid(rng, 2048)
    spec = colpack.measure_spec(xn, [L] * 3, RC, SKIN)
    import dataclasses

    bad = dataclasses.replace(spec, G=8, cz=int(-(-spec.cz // 64) * 64))
    cl = colpack.build(jnp.asarray(xn), Box.create([0, 0, 0], [L] * 3), bad)
    assert bool(cl.overflow) or int(cl.max_occupancy) <= colpack.W


def test_small_box_rejected():
    with pytest.raises(ValueError):
        colpack.make_spec(100, [6.0, 6.0, 20.0], RC, SKIN)
    with pytest.raises(ValueError):
        colpack.measure_spec(np.zeros((4, 3)), [20.0, 20.0, 5.0], RC, SKIN)


@pytest.mark.quick
def test_pack_shapes_and_ipack_validity(rng):
    n, L = 768, 12.5
    xn = np.asarray(helpers.random_fluid(rng, n, L, min_sep=0.8))
    x = jnp.asarray(xn)
    box = Box.create([0, 0, 0], [L] * 3, dtype=x.dtype)
    spec = colpack.measure_spec(xn, [L] * 3, RC, SKIN)
    cl = colpack.build(x, box, spec)
    lam = jnp.asarray(rng.uniform(0, 1, n))
    st = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    ipack, pages = colpack.pack(cl, box, x, lam, st)
    assert ipack.shape == (cl.n_slots, 8)
    if cl.NV > 0:
        # span (column-resident) kernel path: plain attr-major columns
        assert pages.shape == (cl.ncol, 8, cl.czp)
    else:
        assert pages.shape == (cl.npage, cl.ncol, 8, colpack.W)
    # exactly n real i-slots
    assert int(jnp.sum(ipack[:, 5] > 0.5)) == n
    # every atom's row round-trips through its slot
    back = np.asarray(ipack)[np.asarray(cl.atom_slot)]
    np.testing.assert_allclose(back[:, :3], xn, atol=1e-6)
    np.testing.assert_allclose(back[:, 3], np.asarray(lam), atol=1e-6)
