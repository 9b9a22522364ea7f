"""Neighbor-list tests: cell list vs O(N²) oracle, PBC, overflow flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from lammps_ucg_dev_tpu.core.state import Box
from lammps_ucg_dev_tpu.ops import neighbor as nb


def neighbor_sets(nbr):
    idx = np.asarray(nbr.idx)
    n = idx.shape[0]
    return [frozenset(j for j in row if j < n) for j in [None] for row in idx]


def ref_sets(x, L, rc):
    n = len(x)
    out = []
    for i in range(n):
        dr = x - x[i]
        dr -= L * np.round(dr / L)
        rsq = np.sum(dr * dr, axis=1)
        s = set(np.nonzero(rsq < rc * rc)[0].tolist())
        s.discard(i)
        out.append(frozenset(s))
    return out


@pytest.mark.parametrize("n,L", [(200, 6.0), (1000, 10.0)])
def test_cell_matches_nsq_and_bruteforce(rng, n, L):
    x = rng.uniform(0, L, size=(n, 3))
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    xj = jnp.asarray(x)
    cutoff, skin = 1.5, 0.3

    spec_c = nb.make_spec(n, [L] * 3, cutoff, skin, method="cell", chunk=256)
    spec_n = nb.make_spec(n, [L] * 3, cutoff, skin, method="nsq")

    nbr_c = jax.jit(nb.build, static_argnums=2)(xj, box, spec_c)
    nbr_n = jax.jit(nb.build, static_argnums=2)(xj, box, spec_n)
    assert not bool(nbr_c.overflow)
    assert not bool(nbr_n.overflow)

    ref = ref_sets(x, L, cutoff + skin)
    got_c = neighbor_sets(nbr_c)
    got_n = neighbor_sets(nbr_n)
    assert got_n == ref
    assert got_c == ref


def test_pbc_wraparound():
    # two atoms straddling the periodic boundary
    L = 10.0
    x = jnp.asarray([[0.1, 5.0, 5.0], [9.9, 5.0, 5.0], [5.0, 5.0, 5.0]],
                    dtype=jnp.float64)
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    spec = nb.make_spec(3, [L] * 3, 1.0, 0.2, method="nsq")
    nbr = nb.build(x, box, spec)
    idx = np.asarray(nbr.idx)
    assert 1 in idx[0] and 0 in idx[1]
    assert 2 not in idx[0]


def test_overflow_flag(rng):
    # tiny capacity must trip the overflow flag
    n, L = 100, 4.0
    x = jnp.asarray(rng.uniform(0, L, (n, 3)))
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, 1.8, 0.3, method="nsq", capacity=2)
    nbr = nb.build(x, box, spec)
    assert bool(nbr.overflow)


def test_displacement_check(rng):
    n, L = 64, 8.0
    x = jnp.asarray(rng.uniform(0, L, (n, 3)))
    box = Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64)
    spec = nb.make_spec(n, [L] * 3, 1.5, 0.4, method="nsq")
    nbr = nb.build(x, box, spec)
    assert not bool(nb.displacement_check(nbr, x, box, 0.4))
    x2 = x.at[0, 0].add(0.3)
    assert bool(nb.displacement_check(nbr, x2, box, 0.4))


def test_nonperiodic_dim():
    L = 10.0
    box = Box.create([0, 0, 0], [L, L, L], periodic=(False, True, True),
                     dtype=jnp.float64)
    x = jnp.asarray([[0.1, 5.0, 5.0], [9.9, 5.0, 5.0]], dtype=jnp.float64)
    spec = nb.make_spec(2, [L] * 3, 1.0, 0.2, method="nsq")
    nbr = nb.build(x, box, spec)
    idx = np.asarray(nbr.idx)
    assert 1 not in idx[0]  # no wrap across the non-periodic x dimension
