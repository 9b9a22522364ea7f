"""Cluster pair-list tests: coverage vs the plain neighbor list, and physics
equality when pair styles consume the expanded cluster list."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState
from lammps_ucg_dev_tpu.models import pair_ucgld
from lammps_ucg_dev_tpu.ops import clusters as cl
from lammps_ucg_dev_tpu.ops import neighbor as nb


def _sorted_state(rng, n, L):
    st, bank, tp, rc = helpers.build_two_state()
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L], dtype=jnp.float64),
        dtype=jnp.float64)
    spec = cl.make_spec(n, [L] * 3, rc, 0.4)
    order = cl.sort_order(state.x, state.box, spec)
    state = state.permute(order)
    return st, bank, tp, rc, state, spec


def test_cluster_list_covers_all_pairs(rng):
    n, L = 512, 10.0
    st, bank, tp, rc, state, spec = _sorted_state(rng, n, L)
    clist = cl.build(state.x, state.box, spec)
    assert not bool(clist.overflow)

    # expanded list must contain every true neighbor pair within cutoff+skin
    nbr = cl.as_neighbor_list(clist, n)
    got = [set(int(j) for j in row if j < n) for row in np.asarray(nbr.idx)]
    x = np.asarray(state.x)
    rc2 = (spec.cutoff + spec.skin) ** 2
    for i in range(n):
        d = x - x[i]
        d -= L * np.round(d / L)
        rsq = np.sum(d * d, axis=1)
        true = set(np.nonzero(rsq < rc2)[0].tolist()) - {i}
        missing = true - got[i]
        assert not missing, (i, missing)


def test_pair_forces_match_plain_list(rng):
    n, L = 512, 10.0
    st, bank, tp, rc, state, spec = _sorted_state(rng, n, L)
    clist = cl.build(state.x, state.box, spec)
    nbr_cl = cl.as_neighbor_list(clist, n)
    nbr_plain = nb.build(state.x, state.box,
                         nb.make_spec(n, [L] * 3, rc, 0.4, method="nsq"))
    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp, kT=jnp.asarray(0.8))
    out_cl = pair_ucgld.compute(state, nbr_cl, params)
    out_pl = pair_ucgld.compute(state, nbr_plain, params)
    np.testing.assert_allclose(np.asarray(out_cl.f), np.asarray(out_pl.f),
                               atol=1e-11)
    np.testing.assert_allclose(float(out_cl.pe), float(out_pl.pe), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out_cl.scores),
                               np.asarray(out_pl.scores), atol=1e-11)
