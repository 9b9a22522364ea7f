"""Fused Pallas kernel vs XLA pair style — interpret mode on CPU.

Compile of the unrolled kernel in interpret mode is slow (~3 min); marked
slow-ish but kept in the default suite as the kernel's correctness gate.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

import helpers
from lammps_ucg_dev_tpu.core.state import Box, SimState
from lammps_ucg_dev_tpu.models import pair_ucgld
from lammps_ucg_dev_tpu.ops import chebtab
from lammps_ucg_dev_tpu.ops import clusters as cl
from lammps_ucg_dev_tpu.ops import pallas_ucgld as pk


def test_kernel_matches_xla(rng):
    st, bank, tp, rc = helpers.build_two_state(dtype=jnp.float32)
    n, L = 512, 10.5
    x = helpers.random_fluid(rng, n, L, min_sep=0.8)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgl=rng.uniform(0.2, 0.8, n),
        ucgstate=rng.integers(0, 2, n),
        box=Box.create([0, 0, 0], [L, L, L]), dtype=jnp.float32)
    spec = cl.make_spec(n, [L] * 3, rc, 0.4)
    spec = dataclasses.replace(spec, kc=((spec.kc + 15) // 16) * 16)
    state = state.permute(cl.sort_order(state.x, state.box, spec))
    clist = cl.build(state.x, state.box, spec)
    assert not bool(clist.overflow)

    params = pair_ucgld.UCGLDParams(bank=bank, tp=tp,
                                    kT=jnp.asarray(0.8, jnp.float32))
    assert pk.supports(params, n)
    cheb = chebtab.fit_bank(bank, degree=16)
    assert float(jnp.max(cheb.max_rel_err)) < 1e-4

    out_k = pk.compute(state, clist, params, cheb, interpret=True)
    out_x = pair_ucgld.compute(state, cl.as_neighbor_list(clist, n), params)

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
