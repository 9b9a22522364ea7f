"""Quick TPU check: pipelined compiled kernel == interpret-mode kernel.

Builds the 4k flagship fluid, evaluates the fused ucgld kernel both ways
(observe=True so pe/virial are covered), prints max abs diffs.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from lammps_ucg_dev_tpu.ops import pallas_pair


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from __graft_entry__ import _build_sim

    sim = _build_sim(n=n, reneigh_every=20)
    sim.setup((0, 100))
    state = sim.state
    nbr = sim._nbr_build(state)
    params = sim.pair_params

    f_c = jax.jit(lambda s, c: pallas_pair.compute(
        s, c, params, params.cheb, interpret=False, observe=True))
    f_i = jax.jit(lambda s, c: pallas_pair.compute(
        s, c, params, params.cheb, interpret=True, observe=True))
    a = f_c(state, nbr)
    b = f_i(state, nbr)
    for name in ("f", "ucgforce", "scores", "pe", "virial"):
        da = np.asarray(getattr(a, name), np.float64)
        db = np.asarray(getattr(b, name), np.float64)
        d = np.max(np.abs(da - db)) if da.size else 0.0
        ref = max(np.max(np.abs(db)), 1e-30)
        print(f"{name}: max|diff|={d:.3e}  rel={d / ref:.3e}")
    assert np.allclose(np.asarray(a.f), np.asarray(b.f), atol=1e-4), "MISMATCH"
    print("OK: pipelined == interpret")


if __name__ == "__main__":
    main()
