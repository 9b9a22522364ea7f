"""Microbenchmark: per-step packed-candidate-tile assembly cost on TPU.

Round-5 design experiment for rebuild-time candidate compaction (VERDICT r4
task 1).  The packed j-cluster scheme needs, EVERY STEP, a gather of ~K/8
8-slot j-cluster chunks per 8-atom i-cluster from the slot-major extended
attribute array into dense per-program tiles.  XLA row-gather costs ~4.2
ns/index on v5e (round-1 measurement) which would sink the design at row
granularity (32 idx/atom); chunked gathers have 8x fewer indices.  This
tool measures the real cost of each candidate layout at the 262k operating
point so the kernel design can be chosen on evidence.

Variants:
  rowgather   (M*8,) row indices into (nslots, 8)        [baseline, expect bad]
  chunk0      (M,) chunk indices into (NJC, 8, 8), axis 0
  chunk0T     chunk0 + transpose to (8, M, 8) kernel layout
  chunk1      (M,) chunk indices into (8, NJC, 8), axis 1 [no transpose needed]
  chunk1r     chunk1 + reshape (8, n_prog, K)
  pages       the current pack_slots-style page stack    [reference point]

Run: python tools/gatherbench.py [--n 262144]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--K", type=int, default=256)
    args = ap.parse_args()

    n = args.n
    K = args.K
    # 262k operating point geometry (ncol=676, cz~416, czp~464)
    ncol = max(int((n / 0.6) ** (1 / 3) / 2.9) ** 2, 36)
    cz = int(-(-n // (ncol * 8)) * 8) + 64
    czp = 128 + int(-(-(cz + 48 - 128) // 32) * 32) if cz + 48 > 128 else 128
    NJC = ncol * czp // 8
    n_prog = ncol * cz // 8
    M = n_prog * (K // 8)
    rng = np.random.default_rng(0)
    print(f"n={n} ncol={ncol} cz={cz} czp={czp} NJC={NJC} "
          f"n_prog={n_prog} M={M} ({M / n:.1f} chunk-idx/atom)")

    ext_sa = jnp.asarray(rng.normal(size=(NJC * 8, 8)), jnp.float32)
    ext_c0 = ext_sa.reshape(NJC, 8, 8)
    ext_c1 = jnp.asarray(np.transpose(
        np.asarray(ext_sa).reshape(NJC, 8, 8), (2, 0, 1)).copy())  # (8,NJC,8)
    cid = jnp.asarray(rng.integers(0, NJC, size=(M,)), jnp.int32)
    rid = jnp.asarray(
        (rng.integers(0, NJC, size=(M, 1)) * 8
         + np.arange(8)[None, :]).reshape(-1), jnp.int32)

    res = {}
    res["rowgather"] = bench(lambda e, i: jnp.take(e, i, axis=0), ext_sa, rid)
    res["chunk0"] = bench(lambda e, i: jnp.take(e, i, axis=0), ext_c0, cid)
    res["chunk0T"] = bench(
        lambda e, i: jnp.take(e, i, axis=0).transpose(1, 0, 2), ext_c0, cid)
    res["chunk1"] = bench(lambda e, i: jnp.take(e, i, axis=1), ext_c1, cid)
    res["chunk1r"] = bench(
        lambda e, i: jnp.take(e, i, axis=1).reshape(8, n_prog, K),
        ext_c1, cid)
    # the big transpose that builds ext_c1 from the slot-attr resident array
    res["extT"] = bench(
        lambda e: e.reshape(NJC, 8, 8).transpose(2, 0, 1), ext_sa)
    # current pages reference: (npage, ncol, 8, W) stack
    W, S = 128, 32
    npage = (czp - W) // S + 1
    ext2 = ext_sa.reshape(ncol, czp, 8)

    def pages_fn(e):
        jp = e.transpose(0, 2, 1)
        return jnp.stack([jp[:, :, k * S:k * S + W] for k in range(npage)],
                         axis=0)

    res["pages"] = bench(pages_fn, ext2)

    for k, v in res.items():
        print(f"{k:10s} {v * 1e3:8.3f} ms  {v / n * 1e9:7.2f} ns/atom")


if __name__ == "__main__":
    main()
