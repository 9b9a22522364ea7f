"""Kernel-only ablation microbench for the fused column pair kernel.

Times the bare ``pallas_call`` (inputs staged on device, pack/post excluded)
at increasing physics levels, to attribute the gap between the kernel's
perfect-issue VPU bound and its measured time:

  L0  window DMAs + xy shift + 1 consume op/tile      (scaffold floor)
  L1  + geometry: dx/dy/dz, rsq, cutoff mask          (~11 ops/tile)
  L2  + u map + Chebyshev basis recurrence            (~8 ops/tile)
  L3  + 6 channel accumulator dots (noscores D-form)  (~30 ops/tile)
  L4  + D-form mixing, force + lambda-force tallies   (full noscores)
  PROD  production compute_slot noscores (pack + kernel + post), reference

Usage:  python tools/kbench.py [--n 262144] [--gs G,S] [--reps 30]
Prints one JSON line per level: ns/atom, implied vreg-ops/ns.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lammps_ucg_dev_tpu.ops import colpack, pallas_pair

CL = colpack.CL
W = colpack.W
NSTEN = colpack.NSTEN


def _abl_kernel(ce, degree, G, level, *refs0):
    scal_ref, meta_ref, ipack_ref, pages_ref, out_ref, jwin, sems = refs0
    mrow = pl.program_id(0) % 8

    def window_dma(s):
        c = meta_ref[mrow, s]
        page = meta_ref[mrow, NSTEN + s]
        return pltpu.make_async_copy(
            pages_ref.at[page, c], jwin.at[s], sems.at[s])

    for s in range(NSTEN):
        window_dma(s).start()

    Lx = scal_ref[0, 0]
    Ly = scal_ref[0, 1]
    cutsq = scal_ref[0, 2]
    uscale = scal_ref[0, 4]
    uoff = scal_ref[0, 5]

    for s in range(NSTEN):
        window_dma(s).wait()
        code = meta_ref[mrow, 2 * NSTEN + s]
        sx = (code // 3 - 1).astype(jnp.float32)
        sy = (code % 3 - 1).astype(jnp.float32)
        jwin[s, 0:1, :] = jwin[s, 0:1, :] + sx * Lx
        jwin[s, 1:2, :] = jwin[s, 1:2, :] + sy * Ly

    xi_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 0:1] for b in range(G)]
    yi_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 1:2] for b in range(G)]
    zi_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 2:3] for b in range(G)]
    li_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 3:4] for b in range(G)]

    def zeros_b():
        return [jnp.zeros((CL, W), jnp.float32) for _ in range(G)]

    fx_b, fy_b, fz_b, lamf_b = zeros_b(), zeros_b(), zeros_b(), zeros_b()

    for s in range(NSTEN):
        xj = jwin[s, 0:1, :]
        yj = jwin[s, 1:2, :]
        zj = jwin[s, 2:3, :]
        lj = jwin[s, 3:4, :]

        for b in range(G):
            if level == 0:
                fx_b[b] = fx_b[b] + xj
                continue
            dx = xi_b[b] - xj
            dy = yi_b[b] - yj
            dz = zi_b[b] - zj
            rsq = dx * dx + dy * dy + dz * dz
            mask = (rsq < cutsq) & (rsq > 0.0)
            if level == 1:
                fx_b[b] = fx_b[b] + jnp.where(mask, rsq, 0.0)
                continue
            u = jnp.maximum(rsq * uscale + uoff, -1.0)
            u2 = u + u
            if level == 2:
                tm2 = jnp.ones_like(u)
                tm1 = u
                for k in range(2, degree):
                    tk = u2 * tm1 - tm2
                    tm2, tm1 = tm1, tk
                fx_b[b] = fx_b[b] + jnp.where(mask, tm1, 0.0)
                continue
            nrow = len(ce)
            acc = [jnp.full_like(u, ce[r][0]) + ce[r][1] * u
                   for r in range(nrow)]
            tm2 = jnp.ones_like(u)
            tm1 = u
            for k in range(2, degree):
                tk = u2 * tm1 - tm2
                for r in range(nrow):
                    acc[r] = acc[r] + ce[r][k] * tk
                tm2, tm1 = tm1, tk
            if level == 3:
                fx_b[b] = fx_b[b] + jnp.where(mask, acc[0] + acc[-1], 0.0)
                continue
            eB, eD, fA, fB, fC, fD = acc
            zero = jnp.zeros_like(u)
            wB = li_b[b]
            wC = lj
            wD = li_b[b] * lj
            fmix = jnp.where(mask, fA + wB * fB + wC * fC + wD * fD, zero)
            fx_b[b] = fx_b[b] + fmix * dx
            fy_b[b] = fy_b[b] + fmix * dy
            fz_b[b] = fz_b[b] + fmix * dz
            lamf_b[b] = lamf_b[b] - jnp.where(mask, eB + lj * eD, zero)

    for b in range(G):
        sl = slice(b * CL, (b + 1) * CL)
        out_ref[sl, 0:1] = jnp.sum(fx_b[b], axis=1, keepdims=True)
        out_ref[sl, 1:2] = jnp.sum(fy_b[b], axis=1, keepdims=True)
        out_ref[sl, 2:3] = jnp.sum(fz_b[b], axis=1, keepdims=True)
        out_ref[sl, 3:4] = jnp.sum(lamf_b[b], axis=1, keepdims=True)
        out_ref[sl, 4:8] = jnp.zeros((CL, 4), jnp.float32)


def _call(kern, cl, scal, meta, ipack, pages):
    gs = cl.gs
    return pl.pallas_call(
        kern,
        grid=(cl.n_prog,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 32), lambda p: (p // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gs, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec((gs, 8), lambda p: (p, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((cl.n_slots, 8), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((NSTEN, 8, W), jnp.float32),
            pltpu.SemaphoreType.DMA((NSTEN,)),
        ],
    )(scal, meta, ipack, pages)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--gs", type=str, default=None)
    ap.add_argument("--levels", type=str, default="0,1,2,3,4,prod")
    args = ap.parse_args()
    n = args.n

    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _build_sim

    kw = {}
    if args.gs:
        g, s = map(int, args.gs.split(","))
        os.environ["UCG_KERNEL_GS"] = f"{g},{s}"
    sim = _build_sim(n=n, reneigh_every=20, **kw)
    sim.setup((0, 1000))
    state = sim.state
    nbr = sim._nbr_build(state)
    ss, _sf = jax.jit(sim._to_slots)(state, sim._fcarry, nbr)
    jax.block_until_ready(ss.x)
    params = sim.pair_params
    cheb = params.cheb
    tp = params.tp

    # staged kernel inputs (exactly compute_slot's, built once)
    is_ucg = tp.n_states[ss.typ] > 1
    lam_eff = jnp.where(is_ucg, ss.ucgl, 0.0)
    attrs, pages = jax.jit(
        lambda box, x, lam, st: pallas_pair._pack_dispatch(
            True, nbr, box, x, lam, st, jnp.float32))(
        ss.box, ss.x, lam_eff, ss.ucgstate)
    L = ss.box.lengths.astype(jnp.float32)
    uscale, uoff = pallas_pair._u_map(cheb, jnp.float32)
    scal = jnp.stack([
        L[0], L[1], tp.cutsq[1, 1].astype(jnp.float32),
        params.bank.innersq[0].astype(jnp.float32),
        uscale, uoff, jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32)])[None, :]
    meta = nbr.meta
    if meta.shape[0] % 8:
        meta = jnp.pad(meta, ((0, -meta.shape[0] % 8), (0, 0)))
    jax.block_until_ready((attrs, pages, scal, meta))

    # noscores D-form coefficient rows (same as _run_kernel dform path)
    ce_np = np.asarray(cheb.coeffs, np.float64)
    classes = pallas_pair._type_classes(tp, params.bank.n_tables)
    T = ce_np.shape[0] // 2
    i00, i01, i10, i11 = classes[0][2]

    def _abcd(base):
        A = ce_np[base + i00]
        return (A, ce_np[base + i10] - A, ce_np[base + i01] - A,
                (ce_np[base + i11] - ce_np[base + i01])
                - (ce_np[base + i10] - ce_np[base + i00]))

    eA, eB, eC, eD = _abcd(0)
    fA, fB, fC, fD = _abcd(T)
    ce = [[float(c) for c in r] for r in [eB, eD, fA, fB, fC, fD]]

    def timeit(fn, *a):
        r = fn(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / args.reps

    info = {"n": n, "G": nbr.G, "S": nbr.S, "n_prog": nbr.n_prog,
            "degree": cheb.degree, "device": str(jax.devices()[0])}
    print(json.dumps(info))
    levels = args.levels.split(",")
    for lv in levels:
        if lv == "prod":
            sfn = pallas_pair.compute_style_slot_fast_noscores
            f = jax.jit(lambda s, c: sfn(s, c, params))
            dt = timeit(f, ss, nbr)
            print(json.dumps({"level": "prod(pack+kernel+post)",
                              "ns_atom": round(dt / n * 1e9, 2)}))
            continue
        level = int(lv)
        kern = functools.partial(_abl_kernel, ce, cheb.degree, nbr.G, level)
        f = jax.jit(lambda sc, me, ip, pg, k=kern: _call(k, nbr, sc, me, ip,
                                                         pg))
        dt = timeit(f, scal, meta, attrs, pages)
        print(json.dumps({"level": level, "ns_atom": round(dt / n * 1e9, 2),
                          "ns_prog": round(dt / nbr.n_prog * 1e9, 1)}))


if __name__ == "__main__":
    main()
