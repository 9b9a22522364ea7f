"""Fused Pallas pair kernel over column-packed candidates (production path).

This is the v2 kernel replacing the round-1 cluster kernel (attic/).  Same
physics (``pair_style table_ucgld``: λ-mixed 4-table energy/force, λ-forces,
pseudolikelihood scores — pair_table_ucgld.cpp:111-541), new data movement:

* One program owns G i-clusters (G·8 atoms, contiguous z-slab of one column,
  see ops/colpack.py).  Its candidates are NINE (8 attr, 128 slot) z-windows,
  one per stencil column, each fetched with a single async DMA from HBM —
  zero scalar-indexed staging (the round-1 kernel's cost center: 16 row loads
  + 7 sub-lane stores per 8 candidates).
* Tables are Chebyshev series (ops/chebtab.py) with coefficients baked as
  immediates.  All 8 channels (e00..e11, f00..f11) share ONE Chebyshev basis
  recurrence: T_k is computed once per candidate block and dotted into 8
  accumulators — 10 FMAs per degree instead of 16.
* Per-atom-owned tallies (full-list/newton-off): each program writes only its
  own G·8 rows; no scatter anywhere.

Scope: uniform LINEAR tables sharing one cutoff; up to 3 actual types,
each plain (1-state) or 2-state UCG — multi-type systems assemble the 2x2
state block per candidate from class masks over ordered type pairs (see
``_kernel``'s ``classes``).  A fused ``table_ucg_bethe`` variant shares the
scaffolding (single type, pseudolikelihood scores).  Callers must check
:func:`supports` / :func:`supports_bethe`; the XLA paths remain the general
fallback and correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lammps_ucg_dev_tpu.core.state import ForceOut, SimState
from lammps_ucg_dev_tpu.models.pair_ucgld import UCGLDParams
from lammps_ucg_dev_tpu.ops import colpack
from lammps_ucg_dev_tpu.ops.chebtab import ChebBank

CL = colpack.CL
W = colpack.W
NSTEN = colpack.NSTEN


def supports(params: UCGLDParams, n_atoms: int) -> bool:
    """Static eligibility of the fused kernel for this system: uniform
    LINEAR tables, every type plain (1-state) or 2-state UCG, one shared
    cutoff, and a bounded channel count (the class-mask assembly unrolls
    over ordered type pairs — see _kernel's ``classes``)."""
    tp = params.tp
    ntypes = tp.cutsq.shape[0] - 1
    if not bool(params.bank.uniform) or ntypes < 1:
        return False
    ns = np.asarray(tp.n_states)[1:]
    if not np.all((ns == 1) | (ns == 2)) or not np.any(ns == 2):
        return False
    cuts = np.asarray(tp.cutsq)[1:, 1:]
    if not np.allclose(cuts, cuts[0, 0]):
        return False
    return params.bank.n_tables <= 8 and ntypes <= 3


def _type_classes(tp, n_tables: int) -> tuple:
    """Static (ti, tj, (i00, i01, i10, i11)) tuples: which channel rows form
    the 2x2 state block per ordered type pair.  A single class (one actual
    type) costs nothing at runtime — the kernel indexes the channel rows
    statically; multiple classes use the mask-weighted sum."""
    ntypes = tp.cutsq.shape[0] - 1
    tab4 = np.asarray(tp.tab4)
    return tuple(
        (ti, tj, tuple(int(v) for v in tab4[ti, tj].reshape(-1)))
        for ti in range(1, ntypes + 1) for tj in range(1, ntypes + 1))


def _kernel(ce, degree, G, gpc, czp, gz, S, observe, style, mf, classes,
            dform, want_scores, *refs0):
    """One program: G i-clusters vs 9 DMA'd stencil-column windows.

    ``style`` selects the per-candidate physics on the shared window/DMA
    scaffolding: "ucgld" = λ-mixed table_ucgld (λ-forces + pseudolikelihood
    scores); "bethe" = table_ucg_bethe with the closed-form two-point
    distribution (pair_table_ucg_bethe.cpp:544-604) — ipack attr 6 carries
    the i-role prior pi1 (from ucgl), window attr 3 the j-role prior pj1
    (from ucgp), and scal slot 6 carries kT.  ``mf`` selects the mean-field
    p11 = pi1·pj1 ("method mf").

    All mixing runs in the **D-form basis** (A=00, B=10−00, C=01−00,
    D=11−01−10+00): both styles' 2x2 state mixtures reduce to
    ``A + wB·B + wC·C + wD·D`` with weights (λi, λj, λiλj) for ucgld and
    (pi1, pj1, p11) for Bethe, the λ-force is ``−(eB + λj·eD)``, the Bethe
    coupling is J = eD, and pseudolikelihood scores are ``−(eA + sj·eC)`` /
    ``−(eA+eB + sj·(eC+eD))`` — ~10 fewer VPU ops/candidate than the raw
    w00..w11 algebra.  With ``dform`` the A..D combination is already baked
    into the Chebyshev coefficient rows (single-class systems, zero runtime
    cost); otherwise the 2x2 block is assembled from raw channel rows
    (identity or class-mask-weighted over ordered type pairs; ipack/window
    attr 7 carry the actual type) and converted in-kernel.

    ``want_scores=False`` (fast ucgld only) drops the score tallies AND the
    eA/eC channel rows entirely — valid when the deck has no score feedback
    (``fix ucgstate`` absent or in ``ld`` mode, where ucgp is observable-
    only); the driver re-scores on full-kernel steps.

    scal_ref (SMEM, (1,8) f32): [Lx, Ly, cutsq, innersq, uscale, uoff,
             kT, .] — u = rsq·uscale + uoff maps the Chebyshev domain
    meta_ref (SMEM, (8,32) i32): rows [9 stencil cols, 9 page ids,
             9 encoded xy image shifts, pad]
    ipack_ref (G*8, 8): own real slots [x y z λ state valid 0 0]
    pages_ref (npage, ncol, 8, W) in HBM: overlapped z-pages
    out_ref  (G*8, 8): [fx fy fz lamf s0 s1 0 0]
    out2_ref (8, 8): per-program partials [pe vxx vyy vzz vxy vxz vyz oob_lo]
             — only with ``observe``; the fast variant (observe=False) skips
             energy/virial/oob entirely (the MD step itself needs only
             forces, λ-forces, and scores; observables are produced by a
             full-kernel evaluation at block ends)
    jwin     (NSTEN, 8, W) VMEM scratch; sems (NSTEN,) DMA semaphores
    """
    scal_ref, meta_ref, ipack_ref, pages_ref, *refs = refs0
    if observe:
        out_ref, out2_ref, jwin, sems = refs
    else:
        out_ref, jwin, sems = refs
        out2_ref = None
    # meta rows come in 8-row SMEM blocks (TPU block-shape legality); this
    # program's row is p % 8 within its block
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
    innersq = scal_ref[0, 3]
    uscale = scal_ref[0, 4]
    uoff = scal_ref[0, 5]

    for s in range(NSTEN):
        window_dma(s).wait()
        # hoist the xy periodic image ONCE per window: the column
        # relationship statically determines the only image within cutoff
        # (colpack._stencil_shifts), replacing per-candidate min-image
        # rounds (8 VPU ops/candidate) with 2 row updates per window
        code = meta_ref[mrow, 2 * NSTEN + s]
        sx = (code // 3 - 1).astype(jnp.float32)
        sy = (code % 3 - 1).astype(jnp.float32)
        jwin[s, 0:1, :] = jwin[s, 0:1, :] + sx * Lx
        jwin[s, 1:2, :] = jwin[s, 1:2, :] + sy * Ly

    if observe:
        pe_t = jnp.zeros((), jnp.float32)
        vir_t = [jnp.zeros((), jnp.float32) for _ in range(6)]
        oob_t = jnp.zeros((), jnp.float32)

    want_eac = want_scores or observe or style != "ucgld"
    # loop order: STENCIL WINDOW outer, cluster inner — the 4-6 j-attribute
    # row loads are issued once per window instead of once per (cluster,
    # window); per-cluster accumulators persist across the window loop
    xi_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 0:1] for b in range(G)]
    yi_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 1:2] for b in range(G)]
    zi_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 2:3] for b in range(G)]
    li_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 3:4] for b in range(G)]
    vi_b = [ipack_ref[slice(b * CL, (b + 1) * CL), 5:6] for b in range(G)]

    def zeros_b():
        return [jnp.zeros((CL, W), jnp.float32) for _ in range(G)]

    fx_b, fy_b, fz_b = zeros_b(), zeros_b(), zeros_b()
    if style == "ucgld":
        lamf_b = zeros_b()
    if want_scores:
        s0_b, s1_b = zeros_b(), zeros_b()
    if observe:
        pe_b = zeros_b()
        vir_b = [[jnp.zeros((CL, W), jnp.float32) for _ in range(6)]
                 for _ in range(G)]
        oob_b = zeros_b()

    for s in range(NSTEN):
        xj = jwin[s, 0:1, :]
        yj = jwin[s, 1:2, :]
        zj = jwin[s, 2:3, :]
        lj = jwin[s, 3:4, :]
        if want_scores:
            sjr = jwin[s, 4:5, :]
        if observe:
            vjr = jwin[s, 5:6, :]

        for b in range(G):
            sl = slice(b * CL, (b + 1) * CL)
            xi, yi, zi, li, vi = (xi_b[b], yi_b[b], zi_b[b], li_b[b],
                                  vi_b[b])
            fx, fy, fz = fx_b[b], fy_b[b], fz_b[b]
            if style == "ucgld":
                lamf = lamf_b[b]
            if want_scores:
                s0, s1 = s0_b[b], s1_b[b]
            if observe:
                pe = pe_b[b]
                vir = vir_b[b]
                oob = oob_b[b]

            dx = xi - xj                       # windows carry shifted x/y
            dy = yi - yj
            dz = zi - zj                       # ghosts carry shifted z
            rsq = dx * dx + dy * dy + dz * dz

            # pad slots carry poisoned coordinates (colpack._PAD_POISON), so
            # rsq < cutsq covers slot validity; rsq > 0 excludes self (a pair
            # of distinct atoms at the exact same position would be singular
            # in any MD formulation).  The full kernel keeps the valid-flag
            # masks as belt-and-braces for pe/virial exactness.
            mask = (rsq < cutsq) & (rsq > 0.0)
            if observe:
                mask = mask & (vjr > 0.5) & (vi > 0.5)
                oob = oob + jnp.where(mask & (rsq < innersq), 1.0, 0.0)

            # lower clamp only (table inner-bin clamp); past-cutoff lanes run
            # the recurrence unclamped (u up to ~1e34 from pad poison → inf/
            # NaN) — every accumulation below selects them out via ``mask``
            u = jnp.maximum(rsq * uscale + uoff, -1.0)
            u2 = u + u

            # shared-basis Chebyshev: one T_k recurrence, all channel dots
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

            # ---- 2x2 state block in D-form ----------------------------------
            if dform:
                if want_eac:
                    eA, eB, eC, eD, fA, fB, fC, fD = acc
                else:
                    eB, eD, fA, fB, fC, fD = acc
                    eA = eC = None
            else:
                if classes is None:
                    e00, e01, e10, e11, f00, f01, f10, f11 = acc
                elif len(classes) == 1:
                    # one actual type: static channel selection (honors the
                    # reference's init_one symmetrization where the 01 table
                    # serves both cross combos, pair_table_ucgld.cpp:892)
                    T = nrow // 2
                    ids = classes[0][2]
                    e00, e01, e10, e11 = (acc[ids[0]], acc[ids[1]],
                                          acc[ids[2]], acc[ids[3]])
                    f00, f01, f10, f11 = (acc[T + ids[0]], acc[T + ids[1]],
                                          acc[T + ids[2]], acc[T + ids[3]])
                else:
                    # class-mask-weighted 2x2 block assembly: ordered type
                    # pairs select which channel rows form e00..f11 (mti is
                    # (CL,1), mtj (1,W) — the product broadcasts per candidate)
                    T = nrow // 2
                    tiv = ipack_ref[sl, 7:8]   # (CL,1) narrow load; cheap
                    tjv = jwin[s, 7:8, :]      # shared across b — Mosaic CSEs
                    e00 = e01 = e10 = e11 = None
                    f00 = f01 = f10 = f11 = None
                    for (tci, tcj, ids) in classes:
                        mti = (tiv == float(tci)).astype(jnp.float32)
                        mtj = (tjv == float(tcj)).astype(jnp.float32)
                        m = mti * mtj
                        vals = [m * acc[ids[q]] for q in range(4)]
                        fvals = [m * acc[T + ids[q]] for q in range(4)]
                        if e00 is None:
                            e00, e01, e10, e11 = vals
                            f00, f01, f10, f11 = fvals
                        else:
                            e00 = e00 + vals[0]
                            e01 = e01 + vals[1]
                            e10 = e10 + vals[2]
                            e11 = e11 + vals[3]
                            f00 = f00 + fvals[0]
                            f01 = f01 + fvals[1]
                            f10 = f10 + fvals[2]
                            f11 = f11 + fvals[3]
                eA, eB, eC = e00, e10 - e00, e01 - e00
                eD = (e11 - e01) - (e10 - e00)
                fA, fB, fC = f00, f10 - f00, f01 - f00
                fD = (f11 - f01) - (f10 - f00)

            zero = jnp.zeros_like(u)
            if style == "ucgld":
                wB = li
                wC = lj
                wD = li * lj
            else:  # bethe: closed-form two-point distribution (:544-581)
                pi1 = ipack_ref[sl, 6:7]       # i-role prior (from ucgl)
                pj1 = jnp.where(mask, lj, zero)  # j-role prior (from ucgp)
                pipj = pi1 * pj1
                if mf:
                    p11 = pipj
                else:
                    kT = scal_ref[0, 6]
                    # J = u11+u00-u01-u10 is exactly the D channel
                    # overflow guard: the reference clamps at -700 kT
                    # (f64, :545-548); in f32 the closed form's Q² term
                    # overflows past e^44, so clamp at 40 — beyond it p11
                    # is saturated to the aligned limit within ~e-40 anyway
                    xk = jnp.minimum(-eD / kT, 40.0)
                    bb = jnp.exp(xk)
                    aa = bb - 1.0                      # expm1: the |a|<eps
                    # mean-field fallback below covers the cancellation zone
                    Q = (pi1 + pj1) * aa + 1.0
                    D = jnp.maximum(Q * Q - 4.0 * aa * bb * pipj, 0.0)
                    sqD = jnp.sqrt(D)
                    small = jnp.abs(aa) < 1e-5
                    root_pos = 2.0 * bb * pipj / (Q + sqD)
                    root_neg = (Q - sqD) / (2.0 * jnp.where(small, 1.0, aa))
                    p11 = jnp.where(Q < 0.0, root_neg, root_pos)
                    p11 = jnp.where(small, pipj, p11)
                wB, wC, wD = pi1, pj1, p11

            fmix = jnp.where(mask, fA + wB * fB + wC * fC + wD * fD, zero)
            fx_b[b] = fx + fmix * dx
            fy_b[b] = fy + fmix * dy
            fz_b[b] = fz + fmix * dz
            if style == "ucgld":
                # λ-force: -(lj (e11-e01) + (1-lj)(e10-e00)) = -(eB + lj eD)
                lamf_b[b] = lamf - jnp.where(mask, eB + lj * eD, zero)
            if observe:
                emix = jnp.where(mask, eA + wB * eB + wC * eC + wD * eD,
                                 zero)
                pe_b[b] = pe + emix
                vir[0] = vir[0] + fmix * dx * dx
                vir[1] = vir[1] + fmix * dy * dy
                vir[2] = vir[2] + fmix * dz * dz
                vir[3] = vir[3] + fmix * dx * dy
                vir[4] = vir[4] + fmix * dx * dz
                vir[5] = vir[5] + fmix * dy * dz
                oob_b[b] = oob

            if want_scores:
                # pseudolikelihood scores at the partner's discrete state
                # (sj ∈ {0.0, 1.0} exactly, so the select is a clean FMA)
                s0_b[b] = s0 - jnp.where(mask, eA + sjr * eC, zero)
                s1_b[b] = s1 - jnp.where(mask,
                                         (eA + eB) + sjr * (eC + eD), zero)

    for b in range(G):
        sl = slice(b * CL, (b + 1) * CL)
        out_ref[sl, 0:1] = jnp.sum(fx_b[b], axis=1, keepdims=True)
        out_ref[sl, 1:2] = jnp.sum(fy_b[b], axis=1, keepdims=True)
        out_ref[sl, 2:3] = jnp.sum(fz_b[b], axis=1, keepdims=True)
        zcol = jnp.zeros((CL, 1), jnp.float32)
        out_ref[sl, 3:4] = (jnp.sum(lamf_b[b], axis=1, keepdims=True)
                            if style == "ucgld" else zcol)
        if want_scores:
            out_ref[sl, 4:5] = jnp.sum(s0_b[b], axis=1, keepdims=True)
            out_ref[sl, 5:6] = jnp.sum(s1_b[b], axis=1, keepdims=True)
        else:
            out_ref[sl, 4:6] = jnp.zeros((CL, 2), jnp.float32)
        out_ref[sl, 6:8] = jnp.zeros((CL, 2), jnp.float32)

        if observe:
            pe_t = pe_t + jnp.sum(pe_b[b])
            for v in range(6):
                vir_t[v] = vir_t[v] + jnp.sum(vir_b[b][v])
            oob_t = oob_t + jnp.sum(oob_b[b])

    if observe:
        row = jnp.concatenate([
            pe_t[None], vir_t[0][None], vir_t[1][None], vir_t[2][None],
            vir_t[3][None], vir_t[4][None], vir_t[5][None], oob_t[None],
        ])[None, :]
        out2_ref[:, :] = jnp.broadcast_to(row, (8, 8))


def _run_kernel(cl: colpack.ColumnList, scal, ipack, pages, cheb: ChebBank,
                observe: bool, style: str, mf: bool, interpret: bool,
                classes: "tuple | None" = None, want_scores: bool = True):
    """Shared pallas_call scaffolding for every kernel style.

    Single-class systems get the D-form transform at the COEFFICIENT level
    (rows become [eA eB eC eD fA fB fC fD], or [eB eD fA..fD] when scores
    are skipped) — the 2x2 mixing basis change costs nothing at runtime.
    Multi-class systems keep raw channel rows (shared across classes) and
    convert in-kernel after mask assembly."""
    interpret = _auto_interpret(interpret)
    dtype = jnp.float32
    G, gs, gpc = cl.G, cl.gs, cl.cz // cl.gs
    n_prog = cl.n_prog
    ce_np = np.asarray(cheb.coeffs, np.float64)
    dform = classes is not None and len(classes) == 1
    if dform:
        T = ce_np.shape[0] // 2
        i00, i01, i10, i11 = classes[0][2]

        def _abcd(base):
            A = ce_np[base + i00]
            return (A, ce_np[base + i10] - A, ce_np[base + i01] - A,
                    (ce_np[base + i11] - ce_np[base + i01])
                    - (ce_np[base + i10] - ce_np[base + i00]))

        eA, eB, eC, eD = _abcd(0)
        fA, fB, fC, fD = _abcd(T)
        if want_scores or observe or style != "ucgld":
            rows = [eA, eB, eC, eD, fA, fB, fC, fD]
        else:
            rows = [eB, eD, fA, fB, fC, fD]
        ce = [[float(c) for c in r] for r in rows]
    else:
        ce = [[float(c) for c in row] for row in ce_np]
    kern = functools.partial(_kernel, ce, cheb.degree, G, gpc, cl.czp, cl.gz,
                             cl.S, observe, style, mf, classes, dform,
                             want_scores)

    meta = cl.meta
    if meta.shape[0] % 8:
        meta = jnp.pad(meta, ((0, -meta.shape[0] % 8), (0, 0)))

    out_specs = [
        pl.BlockSpec((gs, 8), lambda p: (p, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((cl.n_slots, 8), dtype)]
    if observe:
        out_specs.append(
            pl.BlockSpec((8, 8), lambda p: (p, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_prog * 8, 8), dtype))

    return pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 32), lambda p: (p // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gs, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
            # pages stay in HBM; window DMAs slice only the untiled leading
            # dims (page id, padded column), never the (8, W) tile
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NSTEN, 8, W), dtype),
            pltpu.SemaphoreType.DMA((NSTEN,)),
        ],
        interpret=interpret,
    )(scal, meta, ipack, pages)


def _auto_interpret(interpret: "bool | None") -> bool:
    """interpret=None resolves by backend: compiled on TPU, interpreter on
    CPU (the virtual-mesh test/dryrun backend, where Mosaic cannot compile)."""
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _u_map(cheb: ChebBank, dtype):
    """(uscale, uoff) with u = rsq·uscale + uoff ∈ [-1, 1] over the domain —
    one kernel FMA instead of the 3-op affine map."""
    span = (cheb.hi - cheb.lo).astype(dtype)
    return (2.0 / span).astype(dtype), (-(cheb.hi + cheb.lo) / span).astype(
        dtype)


def compute(state: SimState, cl: colpack.ColumnList, params: UCGLDParams,
            cheb: ChebBank, interpret: "bool | None" = False,
            observe: bool = True, want_scores: bool = True) -> ForceOut:
    """ForceOut-compatible fused evaluation (see module docstring for scope).

    ``observe=False`` selects the fast kernel variant: no energy/virial/oob
    accumulation (pe/virial come back 0) — use for interior MD steps where
    only forces/λ-forces/scores feed the integrator, with a full evaluation
    at block ends for observables (the LAMMPS eflag/vflag pattern).
    ``want_scores=False`` additionally drops the pseudolikelihood score
    tallies and their two channel rows (scores come back 0) — only valid
    when scores have no dynamical feedback (no ``fix ucgstate``, or ``ld``
    mode where ucgp is observable-only; the driver gates this)."""
    n = state.x.shape[0]
    tp = params.tp
    dtype = jnp.float32

    classes = _type_classes(tp, params.bank.n_tables)
    is_ucg_all = tp.n_states[state.typ] > 1
    # non-UCG atoms carry lambda-weight [1, 0]: zero their packed lambda
    # (models/common.lambda_weights semantics)
    lam_eff = jnp.where(is_ucg_all, state.ucgl, 0.0)
    ipack, pages = colpack.pack(
        cl, state.box, state.x, lam_eff, state.ucgstate, dtype=dtype,
        typ=(state.typ if len(classes) > 1 else None))
    L = state.box.lengths.astype(dtype)
    uscale, uoff = _u_map(cheb, dtype)
    scal = jnp.stack([
        L[0], L[1],
        tp.cutsq[1, 1].astype(dtype),
        params.bank.innersq[0].astype(dtype),
        uscale, uoff,
        jnp.zeros((), dtype), jnp.zeros((), dtype),
    ])[None, :]

    outs = _run_kernel(cl, scal, ipack, pages, cheb, observe,
                       style="ucgld", mf=False, interpret=interpret,
                       classes=classes, want_scores=want_scores)
    out = outs[0]

    out_at = jnp.take(out, cl.atom_slot, axis=0,
                      mode="clip")                               # (N, 8)
    f = out_at[:, 0:3]
    is_ucg = tp.n_states[state.typ] > 1
    ucgforce = jnp.where(is_ucg, out_at[:, 3] - tp.mu_diff[state.typ], 0.0)
    kT = params.kT.astype(dtype)
    if want_scores:
        scores = out_at[:, 4:6] / kT
        scores = scores.at[:, 1].add(-tp.mu_diff[state.typ] / kT)
        scores = jnp.where(is_ucg[:, None], scores, 0.0)
    else:
        scores = jnp.zeros((n, 2), dtype)

    if observe:
        totals = jnp.sum(outs[1][::8], axis=0)
        pe = 0.5 * totals[0]
        virial = 0.5 * totals[1:7]
        oob_low = totals[7].astype(jnp.int32)
    else:
        pe = jnp.zeros((), dtype)
        virial = jnp.zeros((6,), dtype)
        oob_low = jnp.zeros((), jnp.int32)
    return ForceOut(
        f=f,
        ucgforce=ucgforce,
        scores=scores,
        pe=pe,
        virial=virial,
        oob_low=oob_low,
        oob_high=jnp.zeros((), jnp.int32),
    )


def compute_style(state: SimState, cl: colpack.ColumnList,
                  params: UCGLDParams) -> ForceOut:
    """Simulation-compatible pair_compute: reads the ChebBank from
    ``params.cheb`` (set it via ``chebtab.fit_bank``); ``nbr`` is a
    ColumnList built by ops/colpack.py.  interpret=None: compiled on TPU,
    interpreter on the CPU virtual-mesh backend — so the same style fn
    serves the production chip, the multichip dryrun, and the test mesh."""
    return compute(state, cl, params, params.cheb, interpret=None)


def compute_style_fast(state: SimState, cl: colpack.ColumnList,
                       params: UCGLDParams) -> ForceOut:
    """Fast variant of :func:`compute_style` — no energy/virial/oob
    (observe=False).  The Simulation driver uses it for interior steps of a
    reneighbor block and runs the full kernel on the last step."""
    return compute(state, cl, params, params.cheb, observe=False,
                   interpret=None)


def compute_style_fast_noscores(state: SimState, cl: colpack.ColumnList,
                                params: UCGLDParams) -> ForceOut:
    """Fastest interior-step variant: observe=False AND want_scores=False —
    2 fewer Chebyshev channel rows + no score mixing.  The driver selects it
    only when scores cannot feed back into the dynamics (``fix ucgstate``
    absent or in ``ld`` mode — ucgp is then recomputed on full-kernel steps
    where thermo/dump read it)."""
    return compute(state, cl, params, params.cheb, observe=False,
                   interpret=None, want_scores=False)


compute_style.fast_variant = compute_style_fast
compute_style.fast_variant_noscores = compute_style_fast_noscores


def compute_slot(state: SimState, cl: colpack.ColumnList,
                 params: UCGLDParams, cheb: ChebBank,
                 interpret: "bool | None" = None, observe: bool = False,
                 want_scores: bool = True) -> ForceOut:
    """Slot-resident fused evaluation: ``state`` holds SLOT-ORDERED arrays
    (n_atoms == cl.n_slots; pad/ghost-copy rows poisoned — see
    ``Simulation`` slot-major interior loop).  Unlike :func:`compute` there
    is no atom→slot pack gather (the i-side attribute block is a concat of
    the resident slot arrays + a small ghost refresh, colpack.pack_slots)
    and no slot→atom out-take (the returned ForceOut rows are slot-ordered,
    consumed directly by the slot-space integrator/fixes)."""
    n_slots = state.x.shape[0]
    tp = params.tp
    dtype = jnp.float32

    classes = _type_classes(tp, params.bank.n_tables)
    is_ucg = tp.n_states[state.typ] > 1
    lam_eff = jnp.where(is_ucg, state.ucgl, 0.0)
    attrs = jnp.concatenate([
        state.x.astype(dtype),
        lam_eff.astype(dtype)[:, None],
        state.ucgstate.astype(dtype)[:, None],
        cl.i_valid.astype(dtype)[:, None],
        jnp.zeros((n_slots, 1), dtype),
        (state.typ.astype(dtype)[:, None] if len(classes) > 1
         else jnp.zeros((n_slots, 1), dtype)),
    ], axis=1)
    # materialization fence: without it XLA fuses the integrator's
    # elementwise producers into pack_slots' transpose/page-stack, which
    # destroys the transpose's tiled lowering (~25 ns/atom measured)
    attrs = jax.lax.optimization_barrier(attrs)
    pages = colpack.pack_slots(cl, state.box, attrs)
    L = state.box.lengths.astype(dtype)
    uscale, uoff = _u_map(cheb, dtype)
    scal = jnp.stack([
        L[0], L[1],
        tp.cutsq[1, 1].astype(dtype),
        params.bank.innersq[0].astype(dtype),
        uscale, uoff,
        jnp.zeros((), dtype), jnp.zeros((), dtype),
    ])[None, :]

    outs = _run_kernel(cl, scal, attrs, pages, cheb, observe,
                       style="ucgld", mf=False, interpret=interpret,
                       classes=classes, want_scores=want_scores)
    out = outs[0]                                      # (n_slots, 8)
    f = out[:, 0:3]
    ucgforce = jnp.where(is_ucg, out[:, 3] - tp.mu_diff[state.typ], 0.0)
    kT = params.kT.astype(dtype)
    if want_scores:
        scores = out[:, 4:6] / kT
        scores = scores.at[:, 1].add(-tp.mu_diff[state.typ] / kT)
        scores = jnp.where(is_ucg[:, None], scores, 0.0)
    else:
        scores = jnp.zeros((n_slots, 2), dtype)

    if observe:
        totals = jnp.sum(outs[1][::8], axis=0)
        pe = 0.5 * totals[0]
        virial = 0.5 * totals[1:7]
        oob_low = totals[7].astype(jnp.int32)
    else:
        pe = jnp.zeros((), dtype)
        virial = jnp.zeros((6,), dtype)
        oob_low = jnp.zeros((), jnp.int32)
    return ForceOut(
        f=f, ucgforce=ucgforce, scores=scores, pe=pe, virial=virial,
        oob_low=oob_low, oob_high=jnp.zeros((), jnp.int32),
    )


def compute_style_slot_fast(state: SimState, cl: colpack.ColumnList,
                            params: UCGLDParams) -> ForceOut:
    """Slot-resident interior-step variant (observe=False)."""
    return compute_slot(state, cl, params, params.cheb, observe=False)


def compute_style_slot_fast_noscores(state: SimState, cl: colpack.ColumnList,
                                     params: UCGLDParams) -> ForceOut:
    return compute_slot(state, cl, params, params.cheb, observe=False,
                        want_scores=False)


compute_style.slot_fast = compute_style_slot_fast
compute_style.slot_fast_noscores = compute_style_slot_fast_noscores


def supports_bethe(params, n_atoms: int) -> bool:
    """Static eligibility of the fused Bethe kernel: same geometry scope as
    table_ucgld, plus pseudolikelihood scores only (full-SCE stays on the
    XLA path)."""
    from lammps_ucg_dev_tpu.models.pair_bethe import BetheParams

    if not isinstance(params, BetheParams):
        return False
    tp = params.tp
    ntypes = tp.cutsq.shape[0] - 1
    return (
        bool(params.bank.uniform)
        and params.bank.n_tables == 4
        and ntypes == 1
        and int(np.asarray(tp.n_states)[1]) == 2
        and params.pseudo
    )


def compute_bethe(state: SimState, cl: colpack.ColumnList, params,
                  cheb: ChebBank, interpret: bool = False,
                  observe: bool = True) -> ForceOut:
    """Fused ``table_ucg_bethe`` evaluation: closed-form Bethe pij per
    candidate (pair_table_ucg_bethe.cpp:544-604) on the column-window
    scaffolding.  Priors are computed host-side exactly like the XLA path
    (models/pair_bethe._priors): ipack aux = pi1 (i-role, from ucgl),
    window attr 3 = pj1 (j-role, from ucgp)."""
    from lammps_ucg_dev_tpu.models import pair_bethe

    tp = params.tp
    dtype = jnp.float32

    pi1, pj1 = pair_bethe._priors(state, params)
    ipack, pages = colpack.pack(cl, state.box, state.x, pj1,
                                state.ucgstate, dtype=dtype, aux=pi1)
    L = state.box.lengths.astype(dtype)
    kT = params.kT.astype(dtype)
    uscale, uoff = _u_map(cheb, dtype)
    scal = jnp.stack([
        L[0], L[1],
        tp.cutsq[1, 1].astype(dtype),
        params.bank.innersq[0].astype(dtype),
        uscale, uoff,
        kT, jnp.zeros((), dtype),
    ])[None, :]

    outs = _run_kernel(cl, scal, ipack, pages, cheb, observe,
                       style="bethe", mf=params.method == "mf",
                       interpret=interpret,
                       classes=_type_classes(tp, params.bank.n_tables))
    out_at = jnp.take(outs[0], cl.atom_slot, axis=0,
                      mode="clip")                               # (N, 8)
    f = out_at[:, 0:3]
    is_ucg = tp.n_states[state.typ] > 1
    # chemical-potential score initialization (:155-162)
    scores = out_at[:, 4:6] / kT - tp.mu[tp.formal[state.typ]] / kT
    scores = jnp.where(is_ucg[:, None], scores, 0.0)

    if observe:
        totals = jnp.sum(outs[1][::8], axis=0)
        pe = 0.5 * totals[0]
        virial = 0.5 * totals[1:7]
        oob_low = totals[7].astype(jnp.int32)
    else:
        pe = jnp.zeros((), dtype)
        virial = jnp.zeros((6,), dtype)
        oob_low = jnp.zeros((), jnp.int32)
    return ForceOut(
        f=f,
        ucgforce=jnp.zeros_like(pi1),
        scores=scores,
        pe=pe,
        virial=virial,
        oob_low=oob_low,
        oob_high=jnp.zeros((), jnp.int32),
    )


def compute_style_bethe(state: SimState, cl: colpack.ColumnList,
                        params) -> ForceOut:
    """Simulation-compatible pair_compute for the fused Bethe kernel."""
    return compute_bethe(state, cl, params, params.cheb, interpret=None)


def compute_style_bethe_fast(state: SimState, cl: colpack.ColumnList,
                             params) -> ForceOut:
    return compute_bethe(state, cl, params, params.cheb, observe=False,
                         interpret=None)


compute_style_bethe.fast_variant = compute_style_bethe_fast


def make_compute(params: UCGLDParams, cheb: ChebBank, interpret: bool = False):
    """Bind (params, cheb) into a Simulation-compatible pair_compute whose
    ``nbr`` argument is a ColumnList."""

    def fn(state, cl, _params):
        return compute(state, cl, params, cheb, interpret=interpret)

    return fn
