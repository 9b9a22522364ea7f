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

Scope: shared-domain LINEAR/SPLINE/BITMAP tables (Chebyshev-fit of each
style's exact interpolant) sharing one cutoff; up to 3 actual types,
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
from lammps_ucg_dev_tpu.ops.chebtab import ChebBank, fittable

CL = colpack.CL
W = colpack.W
NSTEN = colpack.NSTEN


def supports(params: UCGLDParams, n_atoms: int) -> bool:
    """Static eligibility of the fused kernel for this system: a
    Chebyshev-fittable bank (shared-domain LINEAR/SPLINE/BITMAP — see
    chebtab.fittable), every type plain (1-state) or 2-state UCG, one shared
    cutoff, and a bounded channel count (the class-mask assembly unrolls
    over ordered type pairs — see _kernel's ``classes``)."""
    tp = params.tp
    ntypes = tp.cutsq.shape[0] - 1
    if not fittable(params.bank) or ntypes < 1:
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


def _window_prologue(pipelined, scal_ref, meta_cur, meta_nxt, pages_ref,
                     jwin, sems):
    """Shared window-DMA scheme for every kernel style.

    ``pipelined=True`` (compiled TPU): cross-program software pipeline.
    The kbench ablation (2026-08-20, 262k, G=2/S=32) showed the DMA
    scaffold ALONE costs ~501 ns/program (44 ns/atom) — more than all the
    pair physics combined (28.6 ns/atom) — because each program stalls on
    its own window latency with nothing to hide it.  Here program p's nine
    windows are started by program p-1 (into the 2-slot scratch ring)
    while p-1 computes, so the latency hides behind compute; only program
    0 eats a cold start.  p+1's meta row comes from the CURRENT (8, 32)
    meta block, or from the NEXT block (second meta input) at 8-block
    boundaries.

    ``pipelined=False`` (interpret mode / CPU test mesh): each program
    issues and waits its own windows in slot 0 — identical data, simple
    sequential semantics for the interpreter.

    Returns the slot index holding THIS program's windows (traced i32).
    Callers read windows as ``jwin[slot, s]`` after this returns; the xy
    periodic image shift is already applied.
    """
    p = pl.program_id(0)
    mrow = p % 8
    Lx = scal_ref[0, 0]
    Ly = scal_ref[0, 1]

    def dma(slot, c, page, s):
        return pltpu.make_async_copy(
            pages_ref.at[page, c], jwin.at[slot, s], sems.at[slot, s])

    if not pipelined:
        for s in range(NSTEN):
            dma(0, meta_cur[mrow, s], meta_cur[mrow, NSTEN + s], s).start()
        for s in range(NSTEN):
            dma(0, meta_cur[mrow, s], meta_cur[mrow, NSTEN + s], s).wait()
            code = meta_cur[mrow, 2 * NSTEN + s]
            sx = (code // 3 - 1).astype(jnp.float32)
            sy = (code % 3 - 1).astype(jnp.float32)
            jwin[0, s, 0:1, :] = jwin[0, s, 0:1, :] + sx * Lx
            jwin[0, s, 1:2, :] = jwin[0, s, 1:2, :] + sy * Ly
        return 0

    slot = jax.lax.rem(p, 2)
    nslot = 1 - slot

    @pl.when(p == 0)
    def _():
        for s in range(NSTEN):
            dma(0, meta_cur[0, s], meta_cur[0, NSTEN + s], s).start()

    # prefetch p+1's windows into the other slot while this program
    # computes; at 8-row block boundaries p+1's meta is meta_nxt row 0
    boundary = mrow == 7
    nrow = jax.lax.rem(p + 1, 8)

    @pl.when(p + 1 < pl.num_programs(0))
    def _():
        for s in range(NSTEN):
            c = jnp.where(boundary, meta_nxt[0, s], meta_cur[nrow, s])
            page = jnp.where(boundary, meta_nxt[0, NSTEN + s],
                             meta_cur[nrow, NSTEN + s])
            dma(nslot, c, page, s).start()

    for s in range(NSTEN):
        dma(slot, meta_cur[mrow, s], meta_cur[mrow, NSTEN + s], s).wait()
        code = meta_cur[mrow, 2 * NSTEN + s]
        sx = (code // 3 - 1).astype(jnp.float32)
        sy = (code % 3 - 1).astype(jnp.float32)
        jwin[slot, s, 0:1, :] = jwin[slot, s, 0:1, :] + sx * Lx
        jwin[slot, s, 1:2, :] = jwin[slot, s, 1:2, :] + sy * Ly
    return slot


def _phys_tile(ce, degree, style, mf, classes, dform, want_scores,
               want_eac, observe, dstat, sc, iv, jr, tal):
    """Per-candidate-tile pair physics, shared by the window kernel (tiles =
    9 stencil windows x G clusters) and the span kernel (tiles = NV packed
    vregs x G clusters).  See :func:`_kernel` for the physics contract and
    reference citations.

    ``sc``: scalar dict (cutsq, innersq, uscale, uoff, kT).
    ``iv``: i-side dict of (CL, 1) arrays — xi yi zi li vi + style extras
            (pi prior, lp0/lp1 hoisted logs, ti type).
    ``jr``: callable attr index -> (1, T) row of the j candidate tile.
    ``tal``: accumulator dict of (CL, T) arrays; returned updated.
    """
    xi, yi, zi, li, vi = iv["xi"], iv["yi"], iv["zi"], iv["li"], iv["vi"]
    xj, yj, zj, lj = jr(0), jr(1), jr(2), jr(3)
    if want_scores:
        sjr = jr(4)
    if observe:
        vjr = jr(5)

    dx = xi - xj                       # tiles carry shifted x/y
    dy = yi - yj
    dz = zi - zj                       # ghosts carry shifted z
    rsq = dx * dx + dy * dy + dz * dz

    # pad slots carry poisoned coordinates (colpack._PAD_POISON), so
    # rsq < cutsq covers slot validity; rsq > 0 excludes self.  The full
    # kernel keeps the valid-flag masks as belt-and-braces for pe/virial.
    mask = (rsq < sc["cutsq"]) & (rsq > 0.0)
    if observe:
        mask = mask & (vjr > 0.5) & (vi > 0.5)
        tal["oob"] = tal["oob"] + jnp.where(
            mask & (rsq < sc["innersq"]), 1.0, 0.0)

    # lower clamp only (table inner-bin clamp); past-cutoff lanes run the
    # recurrence unclamped (u up to ~1e34 from pad poison -> inf/NaN) —
    # every accumulation below selects them out via ``mask``
    u = jnp.maximum(rsq * sc["uscale"] + sc["uoff"], -1.0)
    u2 = u + u

    # shared-basis Chebyshev: one T_k recurrence, all channel dots
    nrow = len(ce)
    acc = [jnp.full_like(u, ce[r][0]) + ce[r][1] * u for r in range(nrow)]
    tm2 = jnp.ones_like(u)
    tm1 = u
    for k in range(2, degree):
        tk = u2 * tm1 - tm2
        for r in range(nrow):
            acc[r] = acc[r] + ce[r][k] * tk
        tm2, tm1 = tm1, tk

    # ---- 2x2 state block in D-form --------------------------------------
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
            # reference's init_one symmetrization, pair_table_ucgld.cpp:892)
            T = nrow // 2
            ids = classes[0][2]
            e00, e01, e10, e11 = (acc[ids[0]], acc[ids[1]],
                                  acc[ids[2]], acc[ids[3]])
            f00, f01, f10, f11 = (acc[T + ids[0]], acc[T + ids[1]],
                                  acc[T + ids[2]], acc[T + ids[3]])
        else:
            # class-mask-weighted 2x2 block assembly over ordered type pairs
            T = nrow // 2
            tiv = iv["ti"]                 # (CL,1)
            tjv = jr(7)                    # shared across tiles — Mosaic CSEs
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
        pi1 = iv["pi"]                     # i-role prior (from ucgl)
        pj1 = jnp.where(mask, lj, zero)    # j-role prior (from ucgp)
        pipj = pi1 * pj1
        kT = sc["kT"]
        if mf or style == "rleucg":
            # rleucg: mean-field mixing over substate probabilities
            # (pair_table_rleucg_interface.cpp:321-441)
            p11 = pipj
        else:
            # J = u11+u00-u01-u10 is exactly the D channel; f32 overflow
            # clamp at -J/kT = 40 (see _kernel docstring / PARITY)
            xk = jnp.minimum(-eD / kT, 40.0)
            bb = jnp.exp(xk)
            aa = bb - 1.0
            Q = (pi1 + pj1) * aa + 1.0
            D = jnp.maximum(Q * Q - 4.0 * aa * bb * pipj, 0.0)
            sqD = jnp.sqrt(D)
            small = jnp.abs(aa) < 1e-5
            root_pos = 2.0 * bb * pipj / (Q + sqD)
            root_neg = (Q - sqD) / (2.0 * jnp.where(small, 1.0, aa))
            p11 = jnp.where(Q < 0.0, root_neg, root_pos)
            p11 = jnp.where(small, pipj, p11)
        wB, wC, wD = pi1, pj1, p11

    if style == "dbethe":
        # prior-probability force tallies (models/pair_bethe_density pass2;
        # pair_table_ucg_bethe_density.cpp:514-518,650-656)
        kT = sc["kT"]
        if mf:
            lr = (jnp.log(jnp.maximum(pi1, 1e-12))
                  - jnp.log(jnp.maximum(1.0 - pi1, 1e-12)))
        else:
            Est = bb * (pj1 - pi1) + (1.0 - pi1 - pj1)
            Dst = jnp.sqrt(Est * Est + (4.0 * bb) * (pi1 * (1.0 - pi1)))
            lr = jnp.where(
                Est >= 0.0,
                xk + jnp.log(jnp.maximum(2.0 * pi1, 1e-12))
                - jnp.log(jnp.maximum(Est + Dst, 1e-12)),
                jnp.log(jnp.maximum(Dst - Est, 1e-12))
                - jnp.log(jnp.maximum(2.0 * (1.0 - pi1), 1e-12)))
        pf1_u = (eB + eD) + kT * lr
        if dstat is None:
            pf0_c = zero
            pf1_c = pf1_u
        else:
            tjv_d = jr(7)
            jug = None
            for t in dstat:
                m = (tjv_d == float(t))
                jug = m if jug is None else (jug | m)
            pf0_cg = eA + kT * iv["lp0"]
            pf1_cg = (eA + eB) + kT * iv["lp1"]
            pf0_c = jnp.where(jug, zero, pf0_cg)
            pf1_c = jnp.where(jug, pf1_u, pf1_cg)
        tal["pf0"] = tal["pf0"] - jnp.where(mask, pf0_c, zero)
        tal["pf1"] = tal["pf1"] - jnp.where(mask, pf1_c, zero)
    if style == "rleucg" and dstat:
        # two-body probability feedback (:427-435):
        # pf_0 = -Σ_β p_jβ (u_0β - u_1β) = eB + pj1·eD
        tal["pf0"] = tal["pf0"] + jnp.where(mask, eB + pj1 * eD, zero)

    fmix = jnp.where(mask, fA + wB * fB + wC * fC + wD * fD, zero)
    tal["fx"] = tal["fx"] + fmix * dx
    tal["fy"] = tal["fy"] + fmix * dy
    tal["fz"] = tal["fz"] + fmix * dz
    if style == "ucgld":
        # λ-force: -(lj (e11-e01) + (1-lj)(e10-e00)) = -(eB + lj eD)
        tal["lamf"] = tal["lamf"] - jnp.where(mask, eB + lj * eD, zero)
    if observe:
        emix = jnp.where(mask, eA + wB * eB + wC * eC + wD * eD, zero)
        tal["pe"] = tal["pe"] + emix
        vir = tal["vir"]
        vir[0] = vir[0] + fmix * dx * dx
        vir[1] = vir[1] + fmix * dy * dy
        vir[2] = vir[2] + fmix * dz * dz
        vir[3] = vir[3] + fmix * dx * dy
        vir[4] = vir[4] + fmix * dx * dz
        vir[5] = vir[5] + fmix * dy * dz

    if want_scores:
        if style == "bethe" and dstat is not None and dstat[0]:
            # full-SCE conditional expectations (``pseudo no``,
            # pair_table_ucg_bethe.cpp:583-601 intended pairing)
            p0e = jnp.maximum(1.0 - pi1, 1e-6)
            p1e = jnp.maximum(pi1, 1e-6)
            p00 = 1.0 + p11 - pi1 - pj1
            p01v = pj1 - p11
            p10 = pi1 - p11
            c00 = p00 / p0e
            c01 = p01v / p0e
            c10 = p10 / p1e
            c11 = p11 / p1e
            sc0 = c00 * eA + c01 * (eA + eC)
            sc1 = (c10 * (eA + eB) + c11 * ((eA + eB) + (eC + eD)))
            if dstat[1] is not None:
                # plain partners take the pseudolikelihood form at sj=0
                tjv_s = jr(7)
                jug = None
                for t in dstat[1]:
                    m = (tjv_s == float(t))
                    jug = m if jug is None else (jug | m)
                sc0 = jnp.where(jug, sc0, eA)
                sc1 = jnp.where(jug, sc1, eA + eB)
            tal["s0"] = tal["s0"] - jnp.where(mask, sc0, zero)
            tal["s1"] = tal["s1"] - jnp.where(mask, sc1, zero)
        else:
            # pseudolikelihood scores at the partner's discrete state
            tal["s0"] = tal["s0"] - jnp.where(mask, eA + sjr * eC, zero)
            tal["s1"] = tal["s1"] - jnp.where(
                mask, (eA + eB) + sjr * (eC + eD), zero)
    return tal


def _tal_init(style, want_scores, observe, shape):
    """Fresh accumulator dict for :func:`_phys_tile`."""
    z = lambda: jnp.zeros(shape, jnp.float32)  # noqa: E731
    tal = {"fx": z(), "fy": z(), "fz": z()}
    if style == "ucgld":
        tal["lamf"] = z()
    if style in ("dbethe", "rleucg"):
        tal["pf0"] = z()
    if style == "dbethe":
        tal["pf1"] = z()
    if want_scores:
        tal["s0"] = z()
        tal["s1"] = z()
    if observe:
        tal["pe"] = z()
        tal["vir"] = [z() for _ in range(6)]
        tal["oob"] = z()
    return tal


def _iv_of(itile, style, classes, observe):
    """i-side (CL, 1) attribute dict from an (CL, 8) i-cluster tile
    (hoisted loads + per-cluster log hoists)."""
    iv = {"xi": itile[:, 0:1], "yi": itile[:, 1:2],
          "zi": itile[:, 2:3], "li": itile[:, 3:4],
          "vi": itile[:, 5:6]}
    if style != "ucgld":
        iv["pi"] = itile[:, 6:7]
    if style == "dbethe":
        # CG-partner prior-force terms: hoist the 2 logs per cluster
        iv["lp0"] = jnp.log(jnp.maximum(1.0 - iv["pi"], 1e-12))
        iv["lp1"] = jnp.log(jnp.maximum(iv["pi"], 1e-12))
    if classes is not None and len(classes) > 1:
        iv["ti"] = itile[:, 7:8]
    return iv


def _tal_tile(tal, style, want_scores):
    """Reduce a cluster's tallies into ONE (CL, 8) output tile (a single
    store at the call site — dynamic-offset stores are expensive)."""
    red = lambda a: jnp.sum(a, axis=1, keepdims=True)  # noqa: E731
    zcol = jnp.zeros((CL, 1), jnp.float32)
    if style == "ucgld":
        c3 = red(tal["lamf"])
    elif style in ("dbethe", "rleucg"):
        c3 = red(tal["pf0"])
    else:
        c3 = zcol
    c45 = ([red(tal["s0"]), red(tal["s1"])] if want_scores
           else [zcol, zcol])
    c6 = red(tal["pf1"]) if style == "dbethe" else zcol
    return jnp.concatenate(
        [red(tal["fx"]), red(tal["fy"]), red(tal["fz"]), c3, *c45, c6,
         zcol], axis=1)


def _kernel(ce, degree, G, observe, style, mf, classes,
            dform, want_scores, dstat, pipelined, *refs0):
    """One program: G i-clusters vs 9 DMA'd stencil-column windows.

    ``style`` selects the per-candidate physics on the shared window/DMA
    scaffolding: "ucgld" = λ-mixed table_ucgld (λ-forces + pseudolikelihood
    scores); "bethe" = table_ucg_bethe with the closed-form two-point
    distribution (pair_table_ucg_bethe.cpp:544-604) — ipack attr 6 carries
    the i-role prior pi1 (from ucgl), window attr 3 the j-role prior pj1
    (from ucgp), and scal slot 6 carries kT.  ``mf`` selects the mean-field
    p11 = pi1·pj1 ("method mf").  "dbethe" = phase 2 of
    table_ucg_bethe_density (pair_table_ucg_bethe_density.cpp:528-658):
    the Bethe mixing of "bethe" (both roles' priors are the density
    priors — ipack attr 6 AND window attr 3) plus the per-state
    prior-probability force accumulators in out cols 3 (pf0) and 6 (pf1):
    UCG partners tally the conservative reduced derivative
    -(u11-u01 + kT ln(p11/p01)) in the state-1 slot (models/
    pair_bethe_density pair_cv="conservative"); CG partners tally
    -(u_{s0} + kT ln p_s) (:514-518).  ``dstat`` carries the static UCG
    type values for the partner-kind mask (None = every type is UCG).

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
    scal_ref, meta_cur, meta_nxt, ipack_ref, pages_ref, *refs = refs0
    if observe:
        out_ref, out2_ref, jwin, sems = refs
    else:
        out_ref, jwin, sems = refs
        out2_ref = None

    sc = {"cutsq": scal_ref[0, 2], "innersq": scal_ref[0, 3],
          "uscale": scal_ref[0, 4], "uoff": scal_ref[0, 5],
          "kT": scal_ref[0, 6]}

    # windows land in jwin[slot] with the xy periodic image shift applied
    # (colpack._stencil_shifts: the column relationship statically
    # determines the only image within cutoff — 2 row updates per window
    # instead of per-candidate min-image rounds)
    slot = _window_prologue(pipelined, scal_ref, meta_cur, meta_nxt,
                            pages_ref, jwin, sems)

    want_eac = want_scores or observe or style != "ucgld"
    # loop order: STENCIL WINDOW outer, cluster inner — the 4-6 j-attribute
    # row loads are issued once per window instead of once per (cluster,
    # window); per-cluster accumulators persist across the window loop
    iv_b = [_iv_of(ipack_ref[b * CL:(b + 1) * CL, :], style, classes,
                   observe) for b in range(G)]
    tal_b = [_tal_init(style, want_scores, observe, (CL, W))
             for _ in range(G)]

    for s in range(NSTEN):
        def jr_s(a, _s=s):
            return jwin[slot, _s, a:a + 1, :]

        for b in range(G):
            tal_b[b] = _phys_tile(ce, degree, style, mf, classes, dform,
                                  want_scores, want_eac, observe, dstat,
                                  sc, iv_b[b], jr_s, tal_b[b])

    if observe:
        pe_t = jnp.zeros((), jnp.float32)
        vir_t = [jnp.zeros((), jnp.float32) for _ in range(6)]
        oob_t = jnp.zeros((), jnp.float32)
    for b in range(G):
        out_ref[b * CL:(b + 1) * CL, :] = _tal_tile(tal_b[b], style,
                                                    want_scores)
        if observe:
            pe_t = pe_t + jnp.sum(tal_b[b]["pe"])
            for v in range(6):
                vir_t[v] = vir_t[v] + jnp.sum(tal_b[b]["vir"][v])
            oob_t = oob_t + jnp.sum(tal_b[b]["oob"])

    if observe:
        row = jnp.concatenate([
            pe_t[None], vir_t[0][None], vir_t[1][None], vir_t[2][None],
            vir_t[3][None], vir_t[4][None], vir_t[5][None], oob_t[None],
        ])[None, :]
        out2_ref[:, :] = jnp.broadcast_to(row, (8, 8))


def _call_windows(kern, cl: colpack.ColumnList, scal, ipack, pages,
                  observe: bool, interpret: bool):
    """Shared pallas_call scaffolding: one program per (column, group) with
    9 window DMAs (cross-program pipelined when compiled — see
    _window_prologue); (n_slots, 8) per-atom outputs (+ per-program
    partials when ``observe``)."""
    dtype = jnp.float32
    gs = cl.gs
    n_prog = cl.n_prog
    meta = cl.meta
    if meta.shape[0] % 8:
        meta = jnp.pad(meta, ((0, -meta.shape[0] % 8), (0, 0)))
    n_mblk = meta.shape[0] // 8

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
            # the NEXT meta block (clamped): the prefetch of program p+1's
            # windows at 8-row block boundaries reads its row from here
            pl.BlockSpec((8, 32),
                         lambda p: (jnp.minimum(p // 8 + 1, n_mblk - 1), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gs, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
            # pages stay in HBM; window DMAs slice only the untiled leading
            # dims (page id, padded column), never the (8, W) tile
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, NSTEN, 8, W), dtype),    # 2-slot window ring
            pltpu.SemaphoreType.DMA((2, NSTEN)),
        ],
        interpret=interpret,
    )(scal, meta, meta, ipack, pages)


def _call_colspan(kern, cl: colpack.ColumnList, scal, ipack, cols,
                  observe: bool, interpret: bool):
    """pallas_call scaffolding for the column-resident span kernels: one
    program per COLUMN.  ``cols`` is the plain (ncol, 8, czp) attr-major
    column array (colpack.pack/pack_slots with cl.NV > 0); the nine
    stencil-column blocks are regular pipelined inputs with arithmetic
    index maps (grid wrap), so the Pallas pipeline prefetches and
    double-buffers them — no manual DMA anywhere."""
    dtype = jnp.float32
    ncol = cl.ncol
    cz = cl.cz
    czp = cl.czp
    mx, my = cl.mx, cl.my
    pk_meta = cl.pk_meta
    if pk_meta.shape[0] % 8:
        pk_meta = jnp.pad(pk_meta, ((0, -pk_meta.shape[0] % 8), (0, 0)))
    MW = pk_meta.shape[1]
    npg = cl.npage

    def win_spec(s):
        dx, dy = s // 3 - 1, s % 3 - 1

        def im(p):
            i32 = jnp.int32
            cx = p // i32(my)
            cy = p - cx * i32(my)
            col = (jax.lax.rem(cx + i32(dx + mx), i32(mx)) * i32(my)
                   + jax.lax.rem(cy + i32(dy + my), i32(my)))
            return (col, 0, 0)
        return pl.BlockSpec((1, 8, czp), im, memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((cz, 8), lambda p: (p, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((cl.n_slots, 8), dtype)]
    if observe:
        out_specs.append(
            pl.BlockSpec((8, 8), lambda p: (p, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ncol * 8, 8), dtype))

    return pl.pallas_call(
        kern,
        grid=(ncol,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, MW), lambda p: (p // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cz, 8), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            *[win_spec(s) for s in range(NSTEN)],
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((NSTEN * npg * CL, W), dtype)],
        interpret=interpret,
    )(scal, pk_meta, ipack, *([cols] * NSTEN))


_SPAN_POISON = 1.0e17      # == colpack._PAD_POISON: unfilled packed lanes


def _colspan_pages(wins, pbuf, mx, my, czp, S, npg, Lx, Ly):
    """Stage overlapped z-pages of the 9 stencil-column attribute buffers
    into VMEM scratch ``pbuf`` (page a of window s at rows (s*npg+a)*8
    covers column slots [a*S, a*S+128)), with the xy periodic image shift
    applied — once per COLUMN, amortized over all its clusters.  The shift
    follows from pure arithmetic on the grid position
    (colpack._stencil_shifts semantics); for non-periodic virtual boxes the
    out-of-range windows carry L=0 span codes, so their (wrapped,
    wrong-image) content is never selected."""
    i32 = jnp.int32
    p = i32(pl.program_id(0))
    cx = p // i32(my)
    cy = p - cx * i32(my)
    rowio = jax.lax.broadcasted_iota(jnp.int32, (CL, 1), 0)
    for s in range(NSTEN):
        dx, dy = s // 3 - 1, s % 3 - 1
        sx = ((cx + i32(dx + mx)) // i32(mx) - 1).astype(jnp.float32)
        sy = ((cy + i32(dy + my)) // i32(my) - 1).astype(jnp.float32)
        sv = jnp.where(rowio == 0, sx * Lx,
                       jnp.where(rowio == 1, sy * Ly, 0.0))
        w = wins[s][0] + sv
        for a in range(npg):
            pbuf[(s * npg + a) * CL:(s * npg + a + 1) * CL, :] = \
                w[:, a * S:a * S + W]


def _colspan_concat(NV, S, npg, codes, pbuf):
    """Roll-concat one cluster's nine column spans into NV dense packed
    (8 attr, 128) candidate vregs (returned as VALUES — no scratch
    read-modify-write on the hot path).

    Per stencil window s the rebuild-time code z0|L<<12|d<<20
    (colpack.build) gives the span [z0, z0+L) in column slots and its
    packed destination lane d.  The span lies inside staged page
    a = z0//S (the spec's span-fits-page-budget guarantee); ONE
    single-vreg dynamic lane roll (pltpu.roll — near-FMA cost on this
    hardware; multi-vreg dynamic rolls are ~90x slower, measured
    2026-08-21) aligns it CIRCULARLY at lane d%128, and the two iota-mask
    selects place the unwrapped head and the wrapped tail into the <= 2
    destination vregs.  Unwritten lanes keep the poison init so rsq
    overflows every cutoff."""
    i32 = jnp.int32
    io = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    rolled, dd, ll = [], [], []
    for s in range(NSTEN):
        code = codes[s]
        z0 = jax.lax.rem(code, i32(4096))
        Ls = jax.lax.rem(code // i32(4096), i32(256))
        d = code // i32(1048576)
        a = jnp.minimum(z0 // i32(S), i32(npg - 1))
        o = z0 - a * i32(S)
        page = pbuf[pl.ds((i32(s * npg) + a) * i32(CL), CL), :]
        sh = jax.lax.rem(d - o + i32(4 * W), i32(W))
        rolled.append(pltpu.roll(page, sh, 1))
        dd.append(d)
        ll.append(Ls)
    accs = []
    for v in range(NV):
        acc = jnp.full((CL, W), _SPAN_POISON, jnp.float32)
        for s in range(NSTEN):
            # destination lanes [d, d+L) ∩ this vreg: because the roll is
            # circular mod 128, both the head and any vreg-boundary-wrapped
            # tail sit at exactly lanes (j mod 128) of the ONE rolled vreg
            # — a single masked select per (v, s) places either part
            lo = dd[s] - i32(v * W)
            m = (io >= lo) & (io < lo + ll[s])
            acc = jnp.where(m, rolled[s], acc)
        accs.append(acc)
    return accs


def _kernel_colspan(ce, degree, NV, observe, style, mf, classes,
                    dform, want_scores, dstat, mx, my, cz, czp, S, npg,
                    *refs0):
    """Column-resident packed-candidate pair kernel (the VERDICT r4 #1
    compaction).  One grid program per COLUMN: the nine stencil-column
    attribute buffers arrive as pipelined (1, 8, czp) blocks (arithmetic
    index maps — no per-program DMA scaffolding at all; the window kernel's
    measured ~44 ns/atom DMA issue cost amortizes over the column's ~50
    clusters), and a fori_loop walks the column's 8-slot clusters: each
    roll-concats its nine true spans into NV dense packed vregs
    (:func:`_colspan_concat`) and runs the shared per-tile physics
    (:func:`_phys_tile`) on them.  Packed lanes/atom at the 262k flagship:
    ~390+ceil vs the window kernel's fixed 1152 — ~2.5-3x less VPU work —
    and the overlapped z-pages array disappears entirely (colpack.pack
    returns the plain (ncol, 8, czp) column array)."""
    scal_ref, pkm_ref, ipack_ref, *rest = refs0
    wins = rest[:NSTEN]
    rest = rest[NSTEN:]
    if observe:
        out_ref, out2_ref, pbuf = rest
    else:
        out_ref, pbuf = rest
        out2_ref = None

    sc = {"cutsq": scal_ref[0, 2], "innersq": scal_ref[0, 3],
          "uscale": scal_ref[0, 4], "uoff": scal_ref[0, 5],
          "kT": scal_ref[0, 6]}
    _colspan_pages(wins, pbuf, mx, my, czp, S, npg,
                   scal_ref[0, 0], scal_ref[0, 1])
    want_eac = want_scores or observe or style != "ucgld"
    i32 = jnp.int32
    mrow = jax.lax.rem(i32(pl.program_id(0)), i32(8))
    cpc = cz // CL

    def body(b, carry):
        codes = [pkm_ref[mrow, b * NSTEN + s] for s in range(NSTEN)]
        accs = _colspan_concat(NV, S, npg, codes, pbuf)
        off = b * i32(CL)
        itile = ipack_ref[pl.ds(off, CL), :]
        iv = _iv_of(itile, style, classes, observe)
        tal = _tal_init(style, want_scores, observe, (CL, W))
        for v in range(NV):
            def jr_v(a, _r=accs[v]):
                return _r[a:a + 1, :]

            tal = _phys_tile(ce, degree, style, mf, classes, dform,
                             want_scores, want_eac, observe, dstat,
                             sc, iv, jr_v, tal)
        out_ref[pl.ds(off, CL), :] = _tal_tile(tal, style, want_scores)
        if not observe:
            return carry
        pe_t, vir_t, oob_t = carry
        pr = jnp.sum(tal["pe"], axis=1, keepdims=True)
        vr = [jnp.sum(tal["vir"][k], axis=1, keepdims=True)
              for k in range(6)]
        orr = jnp.sum(tal["oob"], axis=1, keepdims=True)
        return (pe_t + pr, [vir_t[k] + vr[k] for k in range(6)],
                oob_t + orr)

    # full unroll: the per-cluster scalar chains (SMEM code reads, page
    # addresses, roll shifts) are latency-bound inside a rolled loop —
    # unrolling lets Mosaic overlap them across clusters (measured -29%
    # at 262k, 2026-08-21)
    z81 = jnp.zeros((CL, 1), jnp.float32)
    carry = (z81, [z81] * 6, z81) if observe else 0
    for b in range(cpc):
        carry = body(i32(b), carry)

    if observe:
        pe_t, vir_t, oob_t = carry
        row = jnp.concatenate(
            [jnp.sum(pe_t)[None]] + [jnp.sum(v)[None] for v in vir_t]
            + [jnp.sum(oob_t)[None]])[None, :]
        out2_ref[:, :] = jnp.broadcast_to(row, (8, 8))


def _kernel_cv(G, observe, mode, dstat, pipelined, *refs0):
    """Geometry-only window kernels for the density styles (P3): no tables,
    no state mixing — same window/DMA scaffolding as :func:`_kernel`.

    ``mode="rho"``: per-atom local density ρ_i = Σ w(r) and real neighbor
    count (pair_table_ucg_bethe_density.cpp:219-255); w is the tanh
    proximity function (density.proximity).
    ``mode="cv"``: CV back-force F_i = Σ_j (cvf_i g_i + cvf_j g_j)/r · dr
    (:698-733) — cvf_i rides ipack attr 6, cvf_j window attr 3; ``g`` is
    -dw/dr (backforce_derivative=True) or the reference-literal w(r)
    (:719).

    ``dstat``: (rads, gform) with ``rads`` a tuple of (type_value, radius)
    per type (one entry = static constant radius) and ``gform`` the g(r)
    form: "mder" = -dw/dr (the conservative chain rule, P3
    backforce_derivative / P4 conservative_sign), "pder" = +dw/dr (P4
    reference-literal, :480), "w" = w(r) (P3 reference-literal, :719).
    """
    scal_ref, meta_cur, meta_nxt, ipack_ref, pages_ref, *refs = refs0
    if observe:
        out_ref, out2_ref, jwin, sems = refs
    else:
        out_ref, jwin, sems = refs
        out2_ref = None

    cutsq = scal_ref[0, 2]
    slot = _window_prologue(pipelined, scal_ref, meta_cur, meta_nxt,
                            pages_ref, jwin, sems)

    rads, gform = dstat

    iv_b = [_iv_cv_of(ipack_ref[b * CL:(b + 1) * CL, :], mode, rads,
                      observe) for b in range(G)]
    tal_b = [_tal_cv_init(mode, observe, (CL, W)) for _ in range(G)]

    for s in range(NSTEN):
        def jr_s(a, _s=s):
            return jwin[slot, _s, a:a + 1, :]

        for b in range(G):
            tal_b[b] = _phys_cv_tile(mode, rads, gform, observe, cutsq,
                                     iv_b[b], jr_s, tal_b[b])

    for b in range(G):
        out_ref[b * CL:(b + 1) * CL, :] = _tal_cv_tile(tal_b[b])

    if observe:
        if mode == "cv":
            vir_t = [jnp.zeros((), jnp.float32) for _ in range(6)]
            for b in range(G):
                for v in range(6):
                    vir_t[v] = vir_t[v] + jnp.sum(tal_b[b]["vir"][v])
            row = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32)]
                + [v[None] for v in vir_t]
                + [jnp.zeros((1,), jnp.float32)])[None, :]
        else:
            row = jnp.zeros((1, 8), jnp.float32)
        out2_ref[:, :] = jnp.broadcast_to(row, (8, 8))


def _rad_of(rads, tv):
    if len(rads) == 1:
        return rads[0][1]
    acc = None
    for (t, r) in rads:
        m = (tv == float(t)).astype(jnp.float32) * r
        acc = m if acc is None else acc + m
    return acc


def _iv_cv_of(itile, mode, rads, observe):
    iv = {"xi": itile[:, 0:1], "yi": itile[:, 1:2], "zi": itile[:, 2:3]}
    iv["ri"] = (_rad_of(rads, itile[:, 7:8]) if len(rads) > 1
                else rads[0][1])
    if mode == "cv":
        iv["ci"] = itile[:, 6:7]
    if observe:
        iv["vi"] = itile[:, 5:6]
    return iv


def _tal_cv_init(mode, observe, shape):
    z = lambda: jnp.zeros(shape, jnp.float32)  # noqa: E731
    tal = {"a0": z(), "a1": z(), "a2": z()}
    if observe and mode == "cv":
        tal["vir"] = [z() for _ in range(6)]
    return tal


def _tal_cv_tile(tal):
    red = lambda a: jnp.sum(a, axis=1, keepdims=True)  # noqa: E731
    return jnp.concatenate(
        [red(tal["a0"]), red(tal["a1"]), red(tal["a2"]),
         jnp.zeros((CL, 5), jnp.float32)], axis=1)


def _phys_cv_tile(mode, rads, gform, observe, cutsq, iv, jr, tal):
    """Per-tile geometry physics for the density styles (see
    :func:`_kernel_cv` for the physics contract), shared by the window and
    span kernels."""
    xj, yj, zj = jr(0), jr(1), jr(2)
    if mode == "cv":
        cj = jr(3)
        rj = _rad_of(rads, jr(7)) if len(rads) > 1 else rads[0][1]
    if observe:
        vjr = jr(5)

    dx = iv["xi"] - xj
    dy = iv["yi"] - yj
    dz = iv["zi"] - zj
    rsq = dx * dx + dy * dy + dz * dz
    mask = (rsq < cutsq) & (rsq > 0.0)
    if observe:
        mask = mask & (vjr > 0.5) & (iv["vi"] > 0.5)
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
    ri = iv["ri"]
    zero = jnp.zeros_like(r)

    if mode == "rho":
        t = jnp.tanh((r - ri) / (0.1 * ri))
        tal["a0"] = tal["a0"] + jnp.where(mask, 0.5 * (1.0 - t), zero)
        tal["a1"] = tal["a1"] + jnp.where(mask, 1.0, 0.0)
    else:
        ti = jnp.tanh((r - ri) / (0.1 * ri))
        tj = (ti if len(rads) == 1 else jnp.tanh((r - rj) / (0.1 * rj)))
        if gform in ("mder", "pder"):
            sgn = -0.5 if gform == "mder" else 0.5
            gi = sgn * (1.0 - ti * ti) / (0.1 * ri)
            gj = sgn * (1.0 - tj * tj) / (0.1 * (rj if len(rads) > 1
                                                 else ri))
        else:
            gi = 0.5 * (1.0 - ti)
            gj = 0.5 * (1.0 - tj)
        fcv = jnp.where(mask, (iv["ci"] * gi + cj * gj) / r, zero)
        tal["a0"] = tal["a0"] + fcv * dx
        tal["a1"] = tal["a1"] + fcv * dy
        tal["a2"] = tal["a2"] + fcv * dz
        if observe:
            vir = tal["vir"]
            vir[0] = vir[0] + fcv * dx * dx
            vir[1] = vir[1] + fcv * dy * dy
            vir[2] = vir[2] + fcv * dz * dz
            vir[3] = vir[3] + fcv * dx * dy
            vir[4] = vir[4] + fcv * dx * dz
            vir[5] = vir[5] + fcv * dy * dz
    return tal


def _kernel_cv_colspan(NV, observe, mode, dstat, mx, my, cz, czp, S, npg,
                       *refs0):
    """Column-resident span variant of :func:`_kernel_cv` — same
    scaffolding as :func:`_kernel_colspan`."""
    scal_ref, pkm_ref, ipack_ref, *rest = refs0
    wins = rest[:NSTEN]
    rest = rest[NSTEN:]
    if observe:
        out_ref, out2_ref, pbuf = rest
    else:
        out_ref, pbuf = rest
        out2_ref = None

    cutsq = scal_ref[0, 2]
    _colspan_pages(wins, pbuf, mx, my, czp, S, npg,
                   scal_ref[0, 0], scal_ref[0, 1])
    rads, gform = dstat
    i32 = jnp.int32
    mrow = jax.lax.rem(i32(pl.program_id(0)), i32(8))
    cpc = cz // CL

    def body(b, carry):
        codes = [pkm_ref[mrow, b * NSTEN + s] for s in range(NSTEN)]
        accs = _colspan_concat(NV, S, npg, codes, pbuf)
        off = b * i32(CL)
        itile = ipack_ref[pl.ds(off, CL), :]
        iv = _iv_cv_of(itile, mode, rads, observe)
        tal = _tal_cv_init(mode, observe, (CL, W))
        for v in range(NV):
            def jr_v(a, _r=accs[v]):
                return _r[a:a + 1, :]

            tal = _phys_cv_tile(mode, rads, gform, observe, cutsq,
                                iv, jr_v, tal)
        out_ref[pl.ds(off, CL), :] = _tal_cv_tile(tal)
        if not (observe and mode == "cv"):
            return carry
        return [carry[k] + jnp.sum(tal["vir"][k], axis=1, keepdims=True)
                for k in range(6)]

    z81 = jnp.zeros((CL, 1), jnp.float32)
    carry = [z81] * 6 if (observe and mode == "cv") else 0
    for b in range(cpc):                      # full unroll (see _kernel_colspan)
        carry = body(i32(b), carry)

    if observe:
        if mode == "cv":
            row = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32)]
                + [jnp.sum(v)[None] for v in carry]
                + [jnp.zeros((1,), jnp.float32)])[None, :]
        else:
            row = jnp.zeros((1, 8), jnp.float32)
        out2_ref[:, :] = jnp.broadcast_to(row, (8, 8))


def _run_kernel_cv(cl: colpack.ColumnList, scal, ipack, pages,
                   observe: bool, mode: str, dstat, interpret):
    interpret = _auto_interpret(interpret)
    if cl.NV > 0:
        kern = functools.partial(_kernel_cv_colspan, cl.NV, observe, mode,
                                 dstat, cl.mx, cl.my, cl.cz, cl.czp, cl.S,
                                 cl.npage)
        return _call_colspan(kern, cl, scal, ipack, pages, observe,
                             interpret)
    kern = functools.partial(_kernel_cv, cl.G, observe, mode, dstat,
                             not interpret)
    return _call_windows(kern, cl, scal, ipack, pages, observe, interpret)


def _run_kernel(cl: colpack.ColumnList, scal, ipack, pages, cheb: ChebBank,
                observe: bool, style: str, mf: bool, interpret: bool,
                classes: "tuple | None" = None, want_scores: bool = True,
                dstat=None):
    """Shared pallas_call scaffolding for every kernel style.

    Single-class systems get the D-form transform at the COEFFICIENT level
    (rows become [eA eB eC eD fA fB fC fD], or [eB eD fA..fD] when scores
    are skipped) — the 2x2 mixing basis change costs nothing at runtime.
    Multi-class systems keep raw channel rows (shared across classes) and
    convert in-kernel after mask assembly."""
    interpret = _auto_interpret(interpret)
    G = cl.G
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
    if cl.NV > 0:
        kern = functools.partial(_kernel_colspan, ce, cheb.degree, cl.NV,
                                 observe, style, mf, classes, dform,
                                 want_scores, dstat, cl.mx, cl.my, cl.cz,
                                 cl.czp, cl.S, cl.npage)
        return _call_colspan(kern, cl, scal, ipack, pages, observe,
                             interpret)
    kern = functools.partial(_kernel, ce, cheb.degree, G, observe, style,
                             mf, classes, dform, want_scores, dstat,
                             not interpret)
    return _call_windows(kern, cl, scal, ipack, pages, observe, interpret)


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
    # _pack_dispatch fences attrs behind an optimization_barrier: without
    # it XLA fuses the integrator's elementwise producers into pack_slots'
    # transpose/page-stack, destroying the transpose's tiled lowering
    # (~25 ns/atom measured)
    attrs, pages = _pack_dispatch(
        True, cl, state.box, state.x, lam_eff, state.ucgstate, dtype,
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


def _excl_channels(state: SimState, jrows: jax.Array, params):
    """Shared geometry + Chebyshev channel evaluation for the excl_delta
    family: (N, S) pair displacements/mask and the D-form channel values,
    computed with the KERNEL's exact formulas (direct T_k recurrence, −1
    inner clamp, class-mask 2x2 assembly)."""
    tp = params.tp
    cheb = params.cheb
    n = state.x.shape[0]
    dtype = jnp.float32
    ok = jrows < n
    jc = jnp.where(ok, jrows, 0)
    x = state.x.astype(dtype)
    dr = state.box.min_image(x[:, None, :] - x[jc])            # (N, S, 3)
    rsq = jnp.sum(dr * dr, axis=-1)
    cutsq = tp.cutsq[1, 1].astype(dtype)
    mask = ok & (rsq < cutsq) & (rsq > 0.0)
    uscale, uoff = _u_map(cheb, dtype)
    u = jnp.maximum(rsq * uscale + uoff, -1.0)
    u2 = u + u

    ce = np.asarray(cheb.coeffs, np.float64)
    nrow = ce.shape[0]
    acc = [jnp.full_like(u, float(ce[r][0])) + float(ce[r][1]) * u
           for r in range(nrow)]
    tm2 = jnp.ones_like(u)
    tm1 = u
    for k in range(2, cheb.degree):
        tk = u2 * tm1 - tm2
        for r in range(nrow):
            acc[r] = acc[r] + float(ce[r][k]) * tk
        tm2, tm1 = tm1, tk

    T = nrow // 2
    classes = _type_classes(tp, params.bank.n_tables)
    if len(classes) == 1:
        ids = classes[0][2]
        e00, e01, e10, e11 = (acc[ids[0]], acc[ids[1]], acc[ids[2]],
                              acc[ids[3]])
        f00, f01, f10, f11 = (acc[T + ids[0]], acc[T + ids[1]],
                              acc[T + ids[2]], acc[T + ids[3]])
    else:
        tiv = state.typ[:, None]
        tjv = state.typ[jc]
        e00 = e01 = e10 = e11 = None
        f00 = f01 = f10 = f11 = None
        for (tci, tcj, ids) in classes:
            m = ((tiv == tci) & (tjv == tcj)).astype(dtype)
            vals = [m * acc[ids[q]] for q in range(4)]
            fvals = [m * acc[T + ids[q]] for q in range(4)]
            if e00 is None:
                e00, e01, e10, e11 = vals
                f00, f01, f10, f11 = fvals
            else:
                e00, e01 = e00 + vals[0], e01 + vals[1]
                e10, e11 = e10 + vals[2], e11 + vals[3]
                f00, f01 = f00 + fvals[0], f01 + fvals[1]
                f10, f11 = f10 + fvals[2], f11 + fvals[3]
    eA, eB, eC = e00, e10 - e00, e01 - e00
    eD = (e11 - e01) - (e10 - e00)
    fA, fB, fC = f00, f10 - f00, f01 - f00
    fD = (f11 - f01) - (f10 - f00)
    return jc, dr, rsq, mask, (eA, eB, eC, eD, fA, fB, fC, fD)


def excl_delta(state: SimState, jrows: jax.Array,
               params: UCGLDParams) -> ForceOut:
    """Pair contributions of the special-exclusion lists (``jrows`` (N, S)
    row indices, == N for empty slots), evaluated with the KERNEL's OWN
    functional — same Chebyshev fit, same direct T_k recurrence, same −1
    inner-bin clamp, same D-form mixing — so that ``kernel_fout −
    excl_delta`` cancels each excluded pair to f32 rounding even where the
    fit is extrapolated (bonded 1-2 partners sit far below the table inner
    bound, where fit and table disagree; identical formulas make the
    disagreement irrelevant).

    This is how special_bonds exclusions compose with the fused column
    kernel: the kernel has no per-pair identity channel (all 8 window
    attribute rows are spoken for), so excluded pairs are *computed and
    subtracted* rather than masked — the TPU-native replacement for the
    reference's list-side exclusion (stock LAMMPS special-neighbor culling;
    the UCG pair loops themselves never see special pairs,
    pair_table_ucgld.cpp:184-219 via the neighbor list).  O(N·S) work,
    negligible next to the 9·128-candidate kernel sweep."""
    tp = params.tp
    jc, dr, rsq, mask, (eA, eB, eC, eD, fA, fB, fC, fD) = _excl_channels(
        state, jrows, params)
    dtype = jnp.float32
    is_ucg = tp.n_states[state.typ] > 1
    lam_eff = jnp.where(is_ucg, state.ucgl, 0.0).astype(dtype)
    li = lam_eff[:, None]
    lj = lam_eff[jc]
    sj = state.ucgstate[jc].astype(dtype)
    zero = jnp.zeros_like(rsq)
    fmix = jnp.where(mask, fA + li * fB + lj * fC + (li * lj) * fD, zero)
    f = jnp.sum(fmix[..., None] * dr, axis=1)
    lamf = -jnp.sum(jnp.where(mask, eB + lj * eD, zero), axis=1)
    kT = params.kT.astype(dtype)
    s0 = -jnp.sum(jnp.where(mask, eA + sj * eC, zero), axis=1)
    s1 = -jnp.sum(jnp.where(mask, (eA + eB) + sj * (eC + eD), zero), axis=1)
    scores = jnp.stack([s0, s1], axis=1) / kT
    emix = jnp.where(mask, eA + li * eB + lj * eC + (li * lj) * eD, zero)
    dx, dy, dz = dr[..., 0], dr[..., 1], dr[..., 2]
    innersq = params.bank.innersq[0].astype(dtype)
    return ForceOut(
        f=f,
        ucgforce=jnp.where(is_ucg, lamf, 0.0),
        scores=jnp.where(is_ucg[:, None], scores, 0.0),
        pe=0.5 * jnp.sum(emix),
        virial=0.5 * jnp.stack([
            jnp.sum(fmix * dx * dx), jnp.sum(fmix * dy * dy),
            jnp.sum(fmix * dz * dz), jnp.sum(fmix * dx * dy),
            jnp.sum(fmix * dx * dz), jnp.sum(fmix * dy * dz)]),
        oob_low=jnp.sum(mask & (rsq < innersq)).astype(jnp.int32),
        oob_high=jnp.zeros((), jnp.int32),
    )


compute_style.excl_delta = excl_delta


def supports_bethe(params, n_atoms: int) -> bool:
    """Static eligibility of the fused Bethe kernel: same geometry scope as
    table_ucgld (up to 3 actual types, each plain or 2-state, via the
    class-mask 2x2 block assembly — the closed form degenerates exactly
    for plain partners since their priors are zeroed); both
    pseudolikelihood and full-SCE score modes."""
    from lammps_ucg_dev_tpu.models.pair_bethe import BetheParams

    if not isinstance(params, BetheParams):
        return False
    tp = params.tp
    ntypes = tp.cutsq.shape[0] - 1
    if not fittable(params.bank) or ntypes < 1:
        return False
    ns = np.asarray(tp.n_states)[1:]
    if not np.all((ns == 1) | (ns == 2)) or not np.any(ns == 2):
        return False
    cuts = np.asarray(tp.cutsq)[1:, 1:]
    if not np.allclose(cuts, cuts[0, 0]):
        return False
    # sentinel-atom prior fallbacks (prior flag) are host-side (_priors),
    # shared with the XLA path — no kernel constraint
    return params.bank.n_tables <= 8 and ntypes <= 3


def _pack_dispatch(slot: bool, cl, box, x, lam, ucgstate, dtype,
                   aux=None, typ=None):
    """pack (atom-ordered) vs pack_slots (slot-resident) with one call
    site: the slot variant assembles the i-side attrs by CONCAT of the
    resident slot arrays (valid col = i_valid; pad rows already poisoned
    via the slot gather) behind a materialization fence."""
    if not slot:
        return colpack.pack(cl, box, x, lam, ucgstate, dtype=dtype,
                            aux=aux, typ=typ)
    n_slots = x.shape[0]
    attrs = jnp.concatenate([
        x.astype(dtype),
        lam.astype(dtype)[:, None],
        ucgstate.astype(dtype)[:, None],
        cl.i_valid.astype(dtype)[:, None],
        (jnp.zeros((n_slots, 1), dtype) if aux is None
         else aux.astype(dtype)[:, None]),
        (jnp.zeros((n_slots, 1), dtype) if typ is None
         else typ.astype(dtype)[:, None]),
    ], axis=1)
    attrs = jax.lax.optimization_barrier(attrs)
    return attrs, colpack.pack_slots(cl, box, attrs)


def compute_bethe(state: SimState, cl: colpack.ColumnList, params,
                  cheb: ChebBank, interpret: bool = False,
                  observe: bool = True, slot: bool = False) -> ForceOut:
    """Fused ``table_ucg_bethe`` evaluation: closed-form Bethe pij per
    candidate (pair_table_ucg_bethe.cpp:544-604) on the column-window
    scaffolding.  Priors are computed host-side exactly like the XLA path
    (models/pair_bethe._priors): ipack aux = pi1 (i-role, from ucgl),
    window attr 3 = pj1 (j-role, from ucgp).  ``slot=True``: state is
    slot-resident (see compute_slot) — no pack gather, no out-take."""
    from lammps_ucg_dev_tpu.models import pair_bethe

    tp = params.tp
    dtype = jnp.float32

    classes = _type_classes(tp, params.bank.n_tables)
    pi1, pj1 = pair_bethe._priors(state, params)
    ipack, pages = _pack_dispatch(slot, cl, state.box, state.x, pj1,
                                  state.ucgstate, dtype, aux=pi1,
                                  typ=(state.typ if len(classes) > 1
                                       else None))
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

    ntypes = tp.cutsq.shape[0] - 1
    ucg_types = tuple(
        int(t) for t in range(1, ntypes + 1)
        if int(np.asarray(tp.n_states)[t]) > 1)
    jug = None if len(ucg_types) == ntypes else ucg_types
    outs = _run_kernel(cl, scal, ipack, pages, cheb, observe,
                       style="bethe", mf=params.method == "mf",
                       interpret=interpret, classes=classes,
                       dstat=(not params.pseudo, jug))
    out_at = (outs[0] if slot else
              jnp.take(outs[0], cl.atom_slot, axis=0, mode="clip"))
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


def compute_style_bethe_slot_fast(state: SimState, cl: colpack.ColumnList,
                                  params) -> ForceOut:
    """Slot-resident interior-step variant of the Bethe kernel."""
    return compute_bethe(state, cl, params, params.cheb, observe=False,
                         interpret=None, slot=True)


def excl_delta_bethe(state: SimState, jrows: jax.Array, params) -> ForceOut:
    """Bethe-style exclusion delta (see :func:`excl_delta`): the closed-form
    two-point mixing of the fused Bethe kernel evaluated over the special
    lists, with the SAME priors the kernel packs (pair_bethe._priors), the
    same f32 clamp at −J/kT = 40, and both score modes — so bonded decks
    with ``pair_style table_ucg_bethe`` keep the fused kernel."""
    from lammps_ucg_dev_tpu.models import pair_bethe

    tp = params.tp
    dtype = jnp.float32
    jc, dr, rsq, mask, (eA, eB, eC, eD, fA, fB, fC, fD) = _excl_channels(
        state, jrows, params)
    pi1_all, pj1_all = pair_bethe._priors(state, params)
    pi1 = pi1_all.astype(dtype)[:, None]
    zero = jnp.zeros_like(rsq)
    pj1 = jnp.where(mask, pj1_all.astype(dtype)[jc], zero)
    pipj = pi1 * pj1
    kT = params.kT.astype(dtype)
    if params.method == "mf":
        p11 = pipj
    else:
        xk = jnp.minimum(-eD / kT, 40.0)
        bb = jnp.exp(xk)
        aa = bb - 1.0
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
    f = jnp.sum(fmix[..., None] * dr, axis=1)
    emix = jnp.where(mask, eA + wB * eB + wC * eC + wD * eD, zero)

    ntypes = tp.cutsq.shape[0] - 1
    ucg_types = tuple(
        int(t) for t in range(1, ntypes + 1)
        if int(np.asarray(tp.n_states)[t]) > 1)
    if params.pseudo:
        sj = state.ucgstate[jc].astype(dtype)
        sc0 = eA + sj * eC
        sc1 = (eA + eB) + sj * (eC + eD)
    else:
        # full-SCE conditional expectations (mirrors _kernel's dstat branch)
        p0e = jnp.maximum(1.0 - pi1, 1e-6)
        p1e = jnp.maximum(pi1, 1e-6)
        p00 = 1.0 + p11 - pi1 - pj1
        p01v = pj1 - p11
        p10 = pi1 - p11
        sc0 = (p00 / p0e) * eA + (p01v / p0e) * (eA + eC)
        sc1 = ((p10 / p1e) * (eA + eB)
               + (p11 / p1e) * ((eA + eB) + (eC + eD)))
        if len(ucg_types) != ntypes:
            jug = None
            for t in ucg_types:
                m = state.typ[jc] == t
                jug = m if jug is None else (jug | m)
            sc0 = jnp.where(jug, sc0, eA)
            sc1 = jnp.where(jug, sc1, eA + eB)
    s0 = -jnp.sum(jnp.where(mask, sc0, zero), axis=1)
    s1 = -jnp.sum(jnp.where(mask, sc1, zero), axis=1)
    is_ucg = tp.n_states[state.typ] > 1
    scores = jnp.stack([s0, s1], axis=1) / kT
    dx, dy, dz = dr[..., 0], dr[..., 1], dr[..., 2]
    innersq = params.bank.innersq[0].astype(dtype)
    return ForceOut(
        f=f,
        ucgforce=jnp.zeros_like(pi1_all),
        scores=jnp.where(is_ucg[:, None], scores, 0.0),
        pe=0.5 * jnp.sum(emix),
        virial=0.5 * jnp.stack([
            jnp.sum(fmix * dx * dx), jnp.sum(fmix * dy * dy),
            jnp.sum(fmix * dz * dz), jnp.sum(fmix * dx * dy),
            jnp.sum(fmix * dx * dz), jnp.sum(fmix * dy * dz)]),
        oob_low=jnp.sum(mask & (rsq < innersq)).astype(jnp.int32),
        oob_high=jnp.zeros((), jnp.int32),
    )


compute_style_bethe.fast_variant = compute_style_bethe_fast
compute_style_bethe.slot_fast = compute_style_bethe_slot_fast
compute_style_bethe.excl_delta = excl_delta_bethe


def supports_density(params, n_atoms: int) -> bool:
    """Static eligibility of the fused ``table_ucg_bethe_density`` (P3)
    3-pass kernel path: same geometry scope as the other styles, plus the
    conservative pair-CV mode only (pair_cv="reference" transcribes the
    reference's self-cancelling literal form — XLA path)."""
    from lammps_ucg_dev_tpu.models.pair_bethe_density import (
        BetheDensityParams)

    if not isinstance(params, BetheDensityParams):
        return False
    if params.pair_cv != "conservative":
        return False
    tp = params.tp
    ntypes = tp.cutsq.shape[0] - 1
    if not fittable(params.bank) or ntypes < 1:
        return False
    ns = np.asarray(tp.n_states)[1:]
    if not np.all((ns == 1) | (ns == 2)) or not np.any(ns == 2):
        return False
    cuts = np.asarray(tp.cutsq)[1:, 1:]
    if not np.allclose(cuts, cuts[0, 0]):
        return False
    return params.bank.n_tables <= 8 and ntypes <= 3


def compute_density(state: SimState, cl: colpack.ColumnList, params,
                    cheb: ChebBank, interpret: "bool | None" = None,
                    observe: bool = True, want_scores: bool = True,
                    slot: bool = False, xchg=None) -> ForceOut:
    """Fused ``table_ucg_bethe_density`` (P3) evaluation: THREE window-kernel
    passes over the same column structure, mirroring the reference's
    three loops (pair_table_ucg_bethe_density.cpp:219-255, 528-658,
    698-733):

      1. ρ pass (_kernel_cv mode="rho"): per-atom proximity density +
         real neighbor count.  Priors/one-body terms are elementwise XLA
         between the passes (models/pair_bethe_density._priors).
      2. Bethe pass (_kernel style="dbethe"): density-prior Bethe mixing,
         prior-probability force tallies, pseudolikelihood scores.
      3. CV pass (_kernel_cv mode="cv"): the ∂ρ/∂x back-force from
         cvf = Σ_s pf_s ∂p_s/∂ρ.

    ``want_scores=False`` (interior steps, no ucgstate feedback) skips the
    score tallies; the returned ucgp is then None so the driver does not
    overwrite the carried posterior with softmax(0)."""
    from lammps_ucg_dev_tpu.models import common as mcommon
    from lammps_ucg_dev_tpu.models import pair_bethe_density as pbd

    tp = params.tp
    dtype = jnp.float32
    n = state.x.shape[0]
    typ = state.typ
    kT = params.kT.astype(dtype)
    classes = _type_classes(tp, params.bank.n_tables)
    multi = len(classes) > 1
    ntypes = tp.cutsq.shape[0] - 1

    is_ucg = tp.n_states[typ] > 1
    use_den = (tp.use_density[typ] == 1) & is_ucg
    use_ent = tp.use_entropy[typ] == 1
    rad_np = np.maximum(np.asarray(tp.threshold_radius, np.float64), 1e-12)
    rads = tuple((t, float(rad_np[t])) for t in range(1, ntypes + 1))
    if len({r for (_, r) in rads}) == 1:
        rads = (rads[0],)                     # uniform radius: one constant

    L = state.box.lengths.astype(dtype)
    zeros_n = jnp.zeros((n,), dtype)
    base_scal = [L[0], L[1], tp.cutsq[1, 1].astype(dtype),
                 params.bank.innersq[0].astype(dtype)]
    zf = jnp.zeros((), dtype)
    scal_cv = jnp.stack(base_scal + [zf, zf, zf, zf])[None, :]
    typ_col = state.typ if (multi or len(rads) > 1) else None

    # ---- pass 1: density --------------------------------------------------
    ipack1, pages1 = _pack_dispatch(slot, cl, state.box, state.x, zeros_n,
                                    zeros_n, dtype, typ=typ_col)
    out1 = _run_kernel_cv(cl, scal_cv, ipack1, pages1, False, "rho",
                          (rads, "mder"), interpret)[0]
    at1 = (out1 if slot else
           jnp.take(out1, cl.atom_slot, axis=0, mode="clip"))
    rho = at1[:, 0]
    n_real = at1[:, 1]
    if xchg is not None:
        # phase-boundary halo exchange (the reference's forward_comm,
        # pair_table_rleucg_interface.cpp:277-278): ghost rows need OWNER
        # densities — a ghost rho computed locally sees only the rc-wide
        # halo where it needs 2rc of context.  n_real stays local (it only
        # feeds i-row one-body terms; ghost i-tallies are discarded).
        rho = xchg(rho)

    prior, partial0 = pbd._priors(params, typ, rho)
    pi1_all = prior[:, 1].astype(dtype)
    logp_all = jnp.log(jnp.maximum(prior, 1e-12))
    mu_i = tp.mu[tp.formal[typ]]
    one_body = -mu_i - jnp.where(
        (use_ent & use_den)[:, None],
        kT * logp_all * (1.0 - n_real)[:, None], 0.0)

    # ---- pass 2: Bethe mixing + prior forces + scores ---------------------
    ipack2, pages2 = _pack_dispatch(slot, cl, state.box, state.x, pi1_all,
                                    state.ucgstate, dtype, aux=pi1_all,
                                    typ=(state.typ if multi else None))
    uscale, uoff = _u_map(cheb, dtype)
    scal2 = jnp.stack(base_scal + [uscale, uoff, kT, zf])[None, :]
    ucg_types = tuple(
        int(t) for t in range(1, ntypes + 1)
        if int(np.asarray(tp.n_states)[t]) > 1)
    dstat = None if len(ucg_types) == ntypes else ucg_types
    outs2 = _run_kernel(cl, scal2, ipack2, pages2, cheb, observe,
                        style="dbethe", mf=params.method == "mf",
                        interpret=interpret, classes=classes,
                        want_scores=want_scores, dstat=dstat)
    at2 = (outs2[0] if slot else
           jnp.take(outs2[0], cl.atom_slot, axis=0, mode="clip"))
    f = at2[:, 0:3]
    pforce = jnp.stack([at2[:, 3], at2[:, 6]], axis=-1)
    pforce = jnp.where(use_den[:, None], pforce + one_body, 0.0)
    if want_scores:
        scores = at2[:, 4:6] / kT
        scores = scores - jnp.where(use_den[:, None], mu_i / kT, 0.0)
        scores = jnp.where(is_ucg[:, None], scores, 0.0)
        ucgp = mcommon.softmax_posterior(scores, is_ucg)
    else:
        scores = jnp.zeros((n, 2), dtype)
        ucgp = None

    # ---- pass 3: CV back-force -------------------------------------------
    partial = jnp.stack([partial0, -partial0], axis=-1)
    cvf_all = jnp.sum(pforce * partial, axis=-1).astype(dtype)
    cvf_all = jnp.where(use_den, cvf_all, 0.0)
    if xchg is not None:
        cvf_all = xchg(cvf_all)      # ghost CV weights from their owners
    ipack3, pages3 = _pack_dispatch(slot, cl, state.box, state.x, cvf_all,
                                    zeros_n, dtype, aux=cvf_all,
                                    typ=typ_col)
    outs3 = _run_kernel_cv(
        cl, scal_cv, ipack3, pages3, observe, "cv",
        (rads, "mder" if params.backforce_derivative else "w"), interpret)
    at3 = (outs3[0] if slot else
           jnp.take(outs3[0], cl.atom_slot, axis=0, mode="clip"))
    f = f + at3[:, 0:3]

    if observe:
        tot2 = jnp.sum(outs2[1][::8], axis=0)
        tot3 = jnp.sum(outs3[1][::8], axis=0)
        pe = 0.5 * tot2[0]
        virial = 0.5 * (tot2[1:7] + tot3[1:7])
        oob_low = tot2[7].astype(jnp.int32)
    else:
        pe = jnp.zeros((), dtype)
        virial = jnp.zeros((6,), dtype)
        oob_low = jnp.zeros((), jnp.int32)
    return ForceOut(
        f=f, ucgforce=jnp.zeros_like(rho), scores=scores, pe=pe,
        virial=virial, ucgp=ucgp, oob_low=oob_low,
        oob_high=jnp.zeros((), jnp.int32),
    )


def compute_style_density(state: SimState, cl: colpack.ColumnList,
                          params, xchg=None) -> ForceOut:
    """Simulation-compatible pair_compute for the fused P3 kernel.
    ``xchg``: phase-boundary halo exchange hook (spatial drivers)."""
    return compute_density(state, cl, params, params.cheb, interpret=None,
                           xchg=xchg)


def compute_style_density_fast(state: SimState, cl: colpack.ColumnList,
                               params, xchg=None) -> ForceOut:
    return compute_density(state, cl, params, params.cheb, observe=False,
                           interpret=None, xchg=xchg)


def compute_style_density_fast_noscores(state: SimState,
                                        cl: colpack.ColumnList,
                                        params, xchg=None) -> ForceOut:
    return compute_density(state, cl, params, params.cheb, observe=False,
                           interpret=None, want_scores=False, xchg=xchg)


def compute_style_density_slot_fast(state: SimState,
                                    cl: colpack.ColumnList,
                                    params) -> ForceOut:
    """Slot-resident interior-step variant of the P3 kernel."""
    return compute_density(state, cl, params, params.cheb, observe=False,
                           interpret=None, slot=True)


def compute_style_density_slot_fast_noscores(state: SimState,
                                             cl: colpack.ColumnList,
                                             params) -> ForceOut:
    return compute_density(state, cl, params, params.cheb, observe=False,
                           interpret=None, want_scores=False, slot=True)


compute_style_density.fast_variant = compute_style_density_fast
compute_style_density.fast_variant_noscores = (
    compute_style_density_fast_noscores)
compute_style_density.slot_fast = compute_style_density_slot_fast
compute_style_density.slot_fast_noscores = (
    compute_style_density_slot_fast_noscores)
compute_style_density.supports_halo_xchg = True
compute_style_density_fast.supports_halo_xchg = True
compute_style_density_fast_noscores.supports_halo_xchg = True


def _rleucg_classes(params) -> tuple:
    """Static (ti, tj, (i00, i01, i10, i11)) over ordered SUBSTATE-type
    pairs — P4's type space is the substate types, so ``tabSS`` plays the
    role of tab4 (pair_table_rleucg_interface.cpp:321-441)."""
    tabSS = np.asarray(params.tabSS)
    S = params.cutsq.shape[0] - 1
    return tuple(
        (ti, tj, tuple(int(v) for v in tabSS[ti, tj].reshape(-1)))
        for ti in range(1, S + 1) for tj in range(1, S + 1))


def supports_rleucg(params, n_atoms: int) -> bool:
    """Static eligibility of the fused ``table_rleucg_interface`` (P4)
    3-pass kernel path: 2 substates max (the D-form 2x2 machinery), up to
    3 substate types, uniform tables with one shared cutoff."""
    from lammps_ucg_dev_tpu.models.pair_rleucg import RLEUCGParams

    if not isinstance(params, RLEUCGParams):
        return False
    if params.max_states != 2 or params.feedback not in ("always", "never"):
        return False
    S = params.cutsq.shape[0] - 1
    if not fittable(params.bank) or S < 1 or S > 3:
        return False
    cuts = np.asarray(params.cutsq)[1:, 1:]
    if not np.allclose(cuts, cuts[0, 0]):
        return False
    return params.bank.n_tables <= 8


def compute_rleucg(state: SimState, cl: colpack.ColumnList, params,
                   cheb: ChebBank, interpret: "bool | None" = None,
                   observe: bool = True, slot: bool = False,
                   xchg=None) -> ForceOut:
    """Fused ``table_rleucg_interface`` (P4) evaluation: THREE window-kernel
    passes mirroring the reference's loops
    (pair_table_rleucg_interface.cpp:231-276, 321-441, 444-502):

      1. ρ pass (_kernel_cv "rho") → substate probabilities (host
         elementwise, models/pair_rleucg.substate_probs).
      2. mean-field pass (_kernel style="rleucg"): Σ_αβ p_α p_β u_αβ mixing
         in the D-form basis + the two-body probability feedback tally
         pf_0 = eB + pj1·eD (feedback="always").
      3. CV pass (_kernel_cv "cv") with g = ∓dw/dr per
         ``conservative_sign``."""
    from lammps_ucg_dev_tpu.models import pair_rleucg as pr4

    dtype = jnp.float32
    n = state.x.shape[0]
    typ = state.typ
    kT = params.kT.astype(dtype)
    classes = _rleucg_classes(params)
    S = params.cutsq.shape[0] - 1
    Smax = params.max_states

    act_np = np.asarray(params.actual_from_state)
    rad_act = np.maximum(np.asarray(params.threshold_radius, np.float64),
                         1e-12)
    rads = tuple((t, float(rad_act[act_np[t]])) for t in range(1, S + 1))
    if len({r for (_, r) in rads}) == 1:
        rads = (rads[0],)

    L = state.box.lengths.astype(dtype)
    zeros_n = jnp.zeros((n,), dtype)
    zf = jnp.zeros((), dtype)
    base_scal = [L[0], L[1], params.cutsq[1, 1].astype(dtype),
                 params.bank.innersq[0].astype(dtype)]
    scal_cv = jnp.stack(base_scal + [zf, zf, zf, zf])[None, :]
    typ_col = state.typ if (len(classes) > 1 or len(rads) > 1) else None

    # ---- pass 1: density → substate probabilities -------------------------
    ipack1, pages1 = _pack_dispatch(slot, cl, state.box, state.x, zeros_n,
                                    zeros_n, dtype, typ=typ_col)
    out1 = _run_kernel_cv(cl, scal_cv, ipack1, pages1, False, "rho",
                          (rads, "mder"), interpret)[0]
    rho = (out1[:, 0] if slot else
           jnp.take(out1[:, 0], cl.atom_slot, mode="clip"))
    if xchg is not None:
        # phase-boundary forward comm of the density CV (see
        # compute_density): ghost substate probabilities must come from
        # owner densities, not truncated halo neighborhoods
        rho = xchg(rho)
    probs_all, partial = pr4.substate_probs(params, typ, rho)

    act = params.actual_from_state[typ]
    ns = params.n_states[act]
    s_idx = jnp.arange(Smax, dtype=jnp.int32)[None, :]
    multi = (ns > 1)[:, None]
    explicit_all = (s_idx < (ns - 1)[:, None]) & multi
    ent = (params.use_entropy[act] == 1)[:, None] & multi
    logp = jnp.log(jnp.maximum(probs_all, 1e-12))
    p_last = jnp.take_along_axis(probs_all,
                                 jnp.maximum(ns - 1, 0)[:, None], axis=1)
    log_plast = jnp.log(jnp.maximum(p_last, 1e-12))
    mu_s = params.mu[jnp.minimum(typ[:, None] + s_idx,
                                 params.mu.shape[0] - 1)]
    pforce_one = jnp.where(
        explicit_all,
        -mu_s + jnp.where(ent, -kT * logp + kT * log_plast, 0.0), 0.0)

    # ---- pass 2: mean-field mixing + probability feedback -----------------
    a_all = probs_all[:, 1].astype(dtype)     # P(substate 1); 0 for plain
    ipack2, pages2 = _pack_dispatch(slot, cl, state.box, state.x, a_all,
                                    zeros_n, dtype, aux=a_all,
                                    typ=(state.typ if len(classes) > 1
                                         else None))
    uscale, uoff = _u_map(cheb, dtype)
    scal2 = jnp.stack(base_scal + [uscale, uoff, kT, zf])[None, :]
    outs2 = _run_kernel(cl, scal2, ipack2, pages2, cheb, observe,
                        style="rleucg", mf=True, interpret=interpret,
                        classes=classes, want_scores=False,
                        dstat=(params.feedback == "always"))
    at2 = (outs2[0] if slot else
           jnp.take(outs2[0], cl.atom_slot, axis=0, mode="clip"))
    f = at2[:, 0:3]
    pf_fb = jnp.where(explicit_all[:, 0], at2[:, 3], 0.0)
    pforce = pforce_one.at[:, 0].add(pf_fb)

    # ---- pass 3: CV back-force -------------------------------------------
    cvf_all = jnp.sum(pforce * partial, axis=-1).astype(dtype)
    if xchg is not None:
        cvf_all = xchg(cvf_all)      # ghost CV weights from their owners
    ipack3, pages3 = _pack_dispatch(slot, cl, state.box, state.x, cvf_all,
                                    zeros_n, dtype, aux=cvf_all,
                                    typ=typ_col)
    outs3 = _run_kernel_cv(
        cl, scal_cv, ipack3, pages3, observe, "cv",
        (rads, "mder" if params.conservative_sign else "pder"), interpret)
    at3 = (outs3[0] if slot else
           jnp.take(outs3[0], cl.atom_slot, axis=0, mode="clip"))
    f = f + at3[:, 0:3]

    if observe:
        tot2 = jnp.sum(outs2[1][::8], axis=0)
        tot3 = jnp.sum(outs3[1][::8], axis=0)
        pe = 0.5 * tot2[0]
        virial = 0.5 * (tot2[1:7] + tot3[1:7])
        oob_low = tot2[7].astype(jnp.int32)
    else:
        pe = jnp.zeros((), dtype)
        virial = jnp.zeros((6,), dtype)
        oob_low = jnp.zeros((), jnp.int32)
    return ForceOut(
        f=f, ucgforce=jnp.zeros_like(rho),
        scores=jnp.zeros((n, 2), dtype), pe=pe, virial=virial,
        oob_low=oob_low, oob_high=jnp.zeros((), jnp.int32),
    )


def compute_style_rleucg(state: SimState, cl: colpack.ColumnList,
                         params, xchg=None) -> ForceOut:
    """Simulation-compatible pair_compute for the fused P4 kernel.
    ``xchg``: phase-boundary halo exchange hook (spatial drivers)."""
    return compute_rleucg(state, cl, params, params.cheb, interpret=None,
                          xchg=xchg)


def compute_style_rleucg_fast(state: SimState, cl: colpack.ColumnList,
                              params, xchg=None) -> ForceOut:
    return compute_rleucg(state, cl, params, params.cheb, observe=False,
                          interpret=None, xchg=xchg)


def compute_style_rleucg_slot_fast(state: SimState,
                                   cl: colpack.ColumnList,
                                   params) -> ForceOut:
    """Slot-resident interior-step variant of the P4 kernel."""
    return compute_rleucg(state, cl, params, params.cheb, observe=False,
                          interpret=None, slot=True)


compute_style_rleucg.fast_variant = compute_style_rleucg_fast
compute_style_rleucg.slot_fast = compute_style_rleucg_slot_fast
compute_style_rleucg.supports_halo_xchg = True
compute_style_rleucg_fast.supports_halo_xchg = True


def make_compute(params: UCGLDParams, cheb: ChebBank, interpret: bool = False):
    """Bind (params, cheb) into a Simulation-compatible pair_compute whose
    ``nbr`` argument is a ColumnList."""

    def fn(state, cl, _params):
        return compute(state, cl, params, cheb, interpret=interpret)

    return fn
