"""Fused Pallas pair kernel for ``table_ucgld`` (flagship fast path).

Why a kernel: the XLA pair loop is gather-bound — ~4.2 ns per gather index on
v5e regardless of fetch width (measured; 2 gathers/pair ⇒ ~40 ns/pair floor).
This kernel eliminates EVERY per-pair gather:

* neighbor attributes arrive via aligned DYNAMIC SLICES of a
  cluster-transposed pack (``apackCT``): j-cluster ``jc``'s block is rows
  ``[8*jc, 8*jc+8)`` — contiguous, attrs on sublanes, atoms on lanes;
* tabulated potentials are evaluated as Chebyshev series (ops/chebtab.py)
  with coefficients baked as immediate constants — pure VPU FMA;
* per-atom-owned tallies (newton-off) mean no scatter: each program writes
  only its own 128 atoms' forces/λ-forces/scores.

Vector layout: one program owns BI=16 i-clusters (128 atoms).  For each
i-cluster (8 atoms → sublanes) the KC candidate j-clusters stream through a
(8 attr, 128 lane) staging buffer, 16 j-clusters (128 j-atoms → lanes) per
inner chunk; every arithmetic op covers an (8, 128) vreg of 1024 pairs.

Scope (v1): 2-state UCG with a single actual type (the flagship/bench
config), uniform LINEAR tables with NT = 4 combo tables, whole atom pack
resident in VMEM (N ≲ 3·10⁵ per chip; the windowed-DMA variant for larger N
is the planned follow-up).  Callers must check :func:`supports`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lammps_ucg_dev_tpu.core.state import ForceOut, SimState
from lammps_ucg_dev_tpu.models.pair_ucgld import UCGLDParams
from lammps_ucg_dev_tpu.ops import clusters as clmod
from lammps_ucg_dev_tpu.ops.chebtab import ChebBank

CL = clmod.CL          # 8 atoms per cluster
BI = 16                # i-clusters per program (128 atoms)
JCHUNK = 16            # j-clusters per inner chunk (128 lanes)


def supports(params: UCGLDParams, n_atoms: int) -> bool:
    """Static eligibility of the v1 kernel for this system."""
    tp = params.tp
    ntypes = tp.cutsq.shape[0] - 1
    return (
        bool(params.bank.uniform)
        and params.bank.n_tables == 4
        and ntypes == 1
        and int(np.asarray(tp.n_states)[1]) == 2
        and n_atoms % (BI * CL) == 0
    )


def _kernel(cheb_coeffs: np.ndarray, degree: int, kc: int, n_icl: int,
            scal_ref, api_ref, jcl_ref, apackct_ref, out_ref, out2_ref,
            jbuf):
    """One program: BI i-clusters × their KC j-cluster candidates.

    scal_ref (SMEM, (1, 8)): [Lx, Ly, Lz, cutsq, innersq, λ-unused...]
    api_ref   (BI*CL, 8): own atoms, natural layout [x y z λ state gid . .]
    jcl_ref   (BI, KC) int32
    apackct_ref (n_icl*8, 8): cluster-transposed pack (attr-major blocks)
    out_ref   (BI*CL, 8): [fx fy fz lamf s0 s1 . .]
    out2_ref  (1, 8): [pe vxx vyy vzz vxy vxz vyz oob_lo]
    jbuf      (8, 128) VMEM scratch: staging for 16 j-clusters
    """
    Lx = scal_ref[0, 0]
    Ly = scal_ref[0, 1]
    Lz = scal_ref[0, 2]
    cutsq = scal_ref[0, 3]
    innersq = scal_ref[0, 4]
    dom_lo = scal_ref[0, 5]
    dom_hi = scal_ref[0, 6]

    ce = [[float(cheb_coeffs[row, k]) for k in range(degree)]
          for row in range(cheb_coeffs.shape[0])]

    def clenshaw(row, u):
        b1 = jnp.zeros_like(u)
        b2 = jnp.zeros_like(u)
        for k in range(degree - 1, 0, -1):
            b1, b2 = 2.0 * u * b1 - b2 + ce[row][k], b1
        return u * b1 - b2 + ce[row][0]

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    pe_t = jnp.zeros((), jnp.float32)
    vir_t = [jnp.zeros((), jnp.float32) for _ in range(6)]
    oob_t = jnp.zeros((), jnp.float32)

    for b in range(BI):
        sl = slice(b * CL, (b + 1) * CL)
        xi0 = api_ref[sl, 0:1]
        xi1 = api_ref[sl, 1:2]
        xi2 = api_ref[sl, 2:3]
        li = api_ref[sl, 3:4]
        gi = api_ref[sl, 5:6]

        fx = jnp.zeros((CL, 128), jnp.float32)
        fy = jnp.zeros((CL, 128), jnp.float32)
        fz = jnp.zeros((CL, 128), jnp.float32)
        lamf = jnp.zeros((CL, 128), jnp.float32)
        s0 = jnp.zeros((CL, 128), jnp.float32)
        s1 = jnp.zeros((CL, 128), jnp.float32)
        pe = jnp.zeros((CL, 128), jnp.float32)
        vir = [jnp.zeros((CL, 128), jnp.float32) for _ in range(6)]
        oob = jnp.zeros((CL, 128), jnp.float32)

        for kk in range(kc // JCHUNK):
            # ---- stage 16 j-clusters into jbuf (8 attr, 128) --------------
            for t in range(JCHUNK):
                jid = jcl_ref[b, kk * JCHUNK + t]
                valid = jid < n_icl
                jc = jnp.where(valid, jid, 0)
                blk = apackct_ref[pl.ds(jc * 8, 8), :]     # (8 attr, 8 atoms)
                jbuf[:, t * 8:(t + 1) * 8] = blk
                gid = jnp.where(valid, jid * 8 + lane8, -1).astype(jnp.float32)
                jbuf[5:6, t * 8:(t + 1) * 8] = gid

            xj0 = jbuf[0:1, :]
            xj1 = jbuf[1:2, :]
            xj2 = jbuf[2:3, :]
            lj = jbuf[3:4, :]
            sj = jbuf[4:5, :]
            gj = jbuf[5:6, :]

            dx = xi0 - xj0
            dx = dx - Lx * jnp.round(dx / Lx)
            dy = xi1 - xj1
            dy = dy - Ly * jnp.round(dy / Ly)
            dz = xi2 - xj2
            dz = dz - Lz * jnp.round(dz / Lz)
            rsq = dx * dx + dy * dy + dz * dz

            mask = (rsq < cutsq) & (gj >= 0.0) & (gi != gj)
            rsqm = jnp.where(mask, rsq, dom_hi)
            oob = oob + jnp.where(mask & (rsq < innersq), 1.0, 0.0)

            u = 2.0 * (rsqm - dom_lo) / (dom_hi - dom_lo) - 1.0
            u = jnp.clip(u, -1.0, 1.0)
            e00 = clenshaw(0, u)
            e01 = clenshaw(1, u)
            e10 = clenshaw(2, u)
            e11 = clenshaw(3, u)
            f00 = clenshaw(4, u)
            f01 = clenshaw(5, u)
            f10 = clenshaw(6, u)
            f11 = clenshaw(7, u)

            mi = 1.0 - li
            mj = 1.0 - lj
            w00 = mi * mj
            w01 = mi * lj
            w10 = li * mj
            w11 = li * lj
            zero = jnp.zeros_like(u)
            msel = mask
            emix = jnp.where(msel, w00 * e00 + w01 * e01 + w10 * e10 + w11 * e11, zero)
            fmix = jnp.where(msel, w00 * f00 + w01 * f01 + w10 * f10 + w11 * f11, zero)

            fx = fx + fmix * dx
            fy = fy + fmix * dy
            fz = fz + fmix * dz
            pe = pe + emix
            vir[0] = vir[0] + fmix * dx * dx
            vir[1] = vir[1] + fmix * dy * dy
            vir[2] = vir[2] + fmix * dz * dz
            vir[3] = vir[3] + fmix * dx * dy
            vir[4] = vir[4] + fmix * dx * dz
            vir[5] = vir[5] + fmix * dy * dz

            # λ-force: -(lj (e11-e01) + (1-lj)(e10-e00))
            lamf = lamf - jnp.where(msel, lj * (e11 - e01) + mj * (e10 - e00), zero)
            # pseudolikelihood scores at partner's discrete state
            sj1 = sj > 0.5
            s0 = s0 - jnp.where(msel, jnp.where(sj1, e01, e00), zero)
            s1 = s1 - jnp.where(msel, jnp.where(sj1, e11, e10), zero)

        out_ref[sl, 0:1] = jnp.sum(fx, axis=1, keepdims=True)
        out_ref[sl, 1:2] = jnp.sum(fy, axis=1, keepdims=True)
        out_ref[sl, 2:3] = jnp.sum(fz, axis=1, keepdims=True)
        out_ref[sl, 3:4] = jnp.sum(lamf, axis=1, keepdims=True)
        out_ref[sl, 4:5] = jnp.sum(s0, axis=1, keepdims=True)
        out_ref[sl, 5:6] = jnp.sum(s1, axis=1, keepdims=True)
        out_ref[sl, 6:8] = jnp.zeros((CL, 2), jnp.float32)

        pe_t = pe_t + jnp.sum(pe)
        for v in range(6):
            vir_t[v] = vir_t[v] + jnp.sum(vir[v])
        oob_t = oob_t + jnp.sum(oob)

    row = jnp.concatenate([
        pe_t[None], vir_t[0][None], vir_t[1][None], vir_t[2][None],
        vir_t[3][None], vir_t[4][None], vir_t[5][None], oob_t[None],
    ])[None, :]
    out2_ref[:, :] = row


def compute(state: SimState, clist: clmod.ClusterList, params: UCGLDParams,
            cheb: ChebBank, interpret: bool = False) -> ForceOut:
    """ForceOut-compatible fused evaluation (see module docstring for scope)."""
    x = state.x
    n = x.shape[0]
    n_icl = n // CL
    tp = params.tp
    dtype = jnp.float32

    lam = state.ucgl.astype(dtype)
    apack = jnp.concatenate([
        x.astype(dtype),
        lam[:, None],
        state.ucgstate.astype(dtype)[:, None],
        jnp.arange(n, dtype=dtype)[:, None],      # global atom id
        jnp.zeros((n, 2), dtype),
    ], axis=1)                                     # (N, 8)
    apackct = apack.reshape(n_icl, CL, 8).transpose(0, 2, 1).reshape(n_icl * 8, CL)

    L = state.box.lengths.astype(dtype)
    scal = jnp.stack([
        L[0], L[1], L[2],
        tp.cutsq[1, 1].astype(dtype),
        params.bank.innersq[0].astype(dtype),
        cheb.lo.astype(dtype), cheb.hi.astype(dtype),
        jnp.zeros((), dtype),
    ])[None, :]

    kc = clist.kc
    assert kc % JCHUNK == 0, "cluster spec kc must be a multiple of 16"
    n_prog = n_icl // BI

    kern = functools.partial(
        _kernel, np.asarray(cheb.coeffs, np.float64), cheb.degree, kc, n_icl)

    out, out2 = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BI * CL, 8), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BI, kc), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # apackct, whole
        ],
        out_specs=[
            pl.BlockSpec((BI * CL, 8), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 8), dtype),
            jax.ShapeDtypeStruct((n_prog, 8), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)],
        interpret=interpret,
    )(scal, apack, clist.jcl, apackct)

    f = out[:, 0:3]
    is_ucg = tp.n_states[state.typ] > 1
    ucgforce = jnp.where(is_ucg, out[:, 3] - tp.mu_diff[state.typ], 0.0)
    kT = params.kT.astype(dtype)
    scores = out[:, 4:6] / kT
    scores = scores.at[:, 1].add(-tp.mu_diff[state.typ] / kT)
    scores = jnp.where(is_ucg[:, None], scores, 0.0)

    totals = jnp.sum(out2, axis=0)
    return ForceOut(
        f=f,
        ucgforce=ucgforce,
        scores=scores,
        pe=0.5 * totals[0],
        virial=0.5 * totals[1:7],
        oob_low=totals[7].astype(jnp.int32),
        oob_high=jnp.zeros((), jnp.int32),
    )


def make_compute(params: UCGLDParams, cheb: ChebBank, interpret: bool = False):
    """Bind (params, cheb) into a Simulation-compatible pair_compute whose
    ``nbr`` argument is a ClusterList."""

    def fn(state, clist, _params):
        return compute(state, clist, params, cheb, interpret=interpret)

    return fn
