"""Fused Pallas pair kernel for ``table_ucgld`` (flagship fast path).

Why a kernel: the XLA pair loop is gather-bound — ~4.2 ns per gather index on
v5e regardless of fetch width (measured; 2 gathers/pair ⇒ ~40 ns/pair floor).
This kernel eliminates EVERY per-pair gather:

* neighbor attributes arrive via aligned DYNAMIC SLICES of a lane-exact
  cluster pack (``apackL``, (n_icl, 128)): j-cluster ``jc``'s attributes are
  ONE row ``[x(8) y(8) z(8) λ(8) state(8) pad]`` — a (1, 128) sublane slice
  with zero tiling waste (an (N, 8) pack would pad 16× in VMEM);
* tabulated potentials are evaluated as Chebyshev series (ops/chebtab.py)
  with coefficients baked as immediate constants — pure VPU FMA;
* per-atom-owned tallies (newton-off) mean no scatter: each program writes
  only its own 128 atoms' forces/λ-forces/scores.

Vector layout: one program owns BI=16 i-clusters (128 atoms).  For each
i-cluster (8 atoms → sublanes) the KC candidate j-clusters stream through a
(8 attr, 128 lane) staging buffer, 16 j-clusters (128 j-atoms → lanes) per
inner chunk; every arithmetic op covers an (8, 128) vreg of 1024 pairs.

The kernel operates in SLOT space (cell-padded rows, see ops/clusters.py):
inputs/outputs have n_slots rows; the caller scatters atoms in and gathers
forces out by ``atom_slot`` (two O(N) gathers per step, amortized against the
gather-free pair loop).  Padded slots are masked by a validity attribute and
their output rows are discarded.

Scope (v1): 2-state UCG with a single actual type (the flagship/bench
config), uniform LINEAR tables with NT = 4 combo tables, whole slot pack
resident in VMEM (N_s ≲ 3·10⁵ per chip; the windowed-DMA variant for larger
N is the planned follow-up).  Callers must check :func:`supports`.

Status (measured on v5e at 128k atoms): numerically exact vs the XLA path
(f err ~1.7e-6 f32) at ~2.45 ns per CANDIDATE pair-slot.  The XLA fast path
does ~8 ns per LISTED pair, so the kernel wins iff candidate waste < ~3.3×;
v1 geometry (cells of size cutoff+skin, ~2 real clusters per 27-cell stencil
entry, static kc=128) carries ~17× waste, netting slower end-to-end.  The
flip requires GROMACS-nbnxn geometry — cluster-sized cells (~8 atoms/cell,
125-cell stencil, sphere prune to ~40 j-clusters → kc=48) — plus cheaper
staging (the 16 scalar-indexed loads + 7 sub-lane stores per j-cluster
dominate the 2.45 ns).  Until then the XLA fast path remains the production
default.
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
    )


def _kernel(cheb_coeffs: np.ndarray, degree: int, kc: int, n_icl: int, bi: int,
            scal_ref, api_ref, jcl_ref, apackl_ref, out_ref, out2_ref,
            jbuf):
    """One program: BI i-clusters × their KC j-cluster candidates.

    scal_ref (SMEM, (1, 8)): [Lx, Ly, Lz, cutsq, innersq, dom_lo, dom_hi, .]
    api_ref   (bi*CL, 8): own slots, natural layout [x y z λ state valid gid .]
    jcl_ref   (bi, KC) int32
    apackl_ref (n_icl, 128): lane-exact cluster pack
               row = [x(8) y(8) z(8) λ(8) state(8) valid(8) pad(80)]
    out_ref   (BI*CL, 8): [fx fy fz lamf s0 s1 . .]
    out2_ref  (8, 8): per-program partials [pe vxx vyy vzz vxy vxz vyz oob_lo]
              broadcast to all 8 rows (TPU block-shape legality)
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

    for b in range(bi):
        sl = slice(b * CL, (b + 1) * CL)
        xi0 = api_ref[sl, 0:1]
        xi1 = api_ref[sl, 1:2]
        xi2 = api_ref[sl, 2:3]
        li = api_ref[sl, 3:4]
        vi = api_ref[sl, 5:6]
        gi = api_ref[sl, 6:7]

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
            # ---- stage 16 j-clusters into jbuf (6 attr rows, 128) ---------
            for t in range(JCHUNK):
                jid = jcl_ref[b, kk * JCHUNK + t]
                valid = jid < n_icl
                jc = jnp.where(valid, jid, 0)
                row = apackl_ref[pl.ds(jc, 1), :]          # (1, 128)
                lanes = slice(t * 8, (t + 1) * 8)
                jbuf[0:1, lanes] = row[0:1, 0:8]           # x
                jbuf[1:2, lanes] = row[0:1, 8:16]          # y
                jbuf[2:3, lanes] = row[0:1, 16:24]         # z
                jbuf[3:4, lanes] = row[0:1, 24:32]         # λ
                jbuf[4:5, lanes] = row[0:1, 32:40]         # state
                gid = jnp.where(valid, jid * 8 + lane8, -1).astype(jnp.float32)
                jbuf[5:6, lanes] = gid
                jbuf[6:7, lanes] = row[0:1, 40:48]         # per-atom validity

            xj0 = jbuf[0:1, :]
            xj1 = jbuf[1:2, :]
            xj2 = jbuf[2:3, :]
            lj = jbuf[3:4, :]
            sj = jbuf[4:5, :]
            gj = jbuf[5:6, :]
            vj = jbuf[6:7, :]

            dx = xi0 - xj0
            dx = dx - Lx * jnp.round(dx / Lx)
            dy = xi1 - xj1
            dy = dy - Ly * jnp.round(dy / Ly)
            dz = xi2 - xj2
            dz = dz - Lz * jnp.round(dz / Lz)
            rsq = dx * dx + dy * dy + dz * dz

            mask = ((rsq < cutsq) & (gj >= 0.0) & (gi != gj)
                    & (vj > 0.5) & (vi > 0.5))
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
    out2_ref[:, :] = jnp.broadcast_to(row, (8, 8))


def compute(state: SimState, clist: clmod.ClusterList, params: UCGLDParams,
            cheb: ChebBank, interpret: bool = False) -> ForceOut:
    """ForceOut-compatible fused evaluation (see module docstring for scope)."""
    x = state.x
    n = x.shape[0]
    n_slots = clist.n_slots
    n_icl = clist.n_clusters
    tp = params.tp
    dtype = jnp.float32

    # scatter atoms into slot space
    sa = clist.slot_atom
    real = sa < n
    sac = jnp.clip(sa, 0, n - 1)
    lam = state.ucgl.astype(dtype)
    apack = jnp.concatenate([
        jnp.where(real[:, None], jnp.take(x.astype(dtype), sac, axis=0), 0.0),
        jnp.where(real, jnp.take(lam, sac), 0.0)[:, None],
        jnp.where(real, jnp.take(state.ucgstate.astype(dtype), sac), 0.0)[:, None],
        real.astype(dtype)[:, None],                 # validity (col 5)
        jnp.arange(n_slots, dtype=dtype)[:, None],   # slot gid (col 6)
        jnp.zeros((n_slots, 1), dtype),
    ], axis=1)                                        # (N_s, 8)
    # lane-exact cluster pack: row = [x y z λ state valid](8 each) + pad(80)
    apackl = apack[:, :6].reshape(n_icl, CL, 6).transpose(0, 2, 1)
    apackl = apackl.reshape(n_icl, 48)
    apackl = jnp.pad(apackl, ((0, 0), (0, 80)))

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
    bi = next(b for b in (16, 8, 4, 2, 1) if n_icl % b == 0)
    n_prog = n_icl // bi

    kern = functools.partial(
        _kernel, np.asarray(cheb.coeffs, np.float64), cheb.degree, kc, n_icl,
        bi)

    out, out2 = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bi * CL, 8), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, kc), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # apackl, whole
        ],
        out_specs=[
            pl.BlockSpec((bi * CL, 8), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, 8), dtype),
            jax.ShapeDtypeStruct((n_prog * 8, 8), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)],
        interpret=interpret,
    )(scal, apack, clist.jcl, apackl)

    # gather slot results back to atom order
    out_at = jnp.take(out, clist.atom_slot, axis=0)       # (N, 8)
    f = out_at[:, 0:3]
    is_ucg = tp.n_states[state.typ] > 1
    ucgforce = jnp.where(is_ucg, out_at[:, 3] - tp.mu_diff[state.typ], 0.0)
    kT = params.kT.astype(dtype)
    scores = out_at[:, 4:6] / kT
    scores = scores.at[:, 1].add(-tp.mu_diff[state.typ] / kT)
    scores = jnp.where(is_ucg[:, None], scores, 0.0)

    totals = jnp.sum(out2[::8], axis=0)
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
