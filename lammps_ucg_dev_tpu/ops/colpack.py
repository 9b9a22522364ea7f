"""Column-packed pair candidates — the production data structure for the
fused Pallas pair kernel (GROMACS-nbnxn-inspired, re-shaped for TPU vregs).

Why this geometry (v2; replaces the cubic-cell cluster list of
attic/clusters.py): the round-1 cluster kernel was numerically exact but lost
end-to-end because (a) cubic cells of side cutoff+skin at fluid densities are
~30% occupied, so most staged lanes were padding, and (b) staging a j-cluster
cost 16 scalar-indexed row loads + 7 sub-lane stores.  Column packing removes
both:

* Atoms are binned into **x-y columns** of side >= cutoff+skin and sorted by
  z within each column.  Consecutive slots are spatially adjacent, and real
  slots are ~dense (padding only at column tops), so staged lanes are almost
  all real atoms.
* For an i-group (G clusters of 8 atoms, contiguous in z), ALL candidate
  partners in a stencil column form a **contiguous z-window** of slots.  The
  kernel fetches each window with ONE async DMA of an (8 attrs, 128 slots)
  tile — zero scalar staging, zero transposes, attributes arrive vreg-shaped.
* z-periodicity is handled by **ghost slots**: copies of each column's top
  (bottom) atoms appended below (above) with z shifted by -+Lz, so windows
  never wrap.  x/y periodicity stays min-image in the kernel (columns wrap
  through the stencil indices).

The 3x3 column stencil is provably sufficient: column side >= cutoff+skin
means any pair within the list cutoff has |dx|,|dy| <= side, i.e. the partner
is in an adjacent column; the z-window bounds [z_lo - rc, z_hi + rc] cover z
by construction (rc = cutoff + skin, the standard Verlet-skin argument, both
for window validity between rebuilds and for ghost coverage).

TPU constraint shaping the layout: Mosaic DMA slices must be 128-aligned in
the lane dimension, so windows cannot start at arbitrary z offsets of a
(ncol, 8, czp) array.  Instead the per-step pack replicates each column's
slots into **overlapped z-pages**: page k covers slots [k*S, k*S + 128), so
any window whose span fits 128 - S slots lies entirely inside the page
k = z0 // S — the DMA source ``pages[page, col]`` is one perfectly aligned
(8, 128) tile reached through untiled leading dims.

Reference correspondence: this plays the role of LAMMPS's binned half/full
neighbor list + ghost atom communication (SURVEY.md §2.3) for the fused
kernel path; the XLA path keeps ops/neighbor.py.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import Box, pytree_dataclass

CL = 8          # atoms per cluster (vreg sublane count, f32)
W = 128         # window width in slots (vreg lane count)
NSTEN = 9       # 3x3 x-y column stencil
_PAD_POISON = 1.0e17   # pad-slot coordinate: far enough that dx² overflows
                       # any cutoff, small enough that dx² stays finite in f32


@pytree_dataclass(meta_fields=("mx", "my", "cz", "gz", "gzt", "czp", "G",
                               "S", "NV"))
class ColumnList:
    """Per-reneighbor candidate structure (fixed shapes, jit-safe).

    Extended slot space: column c owns rows [c*czp, (c+1)*czp) =
    [gz ghost-bottom | count real | <= gzt ghost-top copies | pads].  Real
    slot space (kernel i-side and outputs) is the (ncol*cz,) column-major
    region at fixed offsets [gz, gz+cz).  The bottom zone holds copies of
    the column's LAST (top-z) atoms shifted -Lz at FIXED rows [0, gz)
    (dynamic sources — ``bsrc``); the top copies are the column's FIRST
    atoms shifted +Lz at dynamic rows right after the reals (fixed sources;
    flat target indices ``tidx``) so z stays ascending per column with no
    dead interior, capped at the static capacity gzt.  The slot-major
    interior loop refreshes ghosts per step from these index sets — a small
    take_along_axis + static write (bottom) and a static slice + fixed-index
    scatter (top) — instead of the full N-row pack gather.
    """

    slot_atom_ext: jax.Array   # (ncol*czp,) int32 atom id; N = padding
    zshift: jax.Array          # (ncol*czp,) int8 in {-1, 0, +1} (units of Lz)
    atom_slot: jax.Array       # (N,) int32 -> real slot index
    i_valid: jax.Array         # (ncol*cz,) bool — real slot holds a real atom
                               # (not a ghost-top copy placed in the region)
    bsrc: jax.Array            # (ncol, gz) int32 — bottom-zone source row in
                               # the column's REAL region [0, cz)
    bok: jax.Array             # (ncol, gz) bool — bottom-zone row is live
    tidx: jax.Array            # (ncol, gzt) int32 — FLAT extended-slot index
                               # of top-copy row t (sorted; ncol*czp = dead)
    tok: jax.Array             # (ncol, gzt) bool — top-copy row t is live
    meta: jax.Array            # (n_prog, 32) int32: [9 stencil cols,
                               #  9 page ids, 9 encoded xy-image shifts, pad]
    pk_meta: "jax.Array | None"  # (ncol, MW) int32 span codes for the
                               # column-resident packed kernel (NV > 0):
                               # per cluster b and stencil s, col b*9+s is
                               # z0 | L << 12 | d << 20 (z0 = span start
                               # slot in the stencil column, L = span
                               # length, d = packed destination lane)
    x0: jax.Array              # (N, 3) build-time positions
    overflow: jax.Array        # () bool — any capacity/window/ghost overflow
    max_occupancy: jax.Array   # () int32 — max window span seen (<= W ok)
    mean_span: jax.Array       # () f32 — mean real window span over live
                               # (group, stencil) windows; mean_span/W is the
                               # geometric fill fraction of fetched lanes
    mx: int
    my: int
    cz: int                    # real slots per column (multiple of 8*G)
    gz: int                    # bottom ghost-zone slots per column
    gzt: int                   # top ghost-zone slots per column
    czp: int                   # total slots per column (>= W; W + mult of S)
    G: int                     # i-clusters per kernel program
    S: int                     # z-page stride (pages overlap by W - S)
    NV: int = 0                # packed candidate vregs per cluster (span
                               # roll-concat kernel); 0 = window kernel only

    @property
    def ncol(self) -> int:
        return self.mx * self.my

    @property
    def n_slots(self) -> int:
        return self.ncol * self.cz

    @property
    def gs(self) -> int:
        return CL * self.G

    @property
    def n_prog(self) -> int:
        return self.meta.shape[0]

    @property
    def npage(self) -> int:
        return (self.czp - W) // self.S + 1


@dataclasses.dataclass(frozen=True)
class ColumnSpec:
    cutoff: float
    skin: float
    mx: int
    my: int
    cz: int
    gz: int
    gzt: int
    czp: int
    G: int
    S: int
    NV: int                    # packed candidate vregs per cluster (0 =
                               # span metadata disabled; window kernel only)
    stencil_cols: np.ndarray   # (ncol, 9) int32, static, x-row-major
                               # (-1 = non-existent neighbor, periodic_x=False)
    periodic_x: bool = True    # False for slab virtual boxes (halos provide
                               # the x images; edge columns have no wraparound)
    periodic_y: bool = True    # False for 2-D pencil virtual boxes (x AND y
                               # images both come from halos)

    @property
    def rc(self) -> float:
        return self.cutoff + self.skin

    @property
    def gs(self) -> int:
        return CL * self.G

    @property
    def ncol(self) -> int:
        return self.mx * self.my

    @property
    def gpc(self) -> int:
        return self.cz // self.gs

    @property
    def npage(self) -> int:
        return (self.czp - W) // self.S + 1

    def build(self, x, box):
        return build(x, box, self)


def _grid_dims(box_lengths, rc):
    L = np.asarray(box_lengths, np.float64)
    mx, my = (max(int(L[d] / rc), 1) for d in (0, 1))
    if mx < 3 or my < 3:
        raise ValueError(f"column grid needs >= 3 columns per side "
                         f"(got {mx}x{my}); box too small for the kernel path")
    if L[2] < 2.0 * rc:
        raise ValueError("Lz must be >= 2*(cutoff+skin) for ghost-based "
                         "z-periodicity")
    return L, mx, my


_POISON_CODE = 27   # stencil-shift code for a non-existent neighbor column
                    # (non-periodic x): decodes to sx = +8, pushing the whole
                    # window 8*Lx away so every candidate fails the cutoff


def _stencil(mx, my, periodic_x=True, periodic_y=True):
    """(ncol, 9) stencil in x-row-major order: rows = dx in (-1,0,1), each
    row the 3 consecutive dy columns.  With ``periodic_x=False`` (slab
    virtual boxes: halos provide the x images) and/or ``periodic_y=False``
    (2-D pencil virtual boxes), out-of-range neighbors are -1 — callers
    mask them (build remaps to column 0 with a poisoned shift code;
    measure/oracle paths skip them)."""
    ncol = mx * my
    cx, cy = np.divmod(np.arange(ncol, dtype=np.int64), my)
    cols = []
    for dx in (-1, 0, 1):
        nx = cx + dx
        c = ((nx % mx) * my).astype(np.int64)
        bad_x = None if periodic_x else ((nx < 0) | (nx >= mx))
        for dy in (-1, 0, 1):
            ny = cy + dy
            col = c + ny % my
            bad = bad_x
            if not periodic_y:
                bad_y = (ny < 0) | (ny >= my)
                bad = bad_y if bad is None else (bad | bad_y)
            if bad is not None:
                col = np.where(bad, -1, col)
            cols.append(col.astype(np.int32))
    return np.stack(cols, axis=1).astype(np.int32)


def _stencil_shifts(mx, my, periodic_x=True, periodic_y=True):
    """(ncol, 9) int32: encoded x/y periodic image shift of each stencil
    column relative to its center column — ``(sx+1)*3 + (sy+1)`` with
    sx, sy ∈ {-1, 0, +1} (units of Lx/Ly).  Because the column grid has
    >= 3 columns per side and side >= cutoff+skin, the column relationship
    uniquely determines the only image that can be within the cutoff, so the
    kernel applies the shift ONCE per window instead of per-candidate
    min-image rounds.  Non-periodic x: out-of-range neighbors get
    ``_POISON_CODE`` (the kernel shifts that window far out of range)."""
    ncol = mx * my
    cx, cy = np.divmod(np.arange(ncol, dtype=np.int64), my)
    enc = []
    for dx in (-1, 0, 1):
        nx = cx + dx
        sx = nx // mx               # -1, 0, or +1 (floor division)
        bad_x = None if periodic_x else ((nx < 0) | (nx >= mx))
        for dy in (-1, 0, 1):
            ny = cy + dy
            sy = ny // my
            # j position must shift by +s to sit next to i: x_j + s*L
            code = (sx + 1) * 3 + (sy + 1)
            bad = bad_x
            if not periodic_y:
                bad_y = (ny < 0) | (ny >= my)
                bad = bad_y if bad is None else (bad | bad_y)
            if bad is not None:
                code = np.where(bad, _POISON_CODE, code)
            enc.append(code.astype(np.int32))
    return np.stack(enc, axis=1).astype(np.int32)


def _round_czp(cz, gz, gzt, S):
    """czp >= gz + cz + gzt with (czp - W) a non-negative multiple of S."""
    base = max(gz + cz + gzt, W)
    return W + int(-(-(base - W) // S) * S)


_NV_MAX = 8


def _span_mode() -> bool:
    """Packed (span roll-concat) kernel toggle — on by default; set
    ``UCG_KERNEL_SPAN=0`` to force the plain window kernel."""
    import os

    return os.environ.get("UCG_KERNEL_SPAN", "1") != "0"


def _nv_of(max_cluster_sum: float, margin: float = 56.0) -> int:
    """Packed vregs per cluster from the worst per-cluster span sum: the
    span concat packs all 9 stencil spans of one 8-slot i-cluster into
    NV·128 lanes.  Span codes are re-derived exactly at every rebuild, but
    the SPEC's NV is sized from the setup configuration — the margin
    covers density-fluctuation drift of the worst cluster across the run
    (measured ~±40 at 16k-262k); the runtime overflow flag is the
    backstop."""
    nv = int(-(-(max_cluster_sum + margin) // W))
    return 0 if nv > _NV_MAX else max(nv, 1)


def make_spec(n_atoms: int, box_lengths, cutoff: float, skin: float = 0.4,
              G: int | None = None, S: int | None = None,
              cz: int | None = None, gz: int | None = None,
              periodic_x: bool = True, periodic_y: bool = True) -> ColumnSpec:
    """Analytic spec from mean density (no positions needed).  Prefer
    :func:`measure_spec` at setup time — it sizes from the actual
    configuration and is robust to structured/inhomogeneous systems."""
    L, mx, my = _grid_dims(box_lengths, cutoff + skin)
    rc = cutoff + skin
    ncol = mx * my
    lam_z = n_atoms / (ncol * L[2])        # atoms per unit z per column
    mean_col = n_atoms / ncol

    # the x-row window unions 3 columns; model local under/over-density of
    # own group vs neighbor row with a +-3 sigma ratio factor
    ratio = (1.0 + 3.0 / math.sqrt(max(mean_col, 9.0))) ** 2
    cap = mean_col + 6.0 * math.sqrt(max(mean_col, 1.0)) + 8

    def cz_of(g):
        gs_ = CL * g
        return int(-(-cap // gs_) * gs_)

    def est_span(g):
        mean_w = CL * g * ratio + 2.0 * rc * lam_z
        return mean_w + 5.0 * math.sqrt(max(mean_w, 1.0))

    if G is None or S is None:
        cands = (_GS_CANDIDATES_SMALL if ncol < _GS_SMALL_NCOL
                 else _GS_CANDIDATES)
        for g, s in cands:
            if G is not None and g != G:
                continue
            if S is not None and s != S:
                continue
            if est_span(g) <= W - s - 2:
                G, S = g, s
                break
        else:
            raise ValueError("estimated window span does not fit any page "
                             "stride; density too high for this geometry")
    gs = CL * G
    if cz is None:
        cz = cz_of(G)
    if cz % gs:
        raise ValueError(f"cz must be a multiple of {gs}")
    if gz is None:
        gmean = rc * lam_z
        gz = int(-(-(gmean + 6.0 * math.sqrt(max(gmean, 1.0)) + 4) // CL) * CL)
    gzt = gz
    # packed-kernel span budget: per-cluster (8-slot) mean span sum over the
    # 9 stencil windows, with a fluctuation margin (analytic Poisson model)
    csum = NSTEN * (CL * ratio + 2.0 * rc * lam_z)
    NV = (_nv_of(csum + 6.0 * math.sqrt(max(csum, 1.0)))
          if _span_mode() else 0)
    return ColumnSpec(cutoff=cutoff, skin=skin, mx=mx, my=my, cz=int(cz),
                      gz=int(gz), gzt=int(gzt),
                      czp=_round_czp(cz, gz, gzt, S), G=int(G),
                      S=int(S), NV=NV,
                      stencil_cols=_stencil(mx, my, periodic_x, periodic_y),
                      periodic_x=periodic_x, periodic_y=periodic_y)


# (G, S) preference order — SIZE-CONDITIONED, measured on v5e (rho=0.6,
# 2026-08-19, bench.py --phases + UCG_KERNEL_GS probes):
# * large grids (262k: ncol=676): the S=16 page stride costs ~30% kernel
#   time versus S=32 at the same G (pair_slot 105-106 vs 80.5 ns/atom for
#   (2,16) vs (2,32); same candidate count, same arithmetic), and G=1
#   loses the window-load amortization ((1,32): 118) -> prefer any S>=32
#   geometry over any S=16 one, larger G first within a stride class.
# * small grids (4k: ncol=36): the ranking inverts — (4,16) runs ~21%
#   faster than (2,32) (880 vs 692 steps/s, bench --quick) -> keep the
#   round-2 large-G-first order.
# The crossover is untested between those sizes; ncol >= 128 is the proxy
# threshold.  UCG_KERNEL_GS overrides either ordering.
# Budget per row-window: W - S slots.
_GS_CANDIDATES = [(8, 32), (4, 64), (4, 32), (2, 64), (2, 32),
                  (8, 16), (4, 16), (2, 16), (1, 64), (1, 32), (1, 16)]
_GS_CANDIDATES_SMALL = [(8, 32), (8, 16), (4, 64), (4, 32), (4, 16),
                        (2, 64), (2, 32), (2, 16), (1, 64), (1, 32),
                        (1, 16)]
_GS_SMALL_NCOL = 128


def measure_spec(x, box_lengths, cutoff: float, skin: float = 0.4,
                 span_margin: int = 10, G_max: int = 8,
                 periodic_x: bool = True,
                 periodic_y: bool = True,
                 G: int | None = None, S: int | None = None) -> ColumnSpec:
    """Data-driven spec: measure the actual x-row window spans / column
    counts / ghost needs from the setup positions (host numpy) and size
    (G, S), cz, gz with margins.  Robust to structured (lattice) or
    inhomogeneous configurations where the analytic Poisson model of
    :func:`make_spec` underestimates — the runtime overflow flag remains the
    backstop as atoms move.

    ``x`` is one (N, 3) configuration, or a LIST of configurations measured
    jointly (one shared spec sized for the worst) — the slab path uses this
    to build ONE static spec covering every slab's local+halo population.
    Positions must already be normalized to [0, L) per axis (callers
    pre-wrap; for slabs, to the virtual-box frame)."""
    configs = x if isinstance(x, (list, tuple)) else [x]
    rc = cutoff + skin
    L, mx, my = _grid_dims(box_lengths, rc)
    ncol = mx * my
    Lz = L[2]
    sten = _stencil(mx, my, periodic_x, periodic_y)

    per_cfg = []
    for xc in configs:
        xn = np.asarray(xc, np.float64)
        ccx = np.clip((xn[:, 0] / L[0] * mx).astype(np.int64), 0, mx - 1)
        ccy = np.clip((xn[:, 1] / L[1] * my).astype(np.int64), 0, my - 1)
        col = ccx * my + ccy
        z = np.mod(xn[:, 2], Lz)
        order = np.lexsort((z, col))
        zc, colc = z[order], col[order]
        starts = np.searchsorted(colc, np.arange(ncol))
        ends = np.searchsorted(colc, np.arange(ncol), side="right")
        counts = ends - starts
        zcols = [zc[starts[c]:ends[c]] for c in range(ncol)]
        zexts = [np.concatenate([zs - Lz, zs, zs + Lz]) for zs in zcols]
        per_cfg.append((xn.shape[0], counts, zcols, zexts))

    mean_col = max(max(n for (n, _, _, _) in per_cfg) / ncol, 1.0)
    cap = (max(int(counts.max()) for (_, counts, _, _) in per_cfg)
           + 4.0 * math.sqrt(mean_col) + 8)

    def cz_of(g):
        gs_ = CL * g
        return int(-(-cap // gs_) * gs_)

    def max_col_span(g):
        gs = CL * g
        mx_span = 0
        for (_, _, zcols, zexts) in per_cfg:
            for c in range(ncol):
                zs = zcols[c]
                if len(zs) == 0:
                    continue
                ng = -(-len(zs) // gs)
                glo = zs[np.arange(ng) * gs] - rc
                ghi = zs[np.minimum(np.arange(1, ng + 1) * gs,
                                    len(zs)) - 1] + rc
                for nc in sten[c]:
                    if nc < 0:
                        continue        # non-existent neighbor (slab edge)
                    z0 = np.searchsorted(zexts[nc], glo, side="left")
                    z1 = np.searchsorted(zexts[nc], ghi, side="right")
                    if ng:
                        mx_span = max(mx_span, int((z1 - z0).max()))
        return mx_span

    spans = {}
    if G is not None and S is not None:
        # explicit (G, S) override (the bench autotune probes alternatives):
        # still validate the measured span fits the page budget
        spans[G] = max_col_span(G)
        if spans[G] + span_margin > W - S:
            raise ValueError(
                f"measured row span {spans[G]} + margin exceeds the "
                f"(G={G}, S={S}) page budget {W - S}")
    else:
        G = S = None
        cands = (_GS_CANDIDATES_SMALL if ncol < _GS_SMALL_NCOL
                 else _GS_CANDIDATES)
        for g, s in cands:
            if g > G_max:
                continue
            if g not in spans:
                spans[g] = max_col_span(g)
            if spans[g] + span_margin <= W - s:
                G, S = g, s
                break
        if G is None:
            raise ValueError(f"measured row spans {spans} + margin exceed "
                             f"every page stride; geometry unsupported")
    cz = cz_of(G)
    need_b = max(int(max(np.sum(zs > Lz - rc) for zs in zcols))
                 for (_, _, zcols, _) in per_cfg)
    need_t = max(int(max(np.sum(zs < rc) for zs in zcols))
                 for (_, _, zcols, _) in per_cfg)
    gz = int(-(-(need_b + 4.0 * math.sqrt(max(need_b, 1.0)) + 4) // CL) * CL)
    gzt = int(-(-(need_t + 4.0 * math.sqrt(max(need_t, 1.0)) + 4) // CL) * CL)
    # packed-kernel budget: measured worst per-CLUSTER (8-slot) span sum
    NV = 0
    if _span_mode():
        max_sum = 0
        for (_, _, zcols_c, zexts_c) in per_cfg:
            for c in range(ncol):
                zs = zcols_c[c]
                if len(zs) == 0:
                    continue
                ngc = -(-len(zs) // CL)
                glo = zs[np.arange(ngc) * CL] - rc
                ghi = zs[np.minimum(np.arange(1, ngc + 1) * CL,
                                    len(zs)) - 1] + rc
                tot = np.zeros(ngc, np.int64)
                for nc in sten[c]:
                    if nc < 0:
                        continue
                    z0 = np.searchsorted(zexts_c[nc], glo, side="left")
                    z1 = np.searchsorted(zexts_c[nc], ghi, side="right")
                    tot += z1 - z0
                if ngc:
                    max_sum = max(max_sum, int(tot.max()))
        NV = _nv_of(max_sum)
    return ColumnSpec(cutoff=cutoff, skin=skin, mx=mx, my=my, cz=cz,
                      gz=gz, gzt=gzt, czp=_round_czp(cz, gz, gzt, S), G=G,
                      S=S, NV=NV, stencil_cols=sten, periodic_x=periodic_x,
                      periodic_y=periodic_y)


def build(x: jax.Array, box: Box, spec: ColumnSpec,
          valid: "jax.Array | None" = None) -> ColumnList:
    """``valid`` (N,) bool: rows to include (slab drivers pass fixed-capacity
    row blocks where rows beyond the live count are inert padding — those
    are dropped from every column, so they are never pair candidates; their
    ``atom_slot`` entries point out of range and gather clipped garbage the
    caller discards)."""
    if box.is_triclinic:
        raise ValueError("the column kernel path requires an orthogonal box")
    n = x.shape[0]
    mx, my, cz, gz, czp, gs = (spec.mx, spec.my, spec.cz, spec.gz, spec.czp,
                               spec.gs)
    ncol = mx * my
    rc = spec.rc
    Lz = box.lengths[2]
    dtype = x.dtype

    # ---- bin into columns, z-sort within ----------------------------------
    fx = (x[:, 0] - box.lo[0]) / box.lengths[0]
    fy = (x[:, 1] - box.lo[1]) / box.lengths[1]
    ccx = jnp.clip((fx * mx).astype(jnp.int32), 0, mx - 1)
    ccy = jnp.clip((fy * my).astype(jnp.int32), 0, my - 1)
    col = ccx * my + ccy
    if valid is not None:
        col = jnp.where(valid, col, ncol)      # invalid rows sort past the end
    z = x[:, 2] - box.lo[2]
    order = jnp.lexsort((z, col)).astype(jnp.int32)
    sorted_col = col[order]
    # rank within each column run via a cummax of run-start positions:
    # searchsorted(sorted, sorted) computes the same thing through N binary
    # searches of N (18 dependent gather rounds — measured 149 ns/atom at
    # 262k on v5e, the single hottest op of the whole build); the prefix
    # scan is 12x cheaper and exact on the already-sorted keys
    iota_n = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.concatenate([jnp.ones((1,), bool),
                                 sorted_col[1:] != sorted_col[:-1]])
    first = jax.lax.cummax(jnp.where(run_start, iota_n, 0))
    rank = iota_n - first
    in_range = sorted_col < ncol
    col_overflow = jnp.max(jnp.where(in_range, rank, 0)) >= cz
    rank_c = jnp.clip(rank, 0, cz - 1)
    rslot_sorted = jnp.where(in_range, sorted_col * cz + rank_c, ncol * cz)

    unique = valid is None
    slot_atom = jnp.full((ncol * cz,), n, dtype=jnp.int32).at[rslot_sorted].set(
        order, indices_are_sorted=True, unique_indices=unique, mode="drop")
    atom_slot = jnp.zeros((n,), jnp.int32).at[order].set(
        rslot_sorted, unique_indices=True)
    count = jnp.bincount(col, length=ncol).astype(jnp.int32)   # (ncol,)

    # real-region z values; pads take z = Lz so every column row is ascending
    z_real = jnp.full((ncol * cz,), Lz, dtype=dtype).at[rslot_sorted].set(
        z[order], indices_are_sorted=True, unique_indices=unique, mode="drop"
    ).reshape(ncol, cz)

    # ---- extended column layout --------------------------------------------
    # [gz ghost-bottom | count real | <= gzt ghost-top copies | pads].
    # Ghost-top copies start IMMEDIATELY after the real atoms (dynamic
    # offset), not at a fixed position: a fixed region would leave real-slot
    # pads (z = Lz) between real atoms and ghost-tops, and any z-window
    # crossing the top face would have to span all of them.  Pads take
    # z = 3*Lz (beyond every query), so each column's zext stays ascending
    # with zero dead interior.  Real atoms keep fixed positions
    # [gz, gz+rank) so slot gids are static.  Top copies are capped at the
    # static capacity gzt so the slot-major refresh (``tidx``) has a fixed
    # shape; windows only ever reach copies of atoms with z < rc, which the
    # ghost-capacity check bounds by gzt.
    gzt = spec.gzt
    q = jnp.arange(czp, dtype=jnp.int32)[None, :]              # (1, czp)
    cnt = count[:, None]                                       # (ncol, 1)
    # The extended arrays are built by SCATTERING each sorted atom to its
    # up-to-three extended rows (real slot, bottom-ghost copy, top-ghost
    # copy) rather than gathering per extended row: the equivalent
    # (ncol, czp) two-axis take_along_axis costs ~100 ns/atom at 262k on
    # v5e (XLA lowers it per-element), while three n-index flat scatters
    # are ~5x cheaper.  Invalid copies go to the out-of-range dump index
    # and are dropped.
    cnt_s = jnp.take(count, jnp.minimum(sorted_col, ncol - 1))  # per atom
    ebase = sorted_col * czp
    dump = ncol * czp
    t_real = jnp.where(in_range, ebase + gz + rank_c, dump)
    qb_at = rank - cnt_s + gz                       # bottom row of this atom
    t_bot = jnp.where(in_range & (qb_at >= 0) & (qb_at < gz),
                      ebase + qb_at, dump)
    qt_at = gz + cnt_s + rank                       # top-copy row
    t_top = jnp.where(in_range & (rank < gzt) & (qt_at < czp),
                      ebase + qt_at, dump)
    z_sorted = z[order]
    sa_flat = jnp.full((ncol * czp,), n, dtype=jnp.int32)
    sa_flat = sa_flat.at[t_real].set(order, mode="drop",
                                     indices_are_sorted=True)
    sa_flat = sa_flat.at[t_bot].set(order, mode="drop")
    sa_flat = sa_flat.at[t_top].set(order, mode="drop")
    # pad rows: bottom-zone pads sit below every query (-Lz ascending into
    # the bottom ghosts), all other pads above (3*Lz)
    zext_flat = jnp.broadcast_to(
        jnp.where(q < gz, jnp.asarray(-Lz, dtype), jnp.asarray(3 * Lz,
                                                               dtype)),
        (ncol, czp)).reshape(-1)
    zext_flat = zext_flat.at[t_real].set(z_sorted, mode="drop",
                                         indices_are_sorted=True)
    zext_flat = zext_flat.at[t_bot].set(z_sorted - Lz, mode="drop")
    zext_flat = zext_flat.at[t_top].set(z_sorted + Lz, mode="drop")
    shift_flat = jnp.zeros((ncol * czp,), jnp.int8)
    shift_flat = shift_flat.at[t_bot].set(-1, mode="drop")
    shift_flat = shift_flat.at[t_top].set(1, mode="drop")
    zext = zext_flat.reshape(ncol, czp)

    slot_atom_ext = sa_flat
    zshift = shift_flat
    # i-side validity: real region slots [gz+count, gz+cz) hold ghost-top
    # copies, which must not act as i-atoms (their tallies are dropped by the
    # atom_slot gather, but pe/virial partials would double count)
    ri = jnp.arange(cz, dtype=jnp.int32)[None, :]
    i_valid = (ri < cnt).reshape(-1)                           # (ncol*cz,)

    # slot-major ghost-refresh index sets (fixed shapes; values fixed per
    # block).  Bottom zone: fixed rows [0, gz), dynamic sources (the
    # column's last gz atoms).  Top copies: fixed sources (the column's
    # first gzt real rows), dynamic flat target rows gz+cnt+t.
    qb = jnp.arange(gz, dtype=jnp.int32)[None, :]              # (1, gz)
    bs = cnt - gz + qb
    bok = bs >= 0
    bsrc = jnp.clip(bs, 0, cz - 1)                             # (ncol, gz)
    tt = jnp.arange(gzt, dtype=jnp.int32)[None, :]             # (1, gzt)
    trow = gz + cnt + tt
    tok = (tt < cnt) & (trow < czp)
    cbase = jnp.arange(ncol, dtype=jnp.int32)[:, None] * czp
    tidx = jnp.where(tok, cbase + trow, ncol * czp)            # (ncol, gzt)

    # ghost capacity: every atom within rc of a z face must have a copy
    need_top = count - jnp.sum(z_real < (Lz - rc), axis=1).astype(jnp.int32)
    need_bot = jnp.sum(z_real < rc, axis=1).astype(jnp.int32)
    ghost_overflow = (jnp.max(need_top) > gz) | (
        jnp.max(count + need_bot) > (czp - gz)) | (jnp.max(need_bot) > gzt)

    # ---- per-program z-windows over the 9 stencil columns ------------------
    gpc = spec.gpc
    gi = jnp.arange(gpc, dtype=jnp.int32)
    has = count[:, None] > gi[None, :] * gs                    # group non-empty
    lo_idx = jnp.minimum(gi[None, :] * gs,
                         jnp.maximum(count[:, None] - 1, 0))   # (ncol, gpc)
    hi_idx = jnp.clip(count[:, None] - 1, gi[None, :] * gs,
                      (gi[None, :] + 1) * gs - 1)
    zlo_v = jnp.take_along_axis(z_real, lo_idx, axis=1)        # (ncol, gpc)
    zhi_v = jnp.take_along_axis(z_real, hi_idx, axis=1)
    # empty groups get a degenerate window at the column top (all-masked)
    zlo = jnp.where(has, zlo_v, Lz) - rc
    zhi = jnp.where(has, zhi_v, Lz) + rc

    # non-existent stencil neighbors (periodic_x=False edges) are remapped to
    # column 0 with a poisoned shift code — their windows get a degenerate
    # [0, 0) span below so they cost nothing and never overflow
    sten_cols = np.maximum(spec.stencil_cols, 0)
    sten_ok = spec.stencil_cols >= 0                             # (ncol, 9)
    zext_sten = zext[jnp.asarray(sten_cols, jnp.int32)]          # (ncol,9,czp)

    # window bounds by COMPARE-AND-COUNT instead of searchsorted: on an
    # ascending row, searchsorted-left(v) == #{z < v} and -right(v) ==
    # #{z <= v}.  The vmapped binary search costs ~143 ns/atom at 262k on
    # v5e (dependent gather rounds); the masked reduction is pure VPU work
    # (~128M lane-comparisons here, < 1 ms) and fuses without materializing
    # the (ncol, gpc, 9, czp) intermediate thanks to the per-stencil loop.
    z0c, z1c = [], []
    for s in range(NSTEN):
        row = zext_sten[:, s, None, :]                          # (ncol,1,czp)
        z0c.append(jnp.sum(row < zlo[:, :, None], axis=-1,
                           dtype=jnp.int32))
        z1c.append(jnp.sum(row <= zhi[:, :, None], axis=-1,
                           dtype=jnp.int32))
    z0 = jnp.stack(z0c, axis=2)                                 # (ncol, gpc, 9)
    z1 = jnp.stack(z1c, axis=2)
    if not np.all(sten_ok):
        okb = jnp.asarray(sten_ok)[:, None, :]
        z0 = jnp.where(okb, z0, 0)
        z1 = jnp.where(okb, z1, 0)
    # per (program, stencil column) page: aligned down to the stride S so the
    # DMA source is a whole (8, W) tile of the pages array
    S = spec.S
    page = jnp.minimum(z0 // S, (czp - W) // S).astype(jnp.int32)
    span = (z1 - page * S).astype(jnp.int32)
    max_span = jnp.max(span)
    win_overflow = max_span > W
    live = has[:, :, None] & jnp.asarray(sten_ok)[:, None, :]
    real_span = jnp.maximum(z1 - z0, 0).astype(jnp.float32)
    mean_span = (jnp.sum(jnp.where(live, real_span, 0.0))
                 / jnp.maximum(jnp.sum(live), 1))

    n_prog = ncol * gpc
    sten_rep = np.repeat(sten_cols, gpc, axis=0)                # (n_prog, 9)
    shift_rep = np.repeat(
        _stencil_shifts(mx, my, spec.periodic_x, spec.periodic_y), gpc,
                          axis=0)
    meta = jnp.concatenate([
        jnp.asarray(sten_rep, jnp.int32),
        page.reshape(n_prog, NSTEN),
        jnp.asarray(shift_rep, jnp.int32),
        jnp.zeros((n_prog, 32 - 3 * NSTEN), jnp.int32),
    ], axis=1)

    # ---- packed-kernel span codes (spec.NV > 0) ---------------------------
    # Per 8-slot CLUSTER b and stencil window s: the true candidate span
    # [z0c, z1c) of the stencil column's extended slots, encoded as
    # z0 | L << 12 | d << 20 (z0 = span start slot in the column, L = span
    # length, d = exclusive prefix sum of L over s = the packed destination
    # lane).  The column-resident span kernel (pallas_pair._kernel_colspan)
    # rolls each span into place and runs the pair physics on ~NV dense
    # vregs instead of 9 quantized 128-lane windows (the VERDICT r4 #1
    # fill problem).  pk_meta rows are per COLUMN: (ncol, cpc*9) codes.
    pk_meta = None
    NV = spec.NV
    if NV > 0:
        cpc = cz // CL
        ci = jnp.arange(cpc, dtype=jnp.int32)
        has_c = count[:, None] > ci[None, :] * CL
        lo_i = jnp.minimum(ci[None, :] * CL,
                           jnp.maximum(count[:, None] - 1, 0))
        hi_i = jnp.clip(count[:, None] - 1, ci[None, :] * CL,
                        (ci[None, :] + 1) * CL - 1)
        zlo_vc = jnp.take_along_axis(z_real, lo_i, axis=1)
        zhi_vc = jnp.take_along_axis(z_real, hi_i, axis=1)
        far = jnp.asarray(4 * Lz, dtype)          # past every zext row
        zlo_c = jnp.where(has_c, zlo_vc - rc, far)
        zhi_c = jnp.where(has_c, zhi_vc + rc, far)
        z0c_l, z1c_l = [], []
        for s in range(NSTEN):
            row = zext_sten[:, s, None, :]
            z0c_l.append(jnp.sum(row < zlo_c[:, :, None], axis=-1,
                                 dtype=jnp.int32))
            z1c_l.append(jnp.sum(row <= zhi_c[:, :, None], axis=-1,
                                 dtype=jnp.int32))
        z0c = jnp.stack(z0c_l, axis=2)             # (ncol, cpc, 9)
        z1c = jnp.stack(z1c_l, axis=2)
        if not np.all(sten_ok):
            okc = jnp.asarray(sten_ok)[:, None, :]
            z0c = jnp.where(okc, z0c, 0)
            z1c = jnp.where(okc, z1c, 0)
        Lsp = jnp.maximum(z1c - z0c, 0)
        d_c = jnp.cumsum(Lsp, axis=-1) - Lsp
        kp = jnp.sum(Lsp, axis=-1)
        pk_overflow = jnp.max(kp) > NV * W
        owl = jnp.where(Lsp > 0, z0c + Lsp * 4096 + d_c * 1048576, 0)
        owl = owl.reshape(ncol, cpc * NSTEN)
        mw = -(-(cpc * NSTEN) // 8) * 8
        pk_meta = jnp.concatenate([
            owl.astype(jnp.int32),
            jnp.zeros((ncol, mw - cpc * NSTEN), jnp.int32),
        ], axis=1)
    else:
        pk_overflow = jnp.zeros((), bool)

    return ColumnList(
        slot_atom_ext=slot_atom_ext,
        zshift=zshift,
        atom_slot=atom_slot,
        i_valid=i_valid,
        bsrc=bsrc, bok=bok, tidx=tidx, tok=tok,
        meta=meta,
        pk_meta=pk_meta,
        x0=x,
        overflow=(col_overflow | ghost_overflow | win_overflow
                  | pk_overflow),
        max_occupancy=max_span,
        mean_span=mean_span,
        mx=mx, my=my, cz=cz, gz=gz, gzt=gzt, czp=czp, G=spec.G, S=S,
        NV=NV,
    )


def restrict_i(cl: ColumnList, i_mask: jax.Array) -> ColumnList:
    """Restrict the i-side (tally-owning) slots to atoms with ``i_mask``
    True.  The slab driver uses this to stop ghost (halo) atoms from
    tallying pe/virial — they stay j-candidates, exactly like the XLA slab
    path's ``i_valid`` exclusion (atoms' force rows are still written but
    the caller discards non-owned rows)."""
    ids = cl.slot_atom_ext.reshape(cl.ncol, cl.czp)[
        :, cl.gz:cl.gz + cl.cz].reshape(-1)                     # (n_slots,)
    m = jnp.concatenate([i_mask, jnp.zeros((1,), bool)])[ids]   # id n -> False
    return dataclasses.replace(cl, i_valid=cl.i_valid & m)


def pack(cl: ColumnList, box: Box, x: jax.Array, lam: jax.Array,
         ucgstate: jax.Array, dtype=jnp.float32, aux: "jax.Array | None" = None,
         typ: "jax.Array | None" = None):
    """Per-step attribute packing (positions/λ/state change every step; the
    slot mapping and pages persist for the reneighbor block).

    Returns (ipack, pages):
      ipack (ncol*cz, 8)  real slots, rows = [x y z λ state valid aux typ]
            (``aux`` carries a second per-atom scalar when the i-role and
            j-role read different fields — e.g. the Bethe kernel's i-prior)
      pages (npage, ncol, 8, W) overlapped z-pages of the extended slots,
            attribute-major: page k of column c covers slots [k*S, k*S+W),
            so each kernel window is pages[page, col] — one aligned tile
    """
    n = x.shape[0]
    attrs = jnp.concatenate([
        x.astype(dtype),
        lam.astype(dtype)[:, None],
        ucgstate.astype(dtype)[:, None],
        jnp.ones((n, 1), dtype),
        (jnp.zeros((n, 1), dtype) if aux is None
         else aux.astype(dtype)[:, None]),
        (jnp.zeros((n, 1), dtype) if typ is None
         else typ.astype(dtype)[:, None]),
    ], axis=1)
    # pad row: positions poisoned far outside the box so pad slots fail the
    # rsq < cutsq test geometrically (valid flag stays 0 as a belt-and-
    # braces mask for the full kernel; the fast kernel relies on the poison)
    pad_row = jnp.concatenate([
        jnp.full((1, 3), _PAD_POISON, dtype), jnp.zeros((1, 5), dtype)],
        axis=1)
    attrs = jnp.concatenate([attrs, pad_row], axis=0)
    ext = jnp.take(attrs, cl.slot_atom_ext, axis=0)            # (ncol*czp, 8)
    Lz = box.lengths[2].astype(dtype)
    ext = ext.at[:, 2].add(cl.zshift.astype(dtype) * Lz)
    ext3 = ext.reshape(cl.ncol, cl.czp, 8)
    ipack = ext3[:, cl.gz:cl.gz + cl.cz, :].reshape(cl.n_slots, 8)
    # ghost-top copies living inside the real region must not act as i-atoms
    ipack = ipack.at[:, 5].multiply(cl.i_valid.astype(dtype))

    jp = ext3.transpose(0, 2, 1)                               # (ncol, 8, czp)
    if cl.NV > 0:
        # column-resident span kernel: the plain attr-major column array
        # IS the kernel input — no overlapped z-page replication at all
        return ipack, jp
    pages = jnp.stack([jp[:, :, k * cl.S:k * cl.S + W]
                       for k in range(cl.npage)], axis=0)      # (npage,ncol,8,W)
    return ipack, pages


def pack_slots(cl: ColumnList, box: Box, attrs_real: jax.Array) -> jax.Array:
    """Slot-major per-step page assembly (the fast-path replacement for
    :func:`pack`'s N-row gather).  ``attrs_real`` is the (n_slots, 8)
    i-side attribute block ALREADY in real-slot order (rows =
    [x y z λ state valid aux typ]; pad/ghost-copy rows poisoned) — the
    caller keeps per-atom state resident in slot order across a reneighbor
    block, so no atom→slot gather exists.  Ghost rows are refreshed from
    the block-fixed index sets: bottom zone = small take_along_axis +
    static write; top copies = static source slice + fixed-index scatter.
    Returns the (npage, ncol, 8, W) pages array for the kernel's window
    DMAs."""
    ncol, cz, gz, gzt, czp = cl.ncol, cl.cz, cl.gz, cl.gzt, cl.czp
    dtype = attrs_real.dtype
    Lz = box.lengths[2].astype(dtype)
    real3 = attrs_real.reshape(ncol, cz, 8)
    pad_row = jnp.concatenate([
        jnp.full((3,), _PAD_POISON, dtype), jnp.zeros((5,), dtype)])
    bot = jnp.take_along_axis(real3, cl.bsrc[:, :, None], axis=1)
    bot = bot.at[:, :, 2].add(-Lz)
    bot = jnp.where(cl.bok[:, :, None], bot, pad_row)
    top = real3[:, :gzt, :]                       # fixed-source static slice
    top = top.at[:, :, 2].add(Lz)
    tail = jnp.broadcast_to(pad_row, (ncol, czp - gz - cz, 8))
    ext = jnp.concatenate([bot, real3, tail], axis=1).reshape(-1, 8)
    ext = ext.at[cl.tidx.reshape(-1)].set(top.reshape(-1, 8), mode="drop")
    jp = ext.reshape(ncol, czp, 8).transpose(0, 2, 1)
    if cl.NV > 0:
        return jp            # column-resident span kernel input (no pages)
    return jnp.stack([jp[:, :, k * cl.S:k * cl.S + W]
                      for k in range(cl.npage)], axis=0)


def slot_atom_real(cl: ColumnList, n_atoms: int) -> jax.Array:
    """(n_slots,) atom id per REAL-region slot for slot-major residency:
    real atoms map to themselves; pads AND ghost-top copies map to the
    ``n_atoms`` sentinel (copy rows must not carry live state in slot
    space — they are refreshed through :func:`pack_slots`, and a stale
    integrated copy could drift into a spurious pair)."""
    ids = cl.slot_atom_ext.reshape(cl.ncol, cl.czp)[
        :, cl.gz:cl.gz + cl.cz].reshape(-1)
    return jnp.where(cl.i_valid, ids, n_atoms)


def as_neighbor_list(cl: ColumnList, n_atoms: int):
    """Expand candidate windows into a padded per-atom neighbor list (test
    oracle: coverage vs brute force, and reuse of the XLA pair styles).
    Duplicate j entries (an atom appearing both as itself and as a z-ghost in
    one program's windows) are removed since the XLA styles recompute
    min-image distances themselves."""
    from lammps_ucg_dev_tpu.ops import neighbor as nbrmod

    n_prog = cl.n_prog
    cols = cl.meta[:, :NSTEN]                                  # (n_prog, 9)
    starts = cl.meta[:, NSTEN:2 * NSTEN] * cl.S
    lanes = jnp.arange(W, dtype=jnp.int32)
    eslot = (cols[:, :, None] * cl.czp
             + starts[:, :, None] + lanes[None, None, :])      # (n_prog,9,W)
    jat = cl.slot_atom_ext[eslot.reshape(n_prog, NSTEN * W)]
    # poisoned windows (non-periodic-x edges) are not candidates
    codes = cl.meta[:, 2 * NSTEN:3 * NSTEN]                    # (n_prog, 9)
    poison = jnp.repeat(codes == _POISON_CODE, W, axis=1)      # (n_prog, 9W)
    jat = jnp.where(poison, n_atoms, jat)
    # dedupe within each program row (sort, drop equal-consecutive)
    s = jnp.sort(jat, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n_prog, 1), bool), s[:, 1:] == s[:, :-1]], axis=1)
    jat = jnp.where(dup, n_atoms, s)

    prog_of_slot = jnp.arange(cl.n_slots, dtype=jnp.int32) // cl.gs
    idx = jat[prog_of_slot][cl.atom_slot]                      # (N, 9W)
    self_idx = jnp.arange(n_atoms, dtype=jnp.int32)[:, None]
    idx = jnp.where(idx == self_idx, n_atoms, idx)
    return nbrmod.NeighborList(
        idx=idx, x0=cl.x0, overflow=cl.overflow,
        max_occupancy=cl.max_occupancy, capacity=NSTEN * W)
