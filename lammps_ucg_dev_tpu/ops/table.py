"""Tabulated-potential substrate: host-side table construction + on-device
stacked table bank with vectorized interpolation.

Semantics follow the reference's embedded pair_table machinery
(``PairTable_UCGLD::compute_table`` /root/reference/UCG/pair_table_ucgld.cpp:1105-1344,
``spline_table`` :1047-1065): tables are binned uniformly in r² between
``inner²`` and ``cut²``; the stored ``f`` is f(r)/r so that the vector force is
``fpair * (xi - xj)``.

TPU-first difference: instead of one heap ``Table`` struct per table with
per-pair pointer chasing, all tables of a pair style are stacked into dense
``(T, L)`` device arrays; a per-pair interpolation is then a gather + FMA over
whatever batch shape the caller provides (typically ``(N, K, 2, 2)`` with the
state-combination axes trailing).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import pytree_dataclass
from lammps_ucg_dev_tpu.io.table_io import RLINEAR, RSQ, BMP, RNONE, RawTable
from lammps_ucg_dev_tpu.ops.spline import spline, splint

LOOKUP, LINEAR, SPLINE, BITMAP = "lookup", "linear", "spline", "bitmap"

_SECANT = 0.1


@dataclasses.dataclass
class BuiltTable:
    """One table after spline fit + r²-binning (host, float64)."""

    cut: float
    innersq: float
    delta: float
    invdelta: float
    deltasq6: float
    e: np.ndarray
    f: np.ndarray           # f(r)/r
    de: np.ndarray | None = None
    df: np.ndarray | None = None
    e2: np.ndarray | None = None
    f2: np.ndarray | None = None
    # BITMAP extras (float-bit binning; pair_table_ucgld.cpp:1252-1344)
    rsq: np.ndarray | None = None
    drsq: np.ndarray | None = None   # 1 / (rsq[i+1] - rsq[i]), periodic
    nmask: int = 0
    nshiftbits: int = 0


def _f32_bits(x: float) -> int:
    """Bit pattern of float(x) as a (signed) int32 — the reference's
    ``union_int_float_t`` (assignment to ``.f`` narrows double → float)."""
    return int(np.float64(x).astype(np.float32).view(np.int32))


def _bits_f32(i: int) -> float:
    return float(np.array(i, np.int64).astype(np.uint32).view(np.float32))


def init_bitmap(inner: float, outer: float, ntablebits: int):
    """Stock ``Pair::init_bitmap`` (the reference calls it at
    pair_table_ucgld.cpp:1260 but inherits the body from stock pair.cpp):
    choose exponent/mantissa bit splits so 2^ntablebits bins cover
    [inner², outer²] in float32 bit space; returns
    (masklo, maskhi, nmask, nshiftbits)."""
    if ntablebits > 32:
        raise ValueError("Too many total bits for bitmapped lookup table")
    if inner >= outer:
        raise ValueError("Table inner cutoff >= outer cutoff")

    nlowermin = 1
    while not (2.0 ** nlowermin <= inner * inner
               and 2.0 ** (nlowermin + 1) > inner * inner):
        if 2.0 ** nlowermin <= inner * inner:
            nlowermin += 1
        else:
            nlowermin -= 1

    nexpbits = 0
    required_range = outer * outer / 2.0 ** nlowermin
    available_range = 2.0
    while available_range < required_range:
        nexpbits += 1
        available_range = 2.0 ** (2.0 ** nexpbits)

    nmantbits = ntablebits - nexpbits
    nshiftbits = 24 - (nmantbits + 1)          # FLT_MANT_DIG = 24
    if nshiftbits < 0:
        raise ValueError("Too many mantissa bits for bitmapped lookup table")
    nmask = (1 << (ntablebits + nshiftbits)) - 1
    maskhi = _f32_bits(outer * outer) & ~nmask
    masklo = _f32_bits(inner * inner) & ~nmask
    return masklo, maskhi, nmask, nshiftbits


def spline_table(tb: RawTable):
    """Fit e(r), f(r) splines over the raw input (spline_table, :1047-1065)."""
    ep0 = -tb.f[0]
    epn = -tb.f[-1]
    e2file = spline(tb.r, tb.e, ep0, epn)
    if tb.fpflag:
        fplo, fphi = tb.fplo, tb.fphi
    else:
        fplo = (tb.f[1] - tb.f[0]) / (tb.r[1] - tb.r[0])
        fphi = (tb.f[-1] - tb.f[-2]) / (tb.r[-1] - tb.r[-2])
    f2file = spline(tb.r, tb.f, fplo, fphi)
    return e2file, f2file, fplo, fphi


def build_table(tb: RawTable, tabstyle: str, tablength: int, cut: float) -> BuiltTable:
    """Bin one raw table in r² (compute_table, :1105-1245).  For BITMAP,
    ``tablength`` is the number of index BITS (2^tablength bins,
    pair_table_ucgld.cpp:1252-1344)."""
    if tb.rflag == BMP:
        raise NotImplementedError(
            "BITMAP-spaced table FILES are not supported; R/RSQ input files "
            "work with every tabstyle including bitmap")
    if tabstyle == BITMAP:
        return _build_bitmap(tb, tablength, cut)

    if tb.ninput <= 1:
        raise ValueError("Invalid pair table length")
    rlo = tb.rlo if tb.rflag else tb.r[0]
    rhi = tb.rhi if tb.rflag else tb.r[-1]
    if cut <= rlo or cut > rhi:
        raise ValueError(
            f"Pair table cutoff {cut} outside of table range [{rlo}, {rhi}]"
        )
    if rlo <= 0.0:
        raise ValueError("Invalid pair table lower boundary")

    # match = don't respline when final r values equal file values (coeff, :818-822)
    match = (
        tabstyle == LINEAR
        and tb.ninput == tablength
        and tb.rflag == RSQ
        and tb.rhi == cut
    )

    if not match:
        e2file, f2file, fplo, fphi = spline_table(tb)

    tlm1 = tablength - 1
    inner = tb.rlo if tb.rflag else tb.r[0]
    innersq = inner * inner
    delta = (cut * cut - innersq) / tlm1
    invdelta = 1.0 / delta

    if tabstyle == LOOKUP:
        rsq = innersq + (np.arange(tlm1) + 0.5) * delta
        r = np.sqrt(rsq)
        e = splint(tb.r, tb.e, e2file, r)
        f = splint(tb.r, tb.f, f2file, r) / r
        return BuiltTable(cut, innersq, delta, invdelta, 0.0, e, f)

    rsq = innersq + np.arange(tablength) * delta
    r = np.sqrt(rsq)
    if match:
        e = tb.e.copy()
        f = tb.f / r
    else:
        e = splint(tb.r, tb.e, e2file, r)
        f = splint(tb.r, tb.f, f2file, r)
        if tabstyle == LINEAR:
            f = f / r

    if tabstyle == LINEAR:
        de = np.zeros(tablength)
        df = np.zeros(tablength)
        de[:tlm1] = e[1:] - e[:-1]
        df[:tlm1] = f[1:] - f[:-1]
        return BuiltTable(cut, innersq, delta, invdelta, 0.0, e, f, de, df)

    if tabstyle == SPLINE:
        deltasq6 = delta * delta / 6.0
        # e spline in r² with endpoint slopes de/d(r²) = -f / 2r (:1208-1214)
        ep0 = -f[0] / (2.0 * np.sqrt(innersq))
        epn = -f[tlm1] / (2.0 * cut)
        e2 = spline(rsq, e, ep0, epn)

        # f/r spline in r² with secant endpoint slopes (:1221-1241)
        if tb.fpflag:
            fp0 = (tb.fplo / np.sqrt(innersq) - f[0] / innersq) / (2.0 * np.sqrt(innersq))
        else:
            rsq1 = innersq
            rsq2 = rsq1 + _SECANT * delta
            fp0 = (
                splint(tb.r, tb.f, f2file, np.sqrt(rsq2)) / np.sqrt(rsq2)
                - f[0] / np.sqrt(rsq1)
            ) / (_SECANT * delta)
        if tb.fpflag and cut == tb.r[-1]:
            fpn = (tb.fphi / cut - f[tlm1] / (cut * cut)) / (2.0 * cut)
        else:
            rsq2 = cut * cut
            rsq1 = rsq2 - _SECANT * delta
            fpn = (
                f[tlm1] / np.sqrt(rsq2)
                - splint(tb.r, tb.f, f2file, np.sqrt(rsq1)) / np.sqrt(rsq1)
            ) / (_SECANT * delta)

        fr = f / r
        f2 = spline(rsq, fr, fp0, fpn)
        return BuiltTable(cut, innersq, delta, invdelta, deltasq6, e, fr,
                          e2=e2, f2=f2)

    raise ValueError(f"Unknown table style {tabstyle!r}")


def _build_bitmap(tb: RawTable, ntablebits: int, cut: float) -> BuiltTable:
    """Bitmapped linear tables: 2^N bins whose edges are float32 bit
    patterns (compute_table BITMAP branch, pair_table_ucgld.cpp:1252-1344).
    Bins wrap periodically in masked-bit index space; per-bin (rsq, 1/Δrsq)
    replace the uniform (innersq, invdelta) of LINEAR."""
    if tb.ninput <= 1:
        raise ValueError("Invalid pair table length")
    rlo = tb.rlo if tb.rflag else tb.r[0]
    rhi = tb.rhi if tb.rflag else tb.r[-1]
    if cut <= rlo or cut > rhi:
        raise ValueError(
            f"Pair table cutoff {cut} outside of table range [{rlo}, {rhi}]")
    if rlo <= 0.0:
        raise ValueError("Invalid pair table lower boundary")

    e2file, f2file, fplo, fphi = spline_table(tb)
    inner = rlo
    masklo, maskhi, nmask, nshiftbits = init_bitmap(inner, cut, ntablebits)
    ntable = 1 << ntablebits

    idx_bits = np.arange(ntable, dtype=np.int64) << nshiftbits
    f_lo = (idx_bits | masklo).astype(np.uint32).view(np.float32).astype(np.float64)
    f_hi = (idx_bits | maskhi).astype(np.uint32).view(np.float32).astype(np.float64)
    rsq_t = np.where(f_lo < inner * inner, f_hi, f_lo)
    r = np.sqrt(np.float32(rsq_t).astype(np.float64))   # sqrtf, :1282
    e = splint(tb.r, tb.e, e2file, r)
    f = splint(tb.r, tb.f, f2file, r) / r
    innersq = float(np.min(rsq_t))                       # minrsq, :1294

    de = np.empty(ntable)
    df = np.empty(ntable)
    drsq = np.empty(ntable)
    de[:-1] = e[1:] - e[:-1]
    df[:-1] = f[1:] - f[:-1]
    drsq[:-1] = 1.0 / (rsq_t[1:] - rsq_t[:-1])
    # periodic closure between index ntable-1 and 0 (:1304-1308)
    de[-1] = e[0] - e[-1]
    df[-1] = f[0] - f[-1]
    drsq[-1] = 1.0 / (rsq_t[0] - rsq_t[-1])

    # the largest-r bin interpolates to cut² exactly (:1312-1343)
    itablemin = int(np.argmin(rsq_t))
    itablemax = (itablemin - 1) % ntable
    f_edge = (np.int64(itablemax << nshiftbits) | maskhi)
    edge = float(np.array(f_edge, np.int64).astype(np.uint32)
                 .view(np.float32))
    if edge < cut * cut:
        # the reference narrows cut² through the float union (rsq_lookup.f)
        # before both the spline query and the drsq denominator (:1335-1341)
        cutsq32 = float(np.float32(cut * cut))
        rc = np.sqrt(cutsq32)
        e_tmp = float(splint(tb.r, tb.e, e2file, np.asarray([rc]))[0])
        f_tmp = float(splint(tb.r, tb.f, f2file, np.asarray([rc]))[0] / rc)
        de[itablemax] = e_tmp - e[itablemax]
        df[itablemax] = f_tmp - f[itablemax]
        drsq[itablemax] = 1.0 / (cutsq32 - rsq_t[itablemax])

    return BuiltTable(cut, innersq, 0.0, 0.0, 0.0, e, f, de, df,
                      rsq=rsq_t, drsq=drsq, nmask=nmask,
                      nshiftbits=nshiftbits)


@pytree_dataclass(meta_fields=("style", "nbins", "uniform"))
class TableBank:
    """All tables of a pair style, stacked on device.

    ``interp`` is the single hot primitive of the tabulated substrate: the four
    interpolation modes of the reference's per-pair switch
    (pair_table_ucgld.cpp:226-268) become one vectorized gather + FMA.

    TPU note: the hot path gathers from ``packed`` — a channel-packed
    ``(T*L, C)`` layout read with a single flat-index ``jnp.take``.  A
    two-axis advanced-index gather (``e[t, it]``) lowers to ~20 ms per call
    at 4k×93 pairs on v5e, while the flat packed take fetches all channels in
    one ~2 ms gather (measured ~6.6× whole-kernel speedup).  The unpacked
    per-table arrays are kept for host-side oracles/diagnostics.
    """

    style: str
    nbins: int            # number of stored entries per table
    innersq: jax.Array    # (T,)
    invdelta: jax.Array   # (T,)
    delta: jax.Array      # (T,)
    cutsq: jax.Array      # (T,)
    deltasq6: jax.Array   # (T,)
    e: jax.Array          # (T, L)
    f: jax.Array          # (T, L)  — stores f(r)/r
    de: jax.Array         # (T, L)
    df: jax.Array         # (T, L)
    e2: jax.Array         # (T, L) spline only (zeros otherwise)
    f2: jax.Array         # (T, L)
    packed: jax.Array     # (T*L, C): LOOKUP [e,f]; LINEAR [e,de,f,df];
                          # SPLINE [e,f,e2,f2]; BITMAP [e,de,f,df,rsq,drsq]
    # Uniform-binning fast path (all tables share innersq/delta/cut; the
    # common production case): one row of ``upacked`` holds ALL tables'
    # channels at a bin, so a pair needs ONE gather index for every state
    # combination instead of one per combination.
    uniform: bool = False
    upacked: jax.Array | None = None    # (L, T*C) when uniform
    # BITMAP float-bit binning metadata
    nmask: jax.Array | None = None      # (T,) int32
    nshiftbits: jax.Array | None = None  # (T,) int32

    @property
    def n_tables(self) -> int:
        return self.e.shape[0]

    @staticmethod
    def from_built(tables: list[BuiltTable], style: str, dtype=jnp.float32) -> "TableBank":
        L = max(len(t.e) for t in tables)

        def stack(get, fill=0.0):
            out = np.full((len(tables), L), fill, dtype=np.float64)
            for i, t in enumerate(tables):
                a = get(t)
                if a is None:
                    continue
                out[i, : len(a)] = a
            return jnp.asarray(out, dtype=dtype)

        e = stack(lambda t: t.e)
        f = stack(lambda t: t.f)
        de = stack(lambda t: t.de)
        df = stack(lambda t: t.df)
        e2 = stack(lambda t: t.e2)
        f2 = stack(lambda t: t.f2)
        if style == LOOKUP:
            channels = (e, f)
        elif style == LINEAR:
            channels = (e, de, f, df)
        elif style == SPLINE:
            channels = (e, f, e2, f2)
        elif style == BITMAP:
            channels = (e, de, f, df, stack(lambda t: t.rsq),
                        stack(lambda t: t.drsq))
        else:
            raise NotImplementedError(f"table style {style!r}")
        packed = jnp.stack(channels, axis=-1).reshape(len(tables) * L, -1)
        inn = np.asarray([t.innersq for t in tables])
        dlt = np.asarray([t.delta for t in tables])
        uniform = (
            style == LINEAR
            and len({len(t.e) for t in tables}) == 1
            and bool(np.all(np.abs(inn - inn[0]) <= 1e-12 * max(1.0, abs(inn[0]))))
            and bool(np.all(np.abs(dlt - dlt[0]) <= 1e-12 * dlt[0]))
        )
        upacked = None
        if uniform:
            C = packed.shape[-1]
            upacked = packed.reshape(len(tables), L, C).transpose(1, 0, 2)
            upacked = upacked.reshape(L, len(tables) * C)
        return TableBank(
            style=style,
            nbins=L,
            innersq=jnp.asarray([t.innersq for t in tables], dtype),
            invdelta=jnp.asarray([t.invdelta for t in tables], dtype),
            delta=jnp.asarray([t.delta for t in tables], dtype),
            cutsq=jnp.asarray([t.cut * t.cut for t in tables], dtype),
            deltasq6=jnp.asarray([t.deltasq6 for t in tables], dtype),
            e=e, f=f, de=de, df=df, e2=e2, f2=f2,
            packed=packed,
            uniform=uniform,
            upacked=upacked,
            nmask=(jnp.asarray([t.nmask for t in tables], jnp.int32)
                   if style == BITMAP else None),
            nshiftbits=(jnp.asarray([t.nshiftbits for t in tables], jnp.int32)
                        if style == BITMAP else None),
        )

    def interp(self, t: jax.Array, rsq: jax.Array):
        """Interpolate (energy, f(r)/r) for table ids ``t`` at squared
        distances ``rsq``. Any matching batch shapes.

        Returns (e, fpair, oob_low, oob_high); out-of-range entries are
        clamped to the boundary bin (the caller masks pairs beyond the pair
        cutoff; oob flags surface the cases the reference treats as errors,
        pair_table_ucgld.cpp:223-236).
        """
        inn = self.innersq[t]
        L = self.nbins

        if self.style == BITMAP:
            # float32-bit binning (pair_table_ucgld.cpp:252-258): mask the
            # bit pattern, shift to the index, linear-interpolate against
            # the per-bin lower-edge rsq.  The lookup value is the f32-
            # narrowed rsq, matching the reference's union_int_float_t
            # (rsq_lookup.f) in BOTH the index and the fraction.  Below the
            # inner cutoff the masked-bit index would alias periodically to
            # a mid-table bin (the reference error->one's there); clamp the
            # lookup to innersq so the repulsive edge extrapolates like the
            # LINEAR path — the oob_low flag still reports the violation.
            rs32 = jnp.maximum(rsq, inn).astype(jnp.float32)
            bits = jax.lax.bitcast_convert_type(rs32, jnp.int32)
            it = jax.lax.shift_right_logical(
                bits & self.nmask[t], self.nshiftbits[t])
            v = jnp.take(self.packed, t * L + it, axis=0)
            frac = (rs32.astype(rsq.dtype) - v[..., 4]) * v[..., 5]
            e = v[..., 0] + frac * v[..., 1]
            fp = v[..., 2] + frac * v[..., 3]
            return e, fp, rsq < inn, jnp.zeros_like(rsq, bool)

        invd = self.invdelta[t]
        xbin = (rsq - inn) * invd

        if self.style == LOOKUP:
            it = jnp.clip(xbin.astype(jnp.int32), 0, L - 1)
            v = jnp.take(self.packed, t * L + it, axis=0)
            e = v[..., 0]
            fp = v[..., 1]
            oob_hi = xbin >= L
        elif self.style == LINEAR:
            it = jnp.clip(xbin.astype(jnp.int32), 0, L - 2)
            frac = xbin - it.astype(xbin.dtype)
            v = jnp.take(self.packed, t * L + it, axis=0)   # [e, de, f, df]
            e = v[..., 0] + frac * v[..., 1]
            fp = v[..., 2] + frac * v[..., 3]
            oob_hi = xbin >= (L - 1)
        elif self.style == SPLINE:
            it = jnp.clip(xbin.astype(jnp.int32), 0, L - 2)
            b = xbin - it.astype(xbin.dtype)
            a = 1.0 - b
            d6 = self.deltasq6[t]
            flat = t * L + it
            v0 = jnp.take(self.packed, flat, axis=0)        # [e, f, e2, f2] @ it
            v1 = jnp.take(self.packed, flat + 1, axis=0)    # ... @ it+1
            wa = a * a * a - a
            wb = b * b * b - b
            e = a * v0[..., 0] + b * v1[..., 0] + (wa * v0[..., 2] + wb * v1[..., 2]) * d6
            fp = a * v0[..., 1] + b * v1[..., 1] + (wa * v0[..., 3] + wb * v1[..., 3]) * d6
            oob_hi = xbin >= (L - 1)
        else:
            raise NotImplementedError(f"table style {self.style!r}")

        oob_lo = rsq < inn
        return e, fp, oob_lo, oob_hi
