"""Chebyshev compression of binned pair tables for the fused Pallas kernel.

Measured context: XLA/Mosaic per-element table gathers cost ~4 ns/index on
v5e, and in-kernel ``tpu.dynamic_gather`` is restricted to a single source
vreg, so bin lookups cannot ride the VPU.  Polynomial evaluation can: a
degree-(D-1) Chebyshev fit per (table, channel) turns interpolation into
~2D FMAs per pair with NO memory indirection.

The fit targets the user's r²-binned LINEAR table (the exact function the
reference evaluates), so kernel-vs-XLA differences are bounded by the
reported fit error, not by a different physical model.  ``fit_bank`` returns
the coefficients plus max abs/rel errors; callers enable the kernel path only
when the errors pass their tolerance (smooth CG tables fit to ~1e-6; hard-core
r⁻ⁿ tables may not — then the gather path stays in force).

Evaluation uses the Clenshaw recurrence (numerically stable at high degree).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from numpy.polynomial import chebyshev as C

from lammps_ucg_dev_tpu.core.state import pytree_dataclass
from lammps_ucg_dev_tpu.ops.table import BITMAP, LINEAR, SPLINE, TableBank


@pytree_dataclass(meta_fields=("degree",))
class ChebBank:
    """Chebyshev coefficients for all tables' (e, f) channels.

    coeffs: (2*T, D) — rows [e_0..e_{T-1}, f_0..f_{T-1}]; domain [lo, hi] in
    rsq shared by all tables (uniform banks only)."""

    coeffs: jax.Array
    lo: jax.Array       # () rsq domain start (= innersq)
    hi: jax.Array       # () rsq domain end (= cut²)
    max_abs_err: jax.Array   # (2*T,)
    max_rel_err: jax.Array   # (2*T,)
    degree: int = 16


def _shared_domain(bank: TableBank):
    """(lo, hi) of the rsq domain when every table shares it, else None.
    LINEAR/SPLINE: shared (innersq, delta) uniform binning; BITMAP: shared
    (innersq, cut²) — its bit-binned grid is identical across tables by
    construction when those agree."""
    if bank.style not in (LINEAR, SPLINE, BITMAP):
        return None
    inn = np.asarray(bank.innersq, np.float64)
    if not np.all(np.abs(inn - inn[0]) <= 1e-12 * max(1.0, abs(inn[0]))):
        return None
    if bank.style == BITMAP:
        cut = np.asarray(bank.cutsq, np.float64)
        if not np.all(np.abs(cut - cut[0]) <= 1e-12 * cut[0]):
            return None
        nm = np.asarray(bank.nmask)
        if not np.all(nm == nm[0]):       # same bit grid across tables
            return None
        return float(inn[0]), float(cut[0])
    dlt = np.asarray(bank.delta, np.float64)
    if not np.all(np.abs(dlt - dlt[0]) <= 1e-12 * dlt[0]):
        return None
    return float(inn[0]), float(inn[0] + (bank.nbins - 1) * dlt[0])


def fittable(bank: TableBank) -> bool:
    """Whether the fused-kernel Chebyshev compression applies to this bank
    (the quality gate on ``max_rel_err`` still decides per fit): LINEAR,
    SPLINE, or BITMAP with a shared rsq domain.  LOOKUP's staircase never
    fits, so it is excluded up front."""
    return _shared_domain(bank) is not None


def _sample_channels(bank: TableBank, t: int, rsq: np.ndarray):
    """Host f64 evaluation of table ``t``'s (e, f/r) at dense rsq — the
    exact function TableBank.interp computes for each style (the fit target
    must be the XLA path's interpolant so kernel-vs-XLA differences stay
    bounded by the reported fit error)."""
    inn = float(np.asarray(bank.innersq)[t])
    L = bank.nbins
    e_arr = np.asarray(bank.e, np.float64)[t]
    f_arr = np.asarray(bank.f, np.float64)[t]
    if bank.style == BITMAP:
        # float32-bit binning, matching interp's BITMAP branch bit-for-bit
        pk = np.asarray(bank.packed, np.float64).reshape(bank.n_tables, L, 6)
        rs32 = np.maximum(rsq, inn).astype(np.float32)
        bits = rs32.view(np.int32)
        nmask = int(np.asarray(bank.nmask)[t])
        nshift = int(np.asarray(bank.nshiftbits)[t])
        it = np.right_shift(np.bitwise_and(bits, nmask), nshift)
        frac = (rs32.astype(np.float64) - pk[t, it, 4]) * pk[t, it, 5]
        return (pk[t, it, 0] + frac * pk[t, it, 1],
                pk[t, it, 2] + frac * pk[t, it, 3])
    delta = float(np.asarray(bank.delta)[t])
    xb = (rsq - inn) / delta
    it = np.clip(xb.astype(int), 0, L - 2)
    frac = xb - it
    if bank.style == SPLINE:
        e2 = np.asarray(bank.e2, np.float64)[t]
        f2 = np.asarray(bank.f2, np.float64)[t]
        d6 = float(np.asarray(bank.deltasq6)[t])
        b = frac
        a = 1.0 - b
        wa = a * a * a - a
        wb = b * b * b - b
        e = a * e_arr[it] + b * e_arr[it + 1] + (wa * e2[it]
                                                 + wb * e2[it + 1]) * d6
        f = a * f_arr[it] + b * f_arr[it + 1] + (wa * f2[it]
                                                 + wb * f2[it + 1]) * d6
        return e, f
    de_arr = np.asarray(bank.de, np.float64)[t]
    df_arr = np.asarray(bank.df, np.float64)[t]
    return (e_arr[it] + frac * de_arr[it], f_arr[it] + frac * df_arr[it])


def fit_bank(bank: TableBank, degree: int | None = None, oversample: int = 4,
             dtype=jnp.float32, rel_tol: float = 1e-5) -> ChebBank:
    """Fit every table's e and f/r channels of a shared-domain LINEAR,
    SPLINE, or BITMAP bank (the fit targets each style's exact
    interpolant — see _sample_channels).

    degree=None auto-selects the smallest degree in {6, 8, 12, 16, 20, 24}
    whose max relative fit error is below ``rel_tol`` (the kernel cost is
    ~10 VPU FMAs per degree per candidate block, so smaller is faster);
    falls back to the largest candidate if none passes — callers gate on
    ``max_rel_err`` anyway."""
    if degree is None:
        last = None
        for d in (5, 6, 8, 12, 16, 20, 24):
            last = fit_bank(bank, degree=d, oversample=oversample, dtype=dtype)
            if float(np.max(np.asarray(last.max_rel_err))) < rel_tol:
                return last
        return last
    dom = _shared_domain(bank)
    if dom is None:
        raise ValueError("ChebBank requires a shared-domain LINEAR, SPLINE, "
                         "or BITMAP TableBank")
    innersq, hi = dom
    T = bank.n_tables
    L = bank.nbins

    # dense samples of the exact interpolant
    m = oversample * L
    rsq = np.linspace(innersq, hi, m)

    u = 2.0 * (rsq - innersq) / (hi - innersq) - 1.0
    coeffs = np.zeros((2 * T, degree))
    max_abs = np.zeros(2 * T)
    max_rel = np.zeros(2 * T)
    for t in range(T):
        for c, y in enumerate(_sample_channels(bank, t, rsq)):
            ch = C.chebfit(u, y, degree - 1)
            fit = C.chebval(u, ch)
            err = np.abs(fit - y)
            row = c * T + t
            coeffs[row] = ch
            max_abs[row] = err.max()
            scale = np.abs(y).max() + 1e-300
            max_rel[row] = err.max() / scale
    return ChebBank(
        coeffs=jnp.asarray(coeffs, dtype),
        lo=jnp.asarray(innersq, dtype),
        hi=jnp.asarray(hi, dtype),
        max_abs_err=jnp.asarray(max_abs, dtype),
        max_rel_err=jnp.asarray(max_rel, dtype),
        degree=degree,
    )


def clenshaw(coeffs_row, u):
    """Evaluate a Chebyshev series at u ∈ [-1, 1] (Clenshaw; jit/pallas-safe).
    coeffs_row: (D,) scalars (python floats or 0-d arrays); u: array."""
    D = len(coeffs_row)
    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    for k in range(D - 1, 0, -1):
        b1, b2 = 2.0 * u * b1 - b2 + coeffs_row[k], b1
    return u * b1 - b2 + coeffs_row[0]


def eval_all(cheb: ChebBank, rsq: jax.Array):
    """XLA reference evaluator: returns (e_all, f_all) with a trailing T axis.
    Used for validation and as a gather-free XLA fallback."""
    u = jnp.clip(2.0 * (rsq - cheb.lo) / (cheb.hi - cheb.lo) - 1.0, -1.0, 1.0)
    TT = cheb.coeffs.shape[0] // 2
    outs = []
    for row in range(2 * TT):
        coeffs_row = [cheb.coeffs[row, k] for k in range(cheb.degree)]
        outs.append(clenshaw(coeffs_row, u))
    e_all = jnp.stack(outs[:TT], axis=-1)
    f_all = jnp.stack(outs[TT:], axis=-1)
    return e_all, f_all
