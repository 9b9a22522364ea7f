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
from lammps_ucg_dev_tpu.ops.table import LINEAR, TableBank


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


def fit_bank(bank: TableBank, degree: int | None = None, oversample: int = 4,
             dtype=jnp.float32, rel_tol: float = 1e-5) -> ChebBank:
    """Fit every table's e and f/r channels of a uniform LINEAR bank.

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
    if bank.style != LINEAR or not bank.uniform:
        raise ValueError("ChebBank requires a uniform LINEAR TableBank")
    T = bank.n_tables
    L = bank.nbins
    innersq = float(np.asarray(bank.innersq)[0])
    delta = float(np.asarray(bank.delta)[0])
    hi = innersq + (L - 1) * delta

    # dense samples of the exact linear-interp function
    m = oversample * L
    rsq = np.linspace(innersq, hi, m)
    xb = (rsq - innersq) / delta
    it = np.clip(xb.astype(int), 0, L - 2)
    frac = xb - it

    e_arr = np.asarray(bank.e, np.float64)
    de_arr = np.asarray(bank.de, np.float64)
    f_arr = np.asarray(bank.f, np.float64)
    df_arr = np.asarray(bank.df, np.float64)

    u = 2.0 * (rsq - innersq) / (hi - innersq) - 1.0
    coeffs = np.zeros((2 * T, degree))
    max_abs = np.zeros(2 * T)
    max_rel = np.zeros(2 * T)
    for t in range(T):
        for c, (base, dlt) in enumerate(((e_arr, de_arr), (f_arr, df_arr))):
            y = base[t, it] + frac * dlt[t, it]
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
