"""Local-density collective-variable machinery shared by the density styles
(P3 ``table_ucg_bethe_density`` and P4 ``table_rleucg_interface``).

Proximity (smoothed counting) function and the sigmoid state-probability
threshold (/root/reference/UCG/pair_table_rleucg_interface.cpp:90-100,164-173;
identical copies in pair_table_ucg_bethe_density.cpp:107-127):

    w(r)    = 0.5 (1 - tanh((r - R) / 0.1 R))          proximity
    w'(r)   = -0.5 (1 - tanh²) / (0.1 R)               derivative (note sign:
              the reference returns +|w'|; callers multiply into dr/r the same
              way, so we keep the reference's positive convention)
    p(ρ)    = 0.5 + 0.5 tanh((ρ - ρ*) / 0.1 ρ*)        threshold probability
    ∂p/∂ρ   = 0.5 (1 - tanh²) / (0.1 ρ*)

The reference hard-codes these for actual type 1 and errors otherwise
(:92-99); here the (ρ*, R) parameters are per-type arrays so any type may use
the density CV — a strict superset of the reference's capability.
"""

from __future__ import annotations

import jax.numpy as jnp


def proximity(r, radius):
    t = jnp.tanh((r - radius) / (0.1 * radius))
    return 0.5 * (1.0 - t)


def proximity_der(r, radius):
    """Positive-convention derivative magnitude (matches
    compute_proximity_function_der): 0.5 (1 - tanh²)/(0.1 R).  The actual
    dw/dr is the negative of this."""
    t = jnp.tanh((r - radius) / (0.1 * radius))
    return 0.5 * (1.0 - t * t) / (0.1 * radius)


def threshold_prob_and_partial(cv, cv_threshold):
    t = jnp.tanh((cv - cv_threshold) / (0.1 * cv_threshold))
    prob = 0.5 + 0.5 * t
    partial = 0.5 * (1.0 - t * t) / (0.1 * cv_threshold)
    return prob, partial
