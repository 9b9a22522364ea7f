"""``fix ucgld/langevin`` — Langevin thermostat acting on λ only.

Reference (/root/reference/UCG/fix_ucgld_langevin.cpp):
    post_force:  ucgforce += γ1 v_λ + γ2 √T (uniform - 0.5)        (:273-296)
    γ1 = -m_λ / period / ftm2v                                     (:165)
    γ2 = √m_λ / ftm2v · √(24 k_B / (period · dt · mvv2e))          (:166-167)
    (uniform noise with the √24 variance factor, NOT Gaussian)
    temperature ramp T(t) = Tstart + (t-t0)/(t1-t0) (Tstop-Tstart) (:318-331)
    end_of_step: λ-temperature = Σ m_λ v_λ² mvv2e / (k_B N)        (:303-312)

Deviations (catalogued in SURVEY.md §7.4):
  * the reference indexes ``ucgml`` by atom TYPE when building prefactors
    (:165-166) although it is a per-atom quantity; we use the per-atom value
    (identical whenever m_λ is uniform, which its indexing silently assumes).
  * our λ-temperature is the global reduction (the reference reports the
    per-rank value without an MPI reduce).
  * counter-based ``jax.random`` streams make results independent of device
    count (the reference's RanMars(seed+rank) is rank-count-dependent).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core import units as units_mod
from lammps_ucg_dev_tpu.core.state import SimState


@dataclasses.dataclass(frozen=True)
class LangevinCfg:
    t_start: float
    t_stop: float
    t_period: float
    seed: int = 1234
    enabled: bool = True
    group: "object | None" = None   # per-TAG bool mask; None = all


def t_target(cfg: LangevinCfg, step, beginstep, endstep):
    """Linear temperature ramp over the run window (compute_target, :318-331)."""
    span = jnp.maximum(endstep - beginstep, 1)
    delta = jnp.where(endstep > beginstep,
                      (step - beginstep).astype(jnp.float32) / span, 0.0)
    return cfg.t_start + delta * (cfg.t_stop - cfg.t_start)


def post_force(key: jax.Array, state: SimState, tT, dt: float,
               u: units_mod.UnitSystem, cfg: LangevinCfg) -> jax.Array:
    """Return the λ-force increment (drag + uniform random kick)."""
    ml = state.ucgml
    gamma1 = -ml / cfg.t_period / u.ftm2v
    gamma2 = (
        jnp.sqrt(ml) / u.ftm2v
        * jnp.sqrt(24.0 * u.boltz / cfg.t_period / dt / u.mvv2e)
        * jnp.sqrt(tT)
    )
    # draw by atom TAG over the GLOBAL tag space so the stochastic stream is
    # invariant under storage reordering (sort_atoms) and sharding (including
    # spatial decomposition, where this array is a local view) — stronger
    # than the reference's rank-dependent RanMars streams
    un_by_tag = jax.random.uniform(key, (state.rng_n,),
                                   dtype=state.ucgvl.dtype)
    un = jnp.take(un_by_tag, state.tag - 1)
    out = gamma1 * state.ucgvl + gamma2 * (un - 0.5)
    if cfg.group is not None:
        out = jnp.where(jnp.asarray(cfg.group)[state.tag - 1], out, 0.0)
    return out


@dataclasses.dataclass(frozen=True)
class VLangevinCfg:
    """Stock ``fix langevin`` acting on particle VELOCITIES (the implied-L0
    thermostat the reference's production decks run under — every pair style
    pulls kT from "any thermostat fix", pair_table_ucgld.cpp:872-881).
    Same conventions as the λ-Langevin (fix_ucgld_langevin.cpp:164-171,
    273-296, itself copied from stock fix_langevin): uniform noise with the
    √24 variance factor, γ1 = -m/damp/ftm2v, γ2 = √(24 kB T m/(damp dt
    mvv2e))/ftm2v, applied per component in post_force."""

    t_start: float
    t_stop: float
    damp: float
    seed: int = 1234
    enabled: bool = True
    group: "object | None" = None   # per-TAG bool mask; None = all


def post_force_v(key: jax.Array, state: SimState, mass: jax.Array, tT,
                 dt: float, u: units_mod.UnitSystem,
                 cfg: VLangevinCfg) -> jax.Array:
    """(N, 3) force increment of the velocity Langevin thermostat."""
    gamma1 = -mass / cfg.damp / u.ftm2v
    gamma2 = (
        jnp.sqrt(mass) / u.ftm2v
        * jnp.sqrt(24.0 * u.boltz / cfg.damp / dt / u.mvv2e)
        * jnp.sqrt(tT)
    )
    # tag-keyed draws: invariant under storage order and sharding (see
    # post_force above); 3 components per atom
    un_by_tag = jax.random.uniform(key, (state.rng_n, 3),
                                   dtype=state.v.dtype)
    un = jnp.take(un_by_tag, state.tag - 1, axis=0)
    out = gamma1[:, None] * state.v + gamma2[:, None] * (un - 0.5)
    if cfg.group is not None:
        g = jnp.asarray(cfg.group)[state.tag - 1]
        out = jnp.where(g[:, None], out, 0.0)
    return out


def lambda_temperature(state: SimState, u: units_mod.UnitSystem) -> jax.Array:
    """T_λ with 1 dof per atom (end_of_step, :303-312), globally reduced."""
    n = state.ucgvl.shape[0]
    ek = 0.5 * jnp.sum(state.ucgml * state.ucgvl**2) * u.mvv2e
    return ek / (0.5 * u.boltz * n)
