"""Extended-Lagrangian velocity-Verlet integrators for (x, v, λ, v_λ).

``fix nve/ucgld`` (/root/reference/UCG/fix_nve_ucgld.cpp:44-153):
    initial:  v += dtf/m f ; x += dt v ; v_λ += dtf/m_λ f_λ ; λ += dt v_λ
    final:    v += dtf/m f ;            v_λ += dtf/m_λ f_λ
with dtf = 0.5 dt ftm2v and per-atom λ pseudo-mass m_λ = ucgml.

``fix nve/ucgld/wall/hard`` (/root/reference/UCG/fix_nve_ucgld_wall_hard.cpp):
    + after λ drift: ucgstate = λ < 0.5 ? 0 : 1            (:99-105)
    + in final: reflecting walls at λ=0/1                  (:172-200)
    + optional POST_FORCE double-well bias on λ             (:234-257)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core.state import SimState


@dataclasses.dataclass(frozen=True)
class IntegratorCfg:
    kind: str = "nve/ucgld"       # "nve/ucgld" | "nve/ucgld/wall/hard" | "none"
    bias_potential: bool = False  # wall/hard only
    barrier: float = 0.1

    @property
    def wall(self) -> bool:
        return self.kind == "nve/ucgld/wall/hard"


def initial_integrate(state: SimState, f: jax.Array, ucgforce: jax.Array,
                      mass: jax.Array, dt: float, ftm2v: float,
                      cfg: IntegratorCfg) -> SimState:
    if cfg.kind == "none":
        return state
    dtf = 0.5 * dt * ftm2v
    v = state.v + (dtf / mass)[:, None] * f
    x = state.x + dt * v
    vl = state.ucgvl + dtf / state.ucgml * ucgforce
    lam = state.ucgl + dt * vl
    ucgstate = state.ucgstate
    if cfg.wall:
        ucgstate = jnp.where(lam < 0.5, 0, 1).astype(ucgstate.dtype)
    return dataclasses.replace(state, x=x, v=v, ucgvl=vl, ucgl=lam,
                               ucgstate=ucgstate)


def final_integrate(state: SimState, f: jax.Array, ucgforce: jax.Array,
                    mass: jax.Array, dt: float, ftm2v: float,
                    cfg: IntegratorCfg) -> SimState:
    if cfg.kind == "none":
        return state
    dtf = 0.5 * dt * ftm2v
    v = state.v + (dtf / mass)[:, None] * f
    vl = state.ucgvl + dtf / state.ucgml * ucgforce
    lam = state.ucgl
    if cfg.wall:
        # reflecting walls at λ = 0 and λ = 1 (fix_nve_ucgld_wall_hard.cpp:172-200)
        below = lam < 0.0
        above = lam > 1.0
        lam = jnp.where(below, -lam, jnp.where(above, 2.0 - lam, lam))
        vl = jnp.where(below | above, -vl, vl)
    return dataclasses.replace(state, v=v, ucgvl=vl, ucgl=lam)


def bias_force(lam: jax.Array, barrier: float) -> jax.Array:
    """Double-well λ bias: U = (798 x¹⁰ - x² + 0.1)·10H with x = λ - 0.5;
    F = (-7980 x⁹ + 2x)·10H (fix_nve_ucgld_wall_hard.cpp:234-239)."""
    xx = lam - 0.5
    return (-7980.0 * xx**9 + 2.0 * xx) * 10.0 * barrier


def bias_energy(lam: jax.Array, barrier: float) -> jax.Array:
    xx = lam - 0.5
    return (798.0 * xx**10 - xx**2 + 0.1) * 10.0 * barrier
