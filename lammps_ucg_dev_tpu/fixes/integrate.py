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
    kind: str = "nve/ucgld"       # "nve/ucgld" | "nve/ucgld/wall/hard" |
                                  # "nve" (stock: x,v only, λ untouched) |
                                  # "none"
    bias_potential: bool = False  # wall/hard only
    barrier: float = 0.1
    group: "object | None" = None  # per-TAG bool mask; None = all (the
                                   # reference's mask[i] & groupbit,
                                   # fix_nve_ucgld.cpp:64)

    @property
    def wall(self) -> bool:
        return self.kind == "nve/ucgld/wall/hard"


def group_mask(cfg, state: SimState):
    """Per-row bool from a per-tag group array; None = every atom."""
    g = getattr(cfg, "group", None)
    if g is None:
        return None
    return jnp.asarray(g)[state.tag - 1]


def _sel(g, new, old):
    if g is None:
        return new
    if new.ndim == old.ndim == 2:
        return jnp.where(g[:, None], new, old)
    return jnp.where(g, new, old)


def initial_integrate(state: SimState, f: jax.Array, ucgforce: jax.Array,
                      mass: jax.Array, dt: float, ftm2v: float,
                      cfg: IntegratorCfg) -> SimState:
    if cfg.kind == "none":
        return state
    g = group_mask(cfg, state)
    dtf = 0.5 * dt * ftm2v
    v = _sel(g, state.v + (dtf / mass)[:, None] * f, state.v)
    x = _sel(g, state.x + dt * v, state.x)
    if cfg.kind == "nve":
        # stock fix nve: (x, v) only — λ DOF untouched (the implied-L0
        # integrator the reference's non-λ styles run under)
        return dataclasses.replace(state, x=x, v=v)
    vl = _sel(g, state.ucgvl + dtf / state.ucgml * ucgforce, state.ucgvl)
    lam = _sel(g, state.ucgl + dt * vl, state.ucgl)
    ucgstate = state.ucgstate
    if cfg.wall:
        new_state = jnp.where(lam < 0.5, 0, 1).astype(ucgstate.dtype)
        ucgstate = _sel(g, new_state, ucgstate)
    return dataclasses.replace(state, x=x, v=v, ucgvl=vl, ucgl=lam,
                               ucgstate=ucgstate)


def final_integrate(state: SimState, f: jax.Array, ucgforce: jax.Array,
                    mass: jax.Array, dt: float, ftm2v: float,
                    cfg: IntegratorCfg) -> SimState:
    if cfg.kind == "none":
        return state
    g = group_mask(cfg, state)
    dtf = 0.5 * dt * ftm2v
    v = _sel(g, state.v + (dtf / mass)[:, None] * f, state.v)
    if cfg.kind == "nve":
        return dataclasses.replace(state, v=v)
    vl = _sel(g, state.ucgvl + dtf / state.ucgml * ucgforce, state.ucgvl)
    lam = state.ucgl
    if cfg.wall:
        # reflecting walls at λ = 0 and λ = 1 (fix_nve_ucgld_wall_hard.cpp:172-200)
        below = lam < 0.0
        above = lam > 1.0
        lam_r = jnp.where(below, -lam, jnp.where(above, 2.0 - lam, lam))
        vl_r = jnp.where(below | above, -vl, vl)
        lam = _sel(g, lam_r, lam)
        vl = _sel(g, vl_r, vl)
    return dataclasses.replace(state, v=v, ucgvl=vl, ucgl=lam)


def respa_outer_initial(state: SimState, f: jax.Array, ucgforce: jax.Array,
                        mass: jax.Array, dt: float, ftm2v: float,
                        cfg: IntegratorCfg) -> SimState:
    """Outer-level half-kick of (v, v_λ) with the slow (pair) forces —
    ``initial_integrate_respa`` at the outermost level
    (fix_nve_ucgld.cpp:155-165).  Drifts happen at the innermost level."""
    if cfg.kind == "none":
        return state
    g = group_mask(cfg, state)
    dtf = 0.5 * dt * ftm2v
    v = _sel(g, state.v + (dtf / mass)[:, None] * f, state.v)
    if cfg.kind == "nve":
        return dataclasses.replace(state, v=v)
    vl = _sel(g, state.ucgvl + dtf / state.ucgml * ucgforce, state.ucgvl)
    return dataclasses.replace(state, v=v, ucgvl=vl)


def respa_inner_step(state: SimState, fbond: jax.Array, mass: jax.Array,
                     dt_inner: float, ftm2v: float, cfg: IntegratorCfg,
                     bonded_eval) -> tuple[SimState, jax.Array]:
    """One inner r-RESPA step: half-kick with the fast (bonded) force, drift
    (x, λ), re-evaluate the fast force, half-kick again.  Matches LAMMPS
    Respa with ``bond`` at level 0 and ``pair`` at the top level.  Honors
    the fix's group mask (mask[i] & groupbit) like the Verlet path."""
    if cfg.kind == "none":
        return state, fbond
    g = group_mask(cfg, state)
    dtf = 0.5 * dt_inner * ftm2v
    v = _sel(g, state.v + (dtf / mass)[:, None] * fbond, state.v)
    x = _sel(g, state.x + dt_inner * v, state.x)
    if cfg.kind == "nve":
        lam = state.ucgl
    else:
        lam = _sel(g, state.ucgl + dt_inner * state.ucgvl, state.ucgl)
    ucgstate = state.ucgstate
    if cfg.wall:
        new_state = jnp.where(lam < 0.5, 0, 1).astype(ucgstate.dtype)
        ucgstate = _sel(g, new_state, ucgstate)
    state = dataclasses.replace(state, x=x, v=v, ucgl=lam, ucgstate=ucgstate)
    fbond = bonded_eval(state)
    v = _sel(g, state.v + (dtf / mass)[:, None] * fbond, state.v)
    return dataclasses.replace(state, v=v), fbond


def respa_outer_final(state: SimState, f: jax.Array, ucgforce: jax.Array,
                      mass: jax.Array, dt: float, ftm2v: float,
                      cfg: IntegratorCfg) -> SimState:
    """Outer-level final half-kick + λ wall reflections
    (fix_nve_ucgld.cpp:166-173, fix_nve_ucgld_wall_hard.cpp:172-200)."""
    return final_integrate(state, f, ucgforce, mass, dt, ftm2v, cfg)


def bias_force(lam: jax.Array, barrier: float) -> jax.Array:
    """Double-well λ bias: U = (798 x¹⁰ - x² + 0.1)·10H with x = λ - 0.5;
    F = (-7980 x⁹ + 2x)·10H (fix_nve_ucgld_wall_hard.cpp:234-239)."""
    xx = lam - 0.5
    return (-7980.0 * xx**9 + 2.0 * xx) * 10.0 * barrier


def bias_energy(lam: jax.Array, barrier: float) -> jax.Array:
    xx = lam - 0.5
    return (798.0 * xx**10 - xx**2 + 0.1) * 10.0 * barrier
