"""``fix ucgstate`` — posterior probabilities and discrete-state assignment.

Reference (/root/reference/UCG/fix_ucgstate.cpp:88-132):
    ucgp_i = clamp(softmax(scores_i)[1], 1e-6, 1-1e-6)   (exp clamp at 700)
    modes:
      (default) ucgstate = round(ucgp); ucgl = ucgp
      ld        only ucgp is updated (λ integrator owns state/λ)
      mc        rate-capped Metropolis-like switching with RNG

Deviation (catalogued): the reference's MC accept branch assigns state 0/1
rather than toggling (:118-122), which inverts the move for state-0 atoms.  We
implement the intended toggle (accept → switch state); set
``compat_reference_mc=True`` to reproduce the reference literally.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lammps_ucg_dev_tpu.core.state import SimState
from lammps_ucg_dev_tpu.models.common import softmax_posterior


@dataclasses.dataclass(frozen=True)
class UCGStateCfg:
    mode: str = "default"        # "default" | "ld" | "mc"
    mc_rate: float = 0.01
    seed: int = 0                # MC stream id (fix ucgstate mc SEED rate);
                                 # folded into the per-step counter-based key
    compat_reference_mc: bool = False
    enabled: bool = True
    group: "object | None" = None  # per-TAG bool mask; None = all


def post_force(key: jax.Array, state: SimState, scores: jax.Array,
               is_ucg: jax.Array, cfg: UCGStateCfg) -> SimState:
    ucgp = softmax_posterior(scores, is_ucg)

    ucgstate = state.ucgstate
    ucgl = state.ucgl
    if cfg.mode == "default":
        ucgstate = jnp.where(is_ucg, jnp.round(ucgp).astype(ucgstate.dtype), 0)
        ucgl = jnp.where(is_ucg, ucgp, ucgl)
    elif cfg.mode == "mc":
        odds = jnp.where(state.ucgstate == 0, ucgp / (1.0 - ucgp),
                         (1.0 - ucgp) / ucgp)
        mc_factor = jnp.minimum(odds, 1.0) * cfg.mc_rate
        key = jax.random.fold_in(key, cfg.seed)
        rand = jnp.take(jax.random.uniform(key, (state.rng_n,),
                                           dtype=ucgp.dtype),
                        state.tag - 1)
        accept = rand < mc_factor
        if cfg.compat_reference_mc:
            new_state = jnp.where(accept, 0, 1)          # literal :118-122
        else:
            new_state = jnp.where(accept, 1 - state.ucgstate, state.ucgstate)
        ucgstate = jnp.where(is_ucg, new_state.astype(ucgstate.dtype), 0)
        ucgl = jnp.where(is_ucg, ucgp, ucgl)
    elif cfg.mode == "ld":
        pass  # integrator owns state/λ; only ucgp updates
    else:
        raise ValueError(f"unknown ucgstate mode {cfg.mode!r}")

    if cfg.group is not None:
        # the fix only updates its group's atoms (mask[i] & groupbit,
        # fix_ucgstate.cpp:96); others keep their previous values
        g = jnp.asarray(cfg.group)[state.tag - 1]
        ucgp = jnp.where(g, ucgp, state.ucgp)
        ucgstate = jnp.where(g, ucgstate, state.ucgstate)
        ucgl = jnp.where(g, ucgl, state.ucgl)
    return dataclasses.replace(state, ucgp=ucgp, ucgstate=ucgstate, ucgl=ucgl)
