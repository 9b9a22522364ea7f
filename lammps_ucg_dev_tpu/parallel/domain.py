"""Multi-chip execution: SPMD atom decomposition over a device mesh.

The reference parallelizes by MPI spatial domain decomposition with explicit
halo pack/unpack (SURVEY.md §2.3).  The TPU-native round-1 formulation is
**atom decomposition under GSPMD**: per-atom arrays are sharded over a 1-D
``jax.sharding.Mesh`` axis ("atoms"); the jitted step is partitioned by XLA,
which inserts the collectives (all-gathers of the gathered coordinate/λ/state
rows, psums of the scalar reductions) over ICI automatically — the
"annotate shardings, let XLA insert collectives" recipe.  Because every pair
tally is per-atom-owned (no scatter), row sharding needs NO reverse-comm
transpose, mirroring how the full-list/newton-off choice eliminated it on a
single chip.

Spatial (slab/halo ppermute) decomposition — lower comm volume at extreme
scale — is the planned next stage on top of this interface.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "atoms") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} present")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


_PER_ATOM_FIELDS = ("x", "v", "tag", "typ", "mol", "q", "image", "ucgstate",
                    "ucgl", "ucgvl", "ucgml", "ucgp")


def shard_state(state, mesh: Mesh, axis: str = "atoms"):
    """Place per-atom arrays with a leading-axis NamedSharding; replicate the
    scalars/box/key.  Atom count must divide the mesh size."""
    n = state.n_atoms
    ndev = mesh.devices.size
    if n % ndev != 0:
        raise ValueError(f"n_atoms={n} not divisible by mesh size {ndev}")
    row = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    updates = {}
    for f in _PER_ATOM_FIELDS:
        updates[f] = jax.device_put(getattr(state, f), row)
    updates["step"] = jax.device_put(state.step, repl)
    updates["key"] = jax.device_put(state.key, repl)
    box = state.box
    updates["box"] = dataclasses.replace(
        box, lo=jax.device_put(box.lo, repl), hi=jax.device_put(box.hi, repl))
    return dataclasses.replace(state, **updates)


def shard_params(params, mesh: Mesh):
    """Replicate pair-style parameter pytrees (tables are small; they live
    whole in every chip's HBM/VMEM)."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), params)


def distribute(sim, mesh: Mesh, axis: str = "atoms"):
    """Shard an existing Simulation in place: state rows over the mesh,
    parameters replicated.  The already-jitted step functions re-specialize
    on the sharded inputs; XLA partitions them SPMD."""
    sim.state = shard_state(sim.state, mesh, axis)
    sim.pair_params = shard_params(sim.pair_params, mesh)
    sim._masses_by_type = jax.device_put(
        sim._masses_by_type, NamedSharding(mesh, P()))
    sim._fcarry = None
    return sim
