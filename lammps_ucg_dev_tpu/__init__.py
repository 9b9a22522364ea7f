"""lammps_ucg_dev_tpu — a TPU-native ultra-coarse-grained (UCG) molecular dynamics
framework built from scratch in JAX/XLA/Pallas.

Capability target: the LAMMPS UCG package (KJAdams2000/LAMMPS-UCG-dev) — four
tabulated UCG pair styles (``table_ucgld``, ``table_ucg_bethe``,
``table_ucg_bethe_density``, ``table_rleucg_interface``), the extended-Lagrangian
λ-dynamics integrators (``nve/ucgld``, ``nve/ucgld/wall/hard``,
``ucgld/langevin``), the discrete-state machinery (``ucgstate``,
``cluster_switch``), the ``ucg`` atom style with its per-atom fields, and the
surrounding MD runtime (neighbor lists, Verlet loop, thermo, data/dump/restart
I/O, input-script compatibility layer) that the reference package inherits from
stock LAMMPS.

Architecture (TPU-first, NOT a port):
  * structure-of-arrays ``SimState`` pytree, fixed shapes, whole timestep jitted
  * full neighbor lists with newton-off per-atom-owned tallies (no reverse
    scatter) — see SURVEY.md §2.3/§7
  * tabulated potentials resident on device as stacked ``(T, L)`` arrays;
    interpolation is gather + FMA over a leading (2, 2) state axis
  * multi-chip via ``jax.sharding.Mesh`` + ``shard_map`` collectives
"""

__version__ = "0.1.0"

from lammps_ucg_dev_tpu.core import units  # noqa: F401
from lammps_ucg_dev_tpu.core.state import SimState, System  # noqa: F401
