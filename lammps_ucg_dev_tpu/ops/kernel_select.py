"""Auto-selection of the fused Pallas pair path.

One place that decides, for a given pair style + system, whether the
column-kernel production path applies (ops/pallas_pair.py + ops/colpack.py)
— used by both the driver entry (__graft_entry__) and the input-script
layer, so reference decks get the fused kernel on TPU without opting in.

Eligibility (all must hold; anything else falls back to the XLA pair path,
which is the general implementation and correctness oracle):

* TPU backend, single device — this gate covers the single-chip driver
  only.  The MULTI-chip kernel path exists and is selected explicitly:
  ``parallel.spatial.make_column_slab_spec`` / ``make_column_pencil_spec``
  + ``SpatialSimulation`` run the same fused kernel per device under
  shard_map (slab/pencil virtual boxes, ``colpack.periodic_x=False`` and,
  for pencils, ``periodic_y=False``); see tests/test_spatial.py::
  test_spatial_kernel_path_matches_32k / test_pencil_kernel_path_matches
  and __graft_entry__'s dryrun leg 3.
* float32 state (the kernel computes in f32)
* style support (``pallas_pair.supports``: table_ucgld, one actual type,
  2 states, Chebyshev-fittable shared-domain LINEAR/SPLINE/BITMAP tables)
* orthogonal box, large enough for the 3x3 column stencil
* Chebyshev fit of the table bank within ``rel_tol``
* topology composition (single chip AND the spatial drivers): bonded
  terms fold in additively (replicated topology + per-block tag→row
  maps under the slab/pencil decompositions); special exclusions
  compose via the style's ``excl_delta`` (compute-and-subtract,
  ops/pallas_pair.py — table_ucgld and table_ucg_bethe; other styles
  with exclusions fall back to the atom-neighbor-list path).
  cluster_switch also composes: the event builds its own contact
  neighbor list (runtime/sim.py _cswitch_impl; per-device over the
  virtual box under the spatial drivers), so config-4 decks keep the
  kernel.
"""

from __future__ import annotations

import os

import numpy as np


def _gs_override() -> dict:
    """Optional explicit kernel page geometry from the environment:
    ``UCG_KERNEL_GS=G,S`` (e.g. ``2,32``) — the tuning knob the bench
    autotune sweep uses; invalid geometries still fail measure_spec's
    span validation and fall back to the XLA path."""
    v = os.environ.get("UCG_KERNEL_GS")
    if not v:
        return {}
    g, s = (int(t) for t in v.split(","))
    return {"G": g, "S": s}


def select_pair_kernel(params, state, cutoff: float, skin: float,
                       rel_tol: float = 1e-4, force: "bool | None" = None,
                       multichip: bool = False):
    """Returns (pair_fn, spec, params) for the fused path, or None.

    ``force=True`` skips the backend/device checks (tests); ``force=False``
    disables selection outright.  ``multichip=True`` keeps the TPU platform
    check but allows multiple devices — the caller is routing the result
    through the spatial drivers (the per-device column spec is then rebuilt
    by make_column_slab_spec/make_column_pencil_spec; the returned spec is
    the single-chip one)."""
    import jax
    import jax.numpy as jnp

    from lammps_ucg_dev_tpu.models.pair_bethe import BetheParams
    from lammps_ucg_dev_tpu.models.pair_bethe_density import (
        BetheDensityParams)
    from lammps_ucg_dev_tpu.models.pair_rleucg import RLEUCGParams
    from lammps_ucg_dev_tpu.models.pair_ucgld import UCGLDParams

    if force is False:
        return None
    if not isinstance(params, (UCGLDParams, BetheParams,
                               BetheDensityParams, RLEUCGParams)):
        return None
    if state.x.dtype != jnp.float32:
        return None
    if force is None:
        try:
            if (jax.devices()[0].platform != "tpu"
                    or (jax.device_count() != 1 and not multichip)):
                return None
        except Exception:
            return None
    if getattr(state.box, "is_triclinic", False):
        return None

    from lammps_ucg_dev_tpu.ops import chebtab, colpack
    from lammps_ucg_dev_tpu.ops import pallas_pair as pk

    n = state.x.shape[0]
    if isinstance(params, UCGLDParams):
        if not pk.supports(params, n):
            return None
        style_fn = pk.compute_style
    elif isinstance(params, BetheDensityParams):
        if not pk.supports_density(params, n):
            return None
        style_fn = pk.compute_style_density
    elif isinstance(params, RLEUCGParams):
        if not pk.supports_rleucg(params, n):
            return None
        style_fn = pk.compute_style_rleucg
    else:
        if not pk.supports_bethe(params, n):
            return None
        style_fn = pk.compute_style_bethe
    L = np.asarray(state.box.lengths, np.float64)
    lo = np.asarray(state.box.lo, np.float64)
    try:
        spec = colpack.measure_spec(
            np.mod(np.asarray(state.x, np.float64) - lo, L), L, cutoff, skin,
            **_gs_override())
    except ValueError:
        return None
    cheb = chebtab.fit_bank(params.bank)
    if float(np.max(np.asarray(cheb.max_rel_err))) >= rel_tol:
        return None
    import dataclasses

    return (style_fn, spec,
            dataclasses.replace(params, cheb=cheb, chunk=0))
