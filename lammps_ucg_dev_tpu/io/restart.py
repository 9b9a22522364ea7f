"""Binary checkpoint/restart.

The reference's restart persists the per-atom UCG fields
{ucgstate, ucgl, ucgml, ucgvl, ucgp} with the atom style
(atom_vec_ucg.cpp:85) and only the pair-style SETTINGS (tables must be
re-declared after restart, pair_table_ucgld.cpp:1431-1471).  Here a restart
file is a single .npz capturing the full SimState (positions, velocities,
types, molecules, charges, images, all UCG fields, RNG key, step, box) plus
optional fix state (cluster-switch statistics).  Like the reference we also
persist the pair-style SETTINGS (style name, tabstyle, tablength) and
per-type masses; the continuation deck must re-declare ``pair_coeff`` (the
tables themselves), and a re-declared ``pair_style`` is cross-checked
against the stored settings on read (write_restart/read_restart_settings,
pair_table_ucgld.cpp:1431-1471).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import Box, SimState

_VERSION = 1


def write_restart(path: str, state: SimState, extra: dict | None = None,
                  settings: dict | None = None) -> None:
    """``settings`` is a flat dict of scalars/strings/1-D arrays describing
    the non-atom configuration (pair style + tabstyle + tablength, units,
    per-type masses) — the analogue of the reference's
    ``PairTable_UCGLD::write_restart_settings``."""
    arrays = {
        "version": np.asarray(_VERSION),
        "step": np.asarray(state.step),
        "x": np.asarray(state.x),
        "v": np.asarray(state.v),
        "tag": np.asarray(state.tag),
        "typ": np.asarray(state.typ),
        "mol": np.asarray(state.mol),
        "q": np.asarray(state.q),
        "image": np.asarray(state.image),
        "ucgstate": np.asarray(state.ucgstate),
        "ucgl": np.asarray(state.ucgl),
        "ucgvl": np.asarray(state.ucgvl),
        "ucgml": np.asarray(state.ucgml),
        "ucgp": np.asarray(state.ucgp),
        "key": np.asarray(state.key),
        "box_lo": np.asarray(state.box.lo),
        "box_hi": np.asarray(state.box.hi),
        "box_periodic": np.asarray(state.box.periodic),
        "box_tilt": (np.asarray(state.box.tilt)
                     if state.box.tilt is not None else np.zeros(0)),
    }
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    for k, v in (settings or {}).items():
        arrays[f"setting_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def read_restart(path: str, dtype=jnp.float32):
    """Returns (SimState, extra_dict)."""
    state, extra, _ = read_restart_all(path, dtype)
    return state, extra


def read_restart_all(path: str, dtype=jnp.float32):
    """Returns (SimState, extra_dict, settings_dict) from ONE archive read
    (large restarts decompress the full per-atom state; loading twice to
    split state from settings would double that cost)."""
    z = np.load(path, allow_pickle=False)
    if int(z["version"]) != _VERSION:
        raise ValueError(f"unsupported restart version {int(z['version'])}")
    tilt = None
    if "box_tilt" in z.files and z["box_tilt"].size == 3:
        tilt = jnp.asarray(z["box_tilt"], dtype)
    box = Box(
        lo=jnp.asarray(z["box_lo"], dtype),
        hi=jnp.asarray(z["box_hi"], dtype),
        tilt=tilt,
        periodic=tuple(bool(p) for p in z["box_periodic"]),
    )
    state = SimState(
        step=jnp.asarray(z["step"], jnp.int32),
        x=jnp.asarray(z["x"], dtype),
        v=jnp.asarray(z["v"], dtype),
        tag=(jnp.asarray(z["tag"], jnp.int32) if "tag" in z.files
             else jnp.arange(1, z["x"].shape[0] + 1, dtype=jnp.int32)),
        typ=jnp.asarray(z["typ"], jnp.int32),
        mol=jnp.asarray(z["mol"], jnp.int32),
        q=jnp.asarray(z["q"], dtype),
        image=jnp.asarray(z["image"], jnp.int32),
        ucgstate=jnp.asarray(z["ucgstate"], jnp.int32),
        ucgl=jnp.asarray(z["ucgl"], dtype),
        ucgvl=jnp.asarray(z["ucgvl"], dtype),
        ucgml=jnp.asarray(z["ucgml"], dtype),
        ucgp=jnp.asarray(z["ucgp"], dtype),
        key=jnp.asarray(z["key"]),
        box=box,
    )
    extra = {k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")}
    return state, extra, _settings_from(z)


def read_restart_settings(path: str) -> dict:
    """The ``settings`` dict stored by :func:`write_restart` (empty for
    restarts written before settings persistence).  String-valued settings
    come back as Python str, 0-d numerics as Python scalars."""
    return _settings_from(np.load(path, allow_pickle=False))


def _settings_from(z) -> dict:
    out = {}
    for k in z.files:
        if not k.startswith("setting_"):
            continue
        v = z[k]
        if v.dtype.kind in "US":
            out[k[len("setting_"):]] = str(v)
        elif v.ndim == 0:
            out[k[len("setting_"):]] = v.item()
        else:
            out[k[len("setting_"):]] = v
    return out
