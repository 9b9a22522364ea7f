"""Dump (trajectory) writer/reader with the UCG per-atom columns.

Writer mirrors the patched ``dump_custom`` (dump_custom.cpp:1672-1690,
3552-3575): columns may include ``ucgstate``, ``ucgl``, ``ucgp`` alongside the
stock id/mol/type/q/x/y/z/... set, with ``dump_modify thresh``-style row
filters.  The reference's threshold dispatch for ``ucgp`` is dead code
(its enum branch repeats UCGSTATE, dump_custom.cpp:1199-1204 — catalogued
deviation); here all three UCG attributes threshold correctly.

Reader mirrors the patched ``read_dump``/``reader_native``
(read_dump.cpp:823-909, reader_native.cpp:423-433): snapshots are matched by
atom id and can re-ingest ``ucgstate/ucgl/ucgp`` for rerun-style state
assignment.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_OPS = {
    "<": np.less, "<=": np.less_equal, ">": np.greater,
    ">=": np.greater_equal, "==": np.equal, "!=": np.not_equal,
}

_UCG_COLS = {"ucgstate", "ucgl", "ucgp", "ucgvl", "ucgml"}


def _column(state, name, ids):
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    n = x.shape[0]
    cols = {
        "id": np.asarray(state.tag),
        "mol": np.asarray(state.mol),
        "type": np.asarray(state.typ),
        "q": np.asarray(state.q),
        "x": x[:, 0], "y": x[:, 1], "z": x[:, 2],
        "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
        "ix": np.asarray(state.image)[:, 0],
        "iy": np.asarray(state.image)[:, 1],
        "iz": np.asarray(state.image)[:, 2],
        "ucgstate": np.asarray(state.ucgstate),
        "ucgl": np.asarray(state.ucgl),
        "ucgp": np.asarray(state.ucgp),
        "ucgvl": np.asarray(state.ucgvl),
        "ucgml": np.asarray(state.ucgml),
    }
    if name not in cols:
        raise ValueError(f"unknown dump column {name!r}")
    return cols[name]


@dataclasses.dataclass
class DumpWriter:
    """lammpstrj-format custom dump with optional row thresholds."""

    path: str
    columns: tuple = ("id", "mol", "type", "x", "y", "z",
                      "ucgstate", "ucgl", "ucgp")
    thresholds: list = dataclasses.field(default_factory=list)
    append: bool = False

    def __post_init__(self):
        if not self.append:
            open(self.path, "w").close()

    def modify_thresh(self, attr: str, op: str, value: float):
        """dump_modify thresh <attr> <op> <value> (dump_custom.cpp:2150-2155)."""
        if op not in _OPS:
            raise ValueError(f"unknown threshold operator {op!r}")
        self.thresholds.append((attr, op, float(value)))

    def write(self, state, step: int | None = None):
        from lammps_ucg_dev_tpu.runtime import native

        n = np.asarray(state.x).shape[0]
        ids = np.arange(1, n + 1)
        keep = np.ones(n, dtype=bool)
        for attr, op, val in self.thresholds:
            keep &= _OPS[op](_column(state, attr, ids), val)
        lo = np.asarray(state.box.lo)
        hi = np.asarray(state.box.hi)
        per = state.box.periodic
        step = int(state.step) if step is None else step
        cols = [_column(state, c, ids)[keep] for c in self.columns]
        bflags = " ".join("pp" if p else "ff" for p in per)

        int_cols = {"id", "mol", "type", "ix", "iy", "iz", "ucgstate"}
        int_mask = [1 if c in int_cols else 0 for c in self.columns]
        ok = native.write_dump_frame(
            self.path, append=True, step=step, box_lo=lo, box_hi=hi,
            bounds=bflags, header=" ".join(self.columns),
            cols=[np.asarray(c, np.float64) for c in cols],
            int_mask=int_mask)
        if ok:
            return

        with open(self.path, "a") as fh:
            fh.write("ITEM: TIMESTEP\n%d\n" % step)
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % int(keep.sum()))
            fh.write(f"ITEM: BOX BOUNDS {bflags}\n")
            for d in range(3):
                fh.write(f"{lo[d]:.15g} {hi[d]:.15g}\n")
            fh.write("ITEM: ATOMS " + " ".join(self.columns) + "\n")
            for row in zip(*cols):
                fh.write(" ".join(
                    str(int(v)) if isinstance(v, (np.integer,)) else f"{v:.9g}"
                    for v in row) + "\n")


@dataclasses.dataclass
class Snapshot:
    step: int
    n_atoms: int
    box_lo: np.ndarray
    box_hi: np.ndarray
    fields: dict      # column name -> array (file row order)

    def by_id(self, name: str, n_total: int, default=0.0):
        """Scatter a column into id-indexed order (read_dump matching)."""
        out = np.full(n_total, default, dtype=float)
        ids = self.fields["id"].astype(int)
        out[ids - 1] = self.fields[name]
        return out


def read_dump(path: str):
    """Parse all snapshots of a lammpstrj file."""
    snaps = []
    with open(path) as fh:
        lines = fh.readlines()
    i = 0
    while i < len(lines):
        if not lines[i].startswith("ITEM: TIMESTEP"):
            i += 1
            continue
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        lo = np.zeros(3)
        hi = np.zeros(3)
        for d in range(3):
            toks = lines[i + 5 + d].split()
            lo[d], hi[d] = float(toks[0]), float(toks[1])
        header = lines[i + 8].split()[2:]
        rows = np.asarray(
            [[float(v) for v in lines[i + 9 + k].split()] for k in range(n)])
        fields = {name: rows[:, c] if n else np.zeros(0)
                  for c, name in enumerate(header)}
        snaps.append(Snapshot(step, n, lo, hi, fields))
        i += 9 + n
    return snaps


def apply_snapshot(state, snap: Snapshot, fields=("x", "y", "z"),
                   wrapped: bool = True):
    """read_dump/rerun semantics: overwrite state arrays from a snapshot,
    matching atoms by id (read_dump.cpp:823-909).  ``fields`` may include
    x/y/z, vx/vy/vz, ucgstate/ucgl/ucgp."""
    import jax.numpy as jnp

    n = state.n_atoms
    upd = {}
    get = lambda f: snap.by_id(f, n)
    if any(f in fields for f in ("x", "y", "z")):
        x = np.asarray(state.x).copy()
        for d, f in enumerate(("x", "y", "z")):
            if f in fields:
                x[:, d] = get(f)
        upd["x"] = jnp.asarray(x, state.x.dtype)
    if any(f in fields for f in ("vx", "vy", "vz")):
        v = np.asarray(state.v).copy()
        for d, f in enumerate(("vx", "vy", "vz")):
            if f in fields:
                v[:, d] = get(f)
        upd["v"] = jnp.asarray(v, state.v.dtype)
    for f in ("ucgl", "ucgp", "ucgvl", "ucgml"):
        if f in fields:
            upd[f] = jnp.asarray(get(f), state.ucgl.dtype)
    if "ucgstate" in fields:
        upd["ucgstate"] = jnp.asarray(get("ucgstate").astype(int),
                                      state.ucgstate.dtype)
    if "type" in fields:
        upd["typ"] = jnp.asarray(get("type").astype(int), state.typ.dtype)
    return dataclasses.replace(state, **upd)
