"""Core simulation-state pytrees.

TPU-first design: instead of the reference's per-atom C arrays managed by a
patched ``Atom`` class (``/root/reference/atom.h:180-192``,
``/root/reference/UCG/atom_vec_ucg.cpp:48-96``), all per-atom state lives in a
single structure-of-arrays :class:`SimState` pytree with fixed shapes, so a full
timestep (integrate → neighbor → forces → state updates) compiles to one XLA
program with no host round trips.

Per-atom UCG fields mirror the ``atom_style ucg`` field set
(``atom_vec_ucg.cpp:48-90``):

==============  ==========  ===============================================
reference        here        meaning
==============  ==========  ===============================================
``ucgstate``     ucgstate    discrete internal state (0/1)
``ucgl``         ucgl        continuous λ ∈ [0, 1]
``ucgvl``        ucgvl       λ velocity
``ucgml``        ucgml       λ pseudo-mass
``ucgp``         ucgp        posterior P(state=1); -1 sentinel = unassigned
``ucgforce``     (derived)   -dU/dλ, recomputed every step (force-like)
``ucgsoftmax-``  (derived)   per-state softmax scores, recomputed every step
``scores``
``num_ucg-``     (derived    from n_states_per_type[type]
``states``        via type)
==============  ==========  ===============================================

``ucgforce``/``ucgsoftmaxscores`` are force-like (zeroed each step by
``AtomVecUCG::force_clear``, ``atom_vec_ucg.cpp:131-135``), so here they are
*outputs* of the force pass (:class:`ForceOut`), not persistent state.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Register a dataclass as a JAX pytree with the given static fields."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


@pytree_dataclass(meta_fields=("periodic",))
class Box:
    """Simulation box: orthogonal, or restricted triclinic with LAMMPS tilt
    factors ``tilt = (xy, xz, yz)`` (cell vectors a = (lx,0,0),
    b = (xy,ly,0), c = (xz,yz,lz) — the stock-LAMMPS convention the implied
    L0 runtime supports; the UCG package itself never exercises tilt).
    Triclinic boxes are served by the ``nsq`` neighbor path; the binned cell
    list and the fused Pallas kernel require an orthogonal box."""

    lo: jax.Array  # (3,)
    hi: jax.Array  # (3,)
    tilt: "jax.Array | None" = None   # (3,) = (xy, xz, yz); None = orthogonal
    periodic: tuple = (True, True, True)

    @property
    def lengths(self) -> jax.Array:
        return self.hi - self.lo

    @property
    def is_triclinic(self) -> bool:
        return self.tilt is not None

    @property
    def h_matrix(self) -> jax.Array:
        """Upper-triangular cell matrix H with columns (a, b, c):
        x = lo + H @ s for fractional s ∈ [0, 1)³."""
        L = self.lengths
        z = jnp.zeros((), L.dtype)
        xy, xz, yz = ((self.tilt[0], self.tilt[1], self.tilt[2])
                      if self.tilt is not None else (z, z, z))
        return jnp.stack([
            jnp.stack([L[0], xy, xz]),
            jnp.stack([z, L[1], yz]),
            jnp.stack([z, z, L[2]]),
        ])

    def min_image(self, dr: jax.Array) -> jax.Array:
        """Minimum-image displacement (orthogonal, or restricted-triclinic
        via the sequential z→y→x rounds of LAMMPS ``Domain::minimum_image``
        — exact when tilts are within the LAMMPS bounds and the cutoff is
        below half the minimum perpendicular width)."""
        L = self.lengths
        per = jnp.asarray(self.periodic, dtype=dr.dtype)
        if self.tilt is None:
            return dr - per * L * jnp.round(dr / L)
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        nz = per[2] * jnp.round(dr[..., 2] / L[2])
        dx = dr[..., 0] - nz * xz
        dy = dr[..., 1] - nz * yz
        dz = dr[..., 2] - nz * L[2]
        ny = per[1] * jnp.round(dy / L[1])
        dx = dx - ny * xy
        dy = dy - ny * L[1]
        nx = per[0] * jnp.round(dx / L[0])
        dx = dx - nx * L[0]
        return jnp.stack([dx, dy, dz], axis=-1)

    def wrap(self, x: jax.Array, image: jax.Array | None = None):
        """Wrap positions into the primary cell; update image flags."""
        L = self.lengths
        per = np.asarray(self.periodic)
        if self.tilt is None:
            shift = jnp.floor((x - self.lo) / L)
            shift = jnp.where(jnp.asarray(per)[None, :], shift, 0.0)
            x_w = x - shift * L
        else:
            xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
            d = x - self.lo
            # fractional coordinates via analytic inverse of the
            # upper-triangular H
            sz = d[..., 2] / L[2]
            sy = (d[..., 1] - yz * sz) / L[1]
            sx = (d[..., 0] - xy * sy - xz * sz) / L[0]
            s = jnp.stack([sx, sy, sz], axis=-1)
            shift = jnp.floor(s)
            shift = jnp.where(jnp.asarray(per)[None, :], shift, 0.0)
            x_w = x - shift @ self.h_matrix.T
        if image is None:
            return x_w
        return x_w, image + shift.astype(image.dtype)

    @staticmethod
    def create(lo, hi, periodic=(True, True, True), dtype=jnp.float32,
               tilt=None) -> "Box":
        return Box(
            lo=jnp.asarray(lo, dtype=dtype),
            hi=jnp.asarray(hi, dtype=dtype),
            tilt=(jnp.asarray(tilt, dtype=dtype) if tilt is not None
                  else None),
            periodic=tuple(bool(p) for p in periodic),
        )


@pytree_dataclass(meta_fields=("n_total",))
class SimState:
    """Dynamic per-atom state + global counters. Shapes are fixed under jit."""

    step: jax.Array          # () int32
    x: jax.Array             # (N, 3)
    v: jax.Array             # (N, 3)
    tag: jax.Array           # (N,) int32 atom ids (stable under reordering)
    typ: jax.Array           # (N,) int32, 1-based LAMMPS "actual" types
    mol: jax.Array           # (N,) int32 molecule ids
    q: jax.Array             # (N,) charge
    image: jax.Array         # (N, 3) int32 periodic image counters
    ucgstate: jax.Array      # (N,) int32
    ucgl: jax.Array          # (N,)
    ucgvl: jax.Array         # (N,)
    ucgml: jax.Array         # (N,)
    ucgp: jax.Array          # (N,)
    key: jax.Array           # PRNG key
    box: Box
    n_total: int = 0         # global atom count when the arrays are a local
                             # view (spatial decomposition); 0 = arrays are
                             # global.  Tag-keyed RNG draws size their stream
                             # by this so noise is sharding-invariant.

    @property
    def n_atoms(self) -> int:
        return self.x.shape[0]

    @property
    def rng_n(self) -> int:
        """Length of tag-keyed per-atom random streams (= global atom count)."""
        return self.n_total or self.x.shape[0]

    def permute(self, order: jax.Array) -> "SimState":
        """Reorder atoms (e.g. by cell for memory locality). ``tag``
        preserves identity for I/O, like LAMMPS's atom tags under
        migration."""
        per_atom = ("x", "v", "tag", "typ", "mol", "q", "image", "ucgstate",
                    "ucgl", "ucgvl", "ucgml", "ucgp")
        upd = {f: jnp.take(getattr(self, f), order, axis=0) for f in per_atom}
        return dataclasses.replace(self, **upd)

    @staticmethod
    def create(
        x,
        v=None,
        typ=None,
        tag=None,
        mol=None,
        q=None,
        ucgstate=None,
        ucgl=None,
        ucgvl=None,
        ucgml=None,
        ucgp=None,
        box: Box | None = None,
        seed: int = 0,
        dtype=jnp.float32,
    ) -> "SimState":
        x = jnp.asarray(x, dtype=dtype)
        n = x.shape[0]

        def arr(a, default, dt=dtype):
            if a is None:
                return jnp.full((n,), default, dtype=dt)
            return jnp.asarray(a, dtype=dt)

        if v is None:
            v = jnp.zeros_like(x)
        else:
            v = jnp.asarray(v, dtype=dtype)
        if box is None:
            box = Box.create(jnp.min(x, 0), jnp.max(x, 0), dtype=dtype)
        if tag is None:
            tag = jnp.arange(1, n + 1, dtype=jnp.int32)
        else:
            tag = jnp.asarray(tag, jnp.int32)
        return SimState(
            step=jnp.zeros((), jnp.int32),
            x=x,
            v=v,
            tag=tag,
            typ=arr(typ, 1, jnp.int32),
            mol=arr(mol, 0, jnp.int32),
            q=arr(q, 0.0),
            image=jnp.zeros((n, 3), jnp.int32),
            # data_atom_post defaults: state clamped to {0,1}, λ to [0,1],
            # ucgp = -1 sentinel (atom_vec_ucg.cpp:145-170)
            ucgstate=jnp.clip(arr(ucgstate, 0, jnp.int32), 0, 1),
            ucgl=jnp.clip(arr(ucgl, 0.0), 0.0, 1.0),
            ucgvl=arr(ucgvl, 0.0),
            ucgml=arr(ucgml, 1.0),
            ucgp=arr(ucgp, -1.0),
            key=jax.random.PRNGKey(seed),
            box=box,
        )


@pytree_dataclass()
class ForceOut:
    """Per-step force-pass outputs (force-like quantities, cleared each step)."""

    f: jax.Array           # (N, 3) forces
    ucgforce: jax.Array    # (N,) λ-forces (-dU/dλ)
    scores: jax.Array      # (N, S) softmax scores
    pe: jax.Array          # () potential energy
    virial: jax.Array      # (6,) xx yy zz xy xz yz
    ucgp: jax.Array | None = None   # styles that update posteriors in-pass (P3)
    oob_low: jax.Array | None = None   # count of pairs below table inner cutoff
    oob_high: jax.Array | None = None  # count of pairs beyond table outer cutoff

    def __add__(self, other: "ForceOut") -> "ForceOut":
        def add_opt(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return a + b

        return ForceOut(
            f=self.f + other.f,
            ucgforce=self.ucgforce + other.ucgforce,
            scores=self.scores + other.scores,
            pe=self.pe + other.pe,
            virial=self.virial + other.virial,
            ucgp=other.ucgp if other.ucgp is not None else self.ucgp,
            oob_low=add_opt(self.oob_low, other.oob_low),
            oob_high=add_opt(self.oob_high, other.oob_high),
        )

    @staticmethod
    def zeros(n: int, n_states: int = 2, dtype=jnp.float32) -> "ForceOut":
        return ForceOut(
            f=jnp.zeros((n, 3), dtype),
            ucgforce=jnp.zeros((n,), dtype),
            scores=jnp.zeros((n, n_states), dtype),
            pe=jnp.zeros((), dtype),
            virial=jnp.zeros((6,), dtype),
        )


@dataclasses.dataclass(frozen=True)
class System:
    """Static system description (not traced)."""

    n_atoms: int
    ntypes: int
    masses: Any            # np.ndarray (ntypes+1,), index 0 unused
    units: str = "lj"
    dim: int = 3

    def mass_per_atom(self, typ: jax.Array, dtype=jnp.float32) -> jax.Array:
        return jnp.asarray(self.masses, dtype=dtype)[typ]
