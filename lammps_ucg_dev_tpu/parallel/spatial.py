"""Spatial slab decomposition with explicit halo exchange — the TPU-native
equivalent of LAMMPS's MPI domain decomposition (SURVEY.md §2.3).

Reference model being matched (not translated):

* every rank owns the atoms in a spatial subdomain and a layer of *ghost*
  images of neighbor-rank atoms within the cutoff
  (``/root/reference/UCG/atom_vec_ucg.cpp:66-73``: border/forward fields
  ``ucgstate, num_ucgstates, ucgl, ucgp``);
* forward (halo) comm refreshes ghost positions + UCG state every step;
* exchange (migration) comm moves atoms that left the subdomain at
  reneighbor cadence (``atom_vec_ucg.cpp:76-82``);
* reverse comm of pair tallies is ELIMINATED here by the full-list /
  newton-off formulation (each atom owns its force, λ-force and score sums),
  exactly as on a single chip.

TPU-native formulation: the box is cut into ``D`` x-slabs, one per device of
a 1-D ``jax.sharding.Mesh`` — or, with :func:`make_pencil_spec`, into
``Dx × Dy`` x-y pencils on a 2-D mesh (the LAMMPS 3-D processor brick minus
z: halo, refresh, and migration stage x first, then y, with y buffers
sourced from owned + x-ghost rows so corners ride the y stage — the
standard dimension-by-dimension protocol of comm_brick.cpp).  The whole
multi-block run is ONE ``shard_map`` program.  Each device holds
fixed-capacity arrays

    rows [0, cap_local)            owned atoms ([0, nloc) valid)
    rows [cap_local, +cap_halo)    ghost images from the LEFT neighbor
    rows [.., +cap_halo)           ghost images from the RIGHT neighbor
    rows [.., +2*cap_halo_y)       DOWN/UP y-ghosts (pencils only)

Halo exchange is a pair of ``lax.ppermute`` ring shifts over the mesh axis
(rides ICI): at reneighbor, fixed-capacity buffers of (x, λ, state, p, type,
tag) establish the ghost layer; every step, a 6-feature refresh
(x, λ, state, p) updates it.  Ghost x is stored SHIFTED (±Lx across the
periodic seam) so pair displacements never wrap in x; the virtual pair box is
non-periodic in x.  Migration packs leavers into ±1 capacity-bounded buffers,
ring-shifts them, and compacts survivors+arrivals — per-step comm volume is
surface-area × halo fields, not O(N) (contrast parallel/domain.py's
atom-decomposition all-gathers, kept as the general fallback).

Requirements: >= 3 cuts per decomposed axis, subdomain width >= cutoff +
skin (so ±1 neighbors suffice), per-atom-owned pair styles (all four UCG
styles qualify).
Capacity overflows, >1-slab hops, and dangerous builds are surfaced as
flags, like the single-chip driver's neighbor overflow.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lammps_ucg_dev_tpu.core.state import Box, ForceOut, SimState
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.ops import colpack
from lammps_ucg_dev_tpu.ops import neighbor as nbrmod
from lammps_ucg_dev_tpu.runtime.sim import Simulation

# packed per-atom feature layout for migration (24 columns)
_MIG_F = ("x0", "x1", "x2", "v0", "v1", "v2", "i0", "i1", "i2", "tag", "typ",
          "mol", "q", "ucgstate", "ucgl", "ucgvl", "ucgml", "ucgp",
          "f0", "f1", "f2", "ucgforce", "s0", "s1")
_NMIG = len(_MIG_F)
# halo establishment features (9) and per-step refresh features (6)
_NHALO = 9          # x3, ucgl, ucgstate, ucgp, typ, tag, mol
_NREF = 6           # x3, ucgl, ucgstate, ucgp


def _r8(v: float) -> int:
    return int(-(-v // 8) * 8)


@dataclasses.dataclass(frozen=True)
class SlabSpec:
    """Static decomposition geometry + local neighbor configuration.

    1-D (default): ``n_devices`` x-slabs.  2-D pencils (``n_dev_y > 1``):
    the box is also cut along y — the LAMMPS 3-D processor brick minus z
    (comm_brick.cpp's staged dimension-by-dimension exchange): halo and
    migration run x first, then y, with the y buffers sourced from
    owned + x-ghost rows so corner regions ride the y stage."""

    n_devices: int               # cuts along x
    cap_local: int
    cap_halo: int                # per x-face
    cap_mig: int                 # per x-direction send buffer
    nbr: nbrmod.NeighborSpec     # local builder over pencil + halo layers
    axis: str = "slabs"
    n_dev_y: int = 1             # cuts along y (1 = slab decomposition)
    cap_halo_y: int = 0          # per y-face (sources include x-ghosts)
    cap_mig_y: int = 0
    axis_y: str = "peny"

    @property
    def cap_tot(self) -> int:
        return self.cap_local + 2 * self.cap_halo + 2 * self.cap_halo_y

    @property
    def rc(self) -> float:
        return self.nbr.rc

    @property
    def is_2d(self) -> bool:
        return self.n_dev_y > 1

    @property
    def axes(self):
        """Mesh axis name(s) of the decomposition (psum/pmin target)."""
        return (self.axis, self.axis_y) if self.is_2d else self.axis

    @property
    def n_dev_total(self) -> int:
        return self.n_devices * self.n_dev_y


def make_slab_spec(n_atoms: int, box_lengths, cutoff: float, skin: float,
                   n_devices: int, cap_local: int | None = None,
                   cap_halo: int | None = None, cap_mig: int | None = None,
                   nbr_method: str | None = None, x=None,
                   nbr_capacity: int | None = None) -> SlabSpec:
    """Size slab/halo/migration capacities from mean density, or — when the
    setup positions ``x`` are given — from the measured slab/halo occupancies
    plus drift margins (robust to structured/lattice configurations that
    alias with the slab grid).  Overflow flags are the runtime backstop."""
    L = np.asarray(box_lengths, np.float64)
    D = int(n_devices)
    rc = cutoff + skin
    if D < 3:
        raise ValueError(f"spatial decomposition needs >= 3 slabs (got {D}); "
                         "use parallel.domain atom decomposition instead")
    slab_w = L[0] / D
    if slab_w < rc:
        raise ValueError(
            f"slab width {slab_w:.3f} < cutoff+skin {rc:.3f}: ±1-neighbor "
            f"halos are insufficient; use fewer devices or a bigger box")
    mean = n_atoms / D
    sig = math.sqrt(max(mean, 1.0))
    if x is not None:
        xn = np.mod(np.asarray(x, np.float64)[:, 0], L[0])
        s = np.clip((xn / L[0] * D).astype(np.int64), 0, D - 1)
        counts = np.bincount(s, minlength=D)
        if cap_local is None:
            cap_local = _r8(counts.max() + 2.0 * sig + 16)
        if cap_halo is None:
            off = xn - s * slab_w            # position within own slab
            near = max(np.bincount(s[off < rc], minlength=D).max(),
                       np.bincount(s[off >= slab_w - rc], minlength=D).max())
            cap_halo = _r8(near + 2.0 * math.sqrt(max(near, 1.0)) + 16)
    if cap_local is None:
        cap_local = _r8(mean + 6.0 * sig + 16)
    if cap_halo is None:
        mean_h = mean * rc / slab_w
        cap_halo = _r8(mean_h + 6.0 * math.sqrt(max(mean_h, 1.0)) + 16)
    if cap_mig is None:
        # atoms within skin of a face may cross between reneighbors
        mean_m = mean * max(skin, 0.1 * rc) / slab_w
        cap_mig = _r8(mean_m + 6.0 * math.sqrt(max(mean_m, 1.0)) + 16)
    cap_tot = cap_local + 2 * cap_halo
    virt_L = [slab_w + 2 * rc, L[1], L[2]]
    # nbr_capacity: per-atom neighbor-list capacity override (the deck's
    # ``neigh_modify one N``) for configurations whose LOCAL coordination
    # exceeds the mean-density estimate (bonded molecules, clusters)
    nbr = nbrmod.make_spec(cap_tot, virt_L, cutoff, skin, method=nbr_method,
                           capacity=nbr_capacity)
    return SlabSpec(n_devices=D, cap_local=int(cap_local),
                    cap_halo=int(cap_halo), cap_mig=int(cap_mig), nbr=nbr)


def make_column_slab_spec(n_atoms: int, box_lengths, cutoff: float,
                          skin: float, n_devices: int, x,
                          **caps) -> SlabSpec:
    """SlabSpec whose local pair structure is the fused-kernel ColumnSpec
    (ops/colpack.py) over the slab's non-periodic-x virtual box — the
    composition of the production Pallas kernel with the slab
    decomposition.  One STATIC spec serves every device (shard_map runs one
    program): each slab's local+halo population is measured in the virtual
    frame and the union sizes the columns.  ``x`` (global setup positions)
    is required — static capacity sizing needs the actual configuration."""
    base = make_slab_spec(n_atoms, box_lengths, cutoff, skin, n_devices,
                          x=x, **caps)
    L = np.asarray(box_lengths, np.float64)
    D = int(n_devices)
    rc = cutoff + skin
    eps = 1e-3 * rc                  # matches SpatialSimulation._virtual_boxes
    w = L[0] / D
    Lxv = w + 2 * rc + 2 * eps
    xn = np.asarray(x, np.float64)
    configs = []
    for d in range(D):
        lo_d = d * w - rc - eps
        xg = np.mod(xn[:, 0] - lo_d, L[0])
        sel = xg < Lxv
        configs.append(np.stack(
            [xg[sel], np.mod(xn[sel, 1], L[1]), np.mod(xn[sel, 2], L[2])],
            axis=1))
    col = colpack.measure_spec(configs, [Lxv, L[1], L[2]], cutoff, skin,
                               periodic_x=False)
    return dataclasses.replace(base, nbr=col)


def make_pencil_spec(n_atoms: int, box_lengths, cutoff: float, skin: float,
                     n_dev_x: int, n_dev_y: int, x=None,
                     cap_local: int | None = None,
                     cap_halo: int | None = None,
                     cap_halo_y: int | None = None,
                     cap_mig: int | None = None,
                     cap_mig_y: int | None = None,
                     nbr_method: str | None = None,
                     nbr_capacity: int | None = None) -> SlabSpec:
    """2-D pencil decomposition: the box is cut Dx × Dy in x and y (the
    reference inherits LAMMPS's 3-D processor bricks; pencils lift the
    slab path's device cap from ⌊Lx/rc⌋ to ⌊Lx/rc⌋·⌊Ly/rc⌋ and shrink
    per-face halo volume from a box cross-section to a strip).  Capacities
    measured from ``x`` when given (with drift margins), else from mean
    density; runtime overflow flags are the backstop."""
    L = np.asarray(box_lengths, np.float64)
    Dx, Dy = int(n_dev_x), int(n_dev_y)
    rc = cutoff + skin
    if Dx < 3 or Dy < 3:
        raise ValueError(f"pencil decomposition needs >= 3 cuts per axis "
                         f"(got {Dx}x{Dy}); use slabs or parallel.domain")
    wx, wy = L[0] / Dx, L[1] / Dy
    if wx < rc or wy < rc:
        raise ValueError(
            f"pencil widths ({wx:.3f}, {wy:.3f}) < cutoff+skin {rc:.3f}: "
            f"±1-neighbor halos are insufficient; use fewer devices")
    ntot = Dx * Dy
    mean = n_atoms / ntot
    sig = math.sqrt(max(mean, 1.0))
    if x is not None:
        xn = np.asarray(x, np.float64)
        px = np.mod(xn[:, 0], L[0])
        py = np.mod(xn[:, 1], L[1])
        sx = np.clip((px / L[0] * Dx).astype(np.int64), 0, Dx - 1)
        sy = np.clip((py / L[1] * Dy).astype(np.int64), 0, Dy - 1)
        d = sx * Dy + sy
        counts = np.bincount(d, minlength=ntot)
        if cap_local is None:
            cap_local = _r8(counts.max() + 2.0 * sig + 16)
        if cap_halo is None:
            offx = px - sx * wx
            near = max(np.bincount(d[offx < rc], minlength=ntot).max(),
                       np.bincount(d[offx >= wx - rc], minlength=ntot).max())
            cap_halo = _r8(near + 2.0 * math.sqrt(max(near, 1.0)) + 16)
        if cap_halo_y is None:
            # per receiving pencil (i, j): senders are (i, j∓1); sources are
            # their owned + x-ghost rows, i.e. atoms with x in column i's
            # rc-extended range and y within rc of the shared face
            need = 0
            for i in range(Dx):
                xg = np.mod(px - (i * wx - rc), L[0])
                in_strip = xg < wx + 2 * rc
                ys = py[in_strip]
                offy = ys - np.floor(ys / wy) * wy
                cnt = np.bincount(
                    np.clip((ys / wy).astype(np.int64), 0, Dy - 1)[offy < rc],
                    minlength=Dy)
                cnt2 = np.bincount(
                    np.clip((ys / wy).astype(np.int64), 0,
                            Dy - 1)[offy >= wy - rc], minlength=Dy)
                need = max(need, int(cnt.max()), int(cnt2.max()))
            cap_halo_y = _r8(need + 2.0 * math.sqrt(max(need, 1.0)) + 16)
    if cap_local is None:
        cap_local = _r8(mean + 6.0 * sig + 16)
    if cap_halo is None:
        mean_h = mean * rc / wx
        cap_halo = _r8(mean_h + 6.0 * math.sqrt(max(mean_h, 1.0)) + 16)
    if cap_halo_y is None:
        mean_hy = mean * (wx + 2 * rc) / wx * rc / wy
        cap_halo_y = _r8(mean_hy + 6.0 * math.sqrt(max(mean_hy, 1.0)) + 16)
    if cap_mig is None:
        mean_m = mean * max(skin, 0.1 * rc) / wx
        cap_mig = _r8(mean_m + 6.0 * math.sqrt(max(mean_m, 1.0)) + 16)
    if cap_mig_y is None:
        mean_m = mean * max(skin, 0.1 * rc) / wy
        cap_mig_y = _r8(mean_m + 6.0 * math.sqrt(max(mean_m, 1.0)) + 16)
    cap_tot = (int(cap_local) + 2 * int(cap_halo) + 2 * int(cap_halo_y))
    virt_L = [wx + 2 * rc, wy + 2 * rc, L[2]]
    nbr = nbrmod.make_spec(cap_tot, virt_L, cutoff, skin, method=nbr_method,
                           capacity=nbr_capacity)
    return SlabSpec(n_devices=Dx, cap_local=int(cap_local),
                    cap_halo=int(cap_halo), cap_mig=int(cap_mig), nbr=nbr,
                    n_dev_y=Dy, cap_halo_y=int(cap_halo_y),
                    cap_mig_y=int(cap_mig_y))


def make_column_pencil_spec(n_atoms: int, box_lengths, cutoff: float,
                            skin: float, n_dev_x: int, n_dev_y: int, x,
                            **caps) -> SlabSpec:
    """Pencil SlabSpec whose local pair structure is the fused-kernel
    ColumnSpec over the pencil's non-periodic-x/y virtual box (the 2-D
    analogue of :func:`make_column_slab_spec`): one static spec sized from
    the union of every pencil's local+halo population."""
    base = make_pencil_spec(n_atoms, box_lengths, cutoff, skin, n_dev_x,
                            n_dev_y, x=x, **caps)
    L = np.asarray(box_lengths, np.float64)
    Dx, Dy = int(n_dev_x), int(n_dev_y)
    rc = cutoff + skin
    eps = 1e-3 * rc                  # matches SpatialSimulation._virtual_boxes
    wx, wy = L[0] / Dx, L[1] / Dy
    Lxv = wx + 2 * rc + 2 * eps
    Lyv = wy + 2 * rc + 2 * eps
    xn = np.asarray(x, np.float64)
    configs = []
    for i in range(Dx):
        xg = np.mod(xn[:, 0] - (i * wx - rc - eps), L[0])
        for j in range(Dy):
            yg = np.mod(xn[:, 1] - (j * wy - rc - eps), L[1])
            sel = (xg < Lxv) & (yg < Lyv)
            configs.append(np.stack(
                [xg[sel], yg[sel], np.mod(xn[sel, 2], L[2])], axis=1))
    col = colpack.measure_spec(configs, [Lxv, Lyv, L[2]], cutoff, skin,
                               periodic_x=False, periodic_y=False)
    return dataclasses.replace(base, nbr=col)


def make_mesh(n_devices: int, axis: str = "slabs", n_dev_y: int = 1,
              axis_y: str = "peny") -> Mesh:
    devs = jax.devices()
    ntot = n_devices * n_dev_y
    if len(devs) < ntot:
        raise ValueError(
            f"requested {ntot} devices but only {len(devs)} present")
    if n_dev_y == 1:
        return Mesh(np.asarray(devs[:ntot]), (axis,))
    return Mesh(np.asarray(devs[:ntot]).reshape(n_devices, n_dev_y),
                (axis, axis_y))


# ---- packing helpers (run per device, inside shard_map) --------------------

def _pack_mig(sim: SimState, fout: ForceOut) -> jax.Array:
    cols = [sim.x[:, 0], sim.x[:, 1], sim.x[:, 2],
            sim.v[:, 0], sim.v[:, 1], sim.v[:, 2],
            sim.image[:, 0], sim.image[:, 1], sim.image[:, 2],
            sim.tag, sim.typ, sim.mol, sim.q,
            sim.ucgstate, sim.ucgl, sim.ucgvl, sim.ucgml, sim.ucgp,
            fout.f[:, 0], fout.f[:, 1], fout.f[:, 2], fout.ucgforce,
            fout.scores[:, 0], fout.scores[:, 1]]
    dt = sim.x.dtype
    return jnp.stack([c.astype(dt) for c in cols], axis=1)


def _unpack_mig(F: jax.Array, sim: SimState, fout: ForceOut):
    dt = sim.x.dtype
    it = jnp.int32
    new_sim = dataclasses.replace(
        sim,
        x=F[:, 0:3].astype(dt), v=F[:, 3:6].astype(dt),
        image=jnp.round(F[:, 6:9]).astype(it),
        tag=jnp.round(F[:, 9]).astype(it),
        typ=jnp.round(F[:, 10]).astype(it),
        mol=jnp.round(F[:, 11]).astype(it), q=F[:, 12].astype(dt),
        ucgstate=jnp.round(F[:, 13]).astype(it),
        ucgl=F[:, 14].astype(dt), ucgvl=F[:, 15].astype(dt),
        ucgml=F[:, 16].astype(dt), ucgp=F[:, 17].astype(dt))
    new_fout = dataclasses.replace(
        fout, f=F[:, 18:21].astype(dt), ucgforce=F[:, 21].astype(dt),
        scores=F[:, 22:24].astype(dt))
    return new_sim, new_fout


def _take_first(mask: jax.Array, cap: int) -> jax.Array:
    """Indices of the first ``cap`` True rows (original order), then junk."""
    return jnp.argsort(~mask, stable=True).astype(jnp.int32)[:cap]


class SpatialSimulation(Simulation):
    """Slab/pencil-decomposed driver with the single-chip Simulation's
    physics stack (same pair styles incl. the fused Pallas column kernel,
    same fix ordering via ``_forces``, same thermo), plus distributed
    cluster_switch (pmin label propagation over the mesh axes).

    Bonded terms + special exclusions compose: topology is REPLICATED
    (static tag tables on every device) and a per-block tag→row map gives
    each device the local rows of its terms' members — members of a term
    with an owned atom are always present (owned or halo; bond lengths <
    halo width, violations flagged as overflow).  Exclusions go list-side
    on the XLA pair path (the single-chip mechanism) and compute-and-
    subtract via the style's ``excl_delta`` on the column-kernel path.
    2-level r-RESPA runs too: the bonded inner level refreshes owner x
    into ghosts before every fast-force evaluation (ghost rows carry no
    velocities, so their drifted positions are otherwise stale).

    Not supported on this path (use Simulation + parallel.domain):
    sort_atoms, extra_post_force.
    """

    def __init__(self, system, state: SimState, pair_compute, pair_params,
                 slab: SlabSpec, cfg, mesh: Mesh | None = None,
                 cluster_switch: "tuple | None" = None,
                 log_dir: str | None = None, bonded=None, excl_tags=None):
        if cfg.sort_atoms:
            cfg = dataclasses.replace(cfg, sort_atoms=False)
        if cfg.respa_inner != 1 and bonded is None:
            raise ValueError("respa_inner > 1 requires bonded terms "
                             "(the fast level)")
        super().__init__(system, state, pair_compute, pair_params,
                         slab.nbr, cfg, cluster_switch=cluster_switch,
                         log_dir=log_dir, bonded=bonded, excl_tags=excl_tags)
        # exclusion row maps are per-device and per-block here (rows permute
        # under migration) — _block_dev rebuilds them from tags; the static
        # global-state map super() computed must never be used
        self._excl_rows_static = None
        if cluster_switch is not None and self._is_column:
            # The kernel path has no atom-neighbor list to reuse, so the
            # event builds its own per-device CONTACT list over the virtual
            # box (the spatial analogue of the single-chip column path's
            # _cs_spec; the reference reuses the pair half-list,
            # fix_cluster_switch.cpp:537-560).  Rebuild the spec with the
            # slab/pencil virtual-box geometry — super().__init__ sized it
            # for the global box.
            params_cs, _ = cluster_switch
            cut_cs = float(np.sqrt(float(params_cs.cutsq)))
            rc = slab.rc
            if cut_cs > rc:
                raise ValueError(
                    f"cluster_switch contact cutoff {cut_cs:.3f} exceeds "
                    f"the halo width (cutoff+skin = {rc:.3f}); cross-face "
                    "contacts would be invisible to the decomposition")
            L = np.asarray(state.box.lengths, np.float64)
            virt = [L[0] / slab.n_devices + 2 * rc, L[1], L[2]]
            if slab.is_2d:
                virt[1] = L[1] / slab.n_dev_y + 2 * rc
            self._cs_spec = nbrmod.make_spec(slab.cap_tot, virt, cut_cs,
                                             0.0, method="cell")
        self.slab = slab
        self.mesh = mesh if mesh is not None else make_mesh(
            slab.n_devices, slab.axis, slab.n_dev_y, slab.axis_y)
        self.n_global = state.n_atoms
        self._migrations = 0
        self._dist(state)

    # ---- host-side distribution / gathering -------------------------------

    def _defaults(self, d: int, n_rows: int, dtype):
        """Padding-row defaults: parked at subdomain d's center, inert but
        finite."""
        box = self._host_box
        lo = np.asarray(box["lo"], np.float64)
        L = np.asarray(box["L"], np.float64)
        sl = self.slab
        i, j = divmod(d, sl.n_dev_y)
        wx = L[0] / sl.n_devices
        wy = L[1] / sl.n_dev_y
        F = np.zeros((n_rows, _NMIG))
        F[:, 0] = lo[0] + (i + 0.5) * wx
        F[:, 1] = lo[1] + (j + 0.5) * wy
        F[:, 2] = lo[2] + 0.5 * L[2]
        F[:, 9] = 1      # tag (clipped RNG take; results discarded)
        F[:, 10] = 1     # typ (mass lookup stays finite)
        F[:, 16] = 1.0   # ucgml
        return F

    def _dist(self, state: SimState):
        """Sort atoms into subdomains, pad to capacity, shard (D*cap_tot)
        rows over the mesh axes."""
        sl = self.slab
        D, cap_tot = sl.n_dev_total, sl.cap_tot
        xw = np.asarray(state.box.wrap(state.x))
        lo = np.asarray(state.box.lo, np.float64)
        L = np.asarray(state.box.lengths, np.float64)
        self._host_box = {"lo": lo, "L": L}
        sx = np.clip((xw[:, 0] - lo[0]) / L[0] * sl.n_devices, 0,
                     sl.n_devices - 1).astype(np.int64)
        s = sx * sl.n_dev_y + np.clip(
            (xw[:, 1] - lo[1]) / L[1] * sl.n_dev_y, 0,
            sl.n_dev_y - 1).astype(np.int64)

        fz = ForceOut.zeros(self.n_global, dtype=state.x.dtype)
        Fall = np.asarray(_pack_mig(dataclasses.replace(state, x=jnp.asarray(xw)),
                                    fz))
        nloc = np.zeros((D,), np.int32)
        blocks = np.zeros((D, cap_tot, _NMIG))
        for d in range(D):
            rows = Fall[s == d]
            if rows.shape[0] > sl.cap_local:
                raise ValueError(
                    f"slab {d} holds {rows.shape[0]} atoms > cap_local "
                    f"{sl.cap_local}; raise cap_local")
            blocks[d] = self._defaults(d, cap_tot, state.x.dtype)
            blocks[d, :rows.shape[0]] = rows
            nloc[d] = rows.shape[0]

        mesh = self.mesh
        row_sh = NamedSharding(mesh, P(sl.axes))
        repl = NamedSharding(mesh, P())
        dt = state.x.dtype
        self._F = jax.device_put(
            jnp.asarray(blocks.reshape(D * cap_tot, _NMIG), dt), row_sh)
        self._nloc = jax.device_put(jnp.asarray(nloc), row_sh)
        self._key = jax.device_put(state.key, repl)
        self._step = jax.device_put(state.step, repl)
        self._pe = jax.device_put(jnp.zeros((), dt), repl)
        self._virial = jax.device_put(jnp.zeros((6,), dt), repl)
        self.pair_params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, repl), self.pair_params)
        self._fused_cache = None
        self._setup_done = False
        self.dangerous_builds = 0

    def gather(self):
        """(SimState, ForceOut) with the N global atoms in tag order."""
        sl = self.slab
        D, cap_tot = sl.n_dev_total, sl.cap_tot
        F = np.asarray(self._F).reshape(D, cap_tot, _NMIG)
        nloc = np.asarray(self._nloc)
        rows = np.concatenate([F[d, :nloc[d]] for d in range(D)], axis=0)
        assert rows.shape[0] == self.n_global, (rows.shape, self.n_global)
        order = np.argsort(np.round(rows[:, 9]).astype(np.int64))
        rows = rows[order]
        dt = self.state.x.dtype
        proto = dataclasses.replace(
            self.state, key=self._key, step=self._step,
            x=jnp.zeros((self.n_global, 3), dt))
        fz = ForceOut.zeros(self.n_global, dtype=dt)
        sim, fout = _unpack_mig(jnp.asarray(rows, dt), proto, fz)
        fout = dataclasses.replace(fout, pe=self._pe, virial=self._virial)
        return sim, fout

    # ---- device-side block (runs per device inside shard_map) -------------

    def _virtual_boxes(self, box_lo, box_L, me_x, me_y, dtype):
        sl = self.slab
        rc = jnp.asarray(sl.rc, dtype)
        wx = box_L[0] / sl.n_devices
        x_lo = box_lo[0] + me_x.astype(dtype) * wx
        x_hi = x_lo + wx
        eps = jnp.asarray(1e-3 * sl.rc, dtype)
        if sl.is_2d:
            wy = box_L[1] / sl.n_dev_y
            y_lo = box_lo[1] + me_y.astype(dtype) * wy
            y_hi = y_lo + wy
            bin_box = Box(
                lo=jnp.stack([x_lo - rc - eps, y_lo - rc - eps, box_lo[2]]),
                hi=jnp.stack([x_hi + rc + eps, y_hi + rc + eps,
                              box_lo[2] + box_L[2]]),
                periodic=(False, False, True))
            pair_box = Box(lo=box_lo, hi=box_lo + box_L,
                           periodic=(False, False, True))
        else:
            y_lo, y_hi = box_lo[1], box_lo[1] + box_L[1]
            bin_box = Box(
                lo=jnp.stack([x_lo - rc - eps, box_lo[1], box_lo[2]]),
                hi=jnp.stack([x_hi + rc + eps, box_lo[1] + box_L[1],
                              box_lo[2] + box_L[2]]),
                periodic=(False, True, True))
            pair_box = Box(lo=box_lo, hi=box_lo + box_L,
                           periodic=(False, True, True))
        return x_lo, x_hi, y_lo, y_hi, bin_box, pair_box

    def _block_dev(self, F, nloc, pe, vir, key, step, run_window, params,
                   gbox: Box, nsteps: int, cswitch=None):
        """One reneighbor block on one device: migrate → halo → build →
        nsteps of Verlet.  All comm is ppermute over the mesh axes; on the
        2-D pencil decomposition every phase stages x first, then y (y
        sources include the fresh x-ghosts, so corner regions ride the y
        stage — the standard dimension-by-dimension protocol).
        ``cswitch`` = (params_cs, stats_v): run a cluster_switch event after
        the rebuild and before the Verlet steps (adds an 8th return, the
        event outputs)."""
        sl = self.slab
        axis, axis_y = sl.axis, sl.axis_y
        Dx, Dy = sl.n_devices, sl.n_dev_y
        two_d = sl.is_2d
        cap_local, cap_halo, cap_tot = sl.cap_local, sl.cap_halo, sl.cap_tot
        cap_hy = sl.cap_halo_y
        y_base = cap_local + 2 * cap_halo       # first y-ghost row
        dt_ = F.dtype
        me = jax.lax.axis_index(axis)
        me_y = jax.lax.axis_index(axis_y) if two_d else jnp.zeros(
            (), jnp.int32)
        perm_r = [(i, (i + 1) % Dx) for i in range(Dx)]
        perm_l = [(i, (i - 1) % Dx) for i in range(Dx)]
        if two_d:
            perm_u = [(i, (i + 1) % Dy) for i in range(Dy)]
            perm_d = [(i, (i - 1) % Dy) for i in range(Dy)]
        rows_i = jnp.arange(cap_tot, dtype=jnp.int32)
        overflow = jnp.zeros((), bool)

        box_lo, box_L = gbox.lo, gbox.lengths
        x_lo, x_hi, y_lo, y_hi, bin_box, pair_box = self._virtual_boxes(
            box_lo, box_L, me, me_y, dt_)
        rc = jnp.asarray(sl.rc, dt_)

        # ---- 1. wrap + migrate (exchange comm), staged per dimension ------
        x = F[:, 0:3]
        img = F[:, 6:9]
        Lv = box_L[None, :]
        shift = jnp.floor((x - box_lo[None, :]) / Lv)
        F = F.at[:, 0:3].set(x - shift * Lv)
        F = F.at[:, 6:9].set(img + shift)

        def migrate_dir(F, nloc, col, D, me_d, ax, pr, pl, cap_mig):
            """One exchange stage along mesh axis ``ax`` keyed on coordinate
            ``col``: pack ±1-neighbor leavers, ring-shift, compact."""
            owned = rows_i < nloc
            s = jnp.clip(((F[:, col] - box_lo[col]) / box_L[col] * D),
                         0, D - 1).astype(jnp.int32)
            off = jnp.mod(s - me_d, D)
            stay = owned & (off == 0)
            go_r = owned & (off == 1)
            go_l = owned & (off == D - 1)
            ovf = jnp.any(owned & ~(stay | go_r | go_l))   # >1-cell hop
            ns_r = jnp.sum(go_r).astype(jnp.int32)
            ns_l = jnp.sum(go_l).astype(jnp.int32)
            ovf |= (ns_r > cap_mig) | (ns_l > cap_mig)
            buf_r = jnp.take(F, _take_first(go_r, cap_mig), axis=0)
            buf_l = jnp.take(F, _take_first(go_l, cap_mig), axis=0)
            in_l = jax.lax.ppermute(buf_r, ax, pr)     # from low neighbor
            n_in_l = jax.lax.ppermute(ns_r, ax, pr)
            in_r = jax.lax.ppermute(buf_l, ax, pl)     # from high neighbor
            n_in_r = jax.lax.ppermute(ns_l, ax, pl)
            nkeep = jnp.sum(stay).astype(jnp.int32)
            Fs = jnp.take(F, _take_first(stay, cap_tot), axis=0)
            mi = jnp.arange(cap_mig, dtype=jnp.int32)
            dst_l = jnp.where(mi < n_in_l, nkeep + mi, cap_tot)
            Fs = Fs.at[dst_l].set(in_l, mode="drop")
            dst_r = jnp.where(mi < n_in_r, nkeep + n_in_l + mi, cap_tot)
            Fs = Fs.at[dst_r].set(in_r, mode="drop")
            nloc2 = nkeep + n_in_l + n_in_r
            ovf |= nloc2 > cap_local
            return Fs, nloc2, ovf, ns_r + ns_l

        Fs, nloc, ovf_x, n_migrated = migrate_dir(
            F, nloc, 0, Dx, me, axis, perm_r, perm_l, sl.cap_mig)
        overflow |= ovf_x
        if two_d:
            # diagonal movers arrive here via their x-stage hop, then ride
            # the y stage (LAMMPS comm_brick exchange order)
            Fs, nloc, ovf_y, nmig_y = migrate_dir(
                Fs, nloc, 1, Dy, me_y, axis_y, perm_u, perm_d, sl.cap_mig_y)
            overflow |= ovf_y
            n_migrated = n_migrated + nmig_y

        # reset non-owned rows to inert defaults (parked at subdomain center)
        owned = rows_i < nloc
        dflt = jnp.zeros((_NMIG,), dt_)
        dflt = dflt.at[0].set(0.5 * (x_lo + x_hi))
        dflt = dflt.at[1].set(0.5 * (y_lo + y_hi))
        dflt = dflt.at[2].set(box_lo[2] + 0.5 * box_L[2])
        dflt = dflt.at[9].set(1.0).at[10].set(1.0).at[16].set(1.0)
        Fm = jnp.where(owned[:, None], Fs, dflt[None, :])

        # ---- 2. halo establishment (border comm), staged per dimension ----
        # establishment features: x3, ucgl, ucgstate, ucgp, typ, tag, mol
        # (mol rides along so ghost contact edges map to molecules — the
        # border-comm molecule field, atom_vec_ucg.cpp:66-69)
        def halo_feats(Fm):
            return jnp.stack([Fm[:, 0], Fm[:, 1], Fm[:, 2], Fm[:, 14],
                              Fm[:, 13], Fm[:, 17], Fm[:, 10], Fm[:, 9],
                              Fm[:, 11]], axis=1)

        def halo_into(Fm, recv, hval, base, cap):
            rows = jnp.where(hval[:, None], jnp.concatenate([
                recv[:, 0:3],                                      # x
                jnp.zeros((cap, 6), dt_),                          # v, image
                recv[:, 7:8], recv[:, 6:7],                        # tag, typ
                recv[:, 8:9],                                      # mol
                jnp.zeros((cap, 1), dt_),                          # q
                recv[:, 4:5], recv[:, 3:4],                        # state, λ
                jnp.zeros((cap, 1), dt_),                          # ucgvl
                jnp.ones((cap, 1), dt_),                           # ucgml
                recv[:, 5:6],                                      # ucgp
                jnp.zeros((cap, _NMIG - 18), dt_),
            ], axis=1), dflt[None, :])
            return jax.lax.dynamic_update_slice(
                Fm, rows,
                (jnp.asarray(base, jnp.int32), jnp.zeros((), jnp.int32)))

        # x stage: owned rows within rc of the x faces
        xl = Fm[:, 0]
        near_l = owned & (xl < x_lo + rc)
        near_r = owned & (xl >= x_hi - rc)
        nh_l = jnp.sum(near_l).astype(jnp.int32)
        nh_r = jnp.sum(near_r).astype(jnp.int32)
        overflow |= (nh_l > cap_halo) | (nh_r > cap_halo)
        src_l = _take_first(near_l, cap_halo)    # refreshed every step
        src_r = _take_first(near_r, cap_halo)

        hcols = halo_feats(Fm)
        from_l = jax.lax.ppermute(jnp.take(hcols, src_r, axis=0), axis, perm_r)
        n_from_l = jax.lax.ppermute(nh_r, axis, perm_r)
        from_r = jax.lax.ppermute(jnp.take(hcols, src_l, axis=0), axis, perm_l)
        n_from_r = jax.lax.ppermute(nh_l, axis, perm_l)
        # ghost x shifted across the periodic seam so pair dx never wraps
        shift_l = jnp.where(me == 0, -box_L[0], jnp.zeros((), dt_))
        shift_r = jnp.where(me == Dx - 1, box_L[0], jnp.zeros((), dt_))
        from_l = from_l.at[:, 0].add(shift_l)
        from_r = from_r.at[:, 0].add(shift_r)

        hi_ = jnp.arange(cap_halo, dtype=jnp.int32)
        hval_l = hi_ < n_from_l
        hval_r = hi_ < n_from_r

        Fm = halo_into(Fm, from_l, hval_l, cap_local, cap_halo)
        Fm = halo_into(Fm, from_r, hval_r, cap_local + cap_halo, cap_halo)
        valid = jnp.concatenate([rows_i[:cap_local] < nloc, hval_l, hval_r])

        if two_d:
            # y stage: owned + x-ghost rows within rc of the y faces (the
            # x-ghosts' inclusion is what populates corner regions)
            elig = jnp.concatenate(
                [valid, jnp.zeros((2 * cap_hy,), bool)])
            yv = Fm[:, 1]
            near_d = elig & (yv < y_lo + rc)
            near_u = elig & (yv >= y_hi - rc)
            nh_d = jnp.sum(near_d).astype(jnp.int32)
            nh_u = jnp.sum(near_u).astype(jnp.int32)
            overflow |= (nh_d > cap_hy) | (nh_u > cap_hy)
            src_d = _take_first(near_d, cap_hy)
            src_u = _take_first(near_u, cap_hy)

            hcols2 = halo_feats(Fm)
            from_d = jax.lax.ppermute(jnp.take(hcols2, src_u, axis=0),
                                      axis_y, perm_u)
            n_from_d = jax.lax.ppermute(nh_u, axis_y, perm_u)
            from_u = jax.lax.ppermute(jnp.take(hcols2, src_d, axis=0),
                                      axis_y, perm_d)
            n_from_u = jax.lax.ppermute(nh_d, axis_y, perm_d)
            shift_d = jnp.where(me_y == 0, -box_L[1], jnp.zeros((), dt_))
            shift_u = jnp.where(me_y == Dy - 1, box_L[1],
                                jnp.zeros((), dt_))
            from_d = from_d.at[:, 1].add(shift_d)
            from_u = from_u.at[:, 1].add(shift_u)

            hyi = jnp.arange(cap_hy, dtype=jnp.int32)
            hval_d = hyi < n_from_d
            hval_u = hyi < n_from_u

            Fm = halo_into(Fm, from_d, hval_d, y_base, cap_hy)
            Fm = halo_into(Fm, from_u, hval_u, y_base + cap_hy, cap_hy)
            valid = jnp.concatenate([valid, hval_d, hval_u])

        # ---- 3. local neighbor build ---------------------------------------
        # ghost rows are candidates (j) but own no list (i): every tally is
        # owned-atom-owned, so pe/virial psums count each pair exactly twice
        # (both directed halves) — same bookkeeping as the single-chip path.
        # Column (fused-kernel) path: the same ColumnSpec machinery as a
        # single chip, on the slab's non-periodic-x virtual box — padding
        # rows are dropped via ``valid`` and ghost i-slots stop tallying
        # pe/virial via ``restrict_i`` (the kernel analogue of i_valid).
        i_owned = jnp.concatenate(
            [rows_i[:cap_local] < nloc,
             jnp.zeros((2 * cap_halo + 2 * cap_hy,), bool)])
        if self._is_column:
            sim0, fout0 = self._sim_of(Fm, pe, vir, key, step, bin_box)
        else:
            sim0, fout0 = self._sim_of(Fm, pe, vir, key, step, pair_box)

        # ---- per-block topology row maps (bonded / special exclusions) ----
        # topology is replicated; each device maps its terms' member TAGS to
        # local rows once per block (rows are fixed between migrations).
        # Members of a term with an owned atom are always locally present
        # (bond lengths < halo width) — violations flag as overflow.
        topo = None
        if self.bonded is not None or self.excl_tags is not None:
            ng = self.n_global
            sent = cap_tot
            inv = jnp.full((ng + 1,), sent, jnp.int32).at[
                jnp.where(valid, sim0.tag - 1, ng)].set(rows_i)
            topo = {"nloc": nloc}
            if self.excl_tags is not None:
                et = jnp.take(self.excl_tags,
                              jnp.clip(sim0.tag - 1, 0, ng - 1), axis=0)
                er = jnp.where(et > 0,
                               inv[jnp.clip(et - 1, 0, ng - 1)], sent)
                # only owned valid i rows exclude/subtract (ghost tallies
                # are dropped; parked rows carry garbage tags)
                topo["excl_rows"] = jnp.where(i_owned[:, None], er, sent)
            if self.bonded is not None:
                bp = self.bonded
                look = lambda t: inv[jnp.clip(t - 1, 0, ng - 1)]
                rows = {
                    "bond": tuple(look(bp.bond_tags[:, m])
                                  for m in range(2)),
                    "angle": tuple(look(bp.angle_tags[:, m])
                                   for m in range(3)),
                    "dihedral": tuple(look(bp.dihedral_tags[:, m])
                                      for m in range(4)),
                    "improper": tuple(look(bp.improper_tags[:, m])
                                      for m in range(4)),
                }
                topo["rows"] = rows
                # a term with any OWNED member must have ALL members locally
                # present (bond chains span < halo width) — else overflow
                for key, nterms in (("bond", bp.n_bonds),
                                    ("angle", bp.n_angles),
                                    ("dihedral", bp.n_dihedrals),
                                    ("improper", bp.n_impropers)):
                    if nterms:
                        rs = rows[key]
                        ow = rs[0] < nloc
                        miss = rs[0] >= sent
                        for r in rs[1:]:
                            ow |= r < nloc
                            miss |= r >= sent
                        overflow |= jnp.any(ow & miss)

        if self._is_column:
            nbr = colpack.restrict_i(
                colpack.build(sim0.x, bin_box, self.nbr_spec, valid=valid),
                i_owned)
        else:
            # XLA path: list-side exclusion, the single-chip mechanism
            nbr = nbrmod.build(sim0.x, bin_box, sl.nbr, valid=valid,
                               i_valid=i_owned,
                               excl=(topo or {}).get("excl_rows"))
        overflow |= nbr.overflow

        # ---- 4. nsteps of Verlet with per-step halo refresh ----------------

        def xchg(a):
            """Halo exchange of a per-atom derived array ((N,) or (N, K)):
            ghost rows get the OWNER's values — the phase-boundary forward
            comm the density styles need (pair_table_rleucg_interface.cpp:
            277-278); ghost densities/CV forces computed locally would see
            truncated neighborhoods."""
            vec = a.ndim == 1
            a2 = a[:, None] if vec else a

            def put(dst, recv, hval, base, cap):
                cur = jax.lax.dynamic_slice_in_dim(dst, base, cap)
                new = jnp.where(hval[:, None], recv, cur)
                return jax.lax.dynamic_update_slice_in_dim(dst, new, base,
                                                           axis=0)

            rl = jax.lax.ppermute(jnp.take(a2, src_r, axis=0), axis, perm_r)
            rr = jax.lax.ppermute(jnp.take(a2, src_l, axis=0), axis, perm_l)
            a2 = put(a2, rl, hval_l, cap_local, cap_halo)
            a2 = put(a2, rr, hval_r, cap_local + cap_halo, cap_halo)
            if two_d:
                # y stage reads the x-updated rows (x-ghost sources must
                # carry their owners' fresh values into the corners)
                rd = jax.lax.ppermute(jnp.take(a2, src_u, axis=0),
                                      axis_y, perm_u)
                ru = jax.lax.ppermute(jnp.take(a2, src_d, axis=0),
                                      axis_y, perm_d)
                a2 = put(a2, rd, hval_d, y_base, cap_hy)
                a2 = put(a2, ru, hval_u, y_base + cap_hy, cap_hy)
            return a2[:, 0] if vec else a2

        def wrap_pair(fn):
            """Bind the phase-boundary halo exchange into styles that
            declare they need it (density styles P3/P4)."""
            target = fn if fn is not None else self.pair_compute
            if getattr(target, "supports_halo_xchg", False):
                return lambda s, nb_, p: target(s, nb_, p, xchg=xchg)
            return fn

        def refresh(sim_s):
            def feats(sim_s):
                return jnp.stack([sim_s.x[:, 0], sim_s.x[:, 1],
                                  sim_s.x[:, 2], sim_s.ucgl,
                                  sim_s.ucgstate.astype(dt_), sim_s.ucgp],
                                 axis=1)

            def put(sim_s, recv, hval, base, cap):
                sel = lambda new, cur: jnp.where(hval, new, cur)
                upd = {}
                xh = jax.lax.dynamic_slice_in_dim(sim_s.x, base, cap)
                upd["x"] = jax.lax.dynamic_update_slice_in_dim(
                    sim_s.x, jnp.where(hval[:, None], recv[:, 0:3], xh),
                    base, axis=0)
                for name, col, cast in (("ucgl", 3, dt_),
                                        ("ucgstate", 4, jnp.int32),
                                        ("ucgp", 5, dt_)):
                    cur = jax.lax.dynamic_slice_in_dim(
                        getattr(sim_s, name), base, cap)
                    new = recv[:, col]
                    new = (jnp.round(new).astype(jnp.int32)
                           if cast == jnp.int32 else new.astype(dt_))
                    upd[name] = jax.lax.dynamic_update_slice_in_dim(
                        getattr(sim_s, name), sel(new, cur), base, axis=0)
                return dataclasses.replace(sim_s, **upd)

            dyn = feats(sim_s)
            rl = jax.lax.ppermute(jnp.take(dyn, src_r, axis=0), axis, perm_r)
            rr = jax.lax.ppermute(jnp.take(dyn, src_l, axis=0), axis, perm_l)
            rl = rl.at[:, 0].add(shift_l)
            rr = rr.at[:, 0].add(shift_r)
            sim_s = put(sim_s, rl, hval_l, cap_local, cap_halo)
            sim_s = put(sim_s, rr, hval_r, cap_local + cap_halo, cap_halo)
            if two_d:
                # y stage gathers the x-refreshed rows (corner ghosts flow
                # owner → x-ghost → y-ghost in one step)
                dyn2 = feats(sim_s)
                rd = jax.lax.ppermute(jnp.take(dyn2, src_u, axis=0),
                                      axis_y, perm_u)
                ru = jax.lax.ppermute(jnp.take(dyn2, src_d, axis=0),
                                      axis_y, perm_d)
                rd = rd.at[:, 1].add(shift_d)
                ru = ru.at[:, 1].add(shift_u)
                sim_s = put(sim_s, rd, hval_d, y_base, cap_hy)
                sim_s = put(sim_s, ru, hval_u, y_base + cap_hy, cap_hy)
            return sim_s

        def refresh_slots(sim_s):
            """Per-step halo refresh with state RESIDENT in column-slot
            order (the slab analogue of the single-chip slot-major
            interior): sources gather at the slot positions of the owned
            near-face rows, received values scatter into the ghost rows'
            slot positions.  Same staged x(→y) protocol as refresh()."""
            asl = nbr.atom_slot
            nsl = sim_s.x.shape[0]

            def feats(sim_s):
                return jnp.stack([sim_s.x[:, 0], sim_s.x[:, 1],
                                  sim_s.x[:, 2], sim_s.ucgl,
                                  sim_s.ucgstate.astype(dt_), sim_s.ucgp],
                                 axis=1)

            def put(sim_s, recv, hval, base, cap):
                dst = jnp.where(hval, asl[base:base + cap], nsl)
                upd = {"x": sim_s.x.at[dst].set(recv[:, 0:3], mode="drop")}
                for name, col, cast in (("ucgl", 3, dt_),
                                        ("ucgstate", 4, jnp.int32),
                                        ("ucgp", 5, dt_)):
                    new = recv[:, col]
                    new = (jnp.round(new).astype(jnp.int32)
                           if cast == jnp.int32 else new.astype(dt_))
                    upd[name] = getattr(sim_s, name).at[dst].set(
                        new, mode="drop")
                return dataclasses.replace(sim_s, **upd)

            dyn = feats(sim_s)
            rl = jax.lax.ppermute(
                jnp.take(dyn, jnp.take(asl, src_r), axis=0), axis, perm_r)
            rr = jax.lax.ppermute(
                jnp.take(dyn, jnp.take(asl, src_l), axis=0), axis, perm_l)
            rl = rl.at[:, 0].add(shift_l)
            rr = rr.at[:, 0].add(shift_r)
            sim_s = put(sim_s, rl, hval_l, cap_local, cap_halo)
            sim_s = put(sim_s, rr, hval_r, cap_local + cap_halo, cap_halo)
            if two_d:
                dyn2 = feats(sim_s)
                rd = jax.lax.ppermute(
                    jnp.take(dyn2, jnp.take(asl, src_u), axis=0),
                    axis_y, perm_u)
                ru = jax.lax.ppermute(
                    jnp.take(dyn2, jnp.take(asl, src_d), axis=0),
                    axis_y, perm_d)
                rd = rd.at[:, 1].add(shift_d)
                ru = ru.at[:, 1].add(shift_u)
                sim_s = put(sim_s, rd, hval_d, y_base, cap_hy)
                sim_s = put(sim_s, ru, hval_u, y_base + cap_hy, cap_hy)
            return sim_s

        def clean(fout):
            # table-OOB counters are not carried across spatial blocks
            # (ForceOut optionals would break the scan carry structure), and
            # P3's fused posterior is already applied to state.ucgp inside
            # _forces; on the column path, rows dropped from the candidate
            # structure (capacity padding) gather out-of-range garbage —
            # zero their tallies so parked rows never move (and never look
            # dangerous)
            fout = dataclasses.replace(fout, oob_low=None, oob_high=None,
                                       ucgp=None)
            if self._is_column:
                fout = dataclasses.replace(
                    fout,
                    f=jnp.where(valid[:, None], fout.f, 0.0),
                    ucgforce=jnp.where(valid, fout.ucgforce, 0.0),
                    scores=jnp.where(valid[:, None], fout.scores, 0.0))
            return fout

        # ---- optional cluster_switch event (PRE_EXCHANGE analogue) ---------
        # mirrors the single-chip _maybe_cluster_switch + setup() sequence:
        # wrap/exchange/rebuild happened in the prologue; distributed label
        # propagation converges via pmin per sweep (the reference's
        # MPI_Allreduce(MIN) loop, fix_cluster_switch.cpp:596-685); the MC
        # flip uses the replicated key over per-molecule slots, so every
        # device flips its owned AND ghost copies identically (subsuming the
        # reference's forward comm of flipped types, :828); the force carry
        # is then recomputed at the flipped types (Simulation.setup analogue)
        cs_out = None
        if cswitch is not None:
            from lammps_ucg_dev_tpu.fixes import cluster_switch as fcs

            params_cs, stats_v = cswitch
            k2, sub = jax.random.split(sim0.key)
            sim0 = dataclasses.replace(sim0, key=k2)
            if self._is_column:
                # the kernel path has no atom-neighbor list: build the
                # event's dedicated per-device CONTACT list (contact
                # cutoff << pair rc) over the same virtual box — the
                # single-chip column composition's _cs_spec, distributed
                nbr_cs = nbrmod.build(sim0.x, bin_box, self._cs_spec,
                                      valid=valid, i_valid=i_owned)
                overflow |= nbr_cs.overflow
            else:
                nbr_cs = nbr
            sim_cs, stats2, info = fcs.apply(
                sub, sim0, nbr_cs, params_cs,
                fcs.ClusterSwitchStats(v=stats_v),
                axis=sl.axes, valid=valid)
            sim0 = dataclasses.replace(sim0, typ=sim_cs.typ)
            sim0, fout0 = self._forces(sim0, nbr, run_window,
                                       pair_params=params,
                                       pair_fn=wrap_pair(None), topo=topo)
            fout0 = clean(fout0)
            cs_out = {
                "stats": stats2.v,
                "in_cluster": info["in_cluster"],
                "mol_state": info["mol_state"],
                "converged": info["converged"],
            }

        mass = self._masses_by_type.astype(dt_)[sim0.typ]

        def make_body(pair_fn, scores_valid=True):
            def body(carry, _):
                sim_s, fout = carry
                sim_s = fi.initial_integrate(
                    sim_s, fout.f, fout.ucgforce, mass, self.cfg.dt,
                    self.cfg.u.ftm2v, self.cfg.integrator)
                sim_s = refresh(sim_s)
                sim_s, fout = self._forces(sim_s, nbr, run_window,
                                           pair_params=params,
                                           pair_fn=wrap_pair(pair_fn),
                                           scores_valid=scores_valid,
                                           topo=topo)
                fout = clean(fout)
                sim_s = fi.final_integrate(
                    sim_s, fout.f, fout.ucgforce, mass, self.cfg.dt,
                    self.cfg.u.ftm2v, self.cfg.integrator)
                sim_s = dataclasses.replace(sim_s, step=sim_s.step + 1)
                return (sim_s, fout), None
            return body

        if nsteps == 0:
            # Verlet::setup analogue — evaluate forces at the current
            # positions without integrating (same as Simulation.setup)
            sim1, fout1 = self._forces(sim0, nbr, run_window,
                                       pair_params=params,
                                       pair_fn=wrap_pair(None), topo=topo)
            fout1 = clean(fout1)
        else:
            # interior steps may use the pair style's fast variant (no
            # energy/virial); the block's last step runs the full evaluation
            # so the carried ForceOut holds valid pe/virial for thermo —
            # same eflag/vflag cadence as the single-chip driver
            fast_fn = getattr(self.pair_compute, "fast_variant", None)
            fast_scores = True
            if fast_fn is not None and self._scores_inert:
                # same score-free interior gating as the single-chip driver
                nos = getattr(self.pair_compute, "fast_variant_noscores",
                              None)
                if nos is not None:
                    fast_fn, fast_scores = nos, False
            # ---- 2-level r-RESPA (bonded inner, pair outer) ----------------
            # the single-chip respa body (runtime/sim.py) with halo
            # awareness: ghost rows carry NO velocities, so their drifted
            # positions inside the inner loop are garbage — the fast-force
            # closure refreshes owner x into ghosts before every bonded
            # evaluation, and the outer pair evaluation gets the full
            # 6-feature refresh exactly like the Verlet body
            respa = self.cfg.respa_inner > 1
            if respa:
                from lammps_ucg_dev_tpu.models import bonded as bd

                dt_in = self.cfg.dt / self.cfg.respa_inner

                def bonded_eval(st):
                    st = refresh(st)
                    return bd.compute_spatial(st, self.bonded,
                                              topo["rows"], topo["nloc"])[0]

                def respa_body(carry, _):
                    sim_s, fout, fbond = carry
                    sim_s = fi.respa_outer_initial(
                        sim_s, fout.f, fout.ucgforce, mass, self.cfg.dt,
                        self.cfg.u.ftm2v, self.cfg.integrator)

                    def inner(c, _):
                        st, fb = fi.respa_inner_step(
                            c[0], c[1], mass, dt_in, self.cfg.u.ftm2v,
                            self.cfg.integrator, bonded_eval)
                        return (st, fb), None

                    (sim_s, fbond), _ = jax.lax.scan(
                        inner, (sim_s, fbond), None,
                        length=self.cfg.respa_inner)
                    sim_s = refresh(sim_s)
                    sim_s, fout = self._forces(sim_s, nbr, run_window,
                                               pair_params=params,
                                               pair_fn=wrap_pair(None),
                                               topo=topo)
                    fout = clean(fout)
                    sim_s = fi.respa_outer_final(
                        sim_s, fout.f, fout.ucgforce, mass, self.cfg.dt,
                        self.cfg.u.ftm2v, self.cfg.integrator)
                    sim_s = dataclasses.replace(sim_s, step=sim_s.step + 1)
                    return (sim_s, fout, fbond), None
            # slot-major interior (single-chip _slot_interior analogue):
            # state lives in column-slot order for the nsteps-1 interior
            # steps — the per-step atom→slot pack gather and out-take
            # vanish; the halo refresh gathers/scatters at slot positions.
            # Styles with a phase-boundary xchg (P3/P4) stay atom-ordered
            # (their derived-quantity exchange is row-indexed), as does the
            # cluster_switch event block.
            use_slot = (not respa and self._slot_ok and nsteps > 1
                        and cswitch is None
                        and not getattr(self.pair_compute,
                                        "supports_halo_xchg", False))
            if use_slot:
                slot_fn = self.pair_compute.slot_fast
                slot_scores = True
                if self._scores_inert:
                    nos_s = getattr(self.pair_compute,
                                    "slot_fast_noscores", None)
                    if nos_s is not None:
                        slot_fn, slot_scores = nos_s, False

                def slot_body(carry, _):
                    ss, fout = carry
                    mass_s = self._masses_by_type.astype(dt_)[ss.typ]
                    ss = fi.initial_integrate(
                        ss, fout.f, fout.ucgforce, mass_s, self.cfg.dt,
                        self.cfg.u.ftm2v, self.cfg.integrator)
                    ss = refresh_slots(ss)
                    ss, fout = self._forces(ss, nbr, run_window,
                                            pair_params=params,
                                            pair_fn=slot_fn,
                                            scores_valid=slot_scores)
                    fout = dataclasses.replace(fout, oob_low=None,
                                               oob_high=None, ucgp=None)
                    ss = fi.final_integrate(
                        ss, fout.f, fout.ucgforce, mass_s, self.cfg.dt,
                        self.cfg.u.ftm2v, self.cfg.integrator)
                    ss = dataclasses.replace(ss, step=ss.step + 1)
                    return (ss, fout), None

                ss0, sf0 = self._to_slots(sim0, fout0, nbr)
                (ss1, sf1), _ = jax.lax.scan(slot_body, (ss0, sf0), None,
                                             length=nsteps - 1)
                sim1, fout1 = self._from_slots(sim0, ss1, sf1, nbr)
                (sim1, fout1), _ = make_body(None)((sim1, fout1), None)
            elif respa:
                (sim1, fout1, _), _ = jax.lax.scan(
                    respa_body, (sim0, fout0, bonded_eval(sim0)), None,
                    length=nsteps)
            elif fast_fn is not None and nsteps > 1:
                (sim1, fout1), _ = jax.lax.scan(
                    make_body(fast_fn, scores_valid=fast_scores),
                    (sim0, fout0), None, length=nsteps - 1)
                (sim1, fout1), _ = make_body(None)((sim1, fout1), None)
            else:
                (sim1, fout1), _ = jax.lax.scan(
                    make_body(None), (sim0, fout0), None, length=nsteps)
        if self.cfg.respa_inner > 1:
            # thermo parity with the single-chip respa driver: the pair
            # pass doesn't fold bonded terms under r-RESPA (the inner level
            # owns their forces) — add their energy AND virial to the
            # carried observables (runtime/sim.py thermo impl analogue)
            from lammps_ucg_dev_tpu.models import bonded as bd

            _, bpe, bvir = bd.compute_spatial(sim1, self.bonded,
                                              topo["rows"], topo["nloc"])
            fout1 = dataclasses.replace(fout1, pe=fout1.pe + bpe,
                                        virial=fout1.virial + bvir)
        danger = nbrmod.displacement_check(nbr, sim1.x, pair_box, sl.nbr.skin)

        F1 = _pack_mig(sim1, fout1)
        # owned-row partial sums; halo i-rows tally nothing by construction
        axes = sl.axes
        pe1 = jax.lax.psum(fout1.pe, axes)
        vir1 = jax.lax.psum(fout1.virial, axes)
        flags = {
            "overflow": jax.lax.psum(overflow.astype(jnp.int32), axes) > 0,
            "danger": jax.lax.psum(danger.astype(jnp.int32), axes) > 0,
            "max_occ": jax.lax.pmax(nbr.max_occupancy, axes),
            "migrated": jax.lax.psum(n_migrated, axes),
        }
        if cswitch is not None:
            return F1, nloc, pe1, vir1, sim1.key, sim1.step, flags, cs_out
        return F1, nloc, pe1, vir1, sim1.key, sim1.step, flags

    def _sim_of(self, F, pe, vir, key, step, pair_box):
        """Per-device (SimState, ForceOut) view of the packed rows."""
        dt_ = F.dtype
        n = F.shape[0]
        proto = SimState(
            step=step, x=F[:, 0:3], v=F[:, 3:6],
            tag=jnp.round(F[:, 9]).astype(jnp.int32),
            typ=jnp.round(F[:, 10]).astype(jnp.int32),
            mol=jnp.round(F[:, 11]).astype(jnp.int32), q=F[:, 12],
            image=jnp.round(F[:, 6:9]).astype(jnp.int32),
            ucgstate=jnp.round(F[:, 13]).astype(jnp.int32),
            ucgl=F[:, 14], ucgvl=F[:, 15], ucgml=F[:, 16], ucgp=F[:, 17],
            key=key, box=pair_box, n_total=self.n_global)
        fout = ForceOut(f=F[:, 18:21], ucgforce=F[:, 21], scores=F[:, 22:24],
                        pe=pe, virial=vir)
        return proto, fout

    # ---- fused multi-block run (the production API) ------------------------

    def _fused_fn(self, nblocks: int, nsteps: int, with_cswitch=False):
        key_ = (nblocks, nsteps, with_cswitch)
        if self._fused_cache is None:
            self._fused_cache = {}
        if key_ not in self._fused_cache:
            pa, rep = P(self.slab.axes), P()
            flspec = {"overflow": rep, "danger": rep, "max_occ": rep,
                      "migrated": rep}
            if with_cswitch:
                flspec = dict(flspec, cswitch={
                    "stats": rep, "in_cluster": rep, "mol_state": rep,
                    "converged": rep})
            out_specs = (pa, pa, rep, rep, rep, rep, flspec)
            in_specs = (pa, pa, rep, rep, rep, rep, rep)
            if with_cswitch:
                in_specs = in_specs + (rep,)        # stats vector
            if self._is_column:
                # the fused Pallas kernel bakes table/type structure as
                # immediates — params must be trace-time constants, so the
                # column path closes over them (same as the single-chip jit)
                def impl(F, nloc, pe, vir, key, step, run_window,
                         *stats_v):
                    return self._per_device_impl(
                        F, nloc, pe, vir, key, step, run_window,
                        self.pair_params, nblocks=nblocks, nsteps=nsteps,
                        cs_stats=stats_v[0] if stats_v else None)

                fn = jax.shard_map(
                    impl, mesh=self.mesh,
                    in_specs=in_specs, out_specs=out_specs, check_vma=False)
            else:
                gspec = jax.tree_util.tree_map(lambda _: rep,
                                               self.pair_params)

                def impl(F, nloc, pe, vir, key, step, run_window, params,
                         *stats_v):
                    return self._per_device_impl(
                        F, nloc, pe, vir, key, step, run_window, params,
                        nblocks=nblocks, nsteps=nsteps,
                        cs_stats=stats_v[0] if stats_v else None)

                fn = jax.shard_map(
                    impl, mesh=self.mesh,
                    in_specs=in_specs[:7] + (gspec,) + in_specs[7:],
                    out_specs=out_specs, check_vma=False)
            self._fused_cache[key_] = jax.jit(fn)
        return self._fused_cache[key_]

    def _call_fused(self, fn, run_window, with_cswitch=False):
        args = (self._F, self._nloc, self._pe, self._virial, self._key,
                self._step, jnp.asarray(run_window))
        if not self._is_column:
            args = args + (self.pair_params,)
        if with_cswitch:
            args = args + (self.cswitch_stats.v,)
        return fn(*args)

    def run_fused(self, nblocks: int, run_window=None, do_cswitch=False):
        if run_window is None:
            b = int(self._step)
            run_window = (b, b + nblocks * self.cfg.reneigh_every)
        if not self._setup_done:
            # Verlet::setup analogue — without it the first block's force
            # carry is zero and the first half-kick is wrong (Simulation.run
            # auto-setups the same way)
            self.setup(run_window)
        fn = self._fused_fn(nblocks, self.cfg.reneigh_every,
                            with_cswitch=do_cswitch)
        event_step = int(self._step)
        (self._F, self._nloc, self._pe, self._virial, self._key, self._step,
         fl) = self._call_fused(fn, run_window, with_cswitch=do_cswitch)
        if do_cswitch:
            self._finish_cswitch(fl.pop("cswitch"), event_step)
        if self.cfg.check_safety:
            if bool(fl["overflow"]):
                raise RuntimeError(
                    "spatial capacity exceeded (migration/halo/local-neighbor "
                    f"overflow or >1-slab hop; max occupancy "
                    f"{int(fl['max_occ'])})")
            self.dangerous_builds += int(fl["danger"])
        self._migrations += int(fl["migrated"])
        return fl

    def _per_device_impl(self, F, nloc, pe, vir, key, step, run_window,
                         params, nblocks: int, nsteps: int, cs_stats=None):
        gbox = Box(lo=jnp.asarray(self._host_box["lo"], F.dtype),
                   hi=jnp.asarray(self._host_box["lo"] + self._host_box["L"],
                                  F.dtype))
        nloc = nloc[0]

        def blk(carry, _):
            F, nloc, pe, vir, key, step, fl = carry
            F, nloc, pe, vir, key, step, fl2 = self._block_dev(
                F, nloc, pe, vir, key, step, run_window, params, gbox, nsteps)
            fl = {
                "overflow": fl["overflow"] | fl2["overflow"],
                "danger": fl["danger"] + fl2["danger"].astype(jnp.int32),
                "max_occ": jnp.maximum(fl["max_occ"], fl2["max_occ"]),
                "migrated": fl["migrated"] + fl2["migrated"],
            }
            return (F, nloc, pe, vir, key, step, fl), None

        fl0 = {"overflow": jnp.zeros((), bool),
               "danger": jnp.zeros((), jnp.int32),
               "max_occ": jnp.zeros((), jnp.int32),
               "migrated": jnp.zeros((), jnp.int32)}
        nrest = nblocks
        cs_out = None
        if cs_stats is not None:
            # the event rides the FIRST block (PRE_EXCHANGE timing); the
            # remaining blocks of the segment scan as usual
            params_cs, _ = self.cswitch
            F, nloc, pe, vir, key, step, fl2, cs_out = self._block_dev(
                F, nloc, pe, vir, key, step, run_window, params, gbox,
                nsteps, cswitch=(params_cs, cs_stats))
            fl0 = {
                "overflow": fl0["overflow"] | fl2["overflow"],
                "danger": fl0["danger"] + fl2["danger"].astype(jnp.int32),
                "max_occ": jnp.maximum(fl0["max_occ"], fl2["max_occ"]),
                "migrated": fl0["migrated"] + fl2["migrated"],
            }
            nrest = nblocks - 1
        (F, nloc, pe, vir, key, step, fl), _ = jax.lax.scan(
            blk, (F, nloc, pe, vir, key, step, fl0), None, length=nrest)
        if cs_out is not None:
            fl = dict(fl, cswitch=cs_out)
        return F, nloc[None], pe, vir, key, step, fl

    # ---- overridden single-chip APIs ---------------------------------------

    def setup(self, run_window=(0, 0)):
        """Establish halos + evaluate initial forces: one zero-step block
        (the Verlet::setup analogue; matches Simulation.setup semantics)."""
        fn = self._fused_fn(nblocks=1, nsteps=0)
        (self._F, self._nloc, self._pe, self._virial, self._key, self._step,
         fl) = self._call_fused(fn, run_window)
        self._setup_done = True
        if bool(fl["overflow"]):
            raise RuntimeError("spatial capacity exceeded at setup")

    def run(self, nsteps: int, thermo_every: int = 0, thermo_callback=None):
        re_ = self.cfg.reneigh_every
        trailing = nsteps % re_
        nsteps -= trailing
        if self.cswitch is None:
            if nsteps:
                self.run_fused(nsteps // re_)
        else:
            # segment at cluster_switch cadence: an event opens every
            # segment whose start step is a positive multiple of the switch
            # frequency (single-chip _maybe_cluster_switch timing)
            _, freq = self.cswitch
            done = 0
            while done < nsteps:
                step = int(self._step)
                do_cs = step > 0 and step % freq == 0
                until = freq - (step % freq) if step % freq else freq
                todo = min(nsteps - done, until)
                self.run_fused(todo // re_, do_cswitch=do_cs)
                done += todo
        if trailing:
            # short trailing block (its own compiled program; a rebuild
            # opens it like any other block)
            if not self._setup_done:
                self.setup((int(self._step), int(self._step) + trailing))
            b = int(self._step)
            fn = self._fused_fn(1, trailing)
            (self._F, self._nloc, self._pe, self._virial, self._key,
             self._step, fl) = self._call_fused(fn, (b, b + trailing))
            if self.cfg.check_safety and bool(fl["overflow"]):
                raise RuntimeError("spatial capacity exceeded")
        state, _ = self.gather()
        # keep .state coherent for callers that read it between runs (the
        # input-script runner's thermo/dump emit; Simulation.run parity)
        self.state = state
        return state

    def _finish_cswitch(self, cs, step: int):
        """Host-side event epilogue: stats, convergence check, rank-0 logs
        (mirrors Simulation._maybe_cluster_switch; ``step`` = event step)."""
        from lammps_ucg_dev_tpu.fixes import cluster_switch as fcs

        self.cswitch_stats = fcs.ClusterSwitchStats(v=cs["stats"])
        if not bool(cs["converged"]):
            raise RuntimeError(
                "cluster_switch label propagation hit max_sweeps without "
                "converging — cluster labels may be wrong (raise max_sweeps)")
        if self.log_dir is not None:
            inc = np.asarray(cs["in_cluster"]).astype(int)
            ms = np.asarray(cs["mol_state"])
            with open(f"{self.log_dir}/cluster_assignment.log", "a") as fh:
                fh.write(f"{step} " + " ".join(map(str, inc.tolist())) + "\n")
            with open(f"{self.log_dir}/state_assignment.log", "a") as fh:
                fh.write(f"{step} " + " ".join(map(str, ms.tolist())) + "\n")

    def thermo(self) -> dict:
        """Global thermo scalars via ONE device-side psum reduction — no
        O(N) host gather (production thermo cadence at 1M × 8 chips; the
        reference's Thermo::compute + MPI_Allreduce).  Matches
        Simulation.thermo's row exactly (test_spatial_thermo_matches)."""
        if not hasattr(self, "_thermo_sp_fn"):
            u = self.cfg.u
            sl = self.slab
            cfg = self.cfg
            tp = getattr(self.pair_params, "tp", None)

            def impl(F, nloc, pe, vir):
                nloc0 = nloc[0]
                dt_ = F.dtype
                owned = jnp.arange(sl.cap_tot, dtype=jnp.int32) < nloc0
                typ = jnp.round(F[:, 10]).astype(jnp.int32)
                mass = self._masses_by_type.astype(dt_)[typ]
                v2 = jnp.sum(F[:, 3:6] ** 2, axis=1)
                ke = 0.5 * jnp.sum(jnp.where(owned, mass * v2, 0.0)) * u.mvv2e
                ke_lam = 0.5 * jnp.sum(
                    jnp.where(owned, F[:, 16] * F[:, 15] ** 2, 0.0)) * u.mvv2e
                if cfg.integrator.wall and cfg.integrator.bias_potential:
                    be = fi.bias_energy(F[:, 14], cfg.integrator.barrier)
                    if tp is not None:
                        be = jnp.where(tp.n_states[typ] > 1, be, 0.0)
                    if cfg.integrator.group is not None:
                        tag = jnp.round(F[:, 9]).astype(jnp.int32)
                        g = jnp.asarray(cfg.integrator.group)[tag - 1]
                        be = jnp.where(g, be, 0.0)
                    pe_bias = jnp.sum(jnp.where(owned, be, 0.0))
                else:
                    pe_bias = jnp.zeros((), dt_)
                loc = jnp.stack([ke, ke_lam, pe_bias])
                tot = jax.lax.psum(loc, sl.axes)
                return tot, pe, vir

            pa, rep = P(sl.axes), P()
            self._thermo_sp_fn = jax.jit(jax.shard_map(
                impl, mesh=self.mesh, in_specs=(pa, pa, rep, rep),
                out_specs=(rep, rep, rep), check_vma=False))
        tot, pe, vir = self._thermo_sp_fn(self._F, self._nloc, self._pe,
                                          self._virial)
        tot = np.asarray(tot)
        ke, ke_lambda, pe_bias = (float(v) for v in tot)
        pe = float(pe)
        vir = np.asarray(vir)
        u = self.cfg.u
        n = self.n_global
        box = self._host_box
        vol = float(np.prod(box["L"]))
        virial_tr = float(vir[0] + vir[1] + vir[2])
        dof = max(3 * n - 3, 1)
        temp = 2.0 * ke / (dof * u.boltz)
        lam_t = ke_lambda / (0.5 * u.boltz * n)
        press = (2.0 * ke + virial_tr) / (3.0 * vol) * u.nktv2p
        return {
            "step": int(self._step),
            "temp": temp,
            "pe": pe + pe_bias,
            "ke": ke,
            "ke_lambda": ke_lambda,
            "lambda_temp": lam_t,
            "etotal": ke + pe + pe_bias + ke_lambda,
            "press": press,
        }
