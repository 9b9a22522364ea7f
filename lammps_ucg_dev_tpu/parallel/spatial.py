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
a 1-D ``jax.sharding.Mesh``; the whole multi-block run is ONE ``shard_map``
program.  Each device holds fixed-capacity arrays

    rows [0, cap_local)            owned atoms ([0, nloc) valid)
    rows [cap_local, +cap_halo)    ghost images from the LEFT neighbor
    rows [.., cap_tot)             ghost images from the RIGHT neighbor

Halo exchange is a pair of ``lax.ppermute`` ring shifts over the mesh axis
(rides ICI): at reneighbor, fixed-capacity buffers of (x, λ, state, p, type,
tag) establish the ghost layer; every step, a 6-feature refresh
(x, λ, state, p) updates it.  Ghost x is stored SHIFTED (±Lx across the
periodic seam) so pair displacements never wrap in x; the virtual pair box is
non-periodic in x.  Migration packs leavers into ±1 capacity-bounded buffers,
ring-shifts them, and compacts survivors+arrivals — per-step comm volume is
surface-area × halo fields, not O(N) (contrast parallel/domain.py's
atom-decomposition all-gathers, kept as the general fallback).

Requirements: D >= 3 slabs, slab width >= cutoff + skin (so ±1 neighbors
suffice), per-atom-owned pair styles (all four UCG styles qualify).
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
    """Static decomposition geometry + local neighbor configuration."""

    n_devices: int
    cap_local: int
    cap_halo: int
    cap_mig: int
    nbr: nbrmod.NeighborSpec     # local builder over slab + 2 halo layers
    axis: str = "slabs"

    @property
    def cap_tot(self) -> int:
        return self.cap_local + 2 * self.cap_halo

    @property
    def rc(self) -> float:
        return self.nbr.rc


def make_slab_spec(n_atoms: int, box_lengths, cutoff: float, skin: float,
                   n_devices: int, cap_local: int | None = None,
                   cap_halo: int | None = None, cap_mig: int | None = None,
                   nbr_method: str | None = None, x=None) -> SlabSpec:
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
    nbr = nbrmod.make_spec(cap_tot, virt_L, cutoff, skin, method=nbr_method)
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


def make_mesh(n_devices: int, axis: str = "slabs") -> Mesh:
    devs = jax.devices()
    if len(devs) < n_devices:
        raise ValueError(
            f"requested {n_devices} devices but only {len(devs)} present")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


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
    """Slab-decomposed driver with the single-chip Simulation's physics stack
    (same pair styles, same fix ordering via ``_forces``, same thermo).

    Not supported on this path (use Simulation + parallel.domain):
    cluster_switch, the Pallas column kernel, sort_atoms, extra_post_force.
    """

    def __init__(self, system, state: SimState, pair_compute, pair_params,
                 slab: SlabSpec, cfg, mesh: Mesh | None = None,
                 cluster_switch: "tuple | None" = None,
                 log_dir: str | None = None):
        if cfg.sort_atoms:
            cfg = dataclasses.replace(cfg, sort_atoms=False)
        super().__init__(system, state, pair_compute, pair_params,
                         slab.nbr, cfg, cluster_switch=cluster_switch,
                         log_dir=log_dir)
        if cluster_switch is not None and self._is_column:
            raise NotImplementedError(
                "fix cluster_switch on slabs requires the atom-neighbor-"
                "list path (XLA pair styles), not the column kernel")
        self.slab = slab
        self.mesh = mesh if mesh is not None else make_mesh(slab.n_devices,
                                                            slab.axis)
        self.n_global = state.n_atoms
        self._migrations = 0
        self._dist(state)

    # ---- host-side distribution / gathering -------------------------------

    def _defaults(self, d: int, n_rows: int, dtype):
        """Padding-row defaults: parked at slab d's center, inert but finite."""
        box = self._host_box
        lo = np.asarray(box["lo"], np.float64)
        L = np.asarray(box["L"], np.float64)
        w = L[0] / self.slab.n_devices
        F = np.zeros((n_rows, _NMIG))
        F[:, 0] = lo[0] + (d + 0.5) * w
        F[:, 1] = lo[1] + 0.5 * L[1]
        F[:, 2] = lo[2] + 0.5 * L[2]
        F[:, 9] = 1      # tag (clipped RNG take; results discarded)
        F[:, 10] = 1     # typ (mass lookup stays finite)
        F[:, 16] = 1.0   # ucgml
        return F

    def _dist(self, state: SimState):
        """Sort atoms into slabs, pad to capacity, shard (D*cap_tot) rows."""
        sl = self.slab
        D, cap_tot = sl.n_devices, sl.cap_tot
        xw = np.asarray(state.box.wrap(state.x))
        lo = np.asarray(state.box.lo, np.float64)
        L = np.asarray(state.box.lengths, np.float64)
        self._host_box = {"lo": lo, "L": L}
        s = np.clip((xw[:, 0] - lo[0]) / L[0] * D, 0, D - 1).astype(np.int64)

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

        mesh, axis = self.mesh, sl.axis
        row_sh = NamedSharding(mesh, P(axis))
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
        D, cap_tot = sl.n_devices, sl.cap_tot
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

    def _virtual_boxes(self, box_lo, box_L, me, dtype):
        sl = self.slab
        D = sl.n_devices
        rc = jnp.asarray(sl.rc, dtype)
        w = box_L[0] / D
        slab_lo = box_lo[0] + me.astype(dtype) * w
        slab_hi = slab_lo + w
        eps = jnp.asarray(1e-3 * sl.rc, dtype)
        bin_box = Box(
            lo=jnp.stack([slab_lo - rc - eps, box_lo[1], box_lo[2]]),
            hi=jnp.stack([slab_hi + rc + eps, box_lo[1] + box_L[1],
                          box_lo[2] + box_L[2]]),
            periodic=(False, True, True))
        pair_box = Box(lo=box_lo, hi=box_lo + box_L,
                       periodic=(False, True, True))
        return slab_lo, slab_hi, bin_box, pair_box

    def _block_dev(self, F, nloc, pe, vir, key, step, run_window, params,
                   gbox: Box, nsteps: int, cswitch=None):
        """One reneighbor block on one device: migrate → halo → build →
        nsteps of Verlet.  All comm is ppermute over the mesh axis.
        ``cswitch`` = (params_cs, stats_v): run a cluster_switch event after
        the rebuild and before the Verlet steps (adds an 8th return, the
        event outputs)."""
        sl = self.slab
        axis = sl.axis
        D = sl.n_devices
        cap_local, cap_halo, cap_tot = sl.cap_local, sl.cap_halo, sl.cap_tot
        cap_mig = sl.cap_mig
        dt_ = F.dtype
        me = jax.lax.axis_index(axis)
        perm_r = [(i, (i + 1) % D) for i in range(D)]
        perm_l = [(i, (i - 1) % D) for i in range(D)]
        rows_i = jnp.arange(cap_tot, dtype=jnp.int32)
        overflow = jnp.zeros((), bool)

        box_lo, box_L = gbox.lo, gbox.lengths
        slab_lo, slab_hi, bin_box, pair_box = self._virtual_boxes(
            box_lo, box_L, me, dt_)
        rc = jnp.asarray(sl.rc, dt_)

        # ---- 1. wrap + migrate (exchange comm) ----------------------------
        x = F[:, 0:3]
        img = F[:, 6:9]
        Lv = box_L[None, :]
        shift = jnp.floor((x - box_lo[None, :]) / Lv)
        F = F.at[:, 0:3].set(x - shift * Lv)
        F = F.at[:, 6:9].set(img + shift)

        owned = rows_i < nloc
        s = jnp.clip(((F[:, 0] - box_lo[0]) / box_L[0] * D), 0, D - 1)
        s = s.astype(jnp.int32)
        off = jnp.mod(s - me, D)
        stay = owned & (off == 0)
        go_r = owned & (off == 1)
        go_l = owned & (off == D - 1)
        overflow |= jnp.any(owned & ~(stay | go_r | go_l))   # >1-slab hop

        ns_r = jnp.sum(go_r).astype(jnp.int32)
        ns_l = jnp.sum(go_l).astype(jnp.int32)
        overflow |= (ns_r > cap_mig) | (ns_l > cap_mig)
        buf_r = jnp.take(F, _take_first(go_r, cap_mig), axis=0)
        buf_l = jnp.take(F, _take_first(go_l, cap_mig), axis=0)
        in_l = jax.lax.ppermute(buf_r, axis, perm_r)     # from left neighbor
        n_in_l = jax.lax.ppermute(ns_r, axis, perm_r)
        in_r = jax.lax.ppermute(buf_l, axis, perm_l)     # from right neighbor
        n_in_r = jax.lax.ppermute(ns_l, axis, perm_l)

        nkeep = jnp.sum(stay).astype(jnp.int32)
        Fs = jnp.take(F, _take_first(stay, cap_tot), axis=0)
        mi = jnp.arange(cap_mig, dtype=jnp.int32)
        dst_l = jnp.where(mi < n_in_l, nkeep + mi, cap_tot)
        Fs = Fs.at[dst_l].set(in_l, mode="drop")
        dst_r = jnp.where(mi < n_in_r, nkeep + n_in_l + mi, cap_tot)
        Fs = Fs.at[dst_r].set(in_r, mode="drop")
        nloc = nkeep + n_in_l + n_in_r
        overflow |= nloc > cap_local
        n_migrated = ns_r + ns_l

        # reset non-owned rows to inert defaults (parked at slab center)
        owned = rows_i < nloc
        dflt = jnp.zeros((_NMIG,), dt_)
        dflt = dflt.at[0].set(slab_lo + 0.5 * box_L[0] / D)
        dflt = dflt.at[1].set(box_lo[1] + 0.5 * box_L[1])
        dflt = dflt.at[2].set(box_lo[2] + 0.5 * box_L[2])
        dflt = dflt.at[9].set(1.0).at[10].set(1.0).at[16].set(1.0)
        Fm = jnp.where(owned[:, None], Fs, dflt[None, :])

        # ---- 2. halo establishment (border comm) --------------------------
        xl = Fm[:, 0]
        near_l = owned & (xl < slab_lo + rc)
        near_r = owned & (xl >= slab_hi - rc)
        nh_l = jnp.sum(near_l).astype(jnp.int32)
        nh_r = jnp.sum(near_r).astype(jnp.int32)
        overflow |= (nh_l > cap_halo) | (nh_r > cap_halo)
        src_l = _take_first(near_l, cap_halo)    # refreshed every step
        src_r = _take_first(near_r, cap_halo)

        # establishment features: x3, ucgl, ucgstate, ucgp, typ, tag, mol
        # (mol rides along so ghost contact edges map to molecules — the
        # border-comm molecule field, atom_vec_ucg.cpp:66-69)
        hcols = jnp.stack([Fm[:, 0], Fm[:, 1], Fm[:, 2], Fm[:, 14],
                           Fm[:, 13], Fm[:, 17], Fm[:, 10], Fm[:, 9],
                           Fm[:, 11]], axis=1)
        from_l = jax.lax.ppermute(jnp.take(hcols, src_r, axis=0), axis, perm_r)
        n_from_l = jax.lax.ppermute(nh_r, axis, perm_r)
        from_r = jax.lax.ppermute(jnp.take(hcols, src_l, axis=0), axis, perm_l)
        n_from_r = jax.lax.ppermute(nh_l, axis, perm_l)
        # ghost x shifted across the periodic seam so pair dx never wraps
        shift_l = jnp.where(me == 0, -box_L[0], jnp.zeros((), dt_))
        shift_r = jnp.where(me == D - 1, box_L[0], jnp.zeros((), dt_))
        from_l = from_l.at[:, 0].add(shift_l)
        from_r = from_r.at[:, 0].add(shift_r)

        hi_ = jnp.arange(cap_halo, dtype=jnp.int32)
        hval_l = hi_ < n_from_l
        hval_r = hi_ < n_from_r

        def halo_into(Fm, recv, hval, base):
            rows = jnp.where(hval[:, None], jnp.concatenate([
                recv[:, 0:3],                                      # x
                jnp.zeros((cap_halo, 6), dt_),                     # v, image
                recv[:, 7:8], recv[:, 6:7],                        # tag, typ
                recv[:, 8:9],                                      # mol
                jnp.zeros((cap_halo, 1), dt_),                     # q
                recv[:, 4:5], recv[:, 3:4],                        # state, λ
                jnp.zeros((cap_halo, 1), dt_),                     # ucgvl
                jnp.ones((cap_halo, 1), dt_),                      # ucgml
                recv[:, 5:6],                                      # ucgp
                jnp.zeros((cap_halo, _NMIG - 18), dt_),
            ], axis=1), dflt[None, :])
            return jax.lax.dynamic_update_slice(
                Fm, rows, (jnp.asarray(base, jnp.int32), jnp.zeros((), jnp.int32)))

        Fm = halo_into(Fm, from_l, hval_l, cap_local)
        Fm = halo_into(Fm, from_r, hval_r, cap_local + cap_halo)
        valid = jnp.concatenate([rows_i[:cap_local] < nloc, hval_l, hval_r])

        # ---- 3. local neighbor build ---------------------------------------
        # ghost rows are candidates (j) but own no list (i): every tally is
        # owned-atom-owned, so pe/virial psums count each pair exactly twice
        # (both directed halves) — same bookkeeping as the single-chip path.
        # Column (fused-kernel) path: the same ColumnSpec machinery as a
        # single chip, on the slab's non-periodic-x virtual box — padding
        # rows are dropped via ``valid`` and ghost i-slots stop tallying
        # pe/virial via ``restrict_i`` (the kernel analogue of i_valid).
        i_owned = jnp.concatenate(
            [rows_i[:cap_local] < nloc, jnp.zeros((2 * cap_halo,), bool)])
        if self._is_column:
            sim0, fout0 = self._sim_of(Fm, pe, vir, key, step, bin_box)
            nbr = colpack.restrict_i(
                colpack.build(sim0.x, bin_box, self.nbr_spec, valid=valid),
                i_owned)
        else:
            sim0, fout0 = self._sim_of(Fm, pe, vir, key, step, pair_box)
            nbr = nbrmod.build(sim0.x, bin_box, sl.nbr, valid=valid,
                               i_valid=i_owned)
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
            rl = jax.lax.ppermute(jnp.take(a2, src_r, axis=0), axis, perm_r)
            rr = jax.lax.ppermute(jnp.take(a2, src_l, axis=0), axis, perm_l)

            def put(dst, recv, hval, base):
                cur = jax.lax.dynamic_slice_in_dim(dst, base, cap_halo)
                new = jnp.where(hval[:, None], recv, cur)
                return jax.lax.dynamic_update_slice_in_dim(dst, new, base,
                                                           axis=0)

            a2 = put(a2, rl, hval_l, cap_local)
            a2 = put(a2, rr, hval_r, cap_local + cap_halo)
            return a2[:, 0] if vec else a2

        def wrap_pair(fn):
            """Bind the phase-boundary halo exchange into styles that
            declare they need it (density styles P3/P4)."""
            target = fn if fn is not None else self.pair_compute
            if getattr(target, "supports_halo_xchg", False):
                return lambda s, nb_, p: target(s, nb_, p, xchg=xchg)
            return fn

        def refresh(sim_s):
            dyn = jnp.stack([sim_s.x[:, 0], sim_s.x[:, 1], sim_s.x[:, 2],
                             sim_s.ucgl,
                             sim_s.ucgstate.astype(dt_), sim_s.ucgp], axis=1)
            rl = jax.lax.ppermute(jnp.take(dyn, src_r, axis=0), axis, perm_r)
            rr = jax.lax.ppermute(jnp.take(dyn, src_l, axis=0), axis, perm_l)
            rl = rl.at[:, 0].add(shift_l)
            rr = rr.at[:, 0].add(shift_r)

            def put(sim_s, recv, hval, base):
                sel = lambda new, cur: jnp.where(hval, new, cur)
                upd = {}
                xh = jax.lax.dynamic_slice_in_dim(sim_s.x, base, cap_halo)
                upd["x"] = jax.lax.dynamic_update_slice_in_dim(
                    sim_s.x, jnp.where(hval[:, None], recv[:, 0:3], xh),
                    base, axis=0)
                for name, col, cast in (("ucgl", 3, dt_),
                                        ("ucgstate", 4, jnp.int32),
                                        ("ucgp", 5, dt_)):
                    cur = jax.lax.dynamic_slice_in_dim(
                        getattr(sim_s, name), base, cap_halo)
                    new = recv[:, col]
                    new = (jnp.round(new).astype(jnp.int32)
                           if cast == jnp.int32 else new.astype(dt_))
                    upd[name] = jax.lax.dynamic_update_slice_in_dim(
                        getattr(sim_s, name), sel(new, cur), base, axis=0)
                return dataclasses.replace(sim_s, **upd)

            sim_s = put(sim_s, rl, hval_l, cap_local)
            sim_s = put(sim_s, rr, hval_r, cap_local + cap_halo)
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
            sim_cs, stats2, info = fcs.apply(
                sub, sim0, nbr, params_cs, fcs.ClusterSwitchStats(v=stats_v),
                axis=axis, valid=valid)
            sim0 = dataclasses.replace(sim0, typ=sim_cs.typ)
            sim0, fout0 = self._forces(sim0, nbr, run_window,
                                       pair_params=params,
                                       pair_fn=wrap_pair(None))
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
                                           scores_valid=scores_valid)
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
                                       pair_fn=wrap_pair(None))
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
            if fast_fn is not None and nsteps > 1:
                (sim1, fout1), _ = jax.lax.scan(
                    make_body(fast_fn, scores_valid=fast_scores),
                    (sim0, fout0), None, length=nsteps - 1)
                (sim1, fout1), _ = make_body(None)((sim1, fout1), None)
            else:
                (sim1, fout1), _ = jax.lax.scan(
                    make_body(None), (sim0, fout0), None, length=nsteps)
        danger = nbrmod.displacement_check(nbr, sim1.x, pair_box, sl.nbr.skin)

        F1 = _pack_mig(sim1, fout1)
        # owned-row partial sums; halo i-rows tally nothing by construction
        pe1 = jax.lax.psum(fout1.pe, axis)
        vir1 = jax.lax.psum(fout1.virial, axis)
        flags = {
            "overflow": jax.lax.psum(overflow.astype(jnp.int32), axis) > 0,
            "danger": jax.lax.psum(danger.astype(jnp.int32), axis) > 0,
            "max_occ": jax.lax.pmax(nbr.max_occupancy, axis),
            "migrated": jax.lax.psum(n_migrated, axis),
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
            pa, rep = P(self.slab.axis), P()
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
                tot = jax.lax.psum(loc, sl.axis)
                return tot, pe, vir

            pa, rep = P(sl.axis), P()
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
