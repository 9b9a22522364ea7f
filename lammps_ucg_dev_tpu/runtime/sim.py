"""The MD driver: TPU-native equivalent of ``Verlet::run`` + ``Modify``
callbacks (SURVEY.md §3.1).

One timestep =
    initial_integrate (fix nve/ucgld[/wall/hard])       fix_nve_ucgld.cpp:44
    [reneighbor at block cadence]
    force_clear + pair compute                          pair_table_*.cpp
    post_force fixes in order:
        ucgld/langevin (λ drag + kick)                  fix_ucgld_langevin.cpp:202
        wall/hard bias (optional)                       fix_nve_ucgld_wall_hard.cpp:241
        ucgstate (posteriors / state assignment)        fix_ucgstate.cpp:88
    final_integrate                                     fix_nve_ucgld.cpp:104
    end_of_step (λ-temperature)                         fix_ucgld_langevin.cpp:303

The whole inner block (reneigh_every steps) is one ``lax.scan`` under ``jit``;
neighbor rebuild + position wrapping happen at block boundaries, also under
``jit``.  Zero host round-trips inside a block.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core import units as units_mod
from lammps_ucg_dev_tpu.core.state import ForceOut, SimState, System
from lammps_ucg_dev_tpu.fixes import cluster_switch as fcs
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.fixes import langevin as fl
from lammps_ucg_dev_tpu.fixes import ucgstate as fs
from lammps_ucg_dev_tpu.ops import colpack
from lammps_ucg_dev_tpu.ops import neighbor as nbrmod


@dataclasses.dataclass(frozen=True)
class SimConfig:
    dt: float
    units: str = "lj"
    integrator: fi.IntegratorCfg = fi.IntegratorCfg()
    langevin: fl.LangevinCfg | None = None
    vlangevin: fl.VLangevinCfg | None = None   # stock velocity thermostat
    ucgstate: fs.UCGStateCfg | None = None
    reneigh_every: int = 10
    reneigh_check: bool = True    # neigh_modify check yes|no: rebuild at
                                  # block cadence only when the displacement
                                  # check demands it (True) or always (False)
    respa_inner: int = 1          # r-RESPA inner loop: bonded forces at the
                                  # fast level, pair at the outer level
                                  # (fix_nve_ucgld.cpp:155-173 + stock Respa)
    check_safety: bool = True     # fetch overflow/danger flags every block
    sort_atoms: bool = False      # reorder atoms by cell at reneighbor for
                                  # gather locality (LAMMPS atom-sort analogue;
                                  # identity preserved via SimState.tag)

    @property
    def u(self) -> units_mod.UnitSystem:
        return units_mod.get(self.units)

    @property
    def kT(self) -> float:
        """Thermostat target kT seen by pair styles at init
        (pair init_style pulls t_target; pair_table_ucgld.cpp:872-881 —
        "any thermostat fix": λ-Langevin first, else the stock velocity
        Langevin)."""
        if self.langevin is not None:
            return self.u.boltz * self.langevin.t_start
        if self.vlangevin is not None:
            return self.u.boltz * self.vlangevin.t_start
        return 0.0


class Simulation:
    """Assembles state + pair style + fixes into a jitted stepper.

    ``pair_compute(state, nbr, params) -> ForceOut`` is the pair-style entry;
    params is a pytree passed through jit.
    """

    def __init__(
        self,
        system: System,
        state: SimState,
        pair_compute: Callable,
        pair_params: Any,
        nbr_spec: nbrmod.NeighborSpec,
        cfg: SimConfig,
        extra_post_force: Callable | None = None,
        cluster_switch: "tuple | None" = None,   # (params, switch_freq)
        log_dir: str | None = None,
        bonded: "Any | None" = None,             # models.bonded.BondedParams
        excl_tags: "np.ndarray | None" = None,   # (N, S) special-tag lists
    ):
        self.system = system
        self.state = state
        self.pair_compute = pair_compute
        self.pair_params = pair_params
        self.nbr_spec = nbr_spec
        # nbr_spec is either a NeighborSpec (XLA pair path: padded atom
        # neighbor lists) or a colpack.ColumnSpec (fused Pallas kernel path:
        # column/z-page candidate structure); both builders return objects
        # with x0/overflow/max_occupancy, so the driver is agnostic
        self._is_column = isinstance(nbr_spec, colpack.ColumnSpec)
        self.cfg = cfg
        self.extra_post_force = extra_post_force
        self._masses_by_type = jnp.asarray(system.masses, dtype=state.x.dtype)
        self.cswitch = cluster_switch
        self.bonded = bonded
        if excl_tags is not None and not np.any(excl_tags):
            excl_tags = None                     # nothing excluded
        self.excl_tags = (jnp.asarray(excl_tags, jnp.int32)
                          if excl_tags is not None else None)
        if (self.excl_tags is not None and self._is_column
                and getattr(pair_compute, "excl_delta", None) is None):
            raise NotImplementedError(
                "special exclusions on the column-kernel path need the "
                "style's excl_delta (compute-and-subtract) — table_ucgld "
                "and table_ucg_bethe provide one; use the atom-neighbor-"
                "list path (NeighborSpec) for other styles")
        # bonded terms are additive and path-independent (folded into
        # _forces); exclusions on the kernel path are computed by the
        # kernel (no per-pair identity channel exists) and cancelled by
        # subtracting the style's excl_delta over the special lists
        self._excl_rows_static = None
        if self.excl_tags is not None and self._is_column:
            # column-path rows never permute (sort_atoms applies only to
            # the cell-list method), so the tag→row map is a constant
            n = state.n_atoms
            inv = jnp.zeros((n,), jnp.int32).at[state.tag - 1].set(
                jnp.arange(n, dtype=jnp.int32))
            et = jnp.take(self.excl_tags, state.tag - 1, axis=0)
            self._excl_rows_static = jnp.where(
                et > 0, inv[jnp.clip(et - 1, 0, n - 1)], n)
        self.cswitch_stats = (
            fcs.ClusterSwitchStats.zeros(state.x.dtype) if cluster_switch else None
        )
        # scores are dynamically inert when nothing converts them into state
        # that feeds back into forces: fix ucgstate absent, or 'ld' mode
        # (ucgp = softmax(scores) is observable-only there — the λ integrator
        # owns state/λ; fix_ucgstate.cpp:52-54).  extra_post_force may read
        # fout.scores, so its presence disables the optimization.
        self._scores_inert = (
            (cfg.ucgstate is None or not cfg.ucgstate.enabled
             or cfg.ucgstate.mode == "ld")
            and extra_post_force is None)
        # slot-major interior residency: per-atom state lives in the column
        # list's real-slot order for the interior steps of a reneighbor
        # block, so the per-step atom→slot pack gather and slot→atom
        # out-take vanish.  Requires the fused column kernel (slot_fast
        # variant), f32 state (slot attrs are the kernel's f32 input), and
        # no atom-space extra_post_force.  Every fix used inside the block
        # (integrate/langevin/ucgstate) is elementwise with tag-keyed RNG,
        # so trajectories are identical to the atom-ordered path.
        self._slot_ok = (
            self._is_column and extra_post_force is None
            and state.x.dtype == jnp.float32
            and self.bonded is None and self.excl_tags is None
            and getattr(pair_compute, "slot_fast", None) is not None)
        self.log_dir = log_dir
        self._cswitch_jit = None
        self._cs_spec = None
        if cluster_switch is not None:
            params_cs, freq = cluster_switch
            if freq % cfg.reneigh_every != 0:
                raise ValueError(
                    "cluster_switch frequency must be a multiple of "
                    f"reneigh_every (got {freq} vs {cfg.reneigh_every})"
                )
            if self._is_column:
                # the column kernel owns the pair path; the event builds its
                # own small atom-neighbor CONTACT list (cutoff = the switch
                # contact distance, typically << pair rc) — the analogue of
                # the reference reusing the pair half-list for contacts
                # (fix_cluster_switch.cpp:537-560), except contacts get a
                # right-sized list instead of the pair candidate structure
                cut_cs = float(np.sqrt(float(params_cs.cutsq)))
                self._cs_spec = nbrmod.make_spec(
                    state.n_atoms, np.asarray(state.box.lengths, np.float64),
                    cut_cs, 0.0, method="cell")
            self._cswitch_jit = jax.jit(self._cswitch_impl)
        self._fcarry: ForceOut | None = None
        self._nbr = None
        self._block = jax.jit(
            partial(self._block_impl), static_argnames=("nsteps",)
        )
        self.thermo_rows: list[dict] = []
        self.dangerous_builds = 0

    # ---- one force evaluation + post-force fixes -------------------------

    def _forces(self, state: SimState, nbr, run_window, pair_params=None,
                pair_fn=None, scores_valid=True, topo=None):
        """``topo``: per-device topology row maps under the spatial drivers
        ({"excl_rows", "rows", "nloc"}, built once per reneighbor block by
        SpatialSimulation._block_dev); None = single-chip (static row maps /
        global tag→row bonded compute)."""
        cfg = self.cfg
        u = cfg.u
        if pair_params is None:
            pair_params = self.pair_params
        fout = (pair_fn or self.pair_compute)(state, nbr, pair_params)
        excl_rows = (self._excl_rows_static if topo is None
                     else topo.get("excl_rows"))
        if self._is_column and excl_rows is not None:
            # the column kernel computed every in-cutoff pair including the
            # special exclusions; subtract their contributions, evaluated
            # with the kernel's own functional (ops/pallas_pair.excl_delta)
            d = self.pair_compute.excl_delta(state, excl_rows, pair_params)
            fout = dataclasses.replace(
                fout, f=fout.f - d.f, ucgforce=fout.ucgforce - d.ucgforce,
                scores=fout.scores - d.scores, pe=fout.pe - d.pe,
                virial=fout.virial - d.virial,
                oob_low=(fout.oob_low - d.oob_low
                         if fout.oob_low is not None else None))
        if self.bonded is not None and cfg.respa_inner == 1:
            # single-level Verlet: bonded terms fold into the pair pass;
            # under r-RESPA they live at the inner level (_block_impl)
            from lammps_ucg_dev_tpu.models import bonded as bd

            if topo is None:
                bf, bpe, bvir = bd.compute(state, self.bonded)
            else:
                bf, bpe, bvir = bd.compute_spatial(state, self.bonded,
                                                   topo["rows"],
                                                   topo["nloc"])
            fout = dataclasses.replace(
                fout, f=fout.f + bf, pe=fout.pe + bpe,
                virial=fout.virial + bvir)

        key = state.key
        ucgforce = fout.ucgforce
        if cfg.langevin is not None and cfg.langevin.enabled:
            key, sub = jax.random.split(key)
            tT = fl.t_target(cfg.langevin, state.step, run_window[0], run_window[1])
            ucgforce = ucgforce + fl.post_force(sub, state, tT, cfg.dt, u, cfg.langevin)
        if cfg.vlangevin is not None and cfg.vlangevin.enabled:
            # stock fix langevin on velocities (post_force; drag + kick do
            # not enter pe/virial, matching LAMMPS per-pair virial tallies)
            key, sub = jax.random.split(key)
            tTv = fl.t_target(cfg.vlangevin, state.step, run_window[0],
                              run_window[1])
            mass = self._masses_by_type[state.typ]
            fout = dataclasses.replace(
                fout, f=fout.f + fl.post_force_v(sub, state, mass, tTv,
                                                 cfg.dt, u, cfg.vlangevin))
        if cfg.integrator.wall and cfg.integrator.bias_potential:
            bf = fi.bias_force(state.ucgl, cfg.integrator.barrier)
            g = fi.group_mask(cfg.integrator, state)
            if g is not None:
                bf = jnp.where(g, bf, 0.0)
            ucgforce = ucgforce + bf
        if self.extra_post_force is not None:
            state, ucgforce = self.extra_post_force(state, ucgforce, fout)

        if cfg.ucgstate is not None and cfg.ucgstate.enabled:
            # the split happens even when the update is skipped (interior
            # no-scores steps) so the RNG stream — and hence the Langevin
            # noise sequence — is identical across kernel variants
            key, sub = jax.random.split(key)
            if scores_valid:
                is_ucg = self._is_ucg(state)
                state = fs.post_force(sub, state, fout.scores, is_ucg,
                                      cfg.ucgstate)
        elif fout.ucgp is not None:
            state = dataclasses.replace(state, ucgp=fout.ucgp)

        state = dataclasses.replace(state, key=key)
        fout = dataclasses.replace(fout, ucgforce=ucgforce)
        return state, fout

    def _is_ucg(self, state: SimState):
        tp = getattr(self.pair_params, "tp", None)
        if tp is None:
            return jnp.ones(state.n_atoms, dtype=bool)
        return tp.n_states[state.typ] > 1

    def _verlet_body(self, nbr, run_window, pair_fn=None, scores_valid=True):
        """One velocity-Verlet step as a lax.scan body over (state, fout).
        Works on atom-ordered state AND on slot-resident state (the slot
        interior loop): every fix is elementwise with tag-keyed RNG."""
        cfg = self.cfg

        def body(carry, _):
            state, fout_prev = carry
            mass = self._masses_by_type[state.typ]
            state = fi.initial_integrate(
                state, fout_prev.f, fout_prev.ucgforce, mass, cfg.dt,
                cfg.u.ftm2v, cfg.integrator,
            )
            state, fout = self._forces(state, nbr, run_window,
                                       pair_fn=pair_fn,
                                       scores_valid=scores_valid)
            if fout.ucgp is None and fout_prev.ucgp is not None:
                # score-free interior of an in-pass-posterior style (P3):
                # keep the carried posterior so the scan pytree is stable
                # (the block's full-kernel step refreshes it)
                fout = dataclasses.replace(fout, ucgp=fout_prev.ucgp)
            state = fi.final_integrate(
                state, fout.f, fout.ucgforce, mass, cfg.dt,
                cfg.u.ftm2v, cfg.integrator,
            )
            state = dataclasses.replace(state, step=state.step + 1)
            return (state, fout), None
        return body

    @staticmethod
    def _bc(a):
        # int fields ride the wide f32 gather by VALUE, not bitcast: f32 is
        # exact for |v| < 2^24 (tags <= N <= 2^20; typ/mol/ucgstate/image
        # are tiny), while a bitcast of a small int is an f32 DENORMAL,
        # which the TPU flushes to zero in any fused elementwise producer
        return a.astype(jnp.float32)

    @staticmethod
    def _ib(a):
        return a.astype(jnp.int32)

    def _to_slots(self, state: SimState, fcarry: ForceOut, nbr):
        """Re-express (state, fcarry) in the column list's real-slot order
        (pads/ghost-copy rows poisoned) with ONE wide row gather instead of
        16 per-field gathers (row gathers are latency-bound, not
        bytes-bound): all f32 fields + bitcast i32 fields ride a single
        (N+1, 24) matrix.  Column map:
        0:3 x | 3:6 v | 6 ucgl | 7 ucgvl | 8 ucgml | 9 ucgp | 10 q |
        11:14 f | 14 ucgforce | 15:17 scores | 17 tag | 18 typ | 19 mol |
        20:23 image | 23 ucgstate"""
        n = state.n_atoms
        sar = colpack.slot_atom_real(nbr, n)
        bc, ib = self._bc, self._ib
        M = jnp.concatenate([
            state.x, state.v, state.ucgl[:, None], state.ucgvl[:, None],
            state.ucgml[:, None], state.ucgp[:, None], state.q[:, None],
            fcarry.f, fcarry.ucgforce[:, None], fcarry.scores,
            bc(state.tag)[:, None], bc(state.typ)[:, None],
            bc(state.mol)[:, None], bc(state.image),
            bc(state.ucgstate)[:, None],
        ], axis=1)
        one = bc(jnp.ones((), jnp.int32))
        pad = jnp.zeros((1, M.shape[1]), jnp.float32)
        pad = pad.at[0, 0:3].set(colpack._PAD_POISON)       # x poisoned
        pad = pad.at[0, 8].set(1.0)                         # ucgml (no /0)
        pad = pad.at[0, 9].set(-1.0)                        # ucgp sentinel
        pad = pad.at[0, 17].set(one).at[0, 18].set(one)     # tag/typ = 1
        Ms = jnp.concatenate([M, pad], axis=0)[sar]         # (n_slots, 24)

        slot_state = dataclasses.replace(
            state,
            x=Ms[:, 0:3], v=Ms[:, 3:6], ucgl=Ms[:, 6], ucgvl=Ms[:, 7],
            ucgml=Ms[:, 8], ucgp=Ms[:, 9], q=Ms[:, 10],
            tag=ib(Ms[:, 17]), typ=ib(Ms[:, 18]), mol=ib(Ms[:, 19]),
            image=ib(Ms[:, 20:23]), ucgstate=ib(Ms[:, 23]),
            n_total=state.rng_n,
        )
        slot_fout = dataclasses.replace(
            fcarry, f=Ms[:, 11:14], ucgforce=Ms[:, 14],
            scores=Ms[:, 15:17])
        if fcarry.ucgp is not None:
            # in-pass-posterior styles (P3) carry ucgp in the ForceOut
            up = jnp.concatenate(
                [fcarry.ucgp, jnp.zeros((1,), fcarry.ucgp.dtype)])[sar]
            slot_fout = dataclasses.replace(slot_fout, ucgp=up)
        return slot_state, slot_fout

    def _from_slots(self, state: SimState, slot_state: SimState,
                    slot_fout: ForceOut, nbr):
        """Take the dynamic fields back to atom order with one wide take.
        Column map: 0:3 x | 3:6 v | 6 ucgl | 7 ucgvl | 8 ucgp | 9:12 f |
        12 ucgforce | 13:15 scores | 15 ucgstate"""
        bc, ib = self._bc, self._ib
        E = jnp.concatenate([
            slot_state.x, slot_state.v, slot_state.ucgl[:, None],
            slot_state.ucgvl[:, None], slot_state.ucgp[:, None],
            slot_fout.f, slot_fout.ucgforce[:, None], slot_fout.scores,
            bc(slot_state.ucgstate)[:, None],
        ], axis=1)
        Et = jnp.take(E, nbr.atom_slot, axis=0)             # (N, 16)
        state = dataclasses.replace(
            state,
            x=Et[:, 0:3], v=Et[:, 3:6], ucgl=Et[:, 6], ucgvl=Et[:, 7],
            ucgp=Et[:, 8], ucgstate=ib(Et[:, 15]),
            key=slot_state.key, step=slot_state.step,
        )
        fout = dataclasses.replace(
            slot_fout,
            f=Et[:, 9:12], ucgforce=Et[:, 12], scores=Et[:, 13:15],
        )
        if slot_fout.ucgp is not None:
            fout = dataclasses.replace(
                fout, ucgp=jnp.take(slot_fout.ucgp, nbr.atom_slot, axis=0))
        return state, fout

    def _slot_interior(self, state: SimState, fcarry: ForceOut, nbr,
                       run_window, k: int, slot_fn, scores_valid: bool):
        """Run k interior Verlet steps with per-atom state RESIDENT in the
        column list's real-slot order (pads/ghost-copy rows poisoned).
        Entry/exit are one wide gather each per block; inside, the kernel
        consumes the slot arrays directly (colpack.pack_slots) and its
        output rows feed the integrator with no reordering.  Trajectories
        are identical to the atom-ordered interior: same op order, same
        tag-keyed RNG streams, same f32 arithmetic."""
        slot_state, slot_fout = self._to_slots(state, fcarry, nbr)
        body = self._verlet_body(nbr, run_window, pair_fn=slot_fn,
                                 scores_valid=scores_valid)
        (slot_state, slot_fout), _ = jax.lax.scan(
            body, (slot_state, slot_fout), None, length=k)
        return self._from_slots(state, slot_state, slot_fout, nbr)

    # ---- one jitted block: reneighbor + nsteps of Verlet ------------------

    def _block_impl(self, state: SimState, fcarry: ForceOut, run_window,
                    nsteps: int, nbr=None):
        cfg = self.cfg

        def rebuild(state, fcarry):
            # PBC remap happens ONLY together with a rebuild (LAMMPS remaps
            # at reneighbor): the column list's ghost/z-slot assignments
            # assume coordinates stay continuous over the list's lifetime —
            # wrapping mid-life would teleport boundary crossers by ±L
            # under the kernel path (the XLA path min-images per pair and
            # would not care)
            x_w, image = state.box.wrap(state.x, state.image)
            state = dataclasses.replace(state, x=x_w, image=image)
            if (cfg.sort_atoms
                    and getattr(self.nbr_spec, "method", None) == "cell"):
                cps = np.asarray(self.nbr_spec.cells_per_side)
                cid, _ = nbrmod._cell_index(state.x, state.box, cps)
                order = jnp.argsort(cid, stable=True).astype(jnp.int32)
                state = state.permute(order)
                fcarry = dataclasses.replace(
                    fcarry,
                    f=jnp.take(fcarry.f, order, axis=0),
                    ucgforce=jnp.take(fcarry.ucgforce, order, axis=0),
                    scores=jnp.take(fcarry.scores, order, axis=0),
                )
            return state, fcarry, self._nbr_build(state)

        if nbr is None or not cfg.reneigh_check:
            state, fcarry, nbr = rebuild(state, fcarry)
        else:
            # LAMMPS `neigh_modify check yes` semantics at block cadence:
            # the (expensive) rebuild runs only when some atom moved more
            # than skin/2 since the carried structure was built — all
            # structures are fixed-shape, so the skip is a jit-safe
            # lax.cond.  Exposure to within-block drift is identical to the
            # unconditional-rebuild scheme (both check at block boundaries;
            # the end-of-block danger flag reports violations either way).
            # Scale note: the trigger is a MAX over atoms, so at large N the
            # 5-sigma displacement tail crosses skin/2 nearly every block
            # and the cond degenerates to rebuild-per-block (measured at
            # 262k, T~1, dt 4e-3, skin 0.4); the win appears for smaller or
            # colder systems.  dangerous_builds counts blocks whose end
            # state exceeded the criterion — a conservative over-count of
            # LAMMPS's per-step "dangerous build" (we check once per block);
            # the NVE drift acceptance (4e-5 << 1e-4) bounds the actual
            # physics exposure.
            need = nbrmod.displacement_check(nbr, state.x, state.box,
                                             self.nbr_spec.skin)
            state, fcarry, nbr = jax.lax.cond(
                need, rebuild, lambda s, f: (s, f, nbr), state, fcarry)

        if cfg.respa_inner > 1:
            if self.bonded is None:
                raise ValueError("respa_inner > 1 requires bonded terms "
                                 "(the fast level)")
            from lammps_ucg_dev_tpu.models import bonded as bd

            bonded_f = lambda st: bd.compute(st, self.bonded)[0]
            dt_in = cfg.dt / cfg.respa_inner

            def body(carry, _):
                state, fout, fbond = carry
                mass = self._masses_by_type[state.typ]
                state = fi.respa_outer_initial(
                    state, fout.f, fout.ucgforce, mass, cfg.dt,
                    cfg.u.ftm2v, cfg.integrator)

                def inner(c, _):
                    st, fb = c
                    st, fb = fi.respa_inner_step(
                        st, fb, mass, dt_in, cfg.u.ftm2v, cfg.integrator,
                        bonded_f)
                    return (st, fb), None

                (state, fbond), _ = jax.lax.scan(
                    inner, (state, fbond), None, length=cfg.respa_inner)
                state, fout = self._forces(state, nbr, run_window)
                state = fi.respa_outer_final(
                    state, fout.f, fout.ucgforce, mass, cfg.dt,
                    cfg.u.ftm2v, cfg.integrator)
                state = dataclasses.replace(state, step=state.step + 1)
                return (state, fout, fbond), None

            (state, fout, _), _ = jax.lax.scan(
                body, (state, fcarry, bonded_f(state)), None, length=nsteps)
        else:
            def make_body(pair_fn, scores_valid=True):
                return self._verlet_body(nbr, run_window, pair_fn,
                                         scores_valid)

            fast_fn = getattr(self.pair_compute, "fast_variant", None)
            fast_scores = True
            if fast_fn is not None and self._scores_inert:
                # scores have no dynamical feedback in this deck (fix
                # ucgstate absent or 'ld' — ucgp is observable-only): run
                # the score-free interior kernel and defer the ucgp update
                # to the block's full-kernel step, where thermo/dump read it
                nos = getattr(self.pair_compute, "fast_variant_noscores",
                              None)
                if nos is not None:
                    fast_fn = nos
                    fast_scores = False
            if self._slot_ok and nsteps > 1:
                # slot-major interior: state resides in slot order for the
                # nsteps-1 interior steps; the block's last step runs the
                # full kernel in atom order for pe/virial/oob
                slot_fn = self.pair_compute.slot_fast
                if not fast_scores:
                    slot_fn = getattr(self.pair_compute,
                                      "slot_fast_noscores", slot_fn)
                state, fout = self._slot_interior(
                    state, fcarry, nbr, run_window, nsteps - 1, slot_fn,
                    fast_scores)
                (state, fout), _ = make_body(None)((state, fout), None)
            elif fast_fn is not None and nsteps > 1:
                # LAMMPS eflag/vflag pattern: interior steps run the fast
                # pair variant (forces/λ-forces/scores only); the block's
                # last step runs the full kernel so the carried ForceOut
                # holds valid pe/virial/oob for thermo
                (state, fout), _ = jax.lax.scan(
                    make_body(fast_fn, scores_valid=fast_scores),
                    (state, fcarry), None, length=nsteps - 1)
                (state, fout), _ = make_body(None)((state, fout), None)
            else:
                (state, fout), _ = jax.lax.scan(
                    make_body(None), (state, fcarry), None, length=nsteps)
        danger = nbrmod.displacement_check(nbr, state.x, state.box, self.nbr_spec.skin)
        return state, fout, nbr, nbr.overflow, nbr.max_occupancy, danger

    def _nbr_build(self, state: SimState):
        if self._is_column:
            return colpack.build(state.x, state.box, self.nbr_spec)
        excl = None
        if self.excl_tags is not None:
            # special-tag lists → current storage rows (tags are stable under
            # sort_atoms; 0 padding → the n sentinel no candidate matches)
            n = state.n_atoms
            inv = jnp.zeros((n,), jnp.int32).at[state.tag - 1].set(
                jnp.arange(n, dtype=jnp.int32))
            et = jnp.take(self.excl_tags, state.tag - 1, axis=0)
            excl = jnp.where(et > 0, inv[jnp.clip(et - 1, 0, n - 1)], n)
        return nbrmod.build(state.x, state.box, self.nbr_spec, excl=excl)

    # ---- cluster_switch event (PRE_EXCHANGE analogue) ---------------------

    def _cswitch_impl(self, state: SimState, stats):
        params_cs, _ = self.cswitch
        x_w, image = state.box.wrap(state.x, state.image)
        state = dataclasses.replace(state, x=x_w, image=image)
        spec = self._cs_spec if self._is_column else self.nbr_spec
        nbr = nbrmod.build(state.x, state.box, spec)
        key, sub = jax.random.split(state.key)
        state = dataclasses.replace(state, key=key)
        st2, stats2, info = fcs.apply(sub, state, nbr, params_cs, stats)
        return st2, stats2, dict(info, nbr_overflow=nbr.overflow)

    def _maybe_cluster_switch(self):
        if self.cswitch is None:
            return
        _, freq = self.cswitch
        step = int(self.state.step)
        if step == 0 or step % freq != 0:
            return
        self.state, self.cswitch_stats, info = self._cswitch_jit(
            self.state, self.cswitch_stats)
        if self.cfg.check_safety and bool(info["nbr_overflow"]):
            raise RuntimeError(
                "cluster_switch contact-list capacity exceeded")
        if not bool(info["converged"]):
            raise RuntimeError(
                "cluster_switch label propagation hit max_sweeps without "
                "converging — cluster labels may be wrong (raise max_sweeps)")
        # force recomputation after type flips
        self._fcarry = None
        if self.log_dir is not None:
            # rank-0 event logs (fix_cluster_switch.cpp:704-725)
            inc = np.asarray(info["in_cluster"]).astype(int)
            ms = np.asarray(info["mol_state"])
            with open(f"{self.log_dir}/cluster_assignment.log", "a") as fh:
                fh.write(f"{step} " + " ".join(map(str, inc.tolist())) + "\n")
            with open(f"{self.log_dir}/state_assignment.log", "a") as fh:
                fh.write(f"{step} " + " ".join(map(str, ms.tolist())) + "\n")

    # ---- setup (Verlet::setup analogue) ----------------------------------

    def setup(self, run_window=(0, 0)):
        state = self.state
        x_w, image = state.box.wrap(state.x, state.image)
        state = dataclasses.replace(state, x=x_w, image=image)
        nbr = self._nbr_build(state)
        if bool(nbr.overflow):
            raise RuntimeError(
                f"neighbor capacity exceeded at setup (max occupancy "
                f"{int(nbr.max_occupancy)})"
            )
        state, fout = jax.jit(self._forces)(state, nbr, jnp.asarray(run_window))
        self.state = state
        self._fcarry = fout
        self._nbr = nbr
        return fout

    # ---- host-side run loop ----------------------------------------------

    def run(self, nsteps: int, thermo_every: int = 0,
            thermo_callback: Callable | None = None):
        cfg = self.cfg
        begin = int(self.state.step)
        end = begin + nsteps
        run_window = jnp.asarray([begin, end])
        if self._fcarry is None:
            self.setup((begin, end))

        done = 0
        while done < nsteps:
            self._maybe_cluster_switch()
            if self._fcarry is None:
                self.setup((begin, end))
            todo = min(cfg.reneigh_every, nsteps - done)
            state, fout, nbr, overflow, maxocc, danger = self._block(
                self.state, self._fcarry, run_window, nsteps=todo,
                nbr=self._nbr
            )
            self.state, self._fcarry, self._nbr = state, fout, nbr
            done += todo
            if cfg.check_safety:
                if bool(overflow):
                    raise RuntimeError(
                        f"neighbor capacity exceeded (max occupancy "
                        f"{int(maxocc)})"
                    )
                if bool(danger):
                    self.dangerous_builds += 1
            if thermo_every and (done % thermo_every == 0 or done == nsteps):
                row = self.thermo()
                self.thermo_rows.append(row)
                if thermo_callback:
                    thermo_callback(row)
        return self.state

    # ---- fused multi-block run (bench / production path) -------------------

    def run_fused(self, nblocks: int, run_window=None):
        """Advance nblocks × reneigh_every steps in ONE device dispatch: an
        outer lax.scan over blocks (each block = wrap + neighbor rebuild +
        inner scan of steps).  No host round-trips at all; safety flags are
        OR-reduced across blocks and checked once at the end."""
        if self._fcarry is None:
            self.setup(run_window or (int(self.state.step),
                                      int(self.state.step) + nblocks * self.cfg.reneigh_every))
        if run_window is None:
            run_window = (int(self.state.step),
                          int(self.state.step) + nblocks * self.cfg.reneigh_every)
        state, fout, nbr, overflow, maxocc, danger = self._fused(
            self.state, self._fcarry, self._nbr, jnp.asarray(run_window),
            nblocks=nblocks)
        self.state, self._fcarry, self._nbr = state, fout, nbr
        if self.cfg.check_safety:
            if bool(overflow):
                raise RuntimeError(
                    f"neighbor capacity exceeded (max occupancy "
                    f"{int(maxocc)})")
            self.dangerous_builds += int(danger)
        return self.state

    @property
    def _fused(self):
        if not hasattr(self, "_fused_fn"):
            def impl(state, fcarry, nbr, run_window, nsteps_inner, nblocks):
                def blk(carry, _):
                    state, fout, nbr, ovf, mx, dng = carry
                    state, fout, nbr, o, m, d = self._block_impl(
                        state, fout, run_window, nsteps_inner, nbr=nbr)
                    return (state, fout, nbr, ovf | o, jnp.maximum(mx, m),
                            dng + d.astype(jnp.int32)), None

                init = (state, fcarry, nbr, jnp.asarray(False),
                        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
                (state, fout, nbr, ovf, mx, dng), _ = jax.lax.scan(
                    blk, init, None, length=nblocks)
                return state, fout, nbr, ovf, mx, dng

            self._fused_fn = jax.jit(
                lambda state, fcarry, nbr, run_window, nblocks:
                impl(state, fcarry, nbr, run_window, self.cfg.reneigh_every,
                     nblocks),
                static_argnames=("nblocks",))
        return self._fused_fn

    # ---- observables ------------------------------------------------------

    def property_atom(self, name: str):
        """Per-atom property accessor in TAG order — the analogue of
        ``compute property/atom`` / ``Atom::extract`` for the UCG fields
        (atom_vec_ucg.cpp:172-234, atom.cpp:3156-3175).  Names: ucgstate,
        ucgl, ucgvl, ucgml, ucgp, ucgforce, ucgsoftmaxscores, x, v, f,
        type, mol, q, id."""
        state, fout = self.state, self._fcarry
        arrays = {
            "x": state.x, "v": state.v, "type": state.typ, "mol": state.mol,
            "q": state.q, "id": state.tag,
            "ucgstate": state.ucgstate, "ucgl": state.ucgl,
            "ucgvl": state.ucgvl, "ucgml": state.ucgml, "ucgp": state.ucgp,
        }
        if fout is not None:
            arrays.update({"f": fout.f, "ucgforce": fout.ucgforce,
                           "ucgsoftmaxscores": fout.scores})
        if name not in arrays:
            raise KeyError(f"unknown per-atom property {name!r}")
        out = np.asarray(arrays[name])
        order = np.argsort(np.asarray(state.tag))
        return out[order]


    @property
    def _thermo_jit(self):
        """All thermo scalars in ONE jitted device computation + ONE host
        transfer (the reference's Thermo::compute analogue; avoids the ~8
        separate device syncs a naive per-scalar implementation costs when
        thermo_every is small)."""
        if not hasattr(self, "_thermo_fn"):
            u = self.cfg.u

            def impl(state, fout):
                mass = self._masses_by_type[state.typ]
                ke = 0.5 * jnp.sum(mass * jnp.sum(state.v**2, axis=-1)) * u.mvv2e
                pe = fout.pe
                virial = fout.virial
                if self.bonded is not None and self.cfg.respa_inner > 1:
                    # under r-RESPA the pair pass doesn't fold bonded terms
                    # in — add both their energy AND their virial here
                    from lammps_ucg_dev_tpu.models import bonded as bd

                    _, bpe, bvir = bd.compute(state, self.bonded)
                    pe = pe + bpe
                    virial = virial + bvir
                if (self.cfg.integrator.wall
                        and self.cfg.integrator.bias_potential):
                    bias_e = jnp.where(
                        self._is_ucg(state),
                        fi.bias_energy(state.ucgl,
                                       self.cfg.integrator.barrier), 0.0)
                    g = fi.group_mask(self.cfg.integrator, state)
                    if g is not None:
                        # the bias force is group-masked; its energy tally
                        # must be too (reference fix group semantics)
                        bias_e = jnp.where(g, bias_e, 0.0)
                    pe_bias = jnp.sum(bias_e)
                else:
                    pe_bias = jnp.zeros_like(pe)
                ke_lambda = (0.5 * jnp.sum(state.ucgml * state.ucgvl**2)
                             * u.mvv2e)
                vol = jnp.prod(state.box.lengths)
                virial_tr = virial[0] + virial[1] + virial[2]
                lam_t = fl.lambda_temperature(state, u)
                dt = jnp.result_type(ke, pe)
                vec = jnp.stack([jnp.asarray(v, dt) for v in (
                    ke, pe, pe_bias, ke_lambda, lam_t, vol, virial_tr)])
                oob = (jnp.stack([fout.oob_low, fout.oob_high])
                       if fout.oob_low is not None else None)
                return vec, oob

            self._thermo_fn = jax.jit(impl)
        return self._thermo_fn

    def thermo(self) -> dict:
        state, fout = self.state, self._fcarry
        u = self.cfg.u
        n = state.n_atoms
        vec, oob = self._thermo_jit(state, fout)
        ke, pe, pe_bias, ke_lambda, lam_t, vol, virial_tr = (
            float(v) for v in np.asarray(vec))
        dof = max(3 * n - 3, 1)
        temp = 2.0 * ke / (dof * u.boltz)
        press = (2.0 * ke + virial_tr) / (3.0 * vol) * u.nktv2p
        row = {
            "step": int(state.step),
            "temp": temp,
            "pe": pe + pe_bias,
            "ke": ke,
            "ke_lambda": ke_lambda,
            "lambda_temp": lam_t,
            "etotal": ke + pe + pe_bias + ke_lambda,
            "press": press,
        }
        if oob is not None:
            oob = np.asarray(oob)
            row["oob_low"] = int(oob[0])
            row["oob_high"] = int(oob[1])
        return row
