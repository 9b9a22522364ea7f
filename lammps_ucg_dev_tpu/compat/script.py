"""LAMMPS input-script compatibility layer.

The reference package has no CLI of its own — its entire user surface is
LAMMPS input-script commands plus side files (SURVEY.md §5 "Config / flag
system").  This module interprets the subset of that grammar the UCG package
touches, so a reference input deck drives this engine directly:

    units / dimension / boundary / atom_style
    read_data / write_data / read_restart / write_restart
    mass, timestep, neighbor, neigh_modify, velocity
    pair_style  table_ucgld | table_ucg_bethe | table_ucg_bethe_density |
                table_rleucg_interface   (with their keyword grammars,
                pair_table_ucgld.cpp:654-716, pair_table_ucg_bethe.cpp:746-886)
    pair_coeff  (multi-table UCG grammar, pair_table_ucgld.cpp:719-746;
                stock single-table grammar for rleucg_interface)
    fix         nve/ucgld | nve/ucgld/wall/hard [bias_potential H] |
                ucgld/langevin Tstart Tstop Tperiod seed |
                nve | langevin Tstart Tstop damp seed  (stock particle-DOF
                               NVE/NVT; pair styles pull kT from it,
                               pair_table_ucgld.cpp:872-881) |
                ucgstate [ld | mc seed rate] |
                cluster_switch molID_seed mol_offset cutoff seed rateFreq N
                               rateFile f contactFile f
    bond_style/bond_coeff harmonic, angle_style/angle_coeff harmonic,
    special_bonds (0/1 weights), run_style verlet | respa (2-level)
    group ID type|id|molecule ... (per-atom masks honored by the fixes)
    dump / dump_modify thresh / undump
    thermo / thermo_style (accepted; output is the engine's thermo row)
    run N / rerun
    log / print / echo / variable (minimal)
"""

from __future__ import annotations

import dataclasses
import os
import shlex

import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core import units as units_mod
from lammps_ucg_dev_tpu.core.state import Box, SimState, System
from lammps_ucg_dev_tpu.fixes import cluster_switch as fcs
from lammps_ucg_dev_tpu.fixes import integrate as fi
from lammps_ucg_dev_tpu.fixes import langevin as fl
from lammps_ucg_dev_tpu.fixes import ucgstate as fs
from lammps_ucg_dev_tpu.io import data as dio
from lammps_ucg_dev_tpu.io import dump as dmp
from lammps_ucg_dev_tpu.io import restart as rst
from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
from lammps_ucg_dev_tpu.models import (pair_bethe, pair_bethe_density,
                                       pair_rleucg, pair_ucgld)
from lammps_ucg_dev_tpu.models.typemap import RLEUCGBuilder, TablePairBuilder
from lammps_ucg_dev_tpu.ops import neighbor as nbrmod
from lammps_ucg_dev_tpu.runtime.sim import SimConfig, Simulation

_PAIR_DIALECT = {
    "table_ucgld": "ucgld",
    "table_ucg_bethe": "bethe",
    "table_ucg_bethe_density": "bethe_density",
    "table_rleucg_interface": "rleucg",
}


@dataclasses.dataclass
class _Dump:
    writer: dmp.DumpWriter
    every: int
    group: str = "all"


@dataclasses.dataclass
class _PendingPair:
    style: str
    tabstyle: str
    tablength: int
    settings: object = None
    method: str = "bethe"
    pseudo: bool = True
    prior_mode: str = "ucgl"
    noise_level: float = 0.0
    noise_seed: int = 0
    pair_cv: str = "conservative"        # bethe_density CV back-force mode
    backforce_derivative: bool = True    # bethe_density dw/dr vs w/r
    coeffs: list = dataclasses.field(default_factory=list)


class ScriptRunner:
    """Interprets an input deck; holds the building simulation."""

    def __init__(self, workdir: str = ".", dtype=jnp.float32,
                 log_callback=None):
        self.workdir = workdir
        self.dtype = dtype
        self.units = "lj"
        self.dim = 3
        self.boundary = (True, True, True)
        self.atom_style = "ucg"
        self.datafile: dio.DataFile | None = None
        self.state: SimState | None = None
        self.system: System | None = None
        self.masses_override: dict = {}
        self.dt: float | None = None
        self.skin = 0.3
        self.reneigh_every = 10
        self.reneigh_check = True
        self.respa_inner = 1
        self.neighbor_method: str | None = None
        self.neighbor_one: int | None = None
        self.processors: "tuple | None" = None   # (px, py) device grid
        self.pair: _PendingPair | None = None
        self.bond_style: str | None = None
        self.bond_coeffs: dict = {}
        self.angle_style: str | None = None
        self.angle_coeffs: dict = {}
        self.dihedral_style: str | None = None
        self.dihedral_coeffs: dict = {}
        self.improper_style: str | None = None
        self.improper_coeffs: dict = {}
        self.special_weights = (0.0, 0.0, 0.0)   # LAMMPS default: exclude
        self.integrator = fi.IntegratorCfg(kind="none")
        self.langevin: fl.LangevinCfg | None = None
        self.vlangevin: fl.VLangevinCfg | None = None
        self.ucgstate_cfg: fs.UCGStateCfg | None = None
        self.cswitch: tuple | None = None
        self.fix_ids: dict = {}
        self.groups: dict = {}
        self.dumps: dict = {}
        self.thermo_every = 0
        self.thermo_columns: list | None = None
        self.thermo_rows: list = []
        self.variables: dict = {}
        self.log = log_callback or (lambda msg: print(msg))
        self.sim: Simulation | None = None
        self._total_steps_run = 0

    # ------------------------------------------------------------------

    def _path(self, p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(self.workdir, p)

    def run_file(self, path: str):
        with open(path) as fh:
            self.run_string(fh.read())

    def run_string(self, text: str):
        # handle line continuations with '&'
        logical = []
        buf = ""
        for raw in text.splitlines():
            line = raw.split("#")[0].rstrip()
            if line.endswith("&"):
                buf += line[:-1] + " "
                continue
            buf += line
            if buf.strip():
                logical.append(buf.strip())
            buf = ""
        for line in logical:
            self.command(line)

    def command(self, line: str):
        toks = shlex.split(self._substitute(line))
        if not toks:
            return
        cmd, args = toks[0], toks[1:]
        handler = getattr(self, f"_cmd_{cmd}", None)
        if handler is None:
            raise ValueError(f"unsupported input-script command: {cmd}")
        handler(args)

    def _substitute(self, line: str) -> str:
        for name, val in self.variables.items():
            line = line.replace(f"${{{name}}}", str(val))
            line = line.replace(f"${name}", str(val))
        return line

    # ---- setup commands ------------------------------------------------

    def _cmd_units(self, a):
        self.units = a[0]
        units_mod.get(a[0])

    def _cmd_dimension(self, a):
        if int(a[0]) != 3:
            raise ValueError("only 3d is supported")

    def _cmd_boundary(self, a):
        self.boundary = tuple(tok.startswith("p") for tok in a[:3])

    def _cmd_atom_style(self, a):
        self.atom_style = a[0]

    def _cmd_log(self, a):
        pass

    def _cmd_echo(self, a):
        pass

    def _cmd_print(self, a):
        self.log(" ".join(a))

    def _cmd_variable(self, a):
        # variable name equal/string value
        if len(a) >= 3 and a[1] in ("equal", "string", "index"):
            self.variables[a[0]] = a[2]
        else:
            self.variables[a[0]] = a[-1]

    def _cmd_group(self, a):
        """group ID type|id|molecule v1 v2 ... (values or i:j ranges) —
        per-TAG boolean masks honored by the fixes (the reference's
        mask[i] & groupbit, fix_nve_ucgld.cpp:64)."""
        name, style = a[0], a[1] if len(a) > 1 else None
        if name == "all":
            return
        if self.state is None:
            raise ValueError("group before read_data")
        n = self.state.n_atoms

        def expand(toks):
            vals = []
            for t in toks:
                if ":" in t:
                    parts = t.split(":")
                    lo, hi = int(parts[0]), int(parts[1])
                    stride = int(parts[2]) if len(parts) > 2 else 1
                    vals.extend(range(lo, hi + 1, stride))
                else:
                    vals.append(int(t))
            return np.asarray(vals, np.int64)

        src = {"type": self.state.typ, "id": self.state.tag,
               "molecule": self.state.mol}.get(style)
        if src is None:
            raise ValueError(f"unsupported group style {style!r}")
        vals = expand(a[2:])
        member = np.isin(np.asarray(src), vals)
        # storage order is tag order at read_data time -> per-tag mask
        mask = np.zeros(n, bool)
        mask[np.asarray(self.state.tag) - 1] = member
        if name in self.groups:
            mask = self.groups[name] | mask   # LAMMPS groups are additive
        self.groups[name] = mask

    def _cmd_read_data(self, a):
        df = dio.read_data(self._path(a[0]), atom_style=self.atom_style)
        self.datafile = df
        box = Box.create(df.box_lo, df.box_hi, periodic=self.boundary,
                         dtype=self.dtype, tilt=df.box_tilt)
        if df.box_tilt is not None:
            # triclinic: only the all-pairs neighbor path handles tilted
            # min-image (binned cells and the Pallas kernel assume an
            # orthogonal grid)
            self.neighbor_method = "nsq"
        self.state = SimState.create(
            x=df.x, v=df.v, typ=df.typ, mol=df.mol, q=df.q,
            ucgstate=df.ucgstate, ucgl=df.ucgl, ucgvl=df.ucgvl,
            ucgml=df.ucgml, box=box, dtype=self.dtype)
        import jax
        self.state = dataclasses.replace(
            self.state, image=jnp.asarray(df.image, jnp.int32))
        self.system = System(n_atoms=df.n_atoms, ntypes=df.n_types,
                             masses=df.masses.copy(), units=self.units)

    def _cmd_read_restart(self, a):
        self.state, extra, settings = rst.read_restart_all(
            self._path(a[0]), dtype=self.dtype)
        n = self.state.n_atoms
        ntypes = int(np.asarray(self.state.typ).max())
        if self.state.box.tilt is not None:
            # triclinic continuation: only the all-pairs path handles tilt
            self.neighbor_method = "nsq"
        if "units" in settings and settings["units"] != self.units:
            raise ValueError(
                f"restart was written with units {settings['units']!r}, "
                f"deck says {self.units!r}")
        masses = (np.asarray(settings["masses"], np.float64)
                  if "masses" in settings else np.ones(ntypes + 1))
        self.system = System(n_atoms=n, ntypes=ntypes,
                             masses=masses, units=self.units)
        self._restart_extra = extra
        # pair settings are cross-checked when pair_style is re-declared
        # (the reference restores them outright and pair_coeff must be
        # re-issued, pair_table_ucgld.cpp:1431-1471)
        self._restart_settings = settings

    def _cmd_write_restart(self, a):
        extra = {}
        if self.sim is not None and self.sim.cswitch_stats is not None:
            extra["cswitch_stats"] = np.asarray(self.sim.cswitch_stats.v)
        settings = {"units": self.units, "masses": self._masses()}
        if self.pair is not None:
            settings.update(pair_style=self.pair.style,
                            tabstyle=self.pair.tabstyle,
                            tablength=self.pair.tablength)
        rst.write_restart(self._path(a[0]), self.state, extra,
                          settings=settings)

    def _cmd_write_data(self, a):
        dio.write_data(self._path(a[0]), self.state, self.system,
                       topology=self.datafile)

    def _cmd_mass(self, a):
        self.masses_override[int(a[0])] = float(a[1])

    def _cmd_timestep(self, a):
        self.dt = float(a[0])

    def _cmd_neighbor(self, a):
        self.skin = float(a[0])
        if len(a) > 1 and a[1] == "nsq":
            self.neighbor_method = "nsq"

    def _cmd_neigh_modify(self, a):
        i = 0
        while i < len(a):
            if a[i] == "every":
                self.reneigh_every = int(a[i + 1])
                i += 2
            elif a[i] == "check":
                # check yes: rebuild at block cadence only when the
                # displacement check demands it (the default); check no:
                # rebuild every block unconditionally
                self.reneigh_check = a[i + 1] == "yes"
                i += 2
            elif a[i] == "one":
                # neigh_modify one N — per-atom neighbor capacity, the
                # knob for locally-dense configurations (bonded molecules)
                # whose coordination exceeds the mean-density estimate
                self.neighbor_one = int(a[i + 1])
                i += 2
            elif a[i] in ("delay", "once", "page"):
                # rebuild candidacy is at block cadence (jit-friendly);
                # LAMMPS delay/once/page have no exact analogue
                if (a[i], a[i + 1]) != ("delay", "0"):
                    self.log(f"WARNING: neigh_modify {a[i]} {a[i + 1]} has no "
                             "effect (block-cadence rebuilds + displacement "
                             "check)")
                i += 2
            else:
                i += 1

    def _cmd_processors(self, a):
        """processors Px Py Pz — the LAMMPS processor-grid command, mapped
        onto the TPU device mesh: Px > 1, Py == 1 → 1-D slab decomposition
        over Px devices; Px, Py > 1 → 2-D x-y pencils on a Px × Py mesh
        (parallel/spatial.py).  Pz must be 1 or * (z is not cut — a pencil
        already scales to ⌊Lx/rc⌋·⌊Ly/rc⌋ devices).  '*' for Px means "all
        devices as slabs".  Without this command runs are single-device,
        exactly like serial LAMMPS."""
        if len(a) < 3:
            raise ValueError("processors requires Px Py Pz")
        if a[2] not in ("1", "*"):
            raise ValueError("processors: Pz must be 1 or * (the z axis "
                             "is not decomposed)")
        import jax

        ndev = jax.device_count()
        px = ndev if a[0] == "*" else int(a[0])
        py = 1 if a[1] == "*" else int(a[1])
        if px * py > ndev:
            raise ValueError(f"processors {px}x{py} exceeds the "
                             f"{ndev} available devices")
        self.processors = (px, py)

    def _cmd_run_style(self, a):
        # run_style verlet | respa 2 N bond 1 pair 2  (two-level r-RESPA:
        # bonded at the inner level, pair at the outer — the shape the
        # reference fixes support, fix_nve_ucgld.cpp:155-173)
        if a[0] == "verlet":
            self.respa_inner = 1
            return
        if a[0] != "respa":
            raise ValueError(f"unsupported run_style {a[0]!r}")
        nlevels = int(a[1])
        if nlevels != 2:
            raise ValueError("only 2-level respa (bond inner, pair outer) "
                             "is supported")
        self.respa_inner = int(a[2])
        if self.respa_inner < 1:
            raise ValueError("respa inner loop count must be >= 1 "
                             "(1 == plain Verlet with bonded folded into "
                             "the pair pass)")
        kw = a[3:]
        for i in range(0, len(kw) - 1, 2):
            k, lvl = kw[i], int(kw[i + 1])
            if (k, lvl) not in (("bond", 1), ("angle", 1), ("pair", 2)):
                raise ValueError(f"unsupported respa assignment {k} {lvl} "
                                 "(bond/angle -> 1, pair -> 2)")

    def _cmd_bond_style(self, a):
        if a[0] not in ("harmonic", "none", "zero"):
            raise ValueError(f"unsupported bond_style {a[0]!r}")
        self.bond_style = None if a[0] in ("none", "zero") else a[0]

    def _cmd_bond_coeff(self, a):
        # bond_coeff TYPE K r0  (bond_style harmonic)
        self.bond_coeffs[int(a[0])] = (float(a[1]), float(a[2]))

    def _cmd_angle_style(self, a):
        if a[0] not in ("harmonic", "none", "zero"):
            raise ValueError(f"unsupported angle_style {a[0]!r}")
        self.angle_style = None if a[0] in ("none", "zero") else a[0]

    def _cmd_angle_coeff(self, a):
        # angle_coeff TYPE K theta0(degrees)
        self.angle_coeffs[int(a[0])] = (float(a[1]), float(a[2]))

    def _cmd_dihedral_style(self, a):
        if a[0] not in ("harmonic", "none", "zero"):
            raise ValueError(f"unsupported dihedral_style {a[0]!r}")
        self.dihedral_style = None if a[0] in ("none", "zero") else a[0]

    def _cmd_dihedral_coeff(self, a):
        # dihedral_coeff TYPE K d n  (dihedral_style harmonic:
        # E = K [1 + d cos(n phi)], d = +1/-1, integer n >= 0)
        self.dihedral_coeffs[int(a[0])] = (float(a[1]), float(a[2]),
                                           int(a[3]))

    def _cmd_improper_style(self, a):
        if a[0] not in ("harmonic", "none", "zero"):
            raise ValueError(f"unsupported improper_style {a[0]!r}")
        self.improper_style = None if a[0] in ("none", "zero") else a[0]

    def _cmd_improper_coeff(self, a):
        # improper_coeff TYPE K chi0(degrees)  (improper_style harmonic)
        self.improper_coeffs[int(a[0])] = (float(a[1]), float(a[2]))

    def _cmd_special_bonds(self, a):
        # special_bonds lj w12 w13 w14 | lj/coul w12 w13 w14 (0/1 only)
        if a and a[0] in ("lj", "lj/coul", "coul"):
            w = tuple(float(t) for t in a[1:4])
        elif a and a[0] == "amber":
            raise NotImplementedError("special_bonds amber unsupported")
        else:
            w = tuple(float(t) for t in a[:3])
        self.special_weights = w

    def _cmd_velocity(self, a):
        # velocity all create T seed [dist gaussian]
        if len(a) >= 4 and a[1] == "create":
            T = float(a[2])
            seed = int(a[3])
            u = units_mod.get(self.units)
            rng = np.random.default_rng(seed)
            n = self.state.n_atoms
            masses = (self.system.masses if not self.masses_override
                      else self._masses())
            m = masses[np.asarray(self.state.typ)]
            sigma = np.sqrt(u.boltz * T / (m * u.mvv2e))
            v = rng.normal(0, 1, (n, 3)) * sigma[:, None]
            v -= v.mean(axis=0)   # zero linear momentum
            self.state = dataclasses.replace(
                self.state, v=jnp.asarray(v, self.dtype))
        elif len(a) >= 2 and a[1] == "set":
            v = np.full((self.state.n_atoms, 3), 0.0)
            for d in range(3):
                if a[2 + d] != "NULL":
                    v[:, d] = float(a[2 + d])
            self.state = dataclasses.replace(
                self.state, v=jnp.asarray(v, self.dtype))
        else:
            raise ValueError(f"unsupported velocity command: {a}")

    def _masses(self):
        masses = self.system.masses.copy()
        for t, m in self.masses_override.items():
            masses[t] = m
        return masses

    # ---- pair style ----------------------------------------------------

    def _cmd_pair_style(self, a):
        style = a[0]
        if style not in _PAIR_DIALECT:
            raise ValueError(
                f"unsupported pair_style {style!r}; supported: "
                f"{sorted(_PAIR_DIALECT)}")
        tabstyle = a[1]
        tablength = int(a[2])
        rs = getattr(self, "_restart_settings", None)
        if rs and "pair_style" in rs:
            mism = [(k, rs[k], v) for k, v in
                    (("pair_style", style), ("tabstyle", tabstyle),
                     ("tablength", tablength)) if rs[k] != v]
            if mism:
                raise ValueError(
                    "pair_style disagrees with the restart's stored "
                    f"settings: {mism} (restart persists settings, "
                    "pair_table_ucgld.cpp:1431-1471)")
        pending = _PendingPair(style=style, tabstyle=tabstyle,
                               tablength=tablength)
        dialect = _PAIR_DIALECT[style]
        pending.settings = parse_state_settings(self._path(a[3]), dialect)
        # optional keywords (method/pseudo/prior for bethe; kspace flags
        # accepted and ignored — no long-range solver here)
        i = 4
        while i < len(a):
            kw = a[i]
            if kw in ("ewald", "pppm", "msm", "dispersion", "tip4p"):
                i += 1
            elif kw == "method":
                pending.method = {"mf": "mf", "meanfield": "mf",
                                  "bethe": "bethe", "Bethe": "bethe"}[a[i + 1]]
                i += 2
            elif kw == "pseudo":
                pending.pseudo = a[i + 1] == "yes"
                i += 2
            elif kw == "prior":
                if a[i + 1] == "chemical_potential":
                    if i + 2 < len(a) and a[i + 2] == "noise":
                        pending.prior_mode = "chemical_potential_noise"
                        pending.noise_level = float(a[i + 3])
                        pending.noise_seed = int(a[i + 4])
                        i += 5
                    else:
                        pending.prior_mode = "chemical_potential"
                        i += 2
                elif a[i + 1] == "ucgl":
                    pending.prior_mode = "ucgl"
                    i += 2
                else:
                    raise ValueError(f"unknown prior mode {a[i + 1]!r}")
            elif kw == "pair_cv":
                # engine extension (bethe_density): "conservative" (default,
                # F = -dE/dx) or "reference" (literal back-force of
                # pair_table_ucg_bethe_density.cpp:707-732, w(r)/r weighting)
                if a[i + 1] not in ("conservative", "reference"):
                    raise ValueError(f"unknown pair_cv mode {a[i + 1]!r}")
                pending.pair_cv = a[i + 1]
                i += 2
            elif kw == "backforce_derivative":
                # engine extension (bethe_density): yes = dw/dr weighting
                # (P4's convention); no = the reference P3's w(r)/r (:719)
                pending.backforce_derivative = a[i + 1] == "yes"
                i += 2
            else:
                raise ValueError(f"unknown pair_style keyword {kw!r}")
        self.pair = pending

    def _cmd_pair_coeff(self, a):
        if self.pair is None:
            raise ValueError("pair_coeff before pair_style")
        self.pair.coeffs.append(list(a))

    def _build_pair(self, kT: float):
        p = self.pair
        if p is None:
            raise ValueError("no pair_style defined")
        dtype = self.dtype
        if p.style == "table_rleucg_interface":
            b = RLEUCGBuilder(p.tabstyle, p.tablength, p.settings)
            for c in p.coeffs:
                # pair_coeff i j file keyword cutoff
                b.pair_coeff(c[0], c[1], (self._path(c[2]), c[3]), float(c[4]))
            params = pair_rleucg.make_params(b, p.settings, kT, dtype=dtype)
            return pair_rleucg.compute, params, b.max_cutoff
        b = TablePairBuilder(p.tabstyle, p.tablength, p.settings)
        for c in p.coeffs:
            ns_i, ns_j = int(c[2]), int(c[3])
            entries = []
            rest = c[4:]
            for k in range(ns_i * ns_j):
                f, kw, cut = rest[3 * k], rest[3 * k + 1], rest[3 * k + 2]
                entries.append(((self._path(f), kw), float(cut)))
            b.pair_coeff(c[0], c[1], ns_i, ns_j, entries)
        bank, tp = b.build(dtype=dtype)
        if p.style == "table_ucgld":
            params = pair_ucgld.UCGLDParams(
                bank=bank, tp=tp, kT=jnp.asarray(kT, dtype))
            return pair_ucgld.compute, params, b.max_cutoff
        if p.style == "table_ucg_bethe":
            params = pair_bethe.make_params(
                bank, tp, kT, method=p.method, pseudo=p.pseudo,
                prior_mode=p.prior_mode, noise_level=p.noise_level, dtype=dtype)
            return pair_bethe.compute, params, b.max_cutoff
        if p.style == "table_ucg_bethe_density":
            if not p.pseudo:
                raise ValueError("table_ucg_bethe_density implements only "
                                 "pseudolikelihood scores (pseudo yes)")
            params = pair_bethe_density.make_params(
                bank, tp, kT, method=p.method, pair_cv=p.pair_cv,
                backforce_derivative=p.backforce_derivative, dtype=dtype)
            return pair_bethe_density.compute, params, b.max_cutoff
        raise AssertionError(p.style)

    # ---- fixes ---------------------------------------------------------

    def _cmd_fix(self, a):
        fid, group, style = a[0], a[1], a[2]
        rest = a[3:]
        if group == "all":
            gmask = None
        elif group in self.groups:
            gmask = self.groups[group]
        else:
            raise ValueError(f"fix references undefined group {group!r}")
        if style == "nve/ucgld":
            self.integrator = fi.IntegratorCfg(kind="nve/ucgld", group=gmask)
        elif style == "nve/ucgld/wall/hard":
            bias = False
            barrier = 0.1
            i = 0
            while i < len(rest):
                if rest[i] == "bias_potential":
                    bias = True
                    if i + 1 < len(rest):
                        barrier = float(rest[i + 1])
                    i += 2
                else:
                    raise ValueError(f"unknown wall/hard arg {rest[i]!r}")
            self.integrator = fi.IntegratorCfg(
                kind="nve/ucgld/wall/hard", bias_potential=bias,
                barrier=barrier, group=gmask)
        elif style == "ucgld/langevin":
            self.langevin = fl.LangevinCfg(
                t_start=float(rest[0]), t_stop=float(rest[1]),
                t_period=float(rest[2]), seed=int(rest[3]), group=gmask)
        elif style == "nve":
            # stock fix nve: plain velocity-Verlet on (x, v); λ untouched
            self.integrator = fi.IntegratorCfg(kind="nve", group=gmask)
        elif style == "langevin":
            # stock fix langevin Tstart Tstop damp seed [keywords ignored]
            # — the particle-DOF thermostat production UCG decks run under
            # (every pair style takes kT from it, pair_table_ucgld.cpp:
            # 872-881); pair with `fix nve` for NVT
            if len(rest) > 4:
                self.log(f"WARNING: fix langevin keywords {rest[4:]} ignored")
            self.vlangevin = fl.VLangevinCfg(
                t_start=float(rest[0]), t_stop=float(rest[1]),
                damp=float(rest[2]), seed=int(rest[3]), group=gmask)
        elif style == "ucgstate":
            if not rest:
                self.ucgstate_cfg = fs.UCGStateCfg(mode="default",
                                                   group=gmask)
            elif rest[0] == "ld":
                self.ucgstate_cfg = fs.UCGStateCfg(mode="ld", group=gmask)
            elif rest[0] == "mc":
                # fix ucgstate mc seed rate (fix_ucgstate.cpp:37-67); the
                # seed differentiates the MC draw stream (counter-based:
                # folded into the per-step PRNG key)
                self.ucgstate_cfg = fs.UCGStateCfg(
                    mode="mc", seed=int(rest[1]), mc_rate=float(rest[2]),
                    group=gmask)
            else:
                raise ValueError(f"unknown ucgstate arg {rest[0]!r}")
        elif style == "cluster_switch":
            if gmask is not None:
                self.log(f"WARNING: fix cluster_switch group {group!r} "
                         "treated as 'all' (molecule selection comes from "
                         "the rates file types)")
            # molID_seed mol_offset cutoff seed rateFreq N rateFile f contactFile f
            mol_seed = int(rest[0])
            mol_offset = int(rest[1])
            cutoff = float(rest[2])
            kw = {rest[i]: rest[i + 1] for i in range(4, len(rest) - 1, 2)}
            freq = int(kw.get("rateFreq", rest[5] if len(rest) > 5 else 1000))
            rates = _read_rates_file(self._path(kw["rateFile"]))
            contacts = _read_contacts_file(self._path(kw["contactFile"]))
            maxmol = int(np.asarray(self.state.mol).max())
            params = fcs.make_params(
                ntypes=self.system.ntypes, contacts=contacts,
                atomtypes_on=rates["on"], atomtypes_off=rates["off"],
                probON=rates["probON"], cutoff=cutoff, mol_seed=mol_seed,
                mol_offset=mol_offset, maxmol=maxmol, dtype=self.dtype)
            self.cswitch = (params, freq)
        else:
            raise ValueError(f"unsupported fix style {style!r}")
        self.fix_ids[fid] = style

    def _cmd_unfix(self, a):
        style = self.fix_ids.pop(a[0], None)
        if style in ("nve/ucgld", "nve/ucgld/wall/hard", "nve"):
            self.integrator = fi.IntegratorCfg(kind="none")
        elif style == "ucgld/langevin":
            self.langevin = None
        elif style == "langevin":
            self.vlangevin = None
        elif style == "ucgstate":
            self.ucgstate_cfg = None
        elif style == "cluster_switch":
            self.cswitch = None

    # ---- dumps & thermo ------------------------------------------------

    def _cmd_dump(self, a):
        did, group, style, every, fname = a[0], a[1], a[2], int(a[3]), a[4]
        if style != "custom":
            raise ValueError("only 'dump custom' is supported")
        cols = tuple(a[5:])
        w = dmp.DumpWriter(self._path(fname), columns=cols)
        self.dumps[did] = _Dump(writer=w, every=every, group=group)

    def _cmd_dump_modify(self, a):
        did = a[0]
        if a[1] == "thresh":
            self.dumps[did].writer.modify_thresh(a[2], a[3], float(a[4]))
        else:
            self.log(f"WARNING: dump_modify {a[1]} ignored")

    def _cmd_undump(self, a):
        self.dumps.pop(a[0], None)

    def _cmd_thermo(self, a):
        self.thermo_every = int(a[0])

    def _cmd_thermo_style(self, a):
        # thermo_style custom <cols>: select/rename output columns.  LAMMPS
        # names map onto the engine's thermo row where meaningful.
        if a and a[0] == "custom":
            mapping = {"step": "step", "temp": "temp", "pe": "pe", "ke": "ke",
                       "etotal": "etotal", "press": "press", "epair": "pe",
                       "evdwl": "pe"}
            self.thermo_columns = [mapping.get(c, c) for c in a[1:]]

    # ---- run -----------------------------------------------------------

    def _make_sim(self):
        u = units_mod.get(self.units)
        t_thermo = (self.langevin.t_start if self.langevin
                    else self.vlangevin.t_start if self.vlangevin else 0.0)
        kT = u.boltz * t_thermo
        if t_thermo == 0.0:
            # Missing-thermostat guard.  The reference pair styles silently
            # take T=0 from an absent thermostat (pair_table_ucgld.cpp:
            # 872-881 leaves T unset), which for the Bethe family means
            # exp(-J/kT) -> NaN forces with no diagnostic; FixUCGState DOES
            # error (fix_ucgstate.cpp:152-154).  Raise for every kT-dividing
            # consumer instead of running NaN physics.
            style = self.pair.style if self.pair else None
            if style in ("table_ucg_bethe", "table_ucg_bethe_density",
                         "table_rleucg_interface"):
                raise ValueError(
                    f"pair_style {style} requires a thermostat fix (fix "
                    "langevin / fix ucgld/langevin) to set the target "
                    "temperature kT; none is defined "
                    "(exp(-J/kT) would be NaN at kT=0)")
            if self.ucgstate_cfg is not None:
                raise ValueError(
                    "FixUCGState requires a thermostat fix BEFORE ITSELF to "
                    "set the target temperature T. "
                    "(fix_ucgstate.cpp:152-154)")
        pair_compute, pair_params, cutoff = self._build_pair(kT)
        n = self.state.n_atoms
        # row-chunk the pair loop at large N (bounds HBM; exact)
        if hasattr(pair_params, "chunk") and n >= 32768:
            for c in (16384, 8192, 4096):
                if n % c == 0:
                    pair_params = dataclasses.replace(pair_params, chunk=c)
                    break
        L = np.asarray(self.state.box.lengths)
        bparams, excl = self._build_bonded(n)
        px, py = self.processors if self.processors else (1, 1)
        multi = px * py > 1
        spec = None
        sel = None
        # production fused-kernel path on TPU (ops/kernel_select.py); decks
        # need no opt-in — the XLA path remains the fallback.
        # cluster_switch composes with the kernel (the event builds its own
        # contact list — single-chip and under the spatial drivers), as do
        # bonded terms (additive; replicated topology + per-block row maps
        # under the spatial drivers) and special exclusions (computed-and-
        # subtracted via the style's excl_delta — table_ucgld /
        # table_ucg_bethe).
        topo = bparams is not None or excl is not None
        if self.cswitch is None or not multi:
            from lammps_ucg_dev_tpu.ops.kernel_select import select_pair_kernel

            sel = select_pair_kernel(pair_params, self.state, cutoff,
                                     self.skin, multichip=multi)
            if (sel is not None and excl is not None
                    and getattr(sel[0], "excl_delta", None) is None):
                sel = None          # style can't cancel exclusions
            if sel is not None:
                pair_compute, spec, pair_params = sel
                self.log("pair path: fused Pallas column kernel"
                         + (" (+ bonded/exclusion composition)" if topo
                            else ""))
        dt = self.dt if self.dt is not None else u.dt_default
        cfg = SimConfig(
            dt=dt, units=self.units, integrator=self.integrator,
            langevin=self.langevin, vlangevin=self.vlangevin,
            ucgstate=self.ucgstate_cfg,
            reneigh_every=self.reneigh_every,
            reneigh_check=self.reneigh_check,
            respa_inner=self.respa_inner)
        system = System(n_atoms=n, ntypes=self.system.ntypes,
                        masses=self._masses(), units=self.units)
        if multi and self._make_spatial_sim(system, cfg, pair_compute,
                                            pair_params, cutoff, n, L,
                                            px, py, sel is not None,
                                            bparams, excl):
            return
        if spec is None:
            spec = nbrmod.make_spec(n, L, cutoff, self.skin,
                                    method=self.neighbor_method,
                                    capacity=self.neighbor_one)
        self.sim = Simulation(system, self.state, pair_compute, pair_params,
                              spec, cfg, cluster_switch=self.cswitch,
                              log_dir=self.workdir if self.cswitch else None,
                              bonded=bparams, excl_tags=excl)
        if multi:
            # triclinic boxes don't ride the spatial halos: the GSPMD atom
            # decomposition is the general multi-chip fallback
            # (replicated-gather comm, bit-exact vs single device)
            from lammps_ucg_dev_tpu.parallel import domain

            domain.distribute(self.sim, domain.make_mesh(px * py))
            self.log(f"multi-chip: GSPMD atom decomposition over "
                     f"{px * py} devices")

    def _make_spatial_sim(self, system, cfg, pair_compute, pair_params,
                          cutoff, n, L, px, py, kernel: bool,
                          bparams, excl) -> bool:
        """Build the spatial (slab/pencil) driver for a ``processors``
        deck, or return False for the GSPMD fallback (triclinic)."""
        if getattr(self.state.box, "is_triclinic", False):
            return False
        if cfg.respa_inner != 1 and bparams is None:
            return False           # respa needs bonded terms on this path
        from lammps_ucg_dev_tpu.parallel import spatial

        lo = np.asarray(self.state.box.lo)
        x = np.asarray(self.state.box.wrap(self.state.x)) - lo[None, :]
        try:
            caps = ({} if self.neighbor_one is None
                    else {"nbr_capacity": self.neighbor_one})
            if py == 1:
                mk = (spatial.make_column_slab_spec if kernel
                      else spatial.make_slab_spec)
                slab = mk(n, L, cutoff, self.skin, px, x=x, **caps)
            else:
                mk = (spatial.make_column_pencil_spec if kernel
                      else spatial.make_pencil_spec)
                slab = mk(n, L, cutoff, self.skin, px, py, x=x, **caps)
        except ValueError as e:
            # infeasible decomposition geometry (box too small for the cut
            # count / subdomain width < cutoff+skin / column spans exceed
            # the kernel's page stride): the GSPMD atom decomposition is
            # the general fallback, like LAMMPS falling back from a user
            # processor grid it cannot honor
            self.log(f"spatial decomposition infeasible ({e}); "
                     "falling back to GSPMD")
            return False
        self.sim = spatial.SpatialSimulation(
            system, self.state, pair_compute, pair_params, slab, cfg,
            cluster_switch=self.cswitch,
            log_dir=self.workdir if self.cswitch else None,
            bonded=bparams, excl_tags=excl)
        kind = "slab" if py == 1 else "pencil"
        self.log(f"multi-chip: spatial {kind} decomposition {px}x{py} "
                 f"(shard_map + ppermute halos)")
        return True

    def _build_bonded(self, n):
        """BondedParams + special exclusion tags from the data-file topology
        and the declared bond/angle styles (models/bonded.py)."""
        df = self.datafile
        bonds = df.bonds if (df is not None and self.bond_style) else None
        angles = df.angles if (df is not None and self.angle_style) else None
        dihedrals = (df.dihedrals
                     if (df is not None and self.dihedral_style) else None)
        impropers = (df.impropers
                     if (df is not None and self.improper_style) else None)
        if (bonds is None and angles is None and dihedrals is None
                and impropers is None):
            return None, None
        from lammps_ucg_dev_tpu.models import bonded as bd

        params = bd.make_params(bonds, self.bond_coeffs, angles,
                                self.angle_coeffs, dtype=self.dtype,
                                dihedrals=dihedrals,
                                dihedral_coeffs=self.dihedral_coeffs,
                                impropers=impropers,
                                improper_coeffs=self.improper_coeffs)
        excl = bd.special_tags(
            n, bonds=bonds, angles=angles,
            dihedrals=df.dihedrals if df is not None else None,
            weights=self.special_weights)
        return params, excl

    def _cmd_run(self, a):
        nsteps = int(a[0])
        self._make_sim()
        sim = self.sim
        cadences = [c for c in
                    [self.thermo_every] + [d.every for d in self.dumps.values()]
                    if c > 0]
        chunk = min(cadences) if cadences else nsteps
        chunk = max(chunk, 1)

        def emit():
            step = int(sim.state.step)
            if self.thermo_every and step % self.thermo_every == 0:
                row = sim.thermo()
                self.thermo_rows.append(row)
                shown = row
                if self.thermo_columns:
                    shown = {c: row.get(c, float("nan"))
                             for c in self.thermo_columns}
                self.log("  ".join(f"{k}={v:.6g}" if isinstance(v, float)
                                   else f"{k}={v}" for k, v in shown.items()))
            for d in self.dumps.values():
                if step % d.every == 0:
                    d.writer.write(sim.state)

        sim.setup((int(sim.state.step), int(sim.state.step) + nsteps))
        emit()
        done = 0
        while done < nsteps:
            todo = min(chunk, nsteps - done)
            sim.run(todo)
            done += todo
            emit()
        self.state = sim.state
        self._total_steps_run += nsteps

    def _cmd_rerun(self, a):
        """rerun dumpfile [first N last N every N] dump x y z [ucgl ucgp ucgstate ...]
        (read_dump.cpp + rerun semantics: re-evaluate forces/posteriors per
        snapshot; fix ucgstate setup-time evaluation enables state
        assignment, fix_ucgstate.cpp:165-169)."""
        fname = self._path(a[0])
        i = 1
        first, last, every = None, None, 1
        fields = ["x", "y", "z"]
        while i < len(a):
            if a[i] == "first":
                first = int(a[i + 1]); i += 2
            elif a[i] == "last":
                last = int(a[i + 1]); i += 2
            elif a[i] == "every":
                every = int(a[i + 1]); i += 2
            elif a[i] == "dump":
                fields = list(a[i + 1:])
                break
            else:
                i += 1
        snaps = dmp.read_dump(fname)
        self._make_sim()
        sim = self.sim
        for snap in snaps:
            if first is not None and snap.step < first:
                continue
            if last is not None and snap.step > last:
                continue
            # LAMMPS rerun 'every N': process snapshots whose TIMESTEP is a
            # multiple of N (read_dump.cpp), not every Nth snapshot
            if every > 1 and snap.step % every:
                continue
            st = dmp.apply_snapshot(sim.state, snap, fields=tuple(fields))
            st = dataclasses.replace(st, step=jnp.asarray(snap.step, jnp.int32))
            sim.state = st
            sim._fcarry = None
            sim.setup()
            if self.thermo_every:
                row = sim.thermo()
                self.thermo_rows.append(row)
                self.log("  ".join(f"{k2}={v:.6g}" if isinstance(v, float)
                                   else f"{k2}={v}" for k2, v in row.items()))
            for d in self.dumps.values():
                d.writer.write(sim.state)
        self.state = sim.state


def _read_rates_file(path: str) -> dict:
    """rates.txt: probON; nSwitchTypes; ON types row; OFF types row
    (fix_cluster_switch.cpp:206-282)."""
    rows = []
    with open(path) as fh:
        for raw in fh:
            s = raw.split("#")[0].strip()
            if s:
                rows.append(s.split())
    probON = float(rows[0][0])
    if probON > 1.0:
        raise ValueError("Incorrect probability in rates file")
    nst = int(rows[1][0])
    on = [int(v) for v in rows[2][:nst]]
    off = [int(v) for v in rows[3][:nst]]
    return {"probON": probON, "on": on, "off": off}


def _read_contacts_file(path: str) -> list:
    """contacts.txt: two header lines (counts) then contact type pairs
    (fix_cluster_switch.cpp:286-355)."""
    rows = []
    with open(path) as fh:
        for raw in fh:
            s = raw.split("#")[0].strip()
            if s:
                rows.append(s.split())
    # rows[0] = [label?, nContactTypes], rows[1] = [label?, nAtomsPerContact]
    pairs = []
    for r in rows[2:]:
        pairs.append((int(r[0]), int(r[1])))
    return pairs
