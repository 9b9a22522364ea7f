"""Formal/actual type maps and the multi-table ``pair_coeff`` assembly.

The reference distinguishes ACTUAL atom types (what ``atom->type`` holds) from
FORMAL types (one per internal state of a UCG type); tables are indexed by
formal-type pairs (``PairTable_UCGLD::coeff``,
/root/reference/UCG/pair_table_ucgld.cpp:719-865).  Here the whole mapping is
precompiled into dense device arrays so the per-pair state-combination lookup
becomes a single gather:

    tab4[itype, jtype, si, sj] -> table id
    cutsq[itype, jtype]        -> interaction gate (the (0,0)-state cutoff,
                                  matching the reference's cutsq[actual][actual])
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import pytree_dataclass
from lammps_ucg_dev_tpu.io.state_settings import StateSettings
from lammps_ucg_dev_tpu.io.table_io import RawTable, read_table_file
from lammps_ucg_dev_tpu.ops.table import BuiltTable, TableBank, build_table


@pytree_dataclass()
class UCGTypeParams:
    """Per-type UCG structure on device (actual-type indexed, 1-based)."""

    n_states: jax.Array       # (T+1,) int32
    formal: jax.Array         # (T+1, 2) int32 formal type per state
    mu: jax.Array             # (F+1,) chemical potential per formal type
    mu_diff: jax.Array        # (T+1,) mu[formal1] - mu[formal0] (0 for 1-state)
    tab4: jax.Array           # (T+1, T+1, 2, 2) int32 table ids
    cutsq: jax.Array          # (T+1, T+1) pair gate
    use_density: jax.Array    # (T+1,) int32
    use_entropy: jax.Array    # (T+1,) int32
    cv_threshold: jax.Array   # (T+1,)
    threshold_radius: jax.Array  # (T+1,)
    # uniform-bank fast-path data: row per flattened (ti, tj) pair type:
    # [cutsq, onehot(tab of combo 00) .. onehot(combo 11)] — fetched with ONE
    # gather per pair alongside the uniform table row (see pair_ucgld).
    pair_pack: jax.Array | None = None   # ((T+1)^2, 1 + 4*n_tables)

    def is_ucg(self, typ: jax.Array) -> jax.Array:
        return self.n_states[typ] > 1


def _parse_bounds(spec, ntypes: int):
    """LAMMPS-style type bounds: int, '*', 'n*', '*n', 'n*m' (utils::bounds)."""
    s = str(spec)
    if "*" not in s:
        v = int(s)
        return v, v
    if s == "*":
        return 1, ntypes
    lo, hi = s.split("*")
    return (int(lo) if lo else 1), (int(hi) if hi else ntypes)


@dataclasses.dataclass
class TablePairBuilder:
    """Mirrors the reference's ``pair_style``/``pair_coeff`` assembly for the
    multi-table UCG styles (P1-P3). Produces a TableBank + UCGTypeParams."""

    tabstyle: str
    tablength: int
    settings: StateSettings

    def __post_init__(self):
        F = self.settings.n_formal_types
        self.tables: list[BuiltTable] = []
        self.tabindex = np.full((F + 1, F + 1), -1, dtype=np.int64)

    def pair_coeff(self, ispec, jspec, Ns_i: int, Ns_j: int, entries):
        """``entries`` is a list of Ns_i*Ns_j (table, cutoff) pairs in
        (si-major, sj-minor) order; ``table`` is a RawTable or a
        (filename, keyword) tuple."""
        st = self.settings
        ilo, ihi = _parse_bounds(ispec, st.n_actual_types)
        jlo, jhi = _parse_bounds(jspec, st.n_actual_types)
        for t in range(ilo, ihi + 1):
            if Ns_i != st.n_states_per_type[t]:
                raise ValueError(
                    f"Number of states for atom type {t} does not match the settings file"
                )
        for t in range(jlo, jhi + 1):
            if Ns_j != st.n_states_per_type[t]:
                raise ValueError(
                    f"Number of states for atom type {t} does not match the settings file"
                )
        if len(entries) != Ns_i * Ns_j:
            raise ValueError(
                f"Expected {Ns_i * Ns_j} (table, cutoff) entries, got {len(entries)}"
            )

        e = 0
        for s_i in range(Ns_i):
            for s_j in range(Ns_j):
                table, cut = entries[e]
                e += 1
                if isinstance(table, tuple):
                    table = read_table_file(*table)
                assert isinstance(table, RawTable)
                built = build_table(table, self.tabstyle, self.tablength, float(cut))
                tid = len(self.tables)
                self.tables.append(built)
                count = 0
                for i in range(ilo, ihi + 1):
                    for j in range(max(jlo, i), jhi + 1):
                        fi = int(st.formal_from_actual[i, s_i])
                        fj = int(st.formal_from_actual[j, s_j])
                        if fi == 0 or fj == 0:
                            raise ValueError(
                                f"Formal type not defined for actual type {i}/{j}"
                            )
                        # DIRECTED assignment only, like the reference's
                        # coeff() (pair_table_ucgld.cpp:844); init_one's
                        # upper-triangular symmetrization happens in build()
                        self.tabindex[fi, fj] = tid
                        count += 1
                if count == 0:
                    raise ValueError("Illegal pair_coeff command")

    def build(self, dtype=jnp.float32):
        st = self.settings
        T, F = st.n_actual_types, st.n_formal_types
        if len(self.tables) == 0:
            raise ValueError("No pair_coeff tables defined")

        # init_one symmetrization (pair_table_ucgld.cpp:892): the UPPER
        # triangular entry wins for both directions, so a state pair whose
        # "01" and "10" files differ uses the 01 table for both lookups —
        # exactly the reference's behavior (its coeff() sets directed
        # entries; init_one(i<=j) then copies [i][j] over [j][i]).
        for a in range(1, F + 1):
            for b in range(a, F + 1):
                if self.tabindex[a, b] >= 0:
                    self.tabindex[b, a] = self.tabindex[a, b]
                elif self.tabindex[b, a] >= 0:
                    self.tabindex[a, b] = self.tabindex[b, a]

        # validate completeness over formal pairs that can actually occur
        tab4 = np.zeros((T + 1, T + 1, 2, 2), dtype=np.int64)
        cutsq = np.zeros((T + 1, T + 1), dtype=np.float64)
        cuts = np.array([t.cut for t in self.tables])
        for i in range(1, T + 1):
            for j in range(1, T + 1):
                for si in range(int(st.n_states_per_type[i])):
                    for sj in range(int(st.n_states_per_type[j])):
                        fi = int(st.formal_from_actual[i, si])
                        fj = int(st.formal_from_actual[j, sj])
                        tid = self.tabindex[fi, fj]
                        if tid < 0:
                            raise ValueError(
                                f"All pair coeffs are not set: formal pair ({fi},{fj})"
                            )
                        tab4[i, j, si, sj] = tid
                        # unused state slots repeat state 0 so gathers stay in range
                for si in range(2):
                    for sj in range(2):
                        if tab4[i, j, si, sj] == 0 and (
                            si >= st.n_states_per_type[i] or sj >= st.n_states_per_type[j]
                        ):
                            tab4[i, j, si, sj] = tab4[
                                i, j, min(si, st.n_states_per_type[i] - 1),
                                min(sj, st.n_states_per_type[j] - 1),
                            ]
                # interaction gate = (0,0)-state table cutoff, as in the
                # reference's cutsq[itype][jtype] with actual types
                cutsq[i, j] = cuts[tab4[i, j, 0, 0]] ** 2

        bank = TableBank.from_built(self.tables, self.tabstyle, dtype=dtype)
        mu = np.asarray(st.chemical_potentials, dtype=np.float64)
        formal = np.zeros((T + 1, 2), dtype=np.int64)
        formal[:, :] = st.formal_from_actual[:, :2]
        mu_diff = np.where(
            st.n_states_per_type[: T + 1] > 1,
            mu[formal[:, 1]] - mu[formal[:, 0]],
            0.0,
        )
        # fast-path pair pack: per flattened (ti, tj): cutsq + one-hot combo
        # table selectors (used with TableBank.upacked)
        NT = len(self.tables)
        pair_pack = np.zeros(((T + 1) * (T + 1), 1 + 4 * NT))
        for i in range(1, T + 1):
            for j in range(1, T + 1):
                row = pair_pack[i * (T + 1) + j]
                row[0] = cutsq[i, j]
                for c, (si, sj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                    row[1 + c * NT + tab4[i, j, si, sj]] = 1.0

        tp = UCGTypeParams(
            n_states=jnp.asarray(st.n_states_per_type, jnp.int32),
            formal=jnp.asarray(formal, jnp.int32),
            mu=jnp.asarray(mu, dtype),
            mu_diff=jnp.asarray(mu_diff, dtype),
            tab4=jnp.asarray(tab4, jnp.int32),
            cutsq=jnp.asarray(cutsq, dtype),
            use_density=jnp.asarray(st.use_density, jnp.int32),
            use_entropy=jnp.asarray(st.use_entropy, jnp.int32),
            cv_threshold=jnp.asarray(st.cv_thresholds, dtype),
            threshold_radius=jnp.asarray(st.threshold_radii, dtype),
            pair_pack=jnp.asarray(pair_pack, dtype),
        )
        return bank, tp

    @property
    def max_cutoff(self) -> float:
        return max(t.cut for t in self.tables)


@dataclasses.dataclass
class RLEUCGBuilder:
    """Stock single-table ``pair_coeff`` assembly over SUBSTATE types for
    ``table_rleucg_interface`` (P4), where atom types enumerate substates
    (PairTable_RLEUCG_INTERFACE::coeff,
    /root/reference/UCG/pair_table_rleucg_interface.cpp:672-744)."""

    tabstyle: str
    tablength: int
    settings: StateSettings   # rleucg dialect

    def __post_init__(self):
        S = self.settings.n_formal_types       # total substate types
        self.tables: list[BuiltTable] = []
        self.tabindex = np.full((S + 1, S + 1), -1, dtype=np.int64)

    def pair_coeff(self, ispec, jspec, table, cut: float):
        S = self.settings.n_formal_types
        ilo, ihi = _parse_bounds(ispec, S)
        jlo, jhi = _parse_bounds(jspec, S)
        if isinstance(table, tuple):
            table = read_table_file(*table)
        built = build_table(table, self.tabstyle, self.tablength, float(cut))
        tid = len(self.tables)
        self.tables.append(built)
        count = 0
        for i in range(ilo, ihi + 1):
            for j in range(max(jlo, i), jhi + 1):
                self.tabindex[i, j] = tid
                self.tabindex[j, i] = tid
                count += 1
        if count == 0:
            raise ValueError("Illegal pair_coeff command")

    def build(self, dtype=jnp.float32):
        """Returns (bank, tabSS, cutsq) where tabSS[i, j, si, sj] maps base
        substate types + state offsets to table ids."""
        st = self.settings
        S = st.n_formal_types
        Smax = int(st.max_states)
        if np.any(self.tabindex[1:, 1:] < 0):
            missing = np.argwhere(self.tabindex[1:, 1:] < 0)[0] + 1
            raise ValueError(f"All pair coeffs are not set: pair {tuple(missing)}")

        tabSS = np.zeros((S + 1, S + 1, Smax, Smax), dtype=np.int64)
        for i in range(1, S + 1):
            for j in range(1, S + 1):
                for si in range(Smax):
                    for sj in range(Smax):
                        a = min(i + si, S)
                        b = min(j + sj, S)
                        tabSS[i, j, si, sj] = self.tabindex[a, b]
        cuts = np.array([t.cut for t in self.tables])
        cutsq = np.zeros((S + 1, S + 1))
        cutsq[1:, 1:] = cuts[self.tabindex[1:, 1:]] ** 2

        bank = TableBank.from_built(self.tables, self.tabstyle, dtype=dtype)
        return bank, jnp.asarray(tabSS, jnp.int32), jnp.asarray(cutsq, dtype)

    @property
    def max_cutoff(self) -> float:
        return max(t.cut for t in self.tables)
