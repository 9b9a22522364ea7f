"""``fix cluster_switch`` — MC molecule-population switching gated by a
connected-cluster criterion.

Reference (/root/reference/UCG/fix_cluster_switch.cpp):

* every ``switchFreq`` steps (PRE_EXCHANGE, :452-469):
  1. ``check_cluster`` (:537-731): connected-component labeling over MOLECULES.
     Two molecules are connected when any atom pair (i, j) with
     (type_i, type_j) in the contact map is within the contact cutoff
     (:628-648); every molecule is also linked to its ``mol_offset`` partner
     (switchable mols link to m-offset, others to m+offset, :655-669).
     Iterative min-label propagation to a fixpoint (:596-685).  Molecules in
     the seed's cluster become locked-ON (restrict=-1, state=1); all other
     switchable molecules stay eligible (:687-702).
  2. ``attempt_switch`` (:733-839): each eligible molecule accepts a state
     flip with probability probON (OFF→ON) or probOFF = 1-probON (ON→OFF)
     from the rates file; accepted molecules flip ALL their atoms' types
     atomtypesON ↔ atomtypesOFF (:799-823).
  3. statistics 7-vector: attempts/successes by direction + cluster size
     (:923-968); per-event cluster/state log rows (:704-725).

TPU-native formulation: the label propagation is a jitted ``lax.while_loop``
whose body scatter-mins every contact edge (plus the offset-partner links)
simultaneously — the parallel-hooking form of the reference's sweep loop; the
molecule-level decisions are vectorized over a fixed ``maxmol`` axis.  RNG is
a counter-based ``jax.random`` stream, so results are independent of device
count (the reference's per-rank RanPark draws are rank-dependent; SURVEY §7.4
notes its statistics, not its bitstream, are the matching target).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import SimState, pytree_dataclass
from lammps_ucg_dev_tpu.ops.neighbor import NeighborList


@pytree_dataclass(meta_fields=("maxmol", "max_sweeps", "mol_seed", "mol_offset"))
class ClusterSwitchParams:
    contact_ok: jax.Array    # (T+1, T+1) bool contact map
    off_to_on: jax.Array     # (T+1,) type map (identity off the OFF list)
    on_to_off: jax.Array     # (T+1,) type map (identity off the ON list)
    is_on: jax.Array         # (T+1,) bool
    is_off: jax.Array        # (T+1,) bool
    cutsq: jax.Array         # () contact cutoff²
    probON: jax.Array        # ()
    maxmol: int = 0
    max_sweeps: int = 64
    mol_seed: int = 1
    mol_offset: int = 0


@pytree_dataclass()
class ClusterSwitchStats:
    """7-vector, ordering as compute_vector (:923-933): attemptsTotal,
    successTotal, attemptsON, attemptsOFF, successON, successOFF, nCluster."""

    v: jax.Array

    @staticmethod
    def zeros(dtype=jnp.float32):
        return ClusterSwitchStats(v=jnp.zeros((7,), dtype))


def make_params(ntypes: int, contacts, atomtypes_on, atomtypes_off,
                probON: float, cutoff: float, mol_seed: int, mol_offset: int,
                maxmol: int, max_sweeps: int = 64,
                dtype=jnp.float32) -> ClusterSwitchParams:
    """contacts: iterable of (type_a, type_b) contact pairs (symmetrized)."""
    T = ntypes
    cmap = np.zeros((T + 1, T + 1), dtype=bool)
    for a, b in contacts:
        cmap[a, b] = True
        cmap[b, a] = True     # the reference checks (itype, jtype) ordered
                              # pairs against the map from both pair directions
    o2n = np.arange(T + 1)
    n2o = np.arange(T + 1)
    is_on = np.zeros(T + 1, dtype=bool)
    is_off = np.zeros(T + 1, dtype=bool)
    for on_t, off_t in zip(atomtypes_on, atomtypes_off):
        o2n[off_t] = on_t
        n2o[on_t] = off_t
        is_on[on_t] = True
        is_off[off_t] = True
    return ClusterSwitchParams(
        contact_ok=jnp.asarray(cmap),
        off_to_on=jnp.asarray(o2n, jnp.int32),
        on_to_off=jnp.asarray(n2o, jnp.int32),
        is_on=jnp.asarray(is_on),
        is_off=jnp.asarray(is_off),
        cutsq=jnp.asarray(cutoff * cutoff, dtype),
        probON=jnp.asarray(probON, dtype),
        maxmol=int(maxmol),
        max_sweeps=int(max_sweeps),
        mol_seed=int(mol_seed),
        mol_offset=int(mol_offset),
    )


def _mol_state(state: SimState, params: ClusterSwitchParams, valid=None):
    """(mol_state, present): per-molecule ON/OFF/-1 and presence flags,
    recomputed from atom types (constructor logic, :129-159).  ``valid``
    masks out rows that are not live atoms (slab capacity padding)."""
    M = params.maxmol
    val = jnp.where(params.is_on[state.typ], 1,
                    jnp.where(params.is_off[state.typ], 0, -1)).astype(jnp.int32)
    mol = state.mol
    if valid is not None:
        mol = jnp.where(valid, mol, M + 1)          # scatter-dropped
    mol_state = jnp.full((M + 1,), -1, jnp.int32).at[mol].max(val, mode="drop")
    present = jnp.zeros((M + 1,), bool).at[mol].set(True, mode="drop")
    return mol_state, present


def check_cluster(state: SimState, nbr: NeighborList,
                  params: ClusterSwitchParams, axis=None, valid=None):
    """Connected-component labeling over molecules (:537-731).

    ``axis``: shard_map mesh axis name for the distributed form — each
    device sweeps its local contact edges and the per-molecule label array
    is pmin-merged every iteration until globally stable, exactly the
    reference's local-sweep + MPI_Allreduce(MIN) loop
    (fix_cluster_switch.cpp:596-685).  ``valid`` masks non-live rows.

    Returns (labels, mol_state, present, in_cluster, n_cluster)."""
    M = params.maxmol
    n = state.n_atoms
    mol_state, present = _mol_state(state, params, valid=valid)
    if axis is not None:
        mol_state = jax.lax.pmax(mol_state, axis)
        present = jax.lax.pmax(present.astype(jnp.int32), axis) > 0
    switchable = (mol_state == 0) | (mol_state == 1)

    # offset-partner links (:655-669)
    m_idx = jnp.arange(M + 1, dtype=jnp.int32)
    partner = jnp.where(switchable, m_idx - params.mol_offset,
                        m_idx + params.mol_offset)
    partner = jnp.clip(partner, 0, M)

    # contact edges from the neighbor list
    j = nbr.idx
    valid = j < n
    jc = jnp.where(valid, j, 0)
    dr = state.box.min_image(state.x[:, None, :] - state.x[jc])
    rsq = jnp.sum(dr * dr, axis=-1)
    contact = (valid & (rsq < params.cutsq)
               & params.contact_ok[state.typ[:, None], state.typ[jc]])
    im = jnp.broadcast_to(state.mol[:, None], j.shape)
    jm = state.mol[jc]
    im = jnp.where(contact, im, 0)
    jm = jnp.where(contact, jm, 0)

    # initial labels: own id for present mols; seed + its partner preset (:563-573)
    labels = jnp.where(present, m_idx, jnp.iinfo(jnp.int32).max)
    labels = labels.at[params.mol_seed].min(params.mol_seed)
    seed_partner = params.mol_seed - params.mol_offset
    if 0 <= seed_partner <= M:   # negative indices would wrap in JAX
        labels = labels.at[seed_partner].min(params.mol_seed)

    def sweep(carry):
        labels, _, it = carry
        # edge hook: new = min over both endpoints and their partners
        li = labels[im]
        lj = labels[jm]
        lpi = labels[partner[im]]
        lpj = labels[partner[jm]]
        new = jnp.minimum(jnp.minimum(li, lj), jnp.minimum(lpi, lpj))
        new = jnp.where(contact, new, jnp.iinfo(jnp.int32).max)
        upd = labels
        upd = upd.at[im].min(new)
        upd = upd.at[jm].min(new)
        upd = upd.at[partner[im]].min(jnp.where(contact, new, jnp.iinfo(jnp.int32).max))
        upd = upd.at[partner[jm]].min(jnp.where(contact, new, jnp.iinfo(jnp.int32).max))
        # pointer-jump through partner links for all mols
        upd = jnp.minimum(upd, jnp.where(present, upd[partner], upd))
        if axis is not None:
            # global merge + global convergence test per sweep — the
            # reference's MPI_Allreduce(MIN) (:682-683)
            upd = jax.lax.pmin(upd, axis)
            changed = jax.lax.psum(
                jnp.any(upd != labels).astype(jnp.int32), axis) > 0
        else:
            changed = jnp.any(upd != labels)
        return upd, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < params.max_sweeps)

    labels, changed, _ = jax.lax.while_loop(
        cond, sweep, (labels, jnp.asarray(True), jnp.asarray(0)))
    # exited while still changing => the max_sweeps cap truncated label
    # propagation and labels may be wrong — surfaced like neighbor overflow
    converged = ~changed

    cluster_id = labels[params.mol_seed]
    in_cluster = present & (labels == cluster_id)
    n_cluster = jnp.sum(in_cluster)
    return labels, mol_state, present, in_cluster, n_cluster, converged


def attempt_switch(key, state: SimState, mol_state, present, in_cluster,
                   params: ClusterSwitchParams):
    """MC flips for eligible molecules (:733-839).  Returns (new types,
    new mol_state, accept mask, eligible mask)."""
    M = params.maxmol
    switchable = (mol_state == 0) | (mol_state == 1)
    # seed-cluster switchable mols are locked (restrict=-1, :693-698);
    # the seed pair itself is never eligible (:144-153)
    m_idx = jnp.arange(M + 1, dtype=jnp.int32)
    is_seed = (m_idx == params.mol_seed) | (m_idx == params.mol_seed - params.mol_offset)
    eligible = present & switchable & ~in_cluster & ~is_seed

    p_acc = jnp.where(mol_state == 0, params.probON, 1.0 - params.probON)
    rnd = jax.random.uniform(key, (M + 1,), dtype=p_acc.dtype)
    accept = eligible & (rnd < p_acc)

    acc_atom = accept[state.mol]
    st_atom = mol_state[state.mol]
    t = state.typ
    flipped = jnp.where(st_atom == 0, params.off_to_on[t], params.on_to_off[t])
    new_typ = jnp.where(acc_atom, flipped, t)
    new_mol_state = jnp.where(accept, 1 - mol_state, mol_state)
    return new_typ, new_mol_state, accept, eligible


def apply(key, state: SimState, nbr: NeighborList,
          params: ClusterSwitchParams, stats: ClusterSwitchStats,
          axis=None, valid=None):
    """One full cluster-switch event. Returns (state', stats', info) where
    info carries the per-mol cluster/state vectors for host-side logging
    (cluster_assignment.log / state_assignment.log, :704-725).

    Distributed (``axis``): labels converge globally via pmin, and the MC
    accept draws use the REPLICATED key over per-molecule slots, so every
    device flips identically — device-count-independent, unlike the
    reference's per-rank RanPark streams (SURVEY §7.4)."""
    labels, mol_state, present, in_cluster, n_cluster, converged = (
        check_cluster(state, nbr, params, axis=axis, valid=valid))
    # cluster switchable mols become designated ON (:693-697)
    switchable = (mol_state == 0) | (mol_state == 1)
    mol_state = jnp.where(switchable & in_cluster, 1, mol_state)

    new_typ, new_mol_state, accept, eligible = attempt_switch(
        key, state, mol_state, present, in_cluster, params)

    att_on = eligible & (mol_state == 0)
    att_off = eligible & (mol_state == 1)
    d = jnp.asarray([
        jnp.sum(eligible), jnp.sum(accept),
        jnp.sum(att_on), jnp.sum(att_off),
        jnp.sum(accept & att_on), jnp.sum(accept & att_off),
        0,
    ], dtype=stats.v.dtype)
    v = stats.v + d
    v = v.at[6].set(n_cluster.astype(stats.v.dtype))

    state = dataclasses.replace(state, typ=new_typ)
    info = {
        "in_cluster": in_cluster,
        "mol_state": new_mol_state,
        "n_cluster": n_cluster,
        "accept": accept,
        "converged": converged,
    }
    return state, ClusterSwitchStats(v=v), info
