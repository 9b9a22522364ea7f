"""Cell-padded cluster pair lists — the data structure for the fused Pallas
pair kernel (GROMACS-nbnxn-style, adapted to TPU vector shapes).

Motivation (measured): XLA gather costs ~4.2 ns per INDEX on v5e regardless
of fetch width, so per-pair attribute gathers put a hard ~40 ns/pair floor on
the XLA pair loop.  Grouping atoms into clusters of ``CL = 8`` turns per-pair
random access into per-cluster contiguous access (dynamic slices, not
gathers).

Layout: atoms are binned into cells padded to a fixed per-cell capacity that
is a multiple of CL ("slots").  Every cluster of 8 consecutive slots belongs
to exactly ONE cell, so for any atom pair within the cutoff (whose cells are
adjacent by construction, cell size ≥ cutoff+skin) the partner's cluster is
found by the 27-cell stencil — this is what makes the stencil PROVABLY
sufficient.  (A first design clustered 8 consecutive cell-sorted atoms;
clusters then straddle cells and their center cells can differ by up to ±3,
which silently dropped ~5% of pairs at 128k atoms.  Padded slots fix this.)

Candidate j-clusters are pruned by cluster bounding spheres: a pair of
clusters is kept iff dist(centers) < cutoff+skin+r_i+r_j, which cannot drop
any atom pair within cutoff+skin.

Produced per reneighbor (under jit):
    atom_slot (N,)        atom -> slot row
    slot_atom (N_s,)      slot -> atom (N = padding sentinel)
    jcl (n_scl, KC)       per i-cluster candidate j-cluster ids (pad n_scl)
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import Box, pytree_dataclass
from lammps_ucg_dev_tpu.ops import neighbor as nbrmod

CL = 8   # atoms per cluster (one vreg sublane dimension)


@pytree_dataclass(meta_fields=("kc",))
class ClusterList:
    jcl: jax.Array          # (n_scl, KC) int32, padded with n_scl
    atom_slot: jax.Array    # (N,) int32
    slot_atom: jax.Array    # (N_s,) int32, padding = N
    x0: jax.Array           # positions at build time (displacement check)
    overflow: jax.Array     # () bool (cell capacity or KC exceeded)
    max_occupancy: jax.Array
    kc: int

    @property
    def n_clusters(self) -> int:
        return self.jcl.shape[0]

    @property
    def n_slots(self) -> int:
        return self.slot_atom.shape[0]


@dataclasses.dataclass(frozen=True)
class ClusterSpec:
    cutoff: float
    skin: float
    kc: int                  # max j-clusters per i-cluster (multiple of 16)
    cells_per_side: tuple
    cell_capacity: int       # atoms per cell (multiple of CL)
    chunk: int = 2048

    @property
    def rc(self):
        return self.cutoff + self.skin

    @property
    def clusters_per_cell(self):
        return self.cell_capacity // CL


def make_spec(n_atoms: int, box_lengths, cutoff: float, skin: float = 0.4,
              kc: int | None = None, cell_capacity: int | None = None,
              chunk: int = 2048) -> ClusterSpec:
    L = np.asarray(box_lengths, dtype=np.float64)
    rc = cutoff + skin
    cps = np.maximum(np.floor(L / rc).astype(int), 1)
    if np.any(cps < 3):
        raise ValueError("cluster list needs >= 3 cells per side")
    vol = float(np.prod(L))
    rho = n_atoms / vol
    cell_vol = float(np.prod(L / cps))
    mean_occ = rho * cell_vol
    if cell_capacity is None:
        cap = mean_occ + 6.0 * math.sqrt(max(mean_occ, 1.0)) + 8
        cell_capacity = int(-(-cap // CL) * CL)
    if cell_capacity % CL:
        raise ValueError(f"cell_capacity must be a multiple of {CL}")
    if kc is None:
        # clusters per cell × 27-stencil, discounted by the sphere prune
        cpc = cell_capacity // CL
        kc = int(-(-27 * cpc * 0.6 // 16) * 16)
    if kc % 16:
        raise ValueError("kc must be a multiple of 16")
    return ClusterSpec(cutoff=cutoff, skin=skin, kc=kc,
                       cells_per_side=tuple(int(c) for c in cps),
                       cell_capacity=int(cell_capacity), chunk=chunk)


def sort_order(x: jax.Array, box: Box, spec: ClusterSpec) -> jax.Array:
    """Cell-major atom ordering (improves locality; not required for
    correctness of the slot mapping)."""
    cps = np.asarray(spec.cells_per_side)
    cid, _ = nbrmod._cell_index(x, box, cps)
    return jnp.argsort(cid, stable=True).astype(jnp.int32)


def build(x: jax.Array, box: Box, spec: ClusterSpec) -> ClusterList:
    n = x.shape[0]
    cps = np.asarray(spec.cells_per_side)
    ncells = int(np.prod(cps))
    CC = spec.cell_capacity
    CPC = spec.clusters_per_cell
    KC = spec.kc
    n_scl = ncells * CPC
    n_slots = ncells * CC
    dtype = x.dtype

    # ---- bin atoms into padded cell slots ---------------------------------
    # sub-sort within each cell by quantized z so consecutive 8-slot clusters
    # are spatially COMPACT — small bounding spheres are what give the
    # candidate prune its power (random-in-cell clusters have radius ~ the
    # cell itself and prune almost nothing)
    cid, _ = nbrmod._cell_index(x, box, cps)
    zfrac = (x[:, 2] - box.lo[2]) / box.lengths[2] * cps[2]
    zsub = jnp.clip(((zfrac - jnp.floor(zfrac)) * 64).astype(jnp.int32), 0, 63)
    order = jnp.argsort(cid * 64 + zsub, stable=True).astype(jnp.int32)
    sorted_cid = cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    cell_overflow = jnp.max(rank) >= CC
    rank_c = jnp.clip(rank, 0, CC - 1)
    slot_sorted = sorted_cid * CC + rank_c                 # slot of order[k]
    slot_atom = jnp.full((n_slots,), n, dtype=jnp.int32)
    slot_atom = slot_atom.at[slot_sorted].set(
        order, indices_are_sorted=True, unique_indices=True)
    atom_slot = jnp.zeros((n,), jnp.int32).at[order].set(
        slot_sorted, unique_indices=True)

    # ---- cluster geometry (centers/radii per slot cluster) ----------------
    xs = jnp.where((slot_atom < n)[:, None],
                   jnp.take(x, jnp.clip(slot_atom, 0, n - 1), axis=0), 0.0)
    valid = (slot_atom < n).reshape(n_scl, CL)
    xc = xs.reshape(n_scl, CL, 3)
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1)
    # atoms of one cell lie inside that cell (wrapped), so the plain masked
    # mean is PBC-safe — no min-image ambiguity within a cell
    center = jnp.sum(jnp.where(valid[..., None], xc, 0.0), axis=1) / cnt[:, None].astype(dtype)
    dist2 = jnp.sum((xc - center[:, None, :]) ** 2, axis=-1)
    radius = jnp.sqrt(jnp.max(jnp.where(valid, dist2, 0.0), axis=1))
    has_atoms = jnp.any(valid, axis=1)

    # ---- candidates: clusters of the 27-cell stencil, sphere-pruned -------
    offs = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                     for k in (-1, 0, 1)], dtype=np.int64)
    rc = spec.rc
    cps_a = jnp.asarray(cps, jnp.int32)

    # static cell coordinates per slot-cluster
    cell_of_scl = np.arange(n_scl, dtype=np.int64) // CPC
    c3_static = np.stack([
        cell_of_scl // (cps[1] * cps[2]),
        (cell_of_scl // cps[2]) % cps[1],
        cell_of_scl % cps[2],
    ], axis=1)

    chunk = min(spec.chunk, n_scl)
    n_pad = int(-(-n_scl // chunk) * chunk)
    pad = n_pad - n_scl
    c3_p = jnp.pad(jnp.asarray(c3_static, jnp.int32), ((0, pad), (0, 0)))
    ctr_p = jnp.pad(center, ((0, pad), (0, 0)))
    rad_p = jnp.pad(radius, (0, pad))
    has_p = jnp.pad(has_atoms, (0, pad))

    scl_ids = np.arange(CPC, dtype=np.int64)

    def per_chunk(args):
        c3_c, ctr_c, rad_c, has_c = args
        nc3 = (c3_c[:, None, :] + jnp.asarray(offs, jnp.int32)[None]) % cps_a
        ncell = (nc3[..., 0] * cps[1] + nc3[..., 1]) * cps[2] + nc3[..., 2]
        cand = (ncell[:, :, None] * CPC
                + jnp.asarray(scl_ids, jnp.int32)[None, None, :])
        cand = cand.reshape(c3_c.shape[0], 27 * CPC)
        d = box.min_image(ctr_c[:, None, :] - center[cand])
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
        reach = rc + rad_c[:, None] + radius[cand]
        mask = (dist < reach) & has_atoms[cand] & has_c[:, None]
        return nbrmod._compact_topk(cand, mask, KC, n_scl)

    jcl_c, count_c = jax.lax.map(
        per_chunk,
        (c3_p.reshape(-1, chunk, 3), ctr_p.reshape(-1, chunk, 3),
         rad_p.reshape(-1, chunk), has_p.reshape(-1, chunk)),
    )
    jcl = jcl_c.reshape(n_pad, KC)[:n_scl]
    count = count_c.reshape(n_pad)[:n_scl]
    mx = jnp.max(count).astype(jnp.int32)
    return ClusterList(
        jcl=jcl.astype(jnp.int32),
        atom_slot=atom_slot,
        slot_atom=slot_atom,
        x0=x,
        overflow=cell_overflow | (mx > KC),
        max_occupancy=mx,
        kc=KC,
    )


def as_neighbor_list(cl: ClusterList, n_atoms: int) -> "nbrmod.NeighborList":
    """Expand into a padded ATOM neighbor list in atom order (validation and
    reuse of the XLA pair styles)."""
    n_scl = cl.n_clusters
    KC = cl.kc
    # slot rows of each candidate j-cluster -> atom ids
    base = jnp.where(cl.jcl < n_scl, cl.jcl * CL, -1)        # (n_scl, KC)
    rows = base[:, :, None] + jnp.arange(CL, dtype=jnp.int32)[None, None, :]
    jat = jnp.where(base[:, :, None] >= 0,
                    cl.slot_atom[jnp.clip(rows, 0, cl.n_slots - 1)], n_atoms)
    idx_scl = jat.reshape(n_scl, KC * CL)                    # per i-cluster
    # per-slot rows -> per-atom rows
    slot_cluster = jnp.arange(cl.n_slots, dtype=jnp.int32) // CL
    idx_slots = idx_scl[slot_cluster]                        # (N_s, KC*CL)
    idx = idx_slots[cl.atom_slot]                            # (N, KC*CL)
    self_idx = jnp.arange(n_atoms, dtype=jnp.int32)[:, None]
    idx = jnp.where(idx == self_idx, n_atoms, idx)
    return nbrmod.NeighborList(
        idx=idx, x0=cl.x0, overflow=cl.overflow,
        max_occupancy=cl.max_occupancy * CL, capacity=KC * CL)
