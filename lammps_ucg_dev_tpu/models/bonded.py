"""Bonded interactions: harmonic bonds and angles on fixed-shape topology.

``atom_style ucg`` is molecular — the reference's atom style carries bonds,
angles, dihedrals and impropers through every comm/exchange/data path
(/root/reference/UCG/atom_vec_ucg.cpp:33-96), and the implied stock-LAMMPS
runtime (SURVEY.md L0) computes their forces.  This module provides the
TPU-native equivalents of the stock styles the package's molecular decks
need:

* ``bond_style harmonic``:  E = K (r - r0)^2,   F = -2 K (r - r0) r̂
* ``angle_style harmonic``: E = K (θ - θ0)^2   (θ0 input in degrees)

Formulation: topology is stored as atom TAGS (stable under storage
reordering/sort_atoms); a tag→row map is rebuilt under jit each evaluation.
Per-term forces are scatter-added to their 2-3 member rows — topology is
O(N) with small constants, so unlike the pair loop this scatter is cheap.
Energies and virials are tallied once per term (the newton-on bookkeeping of
stock ``ev_tally``).

Exclusions: LAMMPS removes special 1-2/1-3/1-4 pairs (weight 0.0, the
default) from pair-style neighbor lists.  :func:`special_tags` builds the
fixed-capacity per-atom exclusion tag lists from the topology;
ops/neighbor.py applies them at list build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lammps_ucg_dev_tpu.core.state import SimState, pytree_dataclass


@pytree_dataclass()
class BondedParams:
    """Fixed-shape topology with per-term coefficients (pre-gathered by type
    so evaluation has no type indirection).  Zero-length arrays are valid."""

    bond_tags: jax.Array     # (B, 2) int32, 1-based atom tags
    bond_k: jax.Array        # (B,)
    bond_r0: jax.Array       # (B,)
    angle_tags: jax.Array    # (A, 3) int32 tags; center atom is column 1
    angle_k: jax.Array       # (A,)
    angle_t0: jax.Array      # (A,) radians
    dihedral_tags: jax.Array  # (D, 4) int32 tags, chain order 1-2-3-4
    dihedral_k: jax.Array     # (D,)
    dihedral_d: jax.Array     # (D,) ±1 sign in E = K[1 + d cos(nφ)]
    dihedral_wsel: jax.Array  # (D, NMAX+1) one-hot multiplicity selector
    improper_tags: jax.Array  # (I, 4) int32 tags (dihedral-like χ over 1-2-3-4)
    improper_k: jax.Array     # (I,)
    improper_x0: jax.Array    # (I,) radians

    @property
    def n_bonds(self) -> int:
        return self.bond_tags.shape[0]

    @property
    def n_angles(self) -> int:
        return self.angle_tags.shape[0]

    @property
    def n_dihedrals(self) -> int:
        return self.dihedral_tags.shape[0]

    @property
    def n_impropers(self) -> int:
        return self.improper_tags.shape[0]


def make_params(bonds=None, bond_coeffs=None, angles=None, angle_coeffs=None,
                dtype=jnp.float32, dihedrals=None, dihedral_coeffs=None,
                impropers=None, improper_coeffs=None) -> BondedParams:
    """From data-file topology rows (io/data.py: ``(nb, 4) = id type a1 a2``
    bonds, ``(na, 5) = id type a1 a2 a3`` angles, ``(nd/ni, 6) = id type a1
    a2 a3 a4`` dihedrals/impropers) and per-type coefficient dicts
    ``{type: (K, r0)}`` / ``{type: (K, theta0_degrees)}`` /
    ``{type: (K, d, n)}`` (dihedral harmonic: E = K[1 + d cos(nφ)]) /
    ``{type: (K, chi0_degrees)}`` (improper harmonic: E = K(χ - χ0)²)."""
    if bonds is None or len(bonds) == 0:
        bt = np.zeros((0, 2), np.int32)
        bk = br = np.zeros((0,))
    else:
        bonds = np.asarray(bonds, np.int64)
        bt = bonds[:, 2:4].astype(np.int32)
        missing = set(bonds[:, 1]) - set(bond_coeffs or {})
        if missing:
            raise ValueError(f"no bond_coeff for bond types {sorted(missing)}")
        bk = np.asarray([bond_coeffs[t][0] for t in bonds[:, 1]])
        br = np.asarray([bond_coeffs[t][1] for t in bonds[:, 1]])
    if angles is None or len(angles) == 0:
        at = np.zeros((0, 3), np.int32)
        ak = a0 = np.zeros((0,))
    else:
        angles = np.asarray(angles, np.int64)
        at = angles[:, 2:5].astype(np.int32)
        missing = set(angles[:, 1]) - set(angle_coeffs or {})
        if missing:
            raise ValueError(f"no angle_coeff for angle types {sorted(missing)}")
        ak = np.asarray([angle_coeffs[t][0] for t in angles[:, 1]])
        a0 = np.deg2rad([angle_coeffs[t][1] for t in angles[:, 1]])
    if dihedrals is None or len(dihedrals) == 0:
        dt_tags = np.zeros((0, 4), np.int32)
        dk = dd = np.zeros((0,))
        dw = np.zeros((0, 1))
    else:
        dihedrals = np.asarray(dihedrals, np.int64)
        dt_tags = dihedrals[:, 2:6].astype(np.int32)
        missing = set(dihedrals[:, 1]) - set(dihedral_coeffs or {})
        if missing:
            raise ValueError(
                f"no dihedral_coeff for dihedral types {sorted(missing)}")
        dk = np.asarray([dihedral_coeffs[t][0] for t in dihedrals[:, 1]])
        dd = np.asarray([dihedral_coeffs[t][1] for t in dihedrals[:, 1]])
        if not np.all(np.isin(dd, (-1.0, 1.0))):
            raise ValueError("dihedral harmonic d must be +1 or -1")
        dn = np.asarray([dihedral_coeffs[t][2] for t in dihedrals[:, 1]],
                        np.int64)
        if np.any(dn < 0):
            raise ValueError("dihedral harmonic n must be >= 0")
        nmax = int(dn.max())
        dw = np.zeros((len(dn), nmax + 1))
        dw[np.arange(len(dn)), dn] = 1.0      # one-hot T_n selector
    if impropers is None or len(impropers) == 0:
        it_tags = np.zeros((0, 4), np.int32)
        ik = ix0 = np.zeros((0,))
    else:
        impropers = np.asarray(impropers, np.int64)
        it_tags = impropers[:, 2:6].astype(np.int32)
        missing = set(impropers[:, 1]) - set(improper_coeffs or {})
        if missing:
            raise ValueError(
                f"no improper_coeff for improper types {sorted(missing)}")
        ik = np.asarray([improper_coeffs[t][0] for t in impropers[:, 1]])
        ix0 = np.deg2rad([improper_coeffs[t][1] for t in impropers[:, 1]])
    return BondedParams(
        bond_tags=jnp.asarray(bt), bond_k=jnp.asarray(bk, dtype),
        bond_r0=jnp.asarray(br, dtype), angle_tags=jnp.asarray(at),
        angle_k=jnp.asarray(ak, dtype), angle_t0=jnp.asarray(a0, dtype),
        dihedral_tags=jnp.asarray(dt_tags),
        dihedral_k=jnp.asarray(dk, dtype), dihedral_d=jnp.asarray(dd, dtype),
        dihedral_wsel=jnp.asarray(dw, dtype),
        improper_tags=jnp.asarray(it_tags),
        improper_k=jnp.asarray(ik, dtype),
        improper_x0=jnp.asarray(ix0, dtype))


def _tag_rows(state: SimState):
    """tag → storage-row map (identity when atoms are unsorted)."""
    n = state.n_atoms
    return jnp.zeros((state.rng_n,), jnp.int32).at[state.tag - 1].set(
        jnp.arange(n, dtype=jnp.int32))


def _cos_torsion(b1, b2, b3):
    """Cosine of the torsion angle of the bond-vector chain (b1, b2, b3):
    cos φ = (b1×b2)·(b2×b3) / (|b1×b2| |b2×b3|).  Identical to the
    reference's plane-normal formulations — dihedral_harmonic's
    ax/bx cross products and improper_harmonic's (c1·c2 + c0)·s12 both
    reduce to this expression (Lagrange identity).  Guarded against
    collinear chains (|n| → 0) and padded rows."""
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    denom = jnp.sqrt(jnp.maximum(
        jnp.sum(n1 * n1, -1) * jnp.sum(n2 * n2, -1), 1e-24))
    return jnp.clip(jnp.sum(n1 * n2, -1) / denom, -1.0, 1.0)


@jax.custom_jvp
def _acos_guarded(c):
    """arccos whose DERIVATIVE carries the reference's sin guard
    (improper_harmonic SMALL = 0.001): d/dc = -1/max(√(1-c²), 1e-3), so
    the improper force stays finite at the planar (χ → 0 or π)
    configurations where raw autodiff would divide by zero."""
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


@_acos_guarded.defjvp
def _acos_guarded_jvp(primals, tangents):
    (c,), (dc,) = primals, tangents
    cc = jnp.clip(c, -1.0, 1.0)
    s = jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - cc * cc, 0.0)), 1e-3)
    return jnp.arccos(cc), -dc / s


def _torsion_terms(x, box, i1, i2, i3, i4, mask, e_of_c):
    """Generic 4-body torsion evaluation in bond-vector form.

    Energy is a function of the three min-imaged bond vectors (translation
    invariant by construction); member forces come from ONE reverse-mode
    grad through ``e_of_c`` — exactly F = -∇E, the TPU-native replacement
    for the reference's hand-derived force assembly
    (dihedral_harmonic.cpp / improper_harmonic.cpp).  Returns per-term
    energies (T,), member force shares f1..f4 (T, 3) with
    f1 = g1, f2 = g2-g1, f3 = g3-g2, f4 = -g3 (momentum-conserving), and
    per-term 6-vector virials W = -Σ_j b_j ⊗ g_j (symmetrized off-diag)."""
    b1 = box.min_image(x[i2] - x[i1])
    b2 = box.min_image(x[i3] - x[i2])
    b3 = box.min_image(x[i4] - x[i3])
    bs = jnp.stack([b1, b2, b3], axis=1)           # (T, 3, 3)
    zero = jnp.zeros((), x.dtype)

    def etot(bs_):
        c = _cos_torsion(bs_[:, 0], bs_[:, 1], bs_[:, 2])
        return jnp.sum(jnp.where(mask, e_of_c(c), zero))

    g = jax.grad(etot)(bs)                         # (T, 3, 3) dE/db_j
    pe_t = jnp.where(mask, e_of_c(_cos_torsion(b1, b2, b3)), zero)
    g1, g2, g3 = g[:, 0], g[:, 1], g[:, 2]
    f1 = g1
    f2 = g2 - g1
    f3 = g3 - g2
    f4 = -g3
    bb = (b1, b2, b3)
    gg = (g1, g2, g3)
    diag = [-sum(b[:, a] * gj[:, a] for b, gj in zip(bb, gg))
            for a in range(3)]
    off = [-0.5 * sum(b[:, a] * gj[:, b_] + b[:, b_] * gj[:, a]
                      for b, gj in zip(bb, gg))
           for (a, b_) in ((0, 1), (0, 2), (1, 2))]
    vir_t = jnp.stack(diag + off, axis=1)          # (T, 6)
    return pe_t, (f1, f2, f3, f4), vir_t


def _dihedral_e_of_c(k, d, wsel):
    """E(c) = K [1 + d·T_n(cos φ)] — cos(nφ) via the Chebyshev recurrence
    (polynomial in c: smooth autodiff everywhere, unlike cos(n·arccos)),
    multiplicity selected per term by the one-hot ``wsel``."""
    deg = wsel.shape[1] - 1

    def e(c):
        tprev = jnp.ones_like(c)
        acc = wsel[:, 0] * tprev
        tcur = c
        if deg >= 1:
            acc = acc + wsel[:, 1] * tcur
        for m in range(2, deg + 1):
            tnew = 2.0 * c * tcur - tprev
            acc = acc + wsel[:, m] * tnew
            tprev, tcur = tcur, tnew
        return k * (1.0 + d * acc)

    return e


def _improper_e_of_c(k, x0):
    """E(c) = K (χ - χ0)², χ = arccos(c) with the guarded derivative."""
    def e(c):
        chi = _acos_guarded(c)
        return k * (chi - x0) ** 2

    return e


def compute(state: SimState, params: BondedParams):
    """(f, pe, virial) of all bonded terms; shapes match the pair ForceOut
    fields so the driver adds them in."""
    x, box = state.x, state.box
    n = x.shape[0]
    dt_ = x.dtype
    f = jnp.zeros((n, 3), dt_)
    pe = jnp.zeros((), dt_)
    vir = jnp.zeros((6,), dt_)
    inv = _tag_rows(state)
    # coefficients cast to the STATE dtype: params may have been built at a
    # different precision (e.g. f64 params driving an f32 kernel run), and
    # promotion would silently widen pe/virial
    bond_k = params.bond_k.astype(dt_)
    bond_r0 = params.bond_r0.astype(dt_)
    angle_k = params.angle_k.astype(dt_)
    angle_t0 = params.angle_t0.astype(dt_)

    if params.n_bonds:
        i = inv[params.bond_tags[:, 0] - 1]
        j = inv[params.bond_tags[:, 1] - 1]
        d = box.min_image(x[i] - x[j])
        r = jnp.sqrt(jnp.sum(d * d, axis=1))
        dr = r - bond_r0
        # bond_harmonic.cpp: fbond = -2 K dr / r; f[i] += fbond*d
        fbond = jnp.where(r > 0, -2.0 * bond_k * dr / r, 0.0)
        fb = fbond[:, None] * d
        f = f.at[i].add(fb).at[j].add(-fb)
        pe = pe + jnp.sum(bond_k * dr * dr)
        vir = vir + _vtally(fbond, d)

    if params.n_angles:
        i1 = inv[params.angle_tags[:, 0] - 1]
        i2 = inv[params.angle_tags[:, 1] - 1]
        i3 = inv[params.angle_tags[:, 2] - 1]
        d1 = box.min_image(x[i1] - x[i2])
        d2 = box.min_image(x[i3] - x[i2])
        r1 = jnp.sqrt(jnp.sum(d1 * d1, axis=1))
        r2 = jnp.sqrt(jnp.sum(d2 * d2, axis=1))
        c = jnp.sum(d1 * d2, axis=1) / (r1 * r2)
        c = jnp.clip(c, -1.0, 1.0)
        s = jnp.maximum(jnp.sqrt(1.0 - c * c), 1e-8)   # angle_harmonic SMALL
        dtheta = jnp.arccos(c) - angle_t0
        a = -2.0 * angle_k * dtheta / s
        a11 = a * c / (r1 * r1)
        a12 = -a / (r1 * r2)
        a22 = a * c / (r2 * r2)
        f1 = a11[:, None] * d1 + a12[:, None] * d2
        f3 = a22[:, None] * d2 + a12[:, None] * d1
        f = f.at[i1].add(f1).at[i3].add(f3).at[i2].add(-(f1 + f3))
        pe = pe + jnp.sum(angle_k * dtheta * dtheta)
        vir = vir + jnp.stack([
            jnp.sum(d1[:, 0] * f1[:, 0] + d2[:, 0] * f3[:, 0]),
            jnp.sum(d1[:, 1] * f1[:, 1] + d2[:, 1] * f3[:, 1]),
            jnp.sum(d1[:, 2] * f1[:, 2] + d2[:, 2] * f3[:, 2]),
            jnp.sum(d1[:, 0] * f1[:, 1] + d2[:, 0] * f3[:, 1]),
            jnp.sum(d1[:, 0] * f1[:, 2] + d2[:, 0] * f3[:, 2]),
            jnp.sum(d1[:, 1] * f1[:, 2] + d2[:, 1] * f3[:, 2]),
        ]).astype(dt_)

    if params.n_dihedrals:
        tg = params.dihedral_tags
        j1, j2 = inv[tg[:, 0] - 1], inv[tg[:, 1] - 1]
        j3, j4 = inv[tg[:, 2] - 1], inv[tg[:, 3] - 1]
        e_of_c = _dihedral_e_of_c(params.dihedral_k.astype(dt_),
                                  params.dihedral_d.astype(dt_),
                                  params.dihedral_wsel.astype(dt_))
        pe_t, (t1, t2, t3, t4), vir_t = _torsion_terms(
            x, box, j1, j2, j3, j4, jnp.ones(tg.shape[0], bool), e_of_c)
        f = f.at[j1].add(t1).at[j2].add(t2).at[j3].add(t3).at[j4].add(t4)
        pe = pe + jnp.sum(pe_t)
        vir = vir + jnp.sum(vir_t, axis=0)

    if params.n_impropers:
        tg = params.improper_tags
        j1, j2 = inv[tg[:, 0] - 1], inv[tg[:, 1] - 1]
        j3, j4 = inv[tg[:, 2] - 1], inv[tg[:, 3] - 1]
        e_of_c = _improper_e_of_c(params.improper_k.astype(dt_),
                                  params.improper_x0.astype(dt_))
        pe_t, (t1, t2, t3, t4), vir_t = _torsion_terms(
            x, box, j1, j2, j3, j4, jnp.ones(tg.shape[0], bool), e_of_c)
        f = f.at[j1].add(t1).at[j2].add(t2).at[j3].add(t3).at[j4].add(t4)
        pe = pe + jnp.sum(pe_t)
        vir = vir + jnp.sum(vir_t, axis=0)

    return f, pe, vir


def compute_spatial(state: SimState, params: BondedParams, rows, nloc):
    """Per-device bonded terms under the spatial (slab/pencil) drivers.

    Topology is REPLICATED (bond/angle tag tables are static arrays on
    every device — the TPU-native replacement for the reference's
    per-atom bond storage riding exchange comm, atom_vec_ucg.cpp:76-96);
    ``rows`` are this device's local row indices per term member,
    precomputed once per reneighbor block from the tag→row map
    (parallel/spatial.py), with sentinel = n_rows for members not present
    on this device.  Every member of an in-cutoff-visible term is present
    locally wherever one member is owned (bond lengths < halo width; the
    driver flags violations as overflow).

    Per-atom-owned tallies, the same newton-off bookkeeping as the pair
    path: each OWNED member accumulates only its own force share, and
    pe/virial are tallied fractionally (1/2 per owned bond member, 1/3
    per owned angle member, 1/4 per owned dihedral/improper member) so
    the cross-device psum counts each term exactly once.

    ``rows`` is a dict: {"bond": (i, j), "angle": (a1, a2, a3),
    "dihedral": (d1..d4), "improper": (i1..i4)} (4-body keys optional)."""
    x, box = state.x, state.box
    n = x.shape[0]
    dt_ = x.dtype
    b_i, b_j = rows["bond"]
    a_1, a_2, a_3 = rows["angle"]
    f = jnp.zeros((n, 3), dt_)
    pe = jnp.zeros((), dt_)
    vir = jnp.zeros((6,), dt_)
    # coefficients cast to the STATE dtype (see compute())
    bond_k = params.bond_k.astype(dt_)
    bond_r0 = params.bond_r0.astype(dt_)
    angle_k = params.angle_k.astype(dt_)
    angle_t0 = params.angle_t0.astype(dt_)

    if params.n_bonds:
        pres = (b_i < n) & (b_j < n)
        wi = (pres & (b_i < nloc)).astype(dt_)
        wj = (pres & (b_j < nloc)).astype(dt_)
        ic = jnp.minimum(b_i, n - 1)
        jc = jnp.minimum(b_j, n - 1)
        d = box.min_image(x[ic] - x[jc])
        r = jnp.sqrt(jnp.sum(d * d, axis=1))
        dr = r - bond_r0
        fbond = jnp.where(pres & (r > 0), -2.0 * bond_k * dr / r, 0.0)
        fb = fbond[:, None] * d
        f = f.at[jnp.where(wi > 0, b_i, n)].add(fb, mode="drop")
        f = f.at[jnp.where(wj > 0, b_j, n)].add(-fb, mode="drop")
        w2 = 0.5 * (wi + wj)
        pe = pe + jnp.sum(w2 * bond_k * dr * dr)
        vir = vir + _vtally(w2 * fbond, d)

    if params.n_angles:
        pres = (a_1 < n) & (a_2 < n) & (a_3 < n)
        w1 = (pres & (a_1 < nloc)).astype(dt_)
        w2_ = (pres & (a_2 < nloc)).astype(dt_)
        w3 = (pres & (a_3 < nloc)).astype(dt_)
        i1 = jnp.minimum(a_1, n - 1)
        i2 = jnp.minimum(a_2, n - 1)
        i3 = jnp.minimum(a_3, n - 1)
        d1 = box.min_image(x[i1] - x[i2])
        d2 = box.min_image(x[i3] - x[i2])
        r1 = jnp.sqrt(jnp.sum(d1 * d1, axis=1))
        r2 = jnp.sqrt(jnp.sum(d2 * d2, axis=1))
        c = jnp.sum(d1 * d2, axis=1) / jnp.maximum(r1 * r2, 1e-30)
        c = jnp.clip(c, -1.0, 1.0)
        s = jnp.maximum(jnp.sqrt(1.0 - c * c), 1e-8)
        dtheta = jnp.arccos(c) - angle_t0
        a = jnp.where(pres, -2.0 * angle_k * dtheta / s, 0.0)
        a11 = a * c / jnp.maximum(r1 * r1, 1e-30)
        a12 = -a / jnp.maximum(r1 * r2, 1e-30)
        a22 = a * c / jnp.maximum(r2 * r2, 1e-30)
        f1 = a11[:, None] * d1 + a12[:, None] * d2
        f3 = a22[:, None] * d2 + a12[:, None] * d1
        f = f.at[jnp.where(w1 > 0, a_1, n)].add(f1, mode="drop")
        f = f.at[jnp.where(w3 > 0, a_3, n)].add(f3, mode="drop")
        f = f.at[jnp.where(w2_ > 0, a_2, n)].add(-(f1 + f3), mode="drop")
        wf = (w1 + w2_ + w3) / 3.0
        pe = pe + jnp.sum(wf * angle_k * dtheta * dtheta)
        vir = vir + jnp.stack([
            jnp.sum(wf * (d1[:, 0] * f1[:, 0] + d2[:, 0] * f3[:, 0])),
            jnp.sum(wf * (d1[:, 1] * f1[:, 1] + d2[:, 1] * f3[:, 1])),
            jnp.sum(wf * (d1[:, 2] * f1[:, 2] + d2[:, 2] * f3[:, 2])),
            jnp.sum(wf * (d1[:, 0] * f1[:, 1] + d2[:, 0] * f3[:, 1])),
            jnp.sum(wf * (d1[:, 0] * f1[:, 2] + d2[:, 0] * f3[:, 2])),
            jnp.sum(wf * (d1[:, 1] * f1[:, 2] + d2[:, 1] * f3[:, 2])),
        ]).astype(dt_)

    def four_body(rows4, e_of_c, f, pe, vir):
        r1, r2, r3, r4 = rows4
        pres = (r1 < n) & (r2 < n) & (r3 < n) & (r4 < n)
        ws = [(pres & (r < nloc)).astype(dt_) for r in (r1, r2, r3, r4)]
        cl = [jnp.minimum(r, n - 1) for r in (r1, r2, r3, r4)]
        pe_t, fs, vir_t = _torsion_terms(x, box, *cl, pres, e_of_c)
        for r, w, fm in zip((r1, r2, r3, r4), ws, fs):
            f = f.at[jnp.where(w > 0, r, n)].add(fm, mode="drop")
        wf = sum(ws) / 4.0
        pe = pe + jnp.sum(wf * pe_t)
        vir = vir + jnp.sum(wf[:, None] * vir_t, axis=0)
        return f, pe, vir

    if params.n_dihedrals:
        f, pe, vir = four_body(
            rows["dihedral"],
            _dihedral_e_of_c(params.dihedral_k.astype(dt_),
                             params.dihedral_d.astype(dt_),
                             params.dihedral_wsel.astype(dt_)),
            f, pe, vir)
    if params.n_impropers:
        f, pe, vir = four_body(
            rows["improper"],
            _improper_e_of_c(params.improper_k.astype(dt_),
                             params.improper_x0.astype(dt_)),
            f, pe, vir)

    return f, pe, vir


def _vtally(fpair, d):
    return jnp.stack([
        jnp.sum(fpair * d[:, 0] * d[:, 0]),
        jnp.sum(fpair * d[:, 1] * d[:, 1]),
        jnp.sum(fpair * d[:, 2] * d[:, 2]),
        jnp.sum(fpair * d[:, 0] * d[:, 1]),
        jnp.sum(fpair * d[:, 0] * d[:, 2]),
        jnp.sum(fpair * d[:, 1] * d[:, 2]),
    ])


def potential_energy(x: jax.Array, state: SimState,
                     params: BondedParams) -> jax.Array:
    """E(x) for autodiff force checks (f = -∂E/∂x)."""
    st = state
    box = st.box
    inv = _tag_rows(st)
    e = jnp.zeros((), x.dtype)
    if params.n_bonds:
        i = inv[params.bond_tags[:, 0] - 1]
        j = inv[params.bond_tags[:, 1] - 1]
        d = box.min_image(x[i] - x[j])
        r = jnp.sqrt(jnp.sum(d * d, axis=1))
        e = e + jnp.sum(params.bond_k * (r - params.bond_r0) ** 2)
    if params.n_angles:
        i1 = inv[params.angle_tags[:, 0] - 1]
        i2 = inv[params.angle_tags[:, 1] - 1]
        i3 = inv[params.angle_tags[:, 2] - 1]
        d1 = box.min_image(x[i1] - x[i2])
        d2 = box.min_image(x[i3] - x[i2])
        c = (jnp.sum(d1 * d2, axis=1)
             / jnp.sqrt(jnp.sum(d1 * d1, 1) * jnp.sum(d2 * d2, 1)))
        dtheta = jnp.arccos(jnp.clip(c, -1.0, 1.0)) - params.angle_t0
        e = e + jnp.sum(params.angle_k * dtheta * dtheta)

    def torsion_e(tags, e_of_c):
        i1, i2 = inv[tags[:, 0] - 1], inv[tags[:, 1] - 1]
        i3, i4 = inv[tags[:, 2] - 1], inv[tags[:, 3] - 1]
        c = _cos_torsion(box.min_image(x[i2] - x[i1]),
                         box.min_image(x[i3] - x[i2]),
                         box.min_image(x[i4] - x[i3]))
        return jnp.sum(e_of_c(c))

    if params.n_dihedrals:
        e = e + torsion_e(params.dihedral_tags,
                          _dihedral_e_of_c(params.dihedral_k,
                                           params.dihedral_d,
                                           params.dihedral_wsel))
    if params.n_impropers:
        e = e + torsion_e(params.improper_tags,
                          _improper_e_of_c(params.improper_k,
                                           params.improper_x0))
    return e


def special_tags(n_atoms: int, bonds=None, angles=None, dihedrals=None,
                 weights=(0.0, 0.0, 0.0), cap: int | None = None) -> np.ndarray:
    """Per-atom special-neighbor TAG lists for pair-list exclusion.

    LAMMPS ``special_bonds`` semantics, weight-0 orders only (the default
    ``lj 0 0 0``): 1-2 partners from bonds, 1-3 from angles, 1-4 from
    dihedrals are removed from the pair list.  Fractional weights are not
    supported (raise) — the reference decks never use them.  Returns an
    (N, S) int32 array of tags, 0-padded; all-zero when nothing is excluded.
    """
    for w in weights:
        if w not in (0.0, 1.0):
            raise NotImplementedError(
                f"fractional special_bonds weight {w} unsupported "
                "(only 0 = exclude, 1 = full)")
    per = [set() for _ in range(n_atoms + 1)]   # 1-based tags

    def pair(a, b):
        per[a].add(b)
        per[b].add(a)

    if weights[0] == 0.0 and bonds is not None:
        for row in np.asarray(bonds, np.int64):
            pair(int(row[2]), int(row[3]))
    if weights[1] == 0.0 and angles is not None:
        for row in np.asarray(angles, np.int64):
            pair(int(row[2]), int(row[4]))      # 1-3 ends of the angle
    if weights[2] == 0.0 and dihedrals is not None:
        for row in np.asarray(dihedrals, np.int64):
            pair(int(row[2]), int(row[5]))      # 1-4 ends
    smax = max((len(s) for s in per), default=0)
    S = cap if cap is not None else max(smax, 1)
    if smax > S:
        raise ValueError(f"special-neighbor capacity {S} < max degree {smax}")
    out = np.zeros((n_atoms, S), np.int32)
    for tag in range(1, n_atoms + 1):
        lst = sorted(per[tag])
        out[tag - 1, :len(lst)] = lst
    return out
