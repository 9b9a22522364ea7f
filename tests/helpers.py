"""Shared test fixtures: small UCG systems, analytic soft-pair tables, and a
scalar NumPy oracle implementing the reference's half-list algorithms."""

import numpy as np

from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
from lammps_ucg_dev_tpu.io.table_io import RLINEAR, RawTable
from lammps_ucg_dev_tpu.models.typemap import TablePairBuilder


def soft_pair(r, eps=1.0, sigma=1.0, rc=2.5):
    """A smooth, bounded pair potential (cosine-soft): finite at r→0, zero at
    rc with zero slope — ideal for conservation tests.
    E = eps*(1+cos(pi r / rc)), F = eps*pi/rc*sin(pi r/rc)."""
    e = eps * (1.0 + np.cos(np.pi * r / rc))
    f = eps * np.pi / rc * np.sin(np.pi * r / rc)
    return e, f


def make_soft_table(eps, rc, n=1500, rlo=1e-3):
    r = np.linspace(rlo, rc, n)
    e, f = soft_pair(r, eps=eps, rc=rc)
    return RawTable(r=r, e=e, f=f, rflag=RLINEAR, rlo=rlo, rhi=rc)


TWO_STATE_SETTINGS = """1 2 2
1 2
1 2
0.0 0.3
"""

MIXED_SETTINGS = """2 3 2
1 1
2 2
2 3
0.0 0.4
"""


def build_two_state(tabstyle="linear", tablength=1200, rc=2.5,
                    eps=(1.0, 0.6, 0.6, 0.25), dtype=None):
    """1 actual type, 2 states (formal 1, 2). eps = (e00, e01, e10, e11)."""
    import jax.numpy as jnp

    st = parse_state_settings(TWO_STATE_SETTINGS, "ucgld")
    b = TablePairBuilder(tabstyle, tablength, st)
    entries = [(make_soft_table(e, rc), rc) for e in eps]
    b.pair_coeff(1, 1, 2, 2, entries)
    bank, tp = b.build(dtype=dtype or jnp.float64)
    return st, bank, tp, rc


def build_mixed(tabstyle="linear", tablength=1200, rc=2.5, dtype=None):
    """2 actual types: type 1 plain CG, type 2 UCG with formals (2, 3)."""
    import jax.numpy as jnp

    st = parse_state_settings(MIXED_SETTINGS, "ucgld")
    b = TablePairBuilder(tabstyle, tablength, st)
    # formal pair tables: (1,1), (1,2), (1,3), (2,2), (2,3), (3,3)
    b.pair_coeff(1, 1, 1, 1, [(make_soft_table(1.0, rc), rc)])
    b.pair_coeff(1, 2, 1, 2, [(make_soft_table(0.8, rc), rc),
                              (make_soft_table(0.5, rc), rc)])
    b.pair_coeff(2, 2, 2, 2, [(make_soft_table(0.9, rc), rc),
                              (make_soft_table(0.55, rc), rc),
                              (make_soft_table(0.55, rc), rc),
                              (make_soft_table(0.3, rc), rc)])
    bank, tp = b.build(dtype=dtype or jnp.float64)
    return st, bank, tp, rc


def random_fluid(rng, n, L, min_sep=0.85, tries=4000):
    """Random positions with a minimum separation (avoid table inner cutoff)."""
    pts = []
    while len(pts) < n:
        cand = rng.uniform(0, L, 3)
        ok = True
        for p in pts:
            d = cand - p
            d -= L * np.round(d / L)
            if np.dot(d, d) < min_sep**2:
                ok = False
                break
        if ok:
            pts.append(cand)
        tries -= 1
        if tries <= 0:
            raise RuntimeError("could not place atoms")
    return np.asarray(pts)


# ---------------------------------------------------------------------------
# Scalar oracle: reference half-list algorithm (pair_table_ucgld.cpp:111-541),
# with the catalogued scenario-2 stale-si bug corrected (intended physics).
# ---------------------------------------------------------------------------

def oracle_ucgld(x, typ, ucgl, ucgstate, L, st, tables_eval, cutsq, kT, mu):
    """tables_eval(fi, fj, rsq) -> (e, fpair) for formal pair (fi, fj).

    Returns dict with f, ucgforce, scores, pe. Half-list loops (i < j),
    both-side tallies — exactly the reference's newton-on bookkeeping."""
    n = len(x)
    f = np.zeros((n, 3))
    ucgf = np.zeros(n)
    scores = np.zeros((n, 2))
    pe = 0.0

    nstate = st.n_states_per_type
    formal = st.formal_from_actual

    # chemical-potential pre-pass (:170-180)
    for i in range(n):
        t = typ[i]
        if nstate[t] > 1:
            mui = mu[formal[t][1]] - mu[formal[t][0]]
            ucgf[i] -= mui
            scores[i][1] -= mui / kT

    for i in range(n):
        for j in range(i + 1, n):
            d = x[i] - x[j]
            d -= L * np.round(d / L)
            rsq = float(np.dot(d, d))
            ti, tj = typ[i], typ[j]
            if rsq >= cutsq[ti][tj]:
                continue
            ldi, ldj = ucgl[i], ucgl[j]
            nsi, nsj = nstate[ti], nstate[tj]
            u = np.zeros((2, 2))
            fp = np.zeros((2, 2))
            for si in range(nsi):
                for sj in range(nsj):
                    e_, f_ = tables_eval(formal[ti][si], formal[tj][sj], rsq)
                    u[si, sj] = e_
                    fp[si, sj] = f_
            if nsi == 1 and nsj == 1:
                fpair, evdwl = fp[0, 0], u[0, 0]
            elif nsi == 1 and nsj > 1:
                fpair = (1 - ldj) * fp[0, 0] + ldj * fp[0, 1]
                evdwl = (1 - ldj) * u[0, 0] + ldj * u[0, 1]
                for sj in range(nsj):
                    scores[j][sj] -= u[0, sj] / kT
                ucgf[j] -= u[0, 1] - u[0, 0]
            elif nsi > 1 and nsj == 1:
                fpair = (1 - ldi) * fp[0, 0] + ldi * fp[1, 0]
                evdwl = (1 - ldi) * u[0, 0] + ldi * u[1, 0]
                for si in range(nsi):
                    scores[i][si] -= u[si, 0] / kT
                ucgf[i] -= u[1, 0] - u[0, 0]
            else:
                wi = np.array([1 - ldi, ldi])
                wj = np.array([1 - ldj, ldj])
                evdwl = wi @ u @ wj
                fpair = wi @ fp @ wj
                for si in range(2):
                    scores[i][si] -= u[si, ucgstate[j]] / kT
                for sj in range(2):
                    scores[j][sj] -= u[ucgstate[i], sj] / kT
                ucgf[i] -= ldj * (u[1, 1] - u[0, 1]) + (1 - ldj) * (u[1, 0] - u[0, 0])
                ucgf[j] -= ldi * (u[1, 1] - u[1, 0]) + (1 - ldi) * (u[0, 1] - u[0, 0])
            f[i] += d * fpair
            f[j] -= d * fpair
            pe += evdwl
    return {"f": f, "ucgforce": ucgf, "scores": scores, "pe": pe}


def bethe_pij_scalar(u, pi1, pj1, kT, method="bethe"):
    """Scalar Bethe closed form (pair_table_ucg_bethe.cpp:544-581)."""
    import math

    J = u[1, 1] + u[0, 0] - u[0, 1] - u[1, 0]
    if J / kT < -709.0:
        J = -700.0 * kT
    b = math.exp(-J / kT)
    a = math.expm1(-J / kT)
    if method == "mf" or abs(a) < 1e-6:
        p11 = pi1 * pj1
    else:
        Q = (pi1 + pj1) * a + 1.0
        D = max(Q * Q - 4.0 * a * b * pi1 * pj1, 0.0)
        if Q < 0.0:
            p11 = (Q - math.sqrt(D)) / (2.0 * a)
        else:
            p11 = 2.0 * b * pi1 * pj1 / (Q + math.sqrt(D))
    p00 = 1.0 + p11 - pi1 - pj1
    p10 = pi1 - p11
    p01 = pj1 - p11
    return np.array([[p00, p01], [p10, p11]])


def oracle_bethe(x, typ, ucgl, ucgp, ucgstate, L, st, tables_eval, cutsq, kT,
                 mu, method="bethe", pseudo=True):
    """Half-list oracle for pair_table_ucg_bethe.cpp:88-630 (intended physics:
    sj-keyed scenario-2 mixing; correct SCE conditional pairing).
    Assumes all ucgp are assigned (no first-step sentinel)."""
    n = len(x)
    f = np.zeros((n, 3))
    scores = np.zeros((n, 2))
    pe = 0.0
    nstate = st.n_states_per_type
    formal = st.formal_from_actual

    # chemical-potential score init (:155-162)
    for i in range(n):
        t = typ[i]
        if nstate[t] > 1:
            for s in range(2):
                scores[i][s] -= mu[formal[t][s]] / kT

    for i in range(n):
        for j in range(i + 1, n):
            d = x[i] - x[j]
            d -= L * np.round(d / L)
            rsq = float(np.dot(d, d))
            ti, tj = typ[i], typ[j]
            if rsq >= cutsq[ti][tj]:
                continue
            nsi, nsj = nstate[ti], nstate[tj]
            u = np.zeros((2, 2))
            fp = np.zeros((2, 2))
            for si in range(nsi):
                for sj in range(nsj):
                    e_, f_ = tables_eval(formal[ti][si], formal[tj][sj], rsq)
                    u[si, sj] = e_
                    fp[si, sj] = f_
            pi1 = ucgl[i] if nsi > 1 else 0.0
            pj1 = ucgp[j] if nsj > 1 else 0.0
            if nsi == 1 and nsj == 1:
                fpair, evdwl = fp[0, 0], u[0, 0]
            elif nsi == 1 and nsj > 1:
                fpair = (1 - pj1) * fp[0, 0] + pj1 * fp[0, 1]
                evdwl = (1 - pj1) * u[0, 0] + pj1 * u[0, 1]
                for sj in range(nsj):
                    scores[j][sj] -= u[0, sj] / kT
            elif nsi > 1 and nsj == 1:
                fpair = (1 - pi1) * fp[0, 0] + pi1 * fp[1, 0]
                evdwl = (1 - pi1) * u[0, 0] + pi1 * u[1, 0]
                for si in range(nsi):
                    scores[i][si] -= u[si, 0] / kT
            else:
                p = bethe_pij_scalar(u, pi1, pj1, kT, method)
                evdwl = float(np.sum(p * u))
                fpair = float(np.sum(p * fp))
                if pseudo:
                    for si in range(2):
                        scores[i][si] -= u[si, ucgstate[j]] / kT
                    for sj in range(2):
                        scores[j][sj] -= u[ucgstate[i], sj] / kT
                else:
                    pi_m = np.array([1 - pi1, pi1])
                    pj_m = np.array([1 - pj1, pj1])
                    for si in range(2):
                        scores[i][si] -= sum(
                            p[si, sj] / max(pi_m[si], 1e-6) * u[si, sj]
                            for sj in range(2)) / kT
                    for sj in range(2):
                        scores[j][sj] -= sum(
                            p[si, sj] / max(pj_m[sj], 1e-6) * u[si, sj]
                            for si in range(2)) / kT
            f[i] += d * fpair
            f[j] -= d * fpair
            pe += evdwl
    return {"f": f, "scores": scores, "pe": pe}


def make_tables_eval(bank):
    """Adapter: evaluate the device TableBank on formal pairs via a host map
    (LINEAR interpolation replicated in NumPy for exactness)."""
    import numpy as np

    e = np.asarray(bank.e)
    de = np.asarray(bank.de)
    fa = np.asarray(bank.f)
    dfa = np.asarray(bank.df)
    innersq = np.asarray(bank.innersq)
    invd = np.asarray(bank.invdelta)
    L = bank.nbins

    def eval_tab(tid, rsq):
        xbin = (rsq - innersq[tid]) * invd[tid]
        it = min(max(int(xbin), 0), L - 2)
        frac = xbin - it
        return (e[tid, it] + frac * de[tid, it],
                fa[tid, it] + frac * dfa[tid, it])

    return eval_tab
