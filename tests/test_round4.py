"""Round-4 additions: stock particle-DOF thermostat (fix nve + fix langevin,
pair_table_ucgld.cpp:872-881 kT plumbing) and the f32-stable Bethe prior
log-ratio (PARITY 3b)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import helpers
from make_deck import write_bethe_deck  # noqa: E402

from lammps_ucg_dev_tpu.compat.script import ScriptRunner
from lammps_ucg_dev_tpu.core.state import Box, SimState
from lammps_ucg_dev_tpu.io.state_settings import parse_state_settings
from lammps_ucg_dev_tpu.models import pair_bethe_density
from lammps_ucg_dev_tpu.models.pair_bethe import bethe_log_ratio, bethe_pij
from lammps_ucg_dev_tpu.models.typemap import TablePairBuilder
from lammps_ucg_dev_tpu.ops import neighbor as nb

RC = 2.5
KT = 0.8


# ---------------------------------------------------------------------------
# stable Bethe log-ratio (VERDICT r3 item 5)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_bethe_log_ratio_matches_naive_where_conditioned(rng):
    n = 50000
    pi = rng.uniform(1e-5, 1 - 1e-5, n)
    pj = rng.uniform(1e-5, 1 - 1e-5, n)
    J = rng.uniform(-60, 60, n)
    u4 = np.zeros((n, 2, 2))
    u4[:, 1, 1] = J
    p4 = np.asarray(bethe_pij(jnp.asarray(u4), jnp.asarray(pi),
                              jnp.asarray(pj), 1.0))
    p11, p01 = p4[:, 1, 1], p4[:, 0, 1]
    naive = np.log(np.maximum(p11, 1e-300) / np.maximum(p01, 1e-300))
    stable = np.asarray(bethe_log_ratio(jnp.asarray(J), jnp.asarray(pi),
                                        jnp.asarray(pj), 1.0))
    # agree where the naive form is well-conditioned
    ok = np.isfinite(naive) & (p01 > 1e-6) & (p11 > 1e-6)
    err = np.abs(stable[ok] - naive[ok]) / np.maximum(np.abs(naive[ok]), 1.0)
    assert err.max() < 1e-6
    # finite everywhere, including where the naive form degenerates
    assert np.all(np.isfinite(stable))


def test_bethe_log_ratio_f32_close_to_f64(rng):
    n = 50000
    pi = rng.uniform(1e-4, 1 - 1e-4, n)
    pj = rng.uniform(1e-4, 1 - 1e-4, n)
    J = rng.uniform(-60, 60, n)
    f64 = np.asarray(bethe_log_ratio(jnp.asarray(J), jnp.asarray(pi),
                                     jnp.asarray(pj), 1.0))
    f32 = np.asarray(bethe_log_ratio(
        jnp.asarray(J, jnp.float32), jnp.asarray(pi, jnp.float32),
        jnp.asarray(pj, jnp.float32), jnp.float32(1.0)))
    rel = np.abs(f32 - f64) / np.maximum(np.abs(f64), 1.0)
    assert rel.max() < 1e-3


@pytest.mark.quick
def test_bethe_log_ratio_mf_limit(rng):
    # J -> 0 reduces exactly to the mean-field ratio pi/(1-pi)
    pi = rng.uniform(0.01, 0.99, 100)
    pj = rng.uniform(0.01, 0.99, 100)
    lr = np.asarray(bethe_log_ratio(jnp.zeros(100), jnp.asarray(pi),
                                    jnp.asarray(pj), 1.0))
    np.testing.assert_allclose(lr, np.log(pi / (1 - pi)), rtol=1e-10)
    lr_mf = np.asarray(bethe_log_ratio(jnp.full(100, -5.0), jnp.asarray(pi),
                                       jnp.asarray(pj), 1.0, method="mf"))
    np.testing.assert_allclose(lr_mf, np.log(pi / (1 - pi)), rtol=1e-10)


P3_STRONG = """1 2 2
1 2
1 2 density entropy
6.0 1.5
0.0 0.2
"""


def _p3_dense(dtype, rng, n=600):
    """Dense fluid with strongly-correlated state pairs (J/kT down to ~ -7):
    the PARITY-3b pathology where p01 = pj1 - p11 -> 0."""
    st = parse_state_settings(P3_STRONG, "bethe_density")
    b = TablePairBuilder("linear", 2000, st)
    mk = lambda e: (helpers.make_soft_table(e, RC, n=2000), RC)
    # J = e11 + e00 - e01 - e10 strongly negative at contact
    b.pair_coeff(1, 1, 2, 2, [mk(1.0), mk(0.8), mk(0.8), mk(-3.0)])
    bank, tp = b.build(dtype=dtype)
    L = (n / 0.6) ** (1 / 3)
    x = helpers.random_fluid(rng, n, L)
    box = Box.create([0, 0, 0], [L, L, L], dtype=dtype)
    state = SimState.create(
        x=x, typ=np.ones(n, np.int32), ucgstate=rng.integers(0, 2, n),
        ucgl=rng.uniform(0.2, 0.8, n), box=box, dtype=dtype)
    spec = nb.make_spec(n, [L] * 3, RC, 0.3, method="nsq")
    nbr = nb.build(state.x, state.box, spec)
    params = pair_bethe_density.make_params(bank, tp, KT, dtype=dtype)
    return state, nbr, params


def test_p3_f32_force_envelope_vs_f64(rng):
    """VERDICT r3 item 5 acceptance: f32 vs f64 P3 force envelope < 1% on a
    dense strongly-correlated fluid (was ~80% with the naive log-ratio)."""
    s64, n64, p64 = _p3_dense(jnp.float64, np.random.default_rng(7))
    s32, n32, p32 = _p3_dense(jnp.float32, np.random.default_rng(7))
    f64 = np.asarray(jax.jit(pair_bethe_density.compute)(s64, n64, p64).f,
                     np.float64)
    f32 = np.asarray(jax.jit(pair_bethe_density.compute)(s32, n32, p32).f,
                     np.float64)
    envelope = np.max(np.abs(f32 - f64)) / np.max(np.abs(f64))
    assert envelope < 0.01, f"f32 force envelope {envelope:.3%}"


# ---------------------------------------------------------------------------
# stock fix nve + fix langevin (VERDICT r3 item 3)
# ---------------------------------------------------------------------------

def _nvt_bethe_deck(tmp_path, n=256, nsteps=400, T=0.8):
    deck = write_bethe_deck(str(tmp_path), n=n, nsteps=nsteps, dt=0.004,
                            T=T, thermo_every=50, tablength=800)
    text = open(deck).read()
    text = text.replace("fix 1 all nve/ucgld", "fix 1 all nve")
    text = text.replace("fix 2 all ucgld/langevin 0.8 0.8 0.5 13",
                        "fix 2 all langevin 0.8 0.8 0.5 13")
    assert "fix 2 all langevin" in text
    return text


def test_nvt_bethe_deck_holds_temperature(tmp_path):
    """fix nve + fix langevin: NVT bethe deck equilibrates to the target
    temperature; pair kT is sourced from the velocity thermostat."""
    text = _nvt_bethe_deck(tmp_path)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)
    # kT plumbed from the velocity Langevin (no λ-Langevin in this deck)
    assert r.vlangevin is not None and r.langevin is None
    assert float(r.sim.pair_params.kT) == pytest.approx(0.8, rel=1e-12)
    temps = [row["temp"] for row in r.thermo_rows if row["step"] >= 200]
    tbar = float(np.mean(temps))
    assert 0.6 < tbar < 1.0, f"NVT mean temp {tbar} off target 0.8"
    # λ DOF untouched by the stock integrator (no λ drift in this deck)
    lam = np.asarray(r.state.ucgl)
    assert lam.min() >= 0.0 and lam.max() <= 1.0


def test_fix_nve_leaves_lambda_untouched(tmp_path):
    text = _nvt_bethe_deck(tmp_path, n=64, nsteps=20)
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    # capture initial λ by running 0 steps first
    import re

    text0 = re.sub(r"run \d+", "run 0", text)
    r.run_string(text0)
    lam0 = np.asarray(r.state.ucgl).copy()
    vl0 = np.asarray(r.state.ucgvl).copy()
    r2 = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                      log_callback=lambda m: None)
    r2.run_string(text)
    # ucgl evolves ONLY through fix ucgstate (posterior write), never through
    # λ-dynamics: v_λ stays exactly at its initial value
    np.testing.assert_array_equal(np.asarray(r2.state.ucgvl), vl0)
    assert lam0.shape == np.asarray(r2.state.ucgl).shape


def test_unfix_langevin_errors_without_thermostat(tmp_path):
    """unfix of the only thermostat followed by run errors (a kT-dividing
    pair style must not silently run exp(-J/0) physics; FixUCGState's
    analogue error is fix_ucgstate.cpp:152-154)."""
    text = _nvt_bethe_deck(tmp_path, n=64, nsteps=10)
    text += "unfix 2\nrun 10\n"
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    with pytest.raises(ValueError, match="thermostat"):
        r.run_string(text)
    assert r.vlangevin is None


def test_refix_langevin_resumes(tmp_path):
    """unfix + a replacement thermostat keeps running; the run after the
    refix completes all steps (thermo_every=5 so the final row lands on the
    last step)."""
    text = _nvt_bethe_deck(tmp_path, n=64, nsteps=10)
    text = text.replace("thermo 50", "thermo 5")
    text += "unfix 2\nfix 5 all langevin 0.8 0.8 0.5 17\nrun 10\n"
    r = ScriptRunner(workdir=str(tmp_path), dtype=jnp.float64,
                     log_callback=lambda m: None)
    r.run_string(text)
    assert r.vlangevin is not None
    assert r.thermo_rows[-1]["step"] == 20
