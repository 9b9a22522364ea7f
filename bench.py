"""Headline benchmark: MD steps/sec for the 1M-bead two-state UCG-LD fluid
(BASELINE.json north star) on the available accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}

Structure: the default invocation is an ORCHESTRATOR that runs each leg in a
fresh subprocess — the axon TPU worker on this image intermittently crashes
on 1M-shape programs, and a crashed worker poisons its whole process — with
automatic size fallback (1M -> 512k -> 256k -> 128k) so a JSON line is always
produced.  ``--main-only`` / ``--drift-only`` are the in-process legs.

Baseline note: the reference publishes no numbers (BASELINE.md).  The
``vs_baseline`` ratio is computed against a MEASURED single-core C++
microbenchmark of the reference hot loop (tools/cpu_baseline.cpp — the
scenario-4 half-list lambda-mix with LINEAR r^2-binned tables from
pair_table_ucgld.cpp:184-541, run on this host's Xeon @ 2.10GHz at the
16k-atoms-per-rank operating point of a 1M-bead/64-rank run): 7.5e5
atom-steps/s/core x 64 cores (perfect-scaling, charitable) = 4.8e7
atom-steps/s.  Methodology + caveats in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

sys.path.insert(0, ".")

BASELINE_ATOM_STEPS_PER_SEC = 4.8e7   # measured 64-core LAMMPS CPU baseline
# (tools/cpu_baseline.cpp: 7.5e5 atom-steps/s/core on this host x 64 cores,
#  perfect scaling assumed; see BASELINE.md "Measured baseline")


def _enable_cache():
    # persistent compilation cache: compiles are both slow (minutes via the
    # axon remote-compile helper) and the trigger for TPU-worker crashes;
    # caching them makes repeat bench runs fast and far more reliable
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def run_main(n: int, steps: int, chunk: int) -> dict:
    import dataclasses

    import jax

    _enable_cache()

    from __graft_entry__ import _build_sim

    sim = _build_sim(n=n, reneigh_every=20)
    if chunk and n % chunk == 0:
        sim.pair_params = dataclasses.replace(sim.pair_params, chunk=chunk)
    cfg = sim.cfg
    nblocks = max(steps // cfg.reneigh_every, 1)
    total_steps = nblocks * cfg.reneigh_every
    window = (0, total_steps * 2)

    t0 = time.time()
    sim.setup(window)
    # warm up with the SAME static nblocks as the timed run — a different
    # block count is a different XLA program and would put its compile
    # inside the timed region
    sim.run_fused(nblocks, run_window=window)
    jax.block_until_ready(sim.state.x)
    compile_s = time.time() - t0

    t0 = time.time()
    sim.run_fused(nblocks, run_window=window)
    jax.block_until_ready(sim.state.x)
    wall = time.time() - t0

    row = sim.thermo()
    steps_per_sec = total_steps / wall
    atom_steps = steps_per_sec * n
    return {
        "metric": f"MD steps/sec, {n}-bead 2-state UCG-LD fluid "
                  f"(wall/hard+bias, lambda-Langevin, ucgstate), single chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(atom_steps / BASELINE_ATOM_STEPS_PER_SEC, 4),
        "atom_steps_per_sec": round(atom_steps, 1),
        "tau_per_day": round(steps_per_sec * cfg.dt * 86400.0, 1),
        "n_atoms": n,
        "timed_steps": total_steps,
        "compile_s": round(compile_s, 1),
        "etotal": round(row["etotal"], 3),
        "temp": round(row["temp"], 4),
        "device": str(jax.devices()[0]),
    }


def _bound_analysis(sim, state, nbr, n: int) -> "dict | None":
    """Roofline accounting for the fused column kernel (VERDICT r2 weak #1):
    candidate-window fill fractions, bytes DMA'd, VPU-op estimates, and the
    implied speed-of-light.  One chunk-free pair count on device; no timed
    work.  Returns None on non-column neighbor specs."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from lammps_ucg_dev_tpu.ops import colpack
    from lammps_ucg_dev_tpu.ops import neighbor as _nb

    spec = sim.nbr_spec
    if not isinstance(spec, colpack.ColumnSpec):
        return None
    cand = colpack.NSTEN * colpack.W
    deg = sim.pair_params.cheb.degree if sim.pair_params.cheb else 0
    ops = 10 * deg + 60
    mean_span = float(nbr.mean_span)
    # true within-cutoff pair count (the geometric necessity the candidate
    # set is compared against)
    cnt_spec = _nb.make_spec(n, _np.asarray(state.box.lengths),
                             spec.cutoff, spec.skin)
    cnt_nbr = _nb.build(state.x, state.box, cnt_spec)

    @jax.jit
    def _counts(x, idx):
        jc = jnp.where(idx < n, idx, 0)
        dr = state.box.min_image(x[:, None, :] - x[jc])
        rsq = jnp.sum(dr * dr, axis=-1)
        ok = idx < n
        within = ok & (rsq < spec.cutoff**2)
        inlist = ok & (rsq < spec.rc**2)
        return jnp.sum(within) / n, jnp.sum(inlist) / n

    true_pairs, list_pairs = (float(v) for v in _counts(state.x,
                                                        cnt_nbr.idx))
    n_prog = nbr.n_prog
    dma_bytes = n_prog * colpack.NSTEN * 8 * colpack.W * 4
    io_bytes = nbr.n_slots * 8 * 4 * 2          # ipack read + out write
    sol_1x = cand * ops / (1024 * 0.94e9) * 1e9
    return {
        "candidates_per_atom": cand,
        "true_pairs_per_atom_cutoff": round(true_pairs, 1),
        "true_pairs_per_atom_list": round(list_pairs, 1),
        "mean_window_span_slots": round(mean_span, 1),
        "geometric_fill": round(mean_span / colpack.W, 3),
        "true_fill_of_candidates": round(true_pairs / cand, 3),
        "cheb_degree": deg,
        "est_vpu_ops_per_candidate": ops,
        "window_dma_bytes_per_atom": round(dma_bytes / n, 1),
        "io_bytes_per_atom": round(io_bytes / n, 1),
        "hbm_sol_ns_atom": round((dma_bytes + io_bytes) / n / 819.0, 2),
        "vpu_sol_ns_atom_1slot": round(sol_1x, 1),
        "note": ("VPU-bound: the 1-op/lane/cycle SOL brackets the "
                 "ceiling from above per-slot; fill ratios bound the "
                 "candidate-pruning headroom (span-tight windows would "
                 "cut compute by W/mean_span)"),
    }


def run_roofline(n: int) -> dict:
    """Standalone roofline leg (crash-isolated subprocess of the default
    orchestration, so the accounting lands in the headline BENCH JSON):
    fill fractions and byte/op counts are geometry/density properties —
    size-capped at 262k where the accounting protocol is pinned."""
    _enable_cache()

    import jax

    from __graft_entry__ import _build_sim

    n = min(n, 262144)
    sim = _build_sim(n=n, reneigh_every=20)
    sim.setup((0, 1000))
    nbr = sim._nbr_build(sim.state)
    jax.block_until_ready(sim.state.x)
    ba = _bound_analysis(sim, sim.state, nbr, n)
    return {"bound_analysis": ba, "roofline_n_atoms": n}


def run_phases(n: int, reps: int = 30, skin: float = 0.4,
               reneigh: int = 20) -> dict:
    """Phase breakdown on device: pair-force eval alone (fast + full kernel
    variants), candidate pack alone, neighbor/column build, and a full MD
    step — the Timer-style observability the reference gets from stock
    LAMMPS (SURVEY.md §5).  Also prints a VPU bound analysis for the kernel
    path (the pair kernel is VPU-bound, not MXU/HBM-bound: tabulated pair
    physics has no matmul shape)."""
    import jax
    import jax.numpy as jnp

    _enable_cache()

    from __graft_entry__ import _build_sim
    from lammps_ucg_dev_tpu.ops import colpack

    sim = _build_sim(n=n, reneigh_every=reneigh, skin=skin)
    sim.setup((0, 1000))
    state = sim.state
    nbr = sim._nbr_build(state)
    jax.block_until_ready(state.x)

    def timeit(fn, *args):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / reps

    out = {"n_atoms": n, "device": str(jax.devices()[0])}
    pair_full = jax.jit(lambda s, c: sim.pair_compute(s, c, sim.pair_params))
    out["pair_full_ns_atom"] = round(timeit(pair_full, state, nbr) / n * 1e9, 2)
    fast = getattr(sim.pair_compute, "fast_variant", None)
    if fast is not None:
        pair_fast = jax.jit(lambda s, c: fast(s, c, sim.pair_params))
        out["pair_fast_ns_atom"] = round(
            timeit(pair_fast, state, nbr) / n * 1e9, 2)
    nos = getattr(sim.pair_compute, "fast_variant_noscores", None)
    if nos is not None and sim._scores_inert:
        pair_nos = jax.jit(lambda s, c: nos(s, c, sim.pair_params))
        out["pair_fast_noscores_ns_atom"] = round(
            timeit(pair_nos, state, nbr) / n * 1e9, 2)
    if getattr(sim, "_slot_ok", False):
        # slot-resident interior pair (the production interior path: no
        # atom->slot pack gather, no out-take)
        ss, _sf = jax.jit(sim._to_slots)(state, sim._fcarry, nbr)
        jax.block_until_ready(ss.x)
        sfn = (sim.pair_compute.slot_fast_noscores if sim._scores_inert
               else sim.pair_compute.slot_fast)
        pair_slot = jax.jit(lambda s, c: sfn(s, c, sim.pair_params))
        out["pair_slot_ns_atom"] = round(
            timeit(pair_slot, ss, nbr) / n * 1e9, 2)
    build = jax.jit(sim._nbr_build)
    out["nbr_build_ns_atom"] = round(timeit(build, state) / n * 1e9, 2)
    if isinstance(sim.nbr_spec, colpack.ColumnSpec):
        packf = jax.jit(lambda s, c: colpack.pack(
            c, s.box, s.x, s.ucgl, s.ucgstate))
        out["pack_ns_atom"] = round(timeit(packf, state, nbr) / n * 1e9, 2)
        out["bound_analysis"] = _bound_analysis(sim, state, nbr, n)
    nre = sim.cfg.reneigh_every
    step1 = jax.jit(lambda s, f: sim._block_impl(s, f, jnp.asarray((0, 1000)),
                                                 nre))
    fc = sim._fcarry
    t = timeit(lambda: step1(state, fc))
    out["md_step_ns_atom"] = round(t / nre / n * 1e9, 2)
    out["reneigh_every"] = nre
    return out


def run_drift(n: int) -> dict:
    """NVE energy-drift acceptance check (BASELINE: < 1e-4 relative):
    thermostat off, dt = 0.002; conserved H = KE + KE_lam + PE(+bias) +
    sum(lam*dmu).  Integrator/precision quality is size-independent; capped
    at 32k."""
    import dataclasses

    import jax.numpy as jnp

    from __graft_entry__ import _build_sim

    _enable_cache()
    sim = _build_sim(n=min(n, 32768), reneigh_every=10)
    sim.cfg = dataclasses.replace(sim.cfg, langevin=None, dt=0.002)

    def hamiltonian(s):
        rw = s.thermo()
        tpp = s.pair_params.tp
        mu_term = float(jnp.sum(jnp.where(
            tpp.n_states[s.state.typ] > 1,
            s.state.ucgl * tpp.mu_diff[s.state.typ], 0.0)))
        return rw["etotal"] + mu_term

    sim.setup((0, 200))
    sim.run_fused(1, run_window=(0, 200))
    e0 = hamiltonian(sim)
    sim.run_fused(19, run_window=(0, 200))   # 190 more NVE steps
    e1 = hamiltonian(sim)
    return {"drift": abs(e1 - e0) / max(abs(e0), 1e-12)}


def _wait_backend(max_wait_s: int = 1800) -> bool:
    """Block until the accelerator backend initializes (the axon TPU worker
    recovers from crashes on a timescale of minutes; a dead backend poisons
    any process that touched it, so probe in subprocesses)."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                capture_output=True, text=True, timeout=240)
            if "ok" in r.stdout:
                return True
        except Exception:
            pass
        time.sleep(90)
    return False


def _sub(cmd_args: list, timeout: int, env: "dict | None" = None):
    try:
        out = subprocess.run([sys.executable, __file__] + cmd_args,
                             capture_output=True, text=True, timeout=timeout,
                             env=env)
        for line in out.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def _cpu_fallback(steps: int, chunk: int):
    """Last-resort leg when the axon TPU worker is down for the whole bench
    window (multi-hour outages observed): run the XLA path on the CPU
    backend at a reduced size so the JSON line carries a real measurement
    with honest metadata instead of value 0."""
    import os

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""         # don't claim the (dead) chip
    env["JAX_PLATFORMS"] = "cpu"
    r = _sub(["--main-only", "--n", "16384", "--steps", str(steps),
              "--chunk", str(chunk)], timeout=3600, env=env)
    if r is not None:
        r["fallback_note"] = (
            "axon TPU worker unavailable for the entire bench window; this "
            "row is the XLA path on the CPU BACKEND at 16k (not a TPU "
            "number) — see BENCH history for real-chip runs")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2**20,
                    help="bead count (default 2^20 ~ 1M)")
    ap.add_argument("--quick", action="store_true",
                    help="small size for smoke runs")
    ap.add_argument("--steps", type=int, default=100,
                    help="timed steps (after warmup)")
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--main-only", action="store_true")
    ap.add_argument("--drift-only", action="store_true")
    ap.add_argument("--phases", action="store_true",
                    help="per-phase timing breakdown + VPU bound analysis")
    ap.add_argument("--roofline-only", action="store_true",
                    help="roofline accounting alone (orchestrator leg)")
    ap.add_argument("--skin", type=float, default=0.4,
                    help="Verlet skin (phases mode only)")
    ap.add_argument("--reneigh", type=int, default=20,
                    help="reneighbor cadence (phases mode only)")
    args = ap.parse_args()

    n = 4096 if args.quick else args.n

    if args.main_only:
        print(json.dumps(run_main(n, args.steps, args.chunk)))
        return
    if args.drift_only:
        print(json.dumps(run_drift(n)))
        return
    if args.phases:
        print(json.dumps(run_phases(n, skin=args.skin, reneigh=args.reneigh)))
        return
    if args.roofline_only:
        print(json.dumps(run_roofline(n)))
        return

    if args.quick:
        result = run_main(n, args.steps, args.chunk)
        drift = run_drift(n)["drift"]
        rl = run_roofline(n)
        if rl["bound_analysis"] is not None:
            result["bound_analysis"] = rl["bound_analysis"]
            result["roofline_n_atoms"] = rl["roofline_n_atoms"]
    else:
        _wait_backend()
        result = None
        size = n
        attempted = []
        while result is None and size >= 4096:
            attempted.append(size)
            result = _sub(["--main-only", "--n", str(size),
                           "--steps", str(args.steps),
                           "--chunk", str(args.chunk)], timeout=4800)
            if result is None:
                time.sleep(60)      # let the TPU worker recover
                size //= 2
        if result is None:
            result = _cpu_fallback(args.steps, args.chunk)
        if result is None:
            print(json.dumps({"metric": "bench failed at all sizes",
                              "value": 0.0, "unit": "steps/s",
                              "vs_baseline": 0.0, "attempted": attempted}))
            return
        if len(attempted) > 1:
            result["fallback_note"] = (
                f"sizes {attempted[:-1]} crashed the axon TPU worker "
                "(intermittent on 1M-shape programs; a full 1M run has "
                "completed on this chip — see BENCH history); reporting the "
                "largest size that completed")
        d = _sub(["--drift-only", "--n", str(n)], timeout=1800)
        drift = d["drift"] if d else None
        # roofline leg (VERDICT r2 weak #1: the accounting must live in the
        # headline BENCH artifact, not only in --phases)
        rl = _sub(["--roofline-only", "--n", str(size)], timeout=1800)
        if rl is not None and rl.get("bound_analysis") is not None:
            result["bound_analysis"] = rl["bound_analysis"]
            result["roofline_n_atoms"] = rl["roofline_n_atoms"]

    result["nve_energy_drift_rel_190steps_dt0.002"] = (
        float(f"{drift:.3e}") if drift is not None else None)
    result["baseline_note"] = (
        "vs MEASURED 64-core CPU LAMMPS baseline 4.8e7 atom-steps/s "
        "(tools/cpu_baseline.cpp: 7.5e5/core measured on this host x64, "
        "perfect scaling assumed; methodology + caveats in BASELINE.md)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
