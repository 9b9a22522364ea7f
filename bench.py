"""Headline benchmark: MD steps/sec for the 1M-bead two-state UCG-LD fluid
(BASELINE.json north star) on the available accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}

Baseline note: the reference publishes no numbers (BASELINE.md); the
``vs_baseline`` ratio is computed against an ESTIMATED 64-core CPU LAMMPS
throughput for this workload (tabulated 4-table UCG pair style, ~90
neighbors/atom): ~1.5e6 atom-steps/s/core x 64 cores ~= 1e8 atom-steps/s.
This stands in until a measured CPU LAMMPS baseline exists (no LAMMPS build
is available in this environment); the assumption is recorded in the output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

BASELINE_ATOM_STEPS_PER_SEC = 1.0e8   # estimated 64-core LAMMPS CPU (see above)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2**20,
                    help="bead count (default 2^20 ~ 1M)")
    ap.add_argument("--quick", action="store_true",
                    help="small size for smoke runs")
    ap.add_argument("--steps", type=int, default=100,
                    help="timed steps (after warmup)")
    ap.add_argument("--chunk", type=int, default=16384)
    args = ap.parse_args()

    n = 4096 if args.quick else args.n

    import dataclasses

    import jax

    from __graft_entry__ import _build_sim

    sim = _build_sim(n=n, reneigh_every=10)
    if args.chunk and n % args.chunk == 0:
        sim.pair_params = dataclasses.replace(sim.pair_params,
                                              chunk=args.chunk)
    cfg = sim.cfg
    nblocks = max(args.steps // cfg.reneigh_every, 1)
    total_steps = nblocks * cfg.reneigh_every
    window = (0, total_steps * 2)

    # compile + warmup (one fused block)
    t0 = time.time()
    sim.setup(window)
    sim.run_fused(1, run_window=window)
    jax.block_until_ready(sim.state.x)
    compile_s = time.time() - t0

    t0 = time.time()
    sim.run_fused(nblocks, run_window=window)
    jax.block_until_ready(sim.state.x)
    wall = time.time() - t0

    steps_per_sec = total_steps / wall
    atom_steps = steps_per_sec * n
    # LJ-units "ns/day" analogue: tau/day (dt = 0.004 tau)
    tau_per_day = steps_per_sec * cfg.dt * 86400.0

    row = sim.thermo()
    result = {
        "metric": f"MD steps/sec, {n}-bead 2-state UCG-LD fluid "
                  f"(wall/hard+bias, lambda-Langevin, ucgstate), single chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(atom_steps / BASELINE_ATOM_STEPS_PER_SEC, 3),
        "atom_steps_per_sec": round(atom_steps, 1),
        "tau_per_day": round(tau_per_day, 1),
        "n_atoms": n,
        "timed_steps": total_steps,
        "compile_s": round(compile_s, 1),
        "etotal": round(row["etotal"], 3),
        "temp": round(row["temp"], 4),
        "baseline_note": "vs est. 64-core CPU LAMMPS 1e8 atom-steps/s "
                         "(no published reference numbers; BASELINE.md)",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
