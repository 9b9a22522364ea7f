"""Generate complete reference-style UCG input decks (data file, table files,
state-settings, rates/contacts files, input script) for examples, tests, and
benchmarks.  The deck grammar matches the reference package's user surface
(SURVEY.md §5): a user of the reference can point this engine at these decks
— or point reference LAMMPS at them — unchanged.
"""

from __future__ import annotations

import os

import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lammps_ucg_dev_tpu.io.table_io import RLINEAR, RawTable, write_table_file


def soft_table(eps: float, rc: float, n: int = 2000, rlo: float = 1e-3):
    r = np.linspace(rlo, rc, n)
    e = eps * (1.0 + np.cos(np.pi * r / rc))
    f = eps * np.pi / rc * np.sin(np.pi * r / rc)
    return RawTable(r=r, e=e, f=f, rflag=RLINEAR, rlo=rlo, rhi=rc)


def lattice_positions(n: int, L: float, jitter: float = 0.05, seed: int = 1):
    rng = np.random.default_rng(seed)
    m = int(np.ceil(n ** (1 / 3)))
    a = L / m
    grid = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)[:n]
    return (grid + 0.5) * a + rng.normal(0, jitter, (n, 3))


def write_ucgld_deck(outdir: str, n: int = 4096, rho: float = 0.6,
                     rc: float = 2.5, eps=(1.0, 0.6, 0.6, 0.25),
                     mu=(0.0, 0.3), lam_mass: float = 5.0,
                     thermostat: bool = True, wall: bool = True,
                     T: float = 0.8, nsteps: int = 1000, dt: float = 0.004,
                     thermo_every: int = 100,
                     seed: int = 7, mol_per: int = 1,
                     tablength: int = 2000) -> str:
    """Config-1/2 style deck: 2-state UCG-LD fluid (one actual type, formal
    types 1/2). Returns the input-script path."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    L = (n / rho) ** (1 / 3)
    x = lattice_positions(n, L, seed=seed)

    # tables: formal pairs (1,1) (1,2) (2,2) -> combos 00, 01=10, 11
    write_table_file(os.path.join(outdir, "ucg.table"), {
        "UCG_00": soft_table(eps[0], rc),
        "UCG_01": soft_table(eps[1], rc),
        "UCG_10": soft_table(eps[2], rc),
        "UCG_11": soft_table(eps[3], rc),
    })

    with open(os.path.join(outdir, "ucg.settings"), "w") as fh:
        fh.write("1 2 2\n1 2\n1 2\n%g %g\n" % mu)

    # data file
    with open(os.path.join(outdir, "system.data"), "w") as fh:
        fh.write("2-state UCG-LD fluid\n\n")
        fh.write(f"{n} atoms\n1 atom types\n\n")
        fh.write(f"0 {L:.10g} xlo xhi\n0 {L:.10g} ylo yhi\n0 {L:.10g} zlo zhi\n\n")
        fh.write("Masses\n\n1 1.0\n\n")
        fh.write("Atoms # ucg\n\n")
        lam0 = rng.uniform(0.2, 0.8, n)
        st0 = (lam0 > 0.5).astype(int)
        for k in range(n):
            mol = k // mol_per + 1
            fh.write(f"{k + 1} {mol} 1 0.0 {x[k, 0]:.10g} {x[k, 1]:.10g} "
                     f"{x[k, 2]:.10g} {st0[k]} {lam0[k]:.6f} {lam_mass}\n")

    lines = [
        "# 2-state UCG-LD fluid (reference configs 1-2)",
        "units lj",
        "dimension 3",
        "boundary p p p",
        "atom_style ucg",
        "read_data system.data",
        f"pair_style table_ucgld linear {tablength} ucg.settings",
        "pair_coeff 1 1 2 2 "
        f"ucg.table UCG_00 {rc} ucg.table UCG_01 {rc} "
        f"ucg.table UCG_10 {rc} ucg.table UCG_11 {rc}",
        "neighbor 0.4 bin",
        "neigh_modify every 10",
        f"timestep {dt}",
        f"velocity all create {T} {seed + 1}",
    ]
    if wall:
        lines.append("fix 1 all nve/ucgld/wall/hard bias_potential 0.1")
    else:
        lines.append("fix 1 all nve/ucgld")
    if thermostat:
        lines.append(f"fix 2 all ucgld/langevin {T} {T} 0.5 {seed + 2}")
    lines += [
        "fix 3 all ucgstate ld",
        f"thermo {thermo_every}",
        f"run {nsteps}",
    ]
    path = os.path.join(outdir, "in.ucgld")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=1000)
    args = ap.parse_args()
    print(write_ucgld_deck(args.outdir, n=args.n, nsteps=args.steps))
