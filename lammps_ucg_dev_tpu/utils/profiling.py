"""Tracing & profiling utilities (SURVEY.md §5: the reference relies on stock
LAMMPS thermo/Timer; the TPU equivalents are jax.profiler traces + named
scopes + throughput counters).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope   # annotate step phases inside jitted code


class Throughput:
    """steps/s and atom-steps/s counter with wall-clock timing around
    device-synchronized sections."""

    def __init__(self, n_atoms: int):
        self.n_atoms = n_atoms
        self.steps = 0
        self.elapsed = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0

    def add_steps(self, n: int):
        self.steps += n

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def atom_steps_per_sec(self) -> float:
        return self.steps_per_sec * self.n_atoms

    def row(self) -> dict:
        return {
            "steps": self.steps,
            "wall_s": round(self.elapsed, 3),
            "steps_per_sec": round(self.steps_per_sec, 3),
            "atom_steps_per_sec": round(self.atom_steps_per_sec, 1),
        }
