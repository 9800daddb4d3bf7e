"""Observability: steps/sec counters, residual telemetry, NaN/Inf validation,
and jax.profiler hooks.

Counterpart of the reference's ad-hoc prints and GUI counters
(SURVEY.md §5: Taichi kernel_profiler at main.py:22, wall-clock bookkeeping
at main.py:89-124, per-step residual prints in every iterative solver, the
NaN/Inf sanitizer solver_base.py:145-164).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


class StepTimer:
    """Wall-clock steps/sec with pause accounting (main.py:89-124 analogue)."""

    def __init__(self):
        self.start = time.perf_counter()
        self.steps = 0
        self.sim_time = 0.0
        self._paused_total = 0.0
        self._pause_start = None

    def pause(self):
        if self._pause_start is None:
            self._pause_start = time.perf_counter()

    def resume(self):
        if self._pause_start is not None:
            self._paused_total += time.perf_counter() - self._pause_start
            self._pause_start = None

    def tick(self, n_steps: int = 1, sim_dt: float = 0.0):
        self.steps += n_steps
        self.sim_time += sim_dt

    @property
    def wall(self) -> float:
        end = self._pause_start or time.perf_counter()
        return end - self.start - self._paused_total

    @property
    def steps_per_sec(self) -> float:
        w = self.wall
        return self.steps / w if w > 0 else 0.0

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "wall_s": round(self.wall, 3),
            "steps_per_sec": round(self.steps_per_sec, 3),
            "sim_time_s": round(self.sim_time, 5),
        }


def check_valid(pos, vel, acc) -> jnp.ndarray:
    """Count of particles with NaN/Inf in pos/vel/acc (reference check_valid,
    solver_base.py:145-164 — returns a count instead of printing per-particle).
    Accepts V3s (component triples) or (N, 3) arrays."""
    comps = []
    for arr in (pos, vel, acc):
        if hasattr(arr, "astuple"):
            comps.extend(arr.astuple())
        else:
            comps.append(jnp.asarray(arr).reshape(arr.shape[0], -1))
    bad = None
    for c in comps:
        b = ~jnp.isfinite(c)
        if b.ndim > 1:
            b = jnp.any(b, axis=-1)
        bad = b if bad is None else (bad | b)
    return jnp.sum(bad)


def density_stats(rho, rho_0: float = 1000.0) -> dict:
    """Residual telemetry matching the reference's per-step prints
    (pcisph_solver.py:70, iisph_solver.py:96, dfsph_solver.py:233,416)."""
    rho = np.asarray(rho)
    err = np.maximum(rho - rho_0, 0.0)
    pos_cnt = int((err > 0).sum())
    return {
        "rho_min": float(rho.min()),
        "rho_max": float(rho.max()),
        "rho_avg": float(rho.mean()),
        "avg_pos_err": float(err.sum() / pos_cnt) if pos_cnt else 0.0,
        "avg_err_pct": float(np.abs(rho - rho_0).mean() / rho_0 * 100.0),
    }


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope (TPU equivalent of Taichi's kernel profiler,
    main.py:22,174-176). No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def rgb_by_scalar(value: np.ndarray) -> np.ndarray:
    """False-color particles by a normalized scalar (density / neighbor
    count), matching visualize_rho/visualize_neighbour
    (solver_base.py:219-245): rgb = (0, 0.28, normalized)."""
    value = np.asarray(value, np.float32)
    vmin, vmax = value.min(), value.max()
    b = (value - vmin) / (vmax - vmin) if vmax > vmin else np.ones_like(value)
    rgb = np.zeros((value.shape[0], 3), np.float32)
    rgb[:, 1] = 0.28
    rgb[:, 2] = b
    return rgb
