"""Benchmark driver: steps/sec on the reference's breaking-dam scenes.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol (BASELINE.md): the reference publishes no numbers, so the metric is
our own steps/sec on the reference's scene definitions — the headline is
DFSPH (the flagship, BASELINE.json north star) on breaking_dam_30k (~29.1k
fluid particles, same physics as /root/reference/config/breaking_dam_30k.json,
bundled as configs/breaking_dam_30k.json). A WCSPH number on the same scene
rides along in the same JSON line as `wcsph_steps_per_sec`. `vs_baseline` is
the ratio against the recorded previous-round DFSPH value in
BENCH_BASELINE.json.

DFSPH uses an adaptive CFL dt, so a fixed step count would alias step-mix
drift across rounds; each solver is instead timed for at least MIN_STEPS
steps AND MIN_WALL_S of wall time (whichever needs more steps).
"""

import dataclasses
import json
import os
import sys
import time

import jax

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Persistent compilation cache: solver while-loops are expensive to compile;
# repeat bench runs become near-instant to start.
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cfd_taichi_tpu.config import read_config  # noqa: E402
from cfd_taichi_tpu.runner import Simulation  # noqa: E402

N_WARMUP = 5
MIN_STEPS = 100
MIN_WALL_S = 10.0
BATCH = 20


def time_solver(cfg, solver_name: str) -> tuple[float, int, dict]:
    """steps/sec for one solver on `cfg` (>= MIN_STEPS and >= MIN_WALL_S),
    plus end-of-window telemetry (density-error parity, overflow)."""
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name=solver_name))
    sim = Simulation(cfg)
    for _ in range(N_WARMUP):
        sim.step()
    jax.block_until_ready(sim.state.fluid.pos.x)

    steps = 0
    t0 = time.perf_counter()
    while True:
        for _ in range(BATCH):
            sim.step()
        jax.block_until_ready(sim.state.fluid.pos.x)
        steps += BATCH
        wall = time.perf_counter() - t0
        if steps >= MIN_STEPS and wall >= MIN_WALL_S:
            stats = sim.telemetry()
            return steps / wall, sim.scene.static.n_fluid, stats


def main():
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_30k.json"))

    dfsph_sps, n, dstats = time_solver(cfg, "dfsph")
    wcsph_sps, _, _ = time_solver(cfg, "wcsph")

    vs = None
    baseline_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                prev = json.load(f)
            if prev.get("value"):
                vs = dfsph_sps / float(prev["value"])
        except Exception:
            vs = None

    print(json.dumps({
        "metric": f"dfsph_breaking_dam_30k_steps_per_sec(n={n})",
        "value": round(dfsph_sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "wcsph_steps_per_sec": round(wcsph_sps, 3),
        # Parity evidence (north star requires <0.1% avg positive density
        # error — the reference's own tolerance, dfsph_solver.py:21-22):
        # average of max(rho - rho0, 0) over over-dense particles, as % of
        # rho0, at the end of the timed window; plus dropped-pair count
        # (must be 0 for a clean run).
        "dfsph_avg_pos_density_err_pct": round(
            float(dstats["avg_pos_err"]) / 1000.0 * 100.0, 4),
        "dfsph_overflow": int(dstats["window_overflow"]),
        "dfsph_iters": dstats["solver_iters"],
    }))


if __name__ == "__main__":
    main()
