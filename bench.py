"""Benchmark driver: steps/sec on the reference's breaking-dam scenes.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol (BASELINE.md): the reference publishes no numbers, so the metric is
our own steps/sec on the reference's scene definitions — here DFSPH (the
flagship, BASELINE.json north star) on breaking_dam_30k (~29.1k fluid
particles, config/breaking_dam_30k.json). `vs_baseline` is the ratio against
the recorded previous-round value in BENCH_BASELINE.json when present.
"""

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

N_WARMUP = 3
N_STEPS = 30


def main():
    cfg = read_config(os.path.join("/root/reference/config/breaking_dam_30k.json"))
    # Flagship benchmark solver: DFSPH (BASELINE.json north star).
    import dataclasses

    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name="dfsph"))

    sim = Simulation(cfg)
    n = sim.scene.static.n_fluid

    for _ in range(N_WARMUP):
        sim.step()
    jax.block_until_ready(sim.state.fluid.pos)

    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        sim.step()
    jax.block_until_ready(sim.state.fluid.pos)
    wall = time.perf_counter() - t0
    steps_per_sec = N_STEPS / wall

    vs = None
    baseline_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                prev = json.load(f)
            if prev.get("value"):
                vs = steps_per_sec / float(prev["value"])
        except Exception:
            vs = None

    print(json.dumps({
        "metric": f"dfsph_breaking_dam_30k_steps_per_sec(n={n})",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
