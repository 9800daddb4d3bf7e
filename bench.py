"""Benchmark driver: steps/sec on the reference's breaking-dam scenes.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol (BASELINE.md): the reference publishes no numbers, so the metric is
our own steps/sec on the reference's scene definitions — the headline is
DFSPH (the flagship, BASELINE.json north star) on breaking_dam_30k (~29.1k
fluid particles, same physics as /root/reference/config/breaking_dam_30k.json,
bundled as configs/breaking_dam_30k.json). `vs_baseline` is the ratio against
the round-1 value recorded in BENCH_BASELINE.json.

Breadth rows ride in the same JSON line (VERDICT r02 asked for machine-
captured numbers at every scale, not prose): the other four solvers at 30k,
DFSPH at 157k (the reference's demo geometry), two-way coupling at 55k, and
WCSPH/DFSPH at 1M (the north-star scale). Each row reports steps/s measured
from rest plus its end-of-window density parity and overflow. A global
deadline guards the run; rows skipped for time emit null. r02 values for the
breadth rows (then prose-only, from docs/ARCHITECTURE.md) are recorded under
"r02_baselines" for cross-round continuity.

DFSPH uses an adaptive CFL dt, so a fixed step count would alias step-mix
drift across rounds; the headline solvers are timed for at least MIN_STEPS
steps AND MIN_WALL_S of wall time (whichever needs more steps).
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Persistent compilation cache (host-fingerprinted) is configured by the
# package import below; repeat bench runs become near-instant to start.
from cfd_taichi_tpu.config import read_config  # noqa: E402
from cfd_taichi_tpu.runner import Simulation  # noqa: E402

N_WARMUP = 5
MIN_STEPS = 100
MIN_WALL_S = 10.0
BATCH = 20
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "2600"))
T0 = time.perf_counter()

# Round-2 breadth measurements (single chip, prose in docs/ARCHITECTURE.md
# r02; the 30k/157k/coupling rows were measured, the 1M rows are the first
# recorded runs) — kept for cross-round continuity of every row.
R02_BASELINES = {
    "dfsph_steps_per_sec": 3.606,
    "wcsph_steps_per_sec": 10.803,
    "pcisph_steps_per_sec": 10.7,
    "iisph_steps_per_sec": 10.2,
    "pbf_steps_per_sec": 10.4,
    "dfsph_157k_steps_per_sec": 0.89,
    "coupling_pcisph_55k_steps_per_sec": 2.77,
    "wcsph_1m_steps_per_sec": 0.07,
    "dfsph_1m_steps_per_sec": 0.04,
}


def left() -> float:
    return DEADLINE_S - (time.perf_counter() - T0)


def time_solver(cfg_name: str, solver_name: str, min_steps=MIN_STEPS,
                min_wall=MIN_WALL_S, warmup=N_WARMUP, batch=BATCH):
    """steps/sec for one solver on a bundled config (from rest), plus
    end-of-window telemetry (density-error parity, overflow)."""
    cfg = read_config(os.path.join(REPO, "configs", cfg_name))
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name=solver_name))
    sim = Simulation(cfg)

    import jax.numpy as jnp

    def sync():
        # Data-dependent scalar fetch per batch: block_until_ready through
        # the tunnel relay under-reports whenever the enqueued work fits
        # its pipeline (measured: a 4-step 1M run "took" 0.8 ms). The
        # ~30 ms dispatch+fetch floor amortizes over the batch.
        return float(jnp.sum(sim.state.fluid.pos.x))

    for _ in range(warmup):
        sim.step()
    sync()

    steps = 0
    t0 = time.perf_counter()
    while True:
        for _ in range(batch):
            sim.step()
        sync()
        steps += batch
        wall = time.perf_counter() - t0
        if steps >= min_steps and wall >= min_wall:
            stats = sim.telemetry()
            return steps / wall, sim.scene.static.n_fluid, stats


def row(out: dict, key: str, cfg_name: str, solver: str, *, min_steps,
        min_wall, batch, reserve: float):
    """Measure one breadth row unless the deadline would be blown
    (`reserve` = rough compile+run budget the row needs)."""
    if left() < reserve:
        out[key] = None
        out[key.replace("_steps_per_sec", "_skipped")] = "deadline"
        return
    try:
        sps, n, stats = time_solver(cfg_name, solver, min_steps=min_steps,
                                    min_wall=min_wall, warmup=3, batch=batch)
        out[key] = round(sps, 4)
        out[key.replace("_steps_per_sec", "_density_err_pct")] = round(
            float(stats["avg_pos_err"]) / 1000.0 * 100.0, 4)
        out[key.replace("_steps_per_sec", "_overflow")] = int(
            stats["window_overflow"])
    except Exception as e:  # a failed row must not kill the whole bench
        out[key] = None
        out[key.replace("_steps_per_sec", "_error")] = type(e).__name__


def main():
    dfsph_sps, n, dstats = time_solver("breaking_dam_30k.json", "dfsph")
    wcsph_sps, _, _ = time_solver("breaking_dam_30k.json", "wcsph")

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

    out = {
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
    }

    # --- breadth rows (time-budgeted; VERDICT r02 item 2) -------------------
    # The 1M rows are the north-star scale (BASELINE.md): they run FIRST
    # so a cold-compile-heavy run can never deadline them away.
    row(out, "dfsph_1m_steps_per_sec", "breaking_dam_1m.json", "dfsph",
        min_steps=4, min_wall=10, batch=2, reserve=500)
    row(out, "wcsph_1m_steps_per_sec", "breaking_dam_1m.json", "wcsph",
        min_steps=4, min_wall=10, batch=2, reserve=300)
    for solver in ("pcisph", "iisph", "pbf"):
        row(out, f"{solver}_steps_per_sec", "breaking_dam_30k.json", solver,
            min_steps=60, min_wall=6, batch=20, reserve=150)
    row(out, "dfsph_157k_steps_per_sec", "breaking_dam_157k.json", "dfsph",
        min_steps=10, min_wall=10, batch=5, reserve=240)
    row(out, "coupling_pcisph_55k_steps_per_sec", "coupling_demo.json",
        "pcisph", min_steps=10, min_wall=10, batch=5, reserve=200)
    out["r02_baselines"] = R02_BASELINES
    out["bench_wall_s"] = round(time.perf_counter() - T0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
