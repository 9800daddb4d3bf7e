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
                min_wall=MIN_WALL_S, warmup=N_WARMUP, batch=BATCH,
                impact=0.0, resume_steps=0, use_frame=False):
    """steps/sec for one solver on a bundled config, plus end-of-window
    telemetry (density-error parity, overflow) and the timed scene's
    static (feeds the roofline byte model).

    `impact` > 0 seeds a uniform downward initial velocity (m/s) so the
    column is violent within a few steps (VERDICT r03 item 2).

    `resume_steps` > 0 runs the HOT-RESUME protocol (VERDICT r04 items
    1+2): a donor run evolves `resume_steps` steps into its violent
    phase, its state is dumped with the real checkpoint machinery
    (utils.io.save_checkpoint), and the timed simulation is rebuilt with
    capacities RE-PLANNED from the checkpointed distribution
    (Simulation plan_pos; scene.build_scene docstring) before resuming
    from the checkpoint. The timed window then measures genuinely hot
    physics on honestly-sized plans; overflow counters still guard.

    `use_frame`: time whole frames (iter_cnt fluid steps + rigid steps,
    the reference's main.py:165-173 frame structure) — used by the
    coupled row so the body actually reacts during the window."""
    cfg = read_config(os.path.join(REPO, "configs", cfg_name))
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name=solver_name))
    if impact:
        cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
            cfg.fluid, initial_velocity=(0.0, -float(impact), 0.0)))

    if resume_steps:
        import numpy as np

        from cfd_taichi_tpu.utils import io as io_utils

        donor = Simulation(cfg)
        for _ in range(resume_steps):
            if use_frame:
                donor.frame()
            else:
                donor.step()
        tag = f"{os.path.splitext(cfg_name)[0]}_{solver_name}"
        ck = f"/tmp/bench_hot_{tag}.npz"
        io_utils.save_checkpoint(ck, donor.state)
        plan_pos = donor.state.fluid.pos.to_numpy()
        # Stable sidecar for the phase-attribution subprocess.
        np.save(f"/tmp/bench_hot_{tag}_pos.npy", plan_pos)
        del donor
        sim = Simulation(cfg, plan_pos=plan_pos)
        sim.state = io_utils.load_checkpoint(ck, sim.state)
    else:
        sim = Simulation(cfg)

    import jax.numpy as jnp

    def sync():
        # Data-dependent scalar fetch per batch: block_until_ready through
        # the tunnel relay under-reports whenever the enqueued work fits
        # its pipeline (measured: a 4-step 1M run "took" 0.8 ms). The
        # ~30 ms dispatch+fetch floor amortizes over the batch.
        return float(jnp.sum(sim.state.fluid.pos.x))

    tick = sim.frame if use_frame else sim.step
    for _ in range(warmup):
        tick()
    sync()

    steps = 0
    t0 = time.perf_counter()
    while True:
        for _ in range(batch):
            tick()
        sync()
        steps += batch
        wall = time.perf_counter() - t0
        if steps >= min_steps and wall >= min_wall:
            stats = sim.telemetry()
            if sim.rigid_enabled:
                # Fluid->rigid reaction magnitude, read right after one
                # more fluid step (the rigid step consumes and zeroes
                # it): nonzero proves the coupling is actually hot.
                sim.step()
                f = sim.state.rigid.force
                stats["rigid_force_norm"] = float(jnp.sqrt(jnp.sum(
                    f.x ** 2 + f.y ** 2 + f.z ** 2)))
            return steps / wall, sim.scene.static.n_fluid, stats, \
                sim.scene.static


def row(out: dict, key: str, cfg_name: str, solver: str, *, min_steps,
        min_wall, batch, reserve: float, impact=0.0, warmup=3,
        resume_steps=0, use_frame=False):
    """Measure one breadth row unless the deadline would be blown
    (`reserve` = rough compile+run budget the row needs). Returns the
    timed scene's static (None on skip/error) and stamps the row's
    measurement protocol into out["protocols"]."""
    proto = []
    if impact:
        proto.append(f"impact-seeded -{impact:g} m/s")
    else:
        proto.append("from rest")
    if resume_steps:
        proto.append(f"checkpoint-resumed after {resume_steps} "
                     f"{'frames' if use_frame else 'steps'} with "
                     "capacities re-planned from the hot state")
    if use_frame:
        proto.append("timed per frame (fluid+rigid, main.py:165-173)")
    out.setdefault("protocols", {})[key] = "; ".join(proto)
    if left() < reserve:
        out[key] = None
        out[key.replace("_steps_per_sec", "_skipped")] = "deadline"
        return None
    try:
        sps, n, stats, static = time_solver(
            cfg_name, solver, min_steps=min_steps, min_wall=min_wall,
            warmup=warmup, batch=batch, impact=impact,
            resume_steps=resume_steps, use_frame=use_frame)
        out[key] = round(sps, 4)
        out[key.replace("_steps_per_sec", "_density_err_pct")] = round(
            float(stats["avg_pos_err"]) / 1000.0 * 100.0, 6)
        out[key.replace("_steps_per_sec", "_overflow")] = int(
            stats["window_overflow"])
        out[key.replace("_steps_per_sec", "_iters")] = stats["solver_iters"]
        if "rigid_force_norm" in stats:
            out[key.replace("_steps_per_sec", "_rigid_force_norm")] = round(
                stats["rigid_force_norm"], 4)
        return static
    except Exception as e:  # a failed row must not kill the whole bench
        out[key] = None
        out[key.replace("_steps_per_sec", "_error")] = type(e).__name__
        return None


def hbm_copy_gbps() -> float:
    """Measured streaming HBM rate (read+write of a 1 GiB f32 buffer) —
    the denominator of the roofline fraction."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones(((1 << 30) // 4,), jnp.float32)
    f = jax.jit(lambda a: a * 1.000001)
    y = f(x)
    float(y[0])  # block_until_ready under-reports through the tunnel
    #              relay (measured); a scalar fetch is a true sync.
    # Measure the fetch RTT itself and subtract it: at 16 chained reps a
    # ~25-40 ms tunnel round trip otherwise inflates each rep by rtt/16
    # — the r4 bench skipped this and under-reported the chip's copy
    # rate ~4x (236 GB/s reported vs ~900 measured once corrected),
    # flattering roofline_frac by the same factor.
    t0 = time.perf_counter()
    float(y[0])
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 16
    for _ in range(reps):
        y = f(y)
    float(y[0])
    dt_s = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
    return 2.0 * x.nbytes / dt_s / 1e9


def dfsph_1m_roofline(out: dict, sps: float, st=None):
    """Model the 1M DFSPH hot step's streamed bytes from the scene's
    engine capacities + the measured iteration counts, and report the
    fraction of the measured HBM copy rate the step achieves
    (VERDICT r03 item 1: make the gap to hardware a number).

    Traffic model (docs/ARCHITECTURE.md §7): per solver iteration the
    split-coef matvec pair streams the stored bf16 w — (QB, B, W), i.e.
    2 x B bytes per GROUP plan slot (the r4 model forgot the x B and
    undercounted the dominant term ~16x) — plus the materialized
    (4, QB, W) BF16 plane rhs (8 B written + 8 B read per group slot;
    the round-5 bf16-at-the-table schedule, coef_matvec_ops docstring)
    and the (4, nblocks, 128) bf16 product table build (read+write).
    EVERY capacity-priced pass (matvec, dense_rho_count, coef build,
    viscosity) runs the split-bucket decomposition at large N — bulk
    at the p97 nbA width plus a capB-group remainder at the leftover
    width. The one-shot passes re-gather 3/3/7 f32 position or
    velocity row lanes per slot. Sorts, scatters and (N,)-sized field
    ops are ~40 x 4 MB and ride in the 'fields' term."""
    if st is None:
        cfg = read_config(os.path.join(REPO, "configs",
                                       "breaking_dam_1m.json"))
        from cfd_taichi_tpu import build_scene
        st = build_scene(cfg).static
    from cfd_taichi_tpu.ops import bandmat
    B, BLOCK = st.band_B, bandmat.BLOCK
    Bl = st.loop_B or B                  # split-width loop engine groups
    QBq = -(-st.n_fluid // B)            # one-shot (wide) groups
    QBl = -(-st.n_fluid // Bl)           # loop-engine groups
    nblocks = -(-st.n_fluid // BLOCK)
    iters = out.get("dfsph_1m_iters") or [15.0, 2.0]
    n_it = float(iters[0]) + float(iters[1]) + 2.0  # + warm-start/init pair

    def split_slots(QBx, cap_total):
        # W-slots of a capacity-priced pass under the split-bucket
        # decomposition (bulk nbA everywhere + remainder width for capB
        # tail groups); full width when the split is off.
        if st.coef_nbA and st.coef_nbA < cap_total:
            return (QBx * st.coef_nbA
                    + st.coef_capB * (cap_total - st.coef_nbA)) * BLOCK
        return QBx * cap_total * BLOCK

    slots_mv = split_slots(QBl, st.pair_nb)
    per_matvec = (slots_mv * (2 * Bl + 16)      # bf16 w + bf16 plane rhs
                  + 2 * 4 * nblocks * BLOCK * 2)  # bf16 product table r+w
    loop = n_it * 2 * per_matvec
    pq = st.pair_nb_q or st.pair_nb
    oneshot = (split_slots(QBq, st.band_nb_wide) * 12  # dense_rho_count
               + slots_mv * (12 + 2)                   # coef build + w write
               + split_slots(QBq, pq) * 28)            # dense_viscosity
    fields = 40 * st.n_fluid * 4
    total_gb = (loop + oneshot + fields) / 1e9
    achieved = total_gb * sps
    peak = hbm_copy_gbps()
    out["dfsph_1m_bytes_per_step_gb"] = round(total_gb, 2)
    out["hbm_copy_gbps"] = round(peak, 1)
    out["dfsph_1m_roofline_frac"] = round(achieved / peak, 3)


def main():
    dfsph_sps, n, dstats, _ = time_solver("breaking_dam_30k.json", "dfsph")
    wcsph_sps, _, _, _ = time_solver("breaking_dam_30k.json", "wcsph")

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

    out["protocols"] = {
        "dfsph_breaking_dam_30k_steps_per_sec": "from rest (r01-r04 "
        "continuity headline)",
        "wcsph_steps_per_sec": "from rest (r01-r04 continuity)",
    }

    # --- breadth rows (time-budgeted; VERDICT r02 item 2) -------------------
    # The 1M rows are the north-star scale (BASELINE.md): they run FIRST
    # so a cold-compile-heavy run can never deadline them away. Every
    # breadth row is impact-seeded AND checkpoint-resumed at its violent
    # phase with capacities re-planned from the hot state (VERDICT r04
    # items 1+2; see time_solver resume_steps). Each key's exact
    # protocol is stamped in out["protocols"].
    st_1m = row(out, "dfsph_1m_steps_per_sec", "breaking_dam_1m.json",
                "dfsph", min_steps=6, min_wall=10, batch=3, reserve=700,
                impact=3.0, warmup=4, resume_steps=12)
    if out.get("dfsph_1m_steps_per_sec"):
        try:
            dfsph_1m_roofline(out, out["dfsph_1m_steps_per_sec"], st_1m)
        except Exception as e:
            out["dfsph_1m_roofline_error"] = type(e).__name__
        # Measured per-phase breakdown of the hot step (VERDICT r04
        # item 1) — a subprocess so its engine buffers never coexist
        # with this process's compiled step executables.
        if left() > 500:
            import subprocess
            try:
                p = subprocess.run(
                    [sys.executable,
                     os.path.join(REPO, "tools", "phase_attrib_1m.py"),
                     "/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy"],
                    capture_output=True, text=True, timeout=480)
                phases = json.loads(p.stdout.strip().splitlines()[-1])
                it = out.get("dfsph_1m_iters") or [0.0, 0.0]
                n_it = float(it[0]) + float(it[1]) + 2.0
                step_ms = 1e3 / out["dfsph_1m_steps_per_sec"]
                accounted = (phases["prep_ms"] + phases["wide_rho_ms"]
                             + phases["compact_ms"]
                             + phases["coef_build_ms"] + phases["visc_ms"]
                             + n_it * phases["mv_pair_ms"])
                phases["loop_total_ms"] = round(
                    n_it * phases["mv_pair_ms"], 1)
                phases["other_ms"] = round(step_ms - accounted, 1)
                phases["step_ms"] = round(step_ms, 1)
                out["dfsph_1m_phase_ms"] = phases
            except Exception as e:
                out["dfsph_1m_phase_error"] = type(e).__name__
    row(out, "wcsph_1m_steps_per_sec", "breaking_dam_1m.json", "wcsph",
        min_steps=6, min_wall=10, batch=3, reserve=400, impact=3.0,
        warmup=4, resume_steps=12)
    # Hot-phase twin of the from-rest headline (VERDICT r04 item 7).
    row(out, "dfsph_30k_hot_steps_per_sec", "breaking_dam_30k.json",
        "dfsph", min_steps=60, min_wall=6, batch=20, reserve=220,
        impact=3.0, resume_steps=30)
    for solver in ("pcisph", "iisph", "pbf"):
        row(out, f"{solver}_steps_per_sec", "breaking_dam_30k.json", solver,
            min_steps=60, min_wall=6, batch=20, reserve=170, impact=3.0,
            resume_steps=30)
    row(out, "dfsph_157k_steps_per_sec", "breaking_dam_157k.json", "dfsph",
        min_steps=10, min_wall=10, batch=5, reserve=300, impact=3.0,
        resume_steps=14)
    row(out, "coupling_pcisph_55k_steps_per_sec", "coupling_demo.json",
        "pcisph", min_steps=10, min_wall=10, batch=5, reserve=260,
        impact=3.0, resume_steps=10, use_frame=True)
    out["iisph_parity_note"] = (
        "IISPH may report >0.1% on hot windows: the reference's own "
        "divergence-trend break (iisph_solver.py:91-93) exits the Jacobi "
        "loop on ANY residual increase, above tolerance; pinned by "
        "tests/test_solvers.py::test_iisph_trend_break_matches_reference")
    out["r02_baselines"] = R02_BASELINES
    out["r02_baselines_note"] = (
        "r02 values were measured from rest on seed-sized plans; "
        "hot-resumed rows are a stricter protocol (see protocols)")
    out["bench_wall_s"] = round(time.perf_counter() - T0, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
