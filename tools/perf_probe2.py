"""Round-3 probe #2: op-level trace of the hot DFSPH step + corrected
(value-dependent) in-loop gather economics.

    nohup python tools/perf_probe2.py > /tmp/perf_probe2.log 2>&1 &
"""

import functools
import glob
import gzip
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph

DISPATCH_FLOOR = 0.0


def sync_time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out) if hasattr(out, "dtype") else out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] - DISPATCH_FLOOR


def measure_floor():
    global DISPATCH_FLOOR
    one = jnp.ones(())
    null = jax.jit(lambda x: x + 1.0)
    DISPATCH_FLOOR = 0.0
    DISPATCH_FLOOR = max(sync_time(null, one, reps=9), 0.0)
    print(f"floor: {DISPATCH_FLOOR*1e3:.1f} ms", flush=True)


def hot_state(sim_steps=120):
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_30k.json"))
    import dataclasses
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name="dfsph"))
    scene = build_scene(cfg)
    step = jax.jit(functools.partial(dfsph.step, scene.static))
    state = dfsph.init_state(scene)
    for _ in range(sim_steps):
        state = step(scene.arrays, state)
    jax.block_until_ready(state.fluid.pos.x)
    print(f"hot: t={float(state.t):.3f} diag={np.asarray(state.diag)}",
          flush=True)
    return scene, state, step


def trace_step(scene, state, step):
    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    s = state
    for _ in range(2):
        s = step(scene.arrays, s)
    jax.block_until_ready(s.fluid.pos.x)
    jax.profiler.stop_trace()

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    agg = {}
    total = 0.0
    for fp in files:
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            # TPU op events live on TensorFlow-op/XLA-op rows; keep XLA ops.
            name = ev.get("name", "")
            args = ev.get("args", {}) or {}
            cat = args.get("l", "") if isinstance(args, dict) else ""
            pidn = ev.get("pid", 0)
            key = name.split(".")[0].split("(")[0][:60]
            agg.setdefault((pidn, key), [0.0, 0])
            agg[(pidn, key)][0] += ev["dur"] / 1e3  # ms
            agg[(pidn, key)][1] += 1
            total += ev["dur"] / 1e3
    # Print the top rows per pid (pid distinguishes device vs host rows).
    by_pid = {}
    for (pidn, key), (ms, cnt) in agg.items():
        by_pid.setdefault(pidn, []).append((ms, cnt, key))
    for pidn, rows in sorted(by_pid.items()):
        tot = sum(r[0] for r in rows)
        if tot < 50:  # skip quiet rows
            continue
        print(f"--- pid {pidn} total {tot:.1f} ms over 2 steps", flush=True)
        for ms, cnt, key in sorted(rows, reverse=True)[:25]:
            print(f"  {ms:9.2f} ms  x{cnt:<5d} {key}", flush=True)


def loop_probes(scene, state):
    """Value-dependent in-loop gather probes (nothing hoistable)."""
    st = scene.static
    n, K = st.n_fluid, st.K
    rng = np.random.default_rng(0)
    idxK = jnp.asarray(rng.integers(0, n, size=(n, K)), dtype=jnp.int32)
    base_f = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(8)]
    ITERS = 20

    def mk(loop_body):
        def run():
            def body(i, c):
                acc, x = c
                return loop_body(acc, x, i)
            acc, x = jax.lax.fori_loop(
                0, ITERS, body, (jnp.zeros(()), base_f[0]))
            return acc + jnp.sum(x)
        return jax.jit(run)

    # 4-lane f32: table depends on x (changes every iteration).
    def b4(acc, x, i):
        tbl = jnp.stack([x, base_f[1], base_f[2], base_f[3]], axis=0)
        rows = tbl[:, idxK]
        s = jnp.sum(rows[0], axis=1)
        return acc + jnp.sum(s), x + s * 1e-12

    # 8-lane f32
    def b8(acc, x, i):
        tbl = jnp.stack([x, base_f[1], base_f[2], base_f[3],
                         x + 1, base_f[4], base_f[5], base_f[6]], axis=0)
        rows = tbl[:, idxK]
        s = jnp.sum(rows[0] + rows[4], axis=1)
        return acc + jnp.sum(s), x + s * 1e-12

    # 4-lane bf16
    def b4b(acc, x, i):
        tbl = jnp.stack([x, base_f[1], base_f[2], base_f[3]],
                        axis=0).astype(jnp.bfloat16)
        rows = tbl[:, idxK].astype(jnp.float32)
        s = jnp.sum(rows[0], axis=1)
        return acc + jnp.sum(s), x + s * 1e-12

    # two dependent 4-lane gathers (the real iteration shape)
    def b44(acc, x, i):
        tbl = jnp.stack([x, base_f[1], base_f[2], base_f[3]], axis=0)
        rows = tbl[:, idxK]
        s = jnp.sum(rows[0], axis=1)
        tbl2 = jnp.stack([s, base_f[4], base_f[5], base_f[6]], axis=0)
        rows2 = tbl2[:, idxK]
        s2 = jnp.sum(rows2[0], axis=1)
        return acc + jnp.sum(s2), x + s2 * 1e-12

    for name, body in [("4-lane f32", b4), ("8-lane f32", b8),
                       ("4-lane bf16", b4b), ("2x 4-lane (real shape)", b44)]:
        t = sync_time(mk(body)) / ITERS
        print(f"[loop] {name}: {t*1e3:.3f} ms/iter (N={n}, K={K})",
              flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    measure_floor()
    scene, state, step = hot_state()
    if os.environ.get('LOOPS'):
        loop_probes(scene, state)
    trace_step(scene, state, step)
    print("done", flush=True)


if __name__ == "__main__":
    main()
