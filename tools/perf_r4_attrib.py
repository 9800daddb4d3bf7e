"""Round-4 probe: attribute the 1M DFSPH step's wall time.

perf_r4_step1m measured the FULL step at 1812 ms but the sum of its
separately-jitted phases (engine build 523 + 17 x matvec-pair 28.4 +
viscosity 111) only reaches ~1.1 s. This probe varies MAX_ITER_DIV on the
SAME railed scene (divergence residual ~3e4 >> threshold 10, so realized
div iters == cap) and fits wall(cap) = intercept + cap * per_iter to get
the IN-CONTEXT per-iteration cost and the true one-shot remainder.

    timeout 3000 python -u tools/perf_r4_attrib.py
"""
import dataclasses
import functools
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
from cfd_taichi_tpu.models import dfsph

CAPS = [int(c) for c in os.environ.get("CAPS", "3,9,15").split(",")]
REPS = int(os.environ.get("REPS", "4"))


def main():
    print("device:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    scene = build_scene(cfg)
    st = scene.static
    state0 = dfsph.init_state(scene)
    # Evolve 4 steps at the default cap so the scene is railed/hot.
    step0 = jax.jit(functools.partial(dfsph.step, st))
    for _ in range(4):
        state0 = step0(scene.arrays, state0)
    _ = float(jnp.sum(state0.fluid.pos.x))
    print(f"hot state ready: diag={np.asarray(state0.diag).round(1)}",
          flush=True)

    results = {}
    for cap in CAPS:
        dfsph.MAX_ITER_DIV = cap
        step = jax.jit(functools.partial(dfsph.step, st))
        state = step(scene.arrays, state0)        # compile + run
        _ = float(jnp.sum(state.fluid.pos.x))
        t0 = time.perf_counter()
        for _ in range(REPS):
            state = step(scene.arrays, state0)
            _ = float(jnp.sum(state.fluid.pos.x))
        wall = (time.perf_counter() - t0) / REPS
        d = np.asarray(state.diag)
        results[cap] = wall
        print(f"cap={cap}: {wall*1e3:.0f} ms/step realized div={d[0]:.0f} "
              f"den={d[2]:.0f}", flush=True)
    dfsph.MAX_ITER_DIV = 15

    caps = sorted(results)
    if len(caps) >= 2:
        per = (results[caps[-1]] - results[caps[0]]) / (caps[-1] - caps[0])
        icpt = results[caps[0]] - caps[0] * per
        print(f"per-div-iter (in context): {per*1e3:.1f} ms; "
              f"non-div remainder: {icpt*1e3:.0f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
