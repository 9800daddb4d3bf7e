"""Round-4 probe: the 100k-300k policy zone (VERDICT r03 item 3).

GROUPED_BUILD_MIN_N=150k puts breaking_dam_157k (the reference's demo
geometry) just above the B=8/coef-engine cut that was tuned for 1M; no
measurement justified it. This probe times hot-phase DFSPH (impact seed)
at ~100k/157k/300k under BOTH policies by monkeypatching the threshold
before scene build.

    MODE=b8|b16 NGRID=157k timeout 3000 python -u tools/perf_r4_157k.py
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

import cfd_taichi_tpu.scene as scene_mod
import cfd_taichi_tpu.models.base as base_mod
from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import dfsph

MODE = os.environ.get("MODE", "b16")
FORCE_COEF = os.environ.get("FORCE_COEF", "0") == "1"
SIZES = os.environ.get("SIZES", "100k,157k,300k").split(",")
WARM = int(os.environ.get("WARM", "6"))
REPS = int(os.environ.get("REPS", "8"))

# water sizes on the breaking_dam_157k box ([10, 7, 3], r=0.025) giving
# ~100k / ~157k (the reference demo's 2.0x3.5x2.8) / ~300k particles.
WATER = {
    "100k": (1.6, 2.8, 2.24),    # 32*56*44 ~ 78.8k... adjusted below
    "157k": (2.0, 3.5, 2.8),     # the reference demo geometry (156.8k)
    "300k": (2.5, 4.375, 2.8),   # ~306k
}
WATER["100k"] = (1.75, 3.0, 2.4)  # 35*60*48 = 100.8k


def main():
    print("device:", jax.devices(), "mode:", MODE,
          "force_coef:", FORCE_COEF, flush=True)
    if FORCE_COEF:
        dfsph.BAND_BYTE_BUDGET = 0
    thresh = 150_000 if MODE == "b8" else 10_000_000
    scene_mod.GROUPED_BUILD_MIN_N = thresh
    base_mod.GROUPED_BUILD_MIN_N = thresh
    for size in SIZES:
        cfg = read_config(os.path.join(REPO, "configs",
                                       "breaking_dam_157k.json"))
        cfg = dataclasses.replace(
            cfg,
            fluid=dataclasses.replace(cfg.fluid, water_size=WATER[size],
                                      initial_velocity=(0.0, -3.0, 0.0)))
        t0 = time.perf_counter()
        scene = build_scene(cfg)
        st = scene.static
        from cfd_taichi_tpu.models.dfsph import (use_band_engine,
                                                 use_coef_engine)
        engine = ("band" if use_band_engine(st.n_fluid, st.band_nb)
                  else ("coef" if use_coef_engine(st.n_fluid, st.pair_nb,
                                                  st.band_B) else "other"))
        print(f"[{size}] n={st.n_fluid} B={st.band_B} band_nb={st.band_nb} "
              f"pair_nb={st.pair_nb} wide={st.band_nb_wide} eng={engine} "
              f"(built {time.perf_counter()-t0:.0f}s)", flush=True)
        state = dfsph.init_state(scene)
        step = jax.jit(functools.partial(dfsph.step, st))
        t0 = time.perf_counter()
        for i in range(WARM):
            state = step(scene.arrays, state)
            _ = float(jnp.sum(state.fluid.pos.x))
        print(f"[{size}] warm {WARM} steps in {time.perf_counter()-t0:.0f}s "
              f"diag={np.asarray(state.diag).round(1)}", flush=True)
        t0 = time.perf_counter()
        iters = 0.0
        for _ in range(REPS):
            state = step(scene.arrays, state)
            _ = float(jnp.sum(state.fluid.pos.x))
            d = np.asarray(state.diag)
            iters += float(d[0] + d[2])
        wall = time.perf_counter() - t0
        print(f"[{size}] {MODE}: {REPS/wall:.3f} steps/s "
              f"({wall/REPS*1e3:.0f} ms/step) iters/step={iters/REPS:.1f} "
              f"overflow={int(state.overflow)}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
