"""Round-4 probe: split-bucket A-width (coef_nbA) / remainder capacity
tuning at 1M, B=32 single-width. The stored bf16 w (N x nbA x 128) is
now the dominant per-iteration stream; a narrower A bucket trades w
bytes for more remainder groups at full width.

    timeout 3600 python -u tools/perf_r4_nba.py
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
from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import dfsph

# (nbA, capB-divisor) variants; None = scene default formula.
VARIANTS = os.environ.get("VARIANTS", "15:12,12:6,10:4").split(",")
WARM = int(os.environ.get("WARM", "5"))
REPS = int(os.environ.get("REPS", "5"))


def main():
    print("device:", jax.devices(), flush=True)
    for var in VARIANTS:
        nbA, div = (int(v) for v in var.split(":"))
        cfg = read_config(os.path.join(REPO, "configs",
                                       "breaking_dam_1m.json"))
        cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
            cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
        scene = build_scene(cfg)
        st = scene.static
        QB = -(-st.n_fluid // st.band_B)
        capB = min(QB, -(-QB // div) + 8)
        st = dataclasses.replace(st, coef_nbA=nbA, coef_capB=capB)
        print(f"[nbA={nbA} capB={capB}] pair_nb={st.pair_nb}", flush=True)
        state = dfsph.init_state(scene)
        step = jax.jit(functools.partial(dfsph.step, st))
        t0 = time.perf_counter()
        for _ in range(WARM):
            state = step(scene.arrays, state)
            _ = float(jnp.sum(state.fluid.pos.x))
        print(f"  warm {WARM} in {time.perf_counter()-t0:.0f}s "
              f"overflow={int(state.overflow)}", flush=True)
        t0 = time.perf_counter()
        for _ in range(REPS):
            state = step(scene.arrays, state)
            _ = float(jnp.sum(state.fluid.pos.x))
        wall = time.perf_counter() - t0
        print(f"  HOT {REPS/wall:.3f} steps/s ({wall/REPS*1e3:.0f} ms) "
              f"overflow={int(state.overflow)} "
              f"diag={np.asarray(state.diag).round(1)}", flush=True)
        del state, step, scene
    print("done", flush=True)


if __name__ == "__main__":
    main()
