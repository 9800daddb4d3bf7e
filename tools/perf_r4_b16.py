"""Round-4 probe: query-group width B=8 vs B=16 in the 1M coef regime.

Every windowed pass (rho_count, coef build, viscosity, boundary terms,
matvecs) streams QB x width slots; doubling B halves QB while the plan
width grows sub-2x, so wider groups may win under the r4 cost structure
(the r3 choice of B=8 predates the einsum matvecs and the fast plan
machinery). scene.BAND_B_LARGE keys the width alone — the rest of the
large-N policy ladder (split coef buckets, sparse boundary cap) stays.

    timeout 3000 python -u tools/perf_r4_b16.py
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

WARM = int(os.environ.get("WARM", "6"))
REPS = int(os.environ.get("REPS", "5"))
WIDTHS = [int(b) for b in os.environ.get("WIDTHS", "16,8").split(",")]


def main():
    print("device:", jax.devices(), flush=True)
    for Bw in WIDTHS:
        scene_mod.BAND_B_LARGE = Bw
        cfg = read_config(os.path.join(REPO, "configs",
                                       "breaking_dam_1m.json"))
        cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
            cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
        t0 = time.perf_counter()
        scene = build_scene(cfg)
        st = scene.static
        print(f"[B={Bw}] n={st.n_fluid} band_B={st.band_B} "
              f"pair_nb={st.pair_nb} coef_nbA={st.coef_nbA} "
              f"capB={st.coef_capB} wide={st.band_nb_wide} "
              f"bq={st.bq_cap} (built {time.perf_counter()-t0:.0f}s)",
              flush=True)
        state = dfsph.init_state(scene)
        step = jax.jit(functools.partial(dfsph.step, st))
        t0 = time.perf_counter()
        for i in range(WARM):
            state = step(scene.arrays, state)
            _ = float(jnp.sum(state.fluid.pos.x))
        print(f"[B={Bw}] warm {WARM} in {time.perf_counter()-t0:.0f}s "
              f"diag={np.asarray(state.diag).round(1)} "
              f"overflow={int(state.overflow)}", flush=True)
        t0 = time.perf_counter()
        iters = 0.0
        for _ in range(REPS):
            state = step(scene.arrays, state)
            _ = float(jnp.sum(state.fluid.pos.x))
            d = np.asarray(state.diag)
            iters += float(d[0] + d[2])
        wall = time.perf_counter() - t0
        print(f"[B={Bw}] HOT {REPS/wall:.3f} steps/s "
              f"({wall/REPS*1e3:.0f} ms/step) iters/step={iters/REPS:.1f} "
              f"overflow={int(state.overflow)}", flush=True)
        del state, step, scene
    scene_mod.BAND_B_LARGE = 8
    print("done", flush=True)


if __name__ == "__main__":
    main()
