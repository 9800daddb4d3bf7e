"""Quick hot-phase DFSPH throughput check on the real chip.

    nohup python tools/hotbench.py > /tmp/hotbench.log 2>&1 &
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import dfsph

SOLVER = os.environ.get("SOLVER", "dfsph")
CONFIG = os.environ.get("CONFIG", "breaking_dam_30k.json")
WARM = int(os.environ.get("WARM", "120"))
REPS = int(os.environ.get("REPS", "40"))


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", CONFIG))
    import dataclasses
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name=SOLVER))
    scene = build_scene(cfg)
    print(f"scene built: n={scene.static.n_fluid}", flush=True)
    from cfd_taichi_tpu.models import get_solver
    mod = get_solver(SOLVER)
    step = jax.jit(functools.partial(mod.step, scene.static))
    state = mod.init_state(scene)
    t0 = time.perf_counter()
    import jax.numpy as _jnp

    def sync(st_):
        # A data-dependent scalar fetch: state.t alone can be computed
        # without the heavy arrays for fixed-dt solvers, and
        # block_until_ready through the tunnel relay lies whenever the
        # rep count fits its pipeline.
        return float(_jnp.sum(st_.fluid.pos.x))

    for i in range(WARM):
        state = step(scene.arrays, state)
        sync(state)
        if i % 40 == 39:
            jax.block_until_ready(state.fluid.pos.x)
            print(f"warm {i+1}: t={float(state.t):.4f} "
                  f"overflow={int(state.overflow)} "
                  f"wall={time.perf_counter()-t0:.1f}s", flush=True)
    jax.block_until_ready(state.fluid.pos.x)

    # Scalar-sync EVERY rep: through the tunnel relay, block_until_ready
    # alone pipelines and reports numbers wrong by orders of magnitude.
    t0 = time.perf_counter()
    for _ in range(REPS):
        state = step(scene.arrays, state)
        sync(state)
    dtw = time.perf_counter() - t0
    print(f"hot {SOLVER} {CONFIG}: {REPS/dtw:.3f} steps/s "
          f"({dtw/REPS*1e3:.1f} ms/step) diag={np.asarray(state.diag)} "
          f"overflow={int(state.overflow)} t={float(state.t):.4f}",
          flush=True)
    # density parity telemetry
    from cfd_taichi_tpu.models import base as mbase
    import jax.numpy as jnp

    @jax.jit
    def parity(fluid_pos, rigid_pos):
        nbh = mbase.build_nbh(scene.static, scene.arrays, fluid_pos,
                              rigid_pos)
        rho = mbase.nbh_rho(scene.static, nbh)
        pos_err = jnp.maximum(rho - 1000.0, 0.0)
        over = pos_err > 0
        avg = jnp.where(over.sum() > 0,
                        jnp.sum(jnp.where(over, pos_err, 0.0)) / over.sum(),
                        0.0)
        return avg

    print(f"avg_pos_density_err_pct="
          f"{float(parity(state.fluid.pos, state.rigid.pos))/10.0:.4f}",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
