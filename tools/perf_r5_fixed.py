"""Round-5 probe: split the hot 1M DFSPH step into fixed vs
per-divergence-iteration cost by varying MAX_ITER_DIV (the hot state
rails the divergence loop at its cap, so the cap IS the trip count).
Locates the bench's "other_ms": if the per-iteration slope matches the
standalone mv_pair (~18.5 ms) the loop body is clean and "other" is
fixed-cost; a fatter slope means the loop body itself carries waste.

    MAXDIV=15 timeout 3000 python -u tools/perf_r5_fixed.py [steps]
"""
import dataclasses
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

from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.runner import Simulation
from cfd_taichi_tpu.utils import io as io_utils


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    maxdiv = int(os.environ.get("MAXDIV", "15"))
    dfsph.MAX_ITER_DIV = maxdiv
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    plan_pos = np.load("/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy")
    sim = Simulation(cfg, plan_pos=plan_pos)
    sim.state = io_utils.load_checkpoint(
        "/tmp/bench_hot_breaking_dam_1m_dfsph.npz", sim.state)

    def sync():
        return float(jnp.sum(sim.state.fluid.pos.x))

    for _ in range(3):
        sim.step()
    sync()
    t0 = time.perf_counter()
    for _ in range(steps):
        sim.step()
    sync()
    wall = time.perf_counter() - t0
    diag = np.asarray(sim.state.diag)
    print({"maxdiv": maxdiv, "steps": steps,
           "step_ms": round(wall / steps * 1e3, 1),
           "steps_per_sec": round(steps / wall, 3),
           "diag": [round(float(d), 3) for d in diag]}, flush=True)


if __name__ == "__main__":
    main()
