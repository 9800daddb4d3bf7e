"""Round-5 probe: end-to-end hot 1M DFSPH step rate via checkpoint
resume (the bench protocol) — resumes the /tmp hot checkpoint the last
bench run dumped, with capacities re-planned from its distribution, and
times a batch of real Simulation.step() calls with a scalar sync.

    timeout 3000 python -u tools/perf_r5_step1m.py [steps]
"""
import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.runner import Simulation
from cfd_taichi_tpu.utils import io as io_utils


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    plan_pos = np.load("/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy")
    sim = Simulation(cfg, plan_pos=plan_pos)
    sim.state = io_utils.load_checkpoint(
        "/tmp/bench_hot_breaking_dam_1m_dfsph.npz", sim.state)

    def sync():
        return float(jnp.sum(sim.state.fluid.pos.x))

    for _ in range(4):
        sim.step()
    sync()
    t0 = time.perf_counter()
    for _ in range(steps):
        sim.step()
    sync()
    wall = time.perf_counter() - t0
    print({"steps": steps, "wall_s": round(wall, 3),
           "steps_per_sec": round(steps / wall, 3),
           **{k: v for k, v in sim.telemetry().items()
              if k in ("solver_iters", "window_overflow", "avg_pos_err",
                       "rho_avg", "nan_particles")}}, flush=True)


if __name__ == "__main__":
    main()
