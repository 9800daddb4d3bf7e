"""Regenerate the bench's hot 1M DFSPH donor checkpoint (the exact
protocol bench.time_solver uses with resume_steps=12, impact=3.0) so the
round-5 perf probes (perf_r5_step1m.py, phase_attrib_1m.py) can run
without a full bench pass.

    timeout 1200 python -u tools/make_hot_1m.py
"""
import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np

from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.runner import Simulation
from cfd_taichi_tpu.utils import io as io_utils


def main():
    steps = int(os.environ.get("STEPS", "12"))
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    donor = Simulation(cfg)
    t0 = time.time()
    for i in range(steps):
        donor.step()
        if i % 4 == 3:
            print(f"donor step {i + 1}/{steps} wall={time.time() - t0:.0f}s",
                  flush=True)
    tag = "breaking_dam_1m_dfsph"
    io_utils.save_checkpoint(f"/tmp/bench_hot_{tag}.npz", donor.state)
    np.save(f"/tmp/bench_hot_{tag}_pos.npy",
            donor.state.fluid.pos.to_numpy())
    print(f"dumped hot checkpoint after {steps} steps "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
