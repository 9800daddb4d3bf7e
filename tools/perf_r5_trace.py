"""Round-5 probe: op-level attribution of the hot 1M DFSPH step via
jax.profiler + tensorboard_plugin_profile parsing. Prints the top HLO
ops by self time so the bench's residual "other_ms" stops being a
guess.

    timeout 3000 python -u tools/perf_r5_trace.py [steps]
"""
import dataclasses
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.runner import Simulation
from cfd_taichi_tpu.utils import io as io_utils

LOGDIR = "/tmp/jtrace_r5"


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
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
    jax.profiler.start_trace(LOGDIR)
    for _ in range(steps):
        sim.step()
    sync()
    jax.profiler.stop_trace()
    print("trace done", flush=True)

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplanes:", paths, flush=True)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    for tool in ("op_profile", "framework_op_stats", "overview_page"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [paths[-1]], tool, params={})
            out = os.path.join("/tmp", f"r5_{tool}.json")
            with open(out, "w") as f:
                if isinstance(data, bytes):
                    f.write(data.decode("utf-8", "replace"))
                else:
                    f.write(data if isinstance(data, str)
                            else json.dumps(data))
            print("wrote", out, flush=True)
        except Exception as e:
            print(tool, "FAIL", type(e).__name__, e, flush=True)


if __name__ == "__main__":
    main()
