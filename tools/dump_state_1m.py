"""Step the 1M DFSPH scene N steps on TPU, dump fluid positions to .npy so
plan variants can be iterated host-side without re-stepping."""
import os, sys, functools
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.models import dfsph

cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
scene = build_scene(cfg)
st = scene.static
step = jax.jit(functools.partial(dfsph.step, st))
state = dfsph.init_state(scene)
import time
t0 = time.time()
steps = int(os.environ.get("STEPS", "30"))
for i in range(steps):
    state = step(scene.arrays, state)
    if i % 5 == 4:
        print(f"step {i+1}: t={float(state.t):.4f} overflow={int(state.overflow)} "
              f"wall={time.time()-t0:.0f}s", flush=True)
pos = np.stack([np.asarray(state.fluid.pos.x), np.asarray(state.fluid.pos.y),
                np.asarray(state.fluid.pos.z)], axis=1)
np.save("/tmp/state1m_pos.npy", pos)
bpos = np.stack([np.asarray(scene.arrays.boundary_pos.x),
                 np.asarray(scene.arrays.boundary_pos.y),
                 np.asarray(scene.arrays.boundary_pos.z)], axis=1)
np.save("/tmp/state1m_bpos.npy", bpos)
print(f"dumped: t={float(state.t):.4f} overflow={int(state.overflow)} "
      f"rate={steps/(time.time()-t0):.3f} steps/s", flush=True)
