"""Step the 1M scene N times, then probe each overflow channel on the
evolved state.  nohup python tools/diag_overflow2.py"""
import os, sys, functools
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.models import dfsph

cfg = read_config(os.path.join(REPO, "configs",
                               os.environ.get("CONFIG", "breaking_dam_1m.json")))
scene = build_scene(cfg)
st = scene.static
print(f"n={st.n_fluid} K={st.K} band_nb={st.band_nb} bband_nb={st.bband_nb} "
      f"bK={st.bK} pair_nb={st.pair_nb}", flush=True)

step = jax.jit(functools.partial(dfsph.step, st))
state = dfsph.init_state(scene)
for i in range(int(os.environ.get("STEPS", "12"))):
    state = step(scene.arrays, state)
    _ = float(state.t)
print(f"stepped: t={float(state.t):.4f} overflow={int(state.overflow)}",
      flush=True)
pos = np.stack([np.asarray(state.fluid.pos.x), np.asarray(state.fluid.pos.y),
                np.asarray(state.fluid.pos.z)], axis=1)
np.save(os.environ.get("DUMP", "/tmp/diag_pos.npy"), pos)

@jax.jit
def probe(fluid_pos):
    perm = jnp.argsort(nb.cell_id(fluid_pos, st.grid), stable=True)
    pos_s = fluid_pos.take(perm.astype(jnp.int32))
    table = nb.build_cell_table(pos_s, st.grid)
    qid = jnp.arange(st.n_fluid, dtype=jnp.int32)
    nl, fplan = nb.find_neighbors_grouped(
        pos_s, qid, pos_s, table, st.grid, K=st.K, nbcap=st.band_nb,
        B=st.band_B, exclude_self=True)
    bl, bplan = nb.find_neighbors_grouped(
        pos_s, None, scene.arrays.boundary_pos, scene.arrays.boundary_table,
        st.grid, K=st.bK, nbcap=st.bband_nb, B=st.band_B)
    return (jnp.max(nl.count), nl.dropped, fplan[2],
            jnp.max(bl.count), bl.dropped, bplan[2])

out = [int(x) for x in probe(state.fluid.pos)]
print(f"fluid: count_max={out[0]} (K={st.K}) dropped={out[1]} plan_over={out[2]}", flush=True)
print(f"boundary: count_max={out[3]} (bK={st.bK}) dropped={out[4]} plan_over={out[5]}", flush=True)
