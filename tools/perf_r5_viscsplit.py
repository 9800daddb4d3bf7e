"""Round-5 probe: dense_viscosity full-width vs split-bucket
(dense_viscosity_split at the engine's nbA/capB) on the hot 1M state.

    timeout 3000 python -u tools/perf_r5_viscsplit.py [hot_pos.npy]
"""
import dataclasses
import json
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

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops.vec import V3

RES = {}


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0].astype(jnp.float32))


def timed(name, make_fn, reps=8):
    fn, args = make_fn()
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    dt = max(time.perf_counter() - t0 - rtt, 0.0) / reps
    RES[name] = round(dt * 1e3, 2)
    print(name, RES[name], file=sys.stderr, flush=True)
    return out


def main():
    pos_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy"
    rows = np.load(pos_path)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    scene = build_scene(cfg, plan_pos=rows)
    st = scene.static
    pos = V3(jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
             jnp.asarray(rows[:, 2]))
    RES.update(n=st.n_fluid, B=st.band_B, pair_nb=st.pair_nb,
               nbA=st.coef_nbA, capB=st.coef_capB)

    stage = jax.jit(lambda px, py, pz: (
        lambda dp: (dp.pos, dp.plan))(mbase.build_dense_prep(
            st, scene.arrays, V3(px, py, pz), st.band_nb_wide,
            st.band_B, want_bterms=False)))
    pos_s, plan = stage(pos.x, pos.y, pos.z)
    jax.block_until_ready(pos_s.x)
    tight = jax.jit(lambda px, py, pz, blk, mask: (
        lambda flags: bandmat.compact_plan(
            (blk, mask, jnp.zeros((), jnp.int32)), flags, st.pair_nb))(
        bandmat.dense_rho_count(
            V3(px, py, pz), h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=st.band_B)[2]))(
        pos_s.x, pos_s.y, pos_s.z, plan[0], plan[1])
    jax.block_until_ready(tight[0])
    vel = V3(pos_s.x * 0 + 1.0, pos_s.y * 0.5, pos_s.z * 0.1)
    rho = pos_s.x * 0 + 1000.0

    base_out = timed("visc_full_ms", lambda: (
        jax.jit(lambda px, py, pz, bl, msk: bandmat.dense_viscosity(
            V3(px, py, pz), vel, rho, h=st.h, m=st.particle_m,
            plan=(bl, msk, jnp.zeros((), jnp.int32)), B=st.band_B,
            c_s=13.0, alpha=0.08).x),
        (pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1])))

    split_out = timed("visc_split_ms", lambda: (
        jax.jit(lambda px, py, pz, bl, msk: bandmat.dense_viscosity_split(
            V3(px, py, pz), vel, rho, h=st.h, m=st.particle_m,
            plan=(bl, msk, jnp.zeros((), jnp.int32)), B=st.band_B,
            c_s=13.0, alpha=0.08, nbA=st.coef_nbA, capB=st.coef_capB).x),
        (pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1])))

    RES["visc_equal"] = bool(jnp.allclose(base_out, split_out,
                                          rtol=1e-5, atol=1e-7))
    need = jnp.sum(tight[1], axis=1)
    RES["tail_groups"] = int(jnp.sum(need > st.coef_nbA))
    RES["need_max"] = int(need.max())
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
