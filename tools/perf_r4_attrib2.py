"""Round-4 probe: DCE-proof sub-phase attribution of the 1M one-shot.

perf_r4_step1m's eng_build chain consumed only eng.rho_f, so XLA
dead-code-eliminated the coef build + compact_plan — its "523 ms" was
really just sort+plan+rho_count+boundary. This probe times CUMULATIVE
prefixes of build_dense_engine with EVERY intermediate folded into the
checksum, so nothing is eliminated; successive differences attribute
the true one-shot cost (1381 ms per perf_r4_attrib's cap fit).

    timeout 3000 python -u tools/perf_r4_attrib2.py
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

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops.vec import V3


def main():
    print("device:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    scene = build_scene(cfg)
    st = scene.static
    state = dfsph.init_state(scene)
    step0 = jax.jit(functools.partial(dfsph.step, st))
    for _ in range(4):
        state = step0(scene.arrays, state)
    _ = float(jnp.sum(state.fluid.pos.x))
    print("hot state ready", flush=True)
    fp = state.fluid.pos

    def prefix(depth, px, py, pz, c):
        pos = V3(px + c * 1e-12, py, pz)
        chk = jnp.zeros(())
        dp = mbase.build_dense_prep(st, scene.arrays, pos,
                                    st.band_nb_wide, st.band_B)
        chk += jnp.sum(dp.pos.x) + jnp.sum(dp.plan[0]).astype(jnp.float32)
        if dp.bterms is not None:
            chk += jnp.sum(dp.bterms.rho) + jnp.sum(dp.bterms.s.x)
        if depth == 0:
            return chk
        rho_f, count, blk_pair = bandmat.dense_rho_count(
            dp.pos, h=st.h, m=st.particle_m, plan=dp.plan, B=st.band_B,
            sub=st.band_B // st.loop_B if st.loop_B else 1)
        chk += jnp.sum(rho_f) + jnp.sum(count).astype(jnp.float32)
        if depth == 1:
            return chk
        sub = st.band_B // st.loop_B if st.loop_B else 1
        QBl = -(-st.n_fluid // st.loop_B) if st.loop_B else 0
        if sub > 1:
            blk_w = jnp.repeat(dp.plan[0], sub, axis=0)[:QBl]
            mask_w = jnp.repeat(dp.plan[1], sub, axis=0)[:QBl]
            plan_loop = bandmat.compact_plan(
                (blk_w, mask_w, dp.plan[2]), blk_pair[:QBl], st.pair_nb)
            flags_q = blk_pair.reshape(-1, sub,
                                       blk_pair.shape[1]).any(axis=1)
            plan = bandmat.compact_plan(dp.plan, flags_q, st.pair_nb_q)
            Bl = st.loop_B
        else:
            plan = plan_loop = bandmat.compact_plan(dp.plan, blk_pair,
                                                    st.pair_nb)
            Bl = st.band_B
        chk += jnp.sum(plan[0]).astype(jnp.float32) \
            + jnp.sum(plan_loop[0]).astype(jnp.float32)
        if depth == 2:
            return chk
        seng = bandmat.build_split_coef_engine(
            dp.pos, h=st.h, m=st.particle_m, plan=plan_loop, B=Bl,
            nbA=st.coef_nbA, capB=st.coef_capB, dtype=dfsph.BAND_DTYPE)
        chk += (jnp.sum(seng.s.x) + jnp.sum(seng.qsum)
                + jnp.sum(seng.tvec.x)
                + jnp.sum(seng.a.w.astype(jnp.float32))
                + jnp.sum(seng.rem.w.astype(jnp.float32)))
        if depth == 3:
            return chk
        mv, mvd = bandmat.split_coef_matvec_ops(seng, st.n_fluid, Bl)
        u = mv(rho_f * 1e-6)
        chk += jnp.sum(mvd(u))
        if depth == 4:
            return chk
        visc = bandmat.dense_viscosity(
            dp.pos, V3(px, py, pz), rho_f, h=st.h, m=st.particle_m,
            plan=plan, B=st.band_B, c_s=13.0, alpha=0.08)
        return chk + jnp.sum(visc.x)

    names = ["dp(sort+plan+boundary)", "+dense_rho_count", "+compact_plan",
             "+split_coef_build(w,s,qsum,tvec)", "+matvec pair",
             "+dense_viscosity"]
    prev = 0.0
    for depth in range(6):
        f = jax.jit(functools.partial(prefix, depth))
        out = f(fp.x, fp.y, fp.z, jnp.ones(()))
        _ = float(out)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            out = f(fp.x, fp.y, fp.z, jnp.float32(1.0 + i))
            _ = float(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        print(f"depth {depth} {names[depth]:38s}: cum {wall:7.1f} ms "
              f"(delta {wall - prev:6.1f})", flush=True)
        prev = wall
    print("done", flush=True)


if __name__ == "__main__":
    main()
