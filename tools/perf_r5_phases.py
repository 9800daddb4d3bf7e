"""Round-5 probe: per-phase attribution of the hot 1M DFSPH step
(VERDICT r04 item 1) + plan-width distributions + loop-engine width
variants. Single-purpose MODE runs (separate processes) so big engine
buffers never coexist with a fresh compile (the r4 all-in-one probe
OOM'd compiling its matvec chain next to the live step buffers):

    MODE=evolve   impact-seed + 10 steps, save hot pos to /tmp/r5_hot1m.npy
    MODE=dist     plan-width distributions on the hot state (CSR cover,
                  true pair-block count, AABB-flag count per group)
    MODE=phases   chained timings: prep / dense_rho_count / compact_plan /
                  coef build / viscosity on the hot state
    MODE=mv       matvec+matvec_dot timing for NBA:CAPB variants
                  (VARIANTS="24:2608,16:4000,12:6000")

    timeout 3000 python -u tools/perf_r5_phases.py
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

MODE = os.environ.get("MODE", "phases")
HOT = "/tmp/r5_hot1m.npy"
RTT = 0.026  # measured tunnel dispatch+fetch floor


def scene_1m():
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    t0 = time.perf_counter()
    scene = build_scene(cfg)
    st = scene.static
    print(f"scene: n={st.n_fluid} B={st.band_B} pair_nb={st.pair_nb} "
          f"nbA={st.coef_nbA} capB={st.coef_capB} wide={st.band_nb_wide} "
          f"bq={st.bq_cap} ({time.perf_counter()-t0:.0f}s)", flush=True)
    return scene


def hot_pos(scene):
    rows = np.load(HOT)
    return V3(jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
              jnp.asarray(rows[:, 2]))


def chain(name, fn, x0, *consts, k_it=4):
    run = jax.jit(lambda x, *cs: jax.lax.fori_loop(
        0, k_it, lambda i, c: fn(c, *cs), x))
    out = run(x0, *consts)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(x0, *consts)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0 - RTT) / k_it
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def mode_evolve():
    scene = scene_1m()
    st = scene.static
    state = dfsph.init_state(scene)
    step = jax.jit(functools.partial(dfsph.step, st))
    t0 = time.perf_counter()
    for i in range(10):
        state = step(scene.arrays, state)
        _ = float(jnp.sum(state.fluid.pos.x))
    print(f"evolved 10 steps in {time.perf_counter()-t0:.0f}s "
          f"diag={np.asarray(state.diag).round(1)} "
          f"overflow={int(state.overflow)}", flush=True)
    t0 = time.perf_counter()
    for i in range(4):
        state = step(scene.arrays, state)
    _ = float(jnp.sum(state.fluid.pos.x))
    print(f"HOT step: {(time.perf_counter()-t0)/4*1e3:.0f} ms", flush=True)
    rows = np.stack([np.asarray(state.fluid.pos.x),
                     np.asarray(state.fluid.pos.y),
                     np.asarray(state.fluid.pos.z)], axis=1)
    np.save(HOT, rows)
    print("saved", HOT, flush=True)


def mode_dist():
    scene = scene_1m()
    st = scene.static
    pos = hot_pos(scene)

    @jax.jit
    def dist(px, py, pz):
        dp = mbase.build_dense_prep(st, scene.arrays, V3(px, py, pz),
                                    st.band_nb_wide, st.band_B)
        cover = jnp.sum(dp.plan[1], axis=1)          # CSR union width
        _, _, blk_pair = bandmat.dense_rho_count(
            dp.pos, h=st.h, m=st.particle_m, plan=dp.plan, B=st.band_B)
        pairw = jnp.sum(blk_pair & dp.plan[1], axis=1)
        aabb = bandmat.aabb_flags(dp.pos, dp.plan, st.band_B, st.h)
        aabbw = jnp.sum(aabb, axis=1)
        return cover, pairw, aabbw

    cover, pairw, aabbw = (np.asarray(t) for t in
                           dist(pos.x, pos.y, pos.z))
    for name, w in (("csr_cover", cover), ("pair", pairw), ("aabb", aabbw)):
        q = np.percentile(w, [50, 90, 98, 99.9, 100]).astype(int)
        print(f"{name:10s} p50={q[0]} p90={q[1]} p98={q[2]} "
              f"p99.9={q[3]} max={q[4]} mean={w.mean():.1f}", flush=True)


def mode_phases():
    scene = scene_1m()
    st = scene.static
    pos = hot_pos(scene)
    B = st.band_B

    # 1) prep: sort + CSR plan + boundary windows/terms
    def prep(c, px, py, pz):
        dp = mbase.build_dense_prep(st, scene.arrays, V3(px + c * 1e-12,
                                                         py, pz),
                                    st.band_nb_wide, B)
        out = jnp.sum(dp.pos.x) + (jnp.sum(dp.bterms.rho)
                                   if dp.bterms is not None else 0.0)
        return c * 0.5 + out * 1e-9

    chain("prep(sort+plan+boundary)", prep, jnp.ones(()),
          pos.x, pos.y, pos.z, k_it=3)

    # Staged pieces for the downstream phases (one jit, then freed as
    # each phase closes over only what it needs).
    @jax.jit
    def stage(px, py, pz):
        dp = mbase.build_dense_prep(st, scene.arrays, V3(px, py, pz),
                                    st.band_nb_wide, B)
        return dp.pos, dp.plan

    pos_s, plan = stage(pos.x, pos.y, pos.z)
    jax.block_until_ready(pos_s.x)
    del pos

    # 2) wide one-shot pass (dense_rho_count) over the CSR plan
    def wide(c, px, py, pz, blk, mask):
        rho, count, flags = bandmat.dense_rho_count(
            V3(px + c * 1e-12, py, pz), h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=B)
        return c * 0.5 + jnp.sum(rho) * 1e-9 + jnp.sum(count) * 1e-9

    chain("dense_rho_count(wide)", wide, jnp.ones(()),
          pos_s.x, pos_s.y, pos_s.z, plan[0], plan[1], k_it=3)

    # flags + tight plan staged
    @jax.jit
    def stage2(px, py, pz, blk, mask):
        _, _, flags = bandmat.dense_rho_count(
            V3(px, py, pz), h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=B)
        tight = bandmat.compact_plan((blk, mask, jnp.zeros((), jnp.int32)),
                                     flags, st.pair_nb)
        return flags, tight

    flags, tight = stage2(pos_s.x, pos_s.y, pos_s.z, plan[0], plan[1])
    jax.block_until_ready(flags)

    # 3) compact_plan alone
    def cplan(c, blk, mask, fl):
        t = bandmat.compact_plan((blk, mask, jnp.zeros((), jnp.int32)),
                                 fl & (c > 0), st.pair_nb)
        return c * 0.5 + jnp.sum(t[0]) * 1e-12

    chain("compact_plan", cplan, jnp.ones(()), plan[0], plan[1], flags,
          k_it=3)

    # 4) split coef build over the tight plan
    def cbuild(c, px, py, pz, blk, mask):
        eng = bandmat.build_split_coef_engine(
            V3(px + c * 1e-12, py, pz), h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=B,
            nbA=st.coef_nbA, capB=st.coef_capB, dtype=dfsph.BAND_DTYPE)
        return c * 0.5 + jnp.sum(eng.s.x) * 1e-9

    chain("split_coef_build", cbuild, jnp.ones(()),
          pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1], k_it=3)

    # 5) dense_viscosity over the tight plan
    def visc(c, px, py, pz, blk, mask):
        p = V3(px, py, pz)
        vel = V3(px * 0 + c, py * 0, pz * 0)
        out = bandmat.dense_viscosity(
            p, vel, px * 0 + 1000.0, h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=B,
            c_s=13.0, alpha=0.08)
        return c * 0.5 + jnp.sum(out.x) * 1e-9

    chain("dense_viscosity", visc, jnp.ones(()),
          pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1], k_it=3)


def mode_mv():
    scene = scene_1m()
    st = scene.static
    pos = hot_pos(scene)
    B = st.band_B
    variants = os.environ.get(
        "VARIANTS", f"{st.coef_nbA}:{st.coef_capB}").split(",")

    @jax.jit
    def stage(px, py, pz):
        dp = mbase.build_dense_prep(st, scene.arrays, V3(px, py, pz),
                                    st.band_nb_wide, B,
                                    want_bterms=False)
        _, _, flags = bandmat.dense_rho_count(
            dp.pos, h=st.h, m=st.particle_m, plan=dp.plan, B=B)
        tight = bandmat.compact_plan(dp.plan, flags, st.pair_nb)
        return dp.pos, tight

    pos_s, tight = stage(pos.x, pos.y, pos.z)
    jax.block_until_ready(pos_s.x)
    del pos

    for var in variants:
        nbA, capB = (int(v) for v in var.split(":"))

        @jax.jit
        def build(px, py, pz, blk, mask):
            return bandmat.build_split_coef_engine(
                V3(px, py, pz), h=st.h, m=st.particle_m,
                plan=(blk, mask, jnp.zeros((), jnp.int32)), B=B,
                nbA=nbA, capB=capB, dtype=dfsph.BAND_DTYPE)

        seng = build(pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1])
        jax.block_until_ready(seng.s.x)
        over = int(seng.overflow)
        leaves, treedef = jax.tree_util.tree_flatten(seng)

        def mv_pair(k, *lv):
            e = jax.tree_util.tree_unflatten(treedef, lv)
            mv, mvd = bandmat.split_coef_matvec_ops(e, st.n_fluid, B)
            u = mv(k)
            return mvd(u) * 1e-3

        dt = chain(f"mv_pair nbA={nbA} capB={capB} (overflow={over})",
                   mv_pair, jnp.ones((st.n_fluid,), jnp.float32), *leaves,
                   k_it=8)
        del seng, leaves


if __name__ == "__main__":
    print("device:", jax.devices(), "mode:", MODE, flush=True)
    {"evolve": mode_evolve, "dist": mode_dist, "phases": mode_phases,
     "mv": mode_mv}[MODE]()
    print("done", flush=True)
