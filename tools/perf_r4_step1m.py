"""Round-4 probe: real 1M DFSPH hot-phase step rate + phase breakdown.

The scene is breaking_dam_1m with a -3 m/s impact seed (config
fluid.initial_velocity): the column compresses within a few steps, so the
density/divergence loops rail like the evolved dam without simulating the
whole free fall. Reports per-step wall (scalar-synced; steps are long
enough that the ~26 ms tunnel RTT is noise), solver iteration counts, and
chained phase timings for build_dense_engine and the matvec pair.

    timeout 3000 python -u tools/perf_r4_step1m.py
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
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops.vec import V3

WARM = int(os.environ.get("WARM", "8"))
REPS = int(os.environ.get("REPS", "6"))
PHASES = os.environ.get("PHASES", "1") == "1"


def main():
    print("device:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    t0 = time.perf_counter()
    scene = build_scene(cfg)
    st = scene.static
    print(f"scene built in {time.perf_counter()-t0:.0f}s: n={st.n_fluid} "
          f"band_B={st.band_B} pair_nb={st.pair_nb} coef_nbA={st.coef_nbA} "
          f"capB={st.coef_capB} wide={st.band_nb_wide} bq={st.bq_cap}",
          flush=True)
    state = dfsph.init_state(scene)
    step = jax.jit(functools.partial(dfsph.step, st))

    t0 = time.perf_counter()
    for i in range(WARM):
        state = step(scene.arrays, state)
        s = float(jnp.sum(state.fluid.pos.x))
        print(f"warm {i}: t={float(state.t):.4f} "
              f"diag={np.asarray(state.diag).round(2)} "
              f"overflow={int(state.overflow)} "
              f"wall={time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    iters = 0.0
    for i in range(REPS):
        state = step(scene.arrays, state)
        s = float(jnp.sum(state.fluid.pos.x))
        d = np.asarray(state.diag)
        iters += float(d[0] + d[2])
    wall = time.perf_counter() - t0
    print(f"HOT: {REPS/wall:.3f} steps/s ({wall/REPS*1e3:.0f} ms/step), "
          f"avg iters/step={iters/REPS:.1f}, "
          f"last diag={np.asarray(state.diag).round(2)}, "
          f"overflow={int(state.overflow)}", flush=True)

    if not PHASES:
        return
    # --- phase breakdown on the CURRENT (hot) state -----------------------
    fluid_pos = state.fluid.pos

    def chain(name, fn, x0, *consts, k_it=5):
        run = jax.jit(lambda x, *cs: jax.lax.fori_loop(
            0, k_it, lambda i, c: fn(c, *cs), x))
        out = run(x0, *consts)
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        out = run(x0, *consts)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0 - 0.026) / k_it
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        return dt

    # Full dense-engine build (sort + plans + dense terms + coef build +
    # boundary windows), chained by nudging positions by the carry.
    def eng_build(c, px, py, pz):
        pos = V3(px + c * 1e-12, py, pz)
        eng = dfsph.build_dense_engine(st, scene.arrays, pos)
        return c * 0.5 + jnp.sum(eng.rho_f) * 1e-9

    chain("build_dense_engine (one-shot/step)", eng_build,
          jnp.ones(()), fluid_pos.x, fluid_pos.y, fluid_pos.z, k_it=3)

    # The prep half alone (sort + CSR plan + boundary windows + bterms).
    def prep_build(c, px, py, pz):
        pos = V3(px + c * 1e-12, py, pz)
        from cfd_taichi_tpu.models import base as mbase
        dp = mbase.build_dense_prep(st, scene.arrays, pos,
                                    st.band_nb_wide, st.band_B)
        out = jnp.sum(dp.pos.x) + (jnp.sum(dp.bterms.rho)
                                   if dp.bterms is not None else 0.0)
        return c * 0.5 + out * 1e-9

    chain("build_dense_prep (sort+plan+boundary)", prep_build,
          jnp.ones(()), fluid_pos.x, fluid_pos.y, fluid_pos.z, k_it=3)

    # Matvec pair on the real engine (the per-iteration cost). DenseEngine
    # holds callables, so build the raw pieces (pos, plan, split engine)
    # under one jit and re-derive the ops inside the chained body.
    from cfd_taichi_tpu.models import base as mbase

    def build_pieces(px, py, pz):
        pos = V3(px, py, pz)
        dp = mbase.build_dense_prep(st, scene.arrays, pos,
                                    st.band_nb_wide, st.band_B)
        dterms = bandmat.dense_dfsph_terms(
            dp.pos, h=st.h, m=st.particle_m, plan=dp.plan, B=st.band_B)
        plan = bandmat.compact_plan(dp.plan, dterms.blk_pair, st.pair_nb)
        if st.coef_nbA and st.coef_nbA < st.pair_nb:
            seng = bandmat.build_split_coef_engine(
                dp.pos, h=st.h, m=st.particle_m, plan=plan, B=st.band_B,
                nbA=st.coef_nbA, capB=st.coef_capB, dtype=dfsph.BAND_DTYPE)
        else:
            seng = bandmat.build_coef_engine(
                dp.pos, h=st.h, m=st.particle_m, plan=plan, B=st.band_B,
                dtype=dfsph.BAND_DTYPE)
        return seng, plan, dp.pos, dterms.rho

    seng, plan, pos_s, rho_f = jax.jit(build_pieces)(
        fluid_pos.x, fluid_pos.y, fluid_pos.z)
    jax.block_until_ready(pos_s.x)
    split = isinstance(seng, bandmat.SplitCoefEngine)
    leaves, treedef = jax.tree_util.tree_flatten((seng, plan, pos_s, rho_f))

    def ops_of(e):
        if split:
            return bandmat.split_coef_matvec_ops(e, st.n_fluid, st.band_B)
        return bandmat.coef_matvec_ops(e, st.n_fluid, st.band_B)

    def mv_pair(k, *lv):
        e, _, _, _ = jax.tree_util.tree_unflatten(treedef, lv)
        mv, mvd = ops_of(e)
        u = mv(k)
        return mvd(u) * 1e-3

    chain("matvec + matvec_dot (per solver iteration)", mv_pair,
          jnp.ones((st.n_fluid,), jnp.float32), *leaves, k_it=10)

    def visc(c, *lv):
        _, plan_, pos_, rho_ = jax.tree_util.tree_unflatten(treedef, lv)
        vel = V3(pos_.x * 0 + c, pos_.y * 0, pos_.z * 0)
        out = bandmat.dense_viscosity(
            pos_, vel, rho_ + 1000.0, h=st.h, m=st.particle_m,
            plan=plan_, B=st.band_B, c_s=13.0, alpha=0.08)
        return c * 0.5 + jnp.sum(out.x) * 1e-9

    chain("dense_viscosity pass", visc, jnp.ones(()), *leaves, k_it=3)
    print("done", flush=True)


if __name__ == "__main__":
    main()
