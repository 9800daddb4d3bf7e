"""Round-3 probe #5 (fixed): 1M DFSPH step cost breakdown.

Engines are passed as jit ARGUMENTS (the first version closed jits over a
6.4 GB CoefEngine, which baked it into the program as captured constants
and stalled compilation).

    nohup python tools/perf_probe5.py > /tmp/perf_probe5.log 2>&1 &
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops import bandmat, neighbors as nb
from cfd_taichi_tpu.ops.vec import V3

CONFIG = os.environ.get("CONFIG", "breaking_dam_1m.json")
WARM_STEPS = int(os.environ.get("WARM_STEPS", "30"))


def sync_time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        _ = float(jnp.sum(leaves[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", CONFIG))
    import dataclasses
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name="dfsph"))
    scene = build_scene(cfg)
    st, arrays = scene.static, scene.arrays
    n = st.n_fluid
    print(f"n={n} band_B={st.band_B} band_nb={st.band_nb} "
          f"pair_nb={st.pair_nb} band_nb_wide={st.band_nb_wide} "
          f"bband_nb={st.bband_nb} K={st.K} bK={st.bK}", flush=True)

    state = dfsph.init_state(scene)
    step = jax.jit(functools.partial(dfsph.step, st, arrays))
    for _ in range(WARM_STEPS):
        state = step(state)
    jax.block_until_ready(state.fluid.pos.x)
    print(f"advanced: t={float(state.t):.4f} dt={float(state.dt):.2e} "
          f"diag={np.asarray(state.diag)}", flush=True)
    pos, rpos = state.fluid.pos, state.rigid.pos

    t = sync_time(step, state)
    print(f"full dfsph step: {t*1e3:.1f} ms", flush=True)

    # --- build path breakdown ------------------------------------------------
    bn = jax.jit(lambda p, rp: mbase.build_nbh(st, arrays, p, rp))
    t = sync_time(bn, pos, rpos)
    print(f"build_nbh (compact): {t*1e3:.1f} ms", flush=True)
    nbh = bn(pos, rpos)

    @jax.jit
    def sort_only(p):
        cid = nb.cell_id(p, st.grid)
        perm = jnp.argsort(cid, stable=True).astype(jnp.int32)
        pos_s = p.take(perm)
        scid = cid[perm]
        starts = jnp.searchsorted(
            scid, jnp.arange(st.grid.num_cells + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        return pos_s, perm, starts, scid

    t = sync_time(sort_only, pos)
    print(f"  sort+csr offsets: {t*1e3:.1f} ms", flush=True)
    pos_s, perm, starts, scid = sort_only(pos)

    @jax.jit
    def plan_only(scid_, starts_):
        QB = -(-n // st.band_B)
        qcells = jnp.pad(scid_, (0, QB * st.band_B - n),
                         mode="edge").reshape(QB, st.band_B)
        return bandmat.plan_from_csr(qcells, starts_, st.grid,
                                     st.band_nb_wide)

    t = sync_time(plan_only, scid, starts)
    print(f"  plan_from_csr (wide): {t*1e3:.1f} ms", flush=True)

    bl_f = jax.jit(lambda p: nb.find_neighbors_grouped(
        p, None, arrays.boundary_pos, arrays.boundary_table,
        st.grid, K=st.bK, nbcap=st.bband_nb, B=st.band_B)[0])
    t = sync_time(bl_f, pos_s)
    print(f"  boundary find_neighbors_grouped (bK={st.bK}): {t*1e3:.1f} ms",
          flush=True)

    dpf = jax.jit(lambda p: mbase.build_dense_prep(
        st, arrays, p, st.band_nb_wide, st.band_B))
    t = sync_time(dpf, pos)
    print(f"build_dense_prep total: {t*1e3:.1f} ms", flush=True)
    dp = dpf(pos)

    # --- loop engine costs (engine passed as an argument) --------------------
    ce = jax.jit(lambda p, plan: bandmat.build_coef_engine(
        p, h=st.h, m=st.particle_m, plan=plan, B=st.band_B,
        dtype=dfsph.BAND_DTYPE))
    t = sync_time(ce, nbh.pos, nbh.plan)
    print(f"build_coef_engine (csr nb={st.band_nb}): {t*1e3:.1f} ms",
          flush=True)
    ceng = ce(nbh.pos, nbh.plan)

    mv_j = jax.jit(lambda e, k_: bandmat.coef_matvec_ops(e, n, st.band_B)[0](k_))
    mvd_j = jax.jit(lambda e, v_: bandmat.coef_matvec_ops(e, n, st.band_B)[1](v_))
    k = jnp.ones((n,), jnp.float32) * 1e-4
    v = V3(k, k, k)
    t = sync_time(mv_j, ceng, k)
    print(f"coef matvec (csr): {t*1e3:.1f} ms", flush=True)
    t = sync_time(mvd_j, ceng, v)
    print(f"coef matvec_dot (csr): {t*1e3:.1f} ms", flush=True)

    # --- one-shot terms: gather vs dense -------------------------------------
    rho_f = jax.jit(lambda _nbh: mbase.nbh_rho(st, _nbh))
    t = sync_time(rho_f, nbh)
    print(f"nbh_rho (gather): {t*1e3:.1f} ms", flush=True)
    rho = rho_f(nbh)

    tens_f = jax.jit(lambda _nbh: mbase.nbh_tension(st, _nbh, 0.5))
    t = sync_time(tens_f, nbh)
    print(f"nbh_tension (gather): {t*1e3:.1f} ms", flush=True)

    vel_s = state.fluid.vel.take(nbh.perm)
    visc_f = jax.jit(lambda _nbh, vel, r, oid: mbase.nbh_viscosity(
        st, _nbh, vel, r, state.rigid, c_s=13.0, alpha=0.08, oid=oid))
    t = sync_time(visc_f, nbh, vel_s, rho, state.fluid.oid[nbh.perm])
    print(f"nbh_viscosity (gather): {t*1e3:.1f} ms", flush=True)

    drc = jax.jit(lambda p, plan: bandmat.dense_rho_count(
        p, h=st.h, m=st.particle_m, plan=plan, B=st.band_B))
    t = sync_time(drc, dp.pos, dp.plan)
    print(f"dense_rho_count (wide nb={st.band_nb_wide}): {t*1e3:.1f} ms",
          flush=True)
    _, _, blk_pair = drc(dp.pos, dp.plan)

    cp = jax.jit(lambda plan, bp: bandmat.compact_plan(plan, bp, st.pair_nb))
    t = sync_time(cp, dp.plan, blk_pair)
    print(f"compact_plan: {t*1e3:.1f} ms", flush=True)
    tight = cp(dp.plan, blk_pair)

    dv = jax.jit(lambda p, vl, r, plan: bandmat.dense_viscosity(
        p, vl, r, h=st.h, m=st.particle_m, plan=plan, B=st.band_B,
        c_s=13.0, alpha=0.08))
    t = sync_time(dv, dp.pos, vel_s, rho, tight)
    print(f"dense_viscosity (tight nb={st.pair_nb}): {t*1e3:.1f} ms",
          flush=True)

    t = sync_time(ce, dp.pos, tight)
    print(f"build_coef_engine (tight nb={st.pair_nb}): {t*1e3:.1f} ms",
          flush=True)
    ceng2 = ce(dp.pos, tight)
    t = sync_time(mv_j, ceng2, k)
    print(f"coef matvec (tight): {t*1e3:.1f} ms", flush=True)
    t = sync_time(mvd_j, ceng2, v)
    print(f"coef matvec_dot (tight): {t*1e3:.1f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
