"""Round-3 probe #4: 30k step cost breakdown + grouped-vs-prune build.

Times (scalar-synced, dispatch floor subtracted):
  1. build_nbh (per-query stencil-prune engine) — the suspected ~70 ms
  2. build_nbh with the grouped-window engine forced
  3. cell table + pack alone
  4. fluid find_neighbors alone; boundary find_neighbors alone
  5. one full WCSPH step; one full DFSPH step
  6. coef-engine matvec vs band matvec at 30k

    nohup python tools/perf_probe4.py > /tmp/perf_probe4.log 2>&1 &
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

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph, wcsph
from cfd_taichi_tpu.ops import bandmat, neighbors as nb
from cfd_taichi_tpu.ops.vec import V3

FLOOR = 0.0


def sync_time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        _ = float(jnp.sum(leaves[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] - FLOOR


def main():
    global FLOOR
    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def null(x):
        return jnp.sum(x)

    z = jnp.zeros((8,), jnp.float32)
    null(z)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = float(null(z))
        ts.append(time.perf_counter() - t0)
    FLOOR = sorted(ts)[3]
    print(f"floor: {FLOOR*1e3:.1f} ms", flush=True)

    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_30k.json"))
    scene = build_scene(cfg)
    st = scene.static
    print(f"n={st.n_fluid} K={st.K} cell_cap={st.cell_cap} k2={st.k2} "
          f"bK={st.bK} bk2={st.bk2} band_nb={st.band_nb} "
          f"bband_nb={st.bband_nb} pair_nb={st.pair_nb}", flush=True)

    # Evolve into the hot phase with DFSPH (cache-hit compile).
    step = jax.jit(functools.partial(dfsph.step, st))
    state = dfsph.init_state(scene)
    for i in range(120):
        state = step(scene.arrays, state)
        if i % 40 == 39:
            _ = float(state.t)
    print(f"hot: t={float(state.t):.4f} diag={np.asarray(state.diag)}",
          flush=True)
    fpos, rpos = state.fluid.pos, state.rigid.pos

    # 1/2. full build_nbh, both engines
    bn = jax.jit(functools.partial(mbase.build_nbh, st, scene.arrays))
    print(f"build_nbh[prune]: {sync_time(bn, fpos, rpos)*1e3:.1f} ms",
          flush=True)
    mbase.GROUPED_BUILD_MIN_N = 0
    bg = jax.jit(functools.partial(mbase.build_nbh, st, scene.arrays))
    print(f"build_nbh[grouped]: {sync_time(bg, fpos, rpos)*1e3:.1f} ms",
          flush=True)
    mbase.GROUPED_BUILD_MIN_N = 150_000

    # 3. cell table + pack
    @jax.jit
    def table_pack(p):
        perm = jnp.argsort(nb.cell_id(p, st.grid), stable=True)
        ps = p.take(perm.astype(jnp.int32))
        t = nb.build_cell_table(ps, st.grid)
        packed, sepairs = nb.pack_table(ps, t)
        return packed, sepairs

    print(f"table+pack: {sync_time(table_pack, fpos)*1e3:.1f} ms", flush=True)

    # 4. fluid / boundary lists alone (sorted inputs fixed)
    perm = jnp.argsort(nb.cell_id(fpos, st.grid), stable=True)
    ps = fpos.take(perm.astype(jnp.int32))
    table = nb.build_cell_table(ps, st.grid)
    qid = jnp.arange(st.n_fluid, dtype=jnp.int32)

    fl = jax.jit(lambda p: nb.find_neighbors(
        p, qid, p, nb.build_cell_table(p, st.grid), st.grid, K=st.K,
        cell_cap=st.cell_cap, exclude_self=True, k2=st.k2))
    print(f"fluid find_neighbors[prune]: {sync_time(fl, ps)*1e3:.1f} ms",
          flush=True)

    bl = jax.jit(lambda p: nb.find_neighbors(
        p, None, scene.arrays.boundary_pos, scene.arrays.boundary_table,
        st.grid, K=st.bK, cell_cap=st.bcell_cap, k2=st.bk2))
    print(f"boundary find_neighbors[prune]: {sync_time(bl, ps)*1e3:.1f} ms",
          flush=True)

    glf = jax.jit(lambda p: nb.find_neighbors_grouped(
        p, qid, p, nb.build_cell_table(p, st.grid), st.grid, K=st.K,
        nbcap=st.band_nb, B=st.band_B, exclude_self=True)[0].idx)
    print(f"fluid find_neighbors[grouped]: {sync_time(glf, ps)*1e3:.1f} ms",
          flush=True)

    glb = jax.jit(lambda p: nb.find_neighbors_grouped(
        p, None, scene.arrays.boundary_pos, scene.arrays.boundary_table,
        st.grid, K=st.bK, nbcap=st.bband_nb, B=st.band_B)[0].idx)
    print(f"boundary find_neighbors[grouped]: {sync_time(glb, ps)*1e3:.1f} ms",
          flush=True)

    # 5. full steps
    wstep = jax.jit(functools.partial(wcsph.step, st))
    wstate = wcsph.init_state(scene)._replace(fluid=state.fluid)
    print(f"wcsph step: {sync_time(wstep, scene.arrays, wstate)*1e3:.1f} ms",
          flush=True)
    print(f"dfsph step: {sync_time(step, scene.arrays, state)*1e3:.1f} ms",
          flush=True)

    # 6. coef vs band matvec at 30k (same CSR plan)
    nlq, plan = nb.find_neighbors_grouped(
        ps, qid, ps, table, st.grid, K=st.K, nbcap=st.band_nb, B=st.band_B,
        exclude_self=True)
    band = bandmat.build_band(ps, nlq.idx, nlq.mask, h=st.h,
                              m=st.particle_m, nbcap=st.band_nb,
                              B=st.band_B, plan=plan, dtype=jnp.bfloat16)
    ceng = bandmat.build_coef_engine(ps, h=st.h, m=st.particle_m, plan=plan,
                                     B=st.band_B)
    k = jnp.ones((st.n_fluid,), jnp.float32)

    bmv = jax.jit(lambda kk: bandmat.matvec(band, kk).x)
    print(f"band matvec: {sync_time(bmv, k)*1e3:.2f} ms", flush=True)
    cmv_, _ = bandmat.coef_matvec_ops(ceng, st.n_fluid, st.band_B)
    cmv = jax.jit(lambda kk: cmv_(kk).x)
    print(f"coef matvec: {sync_time(cmv, k)*1e3:.2f} ms", flush=True)

    bb = jax.jit(lambda p: bandmat.build_band(
        p, nlq.idx, nlq.mask, h=st.h, m=st.particle_m, nbcap=st.band_nb,
        B=st.band_B, plan=plan, dtype=jnp.bfloat16).ax)
    print(f"band build: {sync_time(bb, ps)*1e3:.1f} ms", flush=True)
    cb = jax.jit(lambda p: bandmat.build_coef_engine(
        p, h=st.h, m=st.particle_m, plan=plan, B=st.band_B).w)
    print(f"coef build: {sync_time(cb, ps)*1e3:.1f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
