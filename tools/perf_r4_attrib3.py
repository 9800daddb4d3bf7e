"""Round-4 probe: inside build_dense_prep at 1M (714 ms per attrib2).

Cumulative DCE-proof prefixes: argsort -> searchsorted/starts ->
plan_from_csr (intervals + dedupe) -> boundary windows -> boundary terms.

    timeout 3000 python -u tools/perf_r4_attrib3.py
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
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu.scene import RHO_0


def main():
    print("device:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    scene = build_scene(cfg)
    st = scene.static
    arrays = scene.arrays
    state = dfsph.init_state(scene)
    step0 = jax.jit(functools.partial(dfsph.step, st))
    for _ in range(4):
        state = step0(scene.arrays, state)
    _ = float(jnp.sum(state.fluid.pos.x))
    print("hot state ready", flush=True)
    fp = state.fluid.pos
    n = st.n_fluid
    B = st.band_B
    QB = -(-n // B)

    def prefix(depth, px, py, pz, c):
        pos = V3(px + c * 1e-12, py, pz)
        cid = nb.cell_id(pos, st.grid)
        chk = jnp.sum(cid).astype(jnp.float32)
        if depth == 0:
            return chk
        perm = jnp.argsort(cid, stable=True).astype(jnp.int32)
        chk += jnp.sum(perm).astype(jnp.float32)
        if depth == 1:
            return chk
        pos_s = pos.take(perm)
        scid = cid[perm]
        starts = jnp.searchsorted(
            scid, jnp.arange(st.grid.num_cells + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        chk += jnp.sum(pos_s.x) + jnp.sum(starts).astype(jnp.float32)
        if depth == 2:
            return chk
        qcells = jnp.pad(scid, (0, QB * B - n), mode="edge").reshape(QB, B)
        lo, hi = bandmat.csr_intervals(qcells, starts, st.grid)
        chk += jnp.sum(lo).astype(jnp.float32) \
            + jnp.sum(hi).astype(jnp.float32)
        if depth == 3:
            return chk
        nblocks = -(-n // bandmat.BLOCK)
        plan = bandmat.plan_from_intervals(
            lo, hi, nblocks_src=nblocks, nbcap=st.band_nb_wide)
        chk += jnp.sum(plan[0]).astype(jnp.float32)
        if depth == 4:
            return chk
        bwin = bandmat.build_boundary_windows(
            qcells, arrays.boundary_pos, arrays.boundary_volume,
            arrays.boundary_table, st.grid, nbcap=st.bband_nb,
            cap=min(st.bq_cap, QB))
        chk += jnp.sum(bwin.gidx).astype(jnp.float32)
        if depth == 5:
            return chk
        bterms = bandmat.dense_boundary_terms(
            pos_s, qcells, arrays.boundary_pos, arrays.boundary_volume,
            arrays.boundary_table, st.grid, h=st.h, rho0=float(RHO_0),
            nbcap=st.bband_nb, B=B, cap=st.bq_cap, bw=bwin)
        return chk + jnp.sum(bterms.rho) + jnp.sum(bterms.s.x) \
            + jnp.sum(bterms.qsum) + jnp.sum(bterms.g2)

    names = ["cell_id", "+argsort", "+take/searchsorted",
             "+csr_intervals", "+plan_from_intervals(dedupe)",
             "+boundary_windows", "+boundary_terms"]
    prev = 0.0
    for depth in range(7):
        f = jax.jit(functools.partial(prefix, depth))
        out = f(fp.x, fp.y, fp.z, jnp.ones(()))
        _ = float(out)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            out = f(fp.x, fp.y, fp.z, jnp.float32(1.0 + i))
            _ = float(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        print(f"depth {depth} {names[depth]:32s}: cum {wall:7.1f} ms "
              f"(delta {wall - prev:6.1f})", flush=True)
        prev = wall
    print("done", flush=True)


if __name__ == "__main__":
    main()
