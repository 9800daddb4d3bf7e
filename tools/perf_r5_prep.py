"""Round-5 probe: sub-phase attribution of the hot-1M `build_dense_prep`
(prep_ms 183 of a ~450 ms step after the plane-rhs matvec fix — now the
top phase). Times each constituent on the TPU, sequential dispatch with
scalar sync, RTT-subtracted:

    cellid_ms   nb.cell_id over the raw positions
    sort_ms     stable argsort of the (N,) cell ids
    gather_ms   pos.take(perm) (3 f32 lanes)
    csr_ms      searchsorted(scid, arange(num_cells+1), method='sort')
    plan_ms     plan_from_csr (interval union + dedupe sort)
    bwin_ms     build_boundary_windows (near-group select + windows)
    bterms_ms   dense_boundary_terms given prebuilt windows

Usage: timeout 1200 python -u tools/perf_r5_prep.py [hot_pos.npy]
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
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops.vec import V3


def measure_rtt() -> float:
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    for _ in range(4):
        float(jnp.sum(f(x)))
    return (time.perf_counter() - t0) / 4


def timed(name, fn, *args, reps=4, rtt=0.0, res=None):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32).ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32).ravel()[:1]))
    dt = max((time.perf_counter() - t0 - rtt) / reps, 0.0)
    res[name] = round(dt * 1e3, 1)
    print(name, res[name], file=sys.stderr, flush=True)
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
    rtt = measure_rtt()
    res = {"rtt_ms": round(rtt * 1e3, 1),
           "num_cells": int(st.grid.num_cells), "n": int(st.n_fluid),
           "B": st.band_B, "pair_nb": st.pair_nb,
           "wide": st.band_nb_wide, "bq": st.bq_cap,
           "bband_nb": st.bband_nb}

    B, nbcap = st.band_B, st.band_nb_wide
    n = st.n_fluid
    QB = -(-n // B)

    cid = timed("cellid_ms", jax.jit(
        lambda px, py, pz: nb.cell_id(V3(px, py, pz), st.grid)),
        pos.x, pos.y, pos.z, rtt=rtt, res=res)
    perm = timed("sort_ms", jax.jit(
        lambda c: jnp.argsort(c, stable=True).astype(jnp.int32)),
        cid, rtt=rtt, res=res)
    pos_s = timed("gather_ms", jax.jit(
        lambda px, py, pz, p: V3(px, py, pz).take(p)),
        pos.x, pos.y, pos.z, perm, rtt=rtt, res=res)
    scid = cid[perm]
    jax.block_until_ready(scid)
    starts = timed("csr_ms", jax.jit(
        lambda s: jnp.searchsorted(
            s, jnp.arange(st.grid.num_cells + 1, dtype=jnp.int32),
            side="left", method="sort").astype(jnp.int32)),
        scid, rtt=rtt, res=res)

    pad = jnp.pad(scid, (0, QB * B - n), mode="edge")
    qcells = pad.reshape(QB, B)
    jax.block_until_ready(qcells)
    timed("plan_ms", jax.jit(
        lambda qc, s: bandmat.plan_from_csr(qc, s, st.grid, nbcap)[0]),
        qcells, starts, rtt=rtt, res=res)

    bwin = timed("bwin_ms", jax.jit(
        lambda qc: bandmat.build_boundary_windows(
            qc, scene.arrays.boundary_pos, scene.arrays.boundary_volume,
            scene.arrays.boundary_table, st.grid, nbcap=st.bband_nb,
            cap=min(st.bq_cap, QB))),
        qcells, rtt=rtt, res=res)
    timed("bterms_ms", jax.jit(
        lambda px, py, pz, qc, bw: bandmat.dense_boundary_terms(
            V3(px, py, pz), qc, scene.arrays.boundary_pos,
            scene.arrays.boundary_volume, scene.arrays.boundary_table,
            st.grid, h=st.h, rho0=1000.0, nbcap=st.bband_nb, B=B,
            cap=st.bq_cap, bw=bw).rho),
        pos_s.x, pos_s.y, pos_s.z, qcells, bwin, rtt=rtt, res=res)

    # The whole thing fused (what the step actually runs) for comparison.
    timed("prep_all_ms", jax.jit(
        lambda px, py, pz: mbase.build_dense_prep(
            st, scene.arrays, V3(px, py, pz), nbcap, B).pos.x),
        pos.x, pos.y, pos.z, rtt=rtt, res=res)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
