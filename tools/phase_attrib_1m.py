"""Per-phase attribution of the hot 1M DFSPH step (VERDICT r04 item 1).

Run as a SUBPROCESS by bench.py (isolation: engine buffers never coexist
with another program's compiled step executables — the r4 all-in-one probe
OOM'd that way) on the checkpointed hot state the bench itself timed.
Prints ONE json line with scalar-synced per-phase milliseconds:

    prep_ms        cell sort + CSR plan + boundary windows/terms
    wide_rho_ms    dense_rho_count over the wide CSR cover
    compact_ms     pair-tight plan compaction
    coef_build_ms  split-bucket coefficient engine build
    visc_ms        dense_viscosity over the tight plan
    mv_pair_ms     one solver-loop matvec + matvec_dot pair

All matvec timings are sequential dispatches (NOT a fori_loop — loop
carries force XLA to copy the multi-GB engine tensors per iteration,
which is both wrong-as-a-model and an OOM). The tunnel dispatch+fetch
floor (RTT) is measured in-process and subtracted.

Usage: python tools/phase_attrib_1m.py /path/to/hot_pos.npy
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

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops.vec import V3


def measure_rtt() -> float:
    """Dispatch + scalar-fetch floor through the TPU tunnel."""
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    for _ in range(4):
        float(jnp.sum(f(x)))
    return (time.perf_counter() - t0) / 4


def timed(fn, *args, reps=3, rtt=0.0):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return max((time.perf_counter() - t0 - rtt) / reps, 0.0), out


def main():
    pos_path = sys.argv[1]
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
           "caps": {"pair_nb": st.pair_nb, "wide": st.band_nb_wide,
                    "nbA": st.coef_nbA, "capB": st.coef_capB,
                    "bq": st.bq_cap}}

    # 1) prep: sort + CSR plan + boundary windows/terms. EVERY output
    # the step consumes must feed the returned scalar — the r4 form
    # dropped dp.plan, and XLA dead-code-eliminated the entire plan
    # build out of the measurement (~280 ms at 1M, found by
    # tools/perf_r5_prep.py when its standalone plan timing dwarfed the
    # "whole prep" number).
    def prep(px, py, pz):
        dp = mbase.build_dense_prep(st, scene.arrays, V3(px, py, pz),
                                    st.band_nb_wide, st.band_B)
        keep = (jnp.sum(dp.pos.x) + jnp.sum(dp.plan[0])
                + jnp.sum(dp.starts[::64]))
        if dp.bterms is not None:
            keep = keep + jnp.sum(dp.bterms.rho) + jnp.sum(dp.bterms.qsum)
        if dp.bwin is not None:
            keep = keep + jnp.sum(dp.bwin.blk)
        return keep

    dt, _ = timed(jax.jit(prep), pos.x, pos.y, pos.z, rtt=rtt)
    res["prep_ms"] = round(dt * 1e3, 1)
    print("prep_ms", res["prep_ms"], file=sys.stderr, flush=True)

    stage = jax.jit(lambda px, py, pz: (
        lambda dp: (dp.pos, dp.plan))(mbase.build_dense_prep(
            st, scene.arrays, V3(px, py, pz), st.band_nb_wide,
            st.band_B, want_bterms=False)))
    pos_s, plan = stage(pos.x, pos.y, pos.z)
    jax.block_until_ready(pos_s.x)
    del pos

    # 2) wide one-shot rho pass (split-bucket when the scene is — the
    # live build_dense_engine route)
    def wide(px, py, pz, blk, mask):
        if st.coef_nbA and st.coef_nbA < st.band_nb_wide:
            rho, count, flags, _ = bandmat.dense_rho_count_split(
                V3(px, py, pz), h=st.h, m=st.particle_m,
                plan=(blk, mask, jnp.zeros((), jnp.int32)), B=st.band_B,
                nbA=st.coef_nbA, capB=st.coef_capB)
        else:
            rho, count, flags = bandmat.dense_rho_count(
                V3(px, py, pz), h=st.h, m=st.particle_m,
                plan=(blk, mask, jnp.zeros((), jnp.int32)), B=st.band_B)
        # Tuple output so the flags the step actually consumes are not
        # dead-code-eliminated from the measurement.
        return rho, count, flags

    dt, _ = timed(jax.jit(wide), pos_s.x, pos_s.y, pos_s.z, plan[0],
                  plan[1], rtt=rtt)
    res["wide_rho_ms"] = round(dt * 1e3, 1)
    print("wide_rho_ms", res["wide_rho_ms"], file=sys.stderr, flush=True)

    stage2 = jax.jit(lambda px, py, pz, blk, mask: (
        lambda flags: bandmat.compact_plan(
            (blk, mask, jnp.zeros((), jnp.int32)), flags, st.pair_nb))(
        bandmat.dense_rho_count(
            V3(px, py, pz), h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=st.band_B)[2]))
    tight = stage2(pos_s.x, pos_s.y, pos_s.z, plan[0], plan[1])
    jax.block_until_ready(tight[0])

    # 3) compact_plan alone
    def cplan(px, blk, mask, fl):
        return bandmat.compact_plan(
            (blk, mask, jnp.zeros((), jnp.int32)),
            fl & (px[0] < 1e30), st.pair_nb)[0]

    flags_stage = jax.jit(lambda px, py, pz, blk, mask: bandmat.dense_rho_count(
        V3(px, py, pz), h=st.h, m=st.particle_m,
        plan=(blk, mask, jnp.zeros((), jnp.int32)), B=st.band_B)[2])
    flags = flags_stage(pos_s.x, pos_s.y, pos_s.z, plan[0], plan[1])
    dt, _ = timed(jax.jit(cplan), pos_s.x, plan[0], plan[1], flags, rtt=rtt)
    res["compact_ms"] = round(dt * 1e3, 1)
    print("compact_ms", res["compact_ms"], file=sys.stderr, flush=True)
    del flags

    # 4) split-bucket coefficient engine build over the tight plan
    def cbuild(px, py, pz, blk, mask):
        eng = bandmat.build_split_coef_engine(
            V3(px, py, pz), h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=st.band_B,
            nbA=st.coef_nbA, capB=st.coef_capB, dtype=dfsph.BAND_DTYPE)
        return eng.s.x

    dt, _ = timed(jax.jit(cbuild), pos_s.x, pos_s.y, pos_s.z, tight[0],
                  tight[1], rtt=rtt)
    res["coef_build_ms"] = round(dt * 1e3, 1)
    print("coef_build_ms", res["coef_build_ms"], file=sys.stderr, flush=True)

    # 5) dense viscosity over the tight plan (split-bucket when the
    # scene is — models/dfsph.dense_visc's route)
    def visc(px, py, pz, blk, mask):
        p = V3(px, py, pz)
        vel = V3(px * 0 + 1.0, py * 0, pz * 0)
        plan_t = (blk, mask, jnp.zeros((), jnp.int32))
        if st.coef_nbA and st.coef_nbA < st.pair_nb:
            return bandmat.dense_viscosity_split(
                p, vel, px * 0 + 1000.0, h=st.h, m=st.particle_m,
                plan=plan_t, B=st.band_B, c_s=13.0, alpha=0.08,
                nbA=st.coef_nbA, capB=st.coef_capB).x
        return bandmat.dense_viscosity(
            p, vel, px * 0 + 1000.0, h=st.h, m=st.particle_m,
            plan=plan_t, B=st.band_B, c_s=13.0, alpha=0.08).x

    dt, _ = timed(jax.jit(visc), pos_s.x, pos_s.y, pos_s.z, tight[0],
                  tight[1], rtt=rtt)
    res["visc_ms"] = round(dt * 1e3, 1)
    print("visc_ms", res["visc_ms"], file=sys.stderr, flush=True)

    # 6) one solver-loop matvec + matvec_dot pair (sequential dispatch,
    # engine passed as jit args — no loop carries).
    build = jax.jit(lambda px, py, pz, blk, mask:
                    bandmat.build_split_coef_engine(
                        V3(px, py, pz), h=st.h, m=st.particle_m,
                        plan=(blk, mask, jnp.zeros((), jnp.int32)),
                        B=st.band_B, nbA=st.coef_nbA, capB=st.coef_capB,
                        dtype=dfsph.BAND_DTYPE))
    seng = build(pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1])
    jax.block_until_ready(seng.s.x)
    leaves, treedef = jax.tree_util.tree_flatten(seng)

    @jax.jit
    def mv_pair(k, *lv):
        e = jax.tree_util.tree_unflatten(treedef, lv)
        mv, mvd = bandmat.split_coef_matvec_ops(e, st.n_fluid, st.band_B)
        return mvd(mv(k)) * 1e-3

    k = jnp.ones((st.n_fluid,), jnp.float32)
    k = mv_pair(k, *leaves)
    _ = float(jnp.sum(k))
    reps = 4
    t0 = time.perf_counter()
    for _i in range(reps):
        k = mv_pair(k, *leaves)
    _ = float(jnp.sum(k))
    res["mv_pair_ms"] = round(
        max((time.perf_counter() - t0 - rtt) / reps, 0.0) * 1e3, 1)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
