"""Round-5 probe: kill the per-iteration plane layout copies the trace
exposed (copy.1807/.1799: ~2.3 ms/matvec of pure bf16 layout movement,
~70 ms/step over 19 iterations at hot 1M).

Facts from the trace (tools/perf_r5_trace.py): XLA already converts the
f32 (4, QB, W) plane rhs to bf16 to feed the MXU (DEFAULT matmul
precision) — so building the plane in bf16 EXPLICITLY is numerically
identical (same rounding point) and halves the gather+copy bytes. And
the window COORDINATES are step-constant — only k changes per matvec —
so the 4-lane gather can become a 1-lane gather times pre-gathered
coordinate planes.

Variants (matvec + matvec_dot each):
    A  current: f32 4-lane plane gather + barrier + einsum (baseline)
    B  bf16 plane: same but plane .astype(bf16) before the barrier
    C  pregathered coord planes (f32) + 1-lane k gather, f32 plane
    D  pregathered coord planes + 1-lane k gather, bf16 plane
    pre_ms: one-time coordinate-plane gather cost (amortized /step)

Usage: timeout 3000 python -u tools/perf_r5_mv5.py [hot_pos.npy]
"""
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


def rtt_s() -> float:
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    for _ in range(4):
        float(jnp.sum(f(x)))
    return (time.perf_counter() - t0) / 4


def bench(name, fn, args, rtt, reps=6):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ms = max((time.perf_counter() - t0 - rtt) / reps, 0.0) * 1e3
    print(f"{name:14s} {ms:8.1f} ms", flush=True)
    return out


def rel(a, b):
    num = max(float(jnp.max(jnp.abs(x - y)))
              for x, y in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b)))
    den = max(float(jnp.max(jnp.abs(x)))
              for x in jax.tree_util.tree_leaves(b))
    print(f"               rel {num / den:.3e}", flush=True)


def main():
    pos_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy"
    rows = np.load(pos_path)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    scene = build_scene(cfg, plan_pos=rows)
    st = scene.static
    pos = V3(jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
             jnp.asarray(rows[:, 2]))
    rtt = rtt_s()
    n = st.n_fluid

    @jax.jit
    def stage(px, py, pz):
        dp = mbase.build_dense_prep(st, scene.arrays, V3(px, py, pz),
                                    st.band_nb_wide, st.band_B,
                                    want_bterms=False)
        _, _, flags = bandmat.dense_rho_count(
            dp.pos, h=st.h, m=st.particle_m, plan=dp.plan, B=st.band_B)
        tight = bandmat.compact_plan(dp.plan, flags, st.pair_nb)
        return dp.pos, tight

    pos_s, tight = stage(pos.x, pos.y, pos.z)
    jax.block_until_ready(pos_s.x)
    del pos

    build = jax.jit(lambda px, py, pz, blk, mask:
                    bandmat.build_split_coef_engine(
                        V3(px, py, pz), h=st.h, m=st.particle_m,
                        plan=(blk, mask, jnp.zeros((), jnp.int32)),
                        B=st.band_B, nbA=st.coef_nbA, capB=st.coef_capB,
                        dtype=dfsph.BAND_DTYPE))
    seng = build(pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1])
    jax.block_until_ready(seng.s.x)
    eng = seng.a
    QB, B, W = eng.w.shape
    nbcap = eng.blkq.shape[1]
    nblocks = eng.tbx.shape[0]
    print(f"QB={QB} B={B} W={W} nbcap={nbcap} rtt={rtt*1e3:.1f}",
          flush=True)

    k0 = jnp.arange(n, dtype=jnp.float32) % 7.0 + 1.0
    v0 = V3(k0, k0 * 0.5 - 1.0, 2.0 - k0 * 0.25)

    def vb(vals):
        return jnp.pad(vals, (0, nblocks * bandmat.BLOCK - n)).reshape(
            nblocks, bandmat.BLOCK)

    eargs = (eng.w, eng.blkq, eng.tbx, eng.tby, eng.tbz,
             eng.qx, eng.qy, eng.qz)

    # ---- A: current plane form -------------------------------------------
    def mv_A(k, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tbl = vb(k)
        tab4 = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=0)
        p = jax.lax.optimization_barrier(
            tab4[:, blkq].reshape(4, QB, W))
        out = jnp.einsum("qbw,rqw->rqb", w.astype(jnp.float32), p,
                         preferred_element_type=jnp.float32)
        return V3(qx * out[0] - out[1], qy * out[0] - out[2],
                  qz * out[0] - out[3])

    def mvd_A(vx, vy, vz, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tx, ty, tz = vb(vx), vb(vy), vb(vz)
        tab4 = jnp.stack([tx, ty, tz, tbx * tx + tby * ty + tbz * tz],
                         axis=0)
        p = jax.lax.optimization_barrier(
            tab4[:, blkq].reshape(4, QB, W))
        out = jnp.einsum("qbw,rqw->rqb", w.astype(jnp.float32), p,
                         preferred_element_type=jnp.float32)
        return (qx * out[0] + qy * out[1] + qz * out[2] - out[3])

    rmv = bench("A_mv", jax.jit(mv_A), (k0,) + eargs, rtt)
    rmvd = bench("A_mvd", jax.jit(mvd_A), (v0.x, v0.y, v0.z) + eargs, rtt)

    # ---- B: bf16 plane ---------------------------------------------------
    def mv_B(k, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tbl = vb(k)
        tab4 = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl],
                         axis=0).astype(jnp.bfloat16)
        p = jax.lax.optimization_barrier(
            tab4[:, blkq].reshape(4, QB, W))
        out = jnp.einsum("qbw,rqw->rqb", w, p,
                         preferred_element_type=jnp.float32)
        return V3(qx * out[0] - out[1], qy * out[0] - out[2],
                  qz * out[0] - out[3])

    def mvd_B(vx, vy, vz, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tx, ty, tz = vb(vx), vb(vy), vb(vz)
        tab4 = jnp.stack([tx, ty, tz, tbx * tx + tby * ty + tbz * tz],
                         axis=0).astype(jnp.bfloat16)
        p = jax.lax.optimization_barrier(
            tab4[:, blkq].reshape(4, QB, W))
        out = jnp.einsum("qbw,rqw->rqb", w, p,
                         preferred_element_type=jnp.float32)
        return (qx * out[0] + qy * out[1] + qz * out[2] - out[3])

    r = bench("B_mv", jax.jit(mv_B), (k0,) + eargs, rtt)
    rel(r, rmv)
    r = bench("B_mvd", jax.jit(mvd_B), (v0.x, v0.y, v0.z) + eargs, rtt)
    rel(r, rmvd)

    # ---- C/D: pregathered coordinate planes ------------------------------
    @jax.jit
    def pre_f32(blkq, tbx, tby, tbz):
        gx = tbx[blkq].reshape(QB, W)
        gy = tby[blkq].reshape(QB, W)
        gz = tbz[blkq].reshape(QB, W)
        return gx, gy, gz

    t0 = time.perf_counter()
    gx, gy, gz = pre_f32(eng.blkq, eng.tbx, eng.tby, eng.tbz)
    jax.block_until_ready(gx)
    pre = jax.jit(pre_f32)
    gx, gy, gz = pre(eng.blkq, eng.tbx, eng.tby, eng.tbz)
    jax.block_until_ready(gx)
    t0 = time.perf_counter()
    for _ in range(4):
        gx, gy, gz = pre(eng.blkq, eng.tbx, eng.tby, eng.tbz)
    jax.block_until_ready(gx)
    print(f"pre_f32        {max(time.perf_counter()-t0-rtt, 0)/4*1e3:8.1f}"
          " ms", flush=True)

    def mv_C(k, gx, gy, gz, w, blkq, qx, qy, qz, bf16):
        kg = vb(k)[blkq].reshape(QB, W)
        p = jnp.stack([kg, gx * kg, gy * kg, gz * kg], axis=0)
        if bf16:
            p = p.astype(jnp.bfloat16)
        p = jax.lax.optimization_barrier(p)
        out = jnp.einsum("qbw,rqw->rqb",
                         w if bf16 else w.astype(jnp.float32), p,
                         preferred_element_type=jnp.float32)
        return V3(qx * out[0] - out[1], qy * out[0] - out[2],
                  qz * out[0] - out[3])

    def mvd_C(vx, vy, vz, gx, gy, gz, w, blkq, qx, qy, qz, bf16):
        gvx = vb(vx)[blkq].reshape(QB, W)
        gvy = vb(vy)[blkq].reshape(QB, W)
        gvz = vb(vz)[blkq].reshape(QB, W)
        p = jnp.stack([gvx, gvy, gvz,
                       gx * gvx + gy * gvy + gz * gvz], axis=0)
        if bf16:
            p = p.astype(jnp.bfloat16)
        p = jax.lax.optimization_barrier(p)
        out = jnp.einsum("qbw,rqw->rqb",
                         w if bf16 else w.astype(jnp.float32), p,
                         preferred_element_type=jnp.float32)
        return (qx * out[0] + qy * out[1] + qz * out[2] - out[3])

    cargs = (gx, gy, gz, eng.w, eng.blkq, eng.qx, eng.qy, eng.qz)
    for tag, bf in (("C", False), ("D", True)):
        f = jax.jit(lambda k, *a, b=bf: mv_C(k, *a, bf16=b))
        r = bench(f"{tag}_mv", f, (k0,) + cargs, rtt)
        rel(r, rmv)
        f = jax.jit(lambda vx, vy, vz, *a, b=bf:
                    mvd_C(vx, vy, vz, *a, bf16=b))
        r = bench(f"{tag}_mvd", f, (v0.x, v0.y, v0.z) + cargs, rtt)
        rel(r, rmvd)


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    main()
