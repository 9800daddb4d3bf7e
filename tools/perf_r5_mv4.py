"""Round-5 probe: verify the (4, QB, W)-rhs einsum form (xla4 in
perf_r5_mv3.py, 8.0 ms vs 30-43 ms) numerically and pick its final
shape: barrier vs fused, output layout, and the matvec_dot twin.
Diffs are reported relative to max|base| (f32 reduction-order noise is
the expected scale)."""
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
    print(f"{name:12s} {ms:8.1f} ms", flush=True)
    return out


def rel(a, b):
    num = max(float(jnp.max(jnp.abs(x - y)))
              for x, y in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b)))
    den = max(float(jnp.max(jnp.abs(x)))
              for x in jax.tree_util.tree_leaves(b))
    print(f"             rel diff {num/den:.3e} (abs {num:.3e} / "
          f"max {den:.3e})", flush=True)


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
    print(f"QB={QB} B={B} W={W} nbcap={nbcap} rtt={rtt*1e3:.1f}", flush=True)

    k0 = jnp.arange(n, dtype=jnp.float32) % 7.0 + 1.0
    v0 = V3(k0, k0 * 0.5 - 1.0, 2.0 - k0 * 0.25)

    def vb(vals):
        return jnp.pad(vals, (0, nblocks * bandmat.BLOCK - n)).reshape(
            nblocks, bandmat.BLOCK)

    eargs = (eng.w, eng.blkq, eng.tbx, eng.tby, eng.tbz,
             eng.qx, eng.qy, eng.qz)

    # ---- base matvec / matvec_dot (current einsum form, unchunked) ----
    @jax.jit
    def base_mv(k, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tbl = vb(k)
        tab = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=1)
        pw = tab[blkq]
        out = jnp.einsum("qbnc,qnrc->qbr",
                         w.reshape(QB, B, nbcap, bandmat.BLOCK
                                   ).astype(jnp.float32),
                         pw, preferred_element_type=jnp.float32)
        return V3(qx * out[..., 0] - out[..., 1],
                  qy * out[..., 0] - out[..., 2],
                  qz * out[..., 0] - out[..., 3])

    @jax.jit
    def base_mvd(vx, vy, vz, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tx, ty, tz = vb(vx), vb(vy), vb(vz)
        tab = jnp.stack([tx, ty, tz, tbx * tx + tby * ty + tbz * tz],
                        axis=1)
        pw = tab[blkq]
        out = jnp.einsum("qbnc,qnrc->qbr",
                         w.reshape(QB, B, nbcap, bandmat.BLOCK
                                   ).astype(jnp.float32),
                         pw, preferred_element_type=jnp.float32)
        return (qx * out[..., 0] + qy * out[..., 1]
                + qz * out[..., 2] - out[..., 3])

    rmv = bench("base_mv", base_mv, (k0,) + eargs, rtt)
    rmvd = bench("base_mvd", base_mvd, (v0.x, v0.y, v0.z) + eargs, rtt)

    def plane_mv(k, w, blkq, tbx, tby, tbz, qx, qy, qz, barrier):
        tbl = vb(k)
        tab4 = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=0)
        p = tab4[:, blkq].reshape(4, QB, W)
        if barrier:
            p = jax.lax.optimization_barrier(p)
        out = jnp.einsum("qbw,rqw->rqb", w.astype(jnp.float32), p,
                         preferred_element_type=jnp.float32)
        return V3(qx * out[0] - out[1], qy * out[0] - out[2],
                  qz * out[0] - out[3])

    def plane_mvd(vx, vy, vz, w, blkq, tbx, tby, tbz, qx, qy, qz, barrier):
        tx, ty, tz = vb(vx), vb(vy), vb(vz)
        tab4 = jnp.stack([tx, ty, tz, tbx * tx + tby * ty + tbz * tz],
                         axis=0)
        p = tab4[:, blkq].reshape(4, QB, W)
        if barrier:
            p = jax.lax.optimization_barrier(p)
        out = jnp.einsum("qbw,rqw->rqb", w.astype(jnp.float32), p,
                         preferred_element_type=jnp.float32)
        return (qx * out[0] + qy * out[1] + qz * out[2] - out[3])

    for barrier in (True, False):
        tag = "bar" if barrier else "fus"
        f = jax.jit(lambda k, *a, b=barrier: plane_mv(k, *a, barrier=b))
        r = bench(f"plane_mv_{tag}", f, (k0,) + eargs, rtt)
        rel(r, rmv)
        f = jax.jit(lambda vx, vy, vz, *a, b=barrier:
                    plane_mvd(vx, vy, vz, *a, barrier=b))
        r = bench(f"plane_mvd_{tag}", f, (v0.x, v0.y, v0.z) + eargs, rtt)
        rel(r, rmvd)


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    main()
