"""Round-5 probe: decompose the hot-1M matvec pair (56.5 ms measured by
tools/phase_attrib_1m.py — 81% of the step rides n_it of these).

Times, each scalar-synced with the tunnel RTT subtracted:
    mv        split-engine matvec alone
    mvd       split-engine matvec_dot alone
    gather    the raw rhs block-row gather tab[blk] (+ trivial reduce) —
              the suspected floor-setter (~600 MB of 1 KB rows)
    wread     the pure w stream (sum over the stored bf16 w)
    bf16dot   SPEED-ONLY variant: the same einsum with a bf16 rhs table
              (absolute coords — numerically wrong, timing signal only)

Run BLOCK variants via the env knob:  CFD_TPU_BLOCK=32 python ...
Usage: python -u tools/perf_r5_mv2.py [/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy]
"""
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
    print(f"{name:10s} {ms:8.1f} ms", flush=True)
    return ms


def main():
    pos_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy"
    rows = np.load(pos_path)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    scene = build_scene(cfg, plan_pos=rows)
    st = scene.static
    print(f"BLOCK={bandmat.BLOCK} B={st.band_B} pair_nb={st.pair_nb} "
          f"nbA={st.coef_nbA} capB={st.coef_capB}", flush=True)
    pos = V3(jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
             jnp.asarray(rows[:, 2]))
    rtt = rtt_s()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

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
    print("overflow", int(seng.overflow), flush=True)
    leaves, treedef = jax.tree_util.tree_flatten(seng)
    n = st.n_fluid
    k0 = jnp.ones((n,), jnp.float32)
    v0 = V3(k0, k0 * 0.5, k0 * 0.25)

    @jax.jit
    def mv(k, *lv):
        e = jax.tree_util.tree_unflatten(treedef, lv)
        m, _ = bandmat.split_coef_matvec_ops(e, n, st.band_B)
        return m(k).x

    @jax.jit
    def mvd(vx, vy, vz, *lv):
        e = jax.tree_util.tree_unflatten(treedef, lv)
        _, md = bandmat.split_coef_matvec_ops(e, n, st.band_B)
        return md(V3(vx, vy, vz))

    @jax.jit
    def pair(k, *lv):
        e = jax.tree_util.tree_unflatten(treedef, lv)
        m, md = bandmat.split_coef_matvec_ops(e, n, st.band_B)
        return md(m(k)) * 1e-3

    bench("mv", mv, (k0,) + tuple(leaves), rtt)
    bench("mvd", mvd, (v0.x, v0.y, v0.z) + tuple(leaves), rtt)
    bench("pair", pair, (k0,) + tuple(leaves), rtt)

    # Raw components on the A-engine only (the bulk engine).
    eng = seng.a
    QB, B, W = eng.w.shape
    nbcap = eng.blkq.shape[1]
    nblocks = eng.tbx.shape[0]
    print(f"A-engine w {QB}x{B}x{W} = "
          f"{QB*B*W*2/1e9:.2f} GB; gather {QB*nbcap} rows of "
          f"{4*bandmat.BLOCK*4} B = {QB*nbcap*16*bandmat.BLOCK/1e9:.2f} GB",
          flush=True)

    @jax.jit
    def gather(k, blkq, tbx, tby, tbz):
        tbl = jnp.pad(k, (0, nblocks * bandmat.BLOCK - n)).reshape(
            nblocks, bandmat.BLOCK)
        tab = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=1)
        pw = tab[blkq]                       # (QB, nbcap, 4, BLOCK)
        return jnp.sum(pw, axis=(1, 2, 3))   # cheap consumer

    bench("gather", gather, (k0, eng.blkq, eng.tbx, eng.tby, eng.tbz), rtt)

    @jax.jit
    def wread(w):
        return jnp.sum(w.astype(jnp.float32), axis=(1, 2))

    bench("wread", wread, (eng.w,), rtt)

    # SPEED-ONLY: same einsum, bf16 rhs (absolute coords — wrong numbers).
    @jax.jit
    def bf16dot(k, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tbl = jnp.pad(k, (0, nblocks * bandmat.BLOCK - n)).reshape(
            nblocks, bandmat.BLOCK)
        tab = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl],
                        axis=1).astype(jnp.bfloat16)
        pw = tab[blkq]
        out = jnp.einsum("qbnc,qnrc->qbr", w.reshape(QB, B, nbcap,
                                                     bandmat.BLOCK),
                         pw.reshape(QB, nbcap, 4, bandmat.BLOCK),
                         preferred_element_type=jnp.float32)
        return qx * out[..., 0] - out[..., 1]

    bench("bf16dot", bf16dot, (k0, eng.w, eng.blkq, eng.tbx, eng.tby,
                               eng.tbz, eng.qx, eng.qy, eng.qz), rtt)


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    main()
