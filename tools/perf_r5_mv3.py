"""Round-5 probe: Pallas contraction variants for the hot coef matvec.

Baseline (tools/perf_r5_mv2.py, 1M hot dam, A-engine): the einsum
'qbnc,qnrc->qbr' runs ~41.8 ms while its memory floor is ~10 ms
(w-stream 2.6 ms, rhs block-row gather 7.4 ms) — the 4-lane output
keeps XLA off an efficient schedule. Variants measured here:

    base      current einsum (A-engine only, apples-to-apples)
    gat4      XLA materialization of the (4, QB, W) f32 rhs alone
    xla4      materialized rhs + XLA einsum 'qbw,rqw->rqb'
    pvpu      materialized rhs + Pallas VPU contraction kernel
    pmxu      materialized rhs + Pallas batched-dot (MXU) kernel
    pfuse     FUSED Pallas kernel: product table (4, nblocks, BLOCK)
              f32 resident in VMEM, blkq scalar-prefetched, per-group
              rows gathered in-kernel (no HBM rhs traffic at all)

All numerically identical to base (f32 accumulate, absolute coords).
Usage: python -u tools/perf_r5_mv3.py [pos.npy]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops.vec import V3

BLOCK = bandmat.BLOCK


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
    ref = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(ref))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ms = max((time.perf_counter() - t0 - rtt) / reps, 0.0) * 1e3
    print(f"{name:10s} {ms:8.1f} ms", flush=True)
    return out


def contract_vpu_kernel(w_ref, p_ref, o_ref):
    w = w_ref[:].astype(jnp.float32)             # (Qg, B, W)
    for r in range(4):
        o_ref[r] = jnp.sum(w * p_ref[r][:, None, :], axis=2)


def contract_mxu_kernel(w_ref, p_ref, o_ref):
    out = jax.lax.dot_general(                    # (Qg, B, 4)
        w_ref[:].astype(jnp.float32), p_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (1,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = jnp.transpose(out, (2, 0, 1))


def make_contract(QB, B, W, Qg, kern):
    grid = (pl.cdiv(QB, Qg),)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Qg, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Qg, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, Qg, B), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, QB, B), jnp.float32),
    )


def make_fused(QB, B, W, nbcap, nblocks, Qg):
    grid = (pl.cdiv(QB, Qg),)

    def kern(blkq_ref, w_ref, tab_ref, o_ref, p_scr):
        i = pl.program_id(0)
        for g in range(Qg):
            for nb in range(nbcap):
                j = blkq_ref[i * Qg + g, nb]
                p_scr[:, g, nb * BLOCK:(nb + 1) * BLOCK] = tab_ref[:, j, :]
        w = w_ref[:].astype(jnp.float32)
        for r in range(4):
            o_ref[r] = jnp.sum(w * p_scr[r][:, None, :], axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Qg, B, W), lambda i, blkq: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nblocks, BLOCK), lambda i, blkq: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, Qg, B), lambda i, blkq: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, Qg, W), jnp.float32)],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, QB, B), jnp.float32))


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
    print(f"A-engine QB={QB} B={B} W={W} nbcap={nbcap} nblocks={nblocks} "
          f"tab={4*nblocks*BLOCK*4/1e6:.1f} MB rtt={rtt*1e3:.1f} ms",
          flush=True)

    k0 = jnp.arange(n, dtype=jnp.float32) % 7.0 + 1.0

    def tab4_of(k):
        tbl = jnp.pad(k, (0, nblocks * BLOCK - n)).reshape(nblocks, BLOCK)
        return jnp.stack([tbl, eng.tbx * tbl, eng.tby * tbl,
                          eng.tbz * tbl], axis=0)   # (4, nblocks, BLOCK)

    # -------- base: the current einsum path (A-engine only) --------
    @jax.jit
    def base(k, w, blkq, tbx, tby, tbz, qx, qy, qz):
        tbl = jnp.pad(k, (0, nblocks * BLOCK - n)).reshape(nblocks, BLOCK)
        tab = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=1)
        pw = tab[blkq]                           # (QB, nbcap, 4, BLOCK)
        out = jnp.einsum("qbnc,qnrc->qbr",
                         w.reshape(QB, B, nbcap, BLOCK).astype(jnp.float32),
                         pw, preferred_element_type=jnp.float32)
        return V3(qx * out[..., 0] - out[..., 1],
                  qy * out[..., 0] - out[..., 2],
                  qz * out[..., 0] - out[..., 3])

    eargs = (eng.w, eng.blkq, eng.tbx, eng.tby, eng.tbz,
             eng.qx, eng.qy, eng.qz)
    rbase = bench("base", base, (k0,) + eargs, rtt)

    # -------- gat4: materialize the (4, QB, W) rhs --------
    @jax.jit
    def gat4(k, blkq, tbx, tby, tbz):
        tab4 = tab4_of(k)
        return tab4[:, blkq].reshape(4, QB, W)

    bench("gat4", gat4, (k0, eng.blkq, eng.tbx, eng.tby, eng.tbz), rtt)

    # -------- xla4: materialized rhs + plain XLA einsum --------
    @jax.jit
    def xla4(k, w, blkq, tbx, tby, tbz, qx, qy, qz):
        p = tab4_of(k)[:, blkq].reshape(4, QB, W)
        p = jax.lax.optimization_barrier(p)
        out = jnp.einsum("qbw,rqw->rqb", w.astype(jnp.float32), p,
                         preferred_element_type=jnp.float32)
        return V3(qx * out[0] - out[1], qy * out[0] - out[2],
                  qz * out[0] - out[3])

    bench("xla4", xla4, (k0,) + eargs, rtt)

    # -------- pvpu / pmxu: materialized rhs + Pallas contraction ----
    for name, kern, Qg in (("pvpu8", contract_vpu_kernel, 8),
                           ("pvpu16", contract_vpu_kernel, 16),
                           ("pvpu32", contract_vpu_kernel, 32),
                           ("pmxu16", contract_mxu_kernel, 16)):
        call = make_contract(QB, B, W, Qg, kern)

        @jax.jit
        def pall(k, w, blkq, tbx, tby, tbz, qx, qy, qz, call=call):
            p = tab4_of(k)[:, blkq].reshape(4, QB, W)
            out = call(w, p)
            return V3(qx * out[0] - out[1], qy * out[0] - out[2],
                      qz * out[0] - out[3])

        try:
            r = bench(name, pall, (k0,) + eargs, rtt)
            err = max(float(jnp.max(jnp.abs(a - b))) for a, b in
                      zip(r.astuple(), rbase.astuple()))
            print(f"           max|diff| vs base = {err:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)

    # -------- pfuse: VMEM-resident tab + in-kernel gather --------
    for Qg in (8, 16):
        try:
            call = make_fused(QB, B, W, nbcap, nblocks, Qg)
            QBp = -(-QB // Qg) * Qg
            blkq_p = jnp.pad(eng.blkq, ((0, QBp - QB), (0, 0)))

            @jax.jit
            def pfuse(k, w, blkq, tbx, tby, tbz, qx, qy, qz, call=call,
                      blkq_p=blkq_p):
                tab4 = tab4_of(k)
                out = call(blkq_p, w, tab4)
                return V3(qx * out[0] - out[1], qy * out[0] - out[2],
                          qz * out[0] - out[3])

            r = bench(f"pfuse{Qg}", pfuse, (k0,) + eargs, rtt)
            err = max(float(jnp.max(jnp.abs(a - b))) for a, b in
                      zip(r.astuple(), rbase.astuple()))
            print(f"           max|diff| vs base = {err:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pfuse{Qg} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    main()
