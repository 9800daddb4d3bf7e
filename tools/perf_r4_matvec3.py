"""Round-4 probe: bf16 BLOCK-RELATIVE rhs for the coef matvecs at 1M.

The 4-lane f32 rhs gather is 16 of the 18 bytes/slot each matvec
streams. Variant: per-source-block relative coordinates (x_j - c_b) let
the product lanes go bf16 without the absolute-coordinate cancellation
blowup (block extent ~2-3 cells bounds the amplification); the einsum
keeps the block axis ('qbnc,qnrc->qbnr') and the c_b corrections are
folded back with small (Qc, nbcap) gathers. bf16 w x bf16 rhs -> f32 is
also the MXU-native form. Reports per-call time AND worst relative
error vs the f32 ops on the hot state.

    timeout 3000 python -u tools/perf_r4_matvec3.py
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
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops.vec import V3

BLOCK = bandmat.BLOCK


def rel_coef_matvec_ops(eng: bandmat.CoefEngine, n: int, B: int):
    QB, _, W = eng.w.shape
    nbcap = eng.blkq.shape[1]
    nblocks = -(-n // BLOCK)
    nc = bandmat._coef_chunks(QB, W)
    Qc = QB // nc

    cbx = eng.tbx.mean(axis=1)
    cby = eng.tby.mean(axis=1)
    cbz = eng.tbz.mean(axis=1)
    rx = eng.tbx - cbx[:, None]
    ry = eng.tby - cby[:, None]
    rz = eng.tbz - cbz[:, None]

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    w_r = eng.w.reshape(nc, Qc, eng.w.shape[1], nbcap, BLOCK)
    blk_r = resh(eng.blkq)
    qx_r, qy_r, qz_r = resh(eng.qx), resh(eng.qy), resh(eng.qz)

    def vb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks,
                                                               BLOCK)

    def run(chunk_fn, tab):
        xs = (w_r, blk_r, qx_r, qy_r, qz_r)
        if nc == 1:
            out = chunk_fn(tuple(t[0] for t in xs))
        else:
            out = jax.lax.map(chunk_fn, xs)
        return jax.tree_util.tree_map(lambda o: o.reshape(-1)[:n], out)

    def matvec(k):
        tbl = vb(k)
        tab = jnp.stack([tbl, rx * tbl, ry * tbl, rz * tbl],
                        axis=1).astype(jnp.bfloat16)

        def chunk(args):
            w_c, blk_c, qx_c, qy_c, qz_c = args
            pw = tab[blk_c]                      # (Qc, nbcap, 4, 128) bf16
            o4 = jnp.einsum("qbnc,qnrc->qbnr", w_c, pw,
                            preferred_element_type=jnp.float32)
            sk_n = o4[..., 0]                    # (Qc, B, nbcap)
            cx = cbx[blk_c][:, None, :]
            cy = cby[blk_c][:, None, :]
            cz = cbz[blk_c][:, None, :]
            sk = sk_n.sum(axis=2)
            sxj = (o4[..., 1] + cx * sk_n).sum(axis=2)
            syj = (o4[..., 2] + cy * sk_n).sum(axis=2)
            szj = (o4[..., 3] + cz * sk_n).sum(axis=2)
            return V3(qx_c * sk - sxj, qy_c * sk - syj, qz_c * sk - szj)

        return run(chunk, tab)

    def matvec_dot(v: V3):
        tx, ty, tz = vb(v.x), vb(v.y), vb(v.z)
        tab = jnp.stack([tx, ty, tz, rx * tx + ry * ty + rz * tz],
                        axis=1).astype(jnp.bfloat16)

        def chunk(args):
            w_c, blk_c, qx_c, qy_c, qz_c = args
            pw = tab[blk_c]
            o4 = jnp.einsum("qbnc,qnrc->qbnr", w_c, pw,
                            preferred_element_type=jnp.float32)
            cx = cbx[blk_c][:, None, :]
            cy = cby[blk_c][:, None, :]
            cz = cbz[blk_c][:, None, :]
            acc = ((qx_c[:, :, None] - cx) * o4[..., 0]
                   + (qy_c[:, :, None] - cy) * o4[..., 1]
                   + (qz_c[:, :, None] - cz) * o4[..., 2]
                   - o4[..., 3])
            return acc.sum(axis=2)

        return run(chunk, tab)

    return matvec, matvec_dot


def main():
    print("device:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    scene = build_scene(cfg)
    st = scene.static
    state = dfsph.init_state(scene)
    step0 = jax.jit(functools.partial(dfsph.step, st))
    for _ in range(4):
        state = step0(scene.arrays, state)
    _ = float(jnp.sum(state.fluid.pos.x))
    print("hot state ready", flush=True)
    pos = state.fluid.pos
    n, B = st.n_fluid, st.band_B

    @jax.jit
    def build(px, py, pz):
        dp = mbase.build_dense_prep(st, scene.arrays, V3(px, py, pz),
                                    st.band_nb_wide, B)
        rho_f, cnt, flags = bandmat.dense_rho_count(
            dp.pos, h=st.h, m=st.particle_m, plan=dp.plan, B=B)
        plan = bandmat.compact_plan(dp.plan, flags, st.pair_nb)
        eng = bandmat.build_coef_engine(dp.pos, h=st.h, m=st.particle_m,
                                        plan=plan, B=B,
                                        dtype=dfsph.BAND_DTYPE)
        return eng, rho_f, dp.pos

    eng, rho_f, pos_s = build(pos.x, pos.y, pos.z)
    jax.block_until_ready(eng.w)
    print(f"engine: w {eng.w.shape} {eng.w.dtype}", flush=True)

    mv1, mvd1 = bandmat.coef_matvec_ops(eng, n, B)
    mv2, mvd2 = rel_coef_matvec_ops(eng, n, B)
    k = rho_f * 1e-3

    for name, f, arg in (("mv f32-abs", mv1, k), ("mv bf16-rel", mv2, k)):
        g = jax.jit(lambda a, fn=f: fn(a).x)
        out = g(arg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = g(arg)
            jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms",
              flush=True)
    v = V3(rho_f * 1e-4, rho_f * -2e-4, rho_f * 3e-4)
    for name, f in (("mvd f32-abs", mvd1), ("mvd bf16-rel", mvd2)):
        g = jax.jit(lambda a, b, c, fn=f: fn(V3(a, b, c)))
        out = g(v.x, v.y, v.z)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = g(v.x, v.y, v.z)
            jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms",
              flush=True)

    a1 = np.asarray(jax.jit(lambda a: mv1(a).x)(k))
    a2 = np.asarray(jax.jit(lambda a: mv2(a).x)(k))
    scale = np.abs(a1).mean() + 1e-12
    print(f"mv rel err: max {np.abs(a1-a2).max()/scale:.3e} "
          f"mean {np.abs(a1-a2).mean()/scale:.3e} (vs mean |out|)",
          flush=True)
    d1 = np.asarray(jax.jit(lambda a, b, c: mvd1(V3(a, b, c)))(v.x, v.y, v.z))
    d2 = np.asarray(jax.jit(lambda a, b, c: mvd2(V3(a, b, c)))(v.x, v.y, v.z))
    scale = np.abs(d1).mean() + 1e-12
    print(f"mvd rel err: max {np.abs(d1-d2).max()/scale:.3e} "
          f"mean {np.abs(d1-d2).mean()/scale:.3e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
