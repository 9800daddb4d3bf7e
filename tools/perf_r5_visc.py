"""Round-5 probe: is dense_viscosity (64 ms at 1M, byte floor ~5 ms)
gather-bound, and does packing the 7 window lanes (pos3/vel3/rho) into
ONE (nblocks, 8*BLOCK) table + a single row gather fix it?

    win1_ms        one (QB, pair_nb)-row gather from (nblocks, BLOCK) f32
    win7sep_ms     7 separate such gathers (the current visc form)
    win8flat_ms    ONE gather from packed (nblocks, 8*BLOCK) incl. pack
    win8inner_ms   ONE gather from packed (nblocks, 8, BLOCK) incl. pack
    visc_base_ms   current bandmat.dense_viscosity over the tight plan
    visc_pack_ms   full viscosity with the packed single-gather windows
    rho_base_ms    current dense_rho_count over the wide plan
    visc_equal     packed visc == base visc (allclose)

Usage: timeout 3000 python -u tools/perf_r5_visc.py [hot_pos.npy]
"""
import dataclasses
import json
import math
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
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3

BLOCK = bandmat.BLOCK
RES = {}


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0].astype(jnp.float32))


def timed(name, make_fn, reps=8):
    fn, args = make_fn()
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    dt = max(time.perf_counter() - t0 - rtt, 0.0) / reps
    RES[name] = round(dt * 1e3, 2)
    print(name, RES[name], "rtt", round(rtt * 1e3, 1),
          file=sys.stderr, flush=True)
    return out


def visc_packed(pos_s, vel_s, rho, *, h, m, plan, B, c_s, alpha,
                eps=0.01):
    """dense_viscosity with ONE packed 8-lane window gather per chunk."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    QB, nbcap = blk.shape
    W = nbcap * BLOCK
    nblocks = -(-n // BLOCK)
    target = max(1, (512 << 20) // (32 * W))
    nc = 1
    if QB > target:
        nc = -(-QB // target)
        while QB % nc:
            nc += 1
    Qc = QB // nc

    def tb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks,
                                                               BLOCK)

    zeros = jnp.zeros((nblocks, BLOCK), jnp.float32)
    t8 = jnp.stack([tb(pos_s.x), tb(pos_s.y), tb(pos_s.z),
                    tb(vel_s.x), tb(vel_s.y), tb(vel_s.z),
                    tb(rho), zeros], axis=1).reshape(nblocks, 8 * BLOCK)

    def q(c):
        return jnp.pad(c, (0, QB * B - n)).reshape(QB, B)

    qx, qy, qz = q(pos_s.x), q(pos_s.y), q(pos_s.z)
    qvx, qvy, qvz = q(vel_s.x), q(vel_s.y), q(vel_s.z)
    qrho = q(rho)
    qslot_a = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B)
    col = jnp.arange(BLOCK, dtype=jnp.int32)
    h2 = jnp.float32(h) * jnp.float32(h)
    nu_num = jnp.float32(2.0 * alpha * h * c_s)
    q2e_add = jnp.float32(eps) * h2
    mf = jnp.float32(m)

    def chunk(args):
        (blk_c, mask_c, cqx, cqy, cqz, cvx, cvy, cvz, crho, qslot) = args
        rows = t8[blk_c]                       # (Qc, nbcap, 8*BLOCK)
        rows = rows.reshape(Qc, nbcap, 8, BLOCK)

        def win(i):
            return (rows[:, :, i, :].reshape(Qc, W))[:, None, :]

        dx = cqx[:, :, None] - win(0)
        dy = cqy[:, :, None] - win(1)
        dz = cqz[:, :, None] - win(2)
        r2 = dx * dx + dy * dy + dz * dz
        scol = (blk_c[:, :, None] * BLOCK + col[None, None, :]
                ).reshape(Qc, 1, W)
        valid = (jnp.broadcast_to(mask_c[:, :, None],
                                  (Qc, nbcap, BLOCK)).reshape(Qc, 1, W)
                 & (scol < n) & (qslot[:, :, None] < n)
                 & (scol != qslot[:, :, None]) & (r2 <= h2))
        shear = (dx * (cvx[:, :, None] - win(3))
                 + dy * (cvy[:, :, None] - win(4))
                 + dz * (cvz[:, :, None] - win(5)))
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        gc = sm.cubic_grad_coeff(r, h)
        pi = -(nu_num / (crho[:, :, None] + win(6))) * shear / (r2 + q2e_add)
        scale = jnp.where(valid & (shear < 0.0), -mf * pi * gc, 0.0)
        return V3((scale * dx).sum(axis=2), (scale * dy).sum(axis=2),
                  (scale * dz).sum(axis=2))

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    xs = (resh(blk), resh(nb_mask), resh(qx), resh(qy), resh(qz),
          resh(qvx), resh(qvy), resh(qvz), resh(qrho), resh(qslot_a))
    if nc == 1:
        out = chunk(tuple(t[0] for t in xs))
    else:
        out = jax.lax.map(chunk, xs)
    return V3(*(c.reshape(-1)[:n] for c in out.astuple())) * mf


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
    n = st.n_fluid
    B = st.band_B
    QB = -(-n // B)
    nblocks = -(-n // BLOCK)
    RES.update(n=n, QB=QB, B=B, pair_nb=st.pair_nb)

    stage = jax.jit(lambda px, py, pz: (
        lambda dp: (dp.pos, dp.plan))(mbase.build_dense_prep(
            st, scene.arrays, V3(px, py, pz), st.band_nb_wide,
            st.band_B, want_bterms=False)))
    pos_s, plan = stage(pos.x, pos.y, pos.z)
    jax.block_until_ready(pos_s.x)
    tight = jax.jit(lambda px, py, pz, blk, mask: (
        lambda flags: bandmat.compact_plan(
            (blk, mask, jnp.zeros((), jnp.int32)), flags, st.pair_nb))(
        bandmat.dense_rho_count(
            V3(px, py, pz), h=st.h, m=st.particle_m,
            plan=(blk, mask, jnp.zeros((), jnp.int32)), B=st.band_B)[2]))(
        pos_s.x, pos_s.y, pos_s.z, plan[0], plan[1])
    jax.block_until_ready(tight[0])
    blkp = tight[0]
    vel = V3(pos_s.x * 0 + 1.0, pos_s.y * 0, pos_s.z * 0)
    rho = pos_s.x * 0 + 1000.0

    def tb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(
            nblocks, BLOCK)

    lanes = (pos_s.x, pos_s.y, pos_s.z, vel.x, vel.y, vel.z, rho)

    timed("win1_ms", lambda: (
        jax.jit(lambda t, bl: jnp.sum(t[bl], axis=(1, 2))),
        (tb(pos_s.x), blkp)))

    timed("win7sep_ms", lambda: (
        jax.jit(lambda bl, *ts: sum(jnp.sum(t[bl], axis=(1, 2))
                                    for t in ts)),
        (blkp,) + tuple(tb(v) for v in lanes)))

    def pack_flat(*vs):
        zs = jnp.zeros((nblocks, BLOCK), jnp.float32)
        return jnp.stack([tb(v) for v in vs] + [zs],
                         axis=1).reshape(nblocks, 8 * BLOCK)

    timed("win8flat_ms", lambda: (
        jax.jit(lambda bl, *vs: jnp.sum(pack_flat(*vs)[bl], axis=(1, 2))),
        (blkp,) + lanes))

    def pack_inner(*vs):
        zs = jnp.zeros((nblocks, BLOCK), jnp.float32)
        return jnp.stack([tb(v) for v in vs] + [zs], axis=1)

    timed("win8inner_ms", lambda: (
        jax.jit(lambda bl, *vs: jnp.sum(pack_inner(*vs)[bl],
                                        axis=(1, 2, 3))),
        (blkp,) + lanes))

    base_out = timed("visc_base_ms", lambda: (
        jax.jit(lambda px, py, pz, bl, msk: bandmat.dense_viscosity(
            V3(px, py, pz), vel, rho, h=st.h, m=st.particle_m,
            plan=(bl, msk, jnp.zeros((), jnp.int32)), B=st.band_B,
            c_s=13.0, alpha=0.08).x),
        (pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1])))

    pack_out = timed("visc_pack_ms", lambda: (
        jax.jit(lambda px, py, pz, bl, msk: visc_packed(
            V3(px, py, pz), vel, rho, h=st.h, m=st.particle_m,
            plan=(bl, msk, jnp.zeros((), jnp.int32)), B=st.band_B,
            c_s=13.0, alpha=0.08).x),
        (pos_s.x, pos_s.y, pos_s.z, tight[0], tight[1])))
    RES["visc_equal"] = bool(jnp.allclose(base_out, pack_out,
                                          rtol=1e-5, atol=1e-6))
    print("visc_equal", RES["visc_equal"], file=sys.stderr, flush=True)

    timed("rho_base_ms", lambda: (
        jax.jit(lambda px, py, pz, bl, msk: bandmat.dense_rho_count(
            V3(px, py, pz), h=st.h, m=st.particle_m,
            plan=(bl, msk, jnp.zeros((), jnp.int32)), B=st.band_B)[0]),
        (pos_s.x, pos_s.y, pos_s.z, plan[0], plan[1])))

    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
