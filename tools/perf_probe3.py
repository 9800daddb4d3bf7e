"""Round-3 probe #3: validate the block-sparse MXU SpMV design for the
DFSPH inner loops.

  1. Block statistics from a REAL hot neighborhood: how many 128-wide
     source blocks cover the neighbors of 8/16 consecutive sorted queries.
  2. On-chip cost of the batched banded matvec (QB, 8, W) @ (QB, W), f32
     and bf16, in a value-dependent loop (the per-iteration replacement
     for the two (N, K) packed gathers).
  3. Cost of the dense A-matrix build pass (QB, 8, W) from block positions.
  4. Tuple-of-arrays vs single packed array while-loop carry (copy cost).

    nohup python tools/perf_probe3.py > /tmp/perf_probe3.log 2>&1 &
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
from cfd_taichi_tpu.models import dfsph

DISPATCH_FLOOR = 0.0


def sync_time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out) if hasattr(out, "dtype") else out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] - DISPATCH_FLOOR


def measure_floor():
    global DISPATCH_FLOOR
    one = jnp.ones(())
    null = jax.jit(lambda x: x + 1.0)
    DISPATCH_FLOOR = 0.0
    DISPATCH_FLOOR = max(sync_time(null, one, reps=9), 0.0)
    print(f"floor: {DISPATCH_FLOOR*1e3:.1f} ms", flush=True)


def hot_state(sim_steps=120):
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_30k.json"))
    import dataclasses
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name="dfsph"))
    scene = build_scene(cfg)
    step = jax.jit(functools.partial(dfsph.step, scene.static))
    state = dfsph.init_state(scene)
    for _ in range(sim_steps):
        state = step(scene.arrays, state)
    jax.block_until_ready(state.fluid.pos.x)
    print(f"hot: t={float(state.t):.3f}", flush=True)
    return scene, state


def block_stats(scene, state):
    st = scene.static

    @jax.jit
    def get_nbh(fluid_pos):
        nbh = mbase.build_nbh(st, scene.arrays, fluid_pos, None)
        return nbh.idx, nbh.mask_f, nbh.count

    idx, mask, count = get_nbh(state.fluid.pos)
    idx = np.asarray(idx)
    mask = np.asarray(mask)
    n = st.n_fluid
    print(f"count: max={np.asarray(count).max()} "
          f"avg={np.asarray(count).mean():.1f} K={st.K}", flush=True)
    out = {}
    for B in (8, 16):
        for blk in (128, 256):
            QB = (n + B - 1) // B
            nbs = np.zeros(QB, np.int64)
            for g in range(QB):
                rows = slice(g * B, min((g + 1) * B, n))
                s = idx[rows][mask[rows]]
                nbs[g] = np.unique(s // blk).shape[0]
            out[(B, blk)] = nbs
            print(f"B={B:2d} block={blk}: nb max={nbs.max()} "
                  f"p99={np.percentile(nbs, 99):.0f} "
                  f"p90={np.percentile(nbs, 90):.0f} avg={nbs.mean():.1f} "
                  f"-> W_max={nbs.max()*blk}, A_f32 = "
                  f"{3*QB*B*nbs.max()*blk*4/1e6:.0f} MB", flush=True)
    return out


def matvec_probe(scene, n, B, blk, nb):
    """Per-iteration cost of the matvec form with (QB, B, W) A-matrices."""
    QB = (n + B - 1) // B
    W = nb * blk
    nblocks = (n + blk - 1) // blk
    rng = np.random.default_rng(0)
    blkids = jnp.asarray(
        np.sort(rng.integers(0, nblocks, size=(QB, nb)), axis=1),
        dtype=jnp.int32)
    A = [jnp.asarray(rng.random((QB, B, W), dtype=np.float32) * 1e-3)
         for _ in range(3)]
    Ab = [a.astype(jnp.bfloat16) for a in A]
    base_v = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(4)]
    ITERS = 20

    def pad_blocks(x):
        return jnp.pad(x, (0, nblocks * blk - n)).reshape(nblocks, blk)

    def one_iter(mats, x, cast):
        # dr-style: 3 matvecs of the 3 velocity components + dot with self
        vwin = [pad_blocks(v + x * 1e-12)[blkids].reshape(QB, W)
                for v in base_v[:3]]
        dr = sum(
            jnp.einsum("qbw,qw->qb", m, w.astype(m.dtype)).astype(jnp.float32)
            for m, w in zip(mats, vwin)).reshape(-1)[:n]
        # delta-style: 3 matvecs of one scalar field k
        k = dr * 1e-3
        kwin = pad_blocks(k)[blkids].reshape(QB, W)
        delta = [jnp.einsum("qbw,qw->qb", m,
                            kwin.astype(m.dtype)).astype(jnp.float32)
                 .reshape(-1)[:n] for m in mats]
        return x + (delta[0] + delta[1] + delta[2]) * 1e-12, dr

    @jax.jit
    def run(mats, x0):
        def body(i, c):
            acc, x = c
            x, dr = one_iter(mats, x, None)
            return acc + jnp.sum(dr), x
        acc, x = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x0))
        return acc + jnp.sum(x)

    for name, mats in [("f32", A), ("bf16", Ab)]:
        t = sync_time(run, mats, base_v[3]) / ITERS
        print(f"[matvec {name}] B={B} blk={blk} nb={nb} (W={W}): "
              f"{t*1e3:.3f} ms/iter", flush=True)


def abuild_probe(scene, state, n, B, blk, nb):
    """Dense A-build: fetch block positions, compute coeffs (QB, B, W) x3."""
    st = scene.static
    QB = (n + B - 1) // B
    W = nb * blk
    nblocks = (n + blk - 1) // blk
    rng = np.random.default_rng(1)
    blkids = jnp.asarray(
        np.sort(rng.integers(0, nblocks, size=(QB, nb)), axis=1),
        dtype=jnp.int32)
    pos = state.fluid.pos
    h = st.h

    @jax.jit
    def build():
        comps = []
        for c in (pos.x, pos.y, pos.z):
            t = jnp.pad(c, (0, nblocks * blk - n))
            comps.append(t.reshape(nblocks, blk)[blkids].reshape(QB, 1, W))
        qx = pos.x[:QB * B].reshape(QB, B, 1)
        qy = pos.y[:QB * B].reshape(QB, B, 1)
        qz = pos.z[:QB * B].reshape(QB, B, 1)
        dx = qx - comps[0]
        dy = qy - comps[1]
        dz = qz - comps[2]
        r2 = dx * dx + dy * dy + dz * dz
        ok = (r2 <= h * h) & (r2 > 0)
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        from cfd_taichi_tpu.ops import smoothing as sm
        gc = sm.cubic_grad_coeff(r, h)
        w = jnp.where(ok, gc, 0.0)
        ax, ay, az = w * dx, w * dy, w * dz
        return jnp.sum(ax) + jnp.sum(ay) + jnp.sum(az) + jnp.sum(
            ok.sum(axis=2))

    t = sync_time(build)
    print(f"[A-build dense] B={B} blk={blk} nb={nb} (QBxBxW={QB}x{B}x{W}): "
          f"{t*1e3:.2f} ms/step", flush=True)


def carry_probe(n):
    rng = np.random.default_rng(2)
    idxK = jnp.asarray(rng.integers(0, n, size=(n, 48)), dtype=jnp.int32)
    base_f = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(8)]
    ITERS = 20

    def tuple_run():
        def body(i, c):
            a, b, cc, d, e = c
            tbl = jnp.stack([a, b, cc, d], axis=0)
            rows = tbl[:, idxK]
            s = jnp.sum(rows[0], axis=1)
            return (a + s * 1e-12, b + s * 1e-12, cc + s * 1e-12,
                    d + s * 1e-12, e + s * 1e-12)
        out = jax.lax.fori_loop(0, ITERS, body, tuple(base_f[:5]))
        return sum(jnp.sum(x) for x in out)

    def packed_run():
        def body(i, P):
            rows = P[:4][:, idxK]
            s = jnp.sum(rows[0], axis=1)
            return P + s[None, :] * 1e-12
        out = jax.lax.fori_loop(0, ITERS, body, jnp.stack(base_f[:5], axis=0))
        return jnp.sum(out)

    t1 = sync_time(jax.jit(tuple_run)) / ITERS
    t2 = sync_time(jax.jit(packed_run)) / ITERS
    print(f"[carry] tuple-of-5 (N,): {t1*1e3:.3f} ms/iter; "
          f"packed (5,N): {t2*1e3:.3f} ms/iter", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    measure_floor()
    scene, state = hot_state()
    n = scene.static.n_fluid
    if os.environ.get("PROBE_STATS"):
        block_stats(scene, state)
    # Measured on 2026-08-17: B=8/16 blk=128 -> nb max 11, p99 9, avg 7.4.
    nb = 12
    matvec_probe(scene, n, 8, 128, nb)
    matvec_probe(scene, n, 16, 128, nb)
    abuild_probe(scene, state, n, 8, 128, nb)
    abuild_probe(scene, state, n, 16, 128, nb)
    carry_probe(n)
    print("done", flush=True)


if __name__ == "__main__":
    main()
