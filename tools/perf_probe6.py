"""Round-3 probe #6: coef-engine matvec formulations at 1M shapes.

The production einsum 'qbw,qrw->qbr' is a batch of (8, W) x (W, 4) tiny
matmuls — MXU tiles are 128x128, so utilization is ~2%. Candidates:
  a. current einsum
  b. broadcast multiply + sum over W (VPU, fusable to one HBM pass)
  c. four separate fused reductions
  d. b with the reduce split as (nbcap, 128) then summed

    nohup python tools/perf_probe6.py > /tmp/perf_probe6.log 2>&1 &
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

QB, B, NB = 125000, 8, 25
W = NB * 128
NBLK = 7813


def sync_time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:128].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    # build w chunked in bf16 (an f32 (QB, B, W) temp would be 12.8 GB)
    base = (jax.random.normal(key, (1, B, W)) * 0.01).astype(jnp.bfloat16)
    scale = (jnp.arange(QB, dtype=jnp.float32) % 7.0 / 7.0
             ).astype(jnp.bfloat16)[:, None, None]
    w = jax.jit(lambda b, s: b * s)(base, scale)
    blk = jnp.tile(jnp.arange(NB, dtype=jnp.int32)[None], (QB, 1)) \
        + (jnp.arange(QB, dtype=jnp.int32)[:, None] // 16)
    blk = jnp.minimum(blk, NBLK - 1)
    tbl = jax.random.normal(key, (NBLK, 128)).astype(jnp.float32)

    nc = max(1, QB // max(1, (64 << 20) // (4 * W * 2)))
    while QB % nc:
        nc += 1
    Qc = QB // nc
    print(f"QB={QB} B={B} W={W} nc={nc} Qc={Qc} "
          f"w bytes={w.size*2/1e9:.2f} GB", flush=True)

    w_r = w.reshape(nc, Qc, B, W)
    blk_r = blk.reshape(nc, Qc, NB)

    def run(chunk_fn):
        out = jax.lax.map(chunk_fn, (w_r, blk_r))
        return out

    @jax.jit
    def f_einsum(w_r, blk_r, tbl):
        def chunk(args):
            w_c, blk_c = args
            kwin = tbl[blk_c].reshape(Qc, W)
            rhs = jnp.stack([kwin, kwin * 0.5, kwin * 0.25, kwin * 2.0],
                            axis=1).astype(w_c.dtype)
            return jnp.einsum("qbw,qrw->qbr", w_c, rhs,
                              preferred_element_type=jnp.float32)
        return jax.lax.map(chunk, (w_r, blk_r))

    @jax.jit
    def f_mulsum(w_r, blk_r, tbl):
        def chunk(args):
            w_c, blk_c = args
            kwin = tbl[blk_c].reshape(Qc, W)
            rhs = jnp.stack([kwin, kwin * 0.5, kwin * 0.25, kwin * 2.0],
                            axis=1).astype(w_c.dtype)   # (Qc, 4, W)
            prod = (w_c[:, :, None, :].astype(jnp.float32)
                    * rhs[:, None, :, :].astype(jnp.float32))
            return prod.sum(axis=3)                      # (Qc, B, 4)
        return jax.lax.map(chunk, (w_r, blk_r))

    @jax.jit
    def f_fourred(w_r, blk_r, tbl):
        def chunk(args):
            w_c, blk_c = args
            kwin = tbl[blk_c].reshape(Qc, 1, W)
            wf = w_c.astype(jnp.float32)
            o0 = (wf * kwin).sum(axis=2)
            o1 = (wf * (kwin * 0.5)).sum(axis=2)
            o2 = (wf * (kwin * 0.25)).sum(axis=2)
            o3 = (wf * (kwin * 2.0)).sum(axis=2)
            return jnp.stack([o0, o1, o2, o3], axis=-1)
        return jax.lax.map(chunk, (w_r, blk_r))

    @jax.jit
    def f_blocked(w_r, blk_r, tbl):
        def chunk(args):
            w_c, blk_c = args
            kwin = tbl[blk_c].reshape(Qc, 1, NB, 128)
            wf = w_c.reshape(Qc, B, NB, 128).astype(jnp.float32)
            o0 = (wf * kwin).sum(axis=(2, 3))
            o1 = (wf * (kwin * 0.5)).sum(axis=(2, 3))
            o2 = (wf * (kwin * 0.25)).sum(axis=(2, 3))
            o3 = (wf * (kwin * 2.0)).sum(axis=(2, 3))
            return jnp.stack([o0, o1, o2, o3], axis=-1)
        return jax.lax.map(chunk, (w_r, blk_r))

    for name, f in (("einsum", f_einsum), ("mulsum", f_mulsum),
                    ("fourred", f_fourred), ("blocked", f_blocked)):
        try:
            t = sync_time(f, w_r, blk_r, tbl)
            print(f"{name}: {t*1e3:.1f} ms  ({w.size*2/t/1e9:.0f} GB/s on w)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)

    # sanity: results agree
    a = f_einsum(w_r, blk_r, tbl)
    b = f_mulsum(w_r, blk_r, tbl)
    print("max diff einsum vs mulsum:",
          float(jnp.max(jnp.abs(a - b))), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
