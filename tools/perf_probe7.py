"""Round-3 probe #7: coef matvec — product-table rhs + chunk-size sweep.

Production matvec rhs = [kwin, wx*kwin, wy*kwin, wz*kwin] (3 window
gathers + 3 W-wide multiplies). Algebraic alternative: multiply at the
SOURCE TABLE (nblocks x 128 — 4 MB) and window-gather the 4 product
tables instead. Also sweeps the lax.map chunk budget.

    nohup python tools/perf_probe7.py > /tmp/perf_probe7.log 2>&1 &
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

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
    base = (jax.random.normal(key, (1, B, W)) * 0.01).astype(jnp.bfloat16)
    scale = (jnp.arange(QB, dtype=jnp.float32) % 7.0 / 7.0
             ).astype(jnp.bfloat16)[:, None, None]
    w = jax.jit(lambda b, s: b * s)(base, scale)
    blk = jnp.tile(jnp.arange(NB, dtype=jnp.int32)[None], (QB, 1)) \
        + (jnp.arange(QB, dtype=jnp.int32)[:, None] // 16)
    blk = jnp.minimum(blk, NBLK - 1)
    tk = jax.random.normal(key, (NBLK, 128)).astype(jnp.float32)
    tx = tk * 0.3
    ty = tk * 0.7
    tz = tk * 1.1
    qx = jnp.ones((QB, B), jnp.float32) * 0.1

    for budget_mb in (64, 256, 768):
        target = max(1, (budget_mb << 20) // (4 * W * 2))
        nc = 1
        if QB > target:
            nc = -(-QB // target)
            while QB % nc:
                nc += 1
        Qc = QB // nc
        w_r = w.reshape(nc, Qc, B, W)
        blk_r = blk.reshape(nc, Qc, NB)
        qx_r = qx.reshape(nc, Qc, B)

        @jax.jit
        def f_prodtab(w_r, blk_r, qx_r, tk, tx, ty, tz):
            # product tables once per matvec (4 MB each)
            p0 = tk.astype(jnp.bfloat16)
            p1 = (tx * tk).astype(jnp.bfloat16)
            p2 = (ty * tk).astype(jnp.bfloat16)
            p3 = (tz * tk).astype(jnp.bfloat16)
            tab = jnp.stack([p0, p1, p2, p3], axis=1)  # (NBLK, 4, 128)

            def chunk(args):
                w_c, blk_c, qx_c = args
                rhs = tab[blk_c]                        # (Qc, NB, 4, 128)
                rhs = rhs.transpose(0, 2, 1, 3).reshape(Qc, 4, W)
                out = jnp.einsum("qbw,qrw->qbr", w_c, rhs,
                                 preferred_element_type=jnp.float32)
                return qx_c * out[..., 0] - out[..., 1]
            return jax.lax.map(chunk, (w_r, blk_r, qx_r))

        @jax.jit
        def f_prodwin(w_r, blk_r, qx_r, tk, tx, ty, tz):
            # production-style: gather raw windows, multiply at W width
            def chunk(args):
                w_c, blk_c, qx_c = args
                kwin = tk[blk_c].reshape(Qc, W)
                wx = tx[blk_c].reshape(Qc, W)
                wy = ty[blk_c].reshape(Qc, W)
                wz = tz[blk_c].reshape(Qc, W)
                rhs = jnp.stack([kwin, wx * kwin, wy * kwin, wz * kwin],
                                axis=1).astype(w_c.dtype)
                out = jnp.einsum("qbw,qrw->qbr", w_c, rhs,
                                 preferred_element_type=jnp.float32)
                return qx_c * out[..., 0] - out[..., 1]
            return jax.lax.map(chunk, (w_r, blk_r, qx_r))

        for name, f in (("prodtab", f_prodtab), ("prodwin", f_prodwin)):
            try:
                t = sync_time(f, w_r, blk_r, qx_r, tk, tx, ty, tz)
                print(f"budget={budget_mb}MB nc={nc} {name}: {t*1e3:.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"budget={budget_mb}MB {name}: FAILED "
                      f"{type(e).__name__}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
