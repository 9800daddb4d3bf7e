"""Round-4 probe 1: bf16 layout padding + HBM roofline on the real chip.

Hypotheses (at 1M coef-engine shapes, QB=125k, B=8, W=1536):
  H1. A (QB, 8, W) bf16 array is sublane-padded 8 -> 16 (bf16 min tile
      (16, 128)): reads stream 2x logical bytes vs (8, QB, W) / (QB*8, W).
  H2. The matvec rhs stack (Qc, 4, W) bf16 pads 4 -> 16 (4x).
  H3. Peak effective HBM rate via a big f32 reduce, anchoring the roofline.

Timing per ARCHITECTURE.md: every rep ends in a data-dependent scalar
fetch (block_until_ready through the tunnel under-reports).
Run: timeout 580 python -u tools/perf_r4_layout.py
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

QB, B, W = 125_000, 8, 1536
REPS = 6
STAGE = os.environ.get("STAGE", "all")


def mk(shape, dtype):
    # Cheap deterministic fill (iota-based; no RNG kernels, no zeros that
    # a clever compiler could const-fold).
    n = 1
    for s in shape:
        n *= s
    return (jnp.arange(n, dtype=jnp.float32) % 1013).astype(dtype).reshape(shape)


def timeit(name, fn, *args, logical_bytes=None, reps=REPS):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = f(*args)
    _ = float(jnp.sum(r) if getattr(r, "ndim", 0) else r)
    print(f"  [{name} compiled in {time.perf_counter()-t0:.1f}s]", flush=True)
    _ = float(jnp.sum(f(*args)) if getattr(r, "ndim", 0) else f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        _ = float(jnp.sum(out) if getattr(out, "ndim", 0) else out)
    dt = (time.perf_counter() - t0) / reps
    line = f"{name}: {dt*1e3:.2f} ms"
    if logical_bytes:
        line += f"  ({logical_bytes/dt/1e9:.0f} GB/s logical)"
    print(line, flush=True)
    return dt


def mem(tag):
    try:
        ms = jax.devices()[0].memory_stats()
        print(f"mem[{tag}]:", {k: ms[k] for k in
                               ("bytes_in_use", "peak_bytes_in_use")
                               if k in ms}, flush=True)
    except Exception as e:
        print("memstats n/a", e, flush=True)


def main():
    print("device:", jax.devices(), flush=True)

    if STAGE in ("all", "hbm"):
        big = mk((1 << 28,), jnp.float32)  # 1 GiB
        timeit("f32 reduce 1GiB", lambda x: jnp.sum(x), big,
               logical_bytes=big.size * 4)
        del big

    if STAGE in ("all", "layout"):
        n_small = QB // 8
        lb = n_small * B * W * 2
        w_qbw = mk((n_small, B, W), jnp.bfloat16)
        mem("after (QB,8,W) alloc of logical %dMB" % (lb >> 20))
        timeit("bf16 (QB,8,W) reduce",
               lambda x: jnp.sum(x.astype(jnp.float32)), w_qbw,
               logical_bytes=lb)
        del w_qbw
        w_bqw = mk((B, n_small, W), jnp.bfloat16)
        timeit("bf16 (8,QB,W) reduce",
               lambda x: jnp.sum(x.astype(jnp.float32)), w_bqw,
               logical_bytes=lb)
        del w_bqw
        r_q4w = mk((n_small * 2, 4, W), jnp.bfloat16)
        lr = n_small * 2 * 4 * W * 2
        mem("after (Q,4,W) alloc of logical %dMB" % (lr >> 20))
        timeit("bf16 (Q,4,W) reduce",
               lambda x: jnp.sum(x.astype(jnp.float32)), r_q4w,
               logical_bytes=lr)
        del r_q4w

    if STAGE in ("all", "einsum"):
        w3 = mk((QB, B, W), jnp.bfloat16)
        rhs_q = mk((QB, 4, W), jnp.bfloat16)
        lbw = QB * B * W * 2
        timeit("einsum qbw,qrw->qbr",
               lambda w, r: jnp.einsum("qbw,qrw->qbr", w, r,
                                       preferred_element_type=jnp.float32
                                       ).sum(), w3, rhs_q, logical_bytes=lbw)
        del rhs_q
        rhs_r = mk((4, QB, W), jnp.bfloat16)
        timeit("einsum qbw,rqw->qbr",
               lambda w, r: jnp.einsum("qbw,rqw->qbr", w, r,
                                       preferred_element_type=jnp.float32
                                       ).sum(), w3, rhs_r, logical_bytes=lbw)
        del w3
        w_b = mk((B, QB, W), jnp.bfloat16)
        timeit("einsum bqw,rqw->bqr",
               lambda w, r: jnp.einsum("bqw,rqw->bqr", w, r,
                                       preferred_element_type=jnp.float32
                                       ).sum(), w_b, rhs_r, logical_bytes=lbw)
        mem("end")
    print("done", flush=True)


if __name__ == "__main__":
    main()
