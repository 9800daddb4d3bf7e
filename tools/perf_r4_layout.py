"""Round-4 probe 1: bf16 layout padding + HBM roofline on the real chip.

Hypotheses to verify (all at 1M coef-engine shapes, QB=125k, B=8, W=1536):
  H1. A (QB, 8, W) bf16 array is sublane-padded 8 -> 16 (bf16 min tile is
      (16, 128)), so every read streams 2x its logical bytes. A (8, QB, W)
      or (QB*8, W) layout would not pad.
  H2. The matvec rhs stack (Qc, 4, W) bf16 pads 4 -> 16 (4x).
  H3. Peak effective HBM rate via a big reduce, to anchor the roofline.

Timing per ARCHITECTURE.md: every rep ends in a data-dependent scalar
fetch (block_until_ready through the tunnel under-reports).
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

QB, B, W = 125_000, 8, 1536
REPS = 8


def timeit(name, fn, *args, logical_bytes=None, reps=REPS):
    f = jax.jit(fn)
    r = f(*args)
    _ = float(jnp.sum(r) if r.ndim else r)  # compile + settle
    _ = float(jnp.sum(f(*args)) if r.ndim else f(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        out = f(*args)
        acc += float(jnp.sum(out) if out.ndim else out)
    dt = (time.perf_counter() - t0) / reps
    line = f"{name}: {dt*1e3:.2f} ms"
    if logical_bytes:
        line += f"  ({logical_bytes/dt/1e9:.0f} GB/s logical)"
    print(line, flush=True)
    return dt


def main():
    print("device:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # H3: HBM peak via f32 reduce of 4 GB.
    big = jax.random.normal(key, (1 << 30,), jnp.float32)  # 4 GiB
    t = timeit("f32 reduce 4GiB", lambda x: jnp.sum(x), big,
               logical_bytes=big.size * 4)
    del big

    # H1: bf16 read rate by layout. Logical bytes identical (384 MB).
    n_small = QB // 8  # keep each at ~384 MB so all three fit
    w_qbw = jax.random.normal(key, (n_small, B, W), jnp.bfloat16)
    w_bqw = jax.random.normal(key, (B, n_small, W), jnp.bfloat16)
    w_nw = jax.random.normal(key, (n_small * B, W), jnp.bfloat16)
    lb = n_small * B * W * 2
    timeit("bf16 (QB,8,W) reduce", lambda x: jnp.sum(x.astype(jnp.float32)),
           w_qbw, logical_bytes=lb)
    timeit("bf16 (8,QB,W) reduce", lambda x: jnp.sum(x.astype(jnp.float32)),
           w_bqw, logical_bytes=lb)
    timeit("bf16 (QB*8,W) reduce", lambda x: jnp.sum(x.astype(jnp.float32)),
           w_nw, logical_bytes=lb)
    # Also H2 proxy: (Qc, 4, W) vs (4, Qc, W)
    r_q4w = jax.random.normal(key, (n_small * 2, 4, W), jnp.bfloat16)
    r_4qw = jax.random.normal(key, (4, n_small * 2, W), jnp.bfloat16)
    lr = n_small * 2 * 4 * W * 2
    timeit("bf16 (Q,4,W) reduce", lambda x: jnp.sum(x.astype(jnp.float32)),
           r_q4w, logical_bytes=lr)
    timeit("bf16 (4,Q,W) reduce", lambda x: jnp.sum(x.astype(jnp.float32)),
           r_4qw, logical_bytes=lr)
    del w_qbw, w_bqw, w_nw, r_q4w, r_4qw

    # Device memory stats if available
    try:
        ms = jax.devices()[0].memory_stats()
        print("mem:", {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                       if k in ms}, flush=True)
    except Exception as e:
        print("memstats n/a", e)

    # einsum variants at full matvec shape: w (QB,B,W) bf16, rhs 4-wide.
    w3 = jax.random.normal(key, (QB, B, W), jnp.bfloat16)      # 3.07 GB logical
    rhs_q = jax.random.normal(key, (QB, 4, W), jnp.bfloat16)   # 1.5 GB logical
    lbw = QB * B * W * 2

    def mv_qrw(w, r):
        return jnp.einsum("qbw,qrw->qbr", w, r,
                          preferred_element_type=jnp.float32).sum()
    timeit("einsum qbw,qrw->qbr", mv_qrw, w3, rhs_q, logical_bytes=lbw)
    del rhs_q
    rhs_r = jax.random.normal(key, (4, QB, W), jnp.bfloat16)

    def mv_rqw(w, r):
        return jnp.einsum("qbw,rqw->qbr", w, r,
                          preferred_element_type=jnp.float32).sum()
    timeit("einsum qbw,rqw->qbr", mv_rqw, w3, rhs_r, logical_bytes=lbw)
    del w3
    w_b = jax.random.normal(key, (B, QB, W), jnp.bfloat16)

    def mv_bq(w, r):
        return jnp.einsum("bqw,rqw->qbr", w, r,
                          preferred_element_type=jnp.float32).sum()
    timeit("einsum bqw,rqw->qbr", mv_bq, w_b, rhs_r, logical_bytes=lbw)

    def mv_bq2(w, r):
        return jnp.einsum("bqw,rqw->bqr", w, r,
                          preferred_element_type=jnp.float32).sum()
    timeit("einsum bqw,rqw->bqr", mv_bq2, w_b, rhs_r, logical_bytes=lbw)
    try:
        ms = jax.devices()[0].memory_stats()
        print("mem:", {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                       if k in ms}, flush=True)
    except Exception:
        pass
    print("done", flush=True)


if __name__ == "__main__":
    main()
