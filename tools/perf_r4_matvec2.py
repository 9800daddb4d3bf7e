"""Round-4 probe 3: decompose the 32 ms production coef matvec.

V0 (production) = tab build + block-row gather + transpose + rhs
stack/cast + einsum, measured 32 ms at 2^20 particles vs a 4.6 ms
w-read roofline. Pieces probed here, all chained like perf_r4_matvec:

  P1  gather only: pw = tab[blk_c] (f32 2KB block rows) + tiny reduce
  P2  rhs build: gather + transpose + center-FMA + bf16 cast (no einsum)
  V7  no-transpose einsum keeping n: 'qbnc,qnrc->qbnr' in f32 over
      ABSOLUTE product windows (algebraically exact in f32; the group
      centering exists only to protect bf16 — unnecessary at f32), then
      the x_q * Sigma - Sigma combination on the small outputs
  V8  same but summing n inside: 'qbnc,qnrc->qbr'
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from cfd_taichi_tpu.ops import bandmat

N = 1 << 20
B = 8
QB = N // B
NBA = 12
W = NBA * bandmat.BLOCK
NBLOCKS = N // bandmat.BLOCK
K_IT = 20
STAGE = os.environ.get("STAGE", "all")


def mk(shape, dtype=jnp.float32, scale=1.0):
    n = 1
    for s in shape:
        n *= s
    return ((jnp.arange(n, dtype=jnp.float32) % 1013) * (scale / 1013.0)
            ).astype(dtype).reshape(shape)


def chain_time(name, step_fn, x0, *consts, k_it=K_IT):
    @jax.jit
    def run(x, *cs):
        return jax.lax.fori_loop(0, k_it, lambda i, c: step_fn(c, *cs), x)

    t0 = time.perf_counter()
    out = run(x0, *consts)
    _ = float(jnp.sum(out))
    print(f"  [{name} compiled+1st in {time.perf_counter()-t0:.1f}s]",
          flush=True)
    t0 = time.perf_counter()
    out = run(x0, *consts)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0 - 0.026) / k_it
    print(f"{name}: {dt*1e3:.2f} ms/iter  (chk {s:.3e})", flush=True)
    return dt


nc = bandmat._coef_chunks(QB, W)
Qc = QB // nc


def resh(a):
    return a.reshape((nc, Qc) + a.shape[1:])


def main():
    print(f"device: {jax.devices()}  nc={nc} Qc={Qc}", flush=True)
    blk = (jnp.arange(QB, dtype=jnp.int32)[:, None] * NBLOCKS // QB
           + jnp.arange(NBA, dtype=jnp.int32)[None, :]) % NBLOCKS
    tbx = mk((NBLOCKS, bandmat.BLOCK), scale=10.0)
    tby = mk((NBLOCKS, bandmat.BLOCK), scale=7.0)
    tbz = mk((NBLOCKS, bandmat.BLOCK), scale=6.0)
    qx = mk((QB, B), scale=10.0)
    qy = mk((QB, B), scale=7.0)
    qz = mk((QB, B), scale=6.0)
    blk_r = resh(blk)
    qx_r, qy_r, qz_r = resh(qx), resh(qy), resh(qz)

    if STAGE in ("all", "p1"):
        def p1(k, blk_r, tbx, tby, tbz):
            tbl = k.reshape(NBLOCKS, bandmat.BLOCK)
            tab = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=1)

            def chunk(args):
                (blk_c,) = args
                pw = tab[blk_c]                  # (Qc, NBA, 4, 128) f32
                return pw.sum(axis=(1, 2, 3))    # (Qc,)

            out = jax.lax.map(chunk, (blk_r,))
            return k * 0.5 + jnp.pad(out.reshape(-1) * 1e-6,
                                     (0, N - QB))
        chain_time("P1 tab+gather only", p1, mk((N,)), blk_r, tbx, tby, tbz)

    if STAGE in ("all", "p2"):
        def p2(k, blk_r, tbx, tby, tbz, cx_r, cy_r, cz_r):
            tbl = k.reshape(NBLOCKS, bandmat.BLOCK)
            tab = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=1)

            def chunk(args):
                blk_c, cx_c, cy_c, cz_c = args
                pw = tab[blk_c]                          # (Qc, NBA, 4, 128)
                pw = pw.transpose(0, 2, 1, 3).reshape(Qc, 4, W)
                kwin = pw[:, 0, :]
                rhs = jnp.stack(
                    [kwin,
                     pw[:, 1, :] - cx_c[:, None] * kwin,
                     pw[:, 2, :] - cy_c[:, None] * kwin,
                     pw[:, 3, :] - cz_c[:, None] * kwin],
                    axis=1).astype(jnp.bfloat16)
                return rhs.astype(jnp.float32).sum(axis=(1, 2))

            out = jax.lax.map(chunk, (blk_r, cx_r, cy_r, cz_r))
            return k * 0.5 + jnp.pad(out.reshape(-1) * 1e-6, (0, N - QB))
        cx_r = resh(mk((QB,), scale=10.0))
        cy_r = resh(mk((QB,), scale=7.0))
        cz_r = resh(mk((QB,), scale=6.0))
        chain_time("P2 rhs build (no einsum)", p2, mk((N,)), blk_r,
                   tbx, tby, tbz, cx_r, cy_r, cz_r)

    for name, keep_n in (("V7 qbnc,qnrc->qbnr f32", True),
                         ("V8 qbnc,qnrc->qbr f32", False)):
        if STAGE not in ("all", "v7" if keep_n else "v8"):
            continue
        w3 = mk((QB, B, W), jnp.bfloat16, scale=1e-3)
        w_r = resh(w3).reshape(nc, Qc, B, NBA, bandmat.BLOCK)

        def mv(k, w_r, blk_r, tbx, tby, tbz, qx_r, qy_r, qz_r,
               _keep=keep_n):
            tbl = k.reshape(NBLOCKS, bandmat.BLOCK)
            tab = jnp.stack([tbl, tbx * tbl, tby * tbl, tbz * tbl], axis=1)

            def chunk(args):
                w_c, blk_c, qx_c, qy_c, qz_c = args
                pw = tab[blk_c]                      # (Qc, NBA, 4, 128) f32
                wf = w_c.astype(jnp.float32)
                if _keep:
                    out = jnp.einsum("qbnc,qnrc->qbnr", wf, pw,
                                     preferred_element_type=jnp.float32)
                    out = out.sum(axis=2)            # (Qc, B, 4)
                else:
                    out = jnp.einsum("qbnc,qnrc->qbr", wf, pw,
                                     preferred_element_type=jnp.float32)
                # mv_x = x_q * Sigma w k - Sigma w x_j k  (f32-exact, no
                # centering needed)
                return qx_c * out[..., 0] - out[..., 1]

            out = jax.lax.map(chunk, (w_r, blk_r, qx_r, qy_r, qz_r))
            return out.reshape(-1)[:N] * 1e-3

        chain_time(name, mv, mk((N,)), w_r, blk_r, tbx, tby, tbz,
                   qx_r, qy_r, qz_r)
        del w3, w_r
    print("done", flush=True)


if __name__ == "__main__":
    main()
