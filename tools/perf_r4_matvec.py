"""Round-4 probe 2: coef-engine matvec variants at 1M shapes, chained.

Probe 1 showed the tunnel's dispatch+fetch RTT floor is ~26 ms — any
per-call timing is useless. Here every variant runs K chained iterations
inside ONE lax.fori_loop under ONE jit call (the carry feeds the next
matvec's input, so nothing can be hoisted or pipelined away), with one
scalar fetch at the end: ms/iteration = (wall - RTT) / K.

Variants (matvec = Sigma_j w_ij d_c k_j via the group-centered split):
  V0  production coef_matvec_ops.matvec (prod-table gather -> transpose ->
      (Qc, 4, W) bf16 rhs stack -> einsum 'qbw,qrw->qbr')
  V1  rhs built leading-dim: tab (4, nblocks, 128), gather -> (4, Qc, W),
      einsum 'qbw,rqw->qbr' — no transpose, no (Qc, 4, W) stack (which
      bf16-pads 4 -> 16 sublanes if H2 holds)
  V2  V1 + w stored (B, QB, W) (avoids the (QB, 8, W) bf16 8 -> 16 sublane
      pad if H1 holds), einsum 'bqw,rqw->bqr'
  V3  V2 for matvec_dot
Also: raw chained reduce of w in (QB,8,W) vs (B,QB,W) layout to measure
the padding factor directly, and a chained big-reduce for the HBM anchor.
"""
import os, sys, time, functools
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops.vec import V3

N = 1 << 20   # divisible by BLOCK and B (production pads; probe keeps exact)
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
    """step_fn: (carry, *consts) -> carry. One jit'd fori_loop, one fetch.
    Consts MUST travel as jit arguments: a captured 3 GB closure array is
    baked into the program as a literal constant and re-shipped through
    the tunnel at lowering time (minutes)."""
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


def main():
    print("device:", jax.devices(), flush=True)

    def rd(c, w):
        # c: () f32. max over w offset by c: must re-read w each iter.
        return jnp.max(w.astype(jnp.float32) + c) * 1e-6

    if STAGE in ("all", "read"):
        # Padding factor: chained masked-max read (not hoistable, reads all
        # of w each iteration, no extra big temps).
        w_qbw = mk((QB, B, W), jnp.bfloat16)
        lb = QB * B * W * 2
        d0 = chain_time("read w (QB,8,W)", rd, jnp.zeros(()), w_qbw)
        print(f"   -> {lb/d0/1e9:.0f} GB/s logical", flush=True)
        del w_qbw
        w_bqw = mk((B, QB, W), jnp.bfloat16)
        d1 = chain_time("read w (8,QB,W)", rd, jnp.zeros(()), w_bqw)
        print(f"   -> {lb/d1/1e9:.0f} GB/s logical; pad factor "
              f"{d0/max(d1,1e-9):.2f}", flush=True)
        del w_bqw
        big = mk((1 << 28,), jnp.float32)
        d2 = chain_time("read f32 1GiB", rd, jnp.zeros(()), big)
        print(f"   -> {(1 << 30)/d2/1e9:.0f} GB/s (HBM anchor)", flush=True)
        del big

    # Shared synthetic plan/tables for matvec variants.
    blk = (jnp.arange(QB, dtype=jnp.int32)[:, None] * NBLOCKS // QB
           + jnp.arange(NBA, dtype=jnp.int32)[None, :]) % NBLOCKS
    tbx = mk((NBLOCKS, bandmat.BLOCK), scale=10.0)
    tby = mk((NBLOCKS, bandmat.BLOCK), scale=7.0)
    tbz = mk((NBLOCKS, bandmat.BLOCK), scale=6.0)
    cx, cy, cz = (mk((QB,), scale=10.0), mk((QB,), scale=7.0),
                  mk((QB,), scale=6.0))
    qx, qy, qz = (mk((QB, B), scale=0.1), mk((QB, B), scale=0.1),
                  mk((QB, B), scale=0.1))
    s3 = V3(mk((N,)), mk((N,)), mk((N,)))

    if STAGE in ("all", "v0"):
        w_qbw = mk((QB, B, W), jnp.bfloat16, scale=1e-3)
        eng = bandmat.CoefEngine(blkq=blk, w=w_qbw, tbx=tbx, tby=tby,
                                 tbz=tbz, cx=cx, cy=cy, cz=cz,
                                 qx=qx, qy=qy, qz=qz, s=s3,
                                 overflow=jnp.zeros((), jnp.int32))
        leaves, treedef = jax.tree_util.tree_flatten(eng)

        def step_mv(k, *lv):
            e = jax.tree_util.tree_unflatten(treedef, lv)
            mv, _ = bandmat.coef_matvec_ops(e, N, B)
            return mv(k).x * 1e-3
        chain_time("V0 matvec (production)", step_mv, mk((N,)), *leaves)

        def step_mvd(k, *lv):
            e = jax.tree_util.tree_unflatten(treedef, lv)
            _, mvd = bandmat.coef_matvec_ops(e, N, B)
            return mvd(V3(k, k, k)) * 1e-3
        chain_time("V0 matvec_dot (production)", step_mvd, mk((N,)),
                   *leaves)
        del w_qbw, eng, leaves

    nc = bandmat._coef_chunks(QB, W)
    Qc = QB // nc
    print(f"nc={nc} Qc={Qc}", flush=True)

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    blk_r = resh(blk)
    cx_r, cy_r, cz_r = resh(cx), resh(cy), resh(cz)
    qx_r = resh(qx)

    def mv1(k, w_r, tab4):
        tbl = k.reshape(NBLOCKS, bandmat.BLOCK)
        tab = tab4 * tbl[None]          # (4, nblocks, 128) f32

        def chunk(args):
            w_c, blk_c, cx_c, cy_c, cz_c, qx_c = args
            pw = tab[:, blk_c].reshape(4, Qc, W)   # (4, Qc, W) f32
            kwin = pw[0]
            rhs = jnp.stack(
                [kwin, pw[1] - cx_c[:, None] * kwin,
                 pw[2] - cy_c[:, None] * kwin,
                 pw[3] - cz_c[:, None] * kwin],
                axis=0).astype(w_c.dtype)          # (4, Qc, W)
            ein = ("qbw,rqw->qbr" if w_c.ndim == 3 and w_c.shape[0] == Qc
                   else "bqw,rqw->qbr")
            out = jnp.einsum(ein, w_c, rhs,
                             preferred_element_type=jnp.float32)
            return qx_c * out[..., 0] - out[..., 1]

        out = jax.lax.map(chunk, (w_r, blk_r, cx_r, cy_r, cz_r, qx_r))
        return out.reshape(-1)[:N] * 1e-3

    if STAGE in ("all", "v1"):
        w_qbw = mk((QB, B, W), jnp.bfloat16, scale=1e-3)
        tab4 = jnp.stack([jnp.ones_like(tbx), tbx, tby, tbz], axis=0)
        chain_time("V1 matvec (lead-dim rhs)", mv1, mk((N,)),
                   resh(w_qbw), tab4)
        del w_qbw

    if STAGE in ("all", "v2"):
        w_bqw = mk((B, QB, W), jnp.bfloat16, scale=1e-3)
        tab4 = jnp.stack([jnp.ones_like(tbx), tbx, tby, tbz], axis=0)
        w_r2 = w_bqw.reshape(B, nc, Qc, W).transpose(1, 0, 2, 3)
        chain_time("V2 matvec (lead-dim w+rhs)", mv1, mk((N,)), w_r2, tab4)

        def mvd2(k, w_r, tbx, tby, tbz):
            tbl = k.reshape(NBLOCKS, bandmat.BLOCK)
            sdot = tbx * tbl + tby * tbl + tbz * tbl
            tab = jnp.stack([tbl, tbl, tbl, sdot], axis=0)

            def chunk(args):
                w_c, blk_c, cx_c, cy_c, cz_c, qx_c = args
                pw = tab[:, blk_c].reshape(4, Qc, W)
                u = (pw[3] - cx_c[:, None] * pw[0]
                     - cy_c[:, None] * pw[1]
                     - cz_c[:, None] * pw[2])
                rhs = jnp.stack([pw[0], pw[1], pw[2], u],
                                axis=0).astype(w_c.dtype)
                out = jnp.einsum("bqw,rqw->qbr", w_c, rhs,
                                 preferred_element_type=jnp.float32)
                return (qx_c * (out[..., 0] + out[..., 1] + out[..., 2])
                        - out[..., 3])

            out = jax.lax.map(chunk, (w_r, blk_r, cx_r, cy_r, cz_r, qx_r))
            return out.reshape(-1)[:N] * 1e-3

        chain_time("V2 matvec_dot", mvd2, mk((N,)), w_r2, tbx, tby, tbz)
    print("done", flush=True)


if __name__ == "__main__":
    main()
