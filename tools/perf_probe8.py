"""Round-3 probe #8: production coef matvec/matvec_dot at 1M with the
evolved state — lax.map chunk-budget sweep + pair_nb sensitivity.

    nohup python tools/perf_probe8.py > /tmp/perf_probe8.log 2>&1 &
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase, dfsph
from cfd_taichi_tpu.ops import bandmat, neighbors as nb
from cfd_taichi_tpu.ops.vec import V3


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
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    scene = build_scene(cfg)
    st = scene.static
    n, B = st.n_fluid, st.band_B
    pos_rows = np.load("/tmp/state1m_pos.npy")
    pos = V3.from_rows(jnp.asarray(pos_rows))
    dp = jax.jit(lambda p: mbase.build_dense_prep(
        st, scene.arrays, p, st.band_nb_wide, B))(pos)
    terms = jax.jit(lambda p, plan: bandmat.dense_dfsph_terms(
        p, h=st.h, m=st.particle_m, plan=plan, B=B))(dp.pos, dp.plan)
    k = jnp.ones((n,), jnp.float32) * 1e-4
    v = V3(k, k * 0.5, k * 0.25)

    for pnb in (st.pair_nb, 20, 18):
        tight = jax.jit(lambda plan, bp: bandmat.compact_plan(plan, bp, pnb)
                        )(dp.plan, terms.blk_pair)
        print(f"pair_nb={pnb} plan_overflow={int(tight[2])}", flush=True)
        if int(tight[2]) > 0:
            continue
        ceng = jax.jit(lambda p, plan: bandmat.build_coef_engine(
            p, h=st.h, m=st.particle_m, plan=plan, B=B,
            dtype=dfsph.BAND_DTYPE))(dp.pos, tight)
        for budget in (64, 192, 512):
            orig = bandmat._coef_chunks
            bandmat._coef_chunks = lambda QB, W, _b=budget: _chunks(QB, W, _b)
            mv_j = jax.jit(lambda e, k_: bandmat.coef_matvec_ops(
                e, n, B)[0](k_))
            mvd_j = jax.jit(lambda e, v_: bandmat.coef_matvec_ops(
                e, n, B)[1](v_))
            t1 = sync_time(mv_j, ceng, k)
            t2 = sync_time(mvd_j, ceng, v)
            print(f"  budget={budget}MB: matvec {t1*1e3:.1f} ms, "
                  f"matvec_dot {t2*1e3:.1f} ms", flush=True)
            bandmat._coef_chunks = orig
    print("done", flush=True)


def _chunks(QB, W, budget_mb):
    target = max(1, (budget_mb << 20) // (4 * W * 2))
    if QB <= target:
        return 1
    for nc in range(-(-QB // target), QB + 1):
        if QB % nc == 0:
            return nc
    return QB


if __name__ == "__main__":
    main()
