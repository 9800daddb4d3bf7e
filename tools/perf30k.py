"""30k step composition + grouped-vs-per-query build A/B on the real chip.

    nohup python tools/perf30k.py > /tmp/perf30k.log 2>&1 &

Methodology (docs/ARCHITECTURE.md preamble): every rep ends in a scalar
fetched to host; a measured null floor is subtracted.
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
from cfd_taichi_tpu.ops import bandmat

CONFIG = os.environ.get("CONFIG", "breaking_dam_30k.json")
WARM_STEPS = int(os.environ.get("WARM_STEPS", "120"))
REPS = int(os.environ.get("REPS", "20"))


def timeit(name, fn, *args, reps=REPS, floor=0.0):
    fn(*args)  # compile
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jnp.sum(fn(*args)))
    dt = (time.perf_counter() - t0) / reps * 1e3 - floor
    print(f"{name:45s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", CONFIG))
    import dataclasses
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name="dfsph"))
    scene = build_scene(cfg)
    st, arrays = scene.static, scene.arrays
    print(f"n={st.n_fluid} K={st.K} cell_cap={st.cell_cap} k2={st.k2} "
          f"bK={st.bK} band_nb={st.band_nb} pair_nb={st.pair_nb} "
          f"bband_nb={st.bband_nb} band_B={st.band_B}", flush=True)

    # Warm state: run the real solver to the violent phase.
    step = jax.jit(functools.partial(dfsph.step, st))
    state = dfsph.init_state(scene)
    t0 = time.perf_counter()
    for i in range(WARM_STEPS):
        state = step(arrays, state)
        if i % 40 == 39:
            jax.block_until_ready(state.fluid.pos.x)
            print(f"warm {i+1}: t={float(state.t):.4f} "
                  f"wall={time.perf_counter()-t0:.0f}s diag="
                  f"{np.asarray(state.diag)}", flush=True)
    jax.block_until_ready(state.fluid.pos.x)
    fpos, rpos = state.fluid.pos, state.rigid.pos

    # Null floor
    nul = jax.jit(lambda x: x + 1.0)
    nul(1.0)
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(nul(1.0))
    floor = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'null floor':45s} {floor:8.2f} ms", flush=True)

    # --- builds -----------------------------------------------------------
    def build_pq(fp, rp):
        nbh = mbase.build_nbh(st, arrays, fp, rp)
        return nbh.count.sum() + nbh.r.sum()

    timeit("build_nbh (per-query engine)", jax.jit(build_pq), fpos, rpos,
           floor=floor)

    saved = mbase.GROUPED_BUILD_MIN_N
    mbase.GROUPED_BUILD_MIN_N = 0

    def build_gr(fp, rp):
        nbh = mbase.build_nbh(st, arrays, fp, rp)
        return nbh.count.sum() + nbh.r.sum()

    timeit("build_nbh (grouped engine)", jax.jit(build_gr), fpos, rpos,
           floor=floor)
    mbase.GROUPED_BUILD_MIN_N = saved

    # --- band matrix build + matvec over each plan source -----------------
    def band_from_pairs(fp, rp):
        nbh = mbase.build_nbh(st, arrays, fp, rp)
        band = bandmat.build_band(
            nbh.pos, nbh.idx, nbh.mask_f, h=st.h, m=st.particle_m,
            nbcap=st.pair_nb, B=st.band_B, dtype=dfsph.BAND_DTYPE)
        return band.s.x.sum() + band.ax.astype(jnp.float32).sum()

    timeit("build_nbh + band (pair plan)", jax.jit(band_from_pairs),
           fpos, rpos, floor=floor)

    mbase.GROUPED_BUILD_MIN_N = 0

    def band_from_csr(fp, rp):
        nbh = mbase.build_nbh(st, arrays, fp, rp)
        band = bandmat.build_band(
            nbh.pos, nbh.idx, nbh.mask_f, h=st.h, m=st.particle_m,
            nbcap=st.band_nb, B=st.band_B, plan=nbh.plan,
            dtype=dfsph.BAND_DTYPE)
        return band.s.x.sum() + band.ax.astype(jnp.float32).sum()

    timeit("build_nbh + band (grouped, CSR plan)", jax.jit(band_from_csr),
           fpos, rpos, floor=floor)
    mbase.GROUPED_BUILD_MIN_N = saved

    # --- matvec cost (20 iterations on a fixed band) ----------------------
    def mk_band(fp, rp):
        nbh = mbase.build_nbh(st, arrays, fp, rp)
        return bandmat.build_band(
            nbh.pos, nbh.idx, nbh.mask_f, h=st.h, m=st.particle_m,
            nbcap=st.pair_nb, B=st.band_B, dtype=dfsph.BAND_DTYPE)

    band = jax.jit(mk_band)(fpos, rpos)
    jax.block_until_ready(band.ax)
    k0 = jnp.ones((st.n_fluid,), jnp.float32) * 1e-3

    def iters20(band, k):
        def body(i, k):
            mv = bandmat.matvec(band, k)
            d = bandmat.matvec_dot(band, mv)
            return k + 1e-6 * d
        return jax.lax.fori_loop(0, 10, body, k).sum()

    t = timeit("20 matvecs (fori, incl turnaround)", jax.jit(iters20),
               band, k0, floor=floor)
    print(f"{'  per matvec':45s} {t/20:8.2f} ms", flush=True)

    # --- full steps -------------------------------------------------------
    def run_step(step_fn, s0, reps=REPS):
        s = s0
        s = step_fn(arrays, s)
        float(jnp.sum(s.fluid.pos.x))
        s = s0
        t0 = time.perf_counter()
        for _ in range(reps):
            s = step_fn(arrays, s)
            float(jnp.sum(s.fluid.pos.x))
        dt = (time.perf_counter() - t0) / reps * 1e3 - floor
        return dt, s

    dt, s_end = run_step(step, state)
    print(f"{'full step (per-query build)':45s} {dt:8.2f} ms  "
          f"diag={np.asarray(s_end.diag)} ovf={int(s_end.overflow)}",
          flush=True)

    mbase.GROUPED_BUILD_MIN_N = 0
    step_g = jax.jit(lambda a, s: dfsph.step(st, a, s))
    dt, s_end = run_step(step_g, state)
    print(f"{'full step (grouped build)':45s} {dt:8.2f} ms  "
          f"diag={np.asarray(s_end.diag)} ovf={int(s_end.overflow)}",
          flush=True)
    mbase.GROUPED_BUILD_MIN_N = saved
    print("done", flush=True)


if __name__ == "__main__":
    main()
