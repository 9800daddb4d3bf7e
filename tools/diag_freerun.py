"""Free-running dense vs compact DFSPH trajectories: detect whether the
dense path collapses its adaptive dt where compact does not, and dump the
runaway particle when it happens.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
if os.environ.get("DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import dfsph as D

CONFIG = os.environ.get("CONFIG", "breaking_dam_30k.json")
STEPS = int(os.environ.get("STEPS", "120"))


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = read_config(os.path.join(REPO, "configs", CONFIG))
    import dataclasses
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name="dfsph"))
    scene = build_scene(cfg)
    st, arrays = scene.static, scene.arrays

    step_d = jax.jit(lambda a, s: D._finish_step(
        st, s, D._prepare_dense(st, a, s)))
    step_c = jax.jit(lambda a, s: D._finish_step(
        st, s, D._prepare_compact(st, a, s)))

    @jax.jit
    def summary(s):
        vmax = jnp.max(s.fluid.vel.norm())
        wi = jnp.argmax(s.fluid.vel.norm())
        return (vmax, s.fluid.pos.x[wi], s.fluid.pos.y[wi],
                s.fluid.pos.z[wi], wi)

    from cfd_taichi_tpu.models import base as mbase

    from cfd_taichi_tpu.ops import bandmat as bm

    BVARIANTS = (8, 16)

    @jax.jit
    def channels(a, s):
        """Per-step capacity needs: wide CSR cover + tight pair blocks,
        at both group widths."""
        out = []
        for Bv in BVARIANTS:
            dp = mbase.build_dense_prep(st, a, s.fluid.pos,
                                        st.band_nb_wide, Bv)
            terms = bm.build_band_terms(s.fluid.pos.take(dp.perm),
                                        h=st.h, m=st.particle_m,
                                        plan=dp.plan, B=Bv)
            tight = bm.compact_plan(dp.plan, terms.blk_pair, 1)
            out.append(dp.plan[2] + st.band_nb_wide)   # wide need
            out.append(tight[2] + 1)                   # exact pair need
        return tuple(out)

    sd = sc = D.init_state(scene)
    for i in range(STEPS):
        sd = step_d(arrays, sd)
        sc = step_c(arrays, sc)
        vd, pxd, pyd, pzd, wid = (float(x) for x in summary(sd))
        vc, pxc, pyc, pzc, wic = (float(x) for x in summary(sc))
        w8, p8, w16, p16 = (int(x) for x in channels(arrays, sd))
        if i % 5 == 0 or float(sd.dt) < 5e-5 or float(sc.dt) < 5e-5 \
                or int(sd.overflow) > 0:
            print(f"step {i:4d} | dense t={float(sd.t):.4f} "
                  f"dt={float(sd.dt):.2e} vmax={vd:7.2f} "
                  f"w@({pxd:.3f},{pyd:.3f},{pzd:.3f}) ovf={int(sd.overflow)}"
                  f" need B8 wide/pair={w8}/{p8} B16={w16}/{p16} "
                  f"(caps wide={st.band_nb_wide} pair={st.pair_nb})"
                  f" | compact t={float(sc.t):.4f} dt={float(sc.dt):.2e} "
                  f"vmax={vc:7.2f}", flush=True)
        if float(sd.dt) <= 1.2e-5 and float(sd.t) > 0.02:
            print("dense dt collapsed", flush=True)
            break
    print("done", flush=True)


if __name__ == "__main__":
    main()
