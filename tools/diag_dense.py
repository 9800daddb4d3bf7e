"""Lockstep dense-vs-compact DFSPH divergence finder (runs on the chip).

Steps BOTH paths from the same state each step (following the compact
trajectory), reporting per-step max diffs; when they split, dumps the
worst particle.
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
# sitecustomize forces JAX_PLATFORMS=axon before user code; honor an
# explicit platform request (e.g. DIAG_PLATFORM=cpu) via jax.config.
if os.environ.get("DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIAG_PLATFORM"])

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import dfsph as D

CONFIG = os.environ.get("CONFIG", "breaking_dam_30k.json")
STEPS = int(os.environ.get("STEPS", "160"))


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
    def diff(sd, sc):
        od, oc = sd.fluid.oid, sc.fluid.oid
        inv_d = jnp.zeros_like(od).at[od].set(jnp.arange(od.shape[0]))
        inv_c = jnp.zeros_like(oc).at[oc].set(jnp.arange(oc.shape[0]))
        pd = sd.fluid.pos.take(inv_d)
        pc = sc.fluid.pos.take(inv_c)
        vd = sd.fluid.vel.take(inv_d)
        vc = sc.fluid.vel.take(inv_c)
        dpos = ((pd.x - pc.x) ** 2 + (pd.y - pc.y) ** 2
                + (pd.z - pc.z) ** 2) ** 0.5
        dvel = ((vd.x - vc.x) ** 2 + (vd.y - vc.y) ** 2
                + (vd.z - vc.z) ** 2) ** 0.5
        wi = jnp.argmax(dvel)
        return (jnp.max(dpos), jnp.max(dvel), wi,
                jnp.max(vd.norm()), jnp.max(vc.norm()),
                pc.x[wi], pc.y[wi], pc.z[wi],
                vd.norm()[wi], vc.norm()[wi])

    state = D.init_state(scene)
    for i in range(STEPS):
        sd = step_d(arrays, state)
        sc = step_c(arrays, state)
        dpos, dvel, wi, vmax_d, vmax_c, px, py, pz, vnd, vnc = \
            (float(x) for x in diff(sd, sc))
        if i % 10 == 0 or dvel > 1e-3:
            print(f"step {i:4d} t={float(sc.t):.4f} dt_c={float(sc.dt):.2e} "
                  f"dt_d={float(sd.dt):.2e} dpos={dpos:.3e} dvel={dvel:.3e} "
                  f"vmax d/c={vmax_d:.2f}/{vmax_c:.2f} "
                  f"worst@({px:.3f},{py:.3f},{pz:.3f}) "
                  f"|v| d/c={vnd:.2f}/{vnc:.2f} "
                  f"diag_d={np.asarray(sd.diag).round(2)} "
                  f"diag_c={np.asarray(sc.diag).round(2)}", flush=True)
        if dvel > 10.0:
            print("DIVERGED — stopping", flush=True)
            break
        state = sc
    print("done", flush=True)


if __name__ == "__main__":
    main()
