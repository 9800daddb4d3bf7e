"""Probe dense-mode PCISPH piece timings on the real chip from a warmed
checkpoint (/tmp/warm30k_pcisph.npz — tools note: create with a 1400-step
compact run of breaking_dam_30k/pcisph). Times the engine build, the
predicted-rho window ops, one loop iteration, and full dense vs compact
steps; then checks 10-step dense/compact equivalence from the evolved
state."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import cfd_taichi_tpu.models.dfsph as D
import cfd_taichi_tpu.models.pcisph as P
from cfd_taichi_tpu.config import parse_config
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.runner import Simulation
from cfd_taichi_tpu.utils import io as io_utils

raw = json.load(open("configs/breaking_dam_30k.json"))
raw["solver"]["name"] = "pcisph"
D.DENSE_FLUID = False
sim = Simulation(parse_config(raw))
state = io_utils.load_checkpoint("/tmp/warm30k_pcisph.npz", sim.state)
st, arrays = sim.scene.static, sim.scene.arrays
print("state t", float(state.t), "iters", np.asarray(state.diag)[0])


def timeit(f, *a, n=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


@jax.jit
def eng_arrays(p):
    e = D.build_dense_engine(st, arrays, p)
    return e.pos, e.rho_f, e.overflow


print("build_dense_engine: %.1f ms" % (1e3 * timeit(eng_arrays, state.fluid.pos)), flush=True)

# Build the engine once eagerly for the op probes.
eng = D.build_dense_engine(st, arrays, state.fluid.pos)


@jax.jit
def rho_once(pp_x, pp_y, pp_z):
    from cfd_taichi_tpu.ops.vec import V3
    pp = V3(pp_x, pp_y, pp_z)
    rho_of = bandmat.predicted_rho_op(eng.pos, h=st.h, m=st.particle_m,
                                      plan=eng.plan, B=st.band_B)
    return rho_of(pp)


print("predicted_rho (mask+1 call): %.1f ms"
      % (1e3 * timeit(rho_once, eng.pos.x, eng.pos.y, eng.pos.z)), flush=True)


@jax.jit
def rho_twice(pp_x, pp_y, pp_z):
    from cfd_taichi_tpu.ops.vec import V3
    pp = V3(pp_x, pp_y, pp_z)
    rho_of = bandmat.predicted_rho_op(eng.pos, h=st.h, m=st.particle_m,
                                      plan=eng.plan, B=st.band_B)
    return rho_of(pp) + rho_of(pp + 0.001)


print("predicted_rho (mask+2 calls): %.1f ms"
      % (1e3 * timeit(rho_twice, eng.pos.x, eng.pos.y, eng.pos.z)), flush=True)


@jax.jit
def brho_once(pp_x, pp_y, pp_z):
    from cfd_taichi_tpu.ops.vec import V3
    pp = V3(pp_x, pp_y, pp_z)
    brho_of = bandmat.boundary_predict_op(eng.dp.bwin, eng.pos, h=st.h,
                                          rho0=1000.0, B=st.band_B)
    return brho_of(pp)


print("boundary_predict (mask+1 call): %.1f ms"
      % (1e3 * timeit(brho_once, eng.pos.x, eng.pos.y, eng.pos.z)), flush=True)

print("dense step: %.1f ms" % (1e3 * timeit(jax.jit(lambda s: P._step_dense(st, arrays, s)), state)), flush=True)
D.LOOP_UNROLL = 1
print("dense step (unroll=1): %.1f ms" % (1e3 * timeit(jax.jit(lambda s: P._step_dense(st, arrays, s)), state)), flush=True)
D.LOOP_UNROLL = 4
D.DENSE_FLUID = False
print("compact step: %.1f ms" % (1e3 * timeit(jax.jit(lambda s: P.step(st, arrays, s)), state)), flush=True)

# equivalence from the evolved state
dj = jax.jit(lambda s: P._step_dense(st, arrays, s))
cj = jax.jit(lambda s: P.step(st, arrays, s))
sd = state
sc = state
it_d = []
it_c = []
for _ in range(10):
    sd = dj(sd)
    sc = cj(sc)
    it_d.append(float(np.asarray(sd.diag)[0]))
    it_c.append(float(np.asarray(sc.diag)[0]))
oa = np.argsort(np.asarray(sd.fluid.oid))
ob = np.argsort(np.asarray(sc.fluid.oid))
pd_ = sd.fluid.pos.to_numpy()[oa]
pc_ = sc.fluid.pos.to_numpy()[ob]
print("max|dpos| over 10 steps:", float(np.abs(pd_ - pc_).max()))
print("iters dense  ", it_d)
print("iters compact", it_c)
print("res", float(np.asarray(sd.diag)[1]), float(np.asarray(sc.diag)[1]))
print("overflow", int(sd.overflow), int(sc.overflow))
