"""Probe dense-mode PBF on the real chip: warm the 30k dam on the compact
path to the violent phase, then compare dense vs compact trajectories and
step times from the evolved state."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

import cfd_taichi_tpu.models.dfsph as D
import cfd_taichi_tpu.models.pbf as PB
from cfd_taichi_tpu.config import parse_config
from cfd_taichi_tpu.runner import Simulation
from cfd_taichi_tpu.utils import io as io_utils

raw = json.load(open(os.path.join(REPO, "configs/breaking_dam_30k.json")))
raw["solver"]["name"] = "pbf"
D.DENSE_FLUID = False
sim = Simulation(parse_config(raw))

CKPT = "/tmp/warm30k_pbf.npz"
if os.path.exists(CKPT):
    state = io_utils.load_checkpoint(CKPT, sim.state)
else:
    for i in range(1400):
        sim.step()
    io_utils.save_checkpoint(CKPT, sim.state)
    state = sim.state
print("state t", float(state.t), flush=True)
st, arrays = sim.scene.static, sim.scene.arrays


def timeit(f, *a, n=10):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


dj = jax.jit(lambda s: PB._step_dense(st, arrays, s))
cj = jax.jit(lambda s: PB.step(st, arrays, s))
print("dense step: %.1f ms" % (1e3 * timeit(dj, state)), flush=True)
D.DENSE_FLUID = False
print("compact step: %.1f ms" % (1e3 * timeit(cj, state)), flush=True)

sd = state
sc = state
for _ in range(10):
    sd = dj(sd)
    sc = cj(sc)
oa = np.argsort(np.asarray(sd.fluid.oid))
ob = np.argsort(np.asarray(sc.fluid.oid))
pd_ = sd.fluid.pos.to_numpy()[oa]
pc_ = sc.fluid.pos.to_numpy()[ob]
print("max|dpos| over 10 steps:", float(np.abs(pd_ - pc_).max()))
print("overflow", int(sd.overflow), int(sc.overflow))
vd = sd.fluid.vel.to_numpy()[oa]
vc = sc.fluid.vel.to_numpy()[ob]
print("max|dvel|:", float(np.abs(vd - vc).max()))
print("finite:", bool(np.isfinite(pd_).all() and np.isfinite(vd).all()))
