"""On-chip perf probes for the round-3 build-engine redesign.

Measures, with per-call scalar syncs (async dispatch lies by orders of
magnitude on this tunneled chip — see docs/ARCHITECTURE.md preamble):

  1. the current build_nbh and one full DFSPH step on breaking_dam_30k,
  2. candidate primitives for the dense-cell-table build design:
     long-row gathers, row-slice table build, dense distance+top_k,
  3. a full "Design B" prototype build (dense per-cell table + 27-row
     gather per query + distance + top_k) vs the current find_neighbors.

Run as a self-terminating script (tunnel discipline: one TPU client at a
time, never SIGKILL mid-RPC):
    nohup python tools/perf_probe.py > /tmp/perf_probe.log 2>&1 &
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
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3

DISPATCH_FLOOR = None


def sync_time(fn, *args, reps=5, inner=1):
    """Median wall time of fn(*args) with a scalar fetch per rep; subtracts
    the measured dispatch+fetch floor."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
            _ = float(jnp.sum(out) if hasattr(out, "dtype") else out)
        ts.append((time.perf_counter() - t0) / inner)
    med = sorted(ts)[len(ts) // 2]
    return med - (DISPATCH_FLOOR or 0.0)


def measure_floor():
    global DISPATCH_FLOOR
    one = jnp.ones(())

    @jax.jit
    def null(x):
        return x + 1.0

    DISPATCH_FLOOR = 0.0
    DISPATCH_FLOOR = max(sync_time(null, one, reps=9), 0.0)
    print(f"dispatch+fetch floor: {DISPATCH_FLOOR*1e3:.1f} ms", flush=True)


def hot_state(sim_steps=120):
    """breaking_dam_30k advanced into the violent phase."""
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_30k.json"))
    import dataclasses
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, name="dfsph"))
    scene = build_scene(cfg)
    st = scene.static
    step = jax.jit(functools.partial(dfsph.step, st))
    state = dfsph.init_state(scene)
    for i in range(sim_steps):
        state = step(scene.arrays, state)
    jax.block_until_ready(state.fluid.pos.x)
    print(f"hot state: t={float(state.t):.3f} diag={np.asarray(state.diag)}",
          flush=True)
    return scene, state, step


def probe_current(scene, state, step):
    st = scene.static

    @jax.jit
    def build_only(fluid_pos):
        nbh = mbase.build_nbh(st, scene.arrays, fluid_pos, None)
        return (jnp.sum(nbh.count) + jnp.sum(nbh.r) + jnp.sum(nbh.idx)
                + jnp.sum(nbh.x.x))

    t = sync_time(build_only, state.fluid.pos)
    print(f"[current] build_nbh: {t*1e3:.1f} ms", flush=True)

    def step_scalar(arrays, s):
        s2 = step(arrays, s)
        return float(s2.t), s2

    # full hot step (scalar-synced on t)
    ts = []
    s = state
    for _ in range(5):
        t0 = time.perf_counter()
        _, s = step_scalar(scene.arrays, s)
        ts.append(time.perf_counter() - t0)
    print(f"[current] full DFSPH hot step: {sorted(ts)[2]*1e3:.1f} ms "
          f"(diag={np.asarray(s.diag)})", flush=True)
    return s


def probe_primitives(scene, state):
    st = scene.static
    n = st.n_fluid
    grid = st.grid
    ncells = grid.num_cells
    cap = st.cell_cap

    pos = state.fluid.pos
    perm = jnp.argsort(nb.cell_id(pos, grid), stable=True).astype(jnp.int32)
    pos_s = pos.take(perm)
    table = nb.build_cell_table(pos_s, grid)
    cid_q = nb.cell_id(pos_s, grid)

    # --- P4: dense cell-table build via row-slice gather -------------------
    starts = table.starts[:-1]

    def build_dense(fields):
        # dense[c, k] = field[min(starts[c] + k, Ns-1)]; one strided gather
        # per field expressed as start+iota row indices.
        sl = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        sl = jnp.minimum(sl, n - 1)
        return [f[sl] for f in fields]

    occ = table.starts[1:] - table.starts[:-1]

    @jax.jit
    def p4():
        d = build_dense([pos_s.x, pos_s.y, pos_s.z])
        return sum(jnp.sum(t) for t in d)

    print(f"[P4] dense table build 3x({ncells},{cap}): "
          f"{sync_time(p4)*1e3:.2f} ms", flush=True)

    # --- P2: 27-long-row gather per query ----------------------------------
    gx, gy, gz = grid.dims
    sx, sy, sz = grid.strides
    off = jnp.asarray(
        np.array([(dx * sx + dy * sy + dz * sz)
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  for dz in (-1, 0, 1)], np.int32))

    @jax.jit
    def p2():
        cells = jnp.clip(cid_q[:, None] + off[None, :], 0, ncells - 1)
        dx_t, dy_t, dz_t = build_dense([pos_s.x, pos_s.y, pos_s.z])
        out = dx_t[cells] + dy_t[cells] + dz_t[cells]  # (N, 27, cap)
        return jnp.sum(out)

    print(f"[P2] 27-row gather 3 fields (N,27,{cap}): "
          f"{sync_time(p2)*1e3:.2f} ms", flush=True)

    # --- P3: dense distance + top_k + count --------------------------------
    K = st.K

    @jax.jit
    def p3():
        cells = jnp.clip(cid_q[:, None] + off[None, :], 0, ncells - 1)
        xt, yt, zt = build_dense([pos_s.x, pos_s.y, pos_s.z])
        cx = xt[cells].reshape(n, -1)
        cy = yt[cells].reshape(n, -1)
        cz = zt[cells].reshape(n, -1)
        slot_ok = (jnp.arange(cap, dtype=jnp.int32)[None, None, :]
                   < occ[cells][:, :, None]).reshape(n, -1)
        d2 = ((pos_s.x[:, None] - cx) ** 2 + (pos_s.y[:, None] - cy) ** 2
              + (pos_s.z[:, None] - cz) ** 2)
        valid = slot_ok & (d2 <= jnp.float32(grid.cell) ** 2)
        W = valid.shape[1]
        col = jnp.arange(W, dtype=jnp.int32)[None, :]
        key = jnp.where(valid, W - col, -1)
        topkey, _ = jax.lax.top_k(key, K)
        return (jnp.sum(valid.sum(axis=1)) + jnp.sum(topkey)
                + jnp.sum(jnp.where(valid, d2, 0.0)))

    print(f"[P3] full Design-B build (table+rows+dist+topk, W={27*cap}): "
          f"{sync_time(p3)*1e3:.2f} ms", flush=True)

    # --- P8/P9: in-loop gather economics: 4-lane f32 vs 8-lane vs bf16 -----
    idxK = jnp.argsort(jnp.sin(jnp.arange(n * K, dtype=jnp.float32))
                       ).astype(jnp.int32).reshape(n, K) % n
    f = [pos_s.x, pos_s.y, pos_s.z, pos_s.x + 1.0]

    def loop_gather(tbl, idx, iters=20):
        def body(i, acc):
            rows = tbl[:, idx]
            return acc + jnp.sum(rows[0]) + i * 0.0
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    t4 = jnp.stack(f, axis=0)
    t8 = jnp.stack(f + [c * 2.0 for c in f], axis=0)
    t4b = t4.astype(jnp.bfloat16)
    g4 = jax.jit(lambda: loop_gather(t4, idxK))
    g8 = jax.jit(lambda: loop_gather(t8, idxK))
    g4b = jax.jit(lambda: loop_gather(t4b, idxK).astype(jnp.float32))
    print(f"[P7] 4-lane f32 in-loop gather (N,{K}) x20: "
          f"{sync_time(g4)*1e3:.2f} ms", flush=True)
    print(f"[P8] 8-lane f32 in-loop gather (N,{K}) x20: "
          f"{sync_time(g8)*1e3:.2f} ms", flush=True)
    print(f"[P9] 4-lane bf16 in-loop gather (N,{K}) x20: "
          f"{sync_time(g4b)*1e3:.2f} ms", flush=True)

    # --- P10: while-loop carry cost: same gather loop with big carried state
    vstate = [pos_s.x + i for i in range(6)]

    def loop_carry(iters=20):
        def body(i, c):
            acc, vs = c
            rows = t4[:, idxK]
            vs = [v + rows[0].sum(axis=1) * 1e-9 for v in vs]
            return (acc + jnp.sum(rows[1]), vs)
        out = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), vstate))
        return out[0] + sum(jnp.sum(v) for v in out[1])

    p10 = jax.jit(loop_carry)
    print(f"[P10] same + 6x(N,) carried updates x20: "
          f"{sync_time(p10)*1e3:.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    measure_floor()
    scene, state, step = hot_state()
    state = probe_current(scene, state, step)
    probe_primitives(scene, state)
    print("done", flush=True)


if __name__ == "__main__":
    main()
