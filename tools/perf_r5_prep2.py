"""Round-5 probe #2: split the newly-exposed plan/bwin costs (the r4
phase probe DCE'd the plan build away — tools/perf_r5_prep.py found
plan_from_csr 279 ms + bwin 159 ms on the hot 1M state).

Times, on the TPU, with a batched dispatch protocol (each timing runs
the op `reps` times CHAINED through a data dependency, one scalar fetch
at the end — kills the tunnel-RTT noise that made sub-10 ms numbers
meaningless in perf_r5_prep.py):

    intervals_ms   csr_intervals fast path (se18 build + row gather)
    se18_ms        the se18 table build alone (18 shifted copies)
    rows_ms        the (QB, B, 18) row gather alone
    dedupe_ms      plan_from_intervals on the (QB, 288) intervals
    pk_sort_ms       - its packed lax.sort alone
    idx_ms           - its (QB, I, nbcap) position-count alone
    bw_iv_ms       boundary csr_intervals (the bwin front half)
    bw_dedupe_ms   plan_from_intervals on the cap selected groups
    argsort_ms     argsort of the (N,) cell ids
    take3_ms       pos.take(perm) — 3 separate lane gathers
    vsort_ms       ONE variadic lax.sort carrying (cid, iota, x, y, z)

Usage: timeout 1800 python -u tools/perf_r5_prep2.py [hot_pos.npy]
"""
import dataclasses
import json
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
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops.vec import V3

RES = {}


_RTT = [0.0]


def _fetch(out):
    """True sync: fetch ONE scalar element of the (first leaf of the)
    output. block_until_ready through the tunnel relay reports ready
    optimistically (bench.py sync() note) — a data fetch cannot lie."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0].astype(jnp.float32))


def timed(name, make_fn, reps=16):
    """make_fn() -> (jitted fn, args). Dispatch `reps` independent
    executions (the device runs them serially), ONE scalar fetch at the
    end; subtract the measured fetch RTT once."""
    fn, args = make_fn()
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    rtt = time.perf_counter() - t0
    _RTT[0] = rtt
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    dt = max(time.perf_counter() - t0 - rtt, 0.0) / reps
    RES[name] = round(dt * 1e3, 2)
    print(name, RES[name], "rtt", round(rtt * 1e3, 1),
          file=sys.stderr, flush=True)
    return out


def main():
    pos_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/bench_hot_breaking_dam_1m_dfsph_pos.npy"
    rows = np.load(pos_path)
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    cfg = dataclasses.replace(cfg, fluid=dataclasses.replace(
        cfg.fluid, initial_velocity=(0.0, -3.0, 0.0)))
    scene = build_scene(cfg, plan_pos=rows)
    st = scene.static
    pos = V3(jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
             jnp.asarray(rows[:, 2]))
    n = st.n_fluid
    B, nbcap = st.band_B, st.band_nb_wide
    QB = -(-n // B)
    ncells = st.grid.num_cells
    RES.update(n=n, ncells=int(ncells), QB=QB, B=B, nbcap=nbcap)

    cid = jax.jit(lambda p: nb.cell_id(p, st.grid))(pos)
    perm = jnp.argsort(cid, stable=True).astype(jnp.int32)
    pos_s = pos.take(perm)
    scid = cid[perm]
    starts = jnp.searchsorted(
        scid, jnp.arange(ncells + 1, dtype=jnp.int32),
        side="left", method="sort").astype(jnp.int32)
    qcells = jnp.pad(scid, (0, QB * B - n), mode="edge").reshape(QB, B)
    jax.block_until_ready(starts)

    # --- sort-side alternatives ------------------------------------------
    timed("argsort_ms", lambda: (
        jax.jit(lambda c: jnp.argsort(c, stable=True)), (cid,)))
    timed("take3_ms", lambda: (
        jax.jit(lambda px, py, pz, p: (px[p], py[p], pz[p])),
        (pos.x, pos.y, pos.z, perm)))
    iota = jnp.arange(n, dtype=jnp.int32)
    timed("vsort_ms", lambda: (
        jax.jit(lambda c, i, x, y, z: jax.lax.sort(
            (c, i, x, y, z), dimension=0, is_stable=True, num_keys=1)),
        (cid, iota, pos.x, pos.y, pos.z)))

    # --- fluid plan halves ------------------------------------------------
    timed("intervals_ms", lambda: (
        jax.jit(lambda qc, s: bandmat.csr_intervals(qc, s, st.grid)),
        (qcells, starts)))

    fast_axes = sorted(range(3), key=lambda a: st.grid.strides[a])
    smid = st.grid.strides[fast_axes[1]]
    sslow = st.grid.strides[fast_axes[2]]
    offs = [dm * smid + ds * sslow
            for dm in (-1, 0, 1) for ds in (-1, 0, 1)]

    def se18_of(sts):
        cells = jnp.arange(ncells, dtype=jnp.int32)
        cols = []
        for o in offs:
            cols.append(sts[jnp.clip(cells + (o - 1), 0, ncells)])
            cols.append(sts[jnp.clip(cells + (o + 2), 0, ncells)])
        return jnp.stack(cols, axis=1)

    se18 = timed("se18_ms", lambda: (jax.jit(se18_of), (starts,)))
    timed("rows_ms", lambda: (
        jax.jit(lambda t, qc: t[jnp.clip(qc, 0, ncells - 1)]),
        (se18, qcells)))

    lo, hi = jax.jit(lambda qc, s: bandmat.csr_intervals(qc, s, st.grid))(
        qcells, starts)
    jax.block_until_ready(lo)
    timed("dedupe_ms", lambda: (
        jax.jit(lambda a, b: bandmat.plan_from_intervals(
            a, b, nblocks_src=ncells + 1, nbcap=nbcap)[0]), (lo, hi)))

    shift = max(int(ncells + 1) + 2, 2).bit_length()
    timed("pk_sort_ms", lambda: (
        jax.jit(lambda a, b: jax.lax.sort((a << shift) | b, dimension=1)),
        (lo, hi)))

    # idx position-count half, on the sorted/merged arrays
    packed = jax.lax.sort((lo << shift) | hi, dimension=1)
    lo_s, hi_s = packed >> shift, packed & ((1 << shift) - 1)
    run_end_prev = jnp.concatenate(
        [jnp.full((QB, 1), -1, jnp.int32),
         jax.lax.cummax(hi_s, axis=1)[:, :-1]], axis=1)
    sarr = jnp.maximum(lo_s, run_end_prev)
    lens = jnp.maximum(hi_s - sarr, 0)
    carr = jnp.cumsum(lens, axis=1) - lens
    jax.block_until_ready(carr)

    def idx_of(c, s):
        t = jnp.arange(nbcap, dtype=jnp.int32)
        idx = jnp.sum((c[:, :, None] <= t[None, None, :]).astype(jnp.int32),
                      axis=1) - 1
        return jnp.take_along_axis(s, idx, axis=1)

    timed("idx_ms", lambda: (jax.jit(idx_of), (carr, sarr)))

    # --- boundary halves --------------------------------------------------
    tbl = scene.arrays.boundary_table
    timed("bw_iv_ms", lambda: (
        jax.jit(lambda qc, s: bandmat.csr_intervals(qc, s, st.grid)),
        (qcells, tbl.starts)))
    timed("bwin_all_ms", lambda: (
        jax.jit(lambda qc: bandmat.build_boundary_windows(
            qc, scene.arrays.boundary_pos, scene.arrays.boundary_volume,
            tbl, st.grid, nbcap=st.bband_nb,
            cap=min(st.bq_cap, QB)).blk), (qcells,)))

    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
