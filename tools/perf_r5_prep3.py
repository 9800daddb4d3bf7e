"""Round-5 probe #3: validate the prep fixes before implementing.

    vsort10_ms      lax.sort (cid, iota, 8 f32 payloads) — all state
                    fields co-sorted in ONE variadic sort
    rowg8_ms        (N, 8) packed row gather by perm (vs 8 element
                    gathers ~ 8/3 x take3_ms = ~150 ms)
    pack_ms         the (N, 8) pack (stack) alone
    scat1_ms        single-lane unsort scatter zeros.at[perm].set(x)
    rows8_scat_ms   (N, 8) packed row scatter
    invperm_ms      inv_perm build (scatter of iota)
    se18sl_ms       se18 via 18 pad+slice shifted copies (no gathers)
    dedupe_fix_ms   plan_from_intervals with the CORRECT block-id bound
                    (nblocks_src = N//BLOCK + 2, 14 bits -> packed-sort
                    path; the step passes starts.shape[0] = ncells + 1,
                    437k -> 19 bits -> falls into the argsort +
                    take_along_axis slow path, 220 ms measured)

Usage: timeout 1800 python -u tools/perf_r5_prep3.py [hot_pos.npy]
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


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0].astype(jnp.float32))


def timed(name, make_fn, reps=16):
    fn, args = make_fn()
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    rtt = time.perf_counter() - t0
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
    scid = cid[perm]
    starts = jnp.searchsorted(
        scid, jnp.arange(ncells + 1, dtype=jnp.int32),
        side="left", method="sort").astype(jnp.int32)
    qcells = jnp.pad(scid, (0, QB * B - n), mode="edge").reshape(QB, B)
    iota = jnp.arange(n, dtype=jnp.int32)
    f8 = [pos.x, pos.y, pos.z, pos.x * 2, pos.y * 2, pos.z * 2,
          pos.x + 1, pos.y + 1]
    jax.block_until_ready(starts)

    timed("vsort10_ms", lambda: (
        jax.jit(lambda c, i, *fs: jax.lax.sort(
            (c, i) + fs, dimension=0, is_stable=True, num_keys=1)),
        (cid, iota) + tuple(f8)))

    packed = timed("pack_ms", lambda: (
        jax.jit(lambda *fs: jnp.stack(fs, axis=1)), tuple(f8)))
    timed("rowg8_ms", lambda: (
        jax.jit(lambda t, p: t[p]), (packed, perm)))

    timed("scat1_ms", lambda: (
        jax.jit(lambda p, x: jnp.zeros_like(x).at[p].set(x)),
        (perm, pos.x)))
    timed("rows8_scat_ms", lambda: (
        jax.jit(lambda p, t: jnp.zeros_like(t).at[p].set(t)),
        (perm, packed)))
    timed("invperm_ms", lambda: (
        jax.jit(lambda p, i: jnp.zeros_like(i).at[p].set(i)),
        (perm, iota)))

    # se18 by shifted slices
    fast_axes = sorted(range(3), key=lambda a: st.grid.strides[a])
    smid = st.grid.strides[fast_axes[1]]
    sslow = st.grid.strides[fast_axes[2]]
    offs = [dm * smid + ds * sslow
            for dm in (-1, 0, 1) for ds in (-1, 0, 1)]

    def shifted(s, k, L):
        # out[i] = s[clip(i + k, 0, ncells)], i in [0, L)
        if k <= 0:
            head = jnp.full((min(-k, L),), s[0], s.dtype)
            return jnp.concatenate([head, s[:max(L + k, 0)]])
        tail_n = max(0, k + L - (ncells + 1))
        body = s[min(k, ncells + 1):min(k + L, ncells + 1)]
        tail = jnp.full((tail_n,), s[ncells], s.dtype)
        return jnp.concatenate([body, tail])

    def se18_slices(s):
        cols = []
        for o in offs:
            cols.append(shifted(s, o - 1, ncells))
            cols.append(shifted(s, o + 2, ncells))
        return jnp.stack(cols, axis=1)

    se18 = timed("se18sl_ms", lambda: (jax.jit(se18_slices), (starts,)))
    # equivalence check vs the gather form
    cells = jnp.arange(ncells, dtype=jnp.int32)
    ref_cols = []
    for o in offs:
        ref_cols.append(starts[jnp.clip(cells + (o - 1), 0, ncells)])
        ref_cols.append(starts[jnp.clip(cells + (o + 2), 0, ncells)])
    ref = jnp.stack(ref_cols, axis=1)
    RES["se18_equal"] = bool(jnp.all(se18 == ref))
    print("se18_equal", RES["se18_equal"], file=sys.stderr, flush=True)

    lo, hi = jax.jit(lambda qc, s: bandmat.csr_intervals(qc, s, st.grid))(
        qcells, starts)
    jax.block_until_ready(lo)
    good_bound = (n >> bandmat.BLOCK_SHIFT) + 2
    out_fix = timed("dedupe_fix_ms", lambda: (
        jax.jit(lambda a, b: bandmat.plan_from_intervals(
            a, b, nblocks_src=good_bound, nbcap=nbcap)[0]), (lo, hi)))
    ref_blk = jax.jit(lambda a, b: bandmat.plan_from_intervals(
        a, b, nblocks_src=ncells + 1, nbcap=nbcap)[0])(lo, hi)
    RES["dedupe_equal"] = bool(jnp.all(out_fix == ref_blk))
    print("dedupe_equal", RES["dedupe_equal"], file=sys.stderr, flush=True)

    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
