"""Round-4 probe (host-side): predicted windowed-pass width vs BLOCK size.

Every dense pass streams QB x W slots where W = block-aligned union of the
group's 27-stencil CSR intervals. BLOCK=128 (one lane row) pads each
interval to 128-slot granularity; finer blocks cut the padding at the cost
of finer gather rows ((4, 64) f32 = 1 KB — still >= the 512 B fast-gather
floor). This probe measures the TOTAL and per-group-max block counts at
block in {128, 64, 32} over (a) the seed lattice and (b) a hot-like
compressed lattice (y squashed 1.15x, the measured dam impact peak), for
B in {16, 32}.

    python tools/perf_r4_blocksize.py            # uses /tmp/state1m_pos.npy
                                                 # when present, else synthetic
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.ops import neighbors as nb


def group_widths(pos_rows, grid, B, block):
    """Per-group block counts of the tight stencil union (numpy twin of
    scene.band_plan_raw_max, returning the full distribution)."""
    n = pos_rows.shape[0]
    cells = nb.cell_id_np(pos_rows, grid)
    order = np.argsort(cells, kind="stable")
    sc = cells[order]
    counts = np.bincount(sc, minlength=grid.num_cells)
    starts = np.concatenate([[0], np.cumsum(counts)])
    ncells = grid.num_cells
    QB = -(-n // B)
    memb = np.full((QB * B,), sc[-1], np.int64)
    memb[:n] = sc
    memb = memb.reshape(QB, B)
    fast_axes = sorted(range(3), key=lambda a: grid.strides[a])
    smid = grid.strides[fast_axes[1]]
    sslow = grid.strides[fast_axes[2]]
    offs = [dm * smid + ds * sslow
            for dm in (-1, 0, 1) for ds in (-1, 0, 1)]
    n_iv = B * 9
    lo = np.empty((QB, n_iv), np.int64)
    hi = np.empty((QB, n_iv), np.int64)
    j = 0
    for k in range(B):
        c = memb[:, k]
        for o in offs:
            a = np.clip(c + o - 1, 0, ncells)
            b = np.clip(c + o + 2, 0, ncells)
            s = starts[a]
            e = np.maximum(starts[b], s)
            lo[:, j] = s // block
            hi[:, j] = np.where(e > s, (e - 1) // block + 1, s // block)
            j += 1
    ordj = np.argsort(lo, axis=1)
    lo = np.take_along_axis(lo, ordj, axis=1)
    hi = np.take_along_axis(hi, ordj, axis=1)
    total = np.zeros(QB, np.int64)
    run_end = np.full(QB, -1, np.int64)
    for j in range(n_iv):
        s = np.maximum(lo[:, j], run_end)
        total += np.maximum(hi[:, j] - s, 0)
        run_end = np.maximum(run_end, hi[:, j])
    return total


def true_pair_slots(pos_rows, grid, h):
    """Mean true-neighbor count (r <= h) on a sample, for the waste ratio."""
    cells = nb.cell_id_np(pos_rows, grid)
    order = np.argsort(cells, kind="stable")
    p = pos_rows[order]
    sc = cells[order]
    counts = np.bincount(sc, minlength=grid.num_cells)
    starts = np.concatenate([[0], np.cumsum(counts)])
    rng = np.random.default_rng(0)
    idx = rng.choice(len(p), size=min(2000, len(p)), replace=False)
    fast_axes = sorted(range(3), key=lambda a: grid.strides[a])
    smid = grid.strides[fast_axes[1]]
    sslow = grid.strides[fast_axes[2]]
    tot = 0
    for i in idx:
        c = sc[i]
        cnt = 0
        for dm in (-1, 0, 1):
            for ds in (-1, 0, 1):
                o = dm * smid + ds * sslow
                a = max(int(c + o - 1), 0)
                b = min(int(c + o + 2), grid.num_cells)
                s, e = starts[a], starts[b]
                if e > s:
                    d = p[s:e] - p[i]
                    cnt += int((np.einsum("ij,ij->i", d, d)
                                <= h * h).sum())
        tot += cnt
    return tot / len(idx)


def main():
    cfg = read_config(os.path.join(REPO, "configs", "breaking_dam_1m.json"))
    scene = build_scene(cfg)
    st = scene.static
    grid = st.grid
    seed = np.stack([np.asarray(scene.fluid_pos0.x),
                     np.asarray(scene.fluid_pos0.y),
                     np.asarray(scene.fluid_pos0.z)], axis=1)
    states = {"seed": seed}
    hot_path = "/tmp/state1m_pos.npy"
    if os.path.exists(hot_path):
        states["hot(dump)"] = np.load(hot_path)
    else:
        hot = seed.copy()
        y0 = seed[:, 1].min()
        hot[:, 1] = y0 + (hot[:, 1] - y0) / 1.15
        rng = np.random.default_rng(1)
        hot += rng.normal(0, 0.05 * st.h / 4, hot.shape).astype(hot.dtype)
        states["hot(synth 1.15x)"] = hot

    for name, pos in states.items():
        print(f"--- {name}: n={len(pos)}")
        tn = true_pair_slots(pos, grid, st.h)
        print(f"    mean true neighbors/row: {tn:.1f}")
        for B in (16, 32):
            for block in (128, 64, 32):
                wq = group_widths(pos, grid, B, block)
                QB = len(wq)
                slots = wq * block  # per-group window slots
                w_gb = float((slots * B).sum()) * 2 / 1e9
                rhs_gb = float(slots.sum()) * 16 / 1e9
                print(f"    B={B:3d} block={block:4d}: blocks/group "
                      f"p50={np.percentile(wq, 50):.0f} "
                      f"p99={np.percentile(wq, 99):.0f} max={wq.max()} | "
                      f"w={w_gb:.2f} GB rhs={rhs_gb:.2f} GB "
                      f"matvec={(w_gb + rhs_gb):.2f} GB")


if __name__ == "__main__":
    main()
