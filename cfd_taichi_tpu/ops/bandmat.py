"""Block-banded pair-coefficient matrices: the MXU formulation of the
solver-loop SpMVs.

Why this exists (measured on-chip, 2026-08-17, breaking_dam_30k hot phase):
the iterative solvers' inner loops are linear in the neighbor values —
each DFSPH iteration needs Sigma_j wf_ij (k_i + k_j) gradW_ij and
Sigma_j wf_ij (v_i - v_j) . gradW_ij, i.e. two sparse matrix-vector
products against a FIXED per-step coefficient matrix (positions are frozen
during the pressure solves, reference dfsph_solver.py:221-233,393-416).
The round-2 engine evaluated them as (N, K) packed gathers at ~382 M
indices/s inside `lax.while_loop` bodies: ~7 ms per iteration at 29k
particles, ~70% of the hot step. TPU gathers pay a fixed per-index cost
(an 8-lane row gather costs only 1.28x a 4-lane one), so the fix is to
stop paying per-pair indices every iteration.

Formulation: queries live in cell-sorted order, so the neighbors of B=8
consecutive queries cluster tightly in the sorted source index space —
measured over a violent dam-break neighborhood: they fit in <= 11 blocks
of 128 consecutive source slots (avg 7.4). Per query block we store the
covering source-block list (the "block plan") and a DENSE (B, nb*128)
coefficient matrix A = wf * gradW (zero for non-pairs). A solver
iteration is then:

    window = vals.reshape(nblocks, 128)[blk]        # nb row-indices/group
    out    = einsum('qbw,qw->qb', A, window)        # MXU, HBM-bound on A

~44k row indices + ~1 GB of sequential A reads per iteration instead of
2.8M gathered indices: ~1.3 ms vs ~7 ms per iteration. A is built once
per step by a dense (QB, B, W) pair pass over the block windows (~45M
slot evaluations at dense-VPU rates), not by scattering the (N, K) list.

Correctness: the dense pass masks by distance <= h, slot validity, and
self-exclusion — the same criteria as `ops.neighbors.find_neighbors` — so
when no capacity overflows anywhere (K, cell caps, and the block-plan
capacity `nbcap`, all counted), the covered pair set is IDENTICAL to the
compact (N, K) list's. Plan overflow is counted on-device and must be
surfaced like every other capacity (analogue of the reference's 512-entry
cell capacity, ParticleSystem.py:103).

Parity note (documented deviation): DFSPH's divergence iteration guards
pair terms by (k_i + k_j) > 1e-5 (reference dfsph_solver.py — the
`stiff_vel_delta` fluid guard). That per-pair nonlinearity cannot ride a
fixed matrix. Since k >= 0 always holds in both loops (dr and rho_adv
excesses are clamped at 0), the guarded-out terms are each bounded by
1e-5 * wf * |gradW|, i.e. orders of magnitude below f32 round-off of the
accumulated delta; the matvec path omits the guard.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3

# Source slots per block. 128 (one lane row) through round 3; 64 from
# round 4: the plan's block-alignment padding is the dominant slack in
# every windowed pass, and halving the granularity cuts the hot-1M
# stencil-union width ~35% (host-measured on the impact-compressed dam:
# B=32 union 4.11 GB/matvec at 128 vs 2.69 at 64; gather rows stay fast —
# the 4-lane matvec tables remain (4, 64) f32 = 1 KB rows).
BLOCK = int(os.environ.get("CFD_TPU_BLOCK", "64"))
BLOCK_SHIFT = BLOCK.bit_length() - 1
assert BLOCK == 1 << BLOCK_SHIFT, "CFD_TPU_BLOCK must be a power of two"


class BandA(NamedTuple):
    """Per-step block-banded coefficient matrix over fluid-fluid pairs."""
    blk: jnp.ndarray       # (QB, nbcap) int32 — covering source-block ids,
    #                        ascending; 0 (and masked) beyond the real count
    nb_mask: jnp.ndarray   # (QB, nbcap) bool
    ax: jnp.ndarray        # (QB, B, W) f32 — wf * dW/dx  (W = nbcap * 128)
    ay: jnp.ndarray
    az: jnp.ndarray
    s: V3                  # (N,) row sums Sigma_j wf gradW_ij
    overflow: jnp.ndarray  # () int32 — block-plan capacity overflow

    @property
    def B(self) -> int:
        return self.ax.shape[1]

    @property
    def n(self) -> int:
        return self.s.x.shape[0]


def plan_blocks(idx: jnp.ndarray, mask: jnp.ndarray, n: int,
                B: int, nbcap: int):
    """Covering source-block lists per B-query group, from the step's
    compact (N, K) neighbor list (fluid pairs only: `mask` must already
    exclude rigid/boundary slots).

    Returns (blk (QB, nbcap) ascending ids, nb_mask, overflow)."""
    N, K = idx.shape
    nblocks = -(-n // BLOCK)
    QB = -(-N // B)
    pad_rows = QB * B - N
    b = jnp.where(mask, idx >> BLOCK_SHIFT, nblocks).astype(jnp.int32)
    if pad_rows:
        b = jnp.pad(b, ((0, pad_rows), (0, 0)), constant_values=nblocks)
    bq = b.reshape(QB, B * K)
    bs = jnp.sort(bq, axis=1)
    first = jnp.concatenate(
        [jnp.ones((QB, 1), bool), bs[:, 1:] != bs[:, :-1]], axis=1)
    uniq = first & (bs < nblocks)
    overflow = jnp.maximum(
        jnp.max(jnp.sum(uniq, axis=1)) - nbcap, 0).astype(jnp.int32)
    # top_k over (nblocks - id) keeps the SMALLEST block ids and returns
    # them in ascending order; invalid slots get non-positive keys.
    col = jnp.arange(B * K, dtype=jnp.int32)[None, :]
    key = jnp.where(uniq, nblocks - bs, -col)
    topkey, _ = jax.lax.top_k(key, nbcap)
    nb_mask = topkey > 0
    blk = jnp.where(nb_mask, nblocks - topkey, 0)
    return blk, nb_mask, overflow


def plan_from_csr(qcells: jnp.ndarray, starts: jnp.ndarray, grid,
                  nbcap: int, n_spans: int | None = None):
    """Block plans derived from the cell table's CSR offsets ALONE — no
    per-pair data. For each of the 9 (mid, slow)-axis stencil offsets the
    candidate slots of a contiguous cell-id span [ca, cb] form one
    contiguous sorted-index run [starts[ca + o - 1], starts[cb + o + 2])
    (fast axis has stride 1), so a group's covering blocks are a union of
    block-id intervals.

    A single span over the whole group is fragile: a group whose sorted
    members STRADDLE a cell-row boundary (common as soon as the lattice
    drifts) spans a large id gap, and the span runs then swallow the
    dense interior rows inside the gap — blowing any static capacity. So
    each group is split into spans at its largest member cell-id gaps.
    The default (n_spans >= B) splits at EVERY gap — one [c, c] span per
    member cell, the tight per-member plan: straddle overflow is
    impossible by construction and only genuine stencil density can
    exceed nbcap. (Largest-gap splitting with n_spans < B is kept for
    callers that want fewer intervals; measured on an evolved 1M dam
    break, n_spans=6 still left a 54-block worst group where the tight
    plan needs only the true stencil union.) The plan-build cost is the
    (QB, 9*n_spans) union scan + a (QB, 9*n_spans*nbcap) dedupe sort —
    negligible next to the list build.

    Out-of-grid stencil cells clip/wrap into neighboring runs: the extra
    candidates they admit are geometrically distant and are removed by
    the distance cutoff downstream — correctness never depends on the
    plan being tight, only on it COVERING the true stencil (it does: the
    runs contain every in-bounds stencil cell's slots).

    qcells: (QB, B) int32 cell ids of each group's members (sorted).
    Returns (blk (QB, nbcap) ascending, nb_mask, overflow) where overflow
    counts union blocks beyond nbcap (truncated = candidates dropped)."""
    # nblocks_src bounds the interval BLOCK ids (hi <= ceil(Ns / BLOCK),
    # Ns <= qcells.size): it only sizes the packed-sort shift in
    # plan_from_intervals. Passing the CELL count here (the r1-r4 form)
    # blew the 1M shift past 31 bits and silently rerouted every large
    # plan build onto the argsort + take_along_axis slow path — 220 ms
    # vs 30 for the identical output (tools/perf_r5_prep3.py).
    return plan_from_intervals(
        *csr_intervals(qcells, starts, grid, n_spans=n_spans),
        nblocks_src=((qcells.size - 1) >> BLOCK_SHIFT) + 1, nbcap=nbcap)


def csr_intervals(qcells: jnp.ndarray, starts: jnp.ndarray, grid,
                  n_spans: int | None = None):
    """The interval half of plan_from_csr: per-group candidate
    block-id intervals (lo, hi exclusive) — 9 stencil offsets x member
    spans, NO dedupe. Cheap (a few (QB, I) int ops); callers that only
    need 'does this group have any candidates' (e.g. the group-sparse
    boundary pass) stop here and pay the expensive dedupe only for the
    groups that do."""
    ncells = grid.num_cells
    fast_axes = sorted(range(3), key=lambda a: grid.strides[a])
    smid = grid.strides[fast_axes[1]]
    sslow = grid.strides[fast_axes[2]]
    offs = [dm * smid + ds * sslow
            for dm in (-1, 0, 1) for ds in (-1, 0, 1)]

    qc = qcells.astype(jnp.int32)
    QB, B = qc.shape
    # Default (and the only safe choice for wide groups): per-member
    # spans. A caller-supplied n_spans < B re-enables largest-gap
    # splitting, which is cheaper but can swallow interior rows when a
    # group scatters across more than n_spans - 1 gaps (measured: a
    # B=16 group under n_spans=8 needed 46 blocks where the per-member
    # plan's true union was <= 36).
    n_splits = B - 1 if n_spans is None else min(n_spans - 1, B - 1)
    if n_splits >= B - 1:
        # Per-member spans — the TIGHT plan: one [c, c] span per member
        # cell, so no span ever straddles a gap and no interior row is
        # swallowed. Straddle overflow is impossible by construction;
        # only genuine stencil density can exceed nbcap. Duplicate
        # member cells yield identical intervals that dedupe below.
        # (Measured on an evolved 1M dam break where largest-gap splits
        # with n_spans=6 left a 54-block worst group: per-member spans
        # cut it to the true stencil union.)
        #
        # Fast path: fold the whole 9-offset / (-1, +2) fast-axis shift
        # arithmetic into ONE per-cell table se18[c] = [starts[clip(c +
        # o - 1)], starts[clip(c + o + 2)] for the 9 offsets] — built
        # from 18 pad-shifted COPIES of starts (edge-clamped SLICES, no
        # gathers: the r4 form gathered starts[clip(cells + k)], and 18
        # nearly-iota element gathers of a 437k table measured 53 ms at
        # 1M where the slices are free — tools/perf_r5_prep3.py), then
        # read with a single (QB, B) gather of 18-element rows.
        # Identical values to the generic span loop below (same clip
        # arithmetic); replaces its 2 x 9 x B element-gathers of starts,
        # which dominated the 1M plan build (measured 157 -> ~10 ms).
        def shifted(k):
            # out[i] = starts[clip(i + k, 0, ncells)], i in [0, ncells)
            if k <= 0:
                head_n = min(-k, ncells)
                head = jnp.full((head_n,), starts[0], starts.dtype)
                return jnp.concatenate([head, starts[:ncells - head_n]])
            body = starts[min(k, ncells + 1):min(k + ncells, ncells + 1)]
            tail = jnp.full((ncells - body.shape[0],), starts[ncells],
                            starts.dtype)
            return jnp.concatenate([body, tail])

        cols = []
        for o in offs:
            cols.append(shifted(o - 1))
            cols.append(shifted(o + 2))
        se18 = jnp.stack(cols, axis=1)                    # (ncells, 18)
        rows = se18[jnp.clip(qc, 0, ncells - 1)]          # (QB, B, 18)
        lo, hi = [], []
        for k in range(9):
            s = rows[..., 2 * k]
            e = jnp.maximum(rows[..., 2 * k + 1], s)
            lo.append(s >> BLOCK_SHIFT)
            hi.append(jnp.where(e > s, ((e - 1) >> BLOCK_SHIFT) + 1,
                                s >> BLOCK_SHIFT))
        return (jnp.concatenate(lo, axis=1),
                jnp.concatenate(hi, axis=1))
    elif n_splits > 0:
        # Split at the (n_spans - 1) largest member gaps: covers a group
        # straddling several fast-row / plane boundaries (the dominant
        # drift mode once the lattice slumps — measured on the evolved 1M
        # dam break). Split positions are re-sorted ascending so spans
        # stay ordered; duplicate/degenerate splits yield empty spans
        # that dedupe away below.
        gaps = qc[:, 1:] - qc[:, :-1]                      # (QB, B-1)
        _, kidx = jax.lax.top_k(gaps, n_splits)            # (QB, n_splits)
        kidx = jnp.sort(kidx, axis=1)
        ar = jnp.arange(QB)
        edges = [qc[:, 0]]
        spans = []
        for j in range(n_splits):
            spans.append((edges[-1], qc[ar, kidx[:, j]]))
            edges.append(qc[ar, kidx[:, j] + 1])
        spans.append((edges[-1], qc[:, -1]))
    else:
        spans = [(qc[:, 0], qc[:, -1])]

    lo = []
    hi = []
    for ca, cb in spans:
        for o in offs:
            a = jnp.clip(ca + (o - 1), 0, ncells)
            b = jnp.clip(cb + (o + 2), 0, ncells)
            s = starts[a]
            e = jnp.maximum(starts[b], s)
            lo.append(s >> BLOCK_SHIFT)
            hi.append(jnp.where(e > s, ((e - 1) >> BLOCK_SHIFT) + 1,
                                s >> BLOCK_SHIFT))
    return jnp.stack(lo, axis=1), jnp.stack(hi, axis=1)


def plan_from_intervals(lo: jnp.ndarray, hi: jnp.ndarray, *,
                        nblocks_src: int, nbcap: int):
    """The dedupe half of plan_from_csr: (QB, I) block-id intervals ->
    (blk (QB, nbcap) ascending, nb_mask, overflow).

    Intervals are sorted by lo (width I — cheap), merged by an I-step
    run scan into disjoint ascending runs [s_j, s_j + len_j) with
    exclusive prefix offsets c_j, and each output slot t then positions
    itself by counting offsets <= t — (QB, I, nbcap) comparisons instead
    of the previous (QB, I*nbcap) full sort + top_k (a bitonic sort over
    3k-wide rows measured 619 ms at 1M; this is a 3-pass elementwise
    replacement producing the identical plan)."""
    QB, n_iv = lo.shape

    # Merge scan over lo-sorted intervals: run starts, lengths, offsets.
    # The sort is packed into a SINGLE int32 operand (lo in the high
    # bits, hi in the low) whenever the block-id range allows: a
    # one-operand lax.sort beats the payload sort + two take_along_axis
    # row gathers (measured 262 -> 95 ms on the 1M plan, identical
    # output). Sorting (lo, hi) lexicographically instead of lo-only is
    # harmless: equal-lo runs merge identically in the scan below.
    shift = max(int(nblocks_src) + 2, 2).bit_length()
    if 2 * shift <= 31:
        packed = jax.lax.sort((lo << shift) | hi, dimension=1)
        lo_s = packed >> shift
        hi_s = packed & ((1 << shift) - 1)
    else:
        order = jnp.argsort(lo, axis=1)
        lo_s = jnp.take_along_axis(lo, order, axis=1)
        hi_s = jnp.take_along_axis(hi, order, axis=1)
    # The merge scan is a pure cummax/cumsum recurrence (run_end only
    # ever takes maxima of prior his): vectorizing it keeps the traced
    # graph O(1) in n_iv — the unrolled Python-loop form put n_iv copies
    # of the body in the HLO and blew the 1M B=32 compile to ~20 min.
    run_end_prev = jnp.concatenate(
        [jnp.full((QB, 1), -1, jnp.int32),
         jax.lax.cummax(hi_s, axis=1)[:, :-1]], axis=1)
    sarr = jnp.maximum(lo_s, run_end_prev)   # (QB, I) clipped run starts
    lens = jnp.maximum(hi_s - sarr, 0)
    csum = jnp.cumsum(lens, axis=1)
    carr = csum - lens                       # (QB, I) exclusive offsets
    total = csum[:, -1]
    overflow = jnp.maximum(jnp.max(total) - nbcap, 0).astype(jnp.int32)

    # Slot t belongs to the LAST interval j with c_j <= t (zero-length
    # runs have c_j == c_j+1 and are skipped automatically); its block is
    # s_j + (t - c_j). Slots beyond the union size are masked.
    t = jnp.arange(nbcap, dtype=jnp.int32)
    idx = jnp.sum((carr[:, :, None] <= t[None, None, :]).astype(jnp.int32),
                  axis=1) - 1                 # (QB, nbcap)
    blk = (jnp.take_along_axis(sarr, idx, axis=1) + t[None, :]
           - jnp.take_along_axis(carr, idx, axis=1))
    nb_mask = t[None, :] < jnp.minimum(total, nbcap)[:, None]
    blk = jnp.where(nb_mask, blk, 0)
    return blk, nb_mask, overflow


def _window(blk: jnp.ndarray, vals: jnp.ndarray, n: int) -> jnp.ndarray:
    """Gather the per-group value windows: (n,) -> (QB, nbcap*128)."""
    nblocks = -(-n // BLOCK)
    vb = jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks, BLOCK)
    QB, nbcap = blk.shape
    return vb[blk].reshape(QB, nbcap * BLOCK)


class BandTerms(NamedTuple):
    """BandA plus the step-constant per-particle sums the solvers need,
    all read off the SAME fused (QB, B, W) dense pass (XLA shares the
    window fetches and pair geometry across every output) — this is what
    lets a fluid-only solver step skip the compact (N, K) list build
    entirely (measured at 29k: sort + CSR plan + this pass = ~14 ms vs
    ~65 ms for the compact list build it replaces)."""
    band: BandA
    rho: jnp.ndarray    # (N,) Sigma_j m W_ij        (fluid-fluid density)
    count: jnp.ndarray  # (N,) int32 true pair count (the <20-neighbor skip)
    qsum: jnp.ndarray   # (N,) Sigma_j (m |gradW|)^2 (DFSPH alpha Q term)
    tvec: V3            # (N,) Sigma_j W_ij x_ij     (tension: scale -k m)
    blk_pair: jnp.ndarray  # (QB, nbcap) bool — block holds >= 1 true pair
    #                        of its group (feeds compact_plan)


def aabb_flags(pos_s: V3, plan, B: int, h: float) -> jnp.ndarray:
    """Broad-phase block flags: candidate block j of group g is flagged
    iff the axis-aligned bounding boxes of the block's 128 sorted
    particles and the group's B queries come within h. A conservative
    SUPERSET of the true pair-holding blocks at pure elementwise cost
    (no (QB, B, W) dense pass): cell-sorted blocks are spatially local,
    so the near-miss ring is thin. Feeds compact_plan to tighten a CSR
    cover without evaluating it densely."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    QB, nbcap = blk.shape
    nblocks = -(-n // BLOCK)
    BIG = jnp.float32(3e38)

    def blocky(c, fill):
        return jnp.pad(c, (0, nblocks * BLOCK - n),
                       constant_values=fill).reshape(nblocks, BLOCK)

    def q(c):
        return jnp.pad(c, (0, QB * B - n), mode="edge").reshape(QB, B)

    flag = nb_mask
    gap2 = jnp.zeros((QB, nbcap), jnp.float32)
    for c in pos_s.astuple():
        bmin = blocky(c, BIG).min(axis=1)[blk]       # (QB, nbcap)
        bmax = blocky(c, -BIG).max(axis=1)[blk]
        qmin = q(c).min(axis=1)[:, None]
        qmax = q(c).max(axis=1)[:, None]
        gap = jnp.maximum(jnp.maximum(qmin - bmax, bmin - qmax), 0.0)
        gap2 = gap2 + gap * gap
    return flag & (gap2 <= jnp.float32(h) * jnp.float32(h))


def compact_plan(plan, blk_pair: jnp.ndarray, nbcap2: int):
    """Tighten a (wide) CSR plan to the blocks that actually hold pairs.

    The CSR plan must COVER the whole 27-cell stencil, and block
    granularity fragments its runs: the evolved-flow union can exceed a
    seed-sized capacity by 2x+ (measured on the 30k dam at t=0.026 —
    need 21+ vs seed 10 at B=16), and capacity overflow there drops real
    pairs. Pair CONTENT, by contrast, is physics-bounded (the compact
    path's plan_blocks capacity never overflowed in any measured run).
    So: run the wide pass once for the step-constant terms, then keep
    only the flagged blocks for the stored matrix and the per-iteration
    matvecs. Same dedupe-free top_k idiom as plan_blocks; overflow
    counts flagged blocks beyond nbcap2."""
    blk, nb_mask, _ = plan
    QB, nbcap = blk.shape
    flag = blk_pair & nb_mask
    overflow = jnp.maximum(
        jnp.max(jnp.sum(flag, axis=1)) - nbcap2, 0).astype(jnp.int32)
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max // 2)
    col = jnp.arange(nbcap, dtype=jnp.int32)[None, :]
    key = jnp.where(flag, sentinel - blk, -col)
    topkey, _ = jax.lax.top_k(key, min(nbcap2, nbcap))
    mask2 = topkey > 0
    blk2 = jnp.where(mask2, sentinel - topkey, 0)
    return (blk2, mask2, overflow)


def build_band(pos_s: V3, idx: jnp.ndarray = None,
               mask_f: jnp.ndarray = None,
               *, h: float, m: float, nbcap: int = 0, B: int = 8,
               src_valid: jnp.ndarray | None = None,
               plan=None, dtype=jnp.float32) -> BandA:
    """Build the step's band matrix from CELL-SORTED fluid positions and
    the compact list's fluid pairs (sorted order is what makes the block
    plan small). The coefficients are recomputed densely from positions
    over the block windows (NOT scattered from the (N, K) list): one
    (QB, B, W) VPU pass, no per-pair scatter.

    `src_valid` masks capacity-padding slots in fixed-capacity source sets
    (the sharded path): padded slots sit at position 0 and would otherwise
    alias real near-origin pairs."""
    return build_band_terms(pos_s, idx, mask_f, h=h, m=m, nbcap=nbcap,
                            B=B, src_valid=src_valid, plan=plan,
                            dtype=dtype).band


def build_band_terms(pos_s: V3, idx: jnp.ndarray = None,
                     mask_f: jnp.ndarray = None,
                     *, h: float, m: float, nbcap: int = 0, B: int = 8,
                     src_valid: jnp.ndarray | None = None,
                     plan=None, dtype=jnp.float32) -> BandTerms:
    """`build_band` plus fused per-particle sums (BandTerms). Under jit,
    callers that only consume `.band` pay nothing for the extra outputs
    (dead-code elimination removes their reductions)."""
    n = pos_s.x.shape[0]
    nblocks = -(-n // BLOCK)
    nbcap = min(nbcap, nblocks)
    if plan is not None:
        # Reuse a CSR-derived plan (e.g. the one that built the neighbor
        # list) — XLA then CSEs the shared window fetches.
        blk, nb_mask, overflow = plan
        nbcap = blk.shape[1]
    else:
        blk, nb_mask, overflow = plan_blocks(idx, mask_f, n, B, nbcap)
    QB = blk.shape[0]
    W = nbcap * BLOCK

    wx = _window(blk, pos_s.x, n).reshape(QB, 1, W)
    wy = _window(blk, pos_s.y, n).reshape(QB, 1, W)
    wz = _window(blk, pos_s.z, n).reshape(QB, 1, W)

    def q(c):
        return jnp.pad(c, (0, QB * B - n)).reshape(QB, B, 1)

    dx = q(pos_s.x) - wx
    dy = q(pos_s.y) - wy
    dz = q(pos_s.z) - wz
    r2 = dx * dx + dy * dy + dz * dz

    scol = (blk[:, :, None] * BLOCK
            + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
            ).reshape(QB, 1, W)
    qslot = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B, 1)
    valid = (jnp.broadcast_to(nb_mask[:, :, None],
                              (QB, nbcap, BLOCK)).reshape(QB, 1, W)
             & (scol < n) & (qslot < n) & (scol != qslot)
             & (r2 <= jnp.float32(h) * jnp.float32(h)))
    if src_valid is not None:
        valid &= _window(blk, src_valid, n).reshape(QB, 1, W)
        vq = jnp.pad(src_valid, (0, QB * B - n)).reshape(QB, B, 1)
        valid &= vq

    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    w = jnp.where(valid, jnp.float32(m) * sm.cubic_grad_coeff(r, h), 0.0)
    ax, ay, az = w * dx, w * dy, w * dz
    # Row sums in f32 BEFORE any storage downcast (they set the self-side
    # coefficient and the alpha denominator scale).
    s = V3(ax.sum(axis=2).reshape(-1)[:n],
           ay.sum(axis=2).reshape(-1)[:n],
           az.sum(axis=2).reshape(-1)[:n])
    if dtype != jnp.float32:
        # bf16 storage halves the per-iteration HBM reads of A (measured
        # 1.32 -> 0.57 ms per iteration at 29k); matvec accumulates in f32
        # on the MXU (preferred_element_type).
        ax, ay, az = (t.astype(dtype) for t in (ax, ay, az))
    band = BandA(blk=blk, nb_mask=nb_mask, ax=ax, ay=ay, az=az, s=s,
                 overflow=overflow)

    # Extra fused sums (BandTerms docstring). |gradW| = |gc| * r, so the
    # alpha Q term (m gc r)^2 is (w r)^2 with the already-masked w.
    def rw(t):
        return t.sum(axis=2).reshape(-1)[:n]

    wk = jnp.where(valid, sm.cubic_w(r, h), 0.0)
    rho = rw(jnp.float32(m) * wk)
    count = valid.sum(axis=2).astype(jnp.int32).reshape(-1)[:n]
    qsum = rw((w * r) ** 2)
    tvec = V3(rw(wk * dx), rw(wk * dy), rw(wk * dz))
    blk_pair = valid.reshape(QB, B, nbcap, BLOCK).any(axis=(1, 3))
    return BandTerms(band=band, rho=rho, count=count, qsum=qsum, tvec=tvec,
                     blk_pair=blk_pair)


class WindowEngine(NamedTuple):
    """Per-step dense-window loop engine for scales where the stored band
    matrix does not fit HBM (the 1M regime: a (QB, B, W) bf16 A at
    band_nb=30 would be ~15 GB). Caches only the (QB, W) position windows
    (f32 — bf16 would round positions past the kernel's accuracy needs)
    and recomputes the pair coefficients w = m * dW/dr / r on the fly
    inside each matvec: a fused elementwise + reduce pass over (QB, B, W)
    at dense-VPU rates, replacing the (N, K) per-pair gathers the
    round-2 engine paid ~6 ns per gathered index for (at 1M x K=48 x 2
    gathers per iteration that was most of a ~14.6 s DFSPH step)."""
    wx: jnp.ndarray        # (QB, W) f32 source-position windows
    wy: jnp.ndarray
    wz: jnp.ndarray
    wvalid: jnp.ndarray    # (QB, W) bool — nb_mask & real-slot (static part)
    scol: jnp.ndarray      # (QB, W) int32 — sorted-source slot per column
    blkq: jnp.ndarray      # (QB, nbcap) covering source-block ids
    s: V3                  # (N,) row sums Sigma_j wf gradW_ij
    overflow: jnp.ndarray  # () int32 — block-plan capacity overflow

    @property
    def n(self) -> int:
        return self.s.x.shape[0]


def build_window_engine(pos_s: V3, *, h: float, m: float, plan,
                        B: int) -> WindowEngine:
    """Cache the plan's position windows + row sums. `plan` is the CSR
    plan the grouped list build already produced (find_neighbors_grouped)
    — the window fetches CSE with the build's own."""
    n = pos_s.x.shape[0]
    blk, nb_mask, overflow = plan
    QB, nbcap = blk.shape
    W = nbcap * BLOCK

    wx = _window(blk, pos_s.x, n).reshape(QB, W)
    wy = _window(blk, pos_s.y, n).reshape(QB, W)
    wz = _window(blk, pos_s.z, n).reshape(QB, W)
    scol = (blk[:, :, None] * BLOCK
            + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
            ).reshape(QB, W)
    wvalid = (jnp.broadcast_to(nb_mask[:, :, None],
                               (QB, nbcap, BLOCK)).reshape(QB, W)
              & (scol < n))

    eng = WindowEngine(wx=wx, wy=wy, wz=wz, wvalid=wvalid, scol=scol,
                       blkq=blk, s=V3(*(jnp.zeros((n,), jnp.float32),) * 3),
                       overflow=overflow)
    s = _window_pass(eng, pos_s, h, m, B, None, None)
    return eng._replace(s=s)


def _window_pass(eng: WindowEngine, pos_s: V3, h: float, m: float, B: int,
                 kwin, vwin):
    """One fused (QB, B, W) coefficient pass over the cached windows.

    kwin is None, vwin is None -> V3 row sums   Sigma_j w d_c
    kwin (QB, W)               -> V3 matvec     Sigma_j w d_c k_j
    vwin V3 of (QB, W)         -> (N,) matvec_dot Sigma_j w (d . v_j)

    All products/reductions are elementwise-fused by XLA (sum over the
    last axis, no dot operand materialization), so peak memory stays at
    tile granularity despite the (QB, B, W) logical extent."""
    QB, W = eng.wx.shape
    n = pos_s.x.shape[0]

    def q(c):
        return jnp.pad(c, (0, QB * B - n)).reshape(QB, B, 1)

    dx = q(pos_s.x) - eng.wx[:, None, :]
    dy = q(pos_s.y) - eng.wy[:, None, :]
    dz = q(pos_s.z) - eng.wz[:, None, :]
    r2 = dx * dx + dy * dy + dz * dz
    qslot = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B, 1)
    valid = (eng.wvalid[:, None, :] & (qslot < n)
             & (eng.scol[:, None, :] != qslot)
             & (r2 <= jnp.float32(h) * jnp.float32(h)))
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    w = jnp.where(valid, jnp.float32(m) * sm.cubic_grad_coeff(r, h), 0.0)

    if vwin is not None:
        acc = w * (dx * vwin.x[:, None, :] + dy * vwin.y[:, None, :]
                   + dz * vwin.z[:, None, :])
        return acc.sum(axis=2).reshape(-1)[:n]
    if kwin is not None:
        wk = w * kwin[:, None, :]
        return V3((wk * dx).sum(axis=2).reshape(-1)[:n],
                  (wk * dy).sum(axis=2).reshape(-1)[:n],
                  (wk * dz).sum(axis=2).reshape(-1)[:n])
    return V3((w * dx).sum(axis=2).reshape(-1)[:n],
              (w * dy).sum(axis=2).reshape(-1)[:n],
              (w * dz).sum(axis=2).reshape(-1)[:n])


def window_matvec_ops(eng: WindowEngine, pos_s: V3, h: float, m: float,
                      B: int):
    """(matvec, matvec_dot) closures over the cached windows — the
    drop-in counterpart of band_matvec_ops/gather_matvec_ops."""
    n = pos_s.x.shape[0]

    def matvec(k):
        kwin = _window(eng.blkq, k, n)
        return _window_pass(eng, pos_s, h, m, B, kwin, None)

    def matvec_dot(v: V3):
        vwin = V3(_window(eng.blkq, v.x, n), _window(eng.blkq, v.y, n),
                  _window(eng.blkq, v.z, n))
        return _window_pass(eng, pos_s, h, m, B, None, vwin)

    return matvec, matvec_dot


class CoefEngine(NamedTuple):
    """Stored-coefficient MXU loop engine for scales where the 3-component
    band matrix does not fit HBM (the 1M regime: (QB, B, W) bf16 ax/ay/az
    at band_nb=30 is ~23 GB; the scalar w alone is ~7.7 GB).

    Stores ONLY the pair coefficient w_ij = m * dW/dr / r (masked to 0 at
    non-pairs) and evaluates the vector matvecs through the algebraic
    split over ABSOLUTE coordinates:

        Sigma_j w d_c k_j   = x_ic (w @ k) - w @ (x_c k)
        Sigma_j w (d . v_j) = Sigma_c x_ic (w @ v_c) - w @ (x . v)

    Each matvec builds a tiny (nblocks, 4, 128) f32 product table (k and
    x_c*k at source-table granularity, ~16 MB at 1M) and contracts it
    against w in ONE einsum 'qbnc,qnrc->qbr' whose rhs is the RAW
    block-row gather tab[blk] — no transpose, no materialized rhs: XLA
    fuses the gather and the bf16->f32 upcast of w into the dot.
    Measured on-chip (tools/perf_r4_matvec2.py, 2^20 particles, W=1536):
    10.9 ms/matvec vs 32 ms for the round-3 form (whose standalone
    block-row gather alone measured 22.9 ms — gathers run ~5x below HBM
    rate unless fused into a consumer) against a 4.6 ms w-read roofline.

    Accuracy: better than the round-3 form. The products and the einsum
    accumulate in f32 (w upcast from bf16); the absolute-coordinate
    cancellation x_i*(Sigma w k) - Sigma w x_j k amplifies f32 rounding
    by ~|x|/|d| (~200x -> ~1e-5 relative), far below the stored-w bf16
    quantization (~0.4%) that both forms share. The round-3 form's
    group-centering existed only to protect a bf16 rhs — the f32 rhs
    needs none.

    Beyond w itself nothing per-pair is stored: position tables are
    (nblocks, 128) and the windows are re-derived inside the einsum."""
    blkq: jnp.ndarray      # (QB, nbcap) covering source-block ids
    w: jnp.ndarray         # (QB, B, W) bf16 — masked pair coefficients
    tbx: jnp.ndarray       # (nblocks, 128) f32 — source position tables
    tby: jnp.ndarray
    tbz: jnp.ndarray
    qx: jnp.ndarray        # (QB, B) f32 — query positions (absolute)
    qy: jnp.ndarray
    qz: jnp.ndarray
    s: V3                  # (N,) row sums — or (G, B) V3 when qsel is set
    overflow: jnp.ndarray  # () int32 — block-plan capacity overflow
    # (G,) int32 group indices when the engine covers a SUBSET of query
    # groups (the split-bucket remainder); None for a full engine. With
    # qsel set, coef_matvec_ops returns (G, B)-shaped outputs for the
    # caller to scatter, and `s` stays group-shaped.
    qsel: jnp.ndarray | None = None
    # Fused per-particle term sums over the SAME pair set (the build pass
    # already evaluates the pair geometry, so these ride for one extra
    # kernel eval each): qsum = Sigma (w r)^2 (DFSPH alpha Q), tvec =
    # Sigma W_ij x_ij (tension). The pair-tight plan covers every block
    # holding a true pair, so these equal the wide-plan sums — letting
    # the wide one-shot pass compute only rho/count/flags (dfsph.
    # build_dense_engine; the wide pass is capacity-priced, measured
    # 519 ms one-shot at 1M of which the term pass was the largest part).
    qsum: jnp.ndarray | None = None
    tvec: V3 | None = None

    @property
    def n(self) -> int:
        return self.s.x.shape[0]


def build_coef_engine(pos_s: V3, *, h: float, m: float, plan, B: int,
                      dtype=jnp.bfloat16, qsel=None) -> CoefEngine:
    """Dense (QB, B, W) coefficient pass (same validity rules as
    build_band) producing the stored scalar w + f32 row sums. Runs in
    QB chunks under lax.map: at 1M particles the stored w alone is
    ~7 GB, so the build must never hold full-extent f32 intermediates
    alongside it (an unchunked build OOM'd with 3 windows x ~1 GB of
    rematerialized temps on the 16 GB chip)."""
    n = pos_s.x.shape[0]
    blk, nb_mask, overflow = plan
    G, nbcap = blk.shape
    W = nbcap * BLOCK
    nblocks = -(-n // BLOCK)
    nc = _coef_chunks(G, W)
    Qc = G // nc

    tbx = jnp.pad(pos_s.x, (0, nblocks * BLOCK - n)).reshape(nblocks, BLOCK)
    tby = jnp.pad(pos_s.y, (0, nblocks * BLOCK - n)).reshape(nblocks, BLOCK)
    tbz = jnp.pad(pos_s.z, (0, nblocks * BLOCK - n)).reshape(nblocks, BLOCK)

    QB_full = -(-n // B)

    def q(c):
        full = jnp.pad(c, (0, QB_full * B - n), mode="edge"
                       ).reshape(QB_full, B)
        return full if qsel is None else full[qsel]

    qxa, qya, qza = q(pos_s.x), q(pos_s.y), q(pos_s.z)
    if qsel is None:
        qslot_a = jnp.arange(G * B, dtype=jnp.int32).reshape(G, B)
    else:
        qslot_a = (qsel[:, None].astype(jnp.int32) * B
                   + jnp.arange(B, dtype=jnp.int32)[None, :])
    col = jnp.arange(BLOCK, dtype=jnp.int32)

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    def chunk(args):
        blk_c, mask_c, qx, qy, qz, qslot = args
        wx = tbx[blk_c].reshape(Qc, W)
        wy = tby[blk_c].reshape(Qc, W)
        wz = tbz[blk_c].reshape(Qc, W)
        dx = qx[:, :, None] - wx[:, None, :]
        dy = qy[:, :, None] - wy[:, None, :]
        dz = qz[:, :, None] - wz[:, None, :]
        r2 = dx * dx + dy * dy + dz * dz
        scol = (blk_c[:, :, None] * BLOCK + col[None, None, :]
                ).reshape(Qc, 1, W)
        valid = (jnp.broadcast_to(mask_c[:, :, None],
                                  (Qc, nbcap, BLOCK)).reshape(Qc, 1, W)
                 & (scol < n) & (qslot[:, :, None] < n)
                 & (scol != qslot[:, :, None])
                 & (r2 <= jnp.float32(h) * jnp.float32(h)))
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        w = jnp.where(valid, jnp.float32(m) * sm.cubic_grad_coeff(r, h),
                      0.0)
        # f32 row sums before the storage downcast (they set the
        # self-side coefficient and the alpha denominator scale).
        s = V3((w * dx).sum(axis=2), (w * dy).sum(axis=2),
               (w * dz).sum(axis=2))
        # Fused term sums over the same pair set (CoefEngine docstring):
        # one extra cubic_w eval on the already-computed geometry. Dead-
        # code-eliminated under jit when the caller ignores them.
        wk = jnp.where(valid, sm.cubic_w(r, h), 0.0)
        qsum = ((w * r) ** 2).sum(axis=2)
        tvec = V3((wk * dx).sum(axis=2), (wk * dy).sum(axis=2),
                  (wk * dz).sum(axis=2))
        return (w.astype(dtype), qx, qy, qz, s, qsum, tvec)

    xs = (resh(blk), resh(nb_mask), resh(qxa), resh(qya), resh(qza),
          resh(qslot_a))
    if nc == 1:
        out = chunk(tuple(t[0] for t in xs))
        w, qx, qy, qz, s, qsum, tvec = out
    else:
        out = jax.lax.map(chunk, xs)
        w, qx, qy, qz, s, qsum, tvec = jax.tree_util.tree_map(
            lambda o: o.reshape((nc * Qc,) + o.shape[2:]), out)
    if qsel is None:
        s = V3(*(c.reshape(-1)[:n] for c in s.astuple()))
        qsum = qsum.reshape(-1)[:n]
        tvec = V3(*(c.reshape(-1)[:n] for c in tvec.astuple()))
    return CoefEngine(blkq=blk, w=w, tbx=tbx, tby=tby, tbz=tbz,
                      qx=qx, qy=qy, qz=qz,
                      s=s, overflow=overflow, qsel=qsel,
                      qsum=qsum, tvec=tvec)


def _coef_chunks(QB: int, W: int) -> int:
    """Chunk count for the per-matvec rhs temp ((Qc, 4, W) bf16): largest
    divisor of QB keeping the temp under ~64 MB. Chunked evaluation runs
    under lax.map, so peak memory stays bounded while the einsum streams
    w at HBM rate."""
    target = max(1, (64 << 20) // (4 * W * 2))
    if QB <= target:
        return 1
    for nc in range(-(-QB // target), QB + 1):
        if QB % nc == 0:
            return nc
    return QB


# bf16 BLOCK-RELATIVE rhs for the coef matvecs: the 4-lane f32 product
# gather is 16 of the 18 bytes/slot each matvec streams; per-source-block
# relative coordinates (x_j - c_b) bound the cancellation amplification
# by the block extent (~2-3 cells), letting the product lanes go bf16 —
# the same error class as the stored bf16 w itself — and making the dot
# the MXU-native bf16 x bf16 -> f32 form. The einsum keeps the block
# axis ('qbnc,qnrc->qbnr') and the c_b corrections fold back with small
# (Qc, nbcap) gathers.
#
# MEASURED NEGATIVE RESULT (r4, 1M hot dam): the ~2% matvec_dot noise
# sits near the density-loop threshold scale, so the solve grinds — den
# iters 2 -> 12 and the step BLEW UP 1678 -> 4315 ms despite the ~1.8x
# cheaper matvec. Default False (the exact-f32 absolute-coordinate
# form); the path + its accuracy test are kept as the record of why.
COEF_RHS_RELATIVE = False


def _matvec_chunks(QB: int, W: int) -> int:
    """Chunk count for the per-matvec PLANE rhs temp ((4, Qc, W) f32):
    largest divisor of QB keeping the temp under ~640 MB. At the 1M
    scale (QB=31250, W=1152, temp 576 MB) this stays 1 — the whole
    point: the unchunked plane einsum is what reaches the memory floor
    (tools/perf_r5_mv4.py: 8.2 ms vs 42.7 for the r4 chunked form)."""
    target = max(1, (640 << 20) // (4 * W * 4))
    if QB <= target:
        return 1
    for nc in range(-(-QB // target), QB + 1):
        if QB % nc == 0:
            return nc
    return QB


def coef_matvec_ops(eng: CoefEngine, n: int, B: int):
    """(matvec, matvec_dot) closures — the drop-in counterpart of
    band_matvec_ops / window_matvec_ops / gather_matvec_ops.

    One (4, nblocks, 128) f32 product table per matvec ([k, sx k, sy k,
    sz k] — products at SOURCE-TABLE granularity, ~16 MB of work at
    1M), gathered into an explicit (4, QB, W) PLANE rhs — r-major, W
    contiguous — behind an optimization_barrier, then ONE einsum
    'qbw,rqw->rqb'. The barrier + plane layout are the round-5 result
    (tools/perf_r5_mv3.py / perf_r5_mv4.py, 1M hot dam, v5e): the r4
    form ('qbnc,qnrc->qbr' over the fused block-row gather) ran 42.7 ms
    against a ~10 ms memory floor (w-stream 3.7 + row gather 8.3) — the
    4-lane output denied XLA an efficient schedule, and a hand Pallas
    VPU kernel over the same planes (10.6 ms) ALSO lost to giving XLA
    the materialized plane rhs: 8.2 ms/matvec, rel diff 8e-5 (f32
    reduction order, far under the shared bf16-w quantization). With
    COEF_RHS_RELATIVE the rhs is instead bf16 in block-relative
    coordinates (see flag note)."""
    QB, _, W = eng.w.shape
    nbcap = eng.blkq.shape[1]
    nblocks = -(-n // BLOCK)
    nc = (_coef_chunks(QB, W) if COEF_RHS_RELATIVE
          and eng.w.dtype == jnp.bfloat16 else _matvec_chunks(QB, W))
    Qc = QB // nc

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    relative = COEF_RHS_RELATIVE and eng.w.dtype == jnp.bfloat16
    w_r = (eng.w.reshape(nc, Qc, eng.w.shape[1], nbcap, BLOCK)
           if relative else resh(eng.w))
    blk_r = resh(eng.blkq)
    qx_r, qy_r, qz_r = resh(eng.qx), resh(eng.qy), resh(eng.qz)
    if relative:
        # Per-source-block reference points. The mean of a (128,) block
        # row (pad zeros included) is only a REFERENCE — any value works
        # for exactness; closer to the block tightens the bf16 rounding.
        cbx = eng.tbx.mean(axis=1)
        cby = eng.tby.mean(axis=1)
        cbz = eng.tbz.mean(axis=1)
        rx = eng.tbx - cbx[:, None]
        ry = eng.tby - cby[:, None]
        rz = eng.tbz - cbz[:, None]

    def vb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks,
                                                               BLOCK)

    def run(chunk_fn):
        # Value tables are closed over (loop constants); only the engine
        # chunks travel through lax.map's xs.
        xs = (w_r, blk_r, qx_r, qy_r, qz_r)
        if nc == 1:
            out = chunk_fn(tuple(t[0] for t in xs))
        else:
            out = jax.lax.map(chunk_fn, xs)
        if eng.qsel is not None:
            # Subset engine (split-bucket remainder): keep (G, B) shape
            # for the caller's scatter.
            return jax.tree_util.tree_map(
                lambda o: o.reshape((-1,) + o.shape[-1:])
                if o.ndim > 2 else o, out)
        return jax.tree_util.tree_map(
            lambda o: o.reshape(-1)[:n], out)

    def matvec(k):
        tbl = vb(k)
        if relative:
            tab = jnp.stack([tbl, rx * tbl, ry * tbl, rz * tbl],
                            axis=1).astype(jnp.bfloat16)

            def chunk(args):
                w_c, blk_c, qx_c, qy_c, qz_c = args
                pw = tab[blk_c]                  # (Qc, nbcap, 4, 128) bf16
                o4 = jnp.einsum("qbnc,qnrc->qbnr", w_c, pw,
                                preferred_element_type=jnp.float32)
                sk_n = o4[..., 0]                # (Qc, B, nbcap)
                cx = cbx[blk_c][:, None, :]
                cy = cby[blk_c][:, None, :]
                cz = cbz[blk_c][:, None, :]
                sk = sk_n.sum(axis=2)
                # Sigma w x_j k = Sigma_blocks [Sigma w (x_j - c_b) k
                #                               + c_b Sigma w k]
                return V3(qx_c * sk - (o4[..., 1] + cx * sk_n).sum(axis=2),
                          qy_c * sk - (o4[..., 2] + cy * sk_n).sum(axis=2),
                          qz_c * sk - (o4[..., 3] + cz * sk_n).sum(axis=2))

            return run(chunk)
        # (4, nblocks, 128) plane table: f32 products [k, sx k, sy k,
        # sz k], rounded to bf16 AT THE TABLE for bf16-w engines —
        # numerically identical to the f32-plane form (XLA's DEFAULT
        # matmul precision converts the f32 plane to bf16 at the MXU
        # anyway; same rounding point, probe rel diff exactly 0) while
        # halving the gather + layout-copy bytes the trace exposed
        # (tools/perf_r5_mv5.py: 8.1 -> 7.6 ms/matvec at hot 1M).
        # f32-w engines (exactness tests) keep the f32 plane.
        tab = jnp.stack([tbl, eng.tbx * tbl, eng.tby * tbl,
                         eng.tbz * tbl], axis=0).astype(eng.w.dtype)

        def chunk(args):
            w_c, blk_c, qx_c, qy_c, qz_c = args
            # Materialized r-major plane rhs behind a barrier — the
            # measured-fast schedule (coef_matvec_ops docstring).
            p = jax.lax.optimization_barrier(
                tab[:, blk_c].reshape(4, blk_c.shape[0], W))
            out = jnp.einsum("qbw,rqw->rqb", w_c, p,
                             preferred_element_type=jnp.float32)
            # Sigma w d_c k = x_c (Sigma w k) - Sigma w x_j,c k — exact
            # f32 algebra over absolute coordinates (CoefEngine note).
            return V3(qx_c * out[0] - out[1],
                      qy_c * out[0] - out[2],
                      qz_c * out[0] - out[3])

        return run(chunk)

    def matvec_dot(v: V3):
        tx, ty, tz = vb(v.x), vb(v.y), vb(v.z)
        if relative:
            tab = jnp.stack([tx, ty, tz, rx * tx + ry * ty + rz * tz],
                            axis=1).astype(jnp.bfloat16)

            def chunk(args):
                w_c, blk_c, qx_c, qy_c, qz_c = args
                pw = tab[blk_c]
                o4 = jnp.einsum("qbnc,qnrc->qbnr", w_c, pw,
                                preferred_element_type=jnp.float32)
                cx = cbx[blk_c][:, None, :]
                cy = cby[blk_c][:, None, :]
                cz = cbz[blk_c][:, None, :]
                # Sigma w (x_c - x_j) . v = Sigma_blocks [(x_c - c_b) .
                #   Sigma w v - Sigma w (x_j - c_b) . v]
                acc = ((qx_c[:, :, None] - cx) * o4[..., 0]
                       + (qy_c[:, :, None] - cy) * o4[..., 1]
                       + (qz_c[:, :, None] - cz) * o4[..., 2]
                       - o4[..., 3])
                return acc.sum(axis=2)

            return run(chunk)
        # (4, nblocks, 128) plane table [vx, vy, vz, s . v] — engine-
        # dtype at the table for the same zero-diff reason as the
        # matvec plane.
        tab = jnp.stack([tx, ty, tz, eng.tbx * tx + eng.tby * ty
                         + eng.tbz * tz], axis=0).astype(eng.w.dtype)

        def chunk(args):
            w_c, blk_c, qx_c, qy_c, qz_c = args
            p = jax.lax.optimization_barrier(
                tab[:, blk_c].reshape(4, blk_c.shape[0], W))
            out = jnp.einsum("qbw,rqw->rqb", w_c, p,
                             preferred_element_type=jnp.float32)
            return (qx_c * out[0] + qy_c * out[1]
                    + qz_c * out[2] - out[3])

        return run(chunk)

    return matvec, matvec_dot


def dense_viscosity(pos_s: V3, vel_s: V3, rho: jnp.ndarray, *, h: float,
                    m: float, plan, B: int, c_s: float, alpha: float,
                    eps: float = 0.01, qsel=None) -> V3:
    """Monaghan artificial viscosity (fluid-fluid, compression-only) as a
    dense window pass over the step's CSR block plan — the dense-mode
    counterpart of models.base.nbh_viscosity's fluid branch (reference
    solver_base.py:170-202). Returns the per-particle term already scaled
    by particle_m, in sorted fluid order.

    Runs after the divergence solve (the reference evaluates viscosity on
    the post-divergence velocity), so it cannot fuse with the
    build_band_terms pass; it re-gathers the position windows plus
    velocity/rho windows (4 extra row gathers) and recomputes the pair
    geometry — dense VPU work, no per-pair gathers.

    Chunked over query groups under lax.map like dense_wcsph_forces: the
    unchunked form's materialized (QB, W) windows (7 of them) exhausted
    HBM at 1M particles.

    `qsel`: (G,) int32 group ids when the plan covers a SUBSET of query
    groups (the split-bucket remainder — build_coef_engine's convention);
    the result stays (G, B)-shaped for the caller to scatter."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    QB, nbcap = blk.shape
    W = nbcap * BLOCK
    nblocks = -(-n // BLOCK)
    target = max(1, (512 << 20) // (32 * W))
    nc = 1
    if QB > target:
        nc = -(-QB // target)
        while QB % nc:
            nc += 1
    Qc = QB // nc

    def tb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks,
                                                               BLOCK)

    tbx, tby, tbz = tb(pos_s.x), tb(pos_s.y), tb(pos_s.z)
    tvx, tvy, tvz = tb(vel_s.x), tb(vel_s.y), tb(vel_s.z)
    trho = tb(rho)

    QB_full = -(-n // B)

    def q(c):
        full = jnp.pad(c, (0, QB_full * B - n)).reshape(QB_full, B)
        return full if qsel is None else full[qsel]

    qx, qy, qz = q(pos_s.x), q(pos_s.y), q(pos_s.z)
    qvx, qvy, qvz = q(vel_s.x), q(vel_s.y), q(vel_s.z)
    qrho = q(rho)
    if qsel is None:
        qslot_a = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B)
    else:
        qslot_a = (qsel[:, None].astype(jnp.int32) * B
                   + jnp.arange(B, dtype=jnp.int32)[None, :])
    col = jnp.arange(BLOCK, dtype=jnp.int32)
    h2 = jnp.float32(h) * jnp.float32(h)
    nu_num = jnp.float32(2.0 * alpha * h * c_s)
    q2e_add = jnp.float32(eps) * h2
    mf = jnp.float32(m)

    def chunk(args):
        (blk_c, mask_c, cqx, cqy, cqz, cvx, cvy, cvz, crho, qslot) = args

        def win(t):
            return t[blk_c].reshape(Qc, W)[:, None, :]

        dx = cqx[:, :, None] - win(tbx)
        dy = cqy[:, :, None] - win(tby)
        dz = cqz[:, :, None] - win(tbz)
        r2 = dx * dx + dy * dy + dz * dz
        scol = (blk_c[:, :, None] * BLOCK + col[None, None, :]
                ).reshape(Qc, 1, W)
        valid = (jnp.broadcast_to(mask_c[:, :, None],
                                  (Qc, nbcap, BLOCK)).reshape(Qc, 1, W)
                 & (scol < n) & (qslot[:, :, None] < n)
                 & (scol != qslot[:, :, None]) & (r2 <= h2))
        shear = (dx * (cvx[:, :, None] - win(tvx))
                 + dy * (cvy[:, :, None] - win(tvy))
                 + dz * (cvz[:, :, None] - win(tvz)))
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        gc = sm.cubic_grad_coeff(r, h)
        pi = -(nu_num / (crho[:, :, None] + win(trho))) * shear / (r2 + q2e_add)
        scale = jnp.where(valid & (shear < 0.0), -mf * pi * gc, 0.0)
        return V3((scale * dx).sum(axis=2), (scale * dy).sum(axis=2),
                  (scale * dz).sum(axis=2))

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    xs = (resh(blk), resh(nb_mask), resh(qx), resh(qy), resh(qz),
          resh(qvx), resh(qvy), resh(qvz), resh(qrho), resh(qslot_a))
    if nc == 1:
        out = chunk(tuple(t[0] for t in xs))
    else:
        out = jax.lax.map(chunk, xs)
    if qsel is not None:
        return V3(*(c.reshape((-1, B)) for c in out.astuple())) * mf
    return V3(*(c.reshape(-1)[:n] for c in out.astuple())) * mf


def split_tail_select(nb_mask: jnp.ndarray, nbA: int, capB: int):
    """Tail-group selection shared by the split-bucket engines: groups
    whose plan needs more than nbA blocks, ascending, capped at capB.
    Returns (gidx, gmask, over_split)."""
    QB = nb_mask.shape[0]
    need = jnp.sum(nb_mask, axis=1)
    over_g = need > nbA
    n_over = jnp.sum(over_g.astype(jnp.int32))
    over_split = jnp.maximum(n_over - capB, 0).astype(jnp.int32)
    iota = jnp.arange(QB, dtype=jnp.int32)
    key = jnp.where(over_g, QB - iota, 0)
    topkey, _ = jax.lax.top_k(key, capB)
    gmask = topkey > 0
    gidx = jnp.where(gmask, QB - topkey, 0)
    return gidx, gmask, over_split


def dense_viscosity_split(pos_s: V3, vel_s: V3, rho: jnp.ndarray, *,
                          h: float, m: float, plan, B: int, c_s: float,
                          alpha: float, nbA: int, capB: int,
                          sel=None) -> V3:
    """`dense_viscosity` over the split-bucket plan decomposition: the
    bulk pass pays only the first nbA blocks of every group (the p97
    cover width — build_split_coef_engine's bucket A) and the skewed
    tail rides a (capB, nbcap - nbA) remainder pass scattered back.
    Identical pair set to the full-width pass (measured at hot 1M: the
    full pair width is ~1.7x the p97 width, and this pass's cost scales
    with CAPACITY, not true pairs — the same economics that motivated the
    split coef engine). `sel`: precomputed (gidx, gmask) from the
    engine build (same plan -> same selection); computed here if None.
    Groups dropped past capB are the SAME groups the split engine
    dropped — already counted in its overflow."""
    n = pos_s.x.shape[0]
    blk, nb_mask, over0 = plan
    QB, nbcap = blk.shape
    nbA = min(nbA, nbcap)
    capB = min(capB, QB)
    if nbA >= nbcap:
        return dense_viscosity(pos_s, vel_s, rho, h=h, m=m, plan=plan,
                               B=B, c_s=c_s, alpha=alpha)
    plan_a = (blk[:, :nbA], nb_mask[:, :nbA], over0)
    acc = dense_viscosity(pos_s, vel_s, rho, h=h, m=m, plan=plan_a,
                          B=B, c_s=c_s, alpha=alpha)
    if sel is None:
        gidx, gmask, _ = split_tail_select(nb_mask, nbA, capB)
    else:
        gidx, gmask = sel
    plan_r = (blk[gidx, nbA:], nb_mask[gidx, nbA:] & gmask[:, None],
              over0)
    rem = dense_viscosity(pos_s, vel_s, rho, h=h, m=m, plan=plan_r,
                          B=B, c_s=c_s, alpha=alpha, qsel=gidx)
    gsafe = jnp.where(gmask, gidx, QB)

    def scat(gb):
        out = jnp.zeros((QB + 1, B), jnp.float32)
        return out.at[gsafe].set(gb, mode="drop").reshape(-1)[:QB * B][:n]

    return acc + V3(*(scat(c) for c in rem.astuple()))


def dense_rho_count(pos_s: V3, *, h: float, m: float, plan, B: int,
                    sub: int = 1, qsel=None):
    """Fluid-fluid density Sigma_j m W_ij + pair count + per-block pair
    flags as one chunked dense window pass (the dense-mode replacement
    for nbh_rho's fluid branch; the caller adds DENSITY_EPS and
    boundary/solid terms, and feeds the flags to compact_plan).
    Chunked like dense_wcsph_forces so it serves the 1M scene.

    sub > 1 emits flags at SUB-GROUP granularity — (QB*sub, nbcap), one
    row per B//sub consecutive queries — so a narrower loop-engine plan
    (SceneStatic.loop_B) can be compacted from the same wide pass.

    `qsel`: (G,) group ids for a SUBSET pass (split-bucket remainder):
    rho/count stay (G, B) for the caller to scatter, flags (G, nbcap)."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    QB, nbcap = blk.shape
    W = nbcap * BLOCK
    nblocks = -(-n // BLOCK)
    target = max(1, (512 << 20) // (16 * W))
    nc = 1
    if QB > target:
        nc = -(-QB // target)
        while QB % nc:
            nc += 1
    Qc = QB // nc

    def tb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks,
                                                               BLOCK)

    tbx, tby, tbz = tb(pos_s.x), tb(pos_s.y), tb(pos_s.z)

    QB_full = -(-n // B)

    def q(c):
        full = jnp.pad(c, (0, QB_full * B - n)).reshape(QB_full, B)
        return full if qsel is None else full[qsel]

    qx, qy, qz = q(pos_s.x), q(pos_s.y), q(pos_s.z)
    if qsel is None:
        qslot_a = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B)
    else:
        qslot_a = (qsel[:, None].astype(jnp.int32) * B
                   + jnp.arange(B, dtype=jnp.int32)[None, :])
    col = jnp.arange(BLOCK, dtype=jnp.int32)
    h2 = jnp.float32(h) * jnp.float32(h)

    def chunk(args):
        blk_c, mask_c, cqx, cqy, cqz, qslot = args

        def win(t):
            return t[blk_c].reshape(Qc, W)[:, None, :]

        dx = cqx[:, :, None] - win(tbx)
        dy = cqy[:, :, None] - win(tby)
        dz = cqz[:, :, None] - win(tbz)
        r2 = dx * dx + dy * dy + dz * dz
        scol = (blk_c[:, :, None] * BLOCK + col[None, None, :]
                ).reshape(Qc, 1, W)
        valid = (jnp.broadcast_to(mask_c[:, :, None],
                                  (Qc, nbcap, BLOCK)).reshape(Qc, 1, W)
                 & (scol < n) & (qslot[:, :, None] < n)
                 & (scol != qslot[:, :, None]) & (r2 <= h2))
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        wk = jnp.where(valid, sm.cubic_w(r, h), 0.0)
        return (jnp.float32(m) * wk.sum(axis=2),
                valid.sum(axis=2).astype(jnp.int32),
                valid.reshape(Qc, sub, B // sub, nbcap,
                              BLOCK).any(axis=(2, 4)))

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    xs = (resh(blk), resh(nb_mask), resh(qx), resh(qy), resh(qz),
          resh(qslot_a))
    if nc == 1:
        rho, count, flags = chunk(tuple(t[0] for t in xs))
    else:
        rho, count, flags = jax.lax.map(chunk, xs)
    if qsel is not None:
        return (rho.reshape(QB, B), count.reshape(QB, B),
                flags.reshape(QB * sub, nbcap))
    return (rho.reshape(-1)[:n], count.reshape(-1)[:n],
            flags.reshape(QB * sub, nbcap))


def dense_rho_count_split(pos_s: V3, *, h: float, m: float, plan,
                          B: int, nbA: int, capB: int):
    """`dense_rho_count` over the split-bucket plan decomposition (the
    wide one-shot pass is CAPACITY-priced like every dense pass, and
    its cap carries a ~1.7x safety margin over the p97 cover — the same
    economics as dense_viscosity_split). Returns (rho, count, flags,
    over_split) with flags at the FULL (QB, nbcap) width for
    compact_plan; groups dropped past capB are counted in over_split.
    sub-granular flags (SceneStatic.loop_B) are not supported here —
    callers in the split regime run sub == 1."""
    n = pos_s.x.shape[0]
    blk, nb_mask, over0 = plan
    QB, nbcap = blk.shape
    nbA = min(nbA, nbcap)
    capB = min(capB, QB)
    if nbA >= nbcap:
        rho, count, flags = dense_rho_count(pos_s, h=h, m=m, plan=plan,
                                            B=B)
        return rho, count, flags, jnp.zeros((), jnp.int32)
    plan_a = (blk[:, :nbA], nb_mask[:, :nbA], over0)
    rho, count, flags_a = dense_rho_count(pos_s, h=h, m=m, plan=plan_a,
                                          B=B)
    gidx, gmask, over_split = split_tail_select(nb_mask, nbA, capB)
    plan_r = (blk[gidx, nbA:], nb_mask[gidx, nbA:] & gmask[:, None],
              over0)
    rho_r, count_r, flags_r = dense_rho_count(pos_s, h=h, m=m,
                                              plan=plan_r, B=B,
                                              qsel=gidx)
    gsafe = jnp.where(gmask, gidx, QB)

    def scat(gb):
        out = jnp.zeros((QB + 1, B), gb.dtype)
        return out.at[gsafe].set(gb, mode="drop").reshape(-1)[:QB * B][:n]

    rho = rho + scat(rho_r)
    count = count + scat(count_r)
    flags = jnp.zeros((QB + 1, nbcap), bool)
    flags = flags.at[:QB, :nbA].set(flags_a)
    flags = flags.at[gsafe, nbA:].set(flags_r, mode="drop")
    return rho, count, flags[:QB], over_split


class DenseTerms(NamedTuple):
    """Per-particle step-constant sums for DFSPH's dense mode at scales
    where the stored band matrix does not fit HBM (build_band_terms is
    the unchunked band-regime counterpart; this pass stores nothing
    per-pair and runs chunked, so it serves the 1M scene)."""
    rho: jnp.ndarray    # (N,) Sigma_j m W_ij        (fluid-fluid density)
    count: jnp.ndarray  # (N,) int32 true pair count (the <20-neighbor skip)
    qsum: jnp.ndarray   # (N,) Sigma_j (m |gradW|)^2 (DFSPH alpha Q term)
    s: V3               # (N,) row sums Sigma_j wf gradW_ij
    tvec: V3            # (N,) Sigma_j W_ij x_ij     (tension: scale -k m)
    blk_pair: jnp.ndarray  # (QB, nbcap) bool — block holds >= 1 true pair


def dense_dfsph_terms(pos_s: V3, *, h: float, m: float, plan,
                      B: int) -> DenseTerms:
    """All of DFSPH's one-shot fluid-fluid sums (density, count, alpha Q,
    gradW row sums, tension vector) plus the pair-holding block flags in
    ONE chunked dense window pass over the CSR block plan. The flags feed
    compact_plan; the loops then run on a CoefEngine built over the tight
    plan — together this skips the compact (N, K) list entirely in the
    coef regime (at 1M the compaction alone measured ~1 s of a ~8.6 s
    step)."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    QB, nbcap = blk.shape
    W = nbcap * BLOCK
    nblocks = -(-n // BLOCK)
    target = max(1, (512 << 20) // (24 * W))
    nc = 1
    if QB > target:
        nc = -(-QB // target)
        while QB % nc:
            nc += 1
    Qc = QB // nc

    def tb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks,
                                                               BLOCK)

    tbx, tby, tbz = tb(pos_s.x), tb(pos_s.y), tb(pos_s.z)

    def q(c):
        return jnp.pad(c, (0, QB * B - n)).reshape(QB, B)

    qx, qy, qz = q(pos_s.x), q(pos_s.y), q(pos_s.z)
    qslot_a = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B)
    col = jnp.arange(BLOCK, dtype=jnp.int32)
    h2 = jnp.float32(h) * jnp.float32(h)
    mf = jnp.float32(m)

    def chunk(args):
        blk_c, mask_c, cqx, cqy, cqz, qslot = args

        def win(t):
            return t[blk_c].reshape(Qc, W)[:, None, :]

        dx = cqx[:, :, None] - win(tbx)
        dy = cqy[:, :, None] - win(tby)
        dz = cqz[:, :, None] - win(tbz)
        r2 = dx * dx + dy * dy + dz * dz
        scol = (blk_c[:, :, None] * BLOCK + col[None, None, :]
                ).reshape(Qc, 1, W)
        valid = (jnp.broadcast_to(mask_c[:, :, None],
                                  (Qc, nbcap, BLOCK)).reshape(Qc, 1, W)
                 & (scol < n) & (qslot[:, :, None] < n)
                 & (scol != qslot[:, :, None]) & (r2 <= h2))
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        wk = jnp.where(valid, sm.cubic_w(r, h), 0.0)
        w = jnp.where(valid, mf * sm.cubic_grad_coeff(r, h), 0.0)
        return (mf * wk.sum(axis=2),
                valid.sum(axis=2).astype(jnp.int32),
                ((w * r) ** 2).sum(axis=2),
                V3((w * dx).sum(axis=2), (w * dy).sum(axis=2),
                   (w * dz).sum(axis=2)),
                V3((wk * dx).sum(axis=2), (wk * dy).sum(axis=2),
                   (wk * dz).sum(axis=2)),
                valid.reshape(Qc, B, nbcap, BLOCK).any(axis=(1, 3)))

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    xs = (resh(blk), resh(nb_mask), resh(qx), resh(qy), resh(qz),
          resh(qslot_a))
    if nc == 1:
        rho, count, qsum, s, tvec, flags = chunk(tuple(t[0] for t in xs))
    else:
        rho, count, qsum, s, tvec, flags = jax.lax.map(chunk, xs)

    def fl(a):
        return a.reshape(-1)[:n]

    return DenseTerms(rho=fl(rho), count=fl(count), qsum=fl(qsum),
                      s=V3(*(fl(c) for c in s.astuple())),
                      tvec=V3(*(fl(c) for c in tvec.astuple())),
                      blk_pair=flags.reshape(QB, nbcap))


class SplitCoefEngine(NamedTuple):
    """Two-width ("split-bucket") CoefEngine: every group's FIRST nbA
    plan blocks live in a dense (QB, B, nbA*128) A-engine, and only the
    few groups needing more carry their remainder blocks in a compacted
    (capB, B, (nbcap-nbA)*128) engine. Matvec traffic scales with plan
    CAPACITY, not true need, and the per-group pair-block distribution is
    tight but skewed (measured evolved 1M dam: p50=10, p98=12, max=17
    against a static cap of 22) — the split pays the wide width only for
    the tail. Groups needing more than nbA blocks beyond capB lose their
    remainder (counted in overflow, the standard capacity contract)."""
    a: Any                 # CoefEngine over blk[:, :nbA] (all groups)
    rem: Any               # CoefEngine over blk[sel, nbA:] (qsel set)
    gmask: jnp.ndarray     # (capB,) bool — valid remainder rows
    s: V3                  # (N,) total row sums (A + scattered remainder)
    overflow: jnp.ndarray  # () int32
    # Fused term sums (CoefEngine.qsum/tvec), A + scattered remainder.
    qsum: jnp.ndarray | None = None
    tvec: V3 | None = None


def build_split_coef_engine(pos_s: V3, *, h: float, m: float, plan,
                            B: int, nbA: int, capB: int,
                            dtype=jnp.bfloat16) -> SplitCoefEngine:
    n = pos_s.x.shape[0]
    blk, nb_mask, over0 = plan
    QB, nbcap = blk.shape
    nbA = min(nbA, nbcap)
    capB = min(capB, QB)

    plan_a = (blk[:, :nbA], nb_mask[:, :nbA], jnp.zeros((), jnp.int32))
    eng_a = build_coef_engine(pos_s, h=h, m=m, plan=plan_a, B=B,
                              dtype=dtype)

    gidx, gmask, over_split = split_tail_select(nb_mask, nbA, capB)

    plan_r = (blk[gidx, nbA:], nb_mask[gidx, nbA:] & gmask[:, None],
              jnp.zeros((), jnp.int32))
    eng_r = build_coef_engine(pos_s, h=h, m=m, plan=plan_r, B=B,
                              dtype=dtype, qsel=gidx)

    gsafe = jnp.where(gmask, gidx, QB)

    def scat(gb):
        out = jnp.zeros((QB + 1, B), jnp.float32)
        return out.at[gsafe].set(gb, mode="drop").reshape(-1)[:QB * B][:n]

    s = eng_a.s + V3(*(scat(c) for c in eng_r.s.astuple()))
    qsum = eng_a.qsum + scat(eng_r.qsum)
    tvec = eng_a.tvec + V3(*(scat(c) for c in eng_r.tvec.astuple()))
    overflow = jnp.maximum(jnp.maximum(over0, over_split),
                           jnp.zeros((), jnp.int32))
    return SplitCoefEngine(a=eng_a, rem=eng_r, gmask=gmask, s=s,
                           overflow=overflow, qsum=qsum, tvec=tvec)


def split_coef_matvec_ops(seng: SplitCoefEngine, n: int, B: int):
    """(matvec, matvec_dot) over the split engine — A-engine output plus
    the scattered remainder contribution."""
    mva, mvda = coef_matvec_ops(seng.a, n, B)
    mvr, mvdr = coef_matvec_ops(seng.rem, n, B)
    QB = seng.a.w.shape[0]
    gsafe = jnp.where(seng.gmask, seng.rem.qsel, QB)

    def scat(gb):
        out = jnp.zeros((QB + 1, B), jnp.float32)
        return out.at[gsafe].set(gb, mode="drop").reshape(-1)[:QB * B][:n]

    def matvec(k):
        a = mva(k)
        r = mvr(k)
        return a + V3(*(scat(c) for c in r.astuple()))

    def matvec_dot(v: V3):
        return mvda(v) + scat(mvdr(v))

    return matvec, matvec_dot


class BoundaryWindows(NamedTuple):
    """Step-constant plumbing of the GROUP-SPARSE boundary passes: the
    wall-near query groups (selected by a cheap CSR interval test), their
    boundary block plan, and the sorted/padded boundary tables. Built once
    per step and shared by `dense_boundary_terms` (the one-shot sums) and
    `boundary_predict_op` (PCISPH's per-iteration predicted-density pass)."""
    gidx: jnp.ndarray      # (cap,) int32 — selected query-group ids
    gmask: jnp.ndarray     # (cap,) bool — selection validity
    blk: jnp.ndarray       # (cap, nbcap) int32 — boundary block plan
    nb_mask: jnp.ndarray   # (cap, nbcap) bool
    tbx: jnp.ndarray       # (nblocks, BLOCK) — sorted/padded boundary x
    tby: jnp.ndarray
    tbz: jnp.ndarray
    tbv: jnp.ndarray       # (nblocks, BLOCK) — boundary volumes
    nb_src: int            # true boundary particle count
    overflow: jnp.ndarray  # () int32 — near-group capacity + plan overflow


def build_boundary_windows(qcells: jnp.ndarray, bpos: V3,
                           bvol: jnp.ndarray, table, grid, *,
                           nbcap: int, cap: int) -> BoundaryWindows:
    """Select the wall-near query groups and build their boundary block
    windows (the precompute half of `dense_boundary_terms`)."""
    nb_src = bvol.shape[0]
    QB = qcells.shape[0]
    cap = min(cap, QB)

    lo, hi = csr_intervals(qcells, table.starts, grid)
    has = jnp.any(hi > lo, axis=1)
    n_near = jnp.sum(has.astype(jnp.int32))
    over_g = jnp.maximum(n_near - cap, 0).astype(jnp.int32)
    # Ascending selection of near groups by cumsum + unique-index
    # scatter (replaces a top_k whose lowering is a full (QB,)-wide
    # sort; selection order and drop-beyond-cap semantics identical).
    iota = jnp.arange(QB, dtype=jnp.int32)
    p = jnp.cumsum(has.astype(jnp.int32)) - 1
    tgt = jnp.where(has & (p < cap), p, cap)
    gidx = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(
        iota, mode="drop")[:cap]
    gmask = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(n_near, cap)

    sel_lo = lo[gidx]
    sel_hi = jnp.where(gmask[:, None], hi[gidx], sel_lo)  # masked: empty
    # Block-id bound = boundary blocks, NOT the cell count (see the
    # plan_from_csr note — the cell count forces the slow dedupe path).
    blk, nb_mask, over_p = plan_from_intervals(
        sel_lo, sel_hi, nblocks_src=((max(nb_src, 1) - 1) >> BLOCK_SHIFT) + 1,
        nbcap=nbcap)

    nblocks = -(-nb_src // BLOCK)
    blk = jnp.minimum(blk, max(nblocks - 1, 0))
    padn = nblocks * BLOCK - nb_src
    # Zero-pad the tables and mask pad slots via scol < nb_src (the other
    # dense passes' idiom): +inf padding poisons the masked sums with
    # 0 * inf = NaN in the dx products.
    srt = bpos.take(table.order)
    tbx = jnp.pad(srt.x, (0, padn)).reshape(nblocks, BLOCK)
    tby = jnp.pad(srt.y, (0, padn)).reshape(nblocks, BLOCK)
    tbz = jnp.pad(srt.z, (0, padn)).reshape(nblocks, BLOCK)
    tbv = jnp.pad(bvol[table.order], (0, padn)).reshape(nblocks, BLOCK)
    return BoundaryWindows(gidx=gidx, gmask=gmask, blk=blk, nb_mask=nb_mask,
                           tbx=tbx, tby=tby, tbz=tbz, tbv=tbv,
                           nb_src=nb_src,
                           overflow=jnp.maximum(over_g, over_p))


class DenseBoundaryTerms(NamedTuple):
    """Per-fluid-query Akinci boundary sums (dense mode): everything the
    solvers read from the boundary shell, so no compact (N, bK) boundary
    list is needed.

      rho:  (N,) rho0 * Sigma_b V_b W_ib            (boundary density)
      s:    V3 (N,) Sigma_b w_b gradW_ib, w_b = rho0 V_b  (the reference's
            separately-squared boundary vector; also WCSPH's boundary
            pressure acc = -p_over_rho2 * s)
      qsum: (N,) Sigma_b (w_b |gradW_ib|)^2         (DFSPH alpha Q term)
      g2:   (N,) Sigma_b w_b |gradW_ib|^2           (IISPH a_ii d_ji term)
    """
    rho: jnp.ndarray
    s: V3
    qsum: jnp.ndarray
    g2: jnp.ndarray
    overflow: jnp.ndarray  # () int32 — near-group capacity + plan overflow


def dense_boundary_terms(pos_q: V3, qcells: jnp.ndarray, bpos: V3,
                         bvol: jnp.ndarray, table, grid, *, h: float,
                         rho0: float, nbcap: int, B: int, cap: int,
                         bw: BoundaryWindows | None = None
                         ) -> DenseBoundaryTerms:
    """GROUP-SPARSE dense boundary pass: the boundary shell is a thin
    static hull, so only wall-near query groups have ANY boundary
    candidates (the interior of a 1M dam is >75% of the fluid). The
    cheap csr_intervals test selects the near groups (static capacity
    `cap`, overflow counted like every other capacity); only they pay
    the interval dedupe and the dense window evaluation.

    Replaces the grouped (N, bK) boundary list build + its per-term
    (N, bK) gathers — at 1M that build alone measured 1.33 s of a
    ~8.6 s step (a full-width dense pass would still be ~0.5 s; the
    group-sparse form scales with the wetted-surface fraction)."""
    n = pos_q.x.shape[0]
    QB = qcells.shape[0]
    cap = min(cap, QB)

    if bw is None:
        bw = build_boundary_windows(qcells, bpos, bvol, table, grid,
                                    nbcap=nbcap, cap=cap)
    gidx, gmask, blk, nb_mask = bw.gidx, bw.gmask, bw.blk, bw.nb_mask
    tbx, tby, tbz, tbv = bw.tbx, bw.tby, bw.tbz, bw.tbv
    nb_src = bw.nb_src
    W = nbcap * BLOCK
    col = jnp.arange(BLOCK, dtype=jnp.int32)

    def q(c):
        return jnp.pad(c, (0, QB * B - n), mode="edge").reshape(QB, B)

    qx, qy, qz = (q(c)[gidx] for c in pos_q.astuple())

    target = max(1, (256 << 20) // (24 * W))
    nc = 1
    if cap > target:
        nc = -(-cap // target)
        while cap % nc:
            nc += 1
    Qc = cap // nc
    h2 = jnp.float32(h) * jnp.float32(h)
    r0 = jnp.float32(rho0)

    def chunk(args):
        blk_c, mask_c, cqx, cqy, cqz = args

        def win(t):
            return t[blk_c].reshape(Qc, W)[:, None, :]

        dx = cqx[:, :, None] - win(tbx)
        dy = cqy[:, :, None] - win(tby)
        dz = cqz[:, :, None] - win(tbz)
        r2 = dx * dx + dy * dy + dz * dz
        scol = (blk_c[:, :, None] * BLOCK + col[None, None, :]
                ).reshape(Qc, 1, W)
        valid = (jnp.broadcast_to(mask_c[:, :, None],
                                  (Qc, nbcap, BLOCK)).reshape(Qc, 1, W)
                 & (scol < nb_src) & (r2 <= h2))
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        wb = jnp.where(valid, r0 * win(tbv), 0.0)
        wk = sm.cubic_w(r, h)
        gcv = sm.cubic_grad_coeff(r, h)
        wg = wb * gcv
        return ((wb * wk).sum(axis=2),
                V3((wg * dx).sum(axis=2), (wg * dy).sum(axis=2),
                   (wg * dz).sum(axis=2)),
                ((wg * r) ** 2).sum(axis=2),
                (wg * gcv * r2).sum(axis=2))

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    xs = (resh(blk), resh(nb_mask), resh(qx), resh(qy), resh(qz))
    if nc == 1:
        rho_c, s_c, q_c, g2_c = chunk(tuple(t[0] for t in xs))
    else:
        rho_c, s_c, q_c, g2_c = jax.lax.map(chunk, xs)

    def fl(a):
        return a.reshape((cap, B))

    # Scatter back at group granularity; masked rows target row QB and
    # are dropped (mode='drop'), so they can never clobber group 0.
    gsafe = jnp.where(gmask, gidx, QB)

    def scat(vals):
        out = jnp.zeros((QB + 1, B), jnp.float32)
        return out.at[gsafe].set(fl(vals), mode="drop"
                                 ).reshape(-1)[:(QB * B)][:n]

    return DenseBoundaryTerms(
        rho=scat(rho_c),
        s=V3(scat(s_c.x), scat(s_c.y), scat(s_c.z)),
        qsum=scat(q_c),
        g2=scat(g2_c),
        overflow=bw.overflow)


def predicted_rho_op(pos_s: V3, *, h: float, m: float, plan, B: int):
    """Closure factory for PCISPH's per-iteration predicted-density pass
    (reference pcisph_solver.py:135-154): pair VALIDITY is pinned to the
    step-initial positions (the reference iterates the start-of-step grid,
    ParticleSystem.py:447-469, solver_base.py:139-141) while the kernel W
    is evaluated at the PREDICTED positions of both particles. The
    start-validity mask over the block windows is computed once per step;
    each call re-gathers only the predicted-position windows (3 lanes)
    instead of the compact path's per-iteration (N, K) packed gathers.

    Returns `rho_of(pos_p) -> (N,)` — the fluid-fluid predicted density
    m * Sigma_j W(|pos_p_i - pos_p_j|) over start-valid pairs."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    nbcap = blk.shape[1]
    QB = blk.shape[0]
    W = nbcap * BLOCK

    def win(vals):
        return _window(blk, vals, n).reshape(QB, 1, W)

    def q(c):
        return jnp.pad(c, (0, QB * B - n)).reshape(QB, B, 1)

    dx0 = q(pos_s.x) - win(pos_s.x)
    dy0 = q(pos_s.y) - win(pos_s.y)
    dz0 = q(pos_s.z) - win(pos_s.z)
    r2_0 = dx0 * dx0 + dy0 * dy0 + dz0 * dz0
    scol = (blk[:, :, None] * BLOCK
            + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
            ).reshape(QB, 1, W)
    qslot = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B, 1)
    valid = (jnp.broadcast_to(nb_mask[:, :, None],
                              (QB, nbcap, BLOCK)).reshape(QB, 1, W)
             & (scol < n) & (qslot < n) & (scol != qslot)
             & (r2_0 <= jnp.float32(h) * jnp.float32(h)))

    def rho_of(pos_p: V3) -> jnp.ndarray:
        dx = q(pos_p.x) - win(pos_p.x)
        dy = q(pos_p.y) - win(pos_p.y)
        dz = q(pos_p.z) - win(pos_p.z)
        r = jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
        wk = jnp.where(valid, sm.cubic_w(r, h), 0.0)
        return jnp.float32(m) * wk.sum(axis=2).reshape(-1)[:n]

    return rho_of


def boundary_predict_op(bw: BoundaryWindows, pos_q: V3, *, h: float,
                        rho0: float, B: int):
    """Group-sparse closure for PCISPH's predicted BOUNDARY density term
    (reference pcisph_solver.py:143-147): the Akinci shell is static, so
    pair validity (distance at the step-initial fluid positions) and the
    volume weights are precomputed once per step over the wall-near query
    groups; each call re-gathers only the predicted fluid positions of
    those groups and re-evaluates W at the predicted distance.

    Returns `brho_of(pos_p) -> (N,)` — rho0 * Sigma_b V_b W(|pos_p_i - x_b|)
    over start-valid fluid-boundary pairs (zero for wall-far rows)."""
    n = pos_q.x.shape[0]
    gidx, gmask, blk, nb_mask = bw.gidx, bw.gmask, bw.blk, bw.nb_mask
    cap, nbcap = blk.shape
    W = nbcap * BLOCK
    QB = -(-n // B)
    col = jnp.arange(BLOCK, dtype=jnp.int32)

    def win(t):
        return t[blk].reshape(cap, W)[:, None, :]

    def q(c, fill):
        return jnp.pad(c, (0, QB * B - n), mode=fill).reshape(QB, B)[gidx]

    dx0 = q(pos_q.x, "edge")[:, :, None] - win(bw.tbx)
    dy0 = q(pos_q.y, "edge")[:, :, None] - win(bw.tby)
    dz0 = q(pos_q.z, "edge")[:, :, None] - win(bw.tbz)
    r2_0 = dx0 * dx0 + dy0 * dy0 + dz0 * dz0
    scol = (blk[:, :, None] * BLOCK + col[None, None, :]).reshape(cap, 1, W)
    valid = (jnp.broadcast_to(nb_mask[:, :, None],
                              (cap, nbcap, BLOCK)).reshape(cap, 1, W)
             & (scol < bw.nb_src)
             & (r2_0 <= jnp.float32(h) * jnp.float32(h)))
    wb0 = jnp.where(valid, jnp.float32(rho0) * win(bw.tbv), 0.0)
    gsafe = jnp.where(gmask, gidx, QB)

    def brho_of(pos_p: V3) -> jnp.ndarray:
        dx = q(pos_p.x, "edge")[:, :, None] - win(bw.tbx)
        dy = q(pos_p.y, "edge")[:, :, None] - win(bw.tby)
        dz = q(pos_p.z, "edge")[:, :, None] - win(bw.tbz)
        r = jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
        vals = (wb0 * sm.cubic_w(r, h)).sum(axis=2)
        # Scatter back at group granularity; masked rows target row QB and
        # are dropped (mode='drop'), so they can never clobber group 0.
        out = jnp.zeros((QB + 1, B), jnp.float32)
        return out.at[gsafe].set(vals, mode="drop"
                                 ).reshape(-1)[:(QB * B)][:n]

    return brho_of


class PbfTerms(NamedTuple):
    """One-shot PBF pair sums at the step-initial positions (reference
    pbf_solver.py:32-52,127-174 — PBF evaluates rho/lambda/delta-p pair
    geometry at the START positions; only XSPH reads updated ones)."""
    rho: jnp.ndarray     # (N,) m * Sigma_j poly6(r)
    gsum: V3             # (N,) Sigma_j spiky_c * x_ij (grad_c_i * rho0)
    around: jnp.ndarray  # (N,) Sigma_j (r * spiky_c)^2
    ssum: V3             # (N,) Sigma_j s_corr * spiky_c * x_ij


def dense_pbf_ops(pos_s: V3, *, h: float, m: float, plan, B: int,
                  w_ref: float, k_corr: float):
    """Dense-window PBF engine (fluid-fluid): the start-validity mask is
    computed once; each pass re-gathers only the window lanes it needs.

    Returns (terms: PbfTerms,
             lam_mv(lam) -> V3      Sigma_j lam_j spiky_c x_ij  (the only
                                    lambda-dependent pair sum, one window
                                    pass re-gathering lam),
             xsph(new_pos, new_vel) -> V3   Sigma_j (v_j - v_i) poly6(d)
                                    at the UPDATED positions over
                                    start-pinned pairs).

    Matches models/pbf.py's compact passes term-for-term (reference
    pbf_solver.py:32-96,144-174)."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    nbcap = blk.shape[1]
    QB = blk.shape[0]
    W = nbcap * BLOCK

    def win(vals):
        return _window(blk, vals, n).reshape(QB, 1, W)

    def q(c):
        return jnp.pad(c, (0, QB * B - n)).reshape(QB, B, 1)

    def geom(pos: V3):
        dx = q(pos.x) - win(pos.x)
        dy = q(pos.y) - win(pos.y)
        dz = q(pos.z) - win(pos.z)
        r2 = dx * dx + dy * dy + dz * dz
        return dx, dy, dz, r2

    dx0, dy0, dz0, r2_0 = geom(pos_s)
    scol = (blk[:, :, None] * BLOCK
            + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
            ).reshape(QB, 1, W)
    qslot = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B, 1)
    valid = (jnp.broadcast_to(nb_mask[:, :, None],
                              (QB, nbcap, BLOCK)).reshape(QB, 1, W)
             & (scol < n) & (qslot < n) & (scol != qslot)
             & (r2_0 <= jnp.float32(h) * jnp.float32(h)))

    def rw(t):
        return t.sum(axis=2).reshape(-1)[:n]

    r0 = jnp.sqrt(jnp.maximum(r2_0, 1e-24))
    spiky = jnp.where(valid, sm.spiky_grad_coeff(r0, h), 0.0)
    poly = jnp.where(valid, sm.poly6_w(r0, h), 0.0)
    s = poly * jnp.float32(1.0 / w_ref)
    s2 = s * s
    sc = jnp.float32(-k_corr) * s2 * s2 * spiky   # s_corr * spiky_c
    terms = PbfTerms(
        rho=jnp.float32(m) * rw(poly),
        gsum=V3(rw(spiky * dx0), rw(spiky * dy0), rw(spiky * dz0)),
        around=rw((r0 * spiky) ** 2 * valid),
        ssum=V3(rw(sc * dx0), rw(sc * dy0), rw(sc * dz0)))

    def lam_mv(lam: jnp.ndarray) -> V3:
        lw = win(lam) * spiky
        return V3(rw(lw * dx0), rw(lw * dy0), rw(lw * dz0))

    def xsph(new_pos: V3, new_vel: V3) -> V3:
        dx, dy, dz, r2 = geom(new_pos)
        wx = jnp.where(valid, sm.poly6_w(
            jnp.sqrt(jnp.maximum(r2, 1e-24)), h), 0.0)
        # Sigma (v_j - v_i) w = Sigma v_j w - v_i Sigma w
        wsum = rw(wx)
        return V3(rw(win(new_vel.x) * wx) - new_vel.x * wsum,
                  rw(win(new_vel.y) * wx) - new_vel.y * wsum,
                  rw(win(new_vel.z) * wx) - new_vel.z * wsum)

    return terms, lam_mv, xsph


def pbf_boundary_terms(bw: BoundaryWindows, pos_q: V3, *, h: float,
                       rho0: float, B: int, w_ref: float, k_corr: float):
    """Group-sparse PBF boundary sums at the step-initial positions
    (reference pbf_solver.py:106-164 boundary branches; volume enters the
    DENSITY term only — the grad_c/around terms use the bare spiky
    coefficient, reference quirk kept, cf. models/pbf.py:74-81):

      b_rho    rho0 * Sigma_b V_b poly6(r)
      b_g      V3   Sigma_b spiky_c * x_ib
      b_around Sigma_b (r * spiky_c)^2
      b_ssum   V3   Sigma_b s_corr * spiky_c * x_ib
    """
    n = pos_q.x.shape[0]
    gidx, gmask, blk, nb_mask = bw.gidx, bw.gmask, bw.blk, bw.nb_mask
    cap, nbcap = blk.shape
    W = nbcap * BLOCK
    QB = -(-n // B)
    col = jnp.arange(BLOCK, dtype=jnp.int32)

    def win(t):
        return t[blk].reshape(cap, W)[:, None, :]

    def q(c):
        return jnp.pad(c, (0, QB * B - n), mode="edge"
                       ).reshape(QB, B)[gidx][:, :, None]

    dx = q(pos_q.x) - win(bw.tbx)
    dy = q(pos_q.y) - win(bw.tby)
    dz = q(pos_q.z) - win(bw.tbz)
    r2 = dx * dx + dy * dy + dz * dz
    scol = (blk[:, :, None] * BLOCK + col[None, None, :]).reshape(cap, 1, W)
    valid = (jnp.broadcast_to(nb_mask[:, :, None],
                              (cap, nbcap, BLOCK)).reshape(cap, 1, W)
             & (scol < bw.nb_src)
             & (r2 <= jnp.float32(h) * jnp.float32(h)))
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    spiky = jnp.where(valid, sm.spiky_grad_coeff(r, h), 0.0)
    poly = jnp.where(valid, sm.poly6_w(r, h), 0.0)
    s = poly * jnp.float32(1.0 / w_ref)
    s2 = s * s
    sc = jnp.float32(-k_corr) * s2 * s2 * spiky

    gsafe = jnp.where(gmask, gidx, QB)

    def scat(vals):
        out = jnp.zeros((QB + 1, B), jnp.float32)
        return out.at[gsafe].set(vals.sum(axis=2), mode="drop"
                                 ).reshape(-1)[:(QB * B)][:n]

    b_rho = scat(jnp.float32(rho0) * win(bw.tbv) * poly)
    b_g = V3(scat(spiky * dx), scat(spiky * dy), scat(spiky * dz))
    b_around = scat((r * spiky) ** 2 * valid)
    b_ssum = V3(scat(sc * dx), scat(sc * dy), scat(sc * dz))
    return b_rho, b_g, b_around, b_ssum


def dense_wcsph_forces(pos_s: V3, vel_s: V3, rho: jnp.ndarray,
                       p_over_rho2: jnp.ndarray, *, h: float, m: float,
                       plan, B: int, c_s: float, alpha: float,
                       tension_k: float, eps: float = 0.01) -> V3:
    """Fused fluid-fluid WCSPH force pass over the CSR block plan:
    symmetric Tait pressure gradient (-m (p'_i + p'_j) gradW, reference
    wcsph_solver.py:102-116), Monaghan compression-only viscosity
    (solver_base.py:170-202), and cohesion (-k m W x_ij,
    solver_base.py:204-217) — all three per-pair coefficients combined in
    ONE dense (QB, B, W) window pass, replacing three (N, K) gather
    passes. Returns the summed acceleration V3 (N,) in sorted order.

    Chunked over query groups under lax.map: the materialized (Qc, W)
    value windows (8 per chunk) stay ~0.5 GB total regardless of N, so
    the same pass serves the 30k and the 1M scene."""
    n = pos_s.x.shape[0]
    blk, nb_mask, _ = plan
    QB, nbcap = blk.shape
    W = nbcap * BLOCK
    nblocks = -(-n // BLOCK)
    # Qc chosen so 8 (Qc, W) f32 windows stay under ~512 MB.
    target = max(1, (512 << 20) // (32 * W))
    nc = 1
    if QB > target:
        nc = -(-QB // target)
        while QB % nc:
            nc += 1
    Qc = QB // nc

    def tb(vals):
        return jnp.pad(vals, (0, nblocks * BLOCK - n)).reshape(nblocks,
                                                               BLOCK)

    tbx, tby, tbz = tb(pos_s.x), tb(pos_s.y), tb(pos_s.z)
    tvx, tvy, tvz = tb(vel_s.x), tb(vel_s.y), tb(vel_s.z)
    trho = tb(rho)
    tp = tb(p_over_rho2)

    def q(c):
        return jnp.pad(c, (0, QB * B - n)).reshape(QB, B)

    qx, qy, qz = q(pos_s.x), q(pos_s.y), q(pos_s.z)
    qvx, qvy, qvz = q(vel_s.x), q(vel_s.y), q(vel_s.z)
    qrho, qp = q(rho), q(p_over_rho2)
    qslot_a = jnp.arange(QB * B, dtype=jnp.int32).reshape(QB, B)
    col = jnp.arange(BLOCK, dtype=jnp.int32)
    h2 = jnp.float32(h) * jnp.float32(h)
    nu_num = jnp.float32(2.0 * alpha * h * c_s)
    q2e_add = jnp.float32(eps) * h2
    mf = jnp.float32(m)

    def chunk(args):
        (blk_c, mask_c, cqx, cqy, cqz, cvx, cvy, cvz, crho, cp, qslot) = args

        def win(t):
            return t[blk_c].reshape(Qc, W)[:, None, :]

        dx = cqx[:, :, None] - win(tbx)
        dy = cqy[:, :, None] - win(tby)
        dz = cqz[:, :, None] - win(tbz)
        r2 = dx * dx + dy * dy + dz * dz
        scol = (blk_c[:, :, None] * BLOCK + col[None, None, :]
                ).reshape(Qc, 1, W)
        valid = (jnp.broadcast_to(mask_c[:, :, None],
                                  (Qc, nbcap, BLOCK)).reshape(Qc, 1, W)
                 & (scol < n) & (qslot[:, :, None] < n)
                 & (scol != qslot[:, :, None]) & (r2 <= h2))
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        gc = sm.cubic_grad_coeff(r, h)
        wk = sm.cubic_w(r, h)
        # pressure: -m (p'_i + p'_j) gc
        coeff = -mf * (cp[:, :, None] + win(tp)) * gc
        # viscosity (compression-only): m * (-m pi gc)
        shear = (dx * (cvx[:, :, None] - win(tvx))
                 + dy * (cvy[:, :, None] - win(tvy))
                 + dz * (cvz[:, :, None] - win(tvz)))
        pi = -(nu_num / (crho[:, :, None] + win(trho))) * shear / (r2 + q2e_add)
        coeff = coeff + jnp.where(shear < 0.0, -mf * mf * pi * gc, 0.0)
        # cohesion: -k m W
        coeff = coeff + (-jnp.float32(tension_k) * mf) * wk
        coeff = jnp.where(valid, coeff, 0.0)
        return V3((coeff * dx).sum(axis=2), (coeff * dy).sum(axis=2),
                  (coeff * dz).sum(axis=2))

    def resh(a):
        return a.reshape((nc, Qc) + a.shape[1:])

    xs = (resh(blk), resh(nb_mask), resh(qx), resh(qy), resh(qz),
          resh(qvx), resh(qvy), resh(qvz), resh(qrho), resh(qp),
          resh(qslot_a))
    if nc == 1:
        out = chunk(tuple(t[0] for t in xs))
    else:
        out = jax.lax.map(chunk, xs)
    return V3(*(c.reshape(-1)[:n] for c in out.astuple()))


def matvec(band: BandA, vals: jnp.ndarray) -> V3:
    """(Sigma_j A_c,ij vals_j) per component c -> V3 of (N,)."""
    n = band.n
    win = _window(band.blk, vals, n).astype(band.ax.dtype)
    out = [jnp.einsum("qbw,qw->qb", a, win,
                      preferred_element_type=jnp.float32)
           .astype(jnp.float32).reshape(-1)[:n]
           for a in (band.ax, band.ay, band.az)]
    return V3(*out)


def matvec_dot(band: BandA, v: V3) -> jnp.ndarray:
    """Sigma_c Sigma_j A_c,ij v_c,j -> (N,) — the gradW-dot-velocity sum."""
    n = band.n
    acc = None
    for a, c in ((band.ax, v.x), (band.ay, v.y), (band.az, v.z)):
        win = _window(band.blk, c, n).astype(a.dtype)
        t = jnp.einsum("qbw,qw->qb", a, win,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.float32)
        acc = t if acc is None else acc + t
    return acc.reshape(-1)[:n]
