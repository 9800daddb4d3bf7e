"""Counting-sort cell-list neighbor search with fixed-K compact neighbor lists.

TPU-native replacement for the reference's Taichi dynamic-SNode uniform grid
(`ti.root.dense(i, ncells).dynamic(j, 512)`, reference ParticleSystem.py:99-110)
and its 27-cell higher-order neighbor iterators `for_all_neighbor` /
`for_all_boundary_neighbor` (reference ParticleSystem.py:447-469, 337-366).

Design (fixed shapes, no atomics, XLA-friendly):
  1. cell id per particle = linearized floor(pos / h)   (ParticleSystem.py:486-494)
  2. counting sort: stable argsort by cell id -> `order`
  3. CSR cell offsets via searchsorted -> `starts`
  4. query: for each particle, 27 static cell offsets x `cell_cap` slots of
     candidates; validity = slot-in-cell & cell-in-bounds & dist <= h &
     not-self; compact the ragged candidates to a fixed (N, K) list with a
     stable top_k over the validity mask.

Positions are component-separated `V3`s (see ops/vec.py): every intermediate
here is a 2-D (N, C) buffer that tiles cleanly on TPU — no trailing-3
tensors, which would be lane-padded 3 -> 128 when materialized.

The compact (N, K) list is built once per step and reused by every pairwise
pass of the solvers (the reference instead re-walks the grid in every pass).
Queries run in blocks via `lax.map` so the transient (block, 27*cell_cap)
candidate tensors stay small regardless of particle count.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu.ops.vec import V3


class GridSpec(NamedTuple):
    """Static uniform-grid metadata (hashable; safe to close over in jit).

    `strides` define the linearization id = cx*sx + cy*sy + cz*sz. The axis
    with the most cells gets the largest stride (slowest axis), which keeps
    cell-sorted particle order maximally local for the gather-based pair
    passes. The reference's fixed y-major layout (ParticleSystem.py:102) is
    an internal detail with no observable effect.
    """
    dims: tuple[int, int, int]      # cells per axis (reference grid_num)
    cell: float                     # cell edge = support radius h
    strides: tuple[int, int, int]   # linearization strides per axis

    @property
    def num_cells(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]

    @property
    def major_axis(self) -> int:
        return int(np.argmax(self.strides))


def grid_for_box(box_min, box_max, support_radius: float) -> GridSpec:
    """Grid dims = ceil(extent / h) + 1 per axis (reference ParticleSystem.py:100-101)."""
    ext = np.asarray(box_max, np.float64) - np.asarray(box_min, np.float64)
    dims = tuple(int(d) + 1 for d in np.ceil(ext / support_radius).astype(np.int64))
    # Slowest axis = most cells; fastest = fewest.
    order = list(np.argsort(dims))  # ascending cell count
    strides = [0, 0, 0]
    s = 1
    for ax in order:
        strides[ax] = s
        s *= dims[ax]
    return GridSpec(dims=dims, cell=float(support_radius),
                    strides=tuple(strides))


class CellTable(NamedTuple):
    """Counting-sorted cell list over one set of source particles."""
    order: jnp.ndarray   # (Ns,) int32 — source indices sorted by cell id
    starts: jnp.ndarray  # (num_cells + 1,) int32 — CSR offsets into `order`


class NeighborList(NamedTuple):
    idx: jnp.ndarray     # (Nq, K) int32 — indices into the source set (clipped)
    mask: jnp.ndarray    # (Nq, K) bool — slot validity
    count: jnp.ndarray   # (Nq,) int32 — true neighbor count (may exceed K => overflow)
    # Source positions at the compacted slots (valid where mask), provided so
    # callers need no further per-element gathers: Optional V3 of (Nq, K).
    spos: Optional[V3] = None
    # Max candidates dropped by the stencil-prune phase (k2 cap) across all
    # queries: () int32 (None when no prune ran, e.g. brute force). Nonzero
    # means `count` undercounts and pairs were lost — surfaced through the
    # same overflow telemetry as K/cell caps. Default is None (not a device
    # array): a device-array class default would materialize at import time
    # and force backend init for host-only work.
    dropped: Optional[jnp.ndarray] = None


def cell_id(pos: V3, grid: GridSpec) -> jnp.ndarray:
    """Linearized cell id = floor(pos/h) dotted with the grid strides
    (cf. reference ParticleSystem.py:102,487-488 — same mapping, adaptive
    axis order). Out-of-domain positions clamp into edge cells."""
    gx, gy, gz = grid.dims
    sx, sy, sz = grid.strides
    inv = 1.0 / grid.cell
    cx = jnp.clip(jnp.floor(pos.x * inv).astype(jnp.int32), 0, gx - 1)
    cy = jnp.clip(jnp.floor(pos.y * inv).astype(jnp.int32), 0, gy - 1)
    cz = jnp.clip(jnp.floor(pos.z * inv).astype(jnp.int32), 0, gz - 1)
    return cx * sx + cy * sy + cz * sz


def cell_id_np(pos_rows: np.ndarray, grid: GridSpec) -> np.ndarray:
    """Host-numpy `cell_id` for scene-build-time helpers: identical
    arithmetic in f32 (floor/clip) without touching the device backend —
    a jnp call here would round-trip every 1M-row array through the
    tunneled TPU client."""
    gx, gy, gz = grid.dims
    sx, sy, sz = grid.strides
    p = np.asarray(pos_rows, np.float32)
    inv = np.float32(1.0 / grid.cell)
    cx = np.clip(np.floor(p[:, 0] * inv).astype(np.int64), 0, gx - 1)
    cy = np.clip(np.floor(p[:, 1] * inv).astype(np.int64), 0, gy - 1)
    cz = np.clip(np.floor(p[:, 2] * inv).astype(np.int64), 0, gz - 1)
    return cx * sx + cy * sy + cz * sz


def build_cell_table(pos: V3, grid: GridSpec,
                     valid: Optional[jnp.ndarray] = None) -> CellTable:
    """Counting sort of source particles by cell id; rebuilt every step like
    the reference's reset_grid/update_grid (ParticleSystem.py:369-407).

    Rows where `valid` is False are assigned a virtual cell one past the last
    real cell, so they sort to the tail of `order` and are never visited by
    any stencil query (used for capacity-padded sharded states)."""
    cid = cell_id(pos, grid)
    if valid is not None:
        cid = jnp.where(valid, cid, grid.num_cells)
    order = jnp.argsort(cid, stable=True).astype(jnp.int32)
    sorted_cid = cid[order]
    # method="sort": sorted queries (arange) -> one concat-sort instead
    # of per-query binary-search gathers (see base.build_dense_prep).
    starts = jnp.searchsorted(
        sorted_cid, jnp.arange(grid.num_cells + 1, dtype=jnp.int32),
        side="left", method="sort").astype(jnp.int32)
    return CellTable(order=order, starts=starts)


# Per-axis stencil offsets of the 27-cell neighborhood, as (27,) host arrays.
_STENCIL = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
_OFF = np.array(_STENCIL, np.int32)  # (27, 3)


def _query_block(pos_q: V3, qid, packed, sepairs, grid: GridSpec,
                 K: int, cell_cap: int, exclude_self: bool,
                 k2: int = 0):
    """Neighbor query for one block of query particles.

    TPU gather economics (measured honestly on-chip with per-call scalar
    syncs): single-element XLA gathers run ~190M indices/s, but gathers of
    short CONTIGUOUS ROWS run ~5x faster per index (~1G indices/s for
    4-float rows). So every per-candidate fetch here is a row gather from
    pre-packed tables:
      * `packed` (Ns, 4): [x, y, z, bitcast(source id)] in cell-sorted order
      * `sepairs` (num_cells, 2): [start, end) CSR offsets as rows
    One sepairs row gather (B, 27, 2), one packed row gather (B, 27*cap, 4),
    one top_k over a combined validity+position key, one small re-gather of
    packed rows at the K winners. No (B, W)-sized single-element gathers.

    pos_q: V3 of (B,); qid: (B,) global query ids in the source index space
    (or -1 when the query set is disjoint from the source set).
    """
    Ns = packed.shape[1]
    gx, gy, gz = grid.dims
    sx, sy, sz = grid.strides
    inv = 1.0 / grid.cell
    W = 27 * cell_cap
    B = pos_q.x.shape[0]

    ccx = jnp.floor(pos_q.x * inv).astype(jnp.int32)   # (B,)
    ccy = jnp.floor(pos_q.y * inv).astype(jnp.int32)
    ccz = jnp.floor(pos_q.z * inv).astype(jnp.int32)

    offx = jnp.asarray(_OFF[:, 0])[None, :]            # (1, 27)
    offy = jnp.asarray(_OFF[:, 1])[None, :]
    offz = jnp.asarray(_OFF[:, 2])[None, :]
    cx = ccx[:, None] + offx                           # (B, 27)
    cy = ccy[:, None] + offy
    cz = ccz[:, None] + offz
    in_bounds = ((cx >= 0) & (cx < gx) & (cy >= 0) & (cy < gy)
                 & (cz >= 0) & (cz < gz))
    cid = jnp.clip(cx * sx + cy * sy + cz * sz, 0, grid.num_cells - 1)

    se = sepairs[cid]                                  # (B, 27, 2) row gather
    start = se[:, :, 0]
    length = jnp.where(in_bounds, se[:, :, 1] - start, 0)

    slot = jnp.arange(cell_cap, dtype=jnp.int32)       # (cap,)
    spos = (start[:, :, None] + slot[None, None, :]).reshape(B, W)
    valid = (slot[None, None, :] < length[:, :, None]).reshape(B, W)
    spos_c = jnp.clip(spos, 0, Ns - 1)

    dropped = jnp.zeros((), jnp.int32)
    if 0 < k2 < W:
        # Stencil-prune phase: compact the ~mostly-empty (B, 27*cap) slot
        # grid to the k2 slots that actually hold candidates BEFORE paying
        # the packed position fetch (the fetch is the dominant build cost —
        # per-index gather economics, see module notes). k2 is sized from
        # the scene's max stencil population; drops are counted.
        col0 = jnp.arange(W, dtype=jnp.int32)[None, :]
        key1 = jnp.where(valid, 2 * Ns - spos_c, -col0)
        topkey1, _ = jax.lax.top_k(key1, k2)
        valid = topkey1 > 0
        spos_c = jnp.where(valid, 2 * Ns - topkey1, Ns - 1)
        dropped = jnp.maximum(
            jnp.max(jnp.sum(key1 > 0, axis=1) - k2), 0).astype(jnp.int32)
        W = k2

    rows = packed[:, spos_c]                           # (4, B, W) packed gather
    # Distance cutoff: keep dist <= h (reference skips dist > support_radius,
    # ParticleSystem.py:466).
    dx = pos_q.x[:, None] - rows[0]
    dy = pos_q.y[:, None] - rows[1]
    dz = pos_q.z[:, None] - rows[2]
    dist2 = dx * dx + dy * dy + dz * dz
    valid &= dist2 <= jnp.float32(grid.cell) ** 2

    if exclude_self:
        origid = _f32_to_id(rows[3])
        valid &= origid != qid[:, None]           # ParticleSystem.py:461

    count = valid.sum(axis=1).astype(jnp.int32)

    # Stable compaction without take_along_axis: the top_k key carries the
    # candidate's sorted-source slot. key = valid ? 2*Ns - spos : -col, so
    # valid slots win, ties keep ascending spos (stencil cells are visited in
    # ascending-id order within each cell, and cross-cell order is
    # irrelevant to every consumer — all reductions are order-independent).
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    key = jnp.where(valid, 2 * Ns - spos_c, -col)
    topkey, _ = jax.lax.top_k(key, K)
    mask = topkey > 0
    spos_top = jnp.where(mask, 2 * Ns - topkey, 0)     # (B, K) sorted slots

    krows = packed[:, spos_top]                        # (4, B, K) packed gather
    idx = jnp.where(mask, _f32_to_id(krows[3]), 0)
    spos_v = V3(krows[0], krows[1], krows[2])
    return idx, mask, count, spos_v, dropped


# Bias added to integer ids before bitcasting them into the f32 lane of the
# packed table: raw small ints bitcast to f32 are denormals, which TPU/CPU
# backends flush to zero in copies. 0x3F800000 (the bits of 1.0f) keeps any
# id < 2^23 in the normal range [1.0, 2.0), bit-exact through every copy.
_ID_BIAS = 0x3F800000


def _id_to_f32(ids: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(ids + jnp.int32(_ID_BIAS),
                                        jnp.float32)


def _f32_to_id(f: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(f, jnp.int32) - jnp.int32(_ID_BIAS)


def pack_table(pos_src: V3, table: CellTable):
    """Pre-pack the sorted source table for packed-gather queries:
    packed (4, Ns) = [x; y; z; f32-encoded orig id], sepairs (num_cells, 2).

    The (4, Ns) TRANSPOSED layout matters: gathering (Ns, 4) rows
    materializes a (M, 4) result whose minormost dim is lane-padded 4 -> 128
    (32x memory — a 600 MB logical candidate fetch OOM'd as a 19 GB padded
    buffer); gathering columns of (4, Ns) yields (4, M) with only the 4 -> 8
    sublane pad. Measured identical gather speed.

    Source sets larger than 2^23 per shard would overflow the id encoding
    (see _ID_BIAS) — far above any single-chip particle budget here."""
    srt = pos_src.take(table.order)
    packed = jnp.stack(
        [srt.x, srt.y, srt.z, _id_to_f32(table.order)], axis=0)
    sepairs = jnp.stack([table.starts[:-1], table.starts[1:]], axis=1)
    return packed, sepairs


def find_neighbors(pos_q: V3, qid, pos_src: V3, table: CellTable,
                   grid: GridSpec, K: int, cell_cap: int = 24,
                   exclude_self: bool = False,
                   block: int | None = None, k2: int = 0) -> NeighborList:
    """Build a compact (Nq, K) neighbor list of `pos_q` against `pos_src`.

    qid: global ids of the queries in the source index space (for
    self-exclusion) or None when query/source sets are disjoint.
    k2 > 0 enables the stencil-prune phase: candidate slots are compacted
    to k2 by cell membership before the position fetch (drops counted in
    `.dropped`).
    Runs blockwise under `lax.map` to bound transient candidate memory:
    XLA materializes the packed candidate gather as a (block*W, 4) buffer
    whose minor dim is lane-padded 4 -> 128 (32x), so the block size is
    chosen to keep that padded temp around ~1 GB regardless of particle
    count or candidate width.
    """
    Nq = pos_q.x.shape[0]
    if 0 < k2 <= K:
        # The final top_k compacts the k2-wide pruned candidates to K slots;
        # k2 <= K would make top_k's k exceed its axis size and crash at
        # trace time with an opaque XLA error. (scene.neighbor_capacities
        # already guards this for its own outputs; validate for direct
        # callers of the public API too.)
        raise ValueError(f"k2 ({k2}) must exceed K ({K}) when the "
                         f"stencil-prune phase is enabled, or be 0")
    width = k2 if 0 < k2 < 27 * cell_cap else 27 * cell_cap
    if block is None:
        block = max(1024, (1 << 21) // width)
    if qid is None:
        qid = jnp.full((Nq,), -1, jnp.int32)
    qid = qid.astype(jnp.int32)
    packed, sepairs = pack_table(pos_src, table)

    fn = functools.partial(_query_block, packed=packed, sepairs=sepairs,
                           grid=grid, K=K, cell_cap=cell_cap,
                           exclude_self=exclude_self, k2=k2)

    if Nq <= block:
        idx, mask, count, spos_v, dropped = fn(pos_q, qid)
        return NeighborList(idx=idx, mask=mask, count=count, spos=spos_v,
                            dropped=dropped)

    nblk = -(-Nq // block)
    pad = nblk * block - Nq
    # Pad queries with the LAST real query (edge mode), not zeros: a
    # zero-padded row queries the (0,0,0) corner — where the boundary shell
    # is densest — and the `dropped` reduction is a max over all rows
    # including pads, so zero pads could report phantom stencil-prune drops
    # for a k2 sized to the real queries. An edge pad duplicates a real row
    # and cannot exceed its drop count. (count/mask/idx are sliced to [:Nq]
    # either way; only the telemetry scalar was exposed.)
    pos_b = V3(*(jnp.pad(c, (0, pad), mode="edge").reshape(nblk, block)
                 for c in pos_q.astuple()))
    qid_b = jnp.pad(qid, (0, pad), constant_values=-2).reshape(nblk, block)
    idx, mask, count, spos_v, dropped = jax.lax.map(
        lambda t: fn(V3(t[0], t[1], t[2]), t[3]),
        (pos_b.x, pos_b.y, pos_b.z, qid_b))
    return NeighborList(
        idx=idx.reshape(nblk * block, K)[:Nq],
        mask=mask.reshape(nblk * block, K)[:Nq],
        count=count.reshape(nblk * block)[:Nq],
        spos=V3(*(c.reshape(nblk * block, K)[:Nq]
                  for c in spos_v.astuple())),
        dropped=jnp.max(dropped),
    )


def find_neighbors_grouped(pos_q: V3, qid, pos_src: V3, table: CellTable,
                           grid: GridSpec, K: int, nbcap: int, B: int = 8,
                           exclude_self: bool = False,
                           src_valid: Optional[jnp.ndarray] = None,
                           group_chunk: int | None = None):
    """Compact (Nq, K) neighbor list via GROUPED block windows: B
    consecutive CELL-SORTED queries share one CSR-derived candidate
    window of `nbcap` 128-slot source blocks (ops/bandmat.plan_from_csr).

    Measured rationale (on-chip, 2026-08-17): the per-query candidate
    fetch of `find_neighbors` pays ~6 ns per gathered index (N x k2 =
    14M indices at 29k particles); the grouped form fetches QB x nbcap
    row indices (~44k) plus a dense (QB, B, W) distance pass at dense-VPU
    rates — the candidate-fetch cost collapses.

    REQUIRES `pos_q` in cell-sorted order (it is, everywhere this is
    used: queries are the cell-sorted fluid). Correctness does not depend
    on plan tightness — the 9 CSR runs cover every in-bounds stencil
    cell, clipped cells only add distance-masked candidates.

    Returns (NeighborList, plan) — the plan (blk, nb_mask, overflow) can
    be fed to bandmat.build_band when the source set is the query set
    (fluid-only) so the window fetches CSE.

    `.dropped` carries the plan-capacity overflow: union blocks beyond
    nbcap mean real candidates were cut (same telemetry contract as the
    stencil-prune k2)."""
    from cfd_taichi_tpu.ops import bandmat

    Nq = pos_q.x.shape[0]
    Ns = pos_src.x.shape[0]
    BLOCK = bandmat.BLOCK
    nblocks = -(-Ns // BLOCK)
    nbcap = min(nbcap, nblocks)
    W = nbcap * BLOCK
    QB = -(-Nq // B)
    padq = QB * B - Nq

    # Sorted-source component tables, padded to whole blocks with +inf so
    # padding slots always fail the distance cutoff (no slot-validity
    # arithmetic needed: every window slot is a real particle or +inf).
    srt = pos_src.take(table.order)
    padn = nblocks * BLOCK - Ns
    BIG = jnp.float32(3e38)
    sx = jnp.pad(srt.x, (0, padn), constant_values=BIG).reshape(nblocks,
                                                                BLOCK)
    sy = jnp.pad(srt.y, (0, padn), constant_values=BIG).reshape(nblocks,
                                                                BLOCK)
    sz = jnp.pad(srt.z, (0, padn), constant_values=BIG).reshape(nblocks,
                                                                BLOCK)
    sidb = jnp.pad(table.order, (0, padn),
                   constant_values=-1).reshape(nblocks, BLOCK)
    svalid = None
    if src_valid is not None:
        svalid = jnp.pad(src_valid[table.order], (0, padn)
                         ).reshape(nblocks, BLOCK)
    packed, _ = pack_table(pos_src, table)

    qx = jnp.pad(pos_q.x, (0, padq), mode="edge")
    qy = jnp.pad(pos_q.y, (0, padq), mode="edge")
    qz = jnp.pad(pos_q.z, (0, padq), mode="edge")
    if qid is None:
        qid_p = jnp.full((QB * B,), -1, jnp.int32)
    else:
        qid_p = jnp.pad(qid.astype(jnp.int32), (0, padq),
                        constant_values=-2)
    qcid = cell_id(V3(qx, qy, qz), grid)
    plan = bandmat.plan_from_csr(qcid.reshape(QB, B), table.starts, grid,
                                 nbcap)
    blk, nb_mask, plan_overflow = plan

    h2 = jnp.float32(grid.cell) ** 2
    col_iota = jnp.arange(W, dtype=jnp.int32)[None, None, :]

    def chunk_fn(args):
        cblk, cmask, cqx, cqy, cqz, cqid = args
        G = cblk.shape[0]
        wx = sx[cblk].reshape(G, 1, W)
        wy = sy[cblk].reshape(G, 1, W)
        wz = sz[cblk].reshape(G, 1, W)
        dx = cqx.reshape(G, B, 1) - wx
        dy = cqy.reshape(G, B, 1) - wy
        dz = cqz.reshape(G, B, 1) - wz
        r2 = dx * dx + dy * dy + dz * dz
        valid = (r2 <= h2) & jnp.broadcast_to(
            cmask[:, :, None], (G, nbcap, BLOCK)).reshape(G, 1, W)
        if exclude_self:
            wid = sidb[cblk].reshape(G, 1, W)
            valid &= wid != cqid.reshape(G, B, 1)
        if svalid is not None:
            valid &= svalid[cblk].reshape(G, 1, W)
        count = valid.sum(axis=2).astype(jnp.int32)          # (G, B)
        key = jnp.where(valid, W - col_iota, -1)
        topkey, _ = jax.lax.top_k(key.reshape(G * B, W), K)
        mask = topkey > 0
        col = jnp.where(mask, W - topkey, 0)                 # (G*B, K)
        # winner column -> sorted-source slot
        blk_q = jnp.repeat(cblk, B, axis=0)                  # (G*B, nbcap)
        slot = (jnp.take_along_axis(blk_q, col >> bandmat.BLOCK_SHIFT,
                                    axis=1) * BLOCK
                + (col & (BLOCK - 1)))
        rows = packed[:, slot]                               # (4, G*B, K)
        idx = jnp.where(mask, _f32_to_id(rows[3]), 0)
        return (idx, mask, count.reshape(G * B),
                rows[0], rows[1], rows[2])

    if group_chunk is None:
        group_chunk = max(32, (1 << 21) // (B * W))
    if QB <= group_chunk:
        idx, mask, count, px, py, pz = chunk_fn(
            (blk, nb_mask, qx.reshape(QB, B), qy.reshape(QB, B),
             qz.reshape(QB, B), qid_p.reshape(QB, B)))
    else:
        nck = -(-QB // group_chunk)
        padg = nck * group_chunk - QB

        def cpad(a, fill=0):
            widths = [(0, padg)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=fill).reshape(
                (nck, group_chunk) + a.shape[1:])

        outs = jax.lax.map(chunk_fn, (
            cpad(blk), cpad(nb_mask), cpad(qx.reshape(QB, B)),
            cpad(qy.reshape(QB, B)), cpad(qz.reshape(QB, B)),
            cpad(qid_p.reshape(QB, B), fill=-2)))
        idx, mask, count, px, py, pz = (
            o.reshape((nck * group_chunk * B,) + o.shape[2:])
            if o.ndim > 2 else o.reshape(nck * group_chunk * B)
            for o in outs)
        idx = idx[:QB * B]
        mask = mask[:QB * B]
        count = count[:QB * B]
        px, py, pz = px[:QB * B], py[:QB * B], pz[:QB * B]

    nl = NeighborList(
        idx=idx[:Nq].astype(jnp.int32), mask=mask[:Nq], count=count[:Nq],
        spos=V3(px[:Nq], py[:Nq], pz[:Nq]),
        dropped=plan_overflow)
    return nl, plan


def brute_force_neighbors(pos_q: V3, qid, pos_src: V3, h: float, K: int,
                          exclude_self: bool = False) -> NeighborList:
    """O(Nq*Ns) reference implementation for tests (cf. the reference's own
    dead-code brute-force fallback, wcsph_solver.py:131-144)."""
    dx = pos_q.x[:, None] - pos_src.x[None, :]
    dy = pos_q.y[:, None] - pos_src.y[None, :]
    dz = pos_q.z[:, None] - pos_src.z[None, :]
    dist2 = dx * dx + dy * dy + dz * dz
    valid = dist2 <= h * h
    if exclude_self and qid is not None:
        valid &= jnp.arange(pos_src.x.shape[0])[None, :] != jnp.asarray(qid)[:, None]
    count = valid.sum(axis=1).astype(jnp.int32)
    topv, topi = jax.lax.top_k(valid.astype(jnp.int32), K)
    mask = topv == 1
    idx = jnp.where(mask, topi, 0)
    return NeighborList(idx=idx.astype(jnp.int32), mask=mask, count=count)
