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
    with the most cells gets the largest stride (slowest axis), which
    minimizes the worst-case particle count inside one stencil-deep band of
    consecutive cell ids — the quantity that sizes the windowed pair-sweep
    (ops/pairwise.py). The reference's fixed y-major layout
    (ParticleSystem.py:102) is an internal detail with no observable effect.
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
    starts = jnp.searchsorted(
        sorted_cid, jnp.arange(grid.num_cells + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return CellTable(order=order, starts=starts)


_STENCIL = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _query_block(pos_q: V3, qid, pos_src: V3, table: CellTable, grid: GridSpec,
                 K: int, cell_cap: int, exclude_self: bool):
    """Neighbor query for one block of query particles.

    pos_q: V3 of (B,); qid: (B,) global query ids in the source index space
    (or -1 when the query set is disjoint from the source set).
    """
    Ns = table.order.shape[0]
    gx, gy, gz = grid.dims
    sx, sy, sz = grid.strides
    inv = 1.0 / grid.cell

    ccx = jnp.floor(pos_q.x * inv).astype(jnp.int32)
    ccy = jnp.floor(pos_q.y * inv).astype(jnp.int32)
    ccz = jnp.floor(pos_q.z * inv).astype(jnp.int32)

    cand_parts = []
    valid_parts = []
    slot = jnp.arange(cell_cap, dtype=jnp.int32)  # (cap,)
    for off in _STENCIL:
        cx, cy, cz = ccx + off[0], ccy + off[1], ccz + off[2]
        in_bounds = ((cx >= 0) & (cx < gx) & (cy >= 0) & (cy < gy)
                     & (cz >= 0) & (cz < gz))
        cid = cx * sx + cy * sy + cz * sz
        cid = jnp.clip(cid, 0, grid.num_cells - 1)
        start = table.starts[cid]                        # (B,)
        length = table.starts[cid + 1] - start           # (B,)
        spos = start[:, None] + slot[None, :]            # (B, cap)
        v = (slot[None, :] < length[:, None]) & in_bounds[:, None]
        cand = table.order[jnp.clip(spos, 0, Ns - 1)]    # (B, cap)
        cand_parts.append(cand)
        valid_parts.append(v)

    cand = jnp.concatenate(cand_parts, axis=1)    # (B, 27*cap)
    valid = jnp.concatenate(valid_parts, axis=1)  # (B, 27*cap)

    # Distance cutoff: keep dist <= h (reference skips dist > support_radius,
    # ParticleSystem.py:466). Component-wise: all 2-D (B, C) buffers.
    dx = pos_q.x[:, None] - pos_src.x[cand]
    dy = pos_q.y[:, None] - pos_src.y[cand]
    dz = pos_q.z[:, None] - pos_src.z[cand]
    dist2 = dx * dx + dy * dy + dz * dz
    valid &= dist2 <= jnp.float32(grid.cell) ** 2

    if exclude_self:
        valid &= cand != qid[:, None]             # ParticleSystem.py:461

    count = valid.sum(axis=1).astype(jnp.int32)

    # Stable compaction: first K valid candidates in stencil order.
    key = valid.astype(jnp.int32)
    topv, topi = jax.lax.top_k(key, K)            # stable: ties keep low index
    idx = jnp.take_along_axis(cand, topi, axis=1)
    mask = topv == 1
    idx = jnp.where(mask, idx, 0)                 # clipped safe index
    return idx.astype(jnp.int32), mask, count


def find_neighbors(pos_q: V3, qid, pos_src: V3, table: CellTable,
                   grid: GridSpec, K: int, cell_cap: int = 24,
                   exclude_self: bool = False, block: int = 65536) -> NeighborList:
    """Build a compact (Nq, K) neighbor list of `pos_q` against `pos_src`.

    qid: global ids of the queries in the source index space (for
    self-exclusion) or None when query/source sets are disjoint.
    Runs blockwise under `lax.map` to bound transient candidate memory.
    """
    Nq = pos_q.x.shape[0]
    if qid is None:
        qid = jnp.full((Nq,), -1, jnp.int32)
    qid = qid.astype(jnp.int32)

    fn = functools.partial(_query_block, pos_src=pos_src, table=table,
                           grid=grid, K=K, cell_cap=cell_cap,
                           exclude_self=exclude_self)

    if Nq <= block:
        idx, mask, count = fn(pos_q, qid)
        return NeighborList(idx=idx, mask=mask, count=count)

    nblk = -(-Nq // block)
    pad = nblk * block - Nq
    pos_b = V3(*(jnp.pad(c, (0, pad)).reshape(nblk, block)
                 for c in pos_q.astuple()))
    qid_b = jnp.pad(qid, (0, pad), constant_values=-2).reshape(nblk, block)
    idx, mask, count = jax.lax.map(
        lambda t: fn(V3(t[0], t[1], t[2]), t[3]),
        (pos_b.x, pos_b.y, pos_b.z, qid_b))
    return NeighborList(
        idx=idx.reshape(nblk * block, K)[:Nq],
        mask=mask.reshape(nblk * block, K)[:Nq],
        count=count.reshape(nblk * block)[:Nq],
    )


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
