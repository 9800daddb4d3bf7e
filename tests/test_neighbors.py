"""Neighbor-engine tests: cell-list vs O(N^2) brute force equivalence
(SURVEY.md §4 prescription; the reference's own fallback idea was the
O(N^2) gradient at wcsph_solver.py:131-144)."""

import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu.ops.vec import V3

from cfd_taichi_tpu.ops import neighbors as nb


def _random_cloud(n, box, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32) * np.asarray(box, np.float32)


def _sets(nlist):
    idx = np.asarray(nlist.idx)
    mask = np.asarray(nlist.mask)
    return [set(idx[i][mask[i]].tolist()) for i in range(idx.shape[0])]


def test_grid_for_box_matches_reference_formula():
    g = nb.grid_for_box((0, 0, 0), (1.5, 3.0, 1.5), 0.1)
    assert g.dims == (16, 31, 16)  # ceil(ext/h)+1 per axis (ParticleSystem.py:100-101)


def test_self_query_matches_brute_force():
    h = 0.1
    box = (1.0, 1.0, 1.0)
    pos = V3.from_rows(_random_cloud(500, box))
    grid = nb.grid_for_box((0, 0, 0), box, h)
    table = nb.build_cell_table(pos, grid)
    qid = jnp.arange(pos.x.shape[0], dtype=jnp.int32)
    fast = nb.find_neighbors(pos, qid, pos, table, grid, K=64, cell_cap=32,
                             exclude_self=True)
    slow = nb.brute_force_neighbors(pos, qid, pos, h, K=64, exclude_self=True)
    np.testing.assert_array_equal(np.asarray(fast.count), np.asarray(slow.count))
    assert _sets(fast) == _sets(slow)


def test_cross_query_matches_brute_force():
    h = 0.1
    box = (1.0, 0.5, 1.0)
    src = V3.from_rows(_random_cloud(400, box, seed=1))
    q = V3.from_rows(_random_cloud(120, box, seed=2))
    grid = nb.grid_for_box((0, 0, 0), box, h)
    table = nb.build_cell_table(src, grid)
    fast = nb.find_neighbors(q, None, src, table, grid, K=64, cell_cap=32)
    slow = nb.brute_force_neighbors(q, None, src, h, K=64)
    np.testing.assert_array_equal(np.asarray(fast.count), np.asarray(slow.count))
    assert _sets(fast) == _sets(slow)


def test_blockwise_query_equals_single_shot():
    h = 0.1
    box = (1.0, 1.0, 1.0)
    pos = V3.from_rows(_random_cloud(700, box, seed=3))
    grid = nb.grid_for_box((0, 0, 0), box, h)
    table = nb.build_cell_table(pos, grid)
    qid = jnp.arange(pos.x.shape[0], dtype=jnp.int32)
    one = nb.find_neighbors(pos, qid, pos, table, grid, K=48, cell_cap=32,
                            exclude_self=True, block=10**9)
    blk = nb.find_neighbors(pos, qid, pos, table, grid, K=48, cell_cap=32,
                            exclude_self=True, block=128)
    np.testing.assert_array_equal(np.asarray(one.count), np.asarray(blk.count))
    np.testing.assert_array_equal(np.asarray(one.mask), np.asarray(blk.mask))
    assert _sets(one) == _sets(blk)


def test_lattice_neighbor_count():
    # Rest lattice at diameter spacing: interior particle has the 32 lattice
    # points within 2 spacings (radius h = 4r), excluding itself.
    r = 0.025
    h = 4 * r
    d = 2 * r
    n = 9
    ax = np.arange(n) * d + 3 * d
    pos = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1).reshape(-1, 3)
    pos = V3.from_rows(pos.astype(np.float32))
    box = (float(pos.x.max() + 3 * d),) * 3
    grid = nb.grid_for_box((0, 0, 0), box, h)
    table = nb.build_cell_table(pos, grid)
    qid = jnp.arange(pos.x.shape[0], dtype=jnp.int32)
    res = nb.find_neighbors(pos, qid, pos, table, grid, K=64, cell_cap=32,
                            exclude_self=True)
    counts = np.asarray(res.count).reshape(n, n, n)
    assert counts[4, 4, 4] == 32  # |v| <= 2 lattice ball minus self
    assert counts[0, 0, 0] < 32   # corner has fewer


def test_k2_must_exceed_K():
    # 0 < k2 <= K would crash the final top_k at trace time with an opaque
    # XLA error; find_neighbors validates it for direct API callers.
    import pytest

    pos = V3.from_rows(_random_cloud(50, (1, 1, 1), seed=7))
    grid = nb.grid_for_box((0, 0, 0), (1, 1, 1), 0.1)
    table = nb.build_cell_table(pos, grid)
    with pytest.raises(ValueError, match="k2"):
        nb.find_neighbors(pos, None, pos, table, grid, K=48, cell_cap=32,
                          k2=32)


def test_block_pad_rows_cannot_inflate_dropped():
    # Blockwise queries pad the tail block with the LAST query (edge mode).
    # Cluster the sources in one dense corner cell and place the queries far
    # away: a zero-pad would query the dense (0,0,0) corner and report
    # phantom stencil-prune drops for a k2 sized to the real queries.
    h = 0.1
    rng = np.random.default_rng(11)
    dense = rng.uniform(0.0, h, size=(120, 3)).astype(np.float32)
    src = V3.from_rows(dense)
    q = V3.from_rows(
        rng.uniform(0.8, 0.9, size=(37, 3)).astype(np.float32))  # 37 % 16 != 0
    grid = nb.grid_for_box((0, 0, 0), (1, 1, 1), h)
    table = nb.build_cell_table(src, grid)
    res = nb.find_neighbors(q, None, src, table, grid, K=16, cell_cap=128,
                            k2=32, block=16)
    assert int(np.asarray(res.dropped)) == 0
    assert int(np.asarray(res.count).max()) == 0  # queries are empty space


def test_cell_table_is_permutation():
    h = 0.1
    pos = V3.from_rows(_random_cloud(300, (1, 1, 1), seed=4))
    grid = nb.grid_for_box((0, 0, 0), (1, 1, 1), h)
    table = nb.build_cell_table(pos, grid)
    # Grid sanity: sorted order is a permutation of all particles and the CSR
    # cell sizes sum to N (reference check_all_grid, ParticleSystem.py:471-484).
    assert sorted(np.asarray(table.order).tolist()) == list(range(300))
    sizes = np.diff(np.asarray(table.starts))
    assert sizes.sum() == 300


def _cell_sorted(pos_rows, grid):
    pos = V3.from_rows(pos_rows)
    order = np.asarray(jnp.argsort(nb.cell_id(pos, grid), stable=True))
    return V3.from_rows(pos_rows[order])


def test_grouped_self_query_matches_brute_force():
    h = 0.1
    box = (1.0, 1.0, 1.0)
    grid = nb.grid_for_box((0, 0, 0), box, h)
    pos = _cell_sorted(_random_cloud(700, box, seed=21), grid)
    table = nb.build_cell_table(pos, grid)
    qid = jnp.arange(700, dtype=jnp.int32)
    got, plan = nb.find_neighbors_grouped(pos, qid, pos, table, grid,
                                          K=64, nbcap=12, exclude_self=True)
    assert int(np.asarray(got.dropped)) == 0
    slow = nb.brute_force_neighbors(pos, qid, pos, h, K=64,
                                    exclude_self=True)
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(slow.count))
    assert _sets(got) == _sets(slow)


def test_grouped_cross_query_matches_brute_force():
    h = 0.1
    box = (1.0, 0.5, 1.0)
    grid = nb.grid_for_box((0, 0, 0), box, h)
    src = V3.from_rows(_random_cloud(400, box, seed=22))
    q = _cell_sorted(_random_cloud(130, box, seed=23), grid)
    table = nb.build_cell_table(src, grid)
    got, _ = nb.find_neighbors_grouped(q, None, src, table, grid,
                                       K=64, nbcap=12)
    slow = nb.brute_force_neighbors(q, None, src, h, K=64)
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(slow.count))
    assert _sets(got) == _sets(slow)


def test_grouped_chunked_equals_single_shot():
    h = 0.1
    box = (1.0, 1.0, 1.0)
    grid = nb.grid_for_box((0, 0, 0), box, h)
    pos = _cell_sorted(_random_cloud(900, box, seed=24), grid)
    table = nb.build_cell_table(pos, grid)
    qid = jnp.arange(900, dtype=jnp.int32)
    one, _ = nb.find_neighbors_grouped(pos, qid, pos, table, grid, K=48,
                                       nbcap=12, exclude_self=True,
                                       group_chunk=10**6)
    blk, _ = nb.find_neighbors_grouped(pos, qid, pos, table, grid, K=48,
                                       nbcap=12, exclude_self=True,
                                       group_chunk=7)
    np.testing.assert_array_equal(np.asarray(one.count),
                                  np.asarray(blk.count))
    assert _sets(one) == _sets(blk)


def test_grouped_plan_overflow_counted():
    h = 0.1
    box = (1.0, 1.0, 1.0)
    grid = nb.grid_for_box((0, 0, 0), box, h)
    pos = _cell_sorted(_random_cloud(800, box, seed=25), grid)
    table = nb.build_cell_table(pos, grid)
    got, _ = nb.find_neighbors_grouped(pos, None, pos, table, grid,
                                       K=16, nbcap=2)
    assert int(np.asarray(got.dropped)) > 0
