"""Band-matrix (block-sparse MXU SpMV) equivalence vs the compact-list
gather ops: the solver-loop operators must be the SAME linear map."""

import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu.ops import bandmat, neighbors as nb
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3


def _sorted_cloud(n, box, h, seed=0):
    rng = np.random.default_rng(seed)
    raw = (rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
           * np.asarray(box, np.float32))
    pos = V3.from_rows(raw)
    grid = nb.grid_for_box((0, 0, 0), box, h)
    order = np.asarray(jnp.argsort(nb.cell_id(pos, grid), stable=True))
    pos_s = V3.from_rows(raw[order])
    table = nb.build_cell_table(pos_s, grid)
    qid = jnp.arange(n, dtype=jnp.int32)
    nl = nb.find_neighbors(pos_s, qid, pos_s, table, grid, K=64,
                           cell_cap=64, exclude_self=True)
    assert int(np.asarray(nl.count).max()) <= 64
    return pos_s, nl


def _reference_ops(pos_s, nl, h, m, k, v):
    """(N, K) gather forms of the two loop operators."""
    x = pos_s.expand(1) - nl.spos
    r = x.norm()
    gc = sm.cubic_grad_coeff(r, h)
    wf = jnp.where(nl.mask, jnp.float32(m) * gc, 0.0)
    kj = k[nl.idx]
    delta = V3((wf * (k[:, None] + kj) * x.x).sum(axis=1),
               (wf * (k[:, None] + kj) * x.y).sum(axis=1),
               (wf * (k[:, None] + kj) * x.z).sum(axis=1))
    vj = V3(v.x[nl.idx], v.y[nl.idx], v.z[nl.idx])
    vij = v.expand(1) - vj
    dot = (wf * (vij.x * x.x + vij.y * x.y + vij.z * x.z)).sum(axis=1)
    return delta, dot


def test_band_matvec_matches_gather_ops():
    h, m, n = 0.1, 1.3e-4, 800
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=3)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=16)
    assert int(np.asarray(band.overflow)) == 0

    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    v = V3(*(jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(3)))

    ref_delta, ref_dot = _reference_ops(pos_s, nl, h, m, k, v)

    got_delta = band.s * k + bandmat.matvec(band, k)
    got_dot = (v.x * band.s.x + v.y * band.s.y + v.z * band.s.z
               - bandmat.matvec_dot(band, v))

    np.testing.assert_allclose(np.asarray(got_delta.x),
                               np.asarray(ref_delta.x), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_delta.y),
                               np.asarray(ref_delta.y), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_delta.z),
                               np.asarray(ref_delta.z), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dot), np.asarray(ref_dot),
                               rtol=2e-4, atol=1e-6)


def test_band_row_sums_match_list_sums():
    h, m, n = 0.1, 1.0, 500
    pos_s, nl = _sorted_cloud(n, (0.4, 0.4, 0.4), h, seed=5)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=16)
    x = pos_s.expand(1) - nl.spos
    gc = sm.cubic_grad_coeff(x.norm(), h)
    wf = jnp.where(nl.mask, jnp.float32(m) * gc, 0.0)
    np.testing.assert_allclose(np.asarray(band.s.x),
                               np.asarray((wf * x.x).sum(axis=1)),
                               rtol=2e-4, atol=1e-6)


def test_band_overflow_counted():
    h, m, n = 0.1, 1.0, 800
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=3)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=2)
    assert int(np.asarray(band.overflow)) > 0


def test_band_handles_nonmultiple_sizes():
    # n not a multiple of B or BLOCK: padding rows/cols must not alias.
    h, m, n = 0.12, 0.7, 333
    pos_s, nl = _sorted_cloud(n, (0.4, 0.3, 0.5), h, seed=9)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=12,
                              B=8)
    k = jnp.ones((n,), jnp.float32)
    ref_delta, _ = _reference_ops(pos_s, nl, h, m, k,
                                  V3.zeros((n,)))
    got = band.s * k + bandmat.matvec(band, k)
    # Different accumulation order than the (N, K) masked sum: compare with
    # an absolute tolerance scaled to the sum's term magnitude (components
    # cancel, so pure rtol is ill-posed on near-zero results).
    scale = float(np.abs(np.asarray(ref_delta.x)).max())
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref_delta.x),
                               rtol=1e-3, atol=2e-5 * scale)
