"""Windowed pair-sweep engine tests: sweeps must reproduce brute-force pair
sums exactly (same pair sets — no dropped and no double-counted pairs, incl.
the disjoint-sub-window edge cases on small grids)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops import pairwise as pw
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3

H = 0.1


def _cloud(n, box, seed=0):
    rng = np.random.default_rng(seed)
    return V3.from_rows(
        (rng.uniform(0, 1, (n, 3)) * np.asarray(box)).astype(np.float32))


def _engine_for(pos, box, B=64, W=None, n_src=None, src=None):
    grid = nb.grid_for_box((0, 0, 0), box, H)
    src = pos if src is None else src
    sset = pw.sort_set(src, grid)
    n = pos.x.shape[0]
    qset = pw.sort_set(pos, grid)
    nq = pw.pad_to_blocks(n, B)
    pad = nq - n
    q_cells = jnp.concatenate(
        [qset.cells, jnp.full((pad,), 1, jnp.int32) * qset.cells[-1]])
    if W is None:
        W = 3 * (-(-(src.x.shape[0]) // 128) * 128)  # generous
    eng = pw.build_engine(q_cells, sset.starts, src.x.shape[0], grid, B, W)
    return grid, qset, sset, eng, W


def _sweep_density(grid, qset, sset, eng, W, B, exclude_self):
    n = qset.pos.x.shape[0]
    nblk = eng.nblk
    q_pos = pw.blockify_v3(qset.pos, nblk, B)
    q_valid = pw.blockify(jnp.ones((n,), bool), nblk, B, fill=False)
    pos_w = pw.window_v3(eng, sset.pos, W)
    x_ij = q_pos.expand(2) - pos_w.expand(1)
    r2 = x_ij.norm2()
    valid_w = pw.win_valid(eng, W)
    mask = valid_w[:, None, :] & q_valid[:, :, None] & (r2 <= H * H)
    if exclude_self:
        gid_w = pw.win_gid(eng, W)
        q_gid = pw.blockify(jnp.arange(n, dtype=jnp.int32), nblk, B, fill=-1)
        mask &= gid_w[:, None, :] != q_gid[:, :, None]
    w = sm.cubic_w(jnp.sqrt(r2), H)
    rho_sorted = pw.unblock(jnp.sum(jnp.where(mask, w, 0.0), axis=2), n)
    # un-sort to original order for comparison
    out = np.zeros(n, np.float32)
    out[np.asarray(qset.perm)] = np.asarray(rho_sorted)
    return out


def _brute_density(pos_q, pos_s, exclude_self):
    q = pos_q.to_numpy()
    s = pos_s.to_numpy()
    d = np.linalg.norm(q[:, None, :] - s[None, :, :], axis=-1)
    w = np.asarray(sm.cubic_w(jnp.asarray(d), H))
    m = d <= H
    if exclude_self:
        np.fill_diagonal(m, False)
    return (w * m).sum(axis=1)


@pytest.mark.parametrize("box", [(1.0, 1.0, 1.0), (2.0, 0.4, 0.4),
                                 (0.35, 0.35, 0.35)])
def test_sweep_matches_brute_force_self(box):
    """Including tiny grids where the 3 sub-windows would overlap without the
    disjointness clamp (double-counting regression test)."""
    pos = _cloud(400, box, seed=1)
    grid, qset, sset, eng, W = _engine_for(pos, box)
    assert int(eng.overflow) == 0
    got = _sweep_density(grid, qset, sset, eng, W, 64, exclude_self=True)
    want = _brute_density(pos, pos, exclude_self=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_sweep_matches_brute_force_cross():
    box = (1.0, 0.6, 0.8)
    q = _cloud(300, box, seed=2)
    s = _cloud(500, box, seed=3)
    grid, qset, sset, eng, W = _engine_for(q, box, src=s)
    got = _sweep_density(grid, qset, sset, eng, W, 64, exclude_self=False)
    want = _brute_density(q, s, exclude_self=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_overflow_reported_when_window_too_small():
    box = (0.5, 0.5, 0.5)
    pos = _cloud(600, box, seed=4)
    grid, qset, sset, eng, W = _engine_for(pos, box, W=3 * 128)
    # 600 particles in a tiny box: 128-wide sub-windows must overflow.
    assert int(eng.overflow) > 0


def test_scatter_window_sum_matches_direct():
    box = (1.0, 1.0, 1.0)
    q = _cloud(200, box, seed=5)
    s = _cloud(100, box, seed=6)
    grid, qset, sset, eng, W = _engine_for(q, box, src=s)
    n_src = 100
    nblk, B = eng.nblk, 64
    q_pos = pw.blockify_v3(qset.pos, nblk, B)
    pos_w = pw.window_v3(eng, sset.pos, W)
    x_ij = q_pos.expand(2) - pos_w.expand(1)
    mask = pw.win_valid(eng, W)[:, None, :] & (x_ij.norm2() <= H * H)
    mask &= pw.blockify(jnp.ones((200,), bool), nblk, B, fill=False)[:, :, None]
    w = sm.cubic_w(x_ij.norm(), H)
    got_sorted = pw.scatter_window_sum(eng, w, w, w, mask, n_src, W)
    got = np.zeros(n_src, np.float32)
    got[np.asarray(sset.perm)] = np.asarray(got_sorted.x)
    # Direct: for each source j, sum of W over query neighbors.
    want = _brute_density(s, q, exclude_self=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_straggler_blocks_no_overflow_and_exact_density():
    """Regression: a handful of particles scattered across a sparse slab
    adjacent to a dense wall must not form a query block spanning the whole
    slab (whose windows would have to cover the dense wall and overflow).
    Chunk breaks (models/base.build_ctx) + measured window sizing
    (scene.fluid_layout_params) must give zero overflow and exact density."""
    import dataclasses

    import jax.numpy as jnp_

    from cfd_taichi_tpu.models import base as mbase
    from cfd_taichi_tpu.scene import SceneStatic, SceneArrays, fluid_layout_params

    rng = np.random.default_rng(7)
    r = 0.025
    # Dense wall filling slab x in [0.1, 0.2) of a 5 x 3 x 1.5 box.
    xs = np.arange(0.1 + r, 0.2, 2 * r)
    ys = np.arange(0.1, 2.8, 2 * r)
    zs = np.arange(0.1, 1.3, 2 * r)
    wall = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
    # Stragglers scattered over the sparse slab x in [0, 0.1).
    strag = np.stack([rng.uniform(0.0, 0.09, 24),
                      rng.uniform(0.0, 2.9, 24),
                      rng.uniform(0.0, 1.4, 24)], 1)
    pos_rows = np.concatenate([wall, strag]).astype(np.float32)
    n = pos_rows.shape[0]
    grid = nb.grid_for_box((0, 0, 0), (5.0, 3.0, 1.5), H)
    lay = fluid_layout_params(pos_rows, grid)

    st = SceneStatic(
        n_fluid=n, n_boundary=0, n_rigid=0, particle_radius=r, h=H,
        particle_m=1000 * (2 * r) ** 3, gravity=9.8,
        box_min=(0, 0, 0), box_max=(5.0, 3.0, 1.5), grid=grid,
        akinci=False, fs_couple=False, has_rigid=False, rigid_active=False,
        rigid_rho=0.0, dt0=1e-3, solver_name="wcsph",
        B=lay["B"], Wf=lay["Wf"], banded=lay["banded"], nq=lay["nq"],
        chunk=lay["chunk"])
    arrays = SceneArrays(
        boundary_pos=V3.zeros((0,)), boundary_volume=jnp_.zeros((0,)),
        boundary_table=nb.build_cell_table(V3.zeros((0,)), grid),
        rigid_volume=jnp_.zeros((0,)), rigid_mass=jnp_.zeros((0,)),
        rigid_mass_total=jnp_.zeros(()))

    pos = V3.from_rows(pos_rows)
    ctx = mbase.build_ctx(st, arrays, pos, None)
    assert int(np.asarray(ctx.overflow)) == 0

    rho_sorted = np.asarray(mbase.compact(ctx, mbase.ctx_rho(st, ctx)))
    rho = np.zeros(n, np.float32)
    rho[np.asarray(ctx.perm)] = rho_sorted

    d = pos_rows[:, None, :] - pos_rows[None, :, :]
    rr = np.linalg.norm(d, axis=2)
    mask = (rr <= H) & ~np.eye(n, dtype=bool)
    k = 8.0 / (np.pi * H**3)
    q = rr / H
    w = np.where(q <= 0.5, k * (6 * (q**3 - q**2) + 1), 2 * k * (1 - q) ** 3)
    w = np.where(q <= 1.0, w, 0.0)
    rho_ref = 0.001 + st.particle_m * (w * mask).sum(1)
    np.testing.assert_allclose(rho, rho_ref, rtol=2e-4, atol=2e-3)
