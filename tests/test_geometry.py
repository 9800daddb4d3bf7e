"""Geometry tests: seeding counts/layout, boundary shell structure, mesh
loading and voxelization (replacing trimesh, reference ParticleSystem.py:42-59)."""

import numpy as np
import pytest

from cfd_taichi_tpu import geometry as geo

R = 0.025
D = 2 * R


def test_fluid_count_formulas():
    # breaking_dam_30k: water 1.0 x 2.8 x 1.3 at r=0.025 -> 20*56*26 = 29120
    assert geo.fluid_particle_count((1.0, 2.8, 1.3), R) == 29120
    # wcsph backup: 0.7 x 1.5 x 0.7 -> 14*30*14 = 5880
    assert geo.fluid_particle_count((0.7, 1.5, 0.7), R) == 5880


def test_fluid_lattice_layout():
    pos = geo.seed_fluid_block((0.2, 0.3, 0.2), (1.0, 2.0, 3.0), R)
    assert pos.shape == (4 * 6 * 4, 3)
    # All points inside the block bounds.
    assert np.all(pos >= np.array([1.0, 2.0, 3.0]) - 1e-5)
    assert np.all(pos <= np.array([1.0 + 0.2, 2.0 + 0.3, 3.0 + 0.2]) + 1e-5)
    # Diameter spacing along x for the first row.
    np.testing.assert_allclose(np.diff(pos[:4, 0]), D, atol=1e-5)
    # No duplicate positions.
    assert len(np.unique(np.round(pos / R).astype(int), axis=0)) == pos.shape[0]


def test_boundary_shell_counts_and_structure():
    box_min, box_max = (0.0, 0.0, 0.0), (1.5, 3.0, 1.5)
    n = geo.boundary_particle_count(box_min, box_max, R)
    pos = geo.seed_boundary_shell(box_min, box_max, R)
    assert pos.shape == (n, 3)
    x_cnt = int(1.5 / D + 1)
    z_cnt = int(1.5 / D + 1)
    bottom = x_cnt * z_cnt
    # Bottom plate at y=0, top plate at y=box_max.y.
    assert np.all(pos[:bottom, 1] == 0.0)
    assert np.all(pos[-bottom:, 1] == np.float32(3.0))
    # Rings: every ring particle lies on the box perimeter in xz.
    ring = pos[bottom:-bottom]
    on_edge = (
        np.isclose(ring[:, 0], 0.0) | np.isclose(ring[:, 0], (x_cnt - 1) * D)
        | np.isclose(ring[:, 2], 0.0) | np.isclose(ring[:, 2], (z_cnt - 1) * D)
    )
    assert on_edge.all()
    # No duplicated boundary particles.
    key = np.round(pos / R).astype(np.int64)
    assert len(np.unique(key, axis=0)) == pos.shape[0]


def test_builtin_meshes():
    for name, ext_expect in [("builtin:cube", (1, 1, 1)),
                             ("builtin:cube1", (0.8, 0.5, 1.0)),
                             ("builtin:box:2x0.5x1", (2.0, 0.5, 1.0))]:
        verts, faces = geo.load_mesh(name)
        assert faces.shape[0] == 12 and verts.shape[0] == 8
        np.testing.assert_allclose(verts.max(0) - verts.min(0), ext_expect,
                                   atol=1e-6)
    verts, faces = geo.load_mesh("builtin:ball")
    ext = verts.max(0) - verts.min(0)
    np.testing.assert_allclose(ext, 0.5, atol=1e-3)
    r = np.linalg.norm(verts - 0.25, axis=1)
    np.testing.assert_allclose(r, 0.25, atol=1e-6)  # all on the sphere
    # Scale applies to builtin meshes (trimesh.apply_scale parity).
    v2, _ = geo.load_mesh("builtin:cube", scale=0.18)
    np.testing.assert_allclose(v2.max(0), 0.18, atol=1e-6)


def test_load_stl_roundtrip(tmp_path):
    from cfd_taichi_tpu.utils import io as io_utils

    verts0, faces0 = geo.builtin_mesh("cube1")
    path = str(tmp_path / "cube.stl")
    io_utils.write_stl_binary(path, verts0, faces0)
    verts, faces = geo.load_mesh(path)
    assert faces.shape[0] == 12  # cube = 12 triangles
    assert verts.shape[0] == 8
    np.testing.assert_allclose(np.sort(verts.ravel()), np.sort(verts0.ravel()),
                               atol=1e-6)


def test_load_obj_roundtrip(tmp_path):
    from cfd_taichi_tpu.utils import io as io_utils

    verts0, faces0 = geo.builtin_mesh("ball")
    path = str(tmp_path / "ball.obj")
    io_utils.write_obj(path, verts0, faces0)
    verts, faces = geo.load_mesh(path)
    assert verts.shape[0] == verts0.shape[0]
    assert faces.shape[0] == faces0.shape[0]
    assert faces.max() < verts.shape[0]


@pytest.mark.skipif(not __import__("os").path.exists("/root/reference/obj"),
                    reason="reference assets not mounted")
def test_reference_asset_parity():
    """builtin:cube1 / builtin:ball reproduce the reference assets' extents
    (obj/cube1.STL, obj/ball.STL) so repointed configs voxelize identically."""
    rv, _ = geo.load_mesh("/root/reference/obj/cube1.STL")
    bv, _ = geo.load_mesh("builtin:cube1")
    np.testing.assert_allclose(rv.max(0) - rv.min(0), bv.max(0) - bv.min(0),
                               atol=1e-6)
    rv, _ = geo.load_mesh("/root/reference/obj/ball.STL")
    bv, _ = geo.load_mesh("builtin:ball")
    np.testing.assert_allclose(rv.max(0) - rv.min(0), bv.max(0) - bv.min(0),
                               atol=2e-3)


def test_voxelize_cube_fill():
    verts, faces = geo.load_mesh("builtin:cube1")
    ext = verts.max(0) - verts.min(0)
    pitch = float(ext.min()) / 8.0
    pts_fill = geo.voxelize_mesh(verts, faces, pitch, fill=True)
    pts_shell = geo.voxelize_mesh(verts, faces, pitch, fill=False)
    # Roughly the full 8x8x8 block of voxels when filled; shell is smaller.
    expected = np.prod(np.maximum(np.ceil(ext / pitch), 1))
    assert pts_fill.shape[0] == pytest.approx(expected, rel=0.35)
    assert 0 < pts_shell.shape[0] < pts_fill.shape[0]
    # All voxel centers inside the (slightly padded) AABB.
    assert np.all(pts_fill >= verts.min(0) - pitch)
    assert np.all(pts_fill <= verts.max(0) + pitch)


def test_voxelize_ball_volume():
    verts, faces = geo.load_mesh("builtin:ball")
    ext = verts.max(0) - verts.min(0)
    radius = float(ext[0]) / 2
    pitch = radius / 6
    pts = geo.voxelize_mesh(verts, faces, pitch, fill=True)
    vol = pts.shape[0] * pitch**3
    sphere_vol = 4 / 3 * np.pi * radius**3
    # Voxelization includes the surface shell, so the volume lands between the
    # exact sphere and a sphere dilated by one pitch.
    dilated_vol = 4 / 3 * np.pi * (radius + pitch) ** 3
    assert 0.9 * sphere_vol < vol < 1.1 * dilated_vol


def test_voxelize_torus_nonconvex():
    """The parity fill on a genuinely NON-convex body (the builtin torus —
    the repo's analogue of the reference's spot.obj/stanford-bunny.obj,
    reference ParticleSystem.py:42-50): the hole must stay empty even
    though it is inside the convex hull, and the filled volume must match
    the analytic torus volume 2 pi^2 R r^2."""
    R, r = 0.15, 0.06
    verts, faces = geo.load_mesh("builtin:torus")
    ext = verts.max(0) - verts.min(0)
    np.testing.assert_allclose(ext, [2 * (R + r), 2 * r, 2 * (R + r)],
                               atol=2e-3)
    pitch = r / 4.0
    pts = geo.voxelize_mesh(verts, faces, pitch, fill=True)
    vol = pts.shape[0] * pitch**3
    torus_vol = 2 * np.pi**2 * R * r**2
    dilated_vol = 2 * np.pi**2 * (R) * (r + pitch) ** 2
    assert 0.9 * torus_vol < vol < 1.1 * dilated_vol
    # Non-convexity: no voxel near the hole axis (center of the bbox),
    # although that point is deep inside the convex hull.
    center = (verts.min(0) + verts.max(0)) / 2.0
    d_axis = np.linalg.norm(pts[:, [0, 2]] - center[None, [0, 2]], axis=1)
    near_axis = d_axis < (R - r) * 0.5
    assert not near_axis.any()
    # And the fill is not just a shell: strictly more voxels than unfilled.
    shell = geo.voxelize_mesh(verts, faces, pitch, fill=False)
    assert pts.shape[0] > shell.shape[0] * 1.3


def test_kernel_sum_np_matches_brute_force():
    """Host-numpy kernel sums (scene-build boundary/rigid volumes) vs O(N^2),
    on a lattice-aligned set — pins the f32-vs-f64 floor regression where
    cell coords re-derived from positions shifted the 27-stencil (0.7f*10
    floors to 7 in f32, 6 in f64)."""
    import numpy as np

    from cfd_taichi_tpu.ops import neighbors as nb
    from cfd_taichi_tpu.scene import _kernel_sum_np

    h = 0.1
    xs, ys = np.meshgrid(np.arange(14) * 0.05, np.arange(14) * 0.05)
    plate = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)],
                     axis=1).astype(np.float32)
    pts = np.concatenate([plate,
                          plate + np.array([0.012, 0.007, 0.05], np.float32)])
    grid = nb.grid_for_box([0, 0, 0], [0.8, 0.8, 0.4], h)
    got = _kernel_sum_np(pts, grid, h)

    d2 = ((pts[:, None, :].astype(np.float64) - pts[None, :, :]) ** 2).sum(2)
    q = np.sqrt(d2) / h
    k8 = 8.0 / (np.pi * h ** 3)
    w = np.where(q <= 0.5, k8 * (6 * (q ** 3 - q ** 2) + 1),
                 2 * k8 * (1 - q) ** 3)
    w = np.where((d2 <= h * h) & (d2 > 0), w, 0.0)
    np.testing.assert_allclose(got, w.sum(1), rtol=1e-4)
