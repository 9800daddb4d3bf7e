"""Scene assembly: turn a SimConfig into static metadata + device arrays + state.

This is the counterpart of the reference's `ParticleSystem.__init__` +
`init_particles_data` (ParticleSystem.py:31-127, 225-247): fluid seeding,
boundary shell + per-particle boundary volumes, rigid mesh voxelization and
mass properties (volume, mass, centroid, inertia tensor).

The scene is split for jit-friendliness:
  * `SceneStatic`  — hashable python scalars/flags (passed as a static arg)
  * `SceneArrays`  — device arrays that are constant across steps (boundary
    particle positions/volumes + their one-time cell table, rigid per-particle
    volume/mass), passed as a regular pytree arg
  * initial dynamic state lives in each solver's State pytree
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu import geometry as geo
from cfd_taichi_tpu.config import SimConfig
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops.vec import V3

RHO_0 = 1000.0  # fluid rest density (reference solver_base.py:19)


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Hashable static scene description (safe as a jit static argument)."""
    n_fluid: int
    n_boundary: int
    n_rigid: int
    particle_radius: float
    h: float                  # support radius = 4r (ParticleSystem.py:82)
    particle_m: float         # 1000*(2r)^3 (ParticleSystem.py:83)
    gravity: float
    box_min: tuple[float, float, float]
    box_max: tuple[float, float, float]
    grid: nb.GridSpec
    akinci: bool              # boundary_handle: Akinci vs clamp (solver_base.py:31)
    fs_couple: bool           # two-way fluid-solid coupling (solver_base.py:32)
    has_rigid: bool           # a rigid body exists
    rigid_active: bool        # rigid participates in the dynamic grid
    rigid_rho: float
    dt0: float
    solver_name: str
    # Neighbor-list capacities (fixed shapes) — legacy compact-list path.
    K: int = 96               # max neighbors per fluid particle (dynamic set)
    bK: int = 64              # max boundary neighbors per fluid particle
    cell_cap: int = 32        # max particles per grid cell considered
    # Windowed pair-sweep parameters (ops/pairwise.py — the fast path).
    B: int = 128              # query block size
    Wf: int = 1024            # fluid->fluid window capacity
    Wr: int = 0               # fluid->rigid window capacity
    Wb: int = 0               # fluid->boundary window capacity
    # Chunk width (linear cells) of the chunk-padded query layout (models/base
    # build_ctx): blocks never mix occupied C-cell chunks, hard-bounding every
    # block's cell span (and hence window occupancy) regardless of how
    # particles scatter.
    chunk: int = 64
    # Fetch windows with banded DMA (requires 1024-aligned, wider windows;
    # pays off when windows are large) vs plain XLA gathers (tight windows).
    banded: bool = False
    # Static size of the chunk-padded fluid query layout (models/base
    # build_ctx): pad_to_blocks(n_fluid) + one block per possible chunk group.
    nq: int = 0

    @property
    def diameter(self) -> float:
        return 2.0 * self.particle_radius

    @property
    def n_dynamic(self) -> int:
        """Size of the unified dynamic set: fluid [0, Nf) then rigid [Nf, Nf+Nr)."""
        return self.n_fluid + (self.n_rigid if self.rigid_active else 0)


class SceneArrays(NamedTuple):
    """Step-invariant device arrays. Particle positions are component-
    separated V3s (ops/vec.py) — the TPU-native layout."""
    boundary_pos: V3               # components (Nb,)
    boundary_volume: jnp.ndarray   # (Nb,) — V_b = 1/sum_k W_bk (ParticleSystem.py:309-320)
    boundary_table: nb.CellTable   # static cell list, built once (ParticleSystem.py:237-238)
    rigid_volume: jnp.ndarray      # (Nr,) — V_i = 1/sum W (ParticleSystem.py:252-259)
    rigid_mass: jnp.ndarray        # (Nr,) — rho_rigid * V (ParticleSystem.py:262-263)
    rigid_mass_total: jnp.ndarray  # () — sum of masses (rigid_solver.py:157-161)


class RigidInit(NamedTuple):
    """Initial rigid body state pieces (go into solver State pytrees)."""
    pos: V3                    # particle positions, world frame, components (Nr,)
    vertices: V3               # mesh vertices, world frame (OBJ export)
    faces: np.ndarray          # (F, 3) host-side, for OBJ export
    centroid: jnp.ndarray      # (3,)
    inertia_inv: jnp.ndarray   # (3, 3)
    inertia: jnp.ndarray       # (3, 3)


@dataclasses.dataclass(frozen=True)
class Scene:
    static: SceneStatic
    arrays: SceneArrays
    fluid_pos0: V3
    rigid: Optional[RigidInit]


def _rotation3d_swapped(att_rad: np.ndarray) -> np.ndarray:
    """The reference builds its attitude rotation as
    `ti.math.rotation3d(att.x, att.z, att.y)` — note the swapped (x, z, y)
    argument order (ParticleSystem.py:200, rigid_solver.py:132). With
    rotation3d(a, b, c) = Rz(c) @ Ry(b) @ Rx(a), the effective matrix is
    Rz(att.y) @ Ry(att.z) @ Rx(att.x). We reproduce that behavior."""
    ax, ay, az = float(att_rad[0]), float(att_rad[2]), float(att_rad[1])
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(np.float32)


def rotation3d_swapped_jnp(att_rad: jnp.ndarray) -> jnp.ndarray:
    """jnp version of `_rotation3d_swapped` for per-step rigid rotation."""
    ax, ay, az = att_rad[0], att_rad[2], att_rad[1]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    rx = jnp.array([[one, zero, zero], [zero, cx, -sx], [zero, sx, cx]])
    ry = jnp.array([[cy, zero, sy], [zero, one, zero], [-sy, zero, cy]])
    rz = jnp.array([[cz, -sz, zero], [sz, cz, zero], [zero, zero, one]])
    return rz @ ry @ rx


def build_scene(cfg: SimConfig) -> Scene:
    sc, sv, fl, so = cfg.scene, cfg.solver, cfg.fluid, cfg.solid
    r = sc.particle_radius
    h = cfg.support_radius
    grid = nb.grid_for_box(sc.box_min, sc.box_max, h)

    # --- fluid ---------------------------------------------------------------
    fluid_pos = geo.seed_fluid_block(fl.water_size, fl.start_pos, r)
    n_fluid = fluid_pos.shape[0]

    # --- boundary shell ------------------------------------------------------
    boundary_pos = geo.seed_boundary_shell(sc.box_min, sc.box_max, r)
    n_boundary = boundary_pos.shape[0]
    bpos = V3.from_rows(boundary_pos)
    btable = nb.build_cell_table(bpos, grid)
    # V_b = 1 / sum_{k != b} W_bk (self excluded by for_all_boundary_neighbor,
    # ParticleSystem.py:309-320, 362-363).
    bvol = _inverse_kernel_sum(bpos, jnp.arange(n_boundary, dtype=jnp.int32),
                               bpos, btable, grid, h, K=96)

    # --- rigid body ----------------------------------------------------------
    rigid_init = None
    n_rigid = 0
    rigid_active = False
    rigid_rho = 0.0
    if so is not None:
        from cfd_taichi_tpu.config import resolve_mesh_path

        mesh_path = resolve_mesh_path(so.mesh, cfg.base_dir)
        verts, faces = geo.load_mesh(mesh_path, scale=so.scale)
        vox = geo.voxelize_mesh(verts, faces, pitch=2 * so.voxel_radius,
                                fill=so.fill)
        att = np.asarray(so.attitude_offset, np.float64) / 180.0 * np.pi
        rot = _rotation3d_swapped(att)
        vox = (vox @ rot.T + np.asarray(so.pos_offset, np.float32)).astype(np.float32)
        verts_w = (verts @ rot.T + np.asarray(so.pos_offset, np.float32)).astype(np.float32)
        n_rigid = vox.shape[0]
        rigid_active = bool(so.active)
        rigid_rho = float(so.rho_0)

        rpos = V3.from_rows(vox)
        rtable = nb.build_cell_table(rpos, grid)
        # V_i = 1 / sum_{j != i, solid} W_ij (ParticleSystem.py:252-259); the
        # reference warns and zeroes when the sum underflows.
        inv_w = _kernel_sum(rpos, jnp.arange(n_rigid, dtype=jnp.int32), rpos,
                            rtable, grid, h, K=96)
        rvol = jnp.where(inv_w < 1e-6, 0.0, 1.0 / jnp.maximum(inv_w, 1e-6))
        rmass = rigid_rho * rvol  # ParticleSystem.py:262-263
        msum = jnp.sum(rmass)
        centroid = jnp.asarray([
            jnp.sum(rpos.x * rmass), jnp.sum(rpos.y * rmass),
            jnp.sum(rpos.z * rmass)]) / msum
        x, y, z = rpos.x - centroid[0], rpos.y - centroid[1], rpos.z - centroid[2]
        m = rmass
        ixx = jnp.sum(m * (y * y + z * z))
        iyy = jnp.sum(m * (x * x + z * z))
        izz = jnp.sum(m * (x * x + y * y))
        ixy = -jnp.sum(m * x * y)
        ixz = -jnp.sum(m * x * z)
        iyz = -jnp.sum(m * z * y)
        inertia = jnp.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]],
                            jnp.float32)
        rigid_init = RigidInit(
            pos=rpos, vertices=V3.from_rows(verts_w), faces=faces,
            centroid=centroid, inertia_inv=jnp.linalg.inv(inertia),
            inertia=inertia,
        )
        rigid_volume, rigid_mass, rigid_mass_total = rvol, rmass, msum
    else:
        rigid_volume = jnp.zeros((0,), jnp.float32)
        rigid_mass = jnp.zeros((0,), jnp.float32)
        rigid_mass_total = jnp.zeros((), jnp.float32)

    # --- windowed pair-sweep capacities (ops/pairwise.py) --------------------
    lay = fluid_layout_params(np.asarray(fluid_pos), grid)
    B, chunk, nq, Wf, banded = (lay["B"], lay["chunk"], lay["nq"],
                                lay["Wf"], lay["banded"])
    s_major = max(grid.strides)
    span_sub = sum(grid.strides) - s_major
    from cfd_taichi_tpu.ops.banded import ALIGN

    def _wsub(raw: int) -> int:
        if banded:
            return max(_round_up(raw + ALIGN, ALIGN), ALIGN)
        return max(_round_up(raw, 128), 128)
    # Static sources measure exact band occupancy, with a wider assumed
    # block span (blocks in sparse slabs can span many more than B/2 cells).
    band_static = 2 * (span_sub + 1) + 256
    Wb = 0
    if sv.boundary_handle:
        occ_b = _band_occupancy(
            np.asarray(nb.cell_id(bpos, grid)), grid.num_cells, band_static)
        Wb = 3 * _wsub(int(min(occ_b * 1.3, n_boundary)))
    Wr = 0
    if rigid_active and n_rigid > 0:
        occ_r = _band_occupancy(
            np.asarray(nb.cell_id(rigid_init.pos, grid)), grid.num_cells,
            band_static)
        Wr = 3 * _wsub(int(min(occ_r * 1.5, n_rigid)))

    static = SceneStatic(
        n_fluid=n_fluid, n_boundary=n_boundary, n_rigid=n_rigid,
        particle_radius=r, h=h, particle_m=cfg.particle_mass,
        gravity=sc.gravity, box_min=sc.box_min, box_max=sc.box_max,
        grid=grid, akinci=sv.boundary_handle, fs_couple=sv.fs_couple,
        has_rigid=so is not None, rigid_active=rigid_active,
        rigid_rho=rigid_rho, dt0=sv.delta_time, solver_name=sv.name,
        B=B, Wf=Wf, Wr=Wr, Wb=Wb, banded=banded, nq=nq, chunk=chunk,
    )
    arrays = SceneArrays(
        boundary_pos=bpos, boundary_volume=bvol, boundary_table=btable,
        rigid_volume=rigid_volume, rigid_mass=rigid_mass,
        rigid_mass_total=rigid_mass_total,
    )
    return Scene(static=static, arrays=arrays,
                 fluid_pos0=V3.from_rows(fluid_pos), rigid=rigid_init)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fluid_layout_params(fluid_pos_rows: np.ndarray, grid: nb.GridSpec) -> dict:
    """Static parameters of the chunk-padded fluid query layout + fluid window
    (see models/base.build_ctx): block size B, chunk width C, padded layout
    size nq, fluid->fluid window capacity Wf, banded-DMA flag.

    The chunk width is chosen by minimizing the measured sweep-cost proxy
    nq(C) * Wsub(C): wider chunks mean fewer pad blocks but wider window
    bands. Window sizing = measured worst-case band occupancy of the initial
    particle set x2 compression headroom (the density solvers cap sustained
    compression — measured dam-break floor impact peaks at ~1.13x). Chunking
    hard-bounds every block's cell span to < C, so the measured band stays
    representative no matter how particles scatter. Runtime overflow is still
    counted and surfaced in telemetry (the analogue of the reference's
    512-entry cell capacity, ParticleSystem.py:103)."""
    n_fluid = fluid_pos_rows.shape[0]
    # B=128 measured best on TPU (B=64 halves pad waste but doubles
    # window-fetch rows: 2.99 s/step vs 2.35 s/step on dam30k DFSPH).
    B = 128
    s_major = max(grid.strides)
    span_sub = sum(grid.strides) - s_major
    cells_np = np.asarray(nb.cell_id(V3.from_rows(fluid_pos_rows), grid))

    def params_for(C: int):
        band = (C - 1) + 2 * (span_sub + 1)
        occ = _band_occupancy(cells_np, grid.num_cells, band)
        maxg = grid.num_cells // C + 1
        nq = _round_up(n_fluid, B) + maxg * B
        # x2 compression headroom + group-pad slack (a window can cross a few
        # group junctions, each contributing up to B-1 pad slots).
        raw = int(min(occ * 2.0 + 4 * B, nq))
        return nq, raw, occ

    best = None
    for C in (128, 192, 256, 384, 512):
        nq, raw, occ = params_for(C)
        cost = nq * raw
        if best is None or cost < best[0]:
            best = (cost, C, nq, raw)
    _, C, nq, raw = best
    # Banded DMA fetch pays off once windows are large; it needs 1024-aligned
    # (and hence wider) windows, so small scenes keep tight XLA-gather windows.
    banded = raw >= 2048
    if banded:
        from cfd_taichi_tpu.ops.banded import ALIGN

        wsub = max(_round_up(raw + ALIGN, ALIGN), ALIGN)
    else:
        wsub = max(_round_up(raw, 128), 128)
    return {"B": B, "chunk": C, "nq": nq, "Wf": 3 * wsub, "banded": banded}


def _band_occupancy(cells: np.ndarray, num_cells: int, band: int) -> int:
    """Max number of particles inside any contiguous linear-cell-id band —
    the exact worst-case window occupancy for a static particle set."""
    counts = np.bincount(cells, minlength=num_cells + 1)
    csum = np.concatenate([[0], np.cumsum(counts)])
    if csum.shape[0] <= band:
        return int(csum[-1])
    return int((csum[band:] - csum[:-band]).max())


def _kernel_sum(pos_q: V3, qid, pos_src: V3, table, grid, h, K):
    """sum_{j != i} W(|x_i - x_j|, h) over the cell list."""
    from cfd_taichi_tpu.ops import smoothing

    nlist = nb.find_neighbors(pos_q, qid, pos_src, table, grid, K=K,
                              cell_cap=64, exclude_self=True)
    d = pos_q.expand(1) - pos_src.take(nlist.idx)
    w = smoothing.cubic_w(d.norm(), h)
    return jnp.sum(jnp.where(nlist.mask, w, 0.0), axis=1)


def _inverse_kernel_sum(pos_q, qid, pos_src, table, grid, h, K):
    s = _kernel_sum(pos_q, qid, pos_src, table, grid, h, K)
    return 1.0 / s  # reference divides unguarded (ParticleSystem.py:314)
