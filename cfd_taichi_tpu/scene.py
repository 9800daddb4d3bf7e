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

# Dynamic-set size at which the grouped-window list build (and the B=8
# block-plan regime) takes over from the per-query prune engine — shared
# with models.base.build_nbh so the scene's band_B always matches the
# engine that will consume it.
GROUPED_BUILD_MIN_N = 150_000
# Query-group width for the large-N (grouped/coef) regime; build_scene
# keys the rest of the capacity ladder on `large`, not on this value,
# so perf probes can vary the width alone. Measured on the impact-hot
# 1M dam (r4): every windowed pass scales with QB x plan-width slots,
# and the per-member plan width grows far slower than 1/QB falls —
# B=8: 1602 ms/step, B=16: 1475, B=32: 1307 (pair_nb 22/23/26, zero
# overflow, identical iteration counts); B=64 overflows its pair plan
# (capacity formula would need 36+ and still dropped pairs) and loses.
BAND_B_LARGE = 32
# Split-width loop engine group width (0 = off; see the loop_B note in
# build_scene for the measured negative result that keeps it off).
LOOP_B_LARGE = 0


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
    # Compact neighbor-list capacities (fixed shapes; auto-sized at scene
    # build from the initial distribution with compression headroom —
    # overflow beyond them is counted and surfaced in telemetry, the
    # analogue of the reference's 512-entry cell capacity,
    # ParticleSystem.py:103).
    K: int = 96               # max neighbors per fluid particle (dynamic set)
    bK: int = 64              # max boundary neighbors per fluid particle
    cell_cap: int = 32        # max particles per grid cell considered
    bcell_cap: int = 16       # boundary cells: exact static occupancy bound
    # Stencil-prune capacities (ops/neighbors find_neighbors k2): candidate
    # slots compacted by cell membership before the position fetch. 0 = off.
    k2: int = 0               # fluid/dynamic stencil population cap
    bk2: int = 0              # boundary stencil population cap (exact)
    # Block-plan capacities for the grouped-window neighbor engine and the
    # solver-loop band matrices (ops/bandmat, ops/neighbors
    # find_neighbors_grouped): max 128-slot source blocks covering the
    # stencil of band_B consecutive cell-sorted queries. band_nb is sized
    # from the seed with mixing headroom (overflow counted on-device);
    # bband_nb is an EXACT static bound (the boundary shell never moves).
    band_nb: int = 12
    # Query-group width for block plans. Size-dependent (build_scene):
    # 16 below GROUPED_BUILD_MIN_N (measured 30k hot phase: 129 ms/step
    # vs 190 at B=8 — the pair-plan band engine pays per-group build
    # overhead), 8 at/above it (halves the dense window so the coef
    # engine's bf16 w fits the 16 GB chip at 1M).
    band_B: int = 16
    bband_nb: int = 12
    # Tighter capacity for PAIR-derived plans (bandmat.plan_blocks /
    # compact_plan: blocks that contain actual neighbors, a subset of the
    # CSR stencil cover) — sizes the solver-loop A matrices, whose HBM
    # reads scale with it. Pair content is physics-bounded; the CSR cover
    # is NOT (block fragmentation grows with flow mixing — measured 2.1x
    # the seed need on the evolved 30k dam at B=16), hence the separate
    # generous band_nb_wide for the dense-mode one-shot term passes.
    pair_nb: int = 12
    band_nb_wide: int = 36
    # Group-sparse boundary pass capacity (bandmat.dense_boundary_terms):
    # max wall-near query groups. Seed-measured with slack for the growing
    # wetted surface; overflow counted on-device.
    bq_cap: int = 0
    # Split-bucket coef engine (bandmat.build_split_coef_engine): every
    # group's first coef_nbA pair blocks ride the dense A-engine; up to
    # coef_capB groups carry remainder blocks. 0 = split disabled (the
    # plain single-width engine).
    coef_nbA: int = 0
    coef_capB: int = 0
    # Rigid-near query-group capacity for the dense-mode coupling pass
    # (ops/rigid_dense): bounds the fluid that can sit within h of the
    # body by the body's padded-AABB volume (rotation-inflated), with
    # overflow counted on-device. 0 = no rigid / coupling off.
    rq_cap: int = 0
    # SPLIT-WIDTH dense mode (large-N only): the one-shot window passes
    # run at band_B (wide groups amortize the plan + window overhead)
    # while the per-ITERATION loop engine runs at the narrower loop_B —
    # its w bytes scale with N x plan-width, and the width a B=8 group
    # needs is ~40% less than a B=32 group's (measured 1M: 22 vs 26).
    # loop_B = 0 disables the split (loop engine at band_B; small-N
    # scenes). pair_nb then sizes the LOOP plan (at loop_B); pair_nb_q
    # sizes the band_B-width tight plan the one-shot passes (viscosity,
    # WCSPH forces, PCISPH predicted rho) run on.
    loop_B: int = 0
    pair_nb_q: int = 0

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
    # Uniform initial fluid velocity (config fluid.initial_velocity; the
    # reference always seeds at rest — benchmark impact scenes use this).
    fluid_vel0: tuple = (0.0, 0.0, 0.0)


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


def build_scene(cfg: SimConfig, plan_pos: Optional[np.ndarray] = None) -> Scene:
    """`plan_pos` (N, 3 rows, N = the config's fluid count): size every
    runtime capacity (neighbor lists, block plans, wall-near groups) from
    THIS particle distribution instead of the freshly seeded lattice.
    Checkpoint-resume re-planning: the seed lattice's CSR block cover is
    heavily fragmented (measured 1M dam: seed needs 33 blocks/group where
    the impact-hot flow needs 20, so seed-sized plans make every window
    pass and loop matvec pay ~1.6x capacity for nothing). A run resumed
    from a checkpoint re-plans against the state it will actually
    simulate; overflow counters still guard drift beyond the margins.
    Physics is UNCHANGED — capacities only bound static shapes."""
    sc, sv, fl, so = cfg.scene, cfg.solver, cfg.fluid, cfg.solid
    r = sc.particle_radius
    h = cfg.support_radius
    grid = nb.grid_for_box(sc.box_min, sc.box_max, h)

    # The water block must fit the box: particles seeded outside get
    # cell-clamped into edge cells, which silently collapses thousands of
    # particles into single cells and destroys the pressure solve (found
    # the hard way: a bundled config whose box was one water-height too
    # short ran "stably" at dt_min with a railed density loop).
    for ax in range(3):
        if (fl.start_pos[ax] < sc.box_min[ax] - 1e-6
                or fl.start_pos[ax] + fl.water_size[ax]
                > sc.box_max[ax] + 1e-6):
            raise ValueError(
                f"fluid block [{fl.start_pos[ax]:.3f}, "
                f"{fl.start_pos[ax] + fl.water_size[ax]:.3f}] exceeds the "
                f"box [{sc.box_min[ax]:.3f}, {sc.box_max[ax]:.3f}] on axis "
                f"{ax}")

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
    bvol = jnp.asarray(_inverse_kernel_sum_np(boundary_pos, grid, h))

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
        # V_i = 1 / sum_{j != i, solid} W_ij (ParticleSystem.py:252-259); the
        # reference warns and zeroes when the sum underflows.
        inv_w = jnp.asarray(_kernel_sum_np(vox, grid, h))
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

    # --- compact neighbor-list capacities (models/base.Nbh) ------------------
    cap_pos = np.asarray(fluid_pos)
    if plan_pos is not None:
        cap_pos = np.asarray(plan_pos, np.float32)
        if cap_pos.shape != (n_fluid, 3):
            raise ValueError(
                f"plan_pos shape {cap_pos.shape} != ({n_fluid}, 3)")
    K, bK, cell_cap, bcell_cap, k2, bk2 = neighbor_capacities(
        cap_pos, np.asarray(boundary_pos), grid, h,
        akinci=sv.boundary_handle,
        rigid=rigid_active and n_rigid > 0)
    if rigid_active and n_rigid > 0:
        # The dynamic set interleaves rigid particles into the sorted
        # source space; size the plan over the combined seed.
        _src = np.concatenate([cap_pos,
                               rigid_init.pos.to_numpy()], axis=0)
    else:
        _src = cap_pos
    n_dyn = n_fluid + (n_rigid if rigid_active else 0)
    # `large` keys the whole capacity-policy ladder; BAND_B_LARGE lets
    # probes vary the large-N group width without dragging the small-N
    # policies (full-width boundary pass, no coef split) along.
    large = n_dyn >= GROUPED_BUILD_MIN_N
    band_B = BAND_B_LARGE if large else 16
    _cover_B = band_plan_cover(cap_pos, grid, B=band_B, src_rows=_src)
    _nb_seed = int(_cover_B.max())
    # CSR plans cover whole stencil runs. With per-member spans the need
    # tracks local stencil DENSITY (physics-bounded), not group order:
    # measured evolved/seed drift on the 1M dam break (t=0.009, B=8) was
    # 18/16 = 1.12x. x1.3 + 4 covers with margin. Pair plans only cover
    # blocks holding true neighbors (measured hot-phase max = 1.1x the
    # seed CSR cover): x1.2 + 2. Overflow beyond either is counted
    # on-device.
    band_nb = max(int(np.ceil(_nb_seed * 1.3)) + 4, 6)
    # Pair margin: x1.2 + 2 at small N (impact-hot 30k needs 11 of 16);
    # x1.35 + 4 at large N, where the impact-hot mid-scale dams need
    # MORE width relative to their seed than 1M does (measured at B=32
    # after 14 seeded steps: 157k needs 22 on a seed of 15; 1M needs 18
    # on a seed of 20 — the x1.2 + 2 cap dropped real pairs at 157k).
    pair_margin = (1.35, 4) if large else (1.2, 2)
    pair_nb = max(int(np.ceil(_nb_seed * pair_margin[0]))
                  + pair_margin[1], 6)
    # Wide capacity for the dense-mode one-shot term passes. At B=16 the
    # CSR cover's fragmentation measured up to 2.1x the seed need on the
    # evolved 30k dam — x1.5 + 20 covers that (the pass is cheap at that
    # scale anyway). At B=8 the per-member-span union tracks stencil
    # density: measured on the evolved hot-phase 1M dam, union max was
    # 18 vs seed 16 (1.13x, mean 10.9), so x1.35 + 4 covers with ~40%
    # margin while keeping the dominant dense passes (whose cost scales
    # with this CAPACITY, not the true need) 1.7x cheaper than the
    # B=16 formula would. Overflow still counted on-device.
    band_nb_wide = (int(np.ceil(_nb_seed * 1.35)) + 4 if large
                    else int(np.ceil(_nb_seed * 1.5)) + 20)
    # The boundary shell is static but the QUERY groups drift: a drifted
    # group splits into several spans, each dragging its own 9 stencil
    # runs through the shell — measured need on the evolved 1M dam break
    # was 1.5x the seed-exact bound. x1.6 + 4 covers with margin;
    # overflow is counted on-device either way.
    bband_nb = (int(boundary_band_capacity(np.asarray(boundary_pos),
                                           grid) * 1.6) + 4) \
        if sv.boundary_handle else 6
    # Wall-near group capacity for the group-sparse dense boundary pass.
    # At B=16 (small scenes) the capacity is EXACT — cap = QB, overflow
    # impossible: a collapsed dam wets far more groups than the seed
    # (measured evolved 30k dam at t=0.35: 1,165 near groups of 1,820 =
    # 64% vs 480 at seed), and a dropped group loses its ENTIRE boundary
    # contribution, so the 2x-seed heuristic broke physics exactly where
    # the flow is violent. The full-width pass costs ~2x the sparse one
    # at this scale — cheap. At B=8 (large N) group-sparsity is the
    # point (measured evolved hot-phase 1M dam: 12,780 near groups of
    # 125,000 = 10.2%): 2x the seed need with a 15%-of-QB floor,
    # overflow counted on-device.
    _QB = -(-n_fluid // band_B)
    if sv.boundary_handle:
        if not large:
            bq_cap = _QB
        else:
            _seed_near = boundary_near_group_capacity(
                cap_pos, np.asarray(boundary_pos), grid,
                band_B)
            # x3 growth margin (r05: the wetted surface keeps growing
            # through the impact window — a hot-resumed 1M run measured
            # near-groups at 16% of QB twelve steps in and STILL growing;
            # the old x2 + 15% floor overflowed, and a dropped wall-near
            # group loses its whole boundary contribution) with a 25%-QB
            # floor; the pass is group-sparse, so generosity here costs
            # far less than the pair-width capacities.
            _floor = _QB // 4
            bq_cap = min(_QB, _round_up(max(3 * _seed_near, _floor, 64), 8))
    else:
        bq_cap = 0
    # SPLIT-WIDTH dense mode (SceneStatic.loop_B): run the loop engine
    # at narrower groups than the one-shot passes. MEASURED NEGATIVE at
    # 1M (r4): the loop-plan compaction machinery (row-repeat + a
    # 4x-row compact_plan + a second coef-width build, ~+250 ms) eats
    # the ~300 ms the narrower loop saves — single-width B=32 measured
    # 1298 ms/step vs 1579 split. Plumbing + test kept (LOOP_B_LARGE
    # flips it back on); pair_nb_q == pair_nb when off.
    loop_B = LOOP_B_LARGE if large else 0
    if loop_B:
        _nb_seed_loop = band_plan_raw_max(cap_pos, grid,
                                          B=loop_B, src_rows=_src)
        pair_nb_q = pair_nb
        pair_nb = max(int(np.ceil(_nb_seed_loop * 1.2)) + 2, 6)
    else:
        _nb_seed_loop = _nb_seed
        pair_nb_q = pair_nb
    # Split-bucket coef engine widths (large-N coef regime only): the
    # pair-block distribution is strongly skewed (p50 well under the
    # max), so the A-width covers the bulk and a remainder bucket
    # carries the tail. DISTRIBUTION-AWARE (r05): sized from the
    # per-group cover distribution of the sizing distribution itself —
    # A-width at the p97 cover (cover >= pair width, so p97-of-cover is
    # a generous bulk bound) and the tail bucket at 3x the count of
    # groups above it (+ the old QB/12 floor). The r04 formula
    # (0.75 x max) broke under checkpoint-resume re-planning: a hot
    # state's max cover is ~2/3 of the seed's, so nbA fell to ~p50 of
    # the PAIR distribution while capB stayed at QB/12 — thousands of
    # groups spilled past the remainder bucket and the dropped loop
    # pairs wrecked the solve (measured: 21% density error, 65 railed
    # iters, overflow 499). Remainder beyond coef_capB is still counted
    # overflow. Sized at the LOOP width (the engine's group width:
    # loop_B when split, band_B otherwise).
    if large:
        _B_eng = loop_B or band_B
        _QB_eng = -(-n_fluid // _B_eng)
        _cover_eng = (band_plan_cover(cap_pos, grid, B=_B_eng,
                                      src_rows=_src)
                      if _B_eng != band_B else _cover_B)
        coef_nbA = max(8, int(np.percentile(_cover_eng, 97.0)))
        _n_tail = int((_cover_eng > coef_nbA).sum())
        coef_capB = _round_up(
            min(_QB_eng, max(3 * _n_tail + 64, _QB_eng // 12, 512)), 8)
    else:
        coef_nbA = coef_capB = 0
    # Rigid-near group capacity (ops/rigid_dense): fluid within h of the
    # body is bounded by the padded rotated-AABB volume over the particle
    # volume; x3 covers rotation inflation of the AABB (a rotated box's
    # AABB volume grows at most ~2.6x) + compression. Overflow counted.
    rq_cap = 0
    if rigid_active and n_rigid > 0:
        ext = vox.max(axis=0) - vox.min(axis=0)
        pad = 2.0 * h + 4.0 * r
        vol = float(np.prod(ext + pad))
        rq_cap = min(_QB, _round_up(
            int(vol / (2.0 * r) ** 3 / band_B * 3.0) + 64, 8))

    static = SceneStatic(
        n_fluid=n_fluid, n_boundary=n_boundary, n_rigid=n_rigid,
        particle_radius=r, h=h, particle_m=cfg.particle_mass,
        gravity=sc.gravity, box_min=sc.box_min, box_max=sc.box_max,
        grid=grid, akinci=sv.boundary_handle, fs_couple=sv.fs_couple,
        has_rigid=so is not None, rigid_active=rigid_active,
        rigid_rho=rigid_rho, dt0=sv.delta_time, solver_name=sv.name,
        K=K, bK=bK, cell_cap=cell_cap, bcell_cap=bcell_cap, k2=k2, bk2=bk2,
        band_nb=band_nb, bband_nb=bband_nb, pair_nb=pair_nb, band_B=band_B,
        band_nb_wide=band_nb_wide, bq_cap=bq_cap,
        coef_nbA=coef_nbA, coef_capB=coef_capB, rq_cap=rq_cap,
        loop_B=loop_B, pair_nb_q=pair_nb_q,
    )
    arrays = SceneArrays(
        boundary_pos=bpos, boundary_volume=bvol, boundary_table=btable,
        rigid_volume=rigid_volume, rigid_mass=rigid_mass,
        rigid_mass_total=rigid_mass_total,
    )
    return Scene(static=static, arrays=arrays,
                 fluid_pos0=V3.from_rows(fluid_pos), rigid=rigid_init,
                 fluid_vel0=tuple(float(c) for c in fl.initial_velocity))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def neighbor_capacities(fluid_pos_rows: np.ndarray,
                        boundary_pos_rows: np.ndarray, grid: nb.GridSpec,
                        h: float, akinci: bool, rigid: bool):
    """Static neighbor-list capacities (K, bK, cell_cap) for models/base.Nbh.

    Sized from the initial particle set (a freshly seeded lattice is the
    densest sustained configuration; the iterative solvers cap compression —
    measured dam-break floor impact peaks at ~1.13x density):
      * K = max initial within-h neighbor count x1.75 headroom (+ room for
        rigid contacts, which add up to one body's local shell)
      * cell_cap = max initial per-cell occupancy x1.75 headroom
      * bK = exact max count of boundary particles within h of any grid
        point of their shell (the shell is static, so this is a true bound
        up to the compression margin)
    Runtime overflow beyond any capacity is counted and surfaced in
    telemetry (cf. the reference's 512-entry cell capacity,
    ParticleSystem.py:103)."""
    cells = nb.cell_id_np(fluid_pos_rows, grid)
    occ = np.bincount(cells, minlength=grid.num_cells).max() if len(cells) \
        else 0
    # A drifting lattice with spacing s can align (floor(h/s)+1)^3 particles
    # into one h-cell (27 for the standard s = h/2) no matter what the seed
    # alignment shows, and impact stacking compresses further (measured
    # 2x the seed's per-cell max at dam-break floor impact). Take the max of
    # both bounds; overflow beyond it is counted in telemetry.
    s = 2.0 * grid.cell / 4.0  # particle spacing 2r with h = 4r
    align_worst = int(np.floor(grid.cell / s) + 1) ** 3
    # x1.75 impact headroom over the seed's measured occupancy OR x1.2 over
    # the drift-alignment bound, whichever is larger (an already-aligned
    # seed has its alignment spike priced into `occ`, so the two bounds
    # don't multiply).
    cell_cap = max(_round_up(int(occ * 1.75), 8),
                   _round_up(int(align_worst * 1.2), 8))

    # Max within-h neighbor count of the initial lattice: the seeded block is
    # uniform, so the count at the densest interior point is the lattice-ball
    # population — bounded above by (2h/spacing+1)^3 but measured exactly via
    # a small sample of interior particles against the cell table.
    kmax = _max_count_sample(fluid_pos_rows, cells, grid, h)
    # x1.5 headroom: iterative solvers cap sustained compression at ~1.2x
    # (measured dam-impact density peak 1.13x); overflow counts in telemetry.
    K = max(_round_up(int(kmax * 1.5) + (32 if rigid else 0), 16), 48)

    # Stencil-prune cap: max 27-cell candidate population of the seed x1.75
    # + alignment slack (+ the same rigid margin as K); disabled when it
    # would not prune.
    stenmax = _stencil_max(cells, grid)
    k2 = _round_up(int(min(stenmax * 1.75 + 32 + (32 if rigid else 0),
                           27 * cell_cap)), 32)
    if k2 >= int(0.8 * 27 * cell_cap) or k2 <= K:
        k2 = 0

    bK = 16
    bcell_cap = 8
    bk2 = 0
    if akinci and len(boundary_pos_rows):
        bcells = nb.cell_id_np(boundary_pos_rows, grid)
        bmax = _max_count_sample(boundary_pos_rows, bcells, grid, h)
        # The shell's own worst within-h self-count underestimates what a
        # FLUID query can see: fluid pressed against a wall sits closer to
        # the plane than the shell's in-plane spacing, and corner-adjacent
        # fluid sees up to three plates (measured: dam-break floor contact
        # reaches ~20 boundary neighbors where the shell self-count is 12).
        bK = max(_round_up(int(bmax * 1.6) + 8, 8), 24)
        # Exact static per-cell bound — the shell never moves.
        bcell_cap = max(_round_up(
            int(np.bincount(bcells, minlength=grid.num_cells).max()), 4), 4)
        # Exact stencil bound too (no drop risk: the shell is static, and
        # a fluid query's 27-cell boundary population can never exceed the
        # max 27-neighborhood population over all grid cells).
        bk2 = _round_up(int(_stencil_max(bcells, grid)), 16)
        if bk2 >= int(0.8 * 27 * bcell_cap) or bk2 <= bK:
            bk2 = 0
    return K, bK, cell_cap, bcell_cap, k2, bk2


def band_plan_raw_max(fluid_pos_rows: np.ndarray, grid: nb.GridSpec,
                      B: int = 8, block: int | None = None,
                      src_rows: np.ndarray | None = None) -> int:
    """Max of `band_plan_cover` (see below)."""
    return int(band_plan_cover(fluid_pos_rows, grid, B=B, block=block,
                               src_rows=src_rows).max())


def band_plan_cover(fluid_pos_rows: np.ndarray, grid: nb.GridSpec,
                    B: int = 8, block: int | None = None,
                    src_rows: np.ndarray | None = None) -> np.ndarray:
    """Raw per-group measurement for the block-plan capacities
    (ops/bandmat): for EACH group of B consecutive CELL-SORTED queries,
    the number of `block`-slot source blocks covering its stencil —
    a (QB,) distribution (callers apply engine-specific headroom and,
    for the split-bucket engine, pick a bulk percentile + tail-bucket
    count from it; runtime overflow is counted on-device).

    Vectorized over all groups: each group's member cells span contiguous
    ids [c0, c1]; for each of the 9 (mid, slow)-axis stencil offsets the
    candidate slots are one contiguous sorted-index run
    [starts[c0 + o - 1], starts[c1 + o + 2]) (fast axis has stride 1), and
    the group's block count is the size of the union of the 9 runs'
    block-id ranges (exact interval-union arithmetic below)."""
    if block is None:
        from cfd_taichi_tpu.ops import bandmat
        block = bandmat.BLOCK
    n = fluid_pos_rows.shape[0]
    if n == 0:
        return np.full((1,), 4, np.int64)
    cells = nb.cell_id_np(fluid_pos_rows, grid)
    order = np.argsort(cells, kind="stable")
    sc = cells[order]
    src_cells = cells if src_rows is None else \
        nb.cell_id_np(src_rows, grid)
    counts = np.bincount(src_cells, minlength=grid.num_cells)
    starts = np.concatenate([[0], np.cumsum(counts)])
    ncells = grid.num_cells

    QB = -(-n // B)
    # Member cell ids per group, edge-padded.
    memb = np.full((QB * B,), sc[-1], np.int64)
    memb[:n] = sc
    memb = memb.reshape(QB, B)
    # Per-member spans, matching the runtime plan's tight default
    # (ops/bandmat.plan_from_csr): one [c, c] span per member cell, so
    # the measured need is the true stencil union — no straddle slack.
    spans = [(memb[:, j], memb[:, j]) for j in range(B)]

    fast_axes = sorted(range(3), key=lambda a: grid.strides[a])
    smid = grid.strides[fast_axes[1]]
    sslow = grid.strides[fast_axes[2]]
    offs = [dm * smid + ds * sslow for dm in (-1, 0, 1) for ds in (-1, 0, 1)]

    # Block-id intervals [lo, hi) per (group, span x offset).
    n_iv = len(spans) * 9
    lo = np.empty((QB, n_iv), np.int64)
    hi = np.empty((QB, n_iv), np.int64)
    j = 0
    for ca, cb in spans:
        for o in offs:
            a = np.clip(ca + o - 1, 0, ncells)
            b = np.clip(cb + o + 2, 0, ncells)
            s = starts[a]
            e = np.maximum(starts[b], s)
            lo[:, j] = s // block
            hi[:, j] = np.where(e > s, (e - 1) // block + 1, s // block)
            j += 1
    # Union size of integer intervals per group: sort by lo, subtract overlap
    # with the running max of hi.
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


def boundary_near_group_capacity(fluid_pos_rows: np.ndarray,
                                 boundary_pos_rows: np.ndarray,
                                 grid: nb.GridSpec, B: int) -> int:
    """Seed count of WALL-NEAR query groups — groups whose boundary CSR
    intervals are nonempty, the exact runtime selection criterion of
    bandmat.dense_boundary_terms. Sizes the group-sparse boundary pass
    capacity (the wetted surface grows as the dam collapses, so the
    caller adds slack; overflow is counted on-device either way)."""
    if boundary_pos_rows.shape[0] == 0 or fluid_pos_rows.shape[0] == 0:
        return 0
    bcells = nb.cell_id_np(boundary_pos_rows, grid)
    counts = np.bincount(bcells, minlength=grid.num_cells)
    starts = np.concatenate([[0], np.cumsum(counts)])
    ncells = grid.num_cells
    fcells = np.sort(nb.cell_id_np(fluid_pos_rows, grid)).astype(np.int64)
    n = fcells.shape[0]
    QB = -(-n // B)
    qc = np.pad(fcells, (0, QB * B - n), mode="edge").reshape(QB, B)

    fast_axes = sorted(range(3), key=lambda a: grid.strides[a])
    smid = grid.strides[fast_axes[1]]
    sslow = grid.strides[fast_axes[2]]
    near = np.zeros(QB, bool)
    for dm in (-1, 0, 1):
        for ds in (-1, 0, 1):
            o = dm * smid + ds * sslow
            a = np.clip(qc + (o - 1), 0, ncells)
            b = np.clip(qc + (o + 2), 0, ncells)
            near |= (starts[b] > starts[a]).any(axis=1)
    return int(near.sum())


def boundary_band_capacity(boundary_pos_rows: np.ndarray, grid: nb.GridSpec,
                           block: int | None = None) -> int:
    """Static bound on the grouped-window plan size against the boundary
    shell: the shell never moves, so take the worst 9-run block union
    over EVERY possible query-group cell span [c, c+1]. Exact for groups
    spanning <= 2 consecutive cell ids (the dense-fluid norm); sparse
    spray groups can span more and overflow — which the runtime counts
    (NeighborList.dropped) like every other capacity."""
    if block is None:
        from cfd_taichi_tpu.ops import bandmat
        block = bandmat.BLOCK
    if boundary_pos_rows.shape[0] == 0:
        return 6
    bcells = nb.cell_id_np(boundary_pos_rows, grid)
    counts = np.bincount(bcells, minlength=grid.num_cells)
    starts = np.concatenate([[0], np.cumsum(counts)])
    ncells = grid.num_cells

    fast_axes = sorted(range(3), key=lambda a: grid.strides[a])
    smid = grid.strides[fast_axes[1]]
    sslow = grid.strides[fast_axes[2]]
    offs = [dm * smid + ds * sslow for dm in (-1, 0, 1) for ds in (-1, 0, 1)]

    c0 = np.arange(ncells, dtype=np.int64)
    c1 = c0 + 1
    lo = np.empty((ncells, 9), np.int64)
    hi = np.empty((ncells, 9), np.int64)
    for j, o in enumerate(offs):
        a = np.clip(c0 + o - 1, 0, ncells)
        b = np.clip(c1 + o + 2, 0, ncells)
        s = starts[a]
        e = np.maximum(starts[b], s)
        lo[:, j] = s // block
        hi[:, j] = np.where(e > s, (e - 1) // block + 1, s // block)
    ordj = np.argsort(lo, axis=1)
    lo = np.take_along_axis(lo, ordj, axis=1)
    hi = np.take_along_axis(hi, ordj, axis=1)
    total = np.zeros(ncells, np.int64)
    run_end = np.full(ncells, -1, np.int64)
    for j in range(9):
        s = np.maximum(lo[:, j], run_end)
        total += np.maximum(hi[:, j] - s, 0)
        run_end = np.maximum(run_end, hi[:, j])
    # +3: runtime sub-spans (after the largest-gap split) can cover a few
    # consecutive cells, slightly widening runs beyond this [c, c+1] bound.
    return max(int(total.max()) + 3, 4)


def _stencil_3d(cells: np.ndarray, grid: nb.GridSpec):
    """27-stencil candidate population per cell, as a 3-D array in
    'stride space' (axes ordered by descending stride)."""
    counts = np.bincount(cells, minlength=grid.num_cells)
    axes = np.argsort(grid.strides)[::-1]
    dims3 = tuple(grid.dims[a] for a in axes)
    c3 = counts.reshape(dims3)
    pad = np.pad(c3, 1)
    sten = np.zeros_like(c3)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                sten += pad[dx:dx + dims3[0], dy:dy + dims3[1],
                            dz:dz + dims3[2]]
    return sten, dims3, axes


def _stencil_max(cells: np.ndarray, grid: nb.GridSpec) -> int:
    if len(cells) == 0:
        return 0
    sten, _, _ = _stencil_3d(cells, grid)
    return int(sten.max())


def _max_count_sample(pos_rows: np.ndarray, cells: np.ndarray,
                      grid: nb.GridSpec, h: float) -> int:
    """Max within-h neighbor count, host-side numpy, vectorized: locate the
    densest 27-cell neighborhood via a stencil sum over the per-cell
    histogram, then brute-force the exact counts in that region only (the
    max is attained in the densest region for the uniform seed lattices this
    sizes)."""
    n = pos_rows.shape[0]
    if n == 0:
        return 0
    sten, dims3, axes = _stencil_3d(cells, grid)
    # Densest neighborhood center cell (in linear-id space).
    flat = int(np.argmax(sten))
    c0 = np.unravel_index(flat, dims3)
    coord = {axes[i]: c0[i] for i in range(3)}
    cstar = np.array([coord[0], coord[1], coord[2]])
    # Exact brute-force inside a 5x5x5 source region around c*.
    inv = 1.0 / grid.cell
    cc = np.clip(np.floor(pos_rows * inv).astype(np.int64), 0,
                 np.array(grid.dims) - 1)
    d = np.abs(cc - cstar)
    src = pos_rows[(d <= 2).all(axis=1)]
    qry = pos_rows[(d <= 1).all(axis=1)]
    if len(qry) == 0 or len(src) == 0:
        return 0
    h2 = h * h
    best = 0
    for s0 in range(0, len(qry), 2048):
        q = qry[s0:s0 + 2048]
        d2 = ((q[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
        best = max(best, int((d2 <= h2).sum(axis=1).max()) - 1)  # excl. self
    return best


def _kernel_sum_np(pos_rows: np.ndarray, grid: nb.GridSpec,
                   h: float) -> np.ndarray:
    """sum_{j != i} W(|x_i - x_j|, h) of a static particle set against
    itself — host-side numpy, cell-bucketed.

    Runs at scene build for boundary volumes (ParticleSystem.py:309-320)
    and rigid particle volumes (ParticleSystem.py:252-259). Host numpy is
    the right tool here: the device path costs a fresh multi-minute
    remote-compile for every new scene shape, while this vectorized
    bucket sweep takes ~a second even for 1M-scale boundary shells.
    """
    n = pos_rows.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32)
    pos = np.asarray(pos_rows, np.float64)
    cells = nb.cell_id_np(pos_rows, grid)
    order = np.argsort(cells, kind="stable")
    sc = cells[order]
    occ = np.bincount(cells, minlength=grid.num_cells)
    cap = int(occ.max())
    # Dense (num_cells, cap) bucket of sorted indices (-1 = empty slot).
    rank = np.arange(n) - np.searchsorted(sc, sc, side="left")
    dense = np.full((grid.num_cells, cap), -1, np.int64)
    dense[sc, rank] = order
    dmask = dense >= 0
    dpos = pos[np.clip(dense, 0, n - 1)]          # (C, cap, 3)

    occ_cells = np.nonzero(occ)[0]                # (M,)
    gx, gy, gz = grid.dims
    sx, sy, sz = grid.strides
    # Decode each occupied cell's coordinates FROM the linear id (exact).
    # Re-deriving them from positions hits f32-vs-f64 floor mismatches at
    # lattice-aligned coordinates (0.7f * 10 floors to 7 in f32, 6 in f64)
    # and silently shifts the stencil.
    axes = np.argsort(grid.strides)[::-1]         # axes by stride desc
    rem = occ_cells.copy()
    coord = [None, None, None]
    for a in axes:
        coord[a] = rem // grid.strides[a]
        rem = rem - coord[a] * grid.strides[a]
    cx, cy, cz = coord

    qpos = dpos[occ_cells]                        # (M, cap, 3)
    qmask = dmask[occ_cells]
    qidx = dense[occ_cells]
    acc = np.zeros(qpos.shape[:2], np.float64)    # (M, cap)
    h2 = h * h
    k8 = 8.0 / (np.pi * h ** 3)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                nx, ny, nz = cx + ox, cy + oy, cz + oz
                ok = ((nx >= 0) & (nx < gx) & (ny >= 0) & (ny < gy)
                      & (nz >= 0) & (nz < gz))
                ncid = np.clip(nx * sx + ny * sy + nz * sz, 0,
                               grid.num_cells - 1)
                spos = dpos[ncid]                 # (M, cap, 3)
                smask = dmask[ncid] & ok[:, None]
                d2 = ((qpos[:, :, None, :] - spos[:, None, :, :]) ** 2
                      ).sum(axis=3)               # (M, cap, cap)
                q = np.sqrt(d2) / h
                w = np.where(q <= 0.5, k8 * (6.0 * (q ** 3 - q ** 2) + 1.0),
                             2.0 * k8 * (1.0 - q) ** 3)
                # d2 > 0 excludes self; static sets (boundary shell, rigid
                # voxels) have no coincident duplicates, so this matches the
                # reference's by-index exclusion.
                w = np.where((d2 <= h2) & (d2 > 0.0), w, 0.0)
                w = np.where(smask[:, None, :], w, 0.0)
                acc += w.sum(axis=2)
    out = np.zeros((n,), np.float64)
    out[qidx[qmask]] = acc[qmask]                 # slots are unique
    return out.astype(np.float32)


def _inverse_kernel_sum_np(pos_rows: np.ndarray, grid: nb.GridSpec,
                           h: float) -> np.ndarray:
    s = _kernel_sum_np(pos_rows, grid, h)
    return 1.0 / s  # reference divides unguarded (ParticleSystem.py:314)
