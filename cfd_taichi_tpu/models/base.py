"""Shared solver infrastructure: state pytrees, per-step neighborhoods, and
the common SPH operators (density, artificial viscosity, cohesion tension,
Akinci boundary terms, rigid-coupling scatter).

Functional counterpart of the reference's `solver_base` class
(solver_base.py:7-245). Where the reference accumulates through Taichi's
`for_all_neighbor(task)` higher-order iterator with atomics, every operator
here is a masked gather over the fixed-K neighbor list followed by a sum over
the K axis — race-free and fully fusable by XLA. Scatters into rigid bodies
use deterministic `.at[].add` (segment-sum) instead of atomic `+=`
(cf. wcsph_solver.py:126).

All vectors are component-separated `V3`s (ops/vec.py): every pairwise
intermediate is a 2-D (N, K) buffer that tiles cleanly on TPU. A trailing-3
layout would be lane-padded 3 -> 128 on materialization (measured 42x).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu.scene import RHO_0, Scene, SceneArrays, SceneStatic

# Global velocity damping applied each integration (reference
# solver_base.py:37; WCSPH uses its own 0.9998, wcsph_solver.py:51).
ARTIFICIAL_FRICTION = 0.9999
# Clamp-boundary velocity decay factor (reference solver_base.py:18).
V_DECAY = 0.5
DENSITY_EPS = 0.001  # density seed (reference solver_base.py:44)


class FluidState(NamedTuple):
    pos: V3   # components (Nf,)
    vel: V3
    acc: V3


class RigidBodyState(NamedTuple):
    """One rigid body; per-particle positions + body-level dynamics.

    The reference stores body quantities replicated per particle
    (rigid_particles.vel/omega/alpha/acc filled in rigid_solver.py:96-97,128);
    here they live once at body level.
    """
    pos: V3                   # particle positions (world), components (Nr,)
    vertices: V3              # mesh vertices (world)
    vel: jnp.ndarray          # (3,) body linear velocity
    omega: jnp.ndarray        # (3,) body angular velocity
    alpha: jnp.ndarray        # (3,) body angular acceleration
    acc: jnp.ndarray          # (3,) body linear acceleration
    force: V3                 # accumulated fluid forces, components (Nr,)
    centroid: jnp.ndarray     # (3,)
    inertia_inv: jnp.ndarray  # (3, 3)


class SimState(NamedTuple):
    fluid: FluidState
    rigid: RigidBodyState        # zero-sized arrays when no rigid body
    dt: jnp.ndarray              # () f32 — adaptive-capable (dfsph)
    t: jnp.ndarray               # () f32 simulated time
    step_count: jnp.ndarray      # () int32
    extra: tuple                 # per-solver scratch/warm-start state
    # Convergence telemetry of the last step — the on-device analogue of the
    # reference's per-step residual prints (pcisph_solver.py:70,
    # iisph_solver.py:96, dfsph_solver.py:233,416):
    # [iters_a, residual_a, iters_b, residual_b] (meaning per solver).
    diag: jnp.ndarray = jnp.zeros((4,), jnp.float32)
    # Max pair-window overflow observed by the step's own sweeps (candidates
    # dropped because a window was full — the analogue of the reference's
    # 512-entry cell capacity, ParticleSystem.py:103). A mid-step overflow
    # (e.g. during PCISPH's predicted-position pass) surfaces here even when
    # telemetry's separate density recomputation sees none.
    overflow: jnp.ndarray = jnp.zeros((), jnp.int32)


def empty_rigid() -> RigidBodyState:
    z3 = jnp.zeros((3,), jnp.float32)
    return RigidBodyState(
        pos=V3.zeros((0,)), vertices=V3.zeros((0,)),
        vel=z3, omega=z3, alpha=z3, acc=z3,
        force=V3.zeros((0,)), centroid=z3,
        inertia_inv=jnp.zeros((3, 3), jnp.float32),
    )


def init_rigid_state(scene: Scene) -> RigidBodyState:
    if scene.rigid is None:
        return empty_rigid()
    r = scene.rigid
    z3 = jnp.zeros((3,), jnp.float32)
    return RigidBodyState(
        pos=r.pos, vertices=r.vertices, vel=z3, omega=z3, alpha=z3, acc=z3,
        force=V3.zeros(r.pos.x.shape), centroid=r.centroid,
        inertia_inv=r.inertia_inv,
    )


def init_sim_state(scene: Scene, extra: tuple = ()) -> SimState:
    n = scene.static.n_fluid
    return SimState(
        fluid=FluidState(
            pos=scene.fluid_pos0,
            vel=V3.zeros((n,)),
            acc=V3.zeros((n,)),
        ),
        rigid=init_rigid_state(scene),
        dt=jnp.asarray(scene.static.dt0, jnp.float32),
        t=jnp.zeros((), jnp.float32),
        step_count=jnp.zeros((), jnp.int32),
        extra=extra,
    )


# ---------------------------------------------------------------------------
# Per-step neighborhood
# ---------------------------------------------------------------------------

class Neighborhood(NamedTuple):
    nbr: nb.NeighborList              # fluid -> dynamic (fluid [+ rigid])
    bnbr: Optional[nb.NeighborList]   # fluid -> boundary (Akinci mode only)
    pos_all: V3                       # dynamic positions, components (Nd,)


def concat_v3(a: V3, b: V3) -> V3:
    return V3(jnp.concatenate([a.x, b.x]), jnp.concatenate([a.y, b.y]),
              jnp.concatenate([a.z, b.z]))


def build_neighborhood(st: SceneStatic, arrays: SceneArrays,
                       fluid_pos: V3,
                       rigid_pos: Optional[V3]) -> Neighborhood:
    """Rebuild the dynamic cell list and compact neighbor lists (the
    per-step reset_grid/update_grid of the reference, solver_base.py:139-141).

    Rigid particles join the same table at global ids [Nf, Nf+Nr) only when
    the body is active (reference ParticleSystem.py:399-407)."""
    if st.rigid_active and rigid_pos is not None and st.n_rigid > 0:
        pos_all = concat_v3(fluid_pos, rigid_pos)
    else:
        pos_all = fluid_pos
    table = nb.build_cell_table(pos_all, st.grid)
    qid = jnp.arange(st.n_fluid, dtype=jnp.int32)
    nbrs = nb.find_neighbors(fluid_pos, qid, pos_all, table, st.grid,
                             K=st.K, cell_cap=st.cell_cap, exclude_self=True)
    bnbr = None
    if st.akinci:
        bnbr = nb.find_neighbors(fluid_pos, None, arrays.boundary_pos,
                                 arrays.boundary_table, st.grid,
                                 K=st.bK, cell_cap=st.cell_cap)
    return Neighborhood(nbr=nbrs, bnbr=bnbr, pos_all=pos_all)


def msum(term: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked sum over the neighbor axis (axis=1) for scalar pair terms."""
    return jnp.sum(jnp.where(mask, term, 0.0), axis=1)


def fluid_solid_masks(st: SceneStatic, nh: Neighborhood):
    """Split the dynamic neighbor list into fluid / coupled-solid partitions
    (the material branches of every reference pairwise callback,
    e.g. solver_base.py:59-66)."""
    j = nh.nbr.idx
    m = nh.nbr.mask
    mask_f = m & (j < st.n_fluid)
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        mask_s = m & (j >= st.n_fluid)
    else:
        mask_s = jnp.zeros_like(m)
    return mask_f, mask_s


def rigid_local(st: SceneStatic, j: jnp.ndarray) -> jnp.ndarray:
    """Map dynamic-space ids to rigid-local ids (clipped safe)."""
    hi = max(st.n_rigid - 1, 0)
    return jnp.clip(j - st.n_fluid, 0, hi)


def gather_rigid_volume(st: SceneStatic, arrays: SceneArrays, j):
    if st.n_rigid == 0:
        return jnp.zeros(j.shape, jnp.float32)
    return arrays.rigid_volume[rigid_local(st, j)]


def rho_of_neighbor(st: SceneStatic, rho: jnp.ndarray, j: jnp.ndarray):
    """rho indexed by neighbor id — replicating a reference quirk: for solid
    neighbors the reference indexes the *fluid-sized* rho field with the
    rigid-local index (solver_base.py:187,199 use
    `self.rho[particle_j.index]` where `.index` is rigid-local). We preserve
    that behavior exactly rather than rationalize it."""
    jj = jnp.where(j < st.n_fluid, j, rigid_local(st, j))
    return rho[jnp.clip(jj, 0, st.n_fluid - 1)]


# ---------------------------------------------------------------------------
# Shared SPH operators
# ---------------------------------------------------------------------------

def pair_disp(pos_f: V3, pos_src: V3, j) -> V3:
    """x_ij = x_i - x_j as (N, K) component tensors."""
    return pos_f.expand(1) - pos_src.take(j)


def compute_rho(st: SceneStatic, arrays: SceneArrays, nh: Neighborhood,
                pos_f: V3) -> jnp.ndarray:
    """Density: rho_i = 0.001 + sum_f m W + [solid] sum_s V_j rho0 W
    + [Akinci] rho0 * sum_b V_b W  (reference solver_base.py:41-72)."""
    j = nh.nbr.idx
    w = sm.cubic_w(pair_disp(pos_f, nh.pos_all, j).norm(), st.h)
    mask_f, mask_s = fluid_solid_masks(st, nh)
    rho = DENSITY_EPS + st.particle_m * msum(w, mask_f)
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        vol_j = gather_rigid_volume(st, arrays, j)
        rho = rho + RHO_0 * msum(vol_j * w, mask_s)
    if st.akinci:
        bj, bm = nh.bnbr.idx, nh.bnbr.mask
        wb = sm.cubic_w(pair_disp(pos_f, arrays.boundary_pos, bj).norm(), st.h)
        rho = rho + RHO_0 * msum(arrays.boundary_volume[bj] * wb, bm)
    return rho


def dynamic_velocities(st: SceneStatic, vel_f: V3,
                       rigid: RigidBodyState) -> V3:
    """Velocities of the dynamic set; rigid particles carry the body linear
    velocity (the reference fills rigid_particles.vel with it,
    rigid_solver.py:97)."""
    if st.rigid_active and st.n_rigid > 0:
        shape = (st.n_rigid,)
        rv = V3(jnp.full(shape, 0.0) + rigid.vel[0],
                jnp.full(shape, 0.0) + rigid.vel[1],
                jnp.full(shape, 0.0) + rigid.vel[2])
        return concat_v3(vel_f, rv)
    return vel_f


def compute_viscosity(st: SceneStatic, arrays: SceneArrays, nh: Neighborhood,
                      pos_f: V3, vel_f: V3, rho, rigid: RigidBodyState,
                      c_s: float, alpha: float, eps: float = 0.01) -> V3:
    """Monaghan artificial viscosity, applied only under compression
    (shear < 0), solid neighbors use V_j rho0 in place of m
    (reference solver_base.py:170-202). Returns the per-particle term
    already scaled by particle_m (solve_all_viscosity's trailing multiply,
    solver_base.py:175)."""
    j = nh.nbr.idx
    x_ij = pair_disp(pos_f, nh.pos_all, j)
    vel_all = dynamic_velocities(st, vel_f, rigid)
    v_ij = vel_f.expand(1) - vel_all.take(j)
    shear = v_ij.dot(x_ij)
    q2 = x_ij.norm2()
    r = jnp.sqrt(q2)
    rho_j = rho_of_neighbor(st, rho, j)
    nu = (2.0 * alpha * st.h * c_s) / (rho[:, None] + rho_j)
    pi = -nu * shear / (q2 + eps * st.h * st.h)
    gcoef = sm.cubic_grad_coeff(r, st.h)
    mask_f, mask_s = fluid_solid_masks(st, nh)
    compressing = shear < 0.0
    # grad W = gcoef * x_ij; term = -coeff * pi * gradW.
    scale_f = jnp.where(mask_f & compressing, -st.particle_m * pi * gcoef, 0.0)
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        vol_j = gather_rigid_volume(st, arrays, j)
        scale_f = scale_f + jnp.where(mask_s & compressing,
                                      -RHO_0 * vol_j * pi * gcoef, 0.0)
    return st.particle_m * (x_ij * scale_f).sum(axis=1)


def compute_tension(st: SceneStatic, nh: Neighborhood, pos_f: V3,
                    tension_k: float) -> V3:
    """Simple cohesion: -k * m * W * x_ij, fluid-fluid only
    (reference solver_base.py:204-217)."""
    j = nh.nbr.idx
    x_ij = pair_disp(pos_f, nh.pos_all, j)
    w = sm.cubic_w(x_ij.norm(), st.h)
    mask_f = nh.nbr.mask & (j < st.n_fluid)
    scale = jnp.where(mask_f, -tension_k * w, 0.0)
    return st.particle_m * (x_ij * scale).sum(axis=1)


def boundary_pressure_acc(st: SceneStatic, arrays: SceneArrays,
                          nh: Neighborhood, pos_f: V3, p_i, rho_i) -> V3:
    """Akinci boundary pressure acceleration: -sum_b V_b p_i/rho_i^2 gradW
    (reference wcsph_solver.py:92-100, pcisph_solver.py:190-198). The caller
    scales by rho0 (and particle_m where the reference does)."""
    bj, bm = nh.bnbr.idx, nh.bnbr.mask
    q = pair_disp(pos_f, arrays.boundary_pos, bj)
    gcoef = sm.cubic_grad_coeff(q.norm(), st.h)
    coeff = -arrays.boundary_volume[bj] * (p_i / (rho_i * rho_i))[:, None] * gcoef
    return (q * jnp.where(bm, coeff, 0.0)).sum(axis=1)


def scatter_rigid_force(st: SceneStatic, nh: Neighborhood,
                        contrib: V3, mask_s: jnp.ndarray,
                        force: V3) -> V3:
    """Accumulate per-pair force contributions onto rigid particles.

    Deterministic segment-sum replacement for the reference's atomic
    `rigid_particles[j].force += ...` (wcsph_solver.py:126,
    pcisph_solver.py:186, iisph_solver.py:159, dfsph_solver.py:212)."""
    if not (st.rigid_active and st.fs_couple and st.n_rigid > 0):
        return force
    j_flat = rigid_local(st, nh.nbr.idx).reshape(-1)
    c = contrib.where(mask_s)
    return V3(force.x.at[j_flat].add(c.x.reshape(-1)),
              force.y.at[j_flat].add(c.y.reshape(-1)),
              force.z.at[j_flat].add(c.z.reshape(-1)))


def clamp_to_box(st: SceneStatic, pos: V3, vel: V3, margin: float,
                 decay_mul: float):
    """Clamp-mode boundary handling: project positions to the padded box and
    scale the offending velocity component (reference wcsph_solver.py:54-63
    with margin=diameter, decay -0.5; other solvers use margin=radius)."""
    out_p = []
    out_v = []
    for c, (lo_c, hi_c) in zip(
            (pos.x, pos.y, pos.z),
            zip(st.box_min, st.box_max)):
        lo = jnp.float32(lo_c + margin)
        hi = jnp.float32(hi_c - margin)
        out_p.append(jnp.clip(c, lo, hi))
        out_v.append(((c <= lo) | (c >= hi), ))
    new_pos = V3(*out_p)
    hits = [v[0] for v in out_v]
    new_vel = V3(jnp.where(hits[0], vel.x * decay_mul, vel.x),
                 jnp.where(hits[1], vel.y * decay_mul, vel.y),
                 jnp.where(hits[2], vel.z * decay_mul, vel.z))
    return new_pos, new_vel


def gravity_acc(st: SceneStatic) -> V3:
    """a = g * (0, -1, 0) (reference solver_base.py:131-134), broadcastable."""
    return V3(jnp.float32(0.0), jnp.float32(-st.gravity), jnp.float32(0.0))


# ===========================================================================
# Windowed pair-sweep context (the fast path — see ops/pairwise.py)
# ===========================================================================

from cfd_taichi_tpu.ops import pairwise as pw  # noqa: E402


class Sweep(NamedTuple):
    """One sorted source set + its per-block windows, with cached windowed
    positions. Pair tensors (x_ij, masks) are recomputed per pass so they
    fuse into each pass's reduction instead of being materialized; slot
    validity and sorted-global ids are pure iota math over the engine's
    (nblk, NSUB) ranges and are likewise recomputed per pass (materializing
    them costs ~1.2 GB at 1M particles for zero gain)."""
    eng: pw.PairEngine
    pos_w: V3               # (nblk, W) windowed source positions
    W: int                  # window width (static)
    exclude_self: bool      # queries are members of this source set


class Ctx(NamedTuple):
    """Per-step sorted-fluid solver context.

    Fluid state lives in a *chunk-padded layout* of static size NQ = st.nq:
    particles are cell-sorted, then partitioned into groups at occupied
    C-cell chunk transitions of the linearized grid; each group's run is
    padded to a multiple of B so no query block mixes groups. This bounds
    every block's cell span to < C = st.chunk and hence its window occupancy
    (unbounded spans blow up window occupancy and truncate pairs). Pads are
    neutral: position 1e9 (distance-masked), zero for every lifted field —
    all solver residual definitions self-exclude zeros.
    """
    pos: V3                      # (NQ,) padded fluid positions
    perm: jnp.ndarray            # (N,) prev-state index of each sorted particle
    slot: jnp.ndarray            # (N,) padded slot of each sorted particle
    q_pos: V3                    # (nblk, B) blockified padded positions
    q_valid: jnp.ndarray         # (nblk, B)
    q_gid: jnp.ndarray           # (nblk, B) padded slot id of each query
    f: Sweep                     # fluid -> fluid
    r: Optional[Sweep]           # fluid -> rigid (when active & coupled)
    b: Optional[Sweep]           # fluid -> boundary (Akinci mode)
    rigid_set: Optional[pw.SortedSet]
    rigid_vol_w: Optional[jnp.ndarray]   # (nblk, Wr) windowed rigid volumes
    rigid_lid_w: Optional[jnp.ndarray]   # (nblk, Wr) original rigid local ids
    bvol_w: Optional[jnp.ndarray]        # (nblk, Wb) windowed boundary volumes
    overflow: jnp.ndarray        # () int32 — max window overflow this step


def lift(ctx: Ctx, arr: jnp.ndarray, fill=0.0) -> jnp.ndarray:
    """Prev-state-order per-fluid array (N,) -> padded layout (NQ,)."""
    nq = ctx.pos.x.shape[0]
    return jnp.full((nq,), fill, arr.dtype).at[ctx.slot].set(arr[ctx.perm])


def lift_v3(ctx: Ctx, v: V3, fill=0.0) -> V3:
    return V3(lift(ctx, v.x, fill), lift(ctx, v.y, fill), lift(ctx, v.z, fill))


def compact(ctx: Ctx, arr: jnp.ndarray) -> jnp.ndarray:
    """Padded layout (NQ,) -> compact (N,) in this step's sorted order."""
    return arr[ctx.slot]


def compact_v3(ctx: Ctx, v: V3) -> V3:
    return V3(compact(ctx, v.x), compact(ctx, v.y), compact(ctx, v.z))


PAD_POS = 1e9  # pad-slot position: farther than any support radius


def build_ctx(st: SceneStatic, arrays: SceneArrays, fluid_pos: V3,
              rigid_pos: Optional[V3]) -> Ctx:
    """Sort the fluid (and rigid) sets by cell and build pair windows.

    This replaces the reference's per-step grid rebuild
    (solver_base.py:139-141) in the windowed formulation. Callers lift their
    per-fluid state into the padded layout via `lift`/`lift_v3` and compact
    results back via `compact`/`compact_v3`.
    """
    n = st.n_fluid
    B = st.B
    NQ = st.nq
    nblk = NQ // B
    fluid = pw.sort_set(fluid_pos, st.grid)

    # --- chunk-padded layout --------------------------------------------------
    # Sorted particles are partitioned into GROUPS at every transition between
    # occupied C-cell chunks of the linearized grid, and each group is padded
    # to a multiple of B so no query block mixes two groups. This hard-bounds
    # every block's cell span to < C, which bounds its window occupancy to the
    # band (C + 2*(span_sub+1)) regardless of how particles scatter —
    # unbounded spans (stragglers/splash droplets sharing a block across a
    # sparse region) were the measured cause of window-overflow pair
    # truncation and solver blow-up at dam-break floor impact. The group
    # count is statically bounded by num_cells // C + 1, so the padded layout
    # size NQ is exact — overflow from the layout itself is impossible.
    C = st.chunk
    cells = fluid.cells
    idx_n = jnp.arange(n, dtype=jnp.int32)
    chunk_ids = (cells // C).astype(jnp.int32)
    prev_chunk = jnp.concatenate([chunk_ids[:1], chunk_ids[:-1]])
    brk = (chunk_ids != prev_chunk).at[0].set(False)
    gid = jnp.cumsum(brk.astype(jnp.int32))          # (n,) group id, ascending
    MAXG = st.grid.num_cells // C + 1
    counts_g = jnp.zeros((MAXG,), jnp.int32).at[gid].add(1)
    padded_g = ((counts_g + B - 1) // B) * B
    offsets_g = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(padded_g).astype(jnp.int32)])
    pstart_g = jnp.searchsorted(gid, jnp.arange(MAXG, dtype=jnp.int32)
                                ).astype(jnp.int32)  # first particle of group
    slot = offsets_g[gid] + (idx_n - pstart_g[gid])

    def _lift(arr, fill):
        return jnp.full((NQ,), fill, arr.dtype).at[slot].set(arr)

    pos_p = V3(_lift(fluid.pos.x, PAD_POS), _lift(fluid.pos.y, PAD_POS),
               _lift(fluid.pos.z, PAD_POS))
    valid_p = _lift(jnp.ones((n,), bool), False)
    # Pad cells get the previous particle's cell (cells are nondecreasing in
    # slot order) so block ranges stay tight.
    cells_p = jax.lax.cummax(_lift(fluid.cells, 0))

    # Padded-space CSR for the fluid source: each cell's compact offset shifted
    # by the padding of all groups before it. g_of_cell = last group whose
    # first cell id is <= the cell (unused trailing groups sit at num_cells).
    first_cell_g = jnp.where(pstart_g < n,
                             cells[jnp.minimum(pstart_g, n - 1)],
                             st.grid.num_cells)
    cell_ids = jnp.arange(st.grid.num_cells + 1, dtype=jnp.int32)
    g_of_cell = jnp.clip(
        jnp.searchsorted(first_cell_g, cell_ids, side="right").astype(jnp.int32)
        - 1, 0, MAXG - 1)
    starts_p = (offsets_g[g_of_cell]
                + (fluid.starts - pstart_g[g_of_cell])).astype(jnp.int32)

    q_pos = pw.blockify_v3(pos_p, nblk, B)
    q_valid = valid_p.reshape(nblk, B)
    q_gid = jnp.arange(NQ, dtype=jnp.int32).reshape(nblk, B)
    q_cells = cells_p

    align = 1024 if st.banded else 1
    eng_f = pw.build_engine(q_cells, starts_p, NQ, st.grid, st.B, st.Wf,
                            align=align)
    f_sweep = Sweep(eng=eng_f,
                    pos_w=pw.window_v3(eng_f, pos_p, st.Wf, st.banded),
                    W=st.Wf, exclude_self=True)
    overflow = eng_f.overflow

    r_sweep = None
    rigid_set = None
    rigid_vol_w = None
    rigid_lid_w = None
    if st.rigid_active and rigid_pos is not None and st.n_rigid > 0:
        rigid_set = pw.sort_set(rigid_pos, st.grid)
        eng_r = pw.build_engine(q_cells, rigid_set.starts, st.n_rigid,
                                st.grid, st.B, st.Wr, align=align)
        r_sweep = Sweep(eng=eng_r,
                        pos_w=pw.window_v3(eng_r, rigid_set.pos, st.Wr,
                                           st.banded),
                        W=st.Wr, exclude_self=False)
        rigid_vol_w = pw.window(eng_r, arrays.rigid_volume[rigid_set.perm],
                                st.Wr, banded=st.banded)
        rigid_lid_w = pw.window(eng_r, rigid_set.perm.astype(jnp.float32),
                                st.Wr, banded=st.banded).astype(jnp.int32)
        overflow = jnp.maximum(overflow, eng_r.overflow)

    b_sweep = None
    bvol_w = None
    if st.akinci:
        eng_b = pw.build_engine(q_cells, arrays.boundary_table.starts,
                                st.n_boundary, st.grid, st.B, st.Wb,
                                align=align)
        bpos_s = arrays.boundary_pos.take(arrays.boundary_table.order)
        bvol_s = arrays.boundary_volume[arrays.boundary_table.order]
        b_sweep = Sweep(eng=eng_b,
                        pos_w=pw.window_v3(eng_b, bpos_s, st.Wb, st.banded),
                        W=st.Wb, exclude_self=False)
        bvol_w = pw.window(eng_b, bvol_s, st.Wb, banded=st.banded)
        overflow = jnp.maximum(overflow, eng_b.overflow)

    return Ctx(pos=pos_p, perm=fluid.perm, slot=slot,
               q_pos=q_pos, q_valid=q_valid, q_gid=q_gid,
               f=f_sweep, r=r_sweep, b=b_sweep, rigid_set=rigid_set,
               rigid_vol_w=rigid_vol_w, rigid_lid_w=rigid_lid_w,
               bvol_w=bvol_w, overflow=overflow)


def pair_geom(st: SceneStatic, ctx: Ctx, sweep: Sweep, exclude_self: bool):
    """x_ij (nblk,B,W), r, and the pair validity mask for one sweep.
    Recomputed per pass (incl. slot validity / self-exclusion ids, which are
    pure iota math over the engine ranges); fuses into the pass reduction."""
    x_ij = ctx.q_pos.expand(2) - sweep.pos_w.expand(1)
    r2 = x_ij.norm2()
    valid_w = pw.win_valid(sweep.eng, sweep.W)
    mask = (valid_w[:, None, :] & ctx.q_valid[:, :, None]
            & (r2 <= jnp.float32(st.h) ** 2))
    if exclude_self and sweep.exclude_self:
        gid_w = pw.win_gid(sweep.eng, sweep.W)
        mask &= gid_w[:, None, :] != ctx.q_gid[:, :, None]
    return x_ij, jnp.sqrt(r2), mask


def sweep_sum(term: jnp.ndarray, mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """Masked pair reduction: (nblk,B,W) -> (N,) in sorted-query order."""
    return pw.unblock(jnp.sum(jnp.where(mask, term, 0.0), axis=2), n)


def sweep_sum_vec(x_ij: V3, scale: jnp.ndarray, n: int) -> V3:
    """Reduce scale*x_ij over the window axis -> V3 of (N,). `scale` must
    already be masked (zero where invalid)."""
    return pw.unblock_v3(V3(jnp.sum(x_ij.x * scale, axis=2),
                            jnp.sum(x_ij.y * scale, axis=2),
                            jnp.sum(x_ij.z * scale, axis=2)), n)


def q_form(ctx: Ctx, arr: jnp.ndarray) -> jnp.ndarray:
    """(N,) sorted per-fluid array -> (nblk, B, 1) broadcastable query form."""
    nblk, B = ctx.q_valid.shape
    return pw.blockify(arr, nblk, B)[:, :, None]


def w_form_fluid(st: SceneStatic, ctx: Ctx, arr: jnp.ndarray) -> jnp.ndarray:
    """(N,) sorted per-fluid array -> (nblk, 1, W) broadcastable window form."""
    return pw.window(ctx.f.eng, arr, st.Wf, banded=st.banded)[:, None, :]


def window_fluid_v3(st: SceneStatic, ctx: Ctx, v: V3) -> V3:
    """V3 of (N,) sorted per-fluid arrays -> (nblk, W) window form."""
    return pw.window_v3(ctx.f.eng, v, st.Wf, banded=st.banded)


def neighbor_counts(st: SceneStatic, ctx: Ctx) -> jnp.ndarray:
    """Dynamic-set neighbor count per fluid particle (fluid + active rigid),
    the reference's get_neighbour_count (ParticleSystem.py:424-445)."""
    _, _, mask_f = pair_geom(st, ctx, ctx.f, exclude_self=True)
    count = jnp.sum(mask_f, axis=2)
    if ctx.r is not None and st.fs_couple:
        _, _, mask_r = pair_geom(st, ctx, ctx.r, exclude_self=False)
        count = count + jnp.sum(mask_r, axis=2)
    return pw.unblock(count, st.nq)


# --- shared physics ops in windowed form -----------------------------------

def ctx_rho(st: SceneStatic, ctx: Ctx) -> jnp.ndarray:
    """Density (reference solver_base.py:41-72) over the sweeps."""
    import cfd_taichi_tpu.ops.smoothing as sm_

    _, r, mask = pair_geom(st, ctx, ctx.f, exclude_self=True)
    rho = DENSITY_EPS + st.particle_m * sweep_sum(
        sm_.cubic_w(r, st.h), mask, st.nq)
    if ctx.r is not None and st.fs_couple:
        _, rr, mask_r = pair_geom(st, ctx, ctx.r, exclude_self=False)
        rho = rho + RHO_0 * sweep_sum(
            ctx.rigid_vol_w[:, None, :] * sm_.cubic_w(rr, st.h), mask_r,
            st.nq)
    if ctx.b is not None:
        _, rb, mask_b = pair_geom(st, ctx, ctx.b, exclude_self=False)
        rho = rho + RHO_0 * sweep_sum(
            ctx.bvol_w[:, None, :] * sm_.cubic_w(rb, st.h), mask_b,
            st.nq)
    return rho


def ctx_viscosity(st: SceneStatic, ctx: Ctx, vel_s: V3, rho: jnp.ndarray,
                  rigid: "RigidBodyState", c_s: float, alpha: float,
                  eps: float = 0.01) -> V3:
    """Monaghan artificial viscosity (solver_base.py:170-202), sorted order."""
    import cfd_taichi_tpu.ops.smoothing as sm_

    x_ij, r, mask = pair_geom(st, ctx, ctx.f, exclude_self=True)
    v_w = pw.window_v3(ctx.f.eng, vel_s, st.Wf, banded=st.banded)
    v_ij = V3(q_form(ctx, vel_s.x) - v_w.x[:, None, :],
              q_form(ctx, vel_s.y) - v_w.y[:, None, :],
              q_form(ctx, vel_s.z) - v_w.z[:, None, :])
    shear = v_ij.dot(x_ij)
    q2 = r * r
    rho_q = q_form(ctx, rho)
    rho_w = w_form_fluid(st, ctx, rho)
    nu = (2.0 * alpha * st.h * c_s) / (rho_q + rho_w)
    pi = -nu * shear / (q2 + eps * st.h * st.h)
    gcoef = sm_.cubic_grad_coeff(r, st.h)
    scale = jnp.where(mask & (shear < 0.0), -st.particle_m * pi * gcoef, 0.0)
    out = sweep_sum_vec(x_ij, scale, st.nq)
    if ctx.r is not None and st.fs_couple:
        x_r, rr, mask_r = pair_geom(st, ctx, ctx.r, exclude_self=False)
        # Rigid neighbors carry the body linear velocity (rigid_solver.py:97).
        v_ij_r = V3(q_form(ctx, vel_s.x) - rigid.vel[0],
                    q_form(ctx, vel_s.y) - rigid.vel[1],
                    q_form(ctx, vel_s.z) - rigid.vel[2])
        shear_r = v_ij_r.dot(x_r)
        q2r = rr * rr
        # Reference quirk: rho of a solid neighbor is read from the *fluid*
        # rho field at the rigid-local index (solver_base.py:199) — i.e. an
        # unrelated fluid particle's density. `rho` here lives in the
        # cell-sorted padded layout, so restore original fluid order first;
        # indexing the padded layout directly would read a different
        # arbitrary particle each step as the sort changes.
        rho_fluid = jnp.zeros((st.n_fluid,), rho.dtype).at[ctx.perm].set(
            rho[ctx.slot])
        rho_quirk = rho_fluid[jnp.clip(ctx.rigid_lid_w, 0, st.n_fluid - 1)]
        nu_r = (2.0 * alpha * st.h * c_s) / (rho_q + rho_quirk[:, None, :])
        pi_r = -nu_r * shear_r / (q2r + eps * st.h * st.h)
        gc_r = sm_.cubic_grad_coeff(rr, st.h)
        scale_r = jnp.where(mask_r & (shear_r < 0.0),
                            -RHO_0 * ctx.rigid_vol_w[:, None, :] * pi_r * gc_r,
                            0.0)
        out = out + sweep_sum_vec(x_r, scale_r, st.nq)
    return st.particle_m * out


def ctx_tension(st: SceneStatic, ctx: Ctx, tension_k: float) -> V3:
    """Cohesion -k m W x_ij, fluid-fluid only (solver_base.py:204-217)."""
    import cfd_taichi_tpu.ops.smoothing as sm_

    x_ij, r, mask = pair_geom(st, ctx, ctx.f, exclude_self=True)
    scale = jnp.where(mask, -tension_k * sm_.cubic_w(r, st.h), 0.0)
    return st.particle_m * sweep_sum_vec(x_ij, scale, st.nq)


def ctx_boundary_pressure_acc(st: SceneStatic, ctx: Ctx, p_i, rho_i) -> V3:
    """Akinci boundary pressure acc: -sum_b V_b p_i/rho_i^2 gradW
    (wcsph_solver.py:92-100)."""
    import cfd_taichi_tpu.ops.smoothing as sm_

    xb, rb, mask_b = pair_geom(st, ctx, ctx.b, exclude_self=False)
    gcoef = sm_.cubic_grad_coeff(rb, st.h)
    coeff = q_form(ctx, p_i / (rho_i * rho_i))
    scale = jnp.where(mask_b, -ctx.bvol_w[:, None, :] * coeff * gcoef, 0.0)
    return sweep_sum_vec(xb, scale, st.nq)


def ctx_scatter_rigid_force(st: SceneStatic, ctx: Ctx, contrib: V3,
                            pair_mask, force: V3) -> V3:
    """Scatter per-pair (nblk,B,Wr) contributions onto rigid particles in
    their ORIGINAL order (deterministic segment-sum; replaces atomic +=)."""
    if ctx.r is None or not st.fs_couple:
        return force
    sums_sorted = pw.scatter_window_sum(
        ctx.r.eng, contrib.x, contrib.y, contrib.z, pair_mask, st.n_rigid,
        st.Wr)
    perm = ctx.rigid_set.perm
    return V3(force.x.at[perm].add(sums_sorted.x),
              force.y.at[perm].add(sums_sorted.y),
              force.z.at[perm].add(sums_sorted.z))
