"""Shared solver infrastructure: state pytrees, the per-step neighborhood,
and the common SPH operators (density, artificial viscosity, cohesion
tension, Akinci boundary terms, rigid-coupling scatter).

Functional counterpart of the reference's `solver_base` class
(solver_base.py:7-245). Where the reference accumulates through Taichi's
`for_all_neighbor(task)` higher-order iterator with atomics, every operator
here is a masked gather over a fixed-K compact neighbor list followed by a
sum over the K axis — race-free and fully fusable by XLA. Scatters into
rigid bodies use deterministic `.at[].add` (segment-sum) instead of atomic
`+=` (cf. wcsph_solver.py:126).

Layout: the neighborhood (`Nbh`) is built ONCE per step (the reference's
reset_grid/update_grid, solver_base.py:139-141) and reused by every pairwise
pass. Fluid state is kept in cell-sorted order (order is physically
irrelevant; sorting keeps every per-pass gather near-diagonal). All vectors
are component-separated `V3`s (ops/vec.py): every pairwise intermediate is a
2-D (N, K) buffer that tiles cleanly on TPU. A trailing-3 layout would be
lane-padded 3 -> 128 on materialization (measured 42x).

Why compact (N, K) lists and not dense masked windows: on this TPU, XLA
gathers of component-separated arrays measure 75-97 G elem/s at 29k rows
(2.6+ T elem/s at 1M) and lax.top_k compaction of (N, 27*cap) candidate
masks costs ~0.03 ms — so a full per-pass pipeline of [gather fields at
(N, K), ~50 VPU flops per slot, masked reduce] runs at worst-case K=~100
slots per query. A dense windowed sweep over contiguous sorted-cell bands
(this repo's round-1 design) costs 23k-31k masked slots per query on the
same scenes — ~99.6% dead work — because a contiguous linear-cell-id band
covering a 27-cell stencil necessarily spans two whole grid planes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu import scene as _scene_mod
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
    # Original (seeding-order) id of the particle in each slot. The state is
    # kept cell-sorted across steps; `oid` gives every particle a stable
    # identity matching the reference's fixed fluid array order — used for
    # order-faithful quirk replication (nbh_viscosity) and stable export.
    oid: jnp.ndarray  # (Nf,) int32


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
    # Max neighbor-capacity overflow observed by the step's own neighborhood:
    # true neighbors beyond the K-list capacity, or cell occupancy beyond
    # cell_cap — the analogue of the reference's 512-entry dynamic-list
    # capacity (ParticleSystem.py:103). Nonzero means pairs were dropped.
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
    v0 = getattr(scene, "fluid_vel0", (0.0, 0.0, 0.0))
    vel0 = (V3.zeros((n,)) if all(c == 0.0 for c in v0)
            else V3(*(jnp.full((n,), c, jnp.float32) for c in v0)))
    return SimState(
        fluid=FluidState(
            pos=scene.fluid_pos0,
            vel=vel0,
            acc=V3.zeros((n,)),
            oid=jnp.arange(n, dtype=jnp.int32),
        ),
        rigid=init_rigid_state(scene),
        dt=jnp.asarray(scene.static.dt0, jnp.float32),
        t=jnp.zeros((), jnp.float32),
        step_count=jnp.zeros((), jnp.int32),
        extra=extra,
    )


# ===========================================================================
# Per-step neighborhood (compact fixed-K lists)
# ===========================================================================

class Nbh(NamedTuple):
    """Per-step neighborhood over the unified dynamic set.

    Built once per step from step-initial positions; all masks (including the
    dist <= h cutoff) are pinned to those positions, exactly like the
    reference's start-of-step grid reuse (solver_base.py:139-141) and this
    repo's PCISPH/PBF predicted-position semantics.

    Index space: [0, N) = fluid in THIS STEP's cell-sorted order;
    [N, N+Nr) = rigid particles in their original order
    (cf. the reference's unified indexer, ParticleSystem.py:496-507).
    """
    pos: V3                      # (N,) sorted fluid positions
    perm: jnp.ndarray            # (N,) prev-state index of each sorted slot
    pos_all: V3                  # (N [+ Nr],) dynamic positions
    idx: jnp.ndarray             # (N, K) neighbor ids into pos_all
    mask: jnp.ndarray            # (N, K) slot valid & dist <= h
    mask_f: jnp.ndarray          # mask & fluid neighbor
    mask_s: jnp.ndarray          # mask & rigid neighbor & fs_couple
    count: jnp.ndarray           # (N,) true neighbor count (can exceed K)
    x: V3                        # (N, K) x_ij = x_i - x_j at build positions
    r: jnp.ndarray               # (N, K) |x_ij|
    rigid_vol: Optional[jnp.ndarray]  # (N, K) V_j of rigid neighbors (else 0)
    # Boundary neighbors (Akinci mode only; indices into the static
    # boundary arrays in their stored order):
    bidx: Optional[jnp.ndarray]  # (N, bK)
    bmask: Optional[jnp.ndarray]
    bx: Optional[V3]
    br: Optional[jnp.ndarray]
    bvol: Optional[jnp.ndarray]  # (N, bK) V_b of boundary neighbors
    overflow: jnp.ndarray        # () int32 — max dropped-pair indicator
    # Grouped-window block plan of the fluid list build (blk, nb_mask,
    # overflow) — reusable by bandmat.build_band when the dynamic set is
    # fluid-only (sorted space == fluid space); None in coupled scenes.
    plan: Optional[tuple] = None


def _cell_overflow(starts: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Max cell occupancy beyond `cap` (candidates silently skipped)."""
    occ = starts[1:] - starts[:-1]
    return jnp.maximum(jnp.max(occ) - cap, 0).astype(jnp.int32)


# List-build engine policy (measured on-chip, breaking_dam_30k hot phase):
# the per-query stencil-prune engine beats the grouped-window engine at
# small N (its top_k runs over k2~480 candidates vs nbcap*128~2300, and
# its 14M-index packed fetch is affordable), while at large N the
# per-query fetch dominates everything (1.3G indices at 1M) and the
# grouped engine's QB x nbcap row fetch + dense pass wins. Tests may
# monkeypatch to force either path. The canonical threshold lives in
# scene.py (build_scene picks band_B by the same cut); this module-level
# alias stays monkeypatchable.
GROUPED_BUILD_MIN_N = _scene_mod.GROUPED_BUILD_MIN_N


def build_nbh(st: SceneStatic, arrays: SceneArrays, fluid_pos: V3,
              rigid_pos: Optional[V3]) -> Nbh:
    """Cell-sort the fluid and build the step's compact neighbor lists (the
    per-step reset_grid/update_grid of the reference, solver_base.py:139-141).

    Rigid particles join the dynamic set at ids [N, N+Nr) only when the body
    is active (reference ParticleSystem.py:399-407).
    """
    n = st.n_fluid
    perm = jnp.argsort(nb.cell_id(fluid_pos, st.grid),
                       stable=True).astype(jnp.int32)
    pos_s = fluid_pos.take(perm)

    with_rigid = st.rigid_active and rigid_pos is not None and st.n_rigid > 0
    if with_rigid:
        pos_all = V3(jnp.concatenate([pos_s.x, rigid_pos.x]),
                     jnp.concatenate([pos_s.y, rigid_pos.y]),
                     jnp.concatenate([pos_s.z, rigid_pos.z]))
    else:
        pos_all = pos_s
    table = nb.build_cell_table(pos_all, st.grid)
    qid = jnp.arange(n, dtype=jnp.int32)
    grouped = st.n_dynamic >= GROUPED_BUILD_MIN_N
    if grouped:
        # Grouped-window engine (large N): the fluid queries are
        # cell-sorted, so the candidate fetch collapses to QB x band_nb
        # block-row indices + one dense distance pass.
        nl, fplan = nb.find_neighbors_grouped(
            pos_s, qid, pos_all, table, st.grid, K=st.K, nbcap=st.band_nb,
            B=st.band_B, exclude_self=True)
        extra_overflow = jnp.zeros((), jnp.int32)
    else:
        nl = nb.find_neighbors(pos_s, qid, pos_all, table, st.grid,
                               K=st.K, cell_cap=st.cell_cap,
                               exclude_self=True, k2=st.k2)
        fplan = None
        extra_overflow = _cell_overflow(table.starts, st.cell_cap)

    mask = nl.mask
    mask_f = mask & (nl.idx < n)
    if with_rigid and st.fs_couple:
        mask_s = mask & (nl.idx >= n)
    else:
        mask_s = jnp.zeros_like(mask)
    # Neighbor positions come back from the list build (nl.spos) — no
    # re-gather. Values at masked slots are arbitrary; consumers mask.
    x = pos_s.expand(1) - nl.spos
    r = x.norm()
    rigid_vol = None
    if with_rigid and st.fs_couple:
        rigid_vol = arrays.rigid_volume[rigid_lid(st, nl.idx)]

    # Loss channels counted per engine: K always; cell_cap for the
    # per-query engine; the block-plan capacity for the grouped engine
    # (both arrive via nl.dropped / extra_overflow).
    overflow = jnp.maximum(jnp.max(nl.count) - st.K, 0).astype(jnp.int32)
    overflow = jnp.maximum(overflow, nl.dropped)
    overflow = jnp.maximum(overflow, extra_overflow)

    bidx = bmask = bx = br = bvol = None
    if st.akinci:
        if grouped:
            bl, _ = nb.find_neighbors_grouped(
                pos_s, None, arrays.boundary_pos, arrays.boundary_table,
                st.grid, K=st.bK, nbcap=st.bband_nb, B=st.band_B)
        else:
            bl = nb.find_neighbors(pos_s, None, arrays.boundary_pos,
                                   arrays.boundary_table, st.grid,
                                   K=st.bK, cell_cap=st.bcell_cap,
                                   k2=st.bk2)
        bidx, bmask = bl.idx, bl.mask
        bx = pos_s.expand(1) - bl.spos
        br = bx.norm()
        bvol = arrays.boundary_volume[bidx]
        overflow = jnp.maximum(overflow, jnp.max(bl.count) - st.bK)
        overflow = jnp.maximum(overflow, bl.dropped)

    return Nbh(pos=pos_s, perm=perm, pos_all=pos_all, idx=nl.idx, mask=mask,
               mask_f=mask_f, mask_s=mask_s, count=nl.count, x=x, r=r,
               rigid_vol=rigid_vol, bidx=bidx, bmask=bmask, bx=bx, br=br,
               bvol=bvol, overflow=overflow,
               plan=None if with_rigid else fplan)


class DensePrep(NamedTuple):
    """Shared plumbing of the dense-window (no compact fluid list) solver
    paths: cell sort + CSR offsets + block plan, plus the Akinci boundary
    sums from the GROUP-SPARSE dense boundary pass (no compact (N, bK)
    boundary list either — bandmat.dense_boundary_terms). Fluid-only
    scenes."""
    pos: V3                    # sorted fluid positions
    perm: jnp.ndarray          # (N,) prev-state index per sorted slot
    starts: jnp.ndarray        # (num_cells + 1,) CSR offsets
    plan: tuple                # (blk, nb_mask, overflow) block plan
    bterms: Optional[object]   # bandmat.DenseBoundaryTerms (None: clamp)
    bwin: Optional[object]     # bandmat.BoundaryWindows (None: clamp) —
    #                            reused by PCISPH's predicted-rho closure
    overflow: jnp.ndarray      # () int32 — plan + boundary overflow
    qcells: Optional[jnp.ndarray] = None  # (QB, B) sorted member cell ids
    #                            (feeds the rigid-dense near-group test)
    extras: tuple = ()         # caller-supplied (N,) arrays co-sorted by
    #                            the ONE variadic sort (see sort_by_cells)


def sort_by_cells(grid, fluid_pos: V3, extras: tuple = ()):
    """ONE variadic stable sort keyed on the cell ids, carrying the
    positions (and any caller extras — velocities, warm-start fields,
    original ids ...) as payloads. Identical permutation/values to
    `argsort(cid, stable=True)` + per-array gathers, but at 1M on the
    chip the element gathers cost ~19 ms PER LANE while the whole
    10-operand sort is ~6 ms (tools/perf_r5_prep3.py: take3 56 ms,
    vsort10 5.7 ms) — TPU gathers are the expensive primitive, sorts
    are not. Returns (scid, perm, pos_s, sorted_extras)."""
    cid = nb.cell_id(fluid_pos, grid)
    iota = jnp.arange(cid.shape[0], dtype=jnp.int32)
    out = jax.lax.sort((cid, iota) + fluid_pos.astuple() + tuple(extras),
                       dimension=0, is_stable=True, num_keys=1)
    return (out[0], out[1], V3(out[2], out[3], out[4]), tuple(out[5:]))


def build_dense_prep(st: SceneStatic, arrays: SceneArrays, fluid_pos: V3,
                     nbcap: int, B: int, want_bterms: bool = True,
                     extras: tuple = ()) -> DensePrep:
    """Sort the fluid, then `dense_prep_sorted` (which derives CSR offsets
    + the CSR block plan directly — no second argsort, no compact fluid
    list — and computes the Akinci boundary sums via the group-sparse
    dense pass, no compact boundary list either). The fused dense passes
    (ops/bandmat.build_band_terms / dense_dfsph_terms / dense_rho_count /
    dense_wcsph_forces / dense_viscosity) run over the returned plan.

    `extras`: per-particle (N,) arrays the caller needs in sorted order —
    co-sorted by the one variadic sort (sort_by_cells) instead of
    gathered by perm afterwards."""
    scid, perm, pos_s, sorted_extras = sort_by_cells(st.grid, fluid_pos,
                                                     extras)
    dp = dense_prep_sorted(st, arrays, pos_s, scid, nbcap, B,
                           want_bterms=want_bterms, perm=perm)
    return dp._replace(extras=sorted_extras)


def dense_prep_sorted(st: SceneStatic, arrays: SceneArrays, pos_s: V3,
                      scid: jnp.ndarray, nbcap: int, B: int,
                      want_bterms: bool = True, perm=None) -> DensePrep:
    """`build_dense_prep` on an ALREADY cell-sorted fluid set — the entry
    point of the SHARDED dense path (parallel/domain), whose scaffold has
    sorted the local+halo set itself (it needs the sort bookkeeping for
    the per-iteration exchanges). Invalid slots must carry cell id
    >= num_cells (they sort to the tail, beyond every CSR window) and a
    far-field sentinel position (straddling blocks at the valid/invalid
    boundary ARE covered by real plans — the sentinel keeps such slots
    out of every r2 <= h^2 pair test). `st.n_fluid` is the (static)
    sorted-set length; overflow is counted on every capacity as usual."""
    n = st.n_fluid
    # method="sort": the queries (arange) are already sorted, so one
    # concat-sort beats the default per-query binary-search gathers
    # (measured inside the 1M one-shot attribution).
    starts = jnp.searchsorted(
        scid, jnp.arange(st.grid.num_cells + 1, dtype=jnp.int32),
        side="left", method="sort").astype(jnp.int32)

    from cfd_taichi_tpu.ops import bandmat
    QB = -(-n // B)
    # Invalid-tail query members claim the LAST VALID slot's cell for the
    # plan stencil (plan_from_csr needs in-grid ids, and a far-away cell
    # — e.g. the grid's last — would drag its 27-stencil into the
    # straddle group's interval union and blow the plan capacity); their
    # sentinel positions keep the resulting junk rows inert. All-valid
    # sets (the single-chip path) are untouched bit-for-bit: mode="edge"
    # already pads with a valid cell id there.
    pad = jnp.pad(scid, (0, QB * B - n), mode="edge")
    last_valid = jnp.maximum(
        jnp.max(jnp.where(scid < st.grid.num_cells, scid, -1)), 0)
    qcells = jnp.where(pad >= st.grid.num_cells, last_valid,
                       pad).reshape(QB, B)
    plan = bandmat.plan_from_csr(qcells, starts, st.grid, nbcap)
    overflow = plan[2]

    bterms = bwin = None
    if st.akinci:
        bwin = bandmat.build_boundary_windows(
            qcells, arrays.boundary_pos, arrays.boundary_volume,
            arrays.boundary_table, st.grid, nbcap=st.bband_nb,
            cap=min(st.bq_cap, QB))
        overflow = jnp.maximum(overflow, bwin.overflow)
        if want_bterms:
            # The cubic one-shot sums (rho/S/Q/g2) — PBF uses its own
            # poly6/spiky boundary pass over `bwin` instead.
            bterms = bandmat.dense_boundary_terms(
                pos_s, qcells, arrays.boundary_pos, arrays.boundary_volume,
                arrays.boundary_table, st.grid, h=st.h,
                rho0=float(RHO_0), nbcap=st.bband_nb, B=B, cap=st.bq_cap,
                bw=bwin)
    return DensePrep(pos=pos_s, perm=perm, starts=starts, plan=plan,
                     bterms=bterms, bwin=bwin, overflow=overflow,
                     qcells=qcells)


def sentinel_positions(st: SceneStatic, pos: V3, valid: jnp.ndarray) -> V3:
    """Replace invalid rows' positions with STAGGERED far-field sentinels
    (outside every grid cell, spread 4h apart so no two sentinels pair
    with each other either — a shared point would make r ~ 0 'pairs'
    whose kernel coefficients can overflow). Used by the sharded dense
    path, whose local slot arrays interleave stale/unoccupied rows."""
    slot = jnp.arange(pos.x.shape[0], dtype=jnp.int32).astype(jnp.float32)
    fx = jnp.float32(st.box_max[0] + 1e3 * st.h) + slot * (4.0 * st.h)
    far = jnp.float32(st.box_max[1] + 1e3 * st.h)
    return V3(jnp.where(valid, pos.x, fx),
              jnp.where(valid, pos.y, far),
              jnp.where(valid, pos.z, far))


def rigid_lid(st: SceneStatic, j: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-set ids -> rigid-local ids (clipped safe under masks)."""
    hi = max(st.n_rigid - 1, 0)
    return jnp.clip(j - st.n_fluid, 0, hi)


def jf(st: SceneStatic, nbh: Nbh, arr: jnp.ndarray) -> jnp.ndarray:
    """Gather a per-fluid (sorted-order) array at the neighbor slots:
    (N,) -> (N, K). Rigid slots read a clipped junk value — every consumer
    applies mask_f. Prefer `jf_pack` when a pass needs several fields:
    single-element gathers measure ~190M indices/s on TPU while short-row
    gathers do ~1G indices/s."""
    return arr[jnp.minimum(nbh.idx, st.n_fluid - 1)]


def jf_pack(st: SceneStatic, nbh: Nbh, *fields: jnp.ndarray):
    """Gather several per-fluid (sorted-order) scalar fields at the neighbor
    slots with ONE packed gather: stack (F, N), gather (F, N, K), return
    per-field (N, K) views. ~5x cheaper per index than F separate gathers
    (measured on-chip with scalar-synced timing). The (F, N) layout keeps
    the minormost output dim K on lanes — a (N*K, F) row layout would be
    lane-padded F -> 128 (32x memory) if materialized."""
    tbl = jnp.stack(fields, axis=0)
    rows = tbl[:, jnp.minimum(nbh.idx, st.n_fluid - 1)]
    return tuple(rows[i] for i in range(len(fields)))


def jall_pack(nbh: Nbh, *fields: jnp.ndarray):
    """Like `jf_pack` for dynamic-set-sized fields ((N+Nr,) arrays indexed
    directly by nbh.idx)."""
    tbl = jnp.stack(fields, axis=0)
    rows = tbl[:, nbh.idx]
    return tuple(rows[i] for i in range(len(fields)))


def jb_pack(nbh: Nbh, *fields: jnp.ndarray):
    """Like `jf_pack` for boundary-set fields ((Nb,) arrays indexed by
    nbh.bidx)."""
    tbl = jnp.stack(fields, axis=0)
    rows = tbl[:, nbh.bidx]
    return tuple(rows[i] for i in range(len(fields)))


def jf_v3(st: SceneStatic, nbh: Nbh, v: V3) -> V3:
    return V3(*jf_pack(st, nbh, v.x, v.y, v.z))


def msum(term: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked sum over the neighbor axis: (N, K) -> (N,)."""
    return jnp.sum(jnp.where(mask, term, 0.0), axis=1)


def sum_vec(x: V3, scale: jnp.ndarray) -> V3:
    """Reduce scale * x over the neighbor axis -> V3 of (N,). `scale` must
    already be masked (zero where invalid)."""
    return V3(jnp.sum(x.x * scale, axis=1), jnp.sum(x.y * scale, axis=1),
              jnp.sum(x.z * scale, axis=1))


def unsort(nbh: Nbh, arr: jnp.ndarray) -> jnp.ndarray:
    """Sorted-order per-fluid array -> previous-state order."""
    return jnp.zeros_like(arr).at[nbh.perm].set(arr)


# ---------------------------------------------------------------------------
# Shared SPH operators (all in sorted fluid order)
# ---------------------------------------------------------------------------

def nbh_rho(st: SceneStatic, nbh: Nbh) -> jnp.ndarray:
    """Density: rho_i = 0.001 + sum_f m W + [solid] sum_s V_j rho0 W
    + [Akinci] rho0 * sum_b V_b W  (reference solver_base.py:41-72)."""
    w = sm.cubic_w(nbh.r, st.h)
    rho = DENSITY_EPS + st.particle_m * msum(w, nbh.mask_f)
    if nbh.rigid_vol is not None:
        rho = rho + RHO_0 * msum(nbh.rigid_vol * w, nbh.mask_s)
    if nbh.bidx is not None:
        wb = sm.cubic_w(nbh.br, st.h)
        rho = rho + RHO_0 * msum(nbh.bvol * wb, nbh.bmask)
    return rho


def rigid_contact_vel(st: SceneStatic, rigid: RigidBodyState, dt,
                      include_alpha: bool, include_acc: bool = True) -> V3:
    """Per-rigid-particle contact velocity v + a dt + (omega [+ alpha dt]) x
    (x_j - centroid) (reference dfsph_solver.py:163-170, 288-294,
    iisph_solver.py:325-334). Returns components (Nr,)."""
    rel = V3(rigid.pos.x - rigid.centroid[0],
             rigid.pos.y - rigid.centroid[1],
             rigid.pos.z - rigid.centroid[2])
    om = rigid.omega + (rigid.alpha * dt if include_alpha else 0.0)
    lin = rigid.vel + (rigid.acc * dt if include_acc else 0.0)
    spin = V3(om[0], om[1], om[2]).cross(rel)
    return V3(lin[0] + spin.x, lin[1] + spin.y, lin[2] + spin.z)


def nbh_viscosity(st: SceneStatic, nbh: Nbh, vel: V3, rho: jnp.ndarray,
                  rigid: RigidBodyState, c_s: float, alpha: float,
                  eps: float = 0.01,
                  oid: Optional[jnp.ndarray] = None,
                  rho_quirk_tbl: Optional[jnp.ndarray] = None) -> V3:
    """Monaghan artificial viscosity, applied only under compression
    (shear < 0); solid neighbors use V_j rho0 in place of m and the body
    linear velocity (reference solver_base.py:170-202, rigid_solver.py:97).
    Returns the per-particle term already scaled by particle_m
    (solve_all_viscosity's trailing multiply, solver_base.py:175)."""
    gcoef = sm.cubic_grad_coeff(nbh.r, st.h)
    q2e = nbh.r * nbh.r + eps * st.h * st.h
    nu_num = 2.0 * alpha * st.h * c_s

    vjx, vjy, vjz, rho_j = jf_pack(st, nbh, vel.x, vel.y, vel.z, rho)
    v_ij = vel.expand(1) - V3(vjx, vjy, vjz)
    shear = v_ij.dot(nbh.x)
    pi = -(nu_num / (rho[:, None] + rho_j)) * shear / q2e
    scale = jnp.where(nbh.mask_f & (shear < 0.0),
                      -st.particle_m * pi * gcoef, 0.0)
    if nbh.rigid_vol is not None:
        # Rigid neighbors carry the body linear velocity (rigid_solver.py:97).
        v_ij_s = V3(vel.x[:, None] - rigid.vel[0],
                    vel.y[:, None] - rigid.vel[1],
                    vel.z[:, None] - rigid.vel[2])
        shear_s = v_ij_s.dot(nbh.x)
        # Reference quirk: rho of a solid neighbor is read from the *fluid*
        # rho field at the rigid-local index (solver_base.py:187,199) — an
        # unrelated fluid particle's density. The reference's rho lives in
        # the fixed seeding order; ours is cell-sorted, so scatter back to
        # seeding order via the persistent `oid` identity so the SAME
        # arbitrary particle is read every step, exactly like the reference.
        # (Without oid, `unsort` only restores the previous step's order,
        # which drifts — kept as a fallback for oid-less callers.)
        # `rho_quirk_tbl` short-circuits both: a caller-supplied table of
        # rho at seeding-order slots [0, len(tbl)) — the sharded path
        # psums it across shards (parallel/domain) because no single shard
        # holds all of seeding-order rho.
        if rho_quirk_tbl is not None:
            qi = jnp.clip(rigid_lid(st, nbh.idx), 0,
                          rho_quirk_tbl.shape[0] - 1)
            rho_quirk = rho_quirk_tbl[qi]
        else:
            if oid is not None:
                rho_orig = jnp.zeros_like(rho).at[oid].set(rho)
            else:
                rho_orig = unsort(nbh, rho)
            rho_quirk = rho_orig[jnp.clip(rigid_lid(st, nbh.idx), 0,
                                          st.n_fluid - 1)]
        pi_s = -(nu_num / (rho[:, None] + rho_quirk)) * shear_s / q2e
        scale = scale + jnp.where(nbh.mask_s & (shear_s < 0.0),
                                  -RHO_0 * nbh.rigid_vol * pi_s * gcoef, 0.0)
    return st.particle_m * sum_vec(nbh.x, scale)


def nbh_tension(st: SceneStatic, nbh: Nbh, tension_k: float) -> V3:
    """Simple cohesion: -k * m * W * x_ij, fluid-fluid only
    (reference solver_base.py:204-217)."""
    w = sm.cubic_w(nbh.r, st.h)
    scale = jnp.where(nbh.mask & (nbh.idx < st.n_fluid), -tension_k * w, 0.0)
    return st.particle_m * sum_vec(nbh.x, scale)


def nbh_boundary_pressure_acc(st: SceneStatic, nbh: Nbh, p_i, rho_i) -> V3:
    """Akinci boundary pressure acceleration: -sum_b V_b p_i/rho_i^2 gradW
    (reference wcsph_solver.py:92-100, pcisph_solver.py:190-198). The caller
    scales by rho0 (and particle_m where the reference does)."""
    gcoef = sm.cubic_grad_coeff(nbh.br, st.h)
    coeff = -nbh.bvol * (p_i / (rho_i * rho_i))[:, None] * gcoef
    return sum_vec(nbh.bx, jnp.where(nbh.bmask, coeff, 0.0))


def nbh_scatter_rigid_force(st: SceneStatic, nbh: Nbh, contrib: V3,
                            mask_s: jnp.ndarray, force: V3) -> V3:
    """Accumulate per-pair force contributions onto rigid particles (in
    their original order). Deterministic segment-sum replacement for the
    reference's atomic `rigid_particles[j].force += ...`
    (wcsph_solver.py:126, pcisph_solver.py:186, iisph_solver.py:159,
    dfsph_solver.py:212)."""
    if not (st.rigid_active and st.fs_couple and st.n_rigid > 0):
        return force
    lid = rigid_lid(st, nbh.idx).reshape(-1)
    c = contrib.where(mask_s)
    return V3(force.x.at[lid].add(c.x.reshape(-1)),
              force.y.at[lid].add(c.y.reshape(-1)),
              force.z.at[lid].add(c.z.reshape(-1)))


def clamp_to_box(st: SceneStatic, pos: V3, vel: V3, margin: float,
                 decay_mul: float):
    """Clamp-mode boundary handling: project positions to the padded box and
    scale the offending velocity component (reference wcsph_solver.py:54-63
    with margin=diameter, decay -0.5; other solvers use margin=radius)."""
    out_p = []
    hits = []
    for c, (lo_c, hi_c) in zip(
            (pos.x, pos.y, pos.z),
            zip(st.box_min, st.box_max)):
        lo = jnp.float32(lo_c + margin)
        hi = jnp.float32(hi_c - margin)
        out_p.append(jnp.clip(c, lo, hi))
        hits.append((c <= lo) | (c >= hi))
    new_pos = V3(*out_p)
    new_vel = V3(jnp.where(hits[0], vel.x * decay_mul, vel.x),
                 jnp.where(hits[1], vel.y * decay_mul, vel.y),
                 jnp.where(hits[2], vel.z * decay_mul, vel.z))
    return new_pos, new_vel


def gravity_acc(st: SceneStatic) -> V3:
    """a = g * (0, -1, 0) (reference solver_base.py:131-134), broadcastable."""
    return V3(jnp.float32(0.0), jnp.float32(-st.gravity), jnp.float32(0.0))
