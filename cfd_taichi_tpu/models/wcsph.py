"""WCSPH — weakly compressible SPH with Tait equation of state.

Functional parity with the reference `wcsph_solver` (wcsph_solver.py:1-144):
  * Tait EOS p = B((rho/rho0)^gamma - 1), gamma=7, B=70000, negative pressure
    clamped via rho <- max(rho, rho0)                (wcsph_solver.py:21-22,86-90)
  * symmetric pressure gradient -m (p_i/rho_i^2 + p_j/rho_j^2) gradW
    with solid-coupling term and rigid force scatter (wcsph_solver.py:102-129)
  * Akinci boundary acceleration                     (wcsph_solver.py:92-100)
  * Monaghan viscosity (c_s=10) + cohesion (k=0.2)   (wcsph_solver.py:17-20)
  * semi-implicit Euler with 0.9998 damping, clamp-boundary fallback at
    diameter margin with -0.5 velocity decay         (wcsph_solver.py:49-63)

One fused pressure phase + kinematic phase; no iteration loop (the only
solver with a closed-form pressure). All pair math runs on the step's
compact (N, K) neighbor lists (models/base.Nbh).
"""

from __future__ import annotations

import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.scene import RHO_0, Scene, SceneArrays, SceneStatic

GAMMA = 7.0
B_STIFF = 70000.0
VISCOSITY_C_S = 10.0
VISCOSITY_ALPHA = 0.08
TENSION_K = 0.2
WCSPH_DAMPING = 0.9998  # wcsph_solver.py:51


def init_state(scene: Scene) -> base.SimState:
    return base.init_sim_state(scene, extra=())


def tait_pressure(rho: jnp.ndarray) -> jnp.ndarray:
    rho_c = jnp.maximum(rho, RHO_0)
    return B_STIFF * ((rho_c / RHO_0) ** GAMMA - 1.0)


# Dense-window mode (fluid-only scenes): the whole pressure phase is two
# fused dense passes over the CSR block plan — no compact (N, K) fluid
# list is built (ops/bandmat.dense_rho_count / dense_wcsph_forces; both
# chunked, so the same path serves 30k and 1M).
DENSE_FLUID = True


def dense_eligible(st: SceneStatic) -> bool:
    """Rigid-coupled scenes go dense too (VERDICT r03 item 4): the
    fluid-solid terms ride the group-sparse rigid windows + rigid-side
    reaction list (ops/rigid_dense), sized by scene.rq_cap."""
    return DENSE_FLUID and (st.rq_cap > 0
                            or not (st.rigid_active and st.n_rigid > 0))


def _step_dense(st: SceneStatic, arrays: SceneArrays,
                state: base.SimState) -> base.SimState:
    from cfd_taichi_tpu.ops import bandmat
    from cfd_taichi_tpu.ops import rigid_dense

    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    has_rigid = st.rigid_active and st.n_rigid > 0
    # Wide CSR cover for the one-shot rho pass, then a pair-tight plan
    # for the force pass (bandmat.compact_plan docstring: the CSR
    # cover's fragmentation is not physics-bounded; pair content is).
    # vel/oid ride the variadic cell sort as payloads
    # (base.sort_by_cells — element gathers are the slow primitive).
    dp = base.build_dense_prep(
        st, arrays, fluid.pos, st.band_nb_wide, st.band_B,
        extras=fluid.vel.astuple() + (fluid.oid,))
    pos = dp.pos
    (vx_s, vy_s, vz_s, oid) = dp.extras
    vel = base.V3(vx_s, vy_s, vz_s)

    # --- pressure phase (reference wcsph_solver.py:32-38) -------------------
    # Split-bucket wide pass at large N (models/dfsph.build_dense_engine
    # rationale); plain full-width pass otherwise.
    if st.coef_nbA and st.coef_nbA < st.band_nb_wide:
        rho_f, _, blk_pair, wide_over = bandmat.dense_rho_count_split(
            pos, h=st.h, m=st.particle_m, plan=dp.plan, B=st.band_B,
            nbA=st.coef_nbA, capB=st.coef_capB)
    else:
        rho_f, _, blk_pair = bandmat.dense_rho_count(
            pos, h=st.h, m=st.particle_m, plan=dp.plan, B=st.band_B)
        wide_over = jnp.zeros((), jnp.int32)
    # pair_nb_q: the band_B-width tight capacity (pair_nb sizes the
    # narrower loop_B plans in the large-N split-width mode).
    plan = bandmat.compact_plan(dp.plan, blk_pair,
                                st.pair_nb_q or st.pair_nb)
    overflow = jnp.maximum(jnp.maximum(dp.overflow, plan[2]), wide_over)
    rho = base.DENSITY_EPS + rho_f
    if st.akinci:
        rho = rho + dp.bterms.rho
    if has_rigid:
        rw = rigid_dense.build_rigid_windows(
            st, pos, dp.qcells, rigid.pos, arrays.rigid_volume,
            cap=st.rq_cap)
        rt = rigid_dense.rigid_terms(st, rw, float(RHO_0), st.n_fluid)
        rho = rho + rt.rho
        overflow = jnp.maximum(overflow, rw.overflow)
    p = tait_pressure(rho)
    p_over_rho2 = p / (rho * rho)

    acc = base.gravity_acc(st) + bandmat.dense_wcsph_forces(
        pos, vel, rho, p_over_rho2, h=st.h, m=st.particle_m, plan=plan,
        B=st.band_B, c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA,
        tension_k=TENSION_K)
    if st.akinci:
        # Boundary pressure acc RHO_0 Sigma_b (-V_b p'_i gc) x_ib is the
        # per-query scalar -p'_i times the dense boundary row sum
        # (bterms.s = Sigma_b rho0 V_b gc x_ib) — no (N, bK) list needed
        # (reference wcsph_solver.py:92-100).
        acc = acc - dp.bterms.s * p_over_rho2
    rigid_force = rigid.force
    if has_rigid:
        # Solid pressure branch -Sigma_s V_j rho0 p'_i gradW is -p'_i
        # times the solid row sum (accel_of's s_scale term-for-term);
        # solid viscosity incl. the rho-quirk read; reaction charged
        # once per fluid-rigid pair from the rigid side
        # (wcsph_solver.py:117-129).
        acc = acc - rt.s * p_over_rho2
        rho_orig = jnp.zeros_like(rho).at[oid].set(rho)
        rho_quirk = rho_orig[jnp.clip(
            jnp.arange(st.n_rigid, dtype=jnp.int32), 0, st.n_fluid - 1)]
        acc = acc + rigid_dense.viscosity_op(
            st, rw, float(RHO_0), st.n_fluid, VISCOSITY_C_S,
            VISCOSITY_ALPHA)(vel, rho, rho_quirk, rigid.vel)
        if st.fs_couple:
            rs = rigid_dense.build_rigid_side(
                st, rigid.pos, arrays.rigid_volume, pos, dp.starts,
                float(RHO_0), Kf=st.K)
            overflow = jnp.maximum(overflow, rs.overflow)
            rigid_force = rigid_dense.rigid_side_force(
                rs, p_over_rho2 * jnp.float32(st.particle_m), rho,
                rigid_force)

    # --- kinematic phase (reference wcsph_solver.py:40-63) ------------------
    new_vel = (vel + acc * dt) * WCSPH_DAMPING
    new_pos = pos + new_vel * dt
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(
            st, new_pos, new_vel, margin=2.0 * st.particle_radius,
            decay_mul=-base.V_DECAY)

    return state._replace(
        overflow=overflow,
        fluid=base.FluidState(pos=new_pos, vel=new_vel, acc=acc, oid=oid),
        rigid=rigid._replace(force=rigid_force),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )


def accel_of(st: SceneStatic, nbh, vel, rho, rigid, rigid_force,
             oid=None, scatter_mask=None, rho_quirk_tbl=None):
    """The full WCSPH pressure-phase acceleration over one Nbh (gravity +
    symmetric Tait pressure gradient + Monaghan viscosity + cohesion +
    Akinci boundary acc), plus the updated rigid reaction force — defined
    ONCE for the single-chip compact step and the sharded scaffold callback
    (parallel/domain._wcsph_physics) so the two cannot drift (reference
    wcsph_solver.py:32-38,65-129). `scatter_mask`/`rho_quirk_tbl`: sharded
    coupled mode (owned-row scatter; psum'd seeding-order rho table for
    the solid-viscosity quirk read)."""
    p = tait_pressure(rho)
    p_over_rho2 = p / (rho * rho)

    gcoef = sm.cubic_grad_coeff(nbh.r, st.h)
    # 4-lane packed gather with distinct riders: the single-lane gather
    # emitter is ~5x slower per index (models/base.jf_pack note).
    p_j, _, _, _ = base.jf_pack(st, nbh, p_over_rho2, rho, p,
                                p_over_rho2 * rho)
    sym = p_over_rho2[:, None] + p_j
    scale = jnp.where(nbh.mask_f, -st.particle_m * sym * gcoef, 0.0)

    if nbh.rigid_vol is not None:
        s_scale = jnp.where(
            nbh.mask_s,
            -nbh.rigid_vol * p_over_rho2[:, None] * RHO_0 * gcoef, 0.0)
        scale = scale + s_scale
        # Reaction on the rigid body: += -term * m (wcsph_solver.py:126).
        rigid_force = base.nbh_scatter_rigid_force(
            st, nbh, nbh.x * (-s_scale * st.particle_m),
            nbh.mask_s if scatter_mask is None else scatter_mask,
            rigid_force)
    pressure_acc = base.sum_vec(nbh.x, scale)

    viscosity = base.nbh_viscosity(st, nbh, vel, rho, rigid,
                                   c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA,
                                   oid=oid, rho_quirk_tbl=rho_quirk_tbl)
    tension = base.nbh_tension(st, nbh, TENSION_K)

    acc = base.gravity_acc(st) + pressure_acc + viscosity + tension
    if st.akinci:
        acc = acc + RHO_0 * base.nbh_boundary_pressure_acc(st, nbh, p, rho)
    return acc, rigid_force


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    if dense_eligible(st):
        return _step_dense(st, arrays, state)
    fluid, rigid, dt = state.fluid, state.rigid, state.dt

    # Sort fluid by cell; all per-fluid math below runs in sorted order and
    # the returned state stays sorted (order is physically irrelevant).
    nbh = base.build_nbh(st, arrays, fluid.pos, rigid.pos)
    pos = nbh.pos
    vel = fluid.vel.take(nbh.perm)
    oid = fluid.oid[nbh.perm]

    # --- pressure phase (reference wcsph_solver.py:32-38) -------------------
    rho = base.nbh_rho(st, nbh)
    acc, force = accel_of(st, nbh, vel, rho, rigid, rigid.force, oid=oid)

    # --- kinematic phase (reference wcsph_solver.py:40-63) ------------------
    new_vel = (vel + acc * dt) * WCSPH_DAMPING
    new_pos = pos + new_vel * dt
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(
            st, new_pos, new_vel, margin=2.0 * st.particle_radius,
            decay_mul=-base.V_DECAY)

    return state._replace(
        overflow=nbh.overflow,
        fluid=base.FluidState(pos=new_pos, vel=new_vel, acc=acc, oid=oid),
        rigid=rigid._replace(force=force),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )


def density_error(st: SceneStatic, arrays: SceneArrays, state: base.SimState):
    """Average |rho - rho0| / rho0 telemetry (parity metric, SURVEY.md §6)."""
    nbh = base.build_nbh(st, arrays, state.fluid.pos, state.rigid.pos)
    rho = base.nbh_rho(st, nbh)
    return jnp.mean(jnp.abs(rho - RHO_0)) / RHO_0
