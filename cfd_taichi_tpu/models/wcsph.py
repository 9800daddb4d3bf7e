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
solver with a closed-form pressure). All pair math is component-separated
(V3) so intermediates tile cleanly on TPU.
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


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    fluid, rigid, dt = state.fluid, state.rigid, state.dt

    # Sort fluid by cell; all per-fluid math below runs in sorted order and
    # the returned state stays sorted (order is physically irrelevant).
    ctx = base.build_ctx(st, arrays, fluid.pos, rigid.pos)
    pos = ctx.pos
    vel = base.lift_v3(ctx, fluid.vel)

    # --- pressure phase (reference wcsph_solver.py:32-38) -------------------
    rho = base.ctx_rho(st, ctx)
    p = tait_pressure(rho)
    p_over_rho2 = p / (rho * rho)

    x_ij, r, mask = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
    gcoef = sm.cubic_grad_coeff(r, st.h)
    sym = base.q_form(ctx, p_over_rho2) + base.w_form_fluid(st, ctx, p_over_rho2)
    scale = jnp.where(mask, -st.particle_m * sym * gcoef, 0.0)
    pressure_acc = base.sweep_sum_vec(x_ij, scale, st.nq)

    force = rigid.force
    if ctx.r is not None and st.fs_couple:
        x_r, rr, mask_r = base.pair_geom(st, ctx, ctx.r, exclude_self=False)
        gc_r = sm.cubic_grad_coeff(rr, st.h)
        s_scale = jnp.where(
            mask_r,
            -ctx.rigid_vol_w[:, None, :] * base.q_form(ctx, p_over_rho2)
            * RHO_0 * gc_r, 0.0)
        pressure_acc = pressure_acc + base.sweep_sum_vec(x_r, s_scale,
                                                         st.nq)
        # Reaction on the rigid body: += -term * m (wcsph_solver.py:126).
        force = base.ctx_scatter_rigid_force(
            st, ctx, x_r * (-s_scale * st.particle_m), mask_r, force)

    viscosity = base.ctx_viscosity(st, ctx, vel, rho, rigid,
                                   c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    tension = base.ctx_tension(st, ctx, TENSION_K)

    # --- kinematic phase (reference wcsph_solver.py:40-63) ------------------
    acc = base.gravity_acc(st) + pressure_acc + viscosity + tension
    if st.akinci:
        acc = acc + RHO_0 * base.ctx_boundary_pressure_acc(st, ctx, p, rho)
    new_vel = (vel + acc * dt) * WCSPH_DAMPING
    new_pos = pos + new_vel * dt
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(
            st, new_pos, new_vel, margin=2.0 * st.particle_radius,
            decay_mul=-base.V_DECAY)

    return state._replace(
        overflow=ctx.overflow,
        fluid=base.FluidState(pos=base.compact_v3(ctx, new_pos),
                              vel=base.compact_v3(ctx, new_vel),
                              acc=base.compact_v3(ctx, acc)),
        rigid=rigid._replace(force=force),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )


def density_error(st: SceneStatic, arrays: SceneArrays, state: base.SimState):
    """Average |rho - rho0| / rho0 telemetry (parity metric, SURVEY.md §6)."""
    ctx = base.build_ctx(st, arrays, state.fluid.pos, state.rigid.pos)
    rho = base.compact(ctx, base.ctx_rho(st, ctx))
    return jnp.mean(jnp.abs(rho - RHO_0)) / RHO_0
