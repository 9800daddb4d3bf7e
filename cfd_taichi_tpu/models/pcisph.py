"""PCISPH — predictive-corrective incompressible SPH.

Functional parity with the reference `pcisph_solver` (pcisph_solver.py:1-241):
  * precomputed stiffness delta from the densest-neighborhood particle at
    init, beta = 2 dt^2 m^2 / rho0^2       (pcisph_solver.py:23,28-45)
  * per step: external force (gravity + tension + viscosity), then a
    predict/correct loop: predict v,x -> predict rho over predicted
    positions -> p += delta * rho_err (clamped >= 0) -> pressure force
    (pcisph_solver.py:47-119)
  * convergence: average positive density error < 0.1% rho0, 1..80
    iterations                              (pcisph_solver.py:19-21,56)
  * rigid coupling force accumulates across loop iterations
    (pcisph_solver.py:178-188 — the reference never zeroes it in-loop)
  * integration with 0.9999 damping + clamp fallback at radius margin
    (pcisph_solver.py:200-217)

The reference's host-driven iteration with a kernel-scalar sync per
residual (pcisph_solver.py:54-70,122-133) becomes a single on-device
`lax.while_loop` over windowed pair sweeps (ops/pairwise.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu.scene import RHO_0, Scene, SceneArrays, SceneStatic

RHO_MAX_ERR_PERCENT = 0.1   # pcisph_solver.py:19
MIN_ITER = 1
MAX_ITER = 80
VISCOSITY_C_S = 13.0        # solver_base defaults (solver_base.py:24-26)
VISCOSITY_ALPHA = 0.08
TENSION_K = 0.5


def init_state(scene: Scene) -> base.SimState:
    """Compute the scalar stiffness delta once at init from the particle with
    the densest neighborhood (pcisph_solver.py:28-45)."""
    from cfd_taichi_tpu.ops import neighbors as nb

    st, arrays = scene.static, scene.arrays
    rigid_pos = scene.rigid.pos if scene.rigid is not None else None
    nh = base.build_neighborhood(st, arrays, scene.fluid_pos0, rigid_pos)
    dense_i = jnp.argmax(nh.nbr.count)
    j = nh.nbr.idx[dense_i]
    mask = nh.nbr.mask[dense_i]
    rvec = scene.fluid_pos0.take(dense_i).expand(0) - nh.pos_all.take(j)
    gcoef = jnp.where(mask, sm.cubic_grad_coeff(rvec.norm(), st.h), 0.0)
    gradw = rvec * gcoef
    grad_sum = gradw.sum(axis=0)
    grad_sq_sum = jnp.sum(gradw.dot(gradw))
    beta = st.dt0**2 * st.particle_m**2 * 2.0 / RHO_0**2
    delta = 1.0 / ((grad_sum.dot(grad_sum) + grad_sq_sum) * beta)
    return base.init_sim_state(scene, extra=(delta.astype(jnp.float32),))


def _positive_avg(err):
    """Average of strictly-positive density errors (pcisph_solver.py:122-133)."""
    pos_mask = err > 0.0
    cnt = jnp.sum(pos_mask)
    total = jnp.sum(jnp.where(pos_mask, err, 0.0))
    return jnp.where(cnt > 0, total / cnt, 0.0)


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    from cfd_taichi_tpu.ops import pairwise as pw

    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    (delta,) = state.extra

    ctx = base.build_ctx(st, arrays, fluid.pos, rigid.pos)
    pos = ctx.pos
    vel = base.lift_v3(ctx, fluid.vel)
    n = st.nq

    # --- external forces (pcisph_solver.py:220-226) -------------------------
    rho = base.ctx_rho(st, ctx)
    tension = base.ctx_tension(st, ctx, TENSION_K)
    viscosity = base.ctx_viscosity(st, ctx, vel, rho, rigid,
                                   c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    ext_force = base.gravity_acc(st) + tension + viscosity

    # NOTE: pair geometry is recomputed inside each closure below so the
    # (nblk, B, W) tensors never become materialized while-loop invariants
    # (which would make every sweep HBM-bound).
    inv_rho2_q = base.q_form(ctx, 1.0 / (rho * rho))
    has_rigid = ctx.r is not None and st.fs_couple

    def press_force_of(p_iter, rigid_force):
        """Pressure force from current iterate (pcisph_solver.py:109-119,
        169-198); also scatters the rigid reaction."""
        x_f, r_f, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
        gc_f = sm.cubic_grad_coeff(r_f, st.h)
        sym = base.q_form(ctx, p_iter) + base.w_form_fluid(st, ctx, p_iter)
        scale = jnp.where(mask_f,
                          sym / RHO_0**2 * st.particle_m**2 * gc_f, 0.0)
        raw = base.sweep_sum_vec(x_f, scale, n)
        if has_rigid:
            x_r, r_r, mask_r = base.pair_geom(st, ctx, ctx.r,
                                              exclude_self=False)
            gc_r = sm.cubic_grad_coeff(r_r, st.h)
            s_scale = jnp.where(
                mask_r,
                ctx.rigid_vol_w[:, None, :] * RHO_0
                * base.q_form(ctx, p_iter) * inv_rho2_q * gc_r, 0.0)
            contrib = x_r * (s_scale * st.particle_m)
            raw = raw + base.sweep_sum_vec(x_r, s_scale * st.particle_m, n)
            rigid_force = base.ctx_scatter_rigid_force(st, ctx, contrib,
                                                       mask_r, rigid_force)
        force = -raw
        if ctx.b is not None:
            x_b, r_b, mask_b = base.pair_geom(st, ctx, ctx.b,
                                              exclude_self=False)
            gc_b = sm.cubic_grad_coeff(r_b, st.h)
            b_scale = jnp.where(
                mask_b,
                -ctx.bvol_w[:, None, :] * base.q_form(ctx, p_iter)
                * inv_rho2_q * gc_b, 0.0)
            bacc = base.sweep_sum_vec(x_b, b_scale, n)
            force = force + bacc * (RHO_0 * st.particle_m)
        return force, rigid_force

    def predict(press_force: V3):
        """Predict v,x then rho over predicted positions with the
        step-initial windows (pcisph_solver.py:72-101,135-154)."""
        vel_p = vel + (ext_force + press_force) * (dt / st.particle_m)
        pos_p = pos + vel_p * dt
        if not st.akinci:
            pos_p, vel_p = base.clamp_to_box(st, pos_p, vel_p,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)
        nblk, B = ctx.q_valid.shape
        # Pair validity stays pinned to the step-initial positions (the
        # reference reuses the start-of-step grid, solver_base.py:139-141).
        _, _, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
        q_p = pw.blockify_v3(pos_p, nblk, B)
        w_p = base.window_fluid_v3(st, ctx, pos_p)
        d_f = (q_p.expand(2) - w_p.expand(1)).norm()
        rho_p = st.particle_m * base.sweep_sum(sm.cubic_w(d_f, st.h), mask_f, n)
        if has_rigid:
            # Solid neighbors keep their current positions (py:143-147).
            _, _, mask_r = base.pair_geom(st, ctx, ctx.r, exclude_self=False)
            d_s = (q_p.expand(2) - ctx.r.pos_w.expand(1)).norm()
            rho_p = rho_p + RHO_0 * base.sweep_sum(
                ctx.rigid_vol_w[:, None, :] * sm.cubic_w(d_s, st.h), mask_r, n)
        if ctx.b is not None:
            _, _, mask_b = base.pair_geom(st, ctx, ctx.b, exclude_self=False)
            d_b = (q_p.expand(2) - ctx.b.pos_w.expand(1)).norm()
            rho_p = rho_p + RHO_0 * base.sweep_sum(
                ctx.bvol_w[:, None, :] * sm.cubic_w(d_b, st.h), mask_b, n)
        return rho_p - RHO_0

    # --- predictive-corrective loop (pcisph_solver.py:47-70) ----------------
    press0 = jnp.zeros(n, jnp.float32)
    force0 = V3.zeros((n,))
    rho_err0 = predict(force0)
    res0 = _positive_avg(rho_err0)
    err_thresh = RHO_0 * RHO_MAX_ERR_PERCENT * 0.01

    def cond(carry):
        _, _, _, res, _, it = carry
        return ((res > err_thresh) | (it < MIN_ITER)) & (it < MAX_ITER)

    def body(carry):
        p_iter, _, rho_err, _, rigid_force, it = carry
        p_iter = jnp.maximum(p_iter + rho_err * delta, 0.0)
        force, rigid_force = press_force_of(p_iter, rigid_force)
        rho_err = predict(force)
        return (p_iter, force, rho_err, _positive_avg(rho_err),
                rigid_force, it + 1)

    p_iter, press_force, rho_err, res, rigid_force, iters = jax.lax.while_loop(
        cond, body, (press0, force0, rho_err0, res0, rigid.force,
                     jnp.zeros((), jnp.int32)))

    # --- integration (pcisph_solver.py:200-217) -----------------------------
    new_vel = (vel + (ext_force + press_force) * (dt / st.particle_m)) \
        * base.ARTIFICIAL_FRICTION
    new_pos = pos + new_vel * dt
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(st, new_pos, new_vel,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)

    return state._replace(
        overflow=ctx.overflow,
        fluid=base.FluidState(pos=base.compact_v3(ctx, new_pos),
                              vel=base.compact_v3(ctx, new_vel),
                              acc=fluid.acc.take(ctx.perm)),
        rigid=rigid._replace(force=rigid_force),
        t=state.t + dt,
        step_count=state.step_count + 1,
        # [iters, avg positive density error, 0, 0] (pcisph_solver.py:70).
        diag=jnp.stack([iters.astype(jnp.float32), res,
                        jnp.zeros(()), jnp.zeros(())]),
    )
