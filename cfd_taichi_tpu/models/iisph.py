"""IISPH — implicit incompressible SPH (relaxed Jacobi pressure solve).

Functional parity with the reference `iisph_solver` (iisph_solver.py:1-349):
  * predict advection: d_ii displacement factors, advected density rho_adv
    (rigid contact velocity incl. alpha dt), diagonal a_ii with the d_ji
    correction, pressure warm start p0 = 0.5 p_past
                                               (iisph_solver.py:36-75,255-340)
  * relaxed Jacobi iteration omega = 0.5 over d_ij sums and off-diagonal
    `sum_factor` (incl. solid/boundary rows)    (iisph_solver.py:78-147,229-253)
  * convergence: residual avg over {p>0} of (a_ii p + r_sum + rho_adv - 1000)
    < 0.1% rho0, 1..180 iterations, divergence-trend break — the hardcoded
    1000 at iisph_solver.py:109 is preserved
  * integration: f_press = (d_ij + d_ii p) m / dt^2, velocity damped 0.9999,
    rigid force scatter once per step          (iisph_solver.py:150-206)

The reference's host loop with per-iteration kernel-scalar residual sync
(iisph_solver.py:78-99) becomes an on-device `lax.while_loop` over windowed
pair sweeps (ops/pairwise.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import pairwise as pw
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu.scene import RHO_0, Scene, SceneArrays, SceneStatic

OMEGA = 0.5              # relaxation (iisph_solver.py:26)
MAX_ITER = 180           # iisph_solver.py:27
MIN_ITER = 1
RHO_ERR_PERCENT = 0.1    # iisph_solver.py:29
RESIDUAL_REF = 1000.0    # hardcoded in the residual (iisph_solver.py:109)
VISCOSITY_C_S = 13.0
VISCOSITY_ALPHA = 0.08
TENSION_K = 0.5


def init_state(scene: Scene) -> base.SimState:
    p_past = jnp.zeros(scene.static.n_fluid, jnp.float32)
    return base.init_sim_state(scene, extra=(p_past,))


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    (p_past,) = state.extra
    dt2 = dt * dt

    ctx = base.build_ctx(st, arrays, fluid.pos, rigid.pos)
    pos = ctx.pos
    vel = base.lift_v3(ctx, fluid.vel)
    p_past = base.lift(ctx, p_past)
    n = st.nq
    nblk, B = ctx.q_valid.shape

    # Step-level pair geometry for the predict-advection section. The solve
    # loop's closures recompute their own geometry in-body so no (nblk,B,W)
    # tensor becomes a materialized while-loop invariant.
    x_f, r_f, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
    gc_f = sm.cubic_grad_coeff(r_f, st.h)
    has_rigid = ctx.r is not None and st.fs_couple
    if has_rigid:
        x_r, r_r, mask_r = base.pair_geom(st, ctx, ctx.r, exclude_self=False)
        gc_r = sm.cubic_grad_coeff(r_r, st.h)
    if ctx.b is not None:
        x_b, r_b, mask_b = base.pair_geom(st, ctx, ctx.b, exclude_self=False)
        gc_b = sm.cubic_grad_coeff(r_b, st.h)

    # --- predict advection (iisph_solver.py:36-75) --------------------------
    rho = base.ctx_rho(st, ctx)
    tension = base.ctx_tension(st, ctx, TENSION_K)
    viscosity = base.ctx_viscosity(st, ctx, vel, rho, rigid,
                                   c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    f_adv = base.gravity_acc(st) + tension + viscosity
    v_adv = vel + f_adv * (dt / st.particle_m)

    inv_rho2_q = base.q_form(ctx, 1.0 / (rho * rho))   # (nblk, B, 1)

    # d_ii = dt^2 [ -sum_f m/rho_i^2 gradW - sum_s V rho0/rho_i^2 gradW
    #               - rho0 sum_b V_b/rho_i^2 gradW ]  (iisph_solver.py:255-273)
    scale = jnp.where(mask_f, -st.particle_m * inv_rho2_q * gc_f, 0.0)
    d_ii = base.sweep_sum_vec(x_f, scale, n)
    if has_rigid:
        scale_r = jnp.where(
            mask_r, -ctx.rigid_vol_w[:, None, :] * RHO_0 * inv_rho2_q * gc_r,
            0.0)
        d_ii = d_ii + base.sweep_sum_vec(x_r, scale_r, n)
    if ctx.b is not None:
        scale_b = jnp.where(
            mask_b, -ctx.bvol_w[:, None, :] * inv_rho2_q * gc_b, 0.0)
        d_ii = d_ii + RHO_0 * base.sweep_sum_vec(x_b, scale_b, n)
    d_ii = d_ii * dt2

    # rho_adv (iisph_solver.py:57-66, 316-340): rigid neighbor velocity uses
    # omega + alpha dt about the centroid.
    vq = pw.blockify_v3(v_adv, nblk, B)
    vw = base.window_fluid_v3(st, ctx, v_adv)
    dots = ((vq.x[:, :, None] - vw.x[:, None, :]) * x_f.x
            + (vq.y[:, :, None] - vw.y[:, None, :]) * x_f.y
            + (vq.z[:, :, None] - vw.z[:, None, :]) * x_f.z) * gc_f
    drho = st.particle_m * base.sweep_sum(dots, mask_f, n)
    if has_rigid:
        rel_r = V3(ctx.r.pos_w.x - rigid.centroid[0],
                   ctx.r.pos_w.y - rigid.centroid[1],
                   ctx.r.pos_w.z - rigid.centroid[2])
        om = rigid.omega + rigid.alpha * dt
        lin = rigid.vel + rigid.acc * dt
        spin = V3(om[0], om[1], om[2]).cross(rel_r)
        v_rw = V3(lin[0] + spin.x, lin[1] + spin.y, lin[2] + spin.z)
        dots_r = ((vq.x[:, :, None] - v_rw.x[:, None, :]) * x_r.x
                  + (vq.y[:, :, None] - v_rw.y[:, None, :]) * x_r.y
                  + (vq.z[:, :, None] - v_rw.z[:, None, :]) * x_r.z) * gc_r
        drho = drho + RHO_0 * base.sweep_sum(
            ctx.rigid_vol_w[:, None, :] * dots_r, mask_r, n)
    if ctx.b is not None:
        dots_b = (vq.x[:, :, None] * x_b.x + vq.y[:, :, None] * x_b.y
                  + vq.z[:, :, None] * x_b.z) * gc_b
        drho = drho + RHO_0 * base.sweep_sum(
            ctx.bvol_w[:, None, :] * dots_b, mask_b, n)
    rho_adv = drho * dt + rho

    # a_ii with the d_ji correction (iisph_solver.py:276-303). d_ji uses the
    # querying particle's own m/rho_i^2 in every branch (reference behavior):
    # d_ji = +dt^2 m/rho_i^2 gradW_ij, so
    # (d_ii_i - d_ji).gradW = d_ii.gradW - dt^2 m/rho_i^2 gc^2 |x|^2.
    dii_q = pw.blockify_v3(d_ii, nblk, B)
    dji_f = dt2 * st.particle_m * inv_rho2_q * gc_f      # (nblk, B, W)
    ddot_f = ((dii_q.x[:, :, None] * x_f.x + dii_q.y[:, :, None] * x_f.y
               + dii_q.z[:, :, None] * x_f.z) - dji_f * (r_f * r_f)) * gc_f
    a_ii = st.particle_m * base.sweep_sum(ddot_f, mask_f, n)
    if has_rigid:
        dji_r = dt2 * st.particle_m * inv_rho2_q * gc_r
        ddot_r = ((dii_q.x[:, :, None] * x_r.x + dii_q.y[:, :, None] * x_r.y
                   + dii_q.z[:, :, None] * x_r.z) - dji_r * (r_r * r_r)) * gc_r
        a_ii = a_ii + RHO_0 * base.sweep_sum(
            ctx.rigid_vol_w[:, None, :] * ddot_r, mask_r, n)
    if ctx.b is not None:
        dji_b = dt2 * st.particle_m * inv_rho2_q * gc_b
        ddot_b = ((dii_q.x[:, :, None] * x_b.x + dii_q.y[:, :, None] * x_b.y
                   + dii_q.z[:, :, None] * x_b.z) - dji_b * (r_b * r_b)) * gc_b
        a_ii = a_ii + RHO_0 * base.sweep_sum(
            ctx.bvol_w[:, None, :] * ddot_b, mask_b, n)

    p0 = 0.5 * p_past  # warm start (iisph_solver.py:67)

    del x_f, r_f, mask_f, gc_f  # keep step-level geometry out of the loop
    if has_rigid:
        del x_r, r_r, mask_r, gc_r
    if ctx.b is not None:
        del x_b, r_b, mask_b, gc_b

    # --- relaxed Jacobi solve (iisph_solver.py:78-147) ----------------------
    err_thresh = RHO_ERR_PERCENT * RHO_0 * 0.01

    def d_ij_of(p):
        # d_ij = -dt^2 sum_f m p_j/rho_j^2 gradW (fluid-only, py:306-314).
        x_f, r_f, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
        gc_f = sm.cubic_grad_coeff(r_f, st.h)
        pj_term = base.w_form_fluid(st, ctx, p / (rho * rho))
        scale = jnp.where(mask_f, -st.particle_m * pj_term * gc_f, 0.0)
        return base.sweep_sum_vec(x_f, scale, n) * dt2

    def r_sum_of(p, d_ij: V3):
        # Off-diagonal row sum (iisph_solver.py:229-253):
        # sum_f m (d_ij_i - d_ii_j p_j - (d_ij_j - d_ji p_i)) . gradW
        x_f, r_f, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
        gc_f = sm.cubic_grad_coeff(r_f, st.h)
        dij_q = pw.blockify_v3(d_ij, nblk, B)
        dij_w = base.window_fluid_v3(st, ctx, d_ij)
        dii_w = base.window_fluid_v3(st, ctx, d_ii)
        p_w = base.w_form_fluid(st, ctx, p)[:, 0, :]         # (nblk, W)
        p_q = base.q_form(ctx, p)
        # e . gradW, with e = dij_i - dii_j p_j - dij_j + d_ji p_i and
        # d_ji p_i = dt^2 m/rho_i^2 p_i * gc * x_ij.
        exf = (dij_q.x[:, :, None] - dii_w.x[:, None, :] * p_w[:, None, :]
               - dij_w.x[:, None, :])
        eyf = (dij_q.y[:, :, None] - dii_w.y[:, None, :] * p_w[:, None, :]
               - dij_w.y[:, None, :])
        ezf = (dij_q.z[:, :, None] - dii_w.z[:, None, :] * p_w[:, None, :]
               - dij_w.z[:, None, :])
        dji_p = dt2 * st.particle_m * inv_rho2_q * p_q * gc_f
        dot = (exf * x_f.x + eyf * x_f.y + ezf * x_f.z
               + dji_p * (r_f * r_f)) * gc_f
        out = st.particle_m * base.sweep_sum(dot, mask_f, n)
        if has_rigid:
            x_r, r_r, mask_r = base.pair_geom(st, ctx, ctx.r,
                                              exclude_self=False)
            gc_r = sm.cubic_grad_coeff(r_r, st.h)
            sdot = (dij_q.x[:, :, None] * x_r.x + dij_q.y[:, :, None] * x_r.y
                    + dij_q.z[:, :, None] * x_r.z) * gc_r
            out = out + RHO_0 * base.sweep_sum(
                ctx.rigid_vol_w[:, None, :] * sdot, mask_r, n)
        if ctx.b is not None:
            x_b, r_b, mask_b = base.pair_geom(st, ctx, ctx.b,
                                              exclude_self=False)
            gc_b = sm.cubic_grad_coeff(r_b, st.h)
            bdot = (dij_q.x[:, :, None] * x_b.x + dij_q.y[:, :, None] * x_b.y
                    + dij_q.z[:, :, None] * x_b.z) * gc_b
            out = out + RHO_0 * base.sweep_sum(
                ctx.bvol_w[:, None, :] * bdot, mask_b, n)
        return out

    def residual_of(p, r_sum):
        active = p > 0.0
        cnt = jnp.sum(active)
        total = jnp.sum(jnp.where(
            active, a_ii * p + r_sum + rho_adv - RESIDUAL_REF, 0.0))
        return jnp.where(cnt > 0, total / cnt, 0.0)

    def cond(carry):
        _, _, _, res, _, stop, l = carry
        return (((res > err_thresh) | (l < MIN_ITER)) & (l < MAX_ITER)
                & jnp.logical_not(stop))

    def body(carry):
        p, d_ij, r_sum, res, _, _, l = carry
        d_ij = d_ij_of(p)
        r_sum = r_sum_of(p, d_ij)
        p_new = jnp.where(jnp.abs(a_ii) > 1e-7,
                          (1.0 - OMEGA) * p
                          + OMEGA * (RHO_0 - rho_adv - r_sum) / a_ii,
                          0.0)
        p = jnp.maximum(p_new, 0.0)
        new_res = residual_of(p, r_sum)
        # Divergence-trend break (iisph_solver.py:91-93): compare with the
        # previous accepted residual; no check on the first iteration.
        stop = (l >= 1) & (new_res - res > 0.0)
        return (p, d_ij, r_sum, new_res, res, stop, l + 1)

    p_iter, d_ij, r_sum, res, _, _, iters = jax.lax.while_loop(
        cond, body,
        (p0, V3.zeros((n,)), jnp.zeros(n, jnp.float32),
         jnp.float32(jnp.inf), jnp.float32(jnp.inf), jnp.zeros((), bool),
         jnp.zeros((), jnp.int32)))

    # --- integration (iisph_solver.py:150-206) ------------------------------
    f_press = (d_ij + d_ii * p_iter) * (st.particle_m / dt2)

    rigid_force = rigid.force
    if has_rigid:
        # compute_rigid_force (iisph_solver.py:150-160): once per step.
        x_r, r_r, mask_r = base.pair_geom(st, ctx, ctx.r, exclude_self=False)
        gc_r = sm.cubic_grad_coeff(r_r, st.h)
        c_scale = jnp.where(
            mask_r,
            ctx.rigid_vol_w[:, None, :] * RHO_0 * base.q_form(ctx, p_iter)
            * inv_rho2_q * gc_r * st.particle_m, 0.0)
        rigid_force = base.ctx_scatter_rigid_force(st, ctx, x_r * c_scale,
                                                   mask_r, rigid_force)

    new_vel = (v_adv + f_press * (dt / st.particle_m)) * base.ARTIFICIAL_FRICTION
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
        extra=(base.compact(ctx, p_iter),),
        # [iters, residual, 0, 0] (iisph_solver.py:96).
        diag=jnp.stack([iters.astype(jnp.float32), res,
                        jnp.zeros(()), jnp.zeros(())]),
    )
