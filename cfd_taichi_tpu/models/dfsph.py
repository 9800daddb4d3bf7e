"""DFSPH — divergence-free SPH with warm start and adaptive CFL timestep.

Functional parity with the reference `dfsph_solver` (dfsph_solver.py:1-445):
  * alpha factor with denominator guard < 1e-6, boundary contributions added
    as separate |.|^2 terms                   (dfsph_solver.py:32-51 quirk kept)
  * divergence solve with warm start: stiffness accumulated into warm_start_k,
    applied next step then zeroed; 1..15 iterations, threshold avg drho/dt
    < 10, stall break |delta| < 1e-5; particles with < 20 neighbors skipped
                                              (dfsph_solver.py:252-416)
  * adaptive dt via CFL 0.4 * 2r / v_max * 0.2 including rigid velocity,
    clamped to [1e-5, 1e-3], propagated to the shared dt
                                              (dfsph_solver.py:98-122)
  * density solve: >= 2 iterations, avg(rho_adv) - rho0 < 0.1% rho0, rho_adv
    clamped >= rho0; the reference's uncapped host loop gets an explicit
    large bound                               (dfsph_solver.py:221-233)
  * rigid coupling: velocity terms use v_j = v + a dt + (omega [+ alpha dt])
    x (x_j - centroid); force scatter only in the density loop
                                              (dfsph_solver.py:163-212,288-294)
  * position update with 0.9999 friction      (dfsph_solver.py:235-250)

All three host loops (reference dfsph_solver.py:221-233, 393-416 with a
device->host scalar sync per iteration) become on-device `lax.while_loop`s
over windowed pair sweeps (ops/pairwise.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import pairwise as pw
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu.scene import RHO_0, Scene, SceneArrays, SceneStatic

MIN_ITER_DENSITY = 2          # dfsph_solver.py:21
DENSITY_THRESHOLD = 0.1       # percent of rho0 (dfsph_solver.py:22)
MAX_ITER_DENSITY = 500        # explicit cap for the reference's uncapped loop
MIN_ITER_DIV = 1              # dfsph_solver.py:23
MAX_ITER_DIV = 15             # dfsph_solver.py:24
DIV_THRESHOLD = 10.0          # dfsph_solver.py:25
STALL_EPS = 1e-5              # dfsph_solver.py:410
MIN_NEIGHBORS = 20            # dfsph_solver.py:259
MAX_DT = 1e-3                 # dfsph_solver.py:28
MIN_DT = 1e-5                 # dfsph_solver.py:29
VISCOSITY_C_S = 13.0
VISCOSITY_ALPHA = 0.08
TENSION_K = 0.5
WARM_START = True
ADAPTIVE_DT = True


def init_state(scene: Scene) -> base.SimState:
    warm_k = jnp.zeros(scene.static.n_fluid, jnp.float32)
    return base.init_sim_state(scene, extra=(warm_k,))


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    fluid, rigid = state.fluid, state.rigid
    dt = state.dt
    (warm_k,) = state.extra

    ctx = base.build_ctx(st, arrays, fluid.pos, rigid.pos)
    pos = ctx.pos
    vel = base.lift_v3(ctx, fluid.vel)
    warm_k = base.lift(ctx, warm_k)
    n = st.nq
    nblk, B = ctx.q_valid.shape

    # NOTE: pair geometry (x_ij, r, masks — (nblk, B, W) tensors) is
    # recomputed inside every sweep below. Hoisting it out of the while
    # loops would materialize multi-GB loop invariants in HBM and make every
    # sweep HBM-bound; recomputation from the small (nblk, W) windows is
    # nearly free on the VPU and lets XLA fuse it into each reduction.
    has_rigid = ctx.r is not None and st.fs_couple
    if has_rigid:
        # Rigid window particle offsets from the centroid (small: (nblk, Wr)).
        rel_r = V3(ctx.r.pos_w.x - rigid.centroid[0],
                   ctx.r.pos_w.y - rigid.centroid[1],
                   ctx.r.pos_w.z - rigid.centroid[2])

    counts = base.neighbor_counts(st, ctx)

    # --- initialize: rho + alpha (dfsph_solver.py:423-426) ------------------
    rho = base.ctx_rho(st, ctx)

    # alpha_i = rho_i / (|S_f+s|^2 + Q_f+s + Q_b + |S_b|^2), guard < 1e-6
    # (dfsph_solver.py:32-51; boundary vector sum squared separately — quirk).
    x_f, r_f, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
    gc_f = sm.cubic_grad_coeff(r_f, st.h)
    coeff_f = jnp.where(mask_f, st.particle_m * gc_f, 0.0)
    sx = jnp.sum(x_f.x * coeff_f, axis=2)
    sy = jnp.sum(x_f.y * coeff_f, axis=2)
    sz = jnp.sum(x_f.z * coeff_f, axis=2)
    qsum = jnp.sum(coeff_f * coeff_f * (r_f * r_f), axis=2)
    if has_rigid:
        x_r, r_r, mask_r = base.pair_geom(st, ctx, ctx.r, exclude_self=False)
        gc_r = sm.cubic_grad_coeff(r_r, st.h)
        coeff_r = jnp.where(mask_r,
                            ctx.rigid_vol_w[:, None, :] * RHO_0 * gc_r, 0.0)
        sx = sx + jnp.sum(x_r.x * coeff_r, axis=2)
        sy = sy + jnp.sum(x_r.y * coeff_r, axis=2)
        sz = sz + jnp.sum(x_r.z * coeff_r, axis=2)
        qsum = qsum + jnp.sum(coeff_r * coeff_r * (r_r * r_r), axis=2)
    denom = sx * sx + sy * sy + sz * sz + qsum
    if ctx.b is not None:
        x_b, r_b, mask_b = base.pair_geom(st, ctx, ctx.b, exclude_self=False)
        gc_b = sm.cubic_grad_coeff(r_b, st.h)
        coeff_b = jnp.where(mask_b, ctx.bvol_w[:, None, :] * RHO_0 * gc_b, 0.0)
        sbx = jnp.sum(x_b.x * coeff_b, axis=2)
        sby = jnp.sum(x_b.y * coeff_b, axis=2)
        sbz = jnp.sum(x_b.z * coeff_b, axis=2)
        qb = jnp.sum(coeff_b * coeff_b * (r_b * r_b), axis=2)
        denom = denom + qb + sbx * sbx + sby * sby + sbz * sbz
    del x_f, r_f, mask_f, gc_f, coeff_f  # do not leak into loop closures
    if has_rigid:
        del x_r, r_r, mask_r, gc_r, coeff_r
    if ctx.b is not None:
        del x_b, r_b, mask_b, gc_b, coeff_b
    denom = pw.unblock(denom, n)
    alpha = jnp.where(jnp.abs(denom) < 1e-6, 0.0, rho / denom)

    def stiff_vel_delta(k_over_rho, extra_fluid_guard=False):
        """Sum_f m (ki/ri + kj/rj) gradW + Sum_s V rho0 ki/ri gradW + rho0 *
        Sum_b V ki/ri gradW. Returns (delta V3 (N,), (solid scale, x_r,
        mask_r) or None). Geometry recomputed in-body (see NOTE above)."""
        x_f, r_f, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
        gc_f = sm.cubic_grad_coeff(r_f, st.h)
        kq = base.q_form(ctx, k_over_rho)
        kij = kq + base.w_form_fluid(st, ctx, k_over_rho)
        mf = mask_f & (kij > 1e-5) if extra_fluid_guard else mask_f
        scale = jnp.where(mf, st.particle_m * kij * gc_f, 0.0)
        out = base.sweep_sum_vec(x_f, scale, n)
        solid = None
        if has_rigid:
            x_r, r_r, mask_r = base.pair_geom(st, ctx, ctx.r,
                                              exclude_self=False)
            gc_r = sm.cubic_grad_coeff(r_r, st.h)
            s_scale = jnp.where(
                mask_r, ctx.rigid_vol_w[:, None, :] * RHO_0 * kq * gc_r, 0.0)
            out = out + base.sweep_sum_vec(x_r, s_scale, n)
            solid = (s_scale, x_r, mask_r)
        if ctx.b is not None:
            x_b, r_b, mask_b = base.pair_geom(st, ctx, ctx.b,
                                              exclude_self=False)
            gc_b = sm.cubic_grad_coeff(r_b, st.h)
            b_scale = jnp.where(mask_b,
                                ctx.bvol_w[:, None, :] * kq * gc_b, 0.0)
            out = out + RHO_0 * base.sweep_sum_vec(x_b, b_scale, n)
        return out, solid

    def rigid_vel_w(include_alpha: bool):
        """Contact velocity of rigid window particles: v + a dt +
        (omega [+ alpha dt]) x r (dfsph_solver.py:163-170, 288-294)."""
        om = rigid.omega + (rigid.alpha * dt if include_alpha else 0.0)
        lin = rigid.vel + rigid.acc * dt
        spin = V3(om[0], om[1], om[2]).cross(rel_r)
        return V3(lin[0] + spin.x, lin[1] + spin.y, lin[2] + spin.z)

    def vel_dot_terms(v: V3, v_rw):
        """sum (v_i - v_j) . gradW with m / V rho0 weights (+ boundary with
        v_j = 0). Returns (N,) density-rate. Geometry recomputed in-body."""
        x_f, r_f, mask_f = base.pair_geom(st, ctx, ctx.f, exclude_self=True)
        gc_f = sm.cubic_grad_coeff(r_f, st.h)
        vq = pw.blockify_v3(v, nblk, B)
        vw = base.window_fluid_v3(st, ctx, v)
        dots = ((vq.x[:, :, None] - vw.x[:, None, :]) * x_f.x
                + (vq.y[:, :, None] - vw.y[:, None, :]) * x_f.y
                + (vq.z[:, :, None] - vw.z[:, None, :]) * x_f.z) * gc_f
        d = st.particle_m * base.sweep_sum(dots, mask_f, n)
        if has_rigid:
            x_r, r_r, mask_r = base.pair_geom(st, ctx, ctx.r,
                                              exclude_self=False)
            gc_r = sm.cubic_grad_coeff(r_r, st.h)
            dots_r = ((vq.x[:, :, None] - v_rw.x[:, None, :]) * x_r.x
                      + (vq.y[:, :, None] - v_rw.y[:, None, :]) * x_r.y
                      + (vq.z[:, :, None] - v_rw.z[:, None, :]) * x_r.z) * gc_r
            d = d + RHO_0 * base.sweep_sum(
                ctx.rigid_vol_w[:, None, :] * dots_r, mask_r, n)
        if ctx.b is not None:
            x_b, r_b, mask_b = base.pair_geom(st, ctx, ctx.b,
                                              exclude_self=False)
            gc_b = sm.cubic_grad_coeff(r_b, st.h)
            dots_b = (vq.x[:, :, None] * x_b.x + vq.y[:, :, None] * x_b.y
                      + vq.z[:, :, None] * x_b.z) * gc_b
            d = d + RHO_0 * base.sweep_sum(
                ctx.bvol_w[:, None, :] * dots_b, mask_b, n)
        return d

    def rho_derivative(v: V3):
        """max(drho/dt, 0) with the <20-neighbor skip and positive-average
        residual (dfsph_solver.py:252-300)."""
        v_rw = rigid_vel_w(include_alpha=False) if has_rigid else None
        dr = vel_dot_terms(v, v_rw)
        dr = jnp.where(counts < MIN_NEIGHBORS, 0.0, jnp.maximum(dr, 0.0))
        pos_mask = dr > 0.0
        cnt = jnp.sum(pos_mask)
        avg = jnp.where(cnt > 0,
                        jnp.sum(jnp.where(pos_mask, dr, 0.0)) / cnt, 0.0)
        return dr, avg

    # --- divergence solve (dfsph_solver.py:393-416) -------------------------
    if WARM_START:
        delta, _ = stiff_vel_delta((warm_k / dt) / rho)
        vel = vel - delta * dt
        warm_k = jnp.zeros_like(warm_k)

    dr0, avg0 = rho_derivative(vel)

    def div_cond(carry):
        _, _, _, avg, _, stop, it = carry
        return (((it < MIN_ITER_DIV) | (avg > DIV_THRESHOLD))
                & (it < MAX_ITER_DIV) & jnp.logical_not(stop))

    def div_body(carry):
        v, wk, dr, avg, past, _, it = carry
        k_over_rho = (dr * alpha / dt) / rho
        delta, _ = stiff_vel_delta(k_over_rho, extra_fluid_guard=True)
        v = v - delta * dt
        wk = wk + dr * alpha          # sum_up_stiff (dfsph_solver.py:381-384)
        new_dr, new_avg = rho_derivative(v)
        stop = jnp.abs(new_avg - avg) < STALL_EPS
        return (v, wk, new_dr, new_avg, avg, stop, it + 1)

    vel, warm_k, _, div_avg, _, _, div_iters = jax.lax.while_loop(
        div_cond, div_body,
        (vel, warm_k, dr0, avg0, jnp.zeros(()), jnp.zeros((), bool),
         jnp.zeros((), jnp.int32)))

    # --- external forces + v_adv + adaptive dt (dfsph_solver.py:91-122) -----
    tension = base.ctx_tension(st, ctx, TENSION_K)
    viscosity = base.ctx_viscosity(st, ctx, vel, rho, rigid,
                                   c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    force_ext = base.gravity_acc(st) + tension + viscosity
    vel_adv = vel + force_ext * (dt / st.particle_m)

    max_vel = jnp.max(vel_adv.norm())
    if st.rigid_active and st.n_rigid > 0:
        rel = V3(rigid.pos.x - rigid.centroid[0],
                 rigid.pos.y - rigid.centroid[1],
                 rigid.pos.z - rigid.centroid[2])
        spin = V3(rigid.omega[0], rigid.omega[1], rigid.omega[2]).cross(rel)
        max_vel = max_vel + jnp.max(jnp.linalg.norm(rigid.vel) + spin.norm())
    if ADAPTIVE_DT:
        cfl_dt = 0.4 * (2.0 * st.particle_radius) / max_vel * 0.2
        dt = jnp.clip(cfl_dt, MIN_DT, MAX_DT)
    dt2 = dt * dt

    # --- density solve (dfsph_solver.py:221-233) ----------------------------
    def rho_adv_of(v_adv: V3):
        v_rw = rigid_vel_w(include_alpha=True) if has_rigid else None
        d = vel_dot_terms(v_adv, v_rw)
        rho_adv = jnp.maximum(rho + dt * d, RHO_0)
        unclamped = rho_adv != RHO_0
        cnt = jnp.sum(unclamped)
        avg = jnp.where(cnt > 0,
                        jnp.sum(jnp.where(unclamped, rho_adv, 0.0)) / cnt,
                        jnp.float32(RHO_0))  # dfsph_solver.py:128
        return rho_adv, avg

    den_thresh = DENSITY_THRESHOLD * RHO_0 * 0.01

    def den_cond(carry):
        _, avg, _, it = carry
        return (((it < MIN_ITER_DENSITY) | (avg - RHO_0 > den_thresh))
                & (it < MAX_ITER_DENSITY))

    def den_body(carry):
        v_adv, _, rforce, it = carry
        rho_adv, avg = rho_adv_of(v_adv)
        k_over_rho = ((rho_adv - RHO_0) * alpha / dt2) / rho
        delta, solid = stiff_vel_delta(k_over_rho)
        if solid is not None:
            # Rigid reaction accumulates every density iteration
            # (dfsph_solver.py:204-212).
            s_scale, x_r_, mask_r_ = solid
            contrib = x_r_ * (s_scale * st.particle_m)
            rforce = base.ctx_scatter_rigid_force(st, ctx, contrib, mask_r_,
                                                  rforce)
        v_adv = v_adv - delta * dt
        return (v_adv, avg, rforce, it + 1)

    vel_adv, den_avg, rigid_force, den_iters = jax.lax.while_loop(
        den_cond, den_body,
        (vel_adv, jnp.float32(jnp.inf), rigid.force, jnp.zeros((), jnp.int32)))

    # --- position update (dfsph_solver.py:235-250) --------------------------
    new_pos = pos + vel_adv * (dt * base.ARTIFICIAL_FRICTION)
    new_vel = vel_adv * base.ARTIFICIAL_FRICTION
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
        dt=dt,
        t=state.t + dt,
        step_count=state.step_count + 1,
        extra=(base.compact(ctx, warm_k),),
        # [divergence iters, divergence residual, density iters,
        #  density error] — the reference's per-step prints
        # (dfsph_solver.py:233,416).
        diag=jnp.stack([div_iters.astype(jnp.float32), div_avg,
                        den_iters.astype(jnp.float32), den_avg - RHO_0]),
    )
