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
`lax.while_loop`. All pair math is component-separated (V3).
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
    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    pos, vel = fluid.pos, fluid.vel
    (delta,) = state.extra

    nh = base.build_neighborhood(st, arrays, pos, rigid.pos)

    # --- external forces (pcisph_solver.py:220-226) -------------------------
    rho = base.compute_rho(st, arrays, nh, pos)
    tension = base.compute_tension(st, nh, pos, TENSION_K)
    viscosity = base.compute_viscosity(st, arrays, nh, pos, vel, rho, rigid,
                                       c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    ext_force = base.gravity_acc(st) + tension + viscosity

    # Precompute pair geometry reused by every loop iteration.
    j = nh.nbr.idx
    jf = jnp.clip(j, 0, st.n_fluid - 1)
    x_ij = base.pair_disp(pos, nh.pos_all, j)
    gcoef = sm.cubic_grad_coeff(x_ij.norm(), st.h)
    mask_f, mask_s = base.fluid_solid_masks(st, nh)
    vol_j = base.gather_rigid_volume(st, arrays, j)
    if st.akinci:
        bj, bm = nh.bnbr.idx, nh.bnbr.mask
        xb = base.pair_disp(pos, arrays.boundary_pos, bj)
        bgcoef = sm.cubic_grad_coeff(xb.norm(), st.h)
        bvol = arrays.boundary_volume[bj]

    def press_force_of(p_iter, rigid_force):
        """Pressure force from current iterate (pcisph_solver.py:109-119,
        169-198); also scatters the rigid reaction."""
        p_j = p_iter[jf]
        scale_f = jnp.where(
            mask_f,
            (p_iter[:, None] + p_j) / RHO_0**2 * st.particle_m**2 * gcoef, 0.0)
        raw = (x_ij * scale_f).sum(axis=1)
        if st.rigid_active and st.fs_couple and st.n_rigid > 0:
            s_scale = jnp.where(
                mask_s,
                vol_j * RHO_0 * p_iter[:, None] / (rho * rho)[:, None] * gcoef,
                0.0)
            contrib = x_ij * (s_scale * st.particle_m)
            raw = raw + contrib.sum(axis=1)
            rigid_force = base.scatter_rigid_force(st, nh, contrib, mask_s,
                                                   rigid_force)
        force = -raw
        if st.akinci:
            bscale = jnp.where(
                bm, -bvol * (p_iter / (rho * rho))[:, None] * bgcoef, 0.0)
            bacc = (xb * bscale).sum(axis=1)
            force = force + bacc * (RHO_0 * st.particle_m)
        return force, rigid_force

    def predict(press_force: V3):
        """Predict v,x then rho over predicted positions with the
        step-initial neighbor list (pcisph_solver.py:72-101,135-154)."""
        vel_p = vel + (ext_force + press_force) * (dt / st.particle_m)
        pos_p = pos + vel_p * dt
        if not st.akinci:
            pos_p, vel_p = base.clamp_to_box(st, pos_p, vel_p,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)
        # Fluid neighbors at predicted positions; solid at current positions.
        d_f = (pos_p.expand(1) - pos_p.take(jf)).norm()
        rho_p = st.particle_m * base.msum(sm.cubic_w(d_f, st.h), mask_f)
        if st.rigid_active and st.fs_couple and st.n_rigid > 0:
            d_s = (pos_p.expand(1) - nh.pos_all.take(j)).norm()
            rho_p = rho_p + RHO_0 * base.msum(
                vol_j * sm.cubic_w(d_s, st.h), mask_s)
        if st.akinci:
            d_b = (pos_p.expand(1) - arrays.boundary_pos.take(bj)).norm()
            rho_p = rho_p + RHO_0 * base.msum(
                bvol * sm.cubic_w(d_b, st.h), bm)
        return rho_p - RHO_0

    # --- predictive-corrective loop (pcisph_solver.py:47-70) ----------------
    press0 = jnp.zeros(st.n_fluid, jnp.float32)
    force0 = V3.zeros((st.n_fluid,))
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
        fluid=base.FluidState(pos=new_pos, vel=new_vel, acc=fluid.acc),
        rigid=rigid._replace(force=rigid_force),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )
