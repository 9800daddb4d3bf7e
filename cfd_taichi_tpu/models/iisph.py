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
(iisph_solver.py:78-99) becomes an on-device `lax.while_loop`. All pair
math is component-separated (V3) for clean TPU tiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models import base
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
    pos, vel = fluid.pos, fluid.vel
    (p_past,) = state.extra
    dt2 = dt * dt

    nh = base.build_neighborhood(st, arrays, pos, rigid.pos)
    j = nh.nbr.idx
    jf = jnp.clip(j, 0, st.n_fluid - 1)
    x_ij = base.pair_disp(pos, nh.pos_all, j)
    gcoef = sm.cubic_grad_coeff(x_ij.norm(), st.h)
    mask_f, mask_s = base.fluid_solid_masks(st, nh)
    vol_j = base.gather_rigid_volume(st, arrays, j)
    if st.akinci:
        bj, bm = nh.bnbr.idx, nh.bnbr.mask
        bvol = arrays.boundary_volume[bj]
        xb = base.pair_disp(pos, arrays.boundary_pos, bj)
        bgcoef = sm.cubic_grad_coeff(xb.norm(), st.h)

    # --- predict advection (iisph_solver.py:36-75) --------------------------
    rho = base.compute_rho(st, arrays, nh, pos)
    tension = base.compute_tension(st, nh, pos, TENSION_K)
    viscosity = base.compute_viscosity(st, arrays, nh, pos, vel, rho, rigid,
                                       c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    f_adv = base.gravity_acc(st) + tension + viscosity
    v_adv = vel + f_adv * (dt / st.particle_m)

    inv_rho_i2 = (1.0 / (rho * rho))[:, None]  # (Nf, 1)

    # d_ii = dt^2 [ -sum_f m/rho_i^2 gradW - sum_s V rho0/rho_i^2 gradW
    #               - rho0 sum_b V_b/rho_i^2 gradW ]  (iisph_solver.py:255-273)
    coeff = jnp.where(mask_f, st.particle_m, jnp.where(mask_s, vol_j * RHO_0, 0.0))
    d_scale = jnp.where(mask_f | mask_s, -coeff * inv_rho_i2 * gcoef, 0.0)
    d_ii = (x_ij * d_scale).sum(axis=1)   # V3 of (Nf,)
    if st.akinci:
        b_scale = jnp.where(bm, -bvol * inv_rho_i2 * bgcoef, 0.0)
        d_ii = d_ii + RHO_0 * (xb * b_scale).sum(axis=1)
    d_ii = d_ii * dt2

    # rho_adv (iisph_solver.py:57-66, 316-340): rigid neighbor velocity uses
    # omega + alpha dt about the centroid.
    if st.rigid_active and st.n_rigid > 0:
        rel = V3(nh.pos_all.x[st.n_fluid:] - rigid.centroid[0],
                 nh.pos_all.y[st.n_fluid:] - rigid.centroid[1],
                 nh.pos_all.z[st.n_fluid:] - rigid.centroid[2])
        om = rigid.omega + rigid.alpha * dt
        lin = rigid.vel + rigid.acc * dt
        spin = V3(om[0], om[1], om[2]).cross(rel)
        v_rigid = V3(lin[0] + spin.x, lin[1] + spin.y, lin[2] + spin.z)
        v_all = base.concat_v3(v_adv, v_rigid)
    else:
        v_all = v_adv
    v_ij = v_adv.expand(1) - v_all.take(j)
    dots = v_ij.dot(x_ij) * gcoef
    drho = st.particle_m * base.msum(dots, mask_f)
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        drho = drho + RHO_0 * base.msum(vol_j * dots, mask_s)
    if st.akinci:
        bdots = v_adv.expand(1).dot(xb) * bgcoef
        drho = drho + RHO_0 * base.msum(bvol * bdots, bm)
    rho_adv = drho * dt + rho

    # a_ii with the d_ji correction (iisph_solver.py:276-303). d_ji uses the
    # querying particle's own m/rho_i^2 in every branch (reference behavior):
    # d_ji = -dt^2 m/rho_i^2 gradW_ji = +dt^2 m/rho_i^2 gradW_ij.
    dji_scale = dt2 * st.particle_m * inv_rho_i2 * gcoef      # (Nf, K)
    # (d_ii_i - d_ji) . gradW = d_ii.gradW - dji_scale*|x|^2*gcoef
    ddot = (d_ii.expand(1).dot(x_ij) - dji_scale * x_ij.norm2()) * gcoef
    a_ii = base.msum(coeff * ddot, mask_f | mask_s)
    if st.akinci:
        dji_b = dt2 * st.particle_m * inv_rho_i2 * bgcoef
        bddot = (d_ii.expand(1).dot(xb) - dji_b * xb.norm2()) * bgcoef
        a_ii = a_ii + RHO_0 * base.msum(bvol * bddot, bm)

    p0 = 0.5 * p_past  # warm start (iisph_solver.py:67)

    # --- relaxed Jacobi solve (iisph_solver.py:78-147) ----------------------
    err_thresh = RHO_ERR_PERCENT * RHO_0 * 0.01

    def d_ij_of(p):
        scale = jnp.where(mask_f,
                          -st.particle_m * (p / (rho * rho))[jf] * gcoef, 0.0)
        return (x_ij * scale).sum(axis=1) * dt2   # fluid-only (py:306-314)

    def r_sum_of(p, d_ij: V3):
        # Off-diagonal row sum (iisph_solver.py:229-253):
        # sum_f m (d_ij_i - d_ii_j p_j - (d_ij_j - d_ji p_i)) . gradW
        dij_j = d_ij.take(jf)                 # V3 (N, K)
        dii_j = d_ii.take(jf)
        p_j = p[jf]
        # d_ji scaled by p_i: dji_scale * p_i * x_ij
        e = V3(
            d_ij.x[:, None] - dii_j.x * p_j - dij_j.x + dji_scale * p[:, None] * x_ij.x,
            d_ij.y[:, None] - dii_j.y * p_j - dij_j.y + dji_scale * p[:, None] * x_ij.y,
            d_ij.z[:, None] - dii_j.z * p_j - dij_j.z + dji_scale * p[:, None] * x_ij.z,
        )
        dot = e.dot(x_ij) * gcoef
        out = st.particle_m * base.msum(dot, mask_f)
        if st.rigid_active and st.fs_couple and st.n_rigid > 0:
            sdot = d_ij.expand(1).dot(x_ij) * gcoef
            out = out + RHO_0 * base.msum(vol_j * sdot, mask_s)
        if st.akinci:
            bdot = d_ij.expand(1).dot(xb) * bgcoef
            out = out + RHO_0 * base.msum(bvol * bdot, bm)
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
        (p0, V3.zeros((st.n_fluid,)), jnp.zeros(st.n_fluid, jnp.float32),
         jnp.float32(jnp.inf), jnp.float32(jnp.inf), jnp.zeros((), bool),
         jnp.zeros((), jnp.int32)))

    # --- integration (iisph_solver.py:150-206) ------------------------------
    f_press = (d_ij + d_ii * p_iter) * (st.particle_m / dt2)

    rigid_force = rigid.force
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        # compute_rigid_force (iisph_solver.py:150-160): once per step.
        c_scale = (vol_j * RHO_0 * (p_iter / (rho * rho))[:, None]
                   * gcoef * st.particle_m)
        rigid_force = base.scatter_rigid_force(st, nh, x_ij * c_scale, mask_s,
                                               rigid_force)

    new_vel = (v_adv + f_press * (dt / st.particle_m)) * base.ARTIFICIAL_FRICTION
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
        extra=(p_iter,),
    )
