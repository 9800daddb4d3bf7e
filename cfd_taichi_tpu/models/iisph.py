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
(iisph_solver.py:78-99) becomes an on-device `lax.while_loop`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import smoothing as sm
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
    x_ij = pos[:, None, :] - nh.pos_all[j]
    gradw = sm.cubic_grad(x_ij, st.h)
    mask_f, mask_s = base.fluid_solid_masks(st, nh)
    vol_j = base.gather_rigid_volume(st, arrays, j)
    if st.akinci:
        bj, bm = nh.bnbr.idx, nh.bnbr.mask
        bvol = arrays.boundary_volume[bj]
        bgradw = sm.cubic_grad(pos[:, None, :] - arrays.boundary_pos[bj], st.h)

    # --- predict advection (iisph_solver.py:36-75) --------------------------
    rho = base.compute_rho(st, arrays, nh, pos)
    tension = base.compute_tension(st, nh, pos, TENSION_K)
    viscosity = base.compute_viscosity(st, arrays, nh, pos, vel, rho, rigid,
                                       c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    f_adv = base.gravity_acc(st)[None, :] + tension + viscosity
    v_adv = vel + dt * f_adv / st.particle_m

    inv_rho_i2 = (1.0 / (rho * rho))[:, None]  # (Nf, 1)

    # d_ii = dt^2 [ -sum_f m/rho_i^2 gradW - sum_s V rho0/rho_i^2 gradW
    #               - rho0 sum_b V_b/rho_i^2 gradW ]  (iisph_solver.py:255-273)
    coeff = jnp.where(mask_f, st.particle_m, jnp.where(mask_s, vol_j * RHO_0, 0.0))
    d_ii = -base.msum((coeff * inv_rho_i2)[..., None] * gradw,
                      mask_f | mask_s)
    if st.akinci:
        d_ii = d_ii - RHO_0 * base.msum((bvol * inv_rho_i2)[..., None] * bgradw, bm)
    d_ii = d_ii * dt2

    # rho_adv (iisph_solver.py:57-66, 316-340): rigid neighbor velocity uses
    # omega + alpha dt about the centroid.
    if st.rigid_active and st.n_rigid > 0:
        rel = nh.pos_all[st.n_fluid:] - rigid.centroid
        omega_eff = rigid.omega + rigid.alpha * dt
        v_rigid = (rigid.vel + rigid.acc * dt)[None, :] + jnp.cross(
            jnp.broadcast_to(omega_eff, rel.shape), rel)
        v_all = jnp.concatenate([v_adv, v_rigid], axis=0)
    else:
        v_all = v_adv
    v_ij = v_adv[:, None, :] - v_all[j]
    dots = jnp.sum(v_ij * gradw, axis=-1)
    drho = st.particle_m * base.msum(dots, mask_f)
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        drho = drho + RHO_0 * base.msum(vol_j * dots, mask_s)
    if st.akinci:
        bdots = jnp.sum(v_adv[:, None, :] * bgradw, axis=-1)
        drho = drho + RHO_0 * base.msum(bvol * bdots, bm)
    rho_adv = drho * dt + rho

    # a_ii with the d_ji correction (iisph_solver.py:276-303). d_ji uses the
    # querying particle's own m/rho_i^2 in every branch (reference behavior):
    # d_ji = -dt^2 m/rho_i^2 gradW_ji = +dt^2 m/rho_i^2 gradW_ij.
    d_ji = (dt2 * st.particle_m * inv_rho_i2)[..., None] * gradw
    diff = d_ii[:, None, :] - d_ji                    # (Nf, K, 3)
    ddot = jnp.sum(diff * gradw, axis=-1)
    a_ii = base.msum(coeff * ddot, mask_f | mask_s)
    if st.akinci:
        d_ji_b = (dt2 * st.particle_m * inv_rho_i2)[..., None] * bgradw
        bddot = jnp.sum((d_ii[:, None, :] - d_ji_b) * bgradw, axis=-1)
        a_ii = a_ii + RHO_0 * base.msum(bvol * bddot, bm)

    p0 = 0.5 * p_past  # warm start (iisph_solver.py:67)

    # --- relaxed Jacobi solve (iisph_solver.py:78-147) ----------------------
    err_thresh = RHO_ERR_PERCENT * RHO_0 * 0.01

    def d_ij_of(p):
        term = (-st.particle_m * (p / (rho * rho))[jf])[..., None] * gradw
        return dt2 * base.msum(term, mask_f)          # fluid-only (py:306-314)

    def r_sum_of(p, d_ij):
        # Off-diagonal row sum (iisph_solver.py:229-253).
        d_ji_p = d_ji * p[:, None, None]              # d_ji scaled by p_i
        expr = (d_ij[:, None, :]
                - d_ii[jf] * p[jf][..., None]
                - (d_ij[jf] - d_ji_p))
        dot = jnp.sum(expr * gradw, axis=-1)
        out = st.particle_m * base.msum(dot, mask_f)
        if st.rigid_active and st.fs_couple and st.n_rigid > 0:
            sdot = jnp.sum(d_ij[:, None, :] * gradw, axis=-1)
            out = out + RHO_0 * base.msum(vol_j * sdot, mask_s)
        if st.akinci:
            bdot = jnp.sum(d_ij[:, None, :] * bgradw, axis=-1)
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

    zeros3 = jnp.zeros((st.n_fluid, 3), jnp.float32)
    p_iter, d_ij, r_sum, res, _, _, iters = jax.lax.while_loop(
        cond, body,
        (p0, zeros3, jnp.zeros(st.n_fluid, jnp.float32),
         jnp.float32(jnp.inf), jnp.float32(jnp.inf), jnp.zeros((), bool),
         jnp.zeros((), jnp.int32)))

    # --- integration (iisph_solver.py:150-206) ------------------------------
    f_press = (d_ij + d_ii * p_iter[:, None]) * st.particle_m / dt2

    rigid_force = rigid.force
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        # compute_rigid_force (iisph_solver.py:150-160): once per step.
        contrib = (vol_j * RHO_0 * (p_iter / (rho * rho))[:, None]
                   )[..., None] * gradw * st.particle_m
        rigid_force = base.scatter_rigid_force(st, nh, contrib, mask_s,
                                               rigid_force)

    new_vel = (v_adv + dt * f_press / st.particle_m) * base.ARTIFICIAL_FRICTION
    new_pos = pos + dt * new_vel
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
