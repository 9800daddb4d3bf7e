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
device->host scalar sync per iteration) become on-device `lax.while_loop`s.
All pair math is component-separated (V3) for clean TPU tiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models import base
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


class _Pairs:
    """Step-constant pair geometry shared by all passes (2-D buffers only)."""

    def __init__(self, st: SceneStatic, arrays: SceneArrays, nh, pos: V3,
                 rigid: base.RigidBodyState):
        self.st = st
        self.rigid = rigid
        self.j = nh.nbr.idx
        self.jf = jnp.clip(self.j, 0, st.n_fluid - 1)
        self.x_ij = base.pair_disp(pos, nh.pos_all, self.j)
        self.gcoef = sm.cubic_grad_coeff(self.x_ij.norm(), st.h)
        self.mask_f, self.mask_s = base.fluid_solid_masks(st, nh)
        self.vol_j = base.gather_rigid_volume(st, arrays, self.j)
        if st.akinci:
            self.bj, self.bm = nh.bnbr.idx, nh.bnbr.mask
            self.xb = base.pair_disp(pos, arrays.boundary_pos, self.bj)
            self.bgcoef = sm.cubic_grad_coeff(self.xb.norm(), st.h)
            self.bvol = arrays.boundary_volume[self.bj]
        if st.rigid_active and st.n_rigid > 0:
            # Rigid particle offsets from the centroid (contact velocities).
            self.rigid_rel = V3(nh.pos_all.x[st.n_fluid:] - rigid.centroid[0],
                                nh.pos_all.y[st.n_fluid:] - rigid.centroid[1],
                                nh.pos_all.z[st.n_fluid:] - rigid.centroid[2])

    def grad_dot_x(self, v: V3) -> jnp.ndarray:
        """v . gradW for each pair, where gradW = gcoef * x_ij."""
        return v.dot(self.x_ij) * self.gcoef


def _rigid_vel_at(pairs: _Pairs, dt, include_alpha: bool) -> V3:
    """v_j of a solid neighbor: body vel + acc*dt + (omega [+ alpha*dt]) x r
    (dfsph_solver.py:163-170 density path with alpha; 288-294 divergence
    path without)."""
    rigid = pairs.rigid
    om = rigid.omega + (rigid.alpha * dt if include_alpha else 0.0)
    lin = rigid.vel + rigid.acc * dt
    omega_v = V3(om[0], om[1], om[2])
    rel = pairs.rigid_rel
    spin = omega_v.cross(rel)
    return V3(lin[0] + spin.x, lin[1] + spin.y, lin[2] + spin.z)


def _dynamic_vel(st: SceneStatic, pairs: _Pairs, vel_f: V3, v_rigid) -> V3:
    if st.rigid_active and st.n_rigid > 0:
        return base.concat_v3(vel_f, v_rigid)
    return vel_f


def _alpha_factor(st: SceneStatic, pairs: _Pairs, rho):
    """alpha_i = rho_i / (|S_f|^2 + Q_f + Q_b + |S_b|^2), guard < 1e-6 -> 0
    (dfsph_solver.py:32-51; note the boundary vector sum is squared
    separately — reference quirk preserved)."""
    coeff = jnp.where(pairs.mask_f, st.particle_m,
                      jnp.where(pairs.mask_s, pairs.vol_j * RHO_0, 0.0))
    scale = coeff * pairs.gcoef
    vec = pairs.x_ij * scale                       # (N, K) components
    s = vec.sum(axis=1)                            # V3 of (N,)
    q = base.msum(vec.dot(vec), pairs.mask_f | pairs.mask_s)
    denom = s.dot(s) + q
    if st.akinci:
        bscale = pairs.bvol * RHO_0 * pairs.bgcoef
        bvec = (pairs.xb * bscale).where(pairs.bm)
        sb = bvec.sum(axis=1)
        qb = base.msum(bvec.dot(bvec), pairs.bm)
        denom = denom + qb + sb.dot(sb)
    return jnp.where(jnp.abs(denom) < 1e-6, 0.0, rho / denom)


def _stiff_vel_delta(st: SceneStatic, pairs: _Pairs, k_over_rho,
                     extra_fluid_guard: bool = False):
    """Common stiffness velocity update used by warm start, divergence and
    density iterations: Sum_f m (ki/ri + kj/rj) gradW + Sum_s V rho0 ki/ri
    gradW + rho0 * Sum_b V ki/ri gradW. `k_over_rho` = k_i / rho_i (Nf,).
    With `extra_fluid_guard`, fluid pairs only contribute when the combined
    factor > 1e-5 (dfsph_solver.py:367). Returns (delta V3, solid scale or
    None for the rigid-force scatter)."""
    kij = k_over_rho[:, None] + k_over_rho[pairs.jf]
    mf = pairs.mask_f & (kij > 1e-5) if extra_fluid_guard else pairs.mask_f
    scale = jnp.where(mf, st.particle_m * kij * pairs.gcoef, 0.0)
    solid_scale = None
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        solid_scale = jnp.where(
            pairs.mask_s,
            pairs.vol_j * RHO_0 * k_over_rho[:, None] * pairs.gcoef, 0.0)
        scale = scale + solid_scale
    out = (pairs.x_ij * scale).sum(axis=1)
    if st.akinci:
        bscale = jnp.where(
            pairs.bm, pairs.bvol * k_over_rho[:, None] * pairs.bgcoef, 0.0)
        out = out + RHO_0 * (pairs.xb * bscale).sum(axis=1)
    return out, solid_scale


def _rho_derivative(st: SceneStatic, pairs: _Pairs, vel: V3, counts, dt):
    """max(sum (v_i - v_j) . gradW terms, 0) with <20-neighbor skip; returns
    (dr array, avg over positive entries) (dfsph_solver.py:252-300)."""
    if st.rigid_active and st.n_rigid > 0:
        v_rigid = _rigid_vel_at(pairs, dt, include_alpha=False)
    else:
        v_rigid = None
    v_all = _dynamic_vel(st, pairs, vel, v_rigid)
    v_ij = vel.expand(1) - v_all.take(pairs.j)
    dots = v_ij.dot(pairs.x_ij) * pairs.gcoef
    dr = st.particle_m * base.msum(dots, pairs.mask_f)
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        dr = dr + RHO_0 * base.msum(pairs.vol_j * dots, pairs.mask_s)
    if st.akinci:
        bdots = vel.expand(1).dot(pairs.xb) * pairs.bgcoef
        dr = dr + RHO_0 * base.msum(pairs.bvol * bdots, pairs.bm)
    dr = jnp.where(counts < MIN_NEIGHBORS, 0.0, jnp.maximum(dr, 0.0))
    pos_mask = dr > 0.0
    cnt = jnp.sum(pos_mask)
    avg = jnp.where(cnt > 0, jnp.sum(jnp.where(pos_mask, dr, 0.0)) / cnt, 0.0)
    return dr, avg


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    fluid, rigid = state.fluid, state.rigid
    pos, vel = fluid.pos, fluid.vel
    dt = state.dt
    (warm_k,) = state.extra

    nh = base.build_neighborhood(st, arrays, pos, rigid.pos)
    pairs = _Pairs(st, arrays, nh, pos, rigid)
    counts = nh.nbr.count

    # --- initialize: rho + alpha (dfsph_solver.py:423-426) ------------------
    rho = base.compute_rho(st, arrays, nh, pos)
    alpha = _alpha_factor(st, pairs, rho)

    # --- divergence solve (dfsph_solver.py:393-416) -------------------------
    if WARM_START:
        delta, _ = _stiff_vel_delta(st, pairs, (warm_k / dt) / rho)
        vel = vel - delta * dt
        warm_k = jnp.zeros_like(warm_k)

    dr0, avg0 = _rho_derivative(st, pairs, vel, counts, dt)

    def div_cond(carry):
        _, _, _, avg, _, stop, it = carry
        return (((it < MIN_ITER_DIV) | (avg > DIV_THRESHOLD))
                & (it < MAX_ITER_DIV) & jnp.logical_not(stop))

    def div_body(carry):
        v, wk, dr, avg, past, _, it = carry
        k_over_rho = (dr * alpha / dt) / rho
        delta, _ = _stiff_vel_delta(st, pairs, k_over_rho,
                                    extra_fluid_guard=True)
        v = v - delta * dt
        wk = wk + dr * alpha          # sum_up_stiff (dfsph_solver.py:381-384)
        new_dr, new_avg = _rho_derivative(st, pairs, v, counts, dt)
        stop = jnp.abs(new_avg - avg) < STALL_EPS
        return (v, wk, new_dr, new_avg, avg, stop, it + 1)

    vel, warm_k, _, div_avg, _, _, div_iters = jax.lax.while_loop(
        div_cond, div_body,
        (vel, warm_k, dr0, avg0, jnp.zeros(()), jnp.zeros((), bool),
         jnp.zeros((), jnp.int32)))

    # --- external forces + v_adv + adaptive dt (dfsph_solver.py:91-122) -----
    tension = base.compute_tension(st, nh, pos, TENSION_K)
    viscosity = base.compute_viscosity(st, arrays, nh, pos, vel, rho, rigid,
                                       c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    force_ext = base.gravity_acc(st) + tension + viscosity
    vel_adv = vel + force_ext * (dt / st.particle_m)

    max_vel = jnp.max(vel_adv.norm())
    if st.rigid_active and st.n_rigid > 0:
        rel = pairs.rigid_rel
        omega_v = V3(rigid.omega[0], rigid.omega[1], rigid.omega[2])
        spin = omega_v.cross(rel).norm()
        max_vel = max_vel + jnp.max(jnp.linalg.norm(rigid.vel) + spin)
    if ADAPTIVE_DT:
        cfl_dt = 0.4 * (2.0 * st.particle_radius) / max_vel * 0.2
        dt = jnp.clip(cfl_dt, MIN_DT, MAX_DT)
    dt2 = dt * dt

    # --- density solve (dfsph_solver.py:221-233) ----------------------------
    def rho_adv_of(v_adv: V3):
        if st.rigid_active and st.n_rigid > 0:
            v_rigid = _rigid_vel_at(pairs, dt, include_alpha=True)
        else:
            v_rigid = None
        v_all = _dynamic_vel(st, pairs, v_adv, v_rigid)
        v_ij = v_adv.expand(1) - v_all.take(pairs.j)
        dots = v_ij.dot(pairs.x_ij) * pairs.gcoef
        d = st.particle_m * base.msum(dots, pairs.mask_f)
        if st.rigid_active and st.fs_couple and st.n_rigid > 0:
            d = d + RHO_0 * base.msum(pairs.vol_j * dots, pairs.mask_s)
        if st.akinci:
            bdots = v_adv.expand(1).dot(pairs.xb) * pairs.bgcoef
            d = d + RHO_0 * base.msum(pairs.bvol * bdots, pairs.bm)
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
        delta, solid_scale = _stiff_vel_delta(st, pairs, k_over_rho)
        if solid_scale is not None:
            # Rigid reaction accumulates every density iteration
            # (dfsph_solver.py:204-212).
            contrib = pairs.x_ij * (solid_scale * st.particle_m)
            rforce = base.scatter_rigid_force(st, nh, contrib, pairs.mask_s,
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
        fluid=base.FluidState(pos=new_pos, vel=new_vel, acc=fluid.acc),
        rigid=rigid._replace(force=rigid_force),
        dt=dt,
        t=state.t + dt,
        step_count=state.step_count + 1,
        extra=(warm_k,),
    )
