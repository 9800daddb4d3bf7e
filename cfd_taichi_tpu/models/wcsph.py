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
    pos, vel = fluid.pos, fluid.vel

    nh = base.build_neighborhood(st, arrays, pos, rigid.pos)

    # --- pressure phase (reference wcsph_solver.py:32-38) -------------------
    rho = base.compute_rho(st, arrays, nh, pos)
    p = tait_pressure(rho)

    j = nh.nbr.idx
    x_ij = base.pair_disp(pos, nh.pos_all, j)
    gcoef = sm.cubic_grad_coeff(x_ij.norm(), st.h)
    mask_f, mask_s = base.fluid_solid_masks(st, nh)

    p_over_rho2 = p / (rho * rho)                         # (Nf,)
    p_over_rho2_j = p_over_rho2[jnp.clip(j, 0, st.n_fluid - 1)]
    sym = p_over_rho2[:, None] + p_over_rho2_j            # (Nf, K)
    scale = jnp.where(mask_f, -st.particle_m * sym * gcoef, 0.0)

    force = rigid.force
    if st.rigid_active and st.fs_couple and st.n_rigid > 0:
        vol_j = base.gather_rigid_volume(st, arrays, j)
        s_scale = jnp.where(mask_s,
                            -vol_j * p_over_rho2[:, None] * RHO_0 * gcoef, 0.0)
        # Reaction on the rigid body: += -term * m (wcsph_solver.py:126).
        force = base.scatter_rigid_force(
            st, nh, x_ij * (-s_scale * st.particle_m), mask_s, force)
        scale = scale + s_scale
    pressure_acc = (x_ij * scale).sum(axis=1)

    viscosity = base.compute_viscosity(st, arrays, nh, pos, vel, rho, rigid,
                                       c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    tension = base.compute_tension(st, nh, pos, TENSION_K)

    # --- kinematic phase (reference wcsph_solver.py:40-63) ------------------
    acc = base.gravity_acc(st) + pressure_acc + viscosity + tension
    if st.akinci:
        acc = acc + RHO_0 * base.boundary_pressure_acc(st, arrays, nh, pos, p, rho)
    new_vel = (vel + acc * dt) * WCSPH_DAMPING
    new_pos = pos + new_vel * dt
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(
            st, new_pos, new_vel, margin=2.0 * st.particle_radius,
            decay_mul=-base.V_DECAY)

    return state._replace(
        fluid=base.FluidState(pos=new_pos, vel=new_vel, acc=acc),
        rigid=rigid._replace(force=force),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )


def density_error(st: SceneStatic, arrays: SceneArrays, state: base.SimState):
    """Average |rho - rho0| / rho0 telemetry (parity metric, SURVEY.md §6)."""
    nh = base.build_neighborhood(st, arrays, state.fluid.pos, state.rigid.pos)
    rho = base.compute_rho(st, arrays, nh, state.fluid.pos)
    return jnp.mean(jnp.abs(rho - RHO_0)) / RHO_0
