"""Impulse-based rigid body solver with box-collision response.

Functional parity with the reference `rigid_solver` (rigid_solver.py:1-234):
  * torque from accumulated fluid forces, alpha = I^-1 tau, omega += alpha dt
    (compute_attitude, rigid_solver.py:118-128)
  * incremental rotation of particles/vertices/I^-1 about the centroid using
    the same swapped-Euler rotation quirk (rotation, rigid_solver.py:130-141)
  * kinematics: F = sum of (then zeroed) fluid forces, a = F/M + g, box
    collision with displacement clamping (the reference's atomic max/min,
    rigid_solver.py:53-77, becomes per-axis masked reductions), impulse
    response j = K^-1 (v' - v) with K = 1/M - r~ I^-1 r~, friction mu_t=0.8,
    restitution decay 0.1 (rigid_solver.py:87-116)

All per-particle loops become vectorized reductions; every reference atomic
update is a deterministic masked max/min/sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models.base import RigidBodyState
from cfd_taichi_tpu.scene import SceneArrays, SceneStatic, rotation3d_swapped_jnp

MU_T = 0.8       # friction (rigid_solver.py:108)
MU_N = 0.1       # restitution decay v_decay_proportion (rigid_solver.py:24)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


def _collision_response(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """New contact-point velocity: tangential friction scaling + normal
    restitution (reference compute_new_vel, rigid_solver.py:106-116)."""
    v_n = jnp.dot(v, n) * n
    v_t = v - v_n
    vt_norm = jnp.maximum(jnp.linalg.norm(v_t), 1e-12)
    a = jnp.maximum(1.0 - MU_T * (1.0 + MU_N) * jnp.linalg.norm(v_n) / vt_norm, 0.0)
    return a * v_t - MU_N * v_n


def step(st: SceneStatic, arrays: SceneArrays, rigid: RigidBodyState,
         dt: jnp.ndarray) -> RigidBodyState:
    if st.n_rigid == 0:
        return rigid

    g = jnp.array([0.0, -st.gravity, 0.0], jnp.float32)
    mass = arrays.rigid_mass_total

    # --- compute_attitude (rigid_solver.py:118-128) -------------------------
    rel = rigid.pos - rigid.centroid
    torque = jnp.sum(jnp.cross(rel, rigid.force), axis=0)
    alpha = rigid.inertia_inv @ torque
    omega = rigid.omega + alpha * dt
    attitude = omega * dt

    # --- rotation (rigid_solver.py:130-141) ---------------------------------
    # R = rotation3d(-att.x, -att.z, -att.y) — the same swapped-argument quirk
    # as the initial attitude (see scene.rotation3d_swapped_jnp).
    rot = rotation3d_swapped_jnp(-attitude)
    pos = (rigid.pos - rigid.centroid) @ rot.T + rigid.centroid
    vertices = (rigid.vertices - rigid.centroid) @ rot.T + rigid.centroid
    inertia_inv = rot @ rigid.inertia_inv @ rot.T

    # --- kinematic (rigid_solver.py:33-104) ---------------------------------
    force_total = jnp.sum(rigid.force, axis=0)
    acc = force_total / mass + g
    vel = rigid.vel + acc * dt
    ori_disp = vel * dt

    lo = jnp.asarray(st.box_min, jnp.float32) + 2.0 * st.particle_radius
    hi = jnp.asarray(st.box_max, jnp.float32) - 2.0 * st.particle_radius

    predicted = pos + ori_disp[None, :]
    viol_lo = predicted <= lo[None, :]   # (Nr, 3)
    viol_hi = predicted >= hi[None, :]

    # Displacement clamping: the reference's atomic max (lo side) / min (hi
    # side) over per-particle correction displacements (rigid_solver.py:58,67).
    cand_lo = jnp.where(viol_lo, lo[None, :] - pos, -jnp.inf)
    disp = jnp.maximum(ori_disp, jnp.max(cand_lo, axis=0))
    cand_hi = jnp.where(viol_hi, hi[None, :] - pos, jnp.inf)
    disp = jnp.minimum(disp, jnp.min(cand_hi, axis=0))

    # Collision detection: a (particle, axis) pair collides when it violates
    # the wall and its contact-point velocity drives into it
    # (rigid_solver.py:59-72).
    v_contact = vel[None, :] + jnp.cross(
        jnp.broadcast_to(omega, pos.shape), predicted - rigid.centroid)
    col_lo = viol_lo & (v_contact < 0.0)
    col_hi = viol_hi & (v_contact > 0.0)
    col_any = col_lo | col_hi            # (Nr, 3) per (particle, axis)

    cnt = jnp.sum(col_any)
    # Collision normal per axis: -1 for lo-side hits, +1 for hi-side (the
    # reference's last-writer race resolved deterministically, hi priority).
    norm = jnp.where(jnp.any(col_hi, axis=0), 1.0,
                     jnp.where(jnp.any(col_lo, axis=0), -1.0, 0.0))

    # Mean collision point — reproducing the reference's arithmetic exactly:
    # (sum_of_positions + ori_disp) / cnt - centroid (rigid_solver.py:81).
    point_sum = jnp.sum(jnp.where(col_any[:, :, None],
                                  pos[:, None, :], 0.0), axis=(0, 1))
    safe_cnt = jnp.maximum(cnt, 1)
    col_point = (point_sum + ori_disp) / safe_cnt - rigid.centroid

    def with_impulse(args):
        vel_in, omega_in = args
        v = vel_in + jnp.cross(omega_in, col_point)
        v_new = _collision_response(v, norm)
        pm = _skew(col_point)
        K = jnp.eye(3) / mass - pm @ inertia_inv @ pm
        imp = jnp.linalg.solve(K, v_new - v)
        return vel_in + imp / mass, omega_in + inertia_inv @ jnp.cross(col_point, imp)

    vel, omega = jax.lax.cond(cnt > 0, with_impulse, lambda a: a, (vel, omega))

    new_pos = pos + disp[None, :]
    new_vertices = vertices + disp[None, :]
    new_centroid = rigid.centroid + disp

    return rigid._replace(
        pos=new_pos, vertices=new_vertices, vel=vel, omega=omega,
        alpha=alpha, acc=acc, force=jnp.zeros_like(rigid.force),
        centroid=new_centroid, inertia_inv=inertia_inv,
    )


