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
update is a deterministic masked max/min/sum. Particle clouds are V3s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models.base import RigidBodyState
from cfd_taichi_tpu.ops.vec import V3, matvec
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


def body_bbox(rigid: RigidBodyState, particle_radius: float):
    """Rigid AABB relative to the centroid (reference init_boundary,
    rigid_solver.py:194-210 — including its quirk: the intended one-diameter
    shrink of max_boundary subtracts then re-adds the same vector, i.e. is a
    no-op; reproduced faithfully)."""
    rel_x = rigid.pos.x - rigid.centroid[0]
    rel_y = rigid.pos.y - rigid.centroid[1]
    rel_z = rigid.pos.z - rigid.centroid[2]
    hi = jnp.stack([rel_x.max(), rel_y.max(), rel_z.max()])
    lo = jnp.stack([rel_x.min(), rel_y.min(), rel_z.min()])
    d = 2.0 * particle_radius
    hi = hi - d + d  # rigid_solver.py:207-208 (intended shrink; net no-op)
    return lo, hi


def check_penetration(st: SceneStatic, rigid: RigidBodyState,
                      fluid_pos, bbox=None) -> jnp.ndarray:
    """Count fluid particles inside the rigid AABB — the reference's debug
    penetration detector (check_penetrate, rigid_solver.py:164-192, disabled
    at rigid_solver.py:234). Returns the offending count for telemetry."""
    if st.n_rigid == 0:
        return jnp.zeros((), jnp.int32)
    lo, hi = bbox if bbox is not None else body_bbox(rigid, st.particle_radius)
    rel_x = fluid_pos.x - rigid.centroid[0]
    rel_y = fluid_pos.y - rigid.centroid[1]
    rel_z = fluid_pos.z - rigid.centroid[2]
    inside = ((rel_x > lo[0]) & (rel_x < hi[0])
              & (rel_y > lo[1]) & (rel_y < hi[1])
              & (rel_z > lo[2]) & (rel_z < hi[2]))
    return jnp.sum(inside).astype(jnp.int32)


def step(st: SceneStatic, arrays: SceneArrays, rigid: RigidBodyState,
         dt: jnp.ndarray) -> RigidBodyState:
    if st.n_rigid == 0:
        return rigid

    g = jnp.array([0.0, -st.gravity, 0.0], jnp.float32)
    mass = arrays.rigid_mass_total

    # --- compute_attitude (rigid_solver.py:118-128) -------------------------
    rel = V3(rigid.pos.x - rigid.centroid[0], rigid.pos.y - rigid.centroid[1],
             rigid.pos.z - rigid.centroid[2])
    tq = rel.cross(rigid.force)
    torque = jnp.stack([jnp.sum(tq.x), jnp.sum(tq.y), jnp.sum(tq.z)])
    alpha = rigid.inertia_inv @ torque
    omega = rigid.omega + alpha * dt
    attitude = omega * dt

    # --- rotation (rigid_solver.py:130-141) ---------------------------------
    # R = rotation3d(-att.x, -att.z, -att.y) — the same swapped-argument quirk
    # as the initial attitude (see scene.rotation3d_swapped_jnp).
    rot = rotation3d_swapped_jnp(-attitude)
    pos = matvec(rot, rel)
    pos = V3(pos.x + rigid.centroid[0], pos.y + rigid.centroid[1],
             pos.z + rigid.centroid[2])
    vrel = V3(rigid.vertices.x - rigid.centroid[0],
              rigid.vertices.y - rigid.centroid[1],
              rigid.vertices.z - rigid.centroid[2])
    vertices = matvec(rot, vrel)
    vertices = V3(vertices.x + rigid.centroid[0], vertices.y + rigid.centroid[1],
                  vertices.z + rigid.centroid[2])
    inertia_inv = rot @ rigid.inertia_inv @ rot.T

    # --- kinematic (rigid_solver.py:33-104) ---------------------------------
    force_total = jnp.stack([jnp.sum(rigid.force.x), jnp.sum(rigid.force.y),
                             jnp.sum(rigid.force.z)])
    acc = force_total / mass + g
    vel = rigid.vel + acc * dt
    ori_disp = vel * dt

    margin = 2.0 * st.particle_radius
    lo = jnp.asarray(st.box_min, jnp.float32) + margin
    hi = jnp.asarray(st.box_max, jnp.float32) - margin

    pos_c = (pos.x, pos.y, pos.z)
    new_rel = V3(pos.x - rigid.centroid[0], pos.y - rigid.centroid[1],
                 pos.z - rigid.centroid[2])

    disp = []
    col_lo_any = []
    col_hi_any = []
    col_mask_per_axis = []
    omega_v = V3(omega[0], omega[1], omega[2])
    # Contact-point velocities v = vel + omega x (x + ori_disp - centroid).
    rel_pred = V3(new_rel.x + ori_disp[0], new_rel.y + ori_disp[1],
                  new_rel.z + ori_disp[2])
    v_contact = omega_v.cross(rel_pred)
    v_contact = V3(v_contact.x + vel[0], v_contact.y + vel[1],
                   v_contact.z + vel[2])
    vc = (v_contact.x, v_contact.y, v_contact.z)

    for axis in range(3):
        c = pos_c[axis]
        predicted = c + ori_disp[axis]
        viol_lo = predicted <= lo[axis]
        viol_hi = predicted >= hi[axis]
        # Displacement clamping (reference atomic max/min,
        # rigid_solver.py:58,67) as masked reductions.
        cand_lo = jnp.where(viol_lo, lo[axis] - c, -jnp.inf)
        d = jnp.maximum(ori_disp[axis], jnp.max(cand_lo, initial=-jnp.inf))
        cand_hi = jnp.where(viol_hi, hi[axis] - c, jnp.inf)
        d = jnp.minimum(d, jnp.min(cand_hi, initial=jnp.inf))
        disp.append(d)
        col_lo = viol_lo & (vc[axis] < 0.0)
        col_hi = viol_hi & (vc[axis] > 0.0)
        col_lo_any.append(jnp.any(col_lo))
        col_hi_any.append(jnp.any(col_hi))
        col_mask_per_axis.append(col_lo | col_hi)

    disp = jnp.stack(disp)
    col_any = jnp.stack(col_mask_per_axis, axis=1)  # (Nr, 3)
    cnt = jnp.sum(col_any)
    # Collision normal per axis: -1 for lo-side hits, +1 for hi-side (the
    # reference's last-writer race resolved deterministically, hi priority).
    norm = jnp.stack([
        jnp.where(col_hi_any[a], 1.0, jnp.where(col_lo_any[a], -1.0, 0.0))
        for a in range(3)])

    # Mean collision point — reproducing the reference's arithmetic exactly:
    # (sum_of_positions + ori_disp) / cnt - centroid (rigid_solver.py:81).
    psum = jnp.stack([
        jnp.sum(jnp.where(col_any, pos_c[a][:, None], 0.0)) for a in range(3)])
    safe_cnt = jnp.maximum(cnt, 1)
    col_point = (psum + ori_disp) / safe_cnt - rigid.centroid

    def with_impulse(args):
        vel_in, omega_in = args
        v = vel_in + jnp.cross(omega_in, col_point)
        v_new = _collision_response(v, norm)
        pm = _skew(col_point)
        K = jnp.eye(3) / mass - pm @ inertia_inv @ pm
        imp = jnp.linalg.solve(K, v_new - v)
        return (vel_in + imp / mass,
                omega_in + inertia_inv @ jnp.cross(col_point, imp))

    vel, omega = jax.lax.cond(cnt > 0, with_impulse, lambda a: a, (vel, omega))

    new_pos = V3(pos.x + disp[0], pos.y + disp[1], pos.z + disp[2])
    new_vertices = V3(vertices.x + disp[0], vertices.y + disp[1],
                      vertices.z + disp[2])
    new_centroid = rigid.centroid + disp

    return rigid._replace(
        pos=new_pos, vertices=new_vertices, vel=vel, omega=omega,
        alpha=alpha, acc=acc, force=V3.zeros(rigid.force.x.shape),
        centroid=new_centroid, inertia_inv=inertia_inv,
    )
