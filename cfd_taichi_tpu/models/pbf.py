"""PBF — Position-Based Fluids (Macklin & Mueller), single constraint pass.

Functional parity with the reference `pbf_solver` (pbf_solver.py:1-187):
  * predict positions from external accel      (pbf_solver.py:26-30)
  * density via poly6 (overridden compute_rho, pbf_solver.py:166-174),
    constraint C = max(rho/rho0 - 1, 0)        (pbf_solver.py:127-130)
  * lambda_i = -C / (|gradC_i|^2 + sum_j |gradC_j|^2 + eps), eps = 1e-6,
    spiky gradients scaled 1/rho0              (pbf_solver.py:32-52,106-142)
  * delta_pos with quartic s_corr artificial pressure (factor 0.3 h,
    k = 1e-7)                                  (pbf_solver.py:144-164)
  * single constraint iteration per step (no solver loop), then XSPH
    viscosity c = 9e-6 with poly6 weights      (pbf_solver.py:67-96,176-186)
  * clamp-mode margin = radius with *positive* velocity decay 0.5
    (pbf_solver.py:74-82 — unlike the other solvers' sign flip)

Deviations from the reference, both documented in SURVEY.md §7 pitfalls:
  * the reference's PBF callbacks still use the old index-passing convention
    while `for_all_neighbor` passes structs (pbf_solver.py:99-100,119-120,
    133-136,145-153,166-174 vs ParticleSystem.py:469) — broken as shipped;
    here one consistent convention is used throughout.
  * PBF has no rigid coupling (README.md:23): solid neighbors are ignored.
  * the reference's XSPH pass reads neighbor positions mid-update (a data
    race inside update_all_pos, pbf_solver.py:85-89); here the updated
    positions are used deterministically.
"""

from __future__ import annotations

import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.scene import RHO_0, Scene, SceneArrays, SceneStatic

EPSILON = 1.0e-6          # pbf_solver.py:17
TENSION_K = 1e-7          # s_corr strength k (pbf_solver.py:19)
XSPH_C = 9e-6             # viscosity c (pbf_solver.py:20)
S_CORR_FACTOR = 0.3       # pbf_solver.py:21


def init_state(scene: Scene) -> base.SimState:
    return base.init_sim_state(scene, extra=())


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    pos = fluid.pos

    nh = base.build_neighborhood(st, arrays, pos, rigid.pos)
    j = nh.nbr.idx
    mask_f = nh.nbr.mask & (j < st.n_fluid)   # PBF is fluid-fluid only
    jf = jnp.clip(j, 0, st.n_fluid - 1)
    x_ij = pos[:, None, :] - nh.pos_all[j]
    r_ij = jnp.linalg.norm(x_ij, axis=-1)
    spiky_g = sm.spiky_grad(x_ij, st.h)
    poly_w = sm.poly6_w(r_ij, st.h)
    if st.akinci:
        bj, bm = nh.bnbr.idx, nh.bnbr.mask
        xb = pos[:, None, :] - arrays.boundary_pos[bj]
        bspiky_g = sm.spiky_grad(xb, st.h)
        bpoly_w = sm.poly6_w(jnp.linalg.norm(xb, axis=-1), st.h)
        bvol = arrays.boundary_volume[bj]

    # --- external force + predicted positions (pbf_solver.py:26-30) ---------
    vel = fluid.vel + dt * base.gravity_acc(st)[None, :]
    pos_predict = pos + dt * vel

    # --- density (poly6) + constraint (pbf_solver.py:127-130,166-174) -------
    rho = base.DENSITY_EPS + st.particle_m * base.msum(poly_w, mask_f)
    if st.akinci:
        rho = rho + RHO_0 * base.msum(bvol * bpoly_w, bm)
    constraint = jnp.maximum(rho / RHO_0 - 1.0, 0.0)

    # --- lambda (pbf_solver.py:32-52) ---------------------------------------
    grad_c_j = spiky_g / RHO_0                           # (Nf, K, 3)
    grad_c_i = base.msum(grad_c_j, mask_f)
    if st.akinci:
        grad_c_i = grad_c_i + base.msum(bspiky_g / RHO_0, bm)
    around = base.msum(jnp.sum(grad_c_j * grad_c_j, axis=-1), mask_f)
    if st.akinci:
        bgc = bspiky_g / RHO_0
        around = around + base.msum(jnp.sum(bgc * bgc, axis=-1), bm)
    denom = jnp.sum(grad_c_i * grad_c_i, axis=-1) + around
    lam = jnp.where(constraint == 0.0, 0.0,
                    -constraint / (denom + EPSILON))

    # --- delta positions with s_corr (pbf_solver.py:55-65,144-164) ----------
    w_ref = sm.poly6_w(jnp.float32(S_CORR_FACTOR * st.h), st.h)
    s = poly_w / w_ref
    s2 = s * s
    s_corr = -TENSION_K * s2 * s2                        # quartic
    pair = (lam[:, None] + lam[jf] + s_corr)[..., None] * spiky_g
    delta_pos = base.msum(pair, mask_f)
    if st.akinci:
        bs = bpoly_w / w_ref
        bs2 = bs * bs
        bs_corr = -TENSION_K * bs2 * bs2
        bpair = (lam[:, None] + bs_corr)[..., None] * bspiky_g
        delta_pos = delta_pos + base.msum(bpair, bm)
    delta_pos = delta_pos / RHO_0

    # --- position/velocity update + XSPH (pbf_solver.py:67-96) --------------
    pos_predict = pos_predict + delta_pos
    new_vel = (pos_predict - pos) / dt
    if not st.akinci:
        pos_predict, new_vel = base.clamp_to_box(
            st, pos_predict, new_vel, margin=st.particle_radius,
            decay_mul=base.V_DECAY)  # positive decay (pbf_solver.py:78,82)
    new_pos = pos_predict

    # XSPH over updated positions/velocities (deterministic resolution of
    # the reference's in-kernel race, see module docstring).
    xs = new_pos[:, None, :] - new_pos[jf]
    w_x = sm.poly6_w(jnp.linalg.norm(xs, axis=-1), st.h)
    dv = (new_vel[jf] - new_vel[:, None, :]) * w_x[..., None]
    new_vel = new_vel + XSPH_C * base.msum(dv, mask_f)

    return state._replace(
        fluid=base.FluidState(pos=new_pos, vel=new_vel, acc=fluid.acc),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )
