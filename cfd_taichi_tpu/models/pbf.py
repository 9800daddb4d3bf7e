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

Runs on the step's compact (N, K) neighbor lists (models/base.Nbh).
"""

from __future__ import annotations

import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu.scene import RHO_0, Scene, SceneArrays, SceneStatic

EPSILON = 1.0e-6          # pbf_solver.py:17
TENSION_K = 1e-7          # s_corr strength k (pbf_solver.py:19)
XSPH_C = 9e-6             # viscosity c (pbf_solver.py:20)
S_CORR_FACTOR = 0.3       # pbf_solver.py:21


def init_state(scene: Scene) -> base.SimState:
    return base.init_sim_state(scene, extra=())


def dense_eligible(st: SceneStatic) -> bool:
    """Dense-mode PBF: fluid-only scenes in the BAND regime (the window
    passes keep a start-validity mask the size of one band channel)."""
    from cfd_taichi_tpu.models import dfsph as _dfsph
    return (_dfsph.DENSE_FLUID
            and not (st.rigid_active and st.n_rigid > 0)
            and _dfsph.use_band_engine(st.n_fluid, st.band_nb))


def _step_dense(st: SceneStatic, arrays: SceneArrays,
                state: base.SimState) -> base.SimState:
    """Dense-mode PBF (fluid-only scenes): no compact lists. PBF is a
    single constraint pass, so the whole step is three dense window
    passes over one shared block plan (bandmat.dense_pbf_ops): the
    one-shot start-geometry sums, the lambda pass (the only pair sum
    that depends on lambda), and the XSPH pass at updated positions —
    plus the group-sparse PBF boundary pass (bandmat.pbf_boundary_terms).
    Algebra matches the compact step term-for-term (reference
    pbf_solver.py:26-96,106-174)."""
    from cfd_taichi_tpu.ops import bandmat

    import math

    fluid, dt = state.fluid, state.dt
    B = st.band_B
    # Host-float poly6(0.3 h) (sm.poly6_w closed form; st.h is static).
    t = 1.0 - S_CORR_FACTOR ** 2
    w_ref = 315.0 / (64.0 * math.pi * st.h ** 3) * t ** 3

    # vel/oid/acc ride the variadic cell sort as payloads
    # (base.sort_by_cells — element gathers are the slow primitive).
    dp = base.build_dense_prep(
        st, arrays, fluid.pos, st.band_nb_wide, B, want_bterms=False,
        extras=fluid.vel.astuple() + (fluid.oid,) + fluid.acc.astuple())
    pos, perm = dp.pos, dp.perm
    (vx_s, vy_s, vz_s, oid, ax_s, ay_s, az_s) = dp.extras
    vel_s = V3(vx_s, vy_s, vz_s)
    acc_s = V3(ax_s, ay_s, az_s)

    terms, lam_mv, xsph_of = bandmat.dense_pbf_ops(
        pos, h=st.h, m=st.particle_m, plan=dp.plan, B=B,
        w_ref=w_ref, k_corr=TENSION_K)

    # --- external force + predicted positions (pbf_solver.py:26-30) ---------
    vel = vel_s + base.gravity_acc(st) * dt
    pos_predict = pos + vel * dt

    # --- density + constraint (pbf_solver.py:127-130,166-174) ---------------
    rho = base.DENSITY_EPS + terms.rho
    gsum = terms.gsum
    around = terms.around
    ssum = terms.ssum
    if st.akinci:
        b_rho, b_g, b_around, b_ssum = bandmat.pbf_boundary_terms(
            dp.bwin, pos, h=st.h, rho0=float(RHO_0), B=B,
            w_ref=w_ref, k_corr=TENSION_K)
        rho = rho + b_rho
        gsum = gsum + b_g
        around = around + b_around
        ssum = ssum + b_ssum
    constraint = jnp.maximum(rho / RHO_0 - 1.0, 0.0)

    # --- lambda (pbf_solver.py:32-52) ----------------------------------------
    grad_c_i = gsum * jnp.float32(1.0 / RHO_0)
    denom = grad_c_i.dot(grad_c_i) + around * jnp.float32(1.0 / RHO_0 ** 2)
    lam = jnp.where(constraint == 0.0, 0.0,
                    -constraint / (denom + EPSILON))

    # --- delta positions with s_corr (pbf_solver.py:55-65,144-164) ----------
    # Fluid pairs: Sigma (lam_i + lam_j + s_corr) spiky_c x
    #            = lam_i * gsum_f + lam_mv(lam) + ssum_f.
    # Boundary pairs carry lam_i (+ s_corr) only (no lam_j): affine in
    # lam_i, folded into the same row constants.
    delta_pos = (gsum * lam + lam_mv(lam) + ssum) * jnp.float32(1.0 / RHO_0)

    # --- position/velocity update + XSPH (pbf_solver.py:67-96) --------------
    pos_predict = pos_predict + delta_pos
    new_vel = (pos_predict - pos) * (1.0 / dt)
    if not st.akinci:
        pos_predict, new_vel = base.clamp_to_box(
            st, pos_predict, new_vel, margin=st.particle_radius,
            decay_mul=base.V_DECAY)  # positive decay (pbf_solver.py:78,82)
    new_pos = pos_predict

    new_vel = new_vel + XSPH_C * xsph_of(new_pos, new_vel)

    return state._replace(
        overflow=dp.overflow,
        fluid=base.FluidState(pos=new_pos, vel=new_vel,
                              acc=acc_s, oid=oid),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )


def constraint_pass(st: SceneStatic, nbh: base.Nbh):
    """The PBF density constraint over one step's Nbh: density, lambda and
    the corrected position delta, all from start-of-step pair geometry
    (pbf_solver.py:32-65,106-174). Eager (PBF has no solver loop); shared
    verbatim by the single-chip step and the sharded physics callback
    (parallel/domain._pbf_physics). Returns (rho, lam, delta_pos)."""
    mask_f = nbh.mask_f
    spiky_c = sm.spiky_grad_coeff(nbh.r, st.h)   # gradW = spiky_c * x_ij
    poly_w = sm.poly6_w(nbh.r, st.h)
    if st.akinci:
        bspiky_c = sm.spiky_grad_coeff(nbh.br, st.h)
        bpoly_w = sm.poly6_w(nbh.br, st.h)

    # --- density (poly6) + constraint (pbf_solver.py:127-130,166-174) -------
    rho = base.DENSITY_EPS + st.particle_m * base.msum(poly_w, mask_f)
    if st.akinci:
        rho = rho + RHO_0 * base.msum(nbh.bvol * bpoly_w, nbh.bmask)
    constraint = jnp.maximum(rho / RHO_0 - 1.0, 0.0)

    # --- lambda (pbf_solver.py:32-52) ---------------------------------------
    gscale = jnp.where(mask_f, spiky_c / RHO_0, 0.0)
    grad_c_i = base.sum_vec(nbh.x, gscale)
    around = base.msum((nbh.r * spiky_c / RHO_0) ** 2, mask_f)
    if st.akinci:
        bgscale = jnp.where(nbh.bmask, bspiky_c / RHO_0, 0.0)
        grad_c_i = grad_c_i + base.sum_vec(nbh.bx, bgscale)
        around = around + base.msum((nbh.br * bspiky_c / RHO_0) ** 2,
                                    nbh.bmask)
    denom = grad_c_i.dot(grad_c_i) + around
    lam = jnp.where(constraint == 0.0, 0.0,
                    -constraint / (denom + EPSILON))

    # --- delta positions with s_corr (pbf_solver.py:55-65,144-164) ----------
    w_ref = sm.poly6_w(jnp.float32(S_CORR_FACTOR * st.h), st.h)
    s = poly_w / w_ref
    s2 = s * s
    s_corr = -TENSION_K * s2 * s2                        # quartic
    lam_q = lam[:, None]
    # 4-lane packed gather with distinct riders (base.jf_pack note).
    lam_j, _, _, _ = base.jf_pack(st, nbh, lam, rho, constraint, denom)
    pair_scale = jnp.where(
        mask_f, (lam_q + lam_j + s_corr) * spiky_c, 0.0)
    delta_pos = base.sum_vec(nbh.x, pair_scale)
    if st.akinci:
        bs = bpoly_w / w_ref
        bs2 = bs * bs
        bs_corr = -TENSION_K * bs2 * bs2
        bpair = jnp.where(nbh.bmask, (lam_q + bs_corr) * bspiky_c, 0.0)
        delta_pos = delta_pos + base.sum_vec(nbh.bx, bpair)
    delta_pos = delta_pos / RHO_0
    return rho, lam, delta_pos


def xsph_delta(st: SceneStatic, nbh: base.Nbh, new_pos: V3, new_vel: V3) -> V3:
    """XSPH viscosity sum over UPDATED positions/velocities (deterministic
    resolution of the reference's in-kernel race, see module docstring;
    pbf_solver.py:85-96). ONE 6-lane packed row gather for both fields:
    six single-lane gathers measure ~5x slower per index (base.jf_pack
    note). Caller scales by XSPH_C."""
    pjx, pjy, pjz, vjx, vjy, vjz = base.jf_pack(
        st, nbh, new_pos.x, new_pos.y, new_pos.z,
        new_vel.x, new_vel.y, new_vel.z)
    d_new = (new_pos.expand(1) - V3(pjx, pjy, pjz)).norm()
    w_x = sm.poly6_w(d_new, st.h)
    dv = V3(vjx, vjy, vjz) - new_vel.expand(1)
    return (dv * w_x).msum(nbh.mask_f)


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    if dense_eligible(st):
        return _step_dense(st, arrays, state)
    fluid, rigid, dt = state.fluid, state.rigid, state.dt

    nbh = base.build_nbh(st, arrays, fluid.pos, rigid.pos)
    pos = nbh.pos
    oid = fluid.oid[nbh.perm]

    # --- external force + predicted positions (pbf_solver.py:26-30) ---------
    vel = fluid.vel.take(nbh.perm) + base.gravity_acc(st) * dt
    pos_predict = pos + vel * dt

    # PBF is fluid-fluid (+ Akinci boundary) only.
    rho, lam, delta_pos = constraint_pass(st, nbh)

    # --- position/velocity update + XSPH (pbf_solver.py:67-96) --------------
    pos_predict = pos_predict + delta_pos
    new_vel = (pos_predict - pos) * (1.0 / dt)
    if not st.akinci:
        pos_predict, new_vel = base.clamp_to_box(
            st, pos_predict, new_vel, margin=st.particle_radius,
            decay_mul=base.V_DECAY)  # positive decay (pbf_solver.py:78,82)
    new_pos = pos_predict

    new_vel = new_vel + XSPH_C * xsph_delta(st, nbh, new_pos, new_vel)

    return state._replace(
        overflow=nbh.overflow,
        fluid=base.FluidState(pos=new_pos, vel=new_vel,
                              acc=fluid.acc.take(nbh.perm), oid=oid),
        t=state.t + dt,
        step_count=state.step_count + 1,
    )
