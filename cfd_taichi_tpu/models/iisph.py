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
(iisph_solver.py:78-99) becomes an on-device `lax.while_loop` over the
step's compact (N, K) neighbor lists (models/base.Nbh); positions are fixed
during the solve, so all pair geometry is hoisted out of the loop.
"""

from __future__ import annotations

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


def predict_advection(st: SceneStatic, nbh, rho, v_adv: V3, rigid, dt,
                      has_rigid: bool):
    """d_ii displacement factors, advected density rho_adv, and diagonal
    a_ii with the d_ji correction (iisph_solver.py:36-75,255-340) — shared
    by the single-chip and sharded solvers. Returns (d_ii, rho_adv, a_ii,
    pair tensors reused by the loop: gc_f, gc_b, inv_rho2, r2)."""
    dt2 = dt * dt
    gc_f = sm.cubic_grad_coeff(nbh.r, st.h)
    gc_b = sm.cubic_grad_coeff(nbh.br, st.h) if st.akinci else None
    inv_rho2 = (1.0 / (rho * rho))[:, None]   # (N, 1)

    # d_ii = dt^2 [ -sum_f m/rho_i^2 gradW - sum_s V rho0/rho_i^2 gradW
    #               - rho0 sum_b V_b/rho_i^2 gradW ]  (iisph_solver.py:255-273)
    scale = jnp.where(nbh.mask_f, -st.particle_m * inv_rho2 * gc_f, 0.0)
    if has_rigid:
        scale = scale + jnp.where(
            nbh.mask_s, -nbh.rigid_vol * RHO_0 * inv_rho2 * gc_f, 0.0)
    d_ii = base.sum_vec(nbh.x, scale)
    if st.akinci:
        scale_b = jnp.where(nbh.bmask, -nbh.bvol * inv_rho2 * gc_b, 0.0)
        d_ii = d_ii + RHO_0 * base.sum_vec(nbh.bx, scale_b)
    d_ii = d_ii * dt2

    # rho_adv (iisph_solver.py:57-66, 316-340): rigid neighbor velocity uses
    # omega + alpha dt about the centroid.
    if has_rigid:
        v_r = base.rigid_contact_vel(st, rigid, dt, include_alpha=True)
        v_all = V3(jnp.concatenate([v_adv.x, v_r.x]),
                   jnp.concatenate([v_adv.y, v_r.y]),
                   jnp.concatenate([v_adv.z, v_r.z]))
    else:
        v_all = v_adv
    v_ij = v_adv.expand(1) - V3(*base.jall_pack(nbh, v_all.x, v_all.y,
                                                v_all.z))
    dots = v_ij.dot(nbh.x) * gc_f
    drho = st.particle_m * base.msum(dots, nbh.mask_f)
    if has_rigid:
        drho = drho + RHO_0 * base.msum(nbh.rigid_vol * dots, nbh.mask_s)
    if st.akinci:
        dots_b = (v_adv.x[:, None] * nbh.bx.x + v_adv.y[:, None] * nbh.bx.y
                  + v_adv.z[:, None] * nbh.bx.z) * gc_b
        drho = drho + RHO_0 * base.msum(nbh.bvol * dots_b, nbh.bmask)
    rho_adv = drho * dt + rho

    # a_ii with the d_ji correction (iisph_solver.py:276-303). d_ji uses the
    # querying particle's own m/rho_i^2 in every branch (reference behavior):
    # d_ji = +dt^2 m/rho_i^2 gradW_ij, so
    # (d_ii_i - d_ji).gradW = d_ii.gradW - dt^2 m/rho_i^2 gc^2 |x|^2.
    r2 = nbh.r * nbh.r
    dii_dot = (d_ii.x[:, None] * nbh.x.x + d_ii.y[:, None] * nbh.x.y
               + d_ii.z[:, None] * nbh.x.z)
    dji = dt2 * st.particle_m * inv_rho2 * gc_f
    ddot = (dii_dot - dji * r2) * gc_f
    a_ii = st.particle_m * base.msum(ddot, nbh.mask_f)
    if has_rigid:
        a_ii = a_ii + RHO_0 * base.msum(nbh.rigid_vol * ddot, nbh.mask_s)
    if st.akinci:
        dii_dot_b = (d_ii.x[:, None] * nbh.bx.x + d_ii.y[:, None] * nbh.bx.y
                     + d_ii.z[:, None] * nbh.bx.z)
        dji_b = dt2 * st.particle_m * inv_rho2 * gc_b
        ddot_b = (dii_dot_b - dji_b * (nbh.br * nbh.br)) * gc_b
        a_ii = a_ii + RHO_0 * base.msum(nbh.bvol * ddot_b, nbh.bmask)
    return d_ii, rho_adv, a_ii, gc_f, gc_b, inv_rho2, r2


def loop_operators(st: SceneStatic, nbh, rho, d_ii: V3, a_ii, rho_adv,
                   gc_f, gc_b, inv_rho2, r2, dt2, has_rigid: bool,
                   resid_mask=None, allreduce=None):
    """The relaxed-Jacobi loop algebra (iisph_solver.py:78-147,229-253),
    defined ONCE for the single-chip and sharded solvers. Returns
    (d_ij_of(p), r_sum_of(p, d_ij), residual_of(p, r_sum))."""
    red = allreduce if allreduce is not None else (lambda x: x)

    # d_ii is fixed during the solve: gather its neighbor values ONCE and
    # close over the (N, K) tensors instead of re-gathering per iteration.
    dii_jx = base.jf_v3(st, nbh, d_ii)

    def d_ij_of(p):
        # d_ij = -dt^2 sum_f m p_j/rho_j^2 gradW (fluid-only, py:306-314).
        # 4-lane packed gather with distinct riders (in-loop single-lane
        # gathers lower to a ~2.5x-slower emitter).
        pr = p / (rho * rho)
        pj_term, _, _, _ = base.jf_pack(st, nbh, pr, rho, p, pr * rho)
        scale = jnp.where(nbh.mask_f, -st.particle_m * pj_term * gc_f, 0.0)
        return base.sum_vec(nbh.x, scale) * dt2

    def r_sum_of(p, d_ij: V3):
        # Off-diagonal row sum (iisph_solver.py:229-253):
        # sum_f m (d_ij_i - d_ii_j p_j - (d_ij_j - d_ji p_i)) . gradW
        djx, djy, djz, p_j = base.jf_pack(st, nbh, d_ij.x, d_ij.y, d_ij.z, p)
        dij_jx = V3(djx, djy, djz)
        # e = dij_i - dii_j p_j - dij_j, and + d_ji p_i with
        # d_ji p_i = dt^2 m/rho_i^2 p_i * gc * x_ij.
        ex = d_ij.x[:, None] - dii_jx.x * p_j - dij_jx.x
        ey = d_ij.y[:, None] - dii_jx.y * p_j - dij_jx.y
        ez = d_ij.z[:, None] - dii_jx.z * p_j - dij_jx.z
        dji_p = dt2 * st.particle_m * inv_rho2 * p[:, None] * gc_f
        dot = (ex * nbh.x.x + ey * nbh.x.y + ez * nbh.x.z
               + dji_p * r2) * gc_f
        out = st.particle_m * base.msum(dot, nbh.mask_f)
        dij_dot = (d_ij.x[:, None] * nbh.x.x + d_ij.y[:, None] * nbh.x.y
                   + d_ij.z[:, None] * nbh.x.z) * gc_f
        if has_rigid:
            out = out + RHO_0 * base.msum(nbh.rigid_vol * dij_dot,
                                          nbh.mask_s)
        if st.akinci:
            bdot = (d_ij.x[:, None] * nbh.bx.x + d_ij.y[:, None] * nbh.bx.y
                    + d_ij.z[:, None] * nbh.bx.z) * gc_b
            out = out + RHO_0 * base.msum(nbh.bvol * bdot, nbh.bmask)
        return out

    def residual_of(p, r_sum):
        active = p > 0.0
        if resid_mask is not None:
            active = active & resid_mask
        cnt = red(jnp.sum(active))
        total = red(jnp.sum(jnp.where(
            active, a_ii * p + r_sum + rho_adv - RESIDUAL_REF, 0.0)))
        return jnp.where(cnt > 0, total / cnt, 0.0)

    return d_ij_of, r_sum_of, residual_of


def dense_pre_terms(st: SceneStatic, eng, rt=None):
    """One-shot sums of the dense-mode Jacobi algebra — defined ONCE for
    the single-chip `_step_dense` and the sharded dense callback
    (parallel/domain._iisph_physics) so the two cannot drift. `rt`
    carries the rigid term sums (rigid_dense.rigid_terms) on coupled
    scenes; summation order (rigid before Akinci) matches the original
    inline code bit-for-bit."""
    rho = base.DENSITY_EPS + eng.rho_f
    S_all = eng.S0
    g2_sb = jnp.zeros_like(rho)
    if rt is not None:
        rho = rho + rt.rho
        S_all = S_all + rt.s
        g2_sb = g2_sb + rt.g2
    if st.akinci:
        bt = eng.dp.bterms
        rho = rho + bt.rho
        S_all = S_all + bt.s
        g2_sb = g2_sb + bt.g2
    tension = eng.tvec * jnp.float32(-TENSION_K * st.particle_m)
    return rho, S_all, g2_sb, tension


def dense_jacobi_ops(eng, S_all, inv_rho2, d_ii, dt2):
    """Per-iteration dense-engine contractions (d_ij and the off-diagonal
    r_sum; _step_dense docstring derivation), shared single-chip/sharded."""
    cP = dt2 * inv_rho2 * eng.qsum  # the d_ji correction row constant

    def d_ij_of(p):
        return eng.mv(p * inv_rho2) * (-dt2)

    def r_sum_of(p, d_ij):
        return (d_ij.dot(S_all) - eng.mvd(d_ij) - eng.mvd(d_ii * p)
                + cP * p)

    return d_ij_of, r_sum_of


def jacobi_loop(d_ij_of, r_sum_of, residual_of, p0, a_ii, rho_adv,
                unroll: int = 1, project=None):
    """The reference's `pressure_solve` control flow (iisph_solver.py:78-99)
    as ONE on-device while loop, shared by the single-chip compact/dense
    steps and the sharded physics callback (parallel/domain._iisph_physics)
    so the three can never drift. Per iteration, in the reference's order:

      d_ij <- d_ij_of(p);  r_sum <- r_sum_of(p, d_ij)     (compute_all_d_ij
                                                           + update_p's row
                                                           sums, py:121-137)
      p <- max(relaxed Jacobi update, 0)                  (update_p, 139-146)
      l += 1;  residual <- residual_of(p, r_sum)          (py:92-95; the
          residual reads the POST-update p against the PRE-update r_sum —
          compute_residual consumes the r_sum buffer update_p just wrote)
      break if residual - previous residual > 0           (divergence-trend
          break, py:91-93 — fires on ANY increase, no check on iter 1)

    The loop exits either converged (residual <= 0.1% rho0, py:83) or via
    the trend break with the residual still ABOVE tolerance — the
    reference itself overshoots its printed contract on hot states, which
    is why a hot-phase bench row may legitimately report >0.1%
    (tests/test_solvers.py::test_iisph_trend_break_matches_reference pins
    this equivalence). `project` post-processes each clamped update (the
    sharded path exchanges owner rows into ghost slots); identity-like
    (plain clamp) when None. Returns (p, d_ij, r_sum, res, iters)."""
    from cfd_taichi_tpu.ops.loops import while_loop_unrolled

    err_thresh = RHO_ERR_PERCENT * RHO_0 * 0.01
    n = p0.shape[0]

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
        if project is None:
            p = jnp.maximum(p_new, 0.0)
        else:
            p = project(p_new)
        new_res = residual_of(p, r_sum)
        stop = (l >= 1) & (new_res - res > 0.0)
        return (p, d_ij, r_sum, new_res, res, stop, l + 1)

    p, d_ij, r_sum, res, _, _, iters = while_loop_unrolled(
        cond, body,
        (p0, V3.zeros((n,)), jnp.zeros(n, jnp.float32),
         jnp.float32(jnp.inf), jnp.float32(jnp.inf), jnp.zeros((), bool),
         jnp.zeros((), jnp.int32)), unroll=unroll)
    return p, d_ij, r_sum, res, iters


def dense_residual_fn(a_ii, rho_adv, resid_mask=None, allreduce=None):
    """The positive-pressure residual average (iisph_solver.py:101-113;
    RESIDUAL_REF keeps the hardcoded-1000 quirk). `resid_mask`/`allreduce`
    restrict the average to owned rows and psum it in the sharded path."""
    def residual_of(p, r_sum):
        active = p > 0.0
        if resid_mask is not None:
            active = active & resid_mask
        cnt = jnp.sum(active.astype(jnp.float32))
        total = jnp.sum(jnp.where(
            active, a_ii * p + r_sum + rho_adv - RESIDUAL_REF, 0.0))
        if allreduce is not None:
            cnt, total = allreduce(cnt), allreduce(total)
        return jnp.where(cnt > 0, total / cnt, 0.0)

    return residual_of


def _step_dense(st: SceneStatic, arrays: SceneArrays,
                state: base.SimState) -> base.SimState:
    """Dense-mode IISPH (fluid-only scenes): no compact lists; the
    relaxed-Jacobi iteration runs on the shared dense loop engine
    (models.dfsph.build_dense_engine). Every pair sum reduces to engine
    operators — per iteration ONE matvec (d_ij) plus TWO matvec_dots
    (the d_ij and d_ii*p off-diagonal contractions); the d_ji correction
    and all Akinci boundary terms are loop-constant row sums:

      d_ii    = -dt^2/rho^2 (S_f + S_b)
      rho_adv = rho + dt [v_adv . (S_f + S_b) - mvd(v_adv)]
      a_ii    = d_ii . (S_f + S_b) - dt^2 m/rho^2 (qsum/m + g2_b)
      d_ij(p) = -dt^2 mv(p/rho^2)
      r_sum   = d_ij . (S_f + S_b) - mvd(d_ij) - mvd(d_ii p)
                + dt^2 qsum/rho^2 p

    with S_f/qsum the fluid gradW row sums (DenseEngine) and S_b/g2_b the
    group-sparse boundary sums (bandmat.DenseBoundaryTerms). Algebra
    matches predict_advection/loop_operators term-for-term (reference
    iisph_solver.py:36-147,229-340)."""
    from cfd_taichi_tpu.models import dfsph as _dfsph
    from cfd_taichi_tpu.ops import bandmat
    from cfd_taichi_tpu.ops import rigid_dense

    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    (p_past,) = state.extra
    dt2 = dt * dt
    n = st.n_fluid
    has_rigid = st.rigid_active and st.n_rigid > 0

    # vel/oid/p_past/acc ride the variadic cell sort as payloads
    # (base.sort_by_cells — element gathers are the slow primitive).
    eng = _dfsph.build_dense_engine(
        st, arrays, fluid.pos,
        extras=fluid.vel.astuple() + (fluid.oid, p_past)
        + fluid.acc.astuple())
    pos, perm = eng.pos, eng.perm
    (vx_s, vy_s, vz_s, oid, p_past, ax_s, ay_s, az_s) = eng.dp.extras
    vel = V3(vx_s, vy_s, vz_s)
    acc_s = V3(ax_s, ay_s, az_s)

    overflow = eng.overflow
    rt = rw = None
    if has_rigid:
        # Fluid-solid terms through the group-sparse rigid windows
        # (ops/rigid_dense): rt.s folds into every S_all contraction
        # (d_ii, a_ii, r_sum), rt.g2 into the d_ji correction, and the
        # solid rho_adv velocity dot is the loop-constant contact dot.
        rw = rigid_dense.build_rigid_windows(
            st, pos, eng.dp.qcells, rigid.pos, arrays.rigid_volume,
            cap=st.rq_cap)
        rt = rigid_dense.rigid_terms(st, rw, float(RHO_0), n)
        overflow = jnp.maximum(overflow, rw.overflow)
    rho, S_all, g2_sb, tension = dense_pre_terms(st, eng, rt)
    inv_rho2 = 1.0 / (rho * rho)

    # --- predict advection ---------------------------------------------------
    viscosity = _dfsph.dense_visc(st, eng, vel, rho)
    if has_rigid:
        rho_orig = jnp.zeros_like(rho).at[oid].set(rho)
        rho_quirk = rho_orig[jnp.clip(
            jnp.arange(st.n_rigid, dtype=jnp.int32), 0, st.n_fluid - 1)]
        viscosity = viscosity + rigid_dense.viscosity_op(
            st, rw, float(RHO_0), n, VISCOSITY_C_S, VISCOSITY_ALPHA)(
                vel, rho, rho_quirk, rigid.vel)
    f_adv = base.gravity_acc(st) + tension + viscosity
    v_adv = vel + f_adv * (dt / st.particle_m)

    d_ii = S_all * (-dt2 * inv_rho2)
    rho_adv = rho + dt * (v_adv.dot(S_all) - eng.mvd(v_adv))
    if has_rigid:
        # Solid rho_adv velocity term: -Sigma_s w_s v_r_j . gradW with
        # v_r incl. alpha dt (predict_advection / iisph_solver.py:325-334).
        v_r = base.rigid_contact_vel(st, rigid, dt, include_alpha=True)
        rho_adv = rho_adv - dt * rigid_dense.contact_dot_op(
            st, rw, float(RHO_0), n)(v_r)
    a_ii = (d_ii.dot(S_all)
            - dt2 * st.particle_m * inv_rho2
            * (eng.qsum / st.particle_m + g2_sb))

    p0 = 0.5 * p_past  # warm start (iisph_solver.py:67)
    d_ij_of, r_sum_of = dense_jacobi_ops(eng, S_all, inv_rho2, d_ii, dt2)
    residual_of = dense_residual_fn(a_ii, rho_adv)
    p_iter, d_ij, r_sum, res, iters = jacobi_loop(
        d_ij_of, r_sum_of, residual_of, p0, a_ii, rho_adv,
        unroll=_dfsph.loop_unroll(st))

    # --- integration (iisph_solver.py:150-206) ------------------------------
    f_press = (d_ij + d_ii * p_iter) * (st.particle_m / dt2)
    rigid_force = rigid.force
    if has_rigid and st.fs_couple:
        # compute_rigid_force (iisph_solver.py:150-160): once per step,
        # rigid-side (each fluid-rigid pair charged exactly once).
        rs = rigid_dense.build_rigid_side(
            st, rigid.pos, arrays.rigid_volume, pos, eng.dp.starts,
            float(RHO_0), Kf=st.K)
        overflow = jnp.maximum(overflow, rs.overflow)
        rigid_force = rigid_dense.rigid_side_force(
            rs, p_iter * inv_rho2 * jnp.float32(st.particle_m), rho,
            rigid_force)
    new_vel = (v_adv + f_press * (dt / st.particle_m)) * base.ARTIFICIAL_FRICTION
    new_pos = pos + new_vel * dt
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(st, new_pos, new_vel,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)

    return state._replace(
        overflow=overflow,
        fluid=base.FluidState(pos=new_pos, vel=new_vel,
                              acc=acc_s, oid=oid),
        rigid=rigid._replace(force=rigid_force),
        t=state.t + dt,
        step_count=state.step_count + 1,
        extra=(p_iter,),
        diag=jnp.stack([iters.astype(jnp.float32), res,
                        jnp.zeros(()), jnp.zeros(())]),
    )


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    from cfd_taichi_tpu.models import dfsph as _dfsph
    if _dfsph.dense_eligible(st):
        return _step_dense(st, arrays, state)
    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    (p_past,) = state.extra
    dt2 = dt * dt

    nbh = base.build_nbh(st, arrays, fluid.pos, rigid.pos)
    pos = nbh.pos
    vel = fluid.vel.take(nbh.perm)
    oid = fluid.oid[nbh.perm]
    p_past = p_past[nbh.perm]
    has_rigid = nbh.rigid_vol is not None

    # --- predict advection (iisph_solver.py:36-75) --------------------------
    rho = base.nbh_rho(st, nbh)
    tension = base.nbh_tension(st, nbh, TENSION_K)
    viscosity = base.nbh_viscosity(st, nbh, vel, rho, rigid,
                                   c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA,
                                   oid=oid)
    f_adv = base.gravity_acc(st) + tension + viscosity
    v_adv = vel + f_adv * (dt / st.particle_m)

    d_ii, rho_adv, a_ii, gc_f, gc_b, inv_rho2, r2 = predict_advection(
        st, nbh, rho, v_adv, rigid, dt, has_rigid)

    p0 = 0.5 * p_past  # warm start (iisph_solver.py:67)

    # --- relaxed Jacobi solve (iisph_solver.py:78-147) ----------------------
    d_ij_of, r_sum_of, residual_of = loop_operators(
        st, nbh, rho, d_ii, a_ii, rho_adv, gc_f, gc_b, inv_rho2, r2, dt2,
        has_rigid)
    p_iter, d_ij, r_sum, res, iters = jacobi_loop(
        d_ij_of, r_sum_of, residual_of, p0, a_ii, rho_adv)

    # --- integration (iisph_solver.py:150-206) ------------------------------
    f_press = (d_ij + d_ii * p_iter) * (st.particle_m / dt2)

    rigid_force = rigid.force
    if has_rigid:
        # compute_rigid_force (iisph_solver.py:150-160): once per step.
        c_scale = jnp.where(
            nbh.mask_s,
            nbh.rigid_vol * RHO_0 * p_iter[:, None] * inv_rho2 * gc_f
            * st.particle_m, 0.0)
        rigid_force = base.nbh_scatter_rigid_force(
            st, nbh, nbh.x * c_scale, nbh.mask_s, rigid_force)

    new_vel = (v_adv + f_press * (dt / st.particle_m)) * base.ARTIFICIAL_FRICTION
    new_pos = pos + new_vel * dt
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(st, new_pos, new_vel,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)

    return state._replace(
        overflow=nbh.overflow,
        fluid=base.FluidState(pos=new_pos, vel=new_vel,
                              acc=fluid.acc.take(nbh.perm), oid=oid),
        rigid=rigid._replace(force=rigid_force),
        t=state.t + dt,
        step_count=state.step_count + 1,
        extra=(p_iter,),
        # [iters, residual, 0, 0] (iisph_solver.py:96).
        diag=jnp.stack([iters.astype(jnp.float32), res,
                        jnp.zeros(()), jnp.zeros(())]),
    )
