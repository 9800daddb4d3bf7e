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
`lax.while_loop` over the step's compact (N, K) neighbor lists. Pair
validity stays pinned to the step-initial positions (the reference reuses
the start-of-step grid, solver_base.py:139-141); kernels inside the predict
pass are evaluated at the *predicted* positions.
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
    nbh = base.build_nbh(st, arrays, scene.fluid_pos0, rigid_pos)
    dense_i = jnp.argmax(nbh.count)
    gcoef = jnp.where(nbh.mask[dense_i],
                      sm.cubic_grad_coeff(nbh.r[dense_i], st.h), 0.0)
    gradw = V3(nbh.x.x[dense_i], nbh.x.y[dense_i],
               nbh.x.z[dense_i]) * gcoef
    grad_sum = gradw.sum(axis=0)
    grad_sq_sum = jnp.sum(gradw.dot(gradw))
    beta = st.dt0**2 * st.particle_m**2 * 2.0 / RHO_0**2
    delta = 1.0 / ((grad_sum.dot(grad_sum) + grad_sq_sum) * beta)
    return base.init_sim_state(scene, extra=(delta.astype(jnp.float32),))


def _positive_avg(err, resid_mask=None, allreduce=None):
    """Average of strictly-positive density errors (pcisph_solver.py:122-133).
    `resid_mask`/`allreduce` restrict to owned rows and psum across shards
    in the sharded path (identity when None)."""
    red = allreduce if allreduce is not None else (lambda x: x)
    pos_mask = err > 0.0
    if resid_mask is not None:
        pos_mask = pos_mask & resid_mask
    cnt = red(jnp.sum(pos_mask))
    total = red(jnp.sum(jnp.where(pos_mask, err, 0.0)))
    return jnp.where(cnt > 0, total / cnt, 0.0)


def loop_operators(st: SceneStatic, nbh, rho, pos, vel, ext_force, dt,
                   has_rigid: bool, scatter_mask=None):
    """The PCISPH predict/correct loop algebra, defined ONCE for the
    single-chip and sharded solvers (cf. dfsph.loop_operators). Works on
    any Nbh-shaped neighborhood (the sharded path builds a local one).
    `scatter_mask` restricts the rigid-reaction scatter to locally-owned
    query rows in the sharded path (default: nbh.mask_s).

    Returns (press_force_of(p, rigid_force), predict(press_force))."""
    gc_f = sm.cubic_grad_coeff(nbh.r, st.h)
    inv_rho2 = (1.0 / (rho * rho))[:, None]
    smask_scatter = nbh.mask_s if scatter_mask is None else scatter_mask
    if st.akinci:
        gc_b = sm.cubic_grad_coeff(nbh.br, st.h)

    def press_force_of(p_iter, rigid_force):
        """Pressure force from current iterate (pcisph_solver.py:109-119,
        169-198); also scatters the rigid reaction."""
        p_q = p_iter[:, None]
        # Fluid pairs: -(p_i + p_j)/rho0^2 m^2 gradW — the reference divides
        # by the REST density squared here (pcisph_solver.py:169-177), unlike
        # the solid/boundary terms which use the actual rho_i. 4-lane packed
        # gather with distinct riders (in-loop single-lane gathers lower to
        # a ~2.5x-slower emitter; identical lanes get deduped back).
        p_j, _, _, _ = base.jf_pack(st, nbh, p_iter, rho, p_iter * rho,
                                    rho * rho)
        sym = p_q + p_j
        scale = jnp.where(nbh.mask_f,
                          -(st.particle_m ** 2) / (RHO_0 ** 2) * sym * gc_f,
                          0.0)
        if has_rigid:
            s_scale = jnp.where(
                nbh.mask_s,
                -nbh.rigid_vol * RHO_0 * p_q * inv_rho2 * gc_f
                * st.particle_m, 0.0)
            scale = scale + s_scale
            rigid_force = base.nbh_scatter_rigid_force(
                st, nbh, nbh.x * (-s_scale), smask_scatter, rigid_force)
        force = base.sum_vec(nbh.x, scale)
        if st.akinci:
            b_scale = jnp.where(
                nbh.bmask, -nbh.bvol * p_q * inv_rho2 * gc_b, 0.0)
            force = force + base.sum_vec(nbh.bx, b_scale) \
                * (RHO_0 * st.particle_m)
        return force, rigid_force

    def predict(press_force: V3):
        """Predict v,x then rho over predicted positions with the
        step-initial masks (pcisph_solver.py:72-101,135-154)."""
        vel_p = vel + (ext_force + press_force) * (dt / st.particle_m)
        pos_p = pos + vel_p * dt
        if not st.akinci:
            pos_p, vel_p = base.clamp_to_box(st, pos_p, vel_p,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)
        # Fluid neighbors at predicted positions; solid/boundary neighbors
        # keep their current positions (pcisph_solver.py:143-147). 4-lane
        # packed gather with a distinct rider (see press_force_of).
        pjx, pjy, pjz, _ = base.jf_pack(st, nbh, pos_p.x, pos_p.y, pos_p.z,
                                        pos_p.x + pos_p.y)
        d_f = (pos_p.expand(1) - V3(pjx, pjy, pjz)).norm()
        rho_p = st.particle_m * base.msum(sm.cubic_w(d_f, st.h), nbh.mask_f)
        if has_rigid:
            # Solid neighbor positions are step-constant: nbh.spos-style
            # precomputed values live in nbh.x already (x = pos_i - pos_j),
            # so |pos_p_i - pos_j| = |(pos_p_i - pos_i) + x_ij|.
            shift = pos_p - pos
            d_s = (shift.expand(1) + nbh.x).norm()
            rho_p = rho_p + RHO_0 * base.msum(
                nbh.rigid_vol * sm.cubic_w(d_s, st.h), nbh.mask_s)
        if st.akinci:
            shift = pos_p - pos
            d_b = (shift.expand(1) + nbh.bx).norm()
            rho_p = rho_p + RHO_0 * base.msum(
                nbh.bvol * sm.cubic_w(d_b, st.h), nbh.bmask)
        return rho_p - RHO_0

    return press_force_of, predict


def dense_eligible(st: SceneStatic) -> bool:
    """Dense-mode PCISPH: BAND-regime scenes only. The per-iteration
    predicted-rho pass stores a start-validity mask the size of one
    band-matrix channel, so it rides the same byte budget; the coef
    regime (1M) keeps the compact path. Rigid-coupled scenes go dense
    too (VERDICT r03 item 4): fluid-fluid terms on the band engine,
    fluid-solid terms through the group-sparse rigid windows + the
    rigid-side compact reaction list (ops/rigid_dense), sized by
    scene.rq_cap (0 = scene builder declined, e.g. body spans the box)."""
    from cfd_taichi_tpu.models import dfsph as _dfsph
    return (_dfsph.DENSE_FLUID
            and (st.rq_cap > 0
                 or not (st.rigid_active and st.n_rigid > 0))
            and _dfsph.use_band_engine(st.n_fluid, st.band_nb))


def _step_dense(st: SceneStatic, arrays: SceneArrays,
                state: base.SimState) -> base.SimState:
    """Dense-mode PCISPH (fluid-only scenes): no compact lists. The
    pressure-force pass is LINEAR in p against step-fixed gradW
    coefficients, so it is ONE band matvec plus row-constant terms:

      F(p) = -(m/rho0^2) (p * S_f + mv(p))  -  m p/rho_i^2 * S_b

    (S_f/S_b the fluid/boundary gradW row sums; matches press_force_of
    term-for-term, reference pcisph_solver.py:109-119,169-198). The
    predict pass is NOT linear — W is re-evaluated at the predicted
    positions — so it runs as a dense-window re-gather with the pair set
    pinned to the step-initial positions (bandmat.predicted_rho_op /
    boundary_predict_op; reference pcisph_solver.py:135-154 iterates the
    start-of-step grid)."""
    from cfd_taichi_tpu.models import dfsph as _dfsph
    from cfd_taichi_tpu.ops import bandmat
    from cfd_taichi_tpu.ops.loops import while_loop_unrolled

    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    (delta,) = state.extra
    n = st.n_fluid
    B = st.band_B
    has_rigid = st.rigid_active and st.n_rigid > 0

    # vel/oid/acc ride the variadic cell sort as payloads
    # (base.sort_by_cells — element gathers are the slow primitive).
    eng = _dfsph.build_dense_engine(
        st, arrays, fluid.pos,
        extras=fluid.vel.astuple() + (fluid.oid,) + fluid.acc.astuple())
    pos, perm, plan = eng.pos, eng.perm, eng.plan
    (vx_s, vy_s, vz_s, oid, ax_s, ay_s, az_s) = eng.dp.extras
    vel = V3(vx_s, vy_s, vz_s)
    acc_s = V3(ax_s, ay_s, az_s)

    rho = base.DENSITY_EPS + eng.rho_f
    S_b = None
    if st.akinci:
        bt = eng.dp.bterms
        rho = rho + bt.rho
        S_b = bt.s
    overflow = eng.overflow
    if has_rigid:
        # Group-sparse rigid windows over the body's per-step cell table
        # (ops/rigid_dense): only rigid-near query groups pay; the
        # reaction goes through the rigid-side compact list.
        from cfd_taichi_tpu.ops import rigid_dense as rd

        rw = rd.build_rigid_windows(st, pos, eng.dp.qcells, rigid.pos,
                                    arrays.rigid_volume, cap=st.rq_cap)
        rt = rd.rigid_terms(st, rw, float(RHO_0), n)
        rho = rho + rt.rho
        overflow = jnp.maximum(overflow, rw.overflow)
        rs = None
        if st.fs_couple:
            rs = rd.build_rigid_side(st, rigid.pos, arrays.rigid_volume,
                                     pos, eng.dp.starts, float(RHO_0),
                                     Kf=st.K)
            overflow = jnp.maximum(overflow, rs.overflow)
    inv_rho2 = 1.0 / (rho * rho)

    # --- external forces (pcisph_solver.py:220-226) -------------------------
    tension = eng.tvec * jnp.float32(-TENSION_K * st.particle_m)
    viscosity = _dfsph.dense_visc(
        st, eng, vel, rho, c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA)
    if has_rigid:
        # Solid viscosity branch, incl. the reference's rho-quirk read
        # (base.nbh_viscosity): seeding-order rho at the rigid-LOCAL index.
        rho_orig = jnp.zeros_like(rho).at[oid].set(rho)
        rho_quirk = rho_orig[jnp.clip(
            jnp.arange(st.n_rigid, dtype=jnp.int32), 0, st.n_fluid - 1)]
        viscosity = viscosity + rd.viscosity_op(
            st, rw, float(RHO_0), n, VISCOSITY_C_S, VISCOSITY_ALPHA)(
                vel, rho, rho_quirk, rigid.vel)
    ext_force = base.gravity_acc(st) + tension + viscosity

    # --- loop operators on the dense engine ----------------------------------
    rho_of = bandmat.predicted_rho_op(pos, h=st.h, m=st.particle_m,
                                      plan=plan, B=B)
    brho_of = None
    if st.akinci:
        brho_of = bandmat.boundary_predict_op(
            eng.dp.bwin, pos, h=st.h, rho0=float(RHO_0), B=B)

    rho_s_of = None
    if has_rigid:
        rho_s_of = rd.predict_rho_op(st, rw, float(RHO_0), n)

    def press_force_of(p_iter, rigid_force):
        f = (eng.S0 * p_iter + eng.mv(p_iter)) \
            * jnp.float32(-st.particle_m / RHO_0 ** 2)
        if has_rigid:
            # Solid pairs: -V_j rho0 p_i/rho_i^2 gradW m — loop-linear in
            # the row constant u = p inv_rho2 m against the step-constant
            # solid row sum rt.s (compact path's s_scale term-for-term);
            # the reaction charges each fluid-rigid pair once, rigid-side.
            u = p_iter * inv_rho2 * jnp.float32(st.particle_m)
            f = f - rt.s * u
            if rs is not None:
                rigid_force = rd.rigid_side_force(rs, u, rho, rigid_force)
        if st.akinci:
            f = f + S_b * (-st.particle_m * p_iter * inv_rho2)
        return f, rigid_force

    def predict(press_force: V3):
        vel_p = vel + (ext_force + press_force) * (dt / st.particle_m)
        pos_p = pos + vel_p * dt
        if not st.akinci:
            pos_p, vel_p = base.clamp_to_box(st, pos_p, vel_p,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)
        rho_p = rho_of(pos_p)
        if has_rigid:
            rho_p = rho_p + rho_s_of(pos_p)
        if st.akinci:
            rho_p = rho_p + brho_of(pos_p)
        return rho_p - RHO_0

    # --- predictive-corrective loop (pcisph_solver.py:47-70) ----------------
    press0 = jnp.zeros(n, jnp.float32)
    force0 = V3.zeros((n,))
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

    p_iter, press_force, rho_err, res, rigid_force, iters = \
        while_loop_unrolled(
            cond, body, (press0, force0, rho_err0, res0, rigid.force,
                         jnp.zeros((), jnp.int32)),
            unroll=_dfsph.loop_unroll(st))

    # --- integration (pcisph_solver.py:200-217) -----------------------------
    new_vel = (vel + (ext_force + press_force) * (dt / st.particle_m)) \
        * base.ARTIFICIAL_FRICTION
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
        extra=(delta,),
        diag=jnp.stack([iters.astype(jnp.float32), res,
                        jnp.zeros(()), jnp.zeros(())]),
    )


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    if dense_eligible(st):
        return _step_dense(st, arrays, state)
    fluid, rigid, dt = state.fluid, state.rigid, state.dt
    (delta,) = state.extra

    nbh = base.build_nbh(st, arrays, fluid.pos, rigid.pos)
    pos = nbh.pos
    vel = fluid.vel.take(nbh.perm)
    oid = fluid.oid[nbh.perm]
    has_rigid = nbh.rigid_vol is not None

    # --- external forces (pcisph_solver.py:220-226) -------------------------
    rho = base.nbh_rho(st, nbh)
    tension = base.nbh_tension(st, nbh, TENSION_K)
    viscosity = base.nbh_viscosity(st, nbh, vel, rho, rigid,
                                   c_s=VISCOSITY_C_S, alpha=VISCOSITY_ALPHA,
                                   oid=oid)
    ext_force = base.gravity_acc(st) + tension + viscosity

    press_force_of, predict = loop_operators(st, nbh, rho, pos, vel,
                                             ext_force, dt, has_rigid)

    # --- predictive-corrective loop (pcisph_solver.py:47-70) ----------------
    n = st.n_fluid
    press0 = jnp.zeros(n, jnp.float32)
    force0 = V3.zeros((n,))
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
        overflow=nbh.overflow,
        fluid=base.FluidState(pos=new_pos, vel=new_vel,
                              acc=fluid.acc.take(nbh.perm), oid=oid),
        rigid=rigid._replace(force=rigid_force),
        t=state.t + dt,
        step_count=state.step_count + 1,
        extra=(delta,),
        # [iters, avg positive density error, 0, 0] (pcisph_solver.py:70).
        diag=jnp.stack([iters.astype(jnp.float32), res,
                        jnp.zeros(()), jnp.zeros(())]),
    )
