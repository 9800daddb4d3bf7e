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
Both loop operators are LINEAR in the per-particle field being iterated
(the stiffness k and the velocity v) against coefficients that are fixed
for the whole step (positions are frozen during the solves), so the
iterations run as block-banded MXU matvecs over a per-step coefficient
matrix (ops/bandmat — measured ~5x cheaper per iteration than the round-2
(N, K) packed gathers; see bandmat's module docstring for the design and
the documented 1e-5 pair-guard deviation). Solid/boundary contributions
enter through per-particle constant vectors hoisted out of the loops:

  delta(k) = k * (S_f + S_s + S_b) + bandmat.matvec(band, k)
  drho(v)  = v . (S_f + S_s + S_b) - bandmat.matvec_dot(band, v) - C_s

with S_f = Sigma_f wf gradW (the band row sums), S_s = Sigma_s ws gradW,
S_b = Sigma_b wb gradW, and C_s = Sigma_s ws v_contact_j . gradW (constant
within each loop because the rigid contact velocity is).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.models import base
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops import rigid_dense
from cfd_taichi_tpu.ops.loops import while_loop_unrolled
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
# Dense-window mode for fluid-only scenes (dense_eligible): skip the
# compact (N, K) list entirely — band matrix, rho, counts, alpha-Q and
# tension all ride ONE fused (QB, B, W) window pass, viscosity a second.
DENSE_FLUID = True
# Gated sub-iterations per while-loop trip (ops/loops): amortizes the
# measured ~3 ms/iteration loop-turnaround overhead across U iterations
# while preserving the reference's per-iteration convergence checks
# exactly. The hot dam-break phase runs ~15 divergence + ~7 density
# iterations per step; U=4 cuts the turnaround cost ~4x for at most
# U-1 masked (~0.5 ms at 30k) body evaluations per loop. In the coef
# regime (1M scale) a masked body evaluation costs a FULL ~0.2 s matvec
# pair against the same ~3 ms turnaround saving, so those loops run
# un-unrolled (loop_unroll()).
LOOP_UNROLL = 4


def loop_unroll(st: SceneStatic) -> int:
    return LOOP_UNROLL if use_band_engine(st.n_fluid, st.band_nb) else 1


def init_state(scene: Scene) -> base.SimState:
    warm_k = jnp.zeros(scene.static.n_fluid, jnp.float32)
    return base.init_sim_state(scene, extra=(warm_k,))


# Byte budget for the per-step band matrix (3 f32 components of
# (N, band_nb*128)): above this, the loops fall back to (N, K) packed
# gathers — slower per iteration but O(N*K) memory (the 1M-particle
# regime, where the band matrix would not fit HBM).
BAND_BYTE_BUDGET = 3.5e9
# Byte budget for the stored-coefficient engine (scalar bf16 w only —
# bandmat.CoefEngine re-gathers position windows from 12 MB tables):
# the 1M regime fits at ~6.5 GB on the 16 GB chip where the 3-component
# matrix (~14-23 GB) does not.
COEF_BYTE_BUDGET = 8e9


def coef_bytes(n: int, nbcap: int, B: int) -> int:
    W = nbcap * bandmat.BLOCK
    return 2 * n * W


def use_coef_engine(n: int, nbcap: int, B: int) -> bool:
    return coef_bytes(n, nbcap, B) <= COEF_BYTE_BUDGET
# Storage dtype of the band matrix: bf16 halves the per-iteration HBM
# reads (measured 2.3x matvec speedup); accumulation stays f32 on the MXU.
# Validated against the density contract (<0.1% avg positive error) on the
# hot breaking_dam_30k phase — flip to jnp.float32 if a scene needs it.
BAND_DTYPE = jnp.bfloat16


def band_bytes(n: int, nbcap: int) -> int:
    itemsize = 2 if BAND_DTYPE == jnp.bfloat16 else 4
    return 3 * itemsize * n * nbcap * bandmat.BLOCK


def use_band_engine(n: int, nbcap: int) -> bool:
    return band_bytes(n, nbcap) <= BAND_BYTE_BUDGET


def alpha_terms(st: SceneStatic, nbh, rho, gx: V3, gc_f, wf, ws=None,
                gb=None, gc_b=None, wb=None):
    """alpha_i = rho_i / (|S_f+s|^2 + Q_f+s + Q_b + |S_b|^2), guard < 1e-6
    (dfsph_solver.py:32-51; the boundary vector sum is squared SEPARATELY
    from the fluid one — reference quirk kept). Shared by the single-chip
    and sharded solvers. Returns (alpha, sb_vec or None)."""
    coeff_fs = wf + (ws if ws is not None else 0.0)
    s_vec = base.sum_vec(gx, coeff_fs)
    qsum = jnp.sum((coeff_fs * gc_f * nbh.r) ** 2, axis=1)
    denom = s_vec.dot(s_vec) + qsum
    sb_vec = None
    if st.akinci:
        sb_vec = base.sum_vec(gb, wb)
        qb = jnp.sum((wb * gc_b * nbh.br) ** 2, axis=1)
        denom = denom + qb + sb_vec.dot(sb_vec)
    return jnp.where(jnp.abs(denom) < 1e-6, 0.0, rho / denom), sb_vec


def band_matvec_ops(band: bandmat.BandA):
    """(matvec, matvec_dot) over the per-step band matrix — MXU einsums,
    HBM-bound on the A reads (~1 ms/iter at 29k)."""
    return (lambda k: bandmat.matvec(band, k),
            lambda v: bandmat.matvec_dot(band, v))


def gather_matvec_ops(st: SceneStatic, nbh, wf: jnp.ndarray, gx: V3,
                      rho: jnp.ndarray, alpha: jnp.ndarray):
    """(matvec, matvec_dot) over the compact (N, K) list — 4-lane packed
    in-loop gathers (the round-2 engine; ~7 ms/iter at 29k but O(N*K)
    memory). `rho`/`alpha` ride as distinct pack lanes: XLA dedups packs
    of identical arrays back to the ~2.5x-slower single-lane emitter."""
    def matvec(k):
        kj, _, _, _ = base.jf_pack(st, nbh, k, rho, alpha, k * alpha)
        w = wf * kj
        return base.sum_vec(gx, w)

    def matvec_dot(v: V3):
        vjx, vjy, vjz, _ = base.jf_pack(st, nbh, v.x, v.y, v.z, v.x + v.y)
        return jnp.sum(wf * (vjx * gx.x + vjy * gx.y + vjz * gx.z), axis=1)

    return matvec, matvec_dot


def loop_operators(matvec, matvec_dot, S: V3, counts: jnp.ndarray,
                   resid_mask=None, allreduce=None):
    """The DFSPH loop algebra, defined ONCE for both the single-chip and
    the sharded solver (parallel/domain.py) so the two can never drift:

      stiff_vel_delta(k) = k * S + matvec(k)            (velocity change
          per unit dt for a stiffness field k; dfsph_solver.py:302-379)
      rho_derivative(v, c_s) -> (dr, avg)               (clamped density
          rate + its positive average; dfsph_solver.py:252-300)

    `matvec`/`matvec_dot` evaluate Sigma_j wf_ij gradW_ij k_j and
    Sigma_j wf_ij gradW_ij . v_j (band_matvec_ops or gather_matvec_ops).
    `S` must already include the solid/boundary self-side sums; `c_s` is
    the loop-constant solid contact-velocity dot (0 when fluid-only).
    `resid_mask` restricts the residual average to locally-owned rows
    (sharded path); `allreduce` sums residual scalars across shards
    (lax.psum) — identity when None."""
    red = allreduce if allreduce is not None else (lambda x: x)

    def stiff_vel_delta(k_over_rho):
        return S * k_over_rho + matvec(k_over_rho)

    def vel_dot_terms(v: V3, c_s):
        return (v.x * S.x + v.y * S.y + v.z * S.z
                - matvec_dot(v) - c_s)

    def rho_derivative(v: V3, c_s):
        dr = vel_dot_terms(v, c_s)
        dr = jnp.where(counts < MIN_NEIGHBORS, 0.0, jnp.maximum(dr, 0.0))
        pos = dr > 0.0
        sel = pos if resid_mask is None else (resid_mask & pos)
        cnt = red(jnp.sum(sel))
        tot = red(jnp.sum(jnp.where(sel, dr, 0.0)))
        avg = jnp.where(cnt > 0, tot / cnt, 0.0)
        return dr, avg

    def rho_adv_residual(rho, dt, v_adv: V3, c_s):
        """rho_adv = max(rho + dt*drho, rho0) + its unclamped average
        (dfsph_solver.py:125-152)."""
        d = vel_dot_terms(v_adv, c_s)
        rho_adv = jnp.maximum(rho + dt * d, RHO_0)
        uncl = rho_adv != RHO_0
        sel = uncl if resid_mask is None else (resid_mask & uncl)
        cnt = red(jnp.sum(sel))
        tot = red(jnp.sum(jnp.where(sel, rho_adv, 0.0)))
        avg = jnp.where(cnt > 0, tot / cnt, jnp.float32(RHO_0))
        return rho_adv, avg

    return stiff_vel_delta, vel_dot_terms, rho_derivative, rho_adv_residual


def solid_dot_const_fn(st: SceneStatic, nbh, rigid, ws, gx: V3):
    """C_s = Sum_s ws (v_contact_j . gradW) — constant within each
    pressure loop (the rigid contact velocity only depends on dt and
    the rigid state, reference dfsph_solver.py:163-170,288-294). Shared
    by the single-chip compact prepare and the sharded coupled callback
    (parallel/domain._dfsph_physics)."""
    def solid_dot_const(include_alpha: bool, dt_arg):
        v_r = base.rigid_contact_vel(st, rigid, dt_arg, include_alpha)
        lid = base.rigid_lid(st, nbh.idx)
        tbl = jnp.stack([v_r.x, v_r.y, v_r.z, v_r.x + v_r.y], axis=0)
        rows = tbl[:, lid]
        return jnp.sum(jnp.where(nbh.mask_s,
                                 ws * (rows[0] * gx.x + rows[1] * gx.y
                                       + rows[2] * gx.z), 0.0), axis=1)

    return solid_dot_const


def rigid_scatter_fn(st: SceneStatic, nbh, ws, gx: V3, scatter_mask=None):
    """Per-density-iteration rigid reaction scatter
    (dfsph_solver.py:204-212). `scatter_mask` restricts contributions to
    locally-owned query rows in the sharded path (each fluid-rigid pair
    must be charged exactly once across shards; the psum happens after
    the loop)."""
    mask = nbh.mask_s if scatter_mask is None else scatter_mask

    def scatter_fn(k_over_rho, rforce):
        contrib = gx * (ws * k_over_rho[:, None] * st.particle_m)
        return base.nbh_scatter_rigid_force(st, nbh, contrib, mask, rforce)

    return scatter_fn


class _Pre(NamedTuple):
    """Neighborhood-derived inputs to the shared solve body (_finish_step):
    everything downstream of the engine choice is engine-agnostic, so the
    compact-(N, K) and dense-window paths cannot drift on the loop/CFL/
    integration physics."""
    pos: Any            # V3 — sorted fluid positions
    perm: Any           # (N,) prev-state index per sorted slot
    oid: Any            # (N,) persistent original ids (sorted order)
    vel: Any            # V3 — sorted velocities
    warm_k: Any         # (N,) sorted warm-start stiffness
    rho: Any            # (N,)
    alpha: Any          # (N,)
    count: Any          # (N,) neighbor counts (the <20 skip)
    S: Any              # V3 — self-side loop coefficient
    mv: Any             # matvec callable
    mvd: Any            # matvec_dot callable
    ext_force_fn: Any   # vel -> V3 (tension + viscosity, no gravity)
    cs_fn: Any          # (include_alpha, dt) -> (N,) solid dot constant
    scatter_fn: Any     # (k_over_rho, rforce) -> rforce, or None
    overflow: Any       # () int32 — build + engine overflow
    acc: Any = None     # V3 — sorted accelerations (None: gather by perm)


def dense_eligible(st: SceneStatic) -> bool:
    """Dense-window mode. Within dense mode the loop engine is the stored
    band matrix when it fits HBM, else the stored-coefficient engine (the
    1M regime, where skipping the compact list saves the ~1 s (N, K)
    compaction); only beyond BOTH byte budgets does the solver fall back
    to the compact path's window/gather engines. Rigid-coupled scenes go
    dense too (VERDICT r03 item 4): fluid-solid terms ride the
    group-sparse rigid windows + rigid-side reaction list
    (ops/rigid_dense), sized by scene.rq_cap (0 = coupling stays on the
    compact path)."""
    return (DENSE_FLUID
            and (st.rq_cap > 0
                 or not (st.rigid_active and st.n_rigid > 0))
            and (use_band_engine(st.n_fluid, st.band_nb)
                 or use_coef_engine(st.n_fluid, st.pair_nb, st.band_B)))


def step(st: SceneStatic, arrays: SceneArrays, state: base.SimState) -> base.SimState:
    if dense_eligible(st):
        pre = _prepare_dense(st, arrays, state)
    else:
        pre = _prepare_compact(st, arrays, state)
    return _finish_step(st, state, pre)


class DenseEngine(NamedTuple):
    """Dense-mode per-step engine + one-shot fluid sums, shared by every
    fluid-only solver that runs dense (DFSPH, IISPH): cell sort + wide
    CSR plan + group-sparse boundary sums (base.build_dense_prep),
    one-shot fluid term sums, pair-tight plan, and the loop matvec
    operators (stored band matrix below the byte budget, split-bucket /
    plain stored-coefficient engine above it)."""
    dp: Any             # base.DensePrep (pos/perm/plan/bterms)
    pos: Any            # V3 — sorted fluid positions
    perm: Any           # (N,) prev-state index per sorted slot
    plan: Any           # pair-tight block plan (viscosity etc.)
    rho_f: Any          # (N,) fluid-fluid density sum
    count: Any          # (N,) int32 pair count
    qsum: Any           # (N,) Sigma (m |gradW|)^2
    tvec: Any           # V3 — tension vector sums
    S0: Any             # V3 — fluid gradW row sums
    mv: Any             # matvec callable
    mvd: Any            # matvec_dot callable
    overflow: Any       # () int32
    # (gidx, gmask) tail-group selection when the split-bucket coef
    # engine is active — lets dense_viscosity_split reuse the engine's
    # exact bucket decomposition (same plan -> same selection); None
    # in the band regime / unsplit coef regime.
    split_sel: Any = None


def build_dense_engine(st: SceneStatic, arrays: SceneArrays,
                       fluid_pos: V3, dp=None,
                       extras: tuple = ()) -> DenseEngine:
    """Fluid-only fast path: NO compact (N, K) fluid list and NO compact
    (N, bK) boundary list are built. One dense pass over the CSR block
    plan produces the loop engine inputs AND rho/count/alpha-Q/tension
    (build_band_terms in the band regime, the chunked dense_dfsph_terms
    in the coef regime); Akinci boundary sums come from the group-sparse
    dense_boundary_terms pass. Measured: the compact list build this
    skips was ~65 ms of a ~136 ms step at 29k and ~3.1 s of a ~8.6 s hot
    step at 1M (list compaction + boundary list + plan dedupe)."""
    B = st.band_B
    # Two-stage plans (bandmat.compact_plan docstring): a generously-
    # capped CSR cover for the ONE-SHOT term pass (its fragmentation is
    # not physics-bounded), then a pair-tight plan — physics-bounded
    # capacity — for the stored engine and every per-iteration matvec.
    if dp is None:
        dp = base.build_dense_prep(st, arrays, fluid_pos, st.band_nb_wide,
                                   B, extras=extras)
    pos_s, perm = dp.pos, dp.perm
    split_sel = None
    if use_band_engine(st.n_fluid, st.band_nb):
        # Stored 3-component band matrix (fits HBM below ~150k).
        bterms = bandmat.build_band_terms(pos_s, h=st.h, m=st.particle_m,
                                          plan=dp.plan, B=B,
                                          dtype=BAND_DTYPE)
        # pair_nb_q: the band_B-width tight capacity (pair_nb sizes the
        # narrower loop_B plans when the split-width mode is active —
        # a band_B=32 row needs ~22 blocks where a loop_B=8 row needs 13,
        # measured impact-hot 157k).
        plan = bandmat.compact_plan(dp.plan, bterms.blk_pair,
                                    st.pair_nb_q or st.pair_nb)
        band = bandmat.build_band(pos_s, h=st.h, m=st.particle_m,
                                  plan=plan, B=B, dtype=BAND_DTYPE)
        rho_f, count, qsum, tvec = (bterms.rho, bterms.count, bterms.qsum,
                                    bterms.tvec)
        S0 = band.s
        mv, mvd = band_matvec_ops(band)
        engine_overflow = band.overflow
    else:
        # Stored-coefficient engine (the 1M regime): the loops stream the
        # scalar bf16 w; no compact (N, K) list is built. The WIDE
        # (capacity-priced) CSR pass computes only rho/count/pair-flags
        # (dense_rho_count — one cubic_w eval per slot); qsum/tvec/S ride
        # the coef build's pair-TIGHT pass for free (same pair set: the
        # tight plan covers every pair-holding block; bandmat.CoefEngine
        # qsum/tvec note).
        #
        # SPLIT-WIDTH (SceneStatic.loop_B): the one-shot passes keep the
        # wide band_B groups (amortized plan/window overhead), but the
        # LOOP engine compacts to loop_B=8 sub-groups whose pair plans
        # are ~40% narrower — dense_rho_count emits flags at sub-group
        # granularity, so both tight plans come from the one wide pass.
        sub = B // st.loop_B if st.loop_B and st.loop_B < B else 1
        wide_over = jnp.zeros((), jnp.int32)
        if sub == 1 and st.coef_nbA and st.coef_nbA < st.band_nb_wide:
            # Split-bucket wide pass: the one-shot rho/count/flags pass
            # is capacity-priced at band_nb_wide (~1.7x the p97 cover —
            # the sizing margin), so the bulk pays only the nbA width
            # and tail groups ride the scattered remainder. coef_nbA/
            # capB are sized from exactly this plan's cover
            # distribution (scene.py) — the same decomposition the
            # stored engine uses.
            rho_f, count, blk_pair, wide_over = \
                bandmat.dense_rho_count_split(
                    pos_s, h=st.h, m=st.particle_m, plan=dp.plan, B=B,
                    nbA=st.coef_nbA, capB=st.coef_capB)
        else:
            rho_f, count, blk_pair = bandmat.dense_rho_count(
                pos_s, h=st.h, m=st.particle_m, plan=dp.plan, B=B,
                sub=sub)
        if sub > 1:
            # QB*sub >= ceil(n/loop_B): trailing sub-rows cover only the
            # wide groups' edge-padded queries — slice them off so the
            # loop plan matches the engine's own group count.
            QBl = -(-st.n_fluid // st.loop_B)
            blk_w = jnp.repeat(dp.plan[0], sub, axis=0)[:QBl]
            mask_w = jnp.repeat(dp.plan[1], sub, axis=0)[:QBl]
            plan_loop = bandmat.compact_plan((blk_w, mask_w, dp.plan[2]),
                                             blk_pair[:QBl], st.pair_nb)
            flags_q = blk_pair.reshape(-1, sub,
                                       blk_pair.shape[1]).any(axis=1)
            plan = bandmat.compact_plan(dp.plan, flags_q, st.pair_nb_q)
            Bl = st.loop_B
        else:
            plan = plan_loop = bandmat.compact_plan(dp.plan, blk_pair,
                                                    st.pair_nb)
            Bl = B
        if st.coef_nbA and st.coef_nbA < st.pair_nb:
            # Split-bucket engine: matvec traffic scales with plan
            # CAPACITY, and the pair-block distribution is tight but
            # skewed — pay the full width only for the tail groups.
            ceng = bandmat.build_split_coef_engine(
                pos_s, h=st.h, m=st.particle_m, plan=plan_loop, B=Bl,
                nbA=st.coef_nbA, capB=st.coef_capB, dtype=BAND_DTYPE)
            mv, mvd = bandmat.split_coef_matvec_ops(ceng, st.n_fluid, Bl)
            if Bl == B:
                # The viscosity pass runs at band_B width; the engine's
                # bucket decomposition transfers only when the loop
                # engine shares that width (loop_B off — the shipped
                # large-N policy).
                split_sel = (ceng.rem.qsel, ceng.gmask)
        else:
            ceng = bandmat.build_coef_engine(
                pos_s, h=st.h, m=st.particle_m, plan=plan_loop, B=Bl,
                dtype=BAND_DTYPE)
            mv, mvd = bandmat.coef_matvec_ops(ceng, st.n_fluid, Bl)
        qsum, tvec = ceng.qsum, ceng.tvec
        S0 = ceng.s
        engine_overflow = jnp.maximum(jnp.maximum(ceng.overflow,
                                                  plan_loop[2]),
                                      wide_over)
    overflow = jnp.maximum(jnp.maximum(dp.overflow, plan[2]),
                           jnp.maximum(engine_overflow,
                                       jnp.zeros((), jnp.int32)))
    return DenseEngine(dp=dp, pos=pos_s, perm=perm, plan=plan,
                       rho_f=rho_f, count=count, qsum=qsum, tvec=tvec,
                       S0=S0, mv=mv, mvd=mvd, overflow=overflow,
                       split_sel=split_sel)


def dense_visc(st: SceneStatic, eng: DenseEngine, vel: V3,
               rho: jnp.ndarray, c_s: float = VISCOSITY_C_S,
               alpha: float = VISCOSITY_ALPHA) -> V3:
    """Fluid-fluid Monaghan viscosity over a DenseEngine — the split-
    bucket pass when the engine is split (reuses its exact tail
    selection), the plain full-width pass otherwise. Shared by the
    DFSPH/IISPH/PCISPH dense prepares and the sharded dense callbacks."""
    if eng.split_sel is not None:
        return bandmat.dense_viscosity_split(
            eng.pos, vel, rho, h=st.h, m=st.particle_m, plan=eng.plan,
            B=st.band_B, c_s=c_s, alpha=alpha,
            nbA=st.coef_nbA, capB=st.coef_capB, sel=eng.split_sel)
    return bandmat.dense_viscosity(
        eng.pos, vel, rho, h=st.h, m=st.particle_m, plan=eng.plan,
        B=st.band_B, c_s=c_s, alpha=alpha)


def dense_pre_terms(st: SceneStatic, eng: DenseEngine, rt=None):
    """The dense-mode one-shot algebra (rho, alpha factor, self-side S,
    tension vector) from a DenseEngine — defined ONCE for the single-chip
    prepare and the sharded dense callback (parallel/domain._dfsph_physics)
    so the two cannot drift. `rt` carries the rigid term sums
    (rigid_dense.rigid_terms) when the scene is coupled: fluid-solid
    terms fold into the SAME sums the reference uses (alpha_terms:
    coeff_fs = wf + ws — a pair slot is fluid OR solid, so
    |S_f+S_s|^2 + Q_f + Q_s matches term-for-term). The boundary vector
    sum is squared SEPARATELY from the fluid one — reference quirk kept
    (dfsph_solver.py:32-51)."""
    rho = base.DENSITY_EPS + eng.rho_f
    S_fs, qsum_fs = eng.S0, eng.qsum
    if rt is not None:
        rho = rho + rt.rho
        S_fs = S_fs + rt.s
        qsum_fs = qsum_fs + rt.qsum
    denom = S_fs.dot(S_fs) + qsum_fs
    S = S_fs
    if st.akinci:
        bt = eng.dp.bterms
        rho = rho + bt.rho
        denom = denom + bt.qsum + bt.s.dot(bt.s)
        S = S + bt.s
    alpha = jnp.where(jnp.abs(denom) < 1e-6, 0.0, rho / denom)
    tension = eng.tvec * jnp.float32(-TENSION_K * st.particle_m)
    return rho, alpha, S, tension


def _prepare_dense(st: SceneStatic, arrays: SceneArrays,
                   state: base.SimState) -> _Pre:
    """DFSPH dense-mode prepare on top of build_dense_engine: alpha
    factor, boundary additions, viscosity-on-demand. Rigid-coupled
    scenes add the group-sparse rigid windows' step-constant sums, the
    loop-constant contact-velocity dot, and the rigid-side reaction list
    (ops/rigid_dense; the loop engines themselves stay fluid-fluid — the
    solid side rides the row-constant S and cs_fn exactly like the
    compact path)."""
    fluid, rigid = state.fluid, state.rigid
    (warm_k,) = state.extra
    has_rigid = st.rigid_active and st.n_rigid > 0

    B = st.band_B
    # vel/warm_k/oid/acc ride the ONE variadic cell sort as payloads
    # (base.sort_by_cells) — 8 per-lane gathers at ~19 ms each at 1M
    # otherwise (tools/perf_r5_prep3.py).
    eng = build_dense_engine(
        st, arrays, fluid.pos,
        extras=fluid.vel.astuple() + (warm_k, fluid.oid)
        + fluid.acc.astuple())
    dp, pos_s, perm, plan = eng.dp, eng.pos, eng.perm, eng.plan
    rho_f, count, qsum, tvec = eng.rho_f, eng.count, eng.qsum, eng.tvec
    S0, mv, mvd, overflow = eng.S0, eng.mv, eng.mvd, eng.overflow
    (vx_s, vy_s, vz_s, warm_s, oid, ax_s, ay_s, az_s) = dp.extras
    vel_s = V3(vx_s, vy_s, vz_s)
    acc_s = V3(ax_s, ay_s, az_s)

    rt = rw = visc_s_of = None
    if has_rigid:
        # Fluid-solid terms through the group-sparse rigid windows
        # (ops/rigid_dense); folded into the one-shot sums below.
        rw = rigid_dense.build_rigid_windows(
            st, pos_s, dp.qcells, rigid.pos, arrays.rigid_volume,
            cap=st.rq_cap)
        rt = rigid_dense.rigid_terms(st, rw, float(RHO_0), st.n_fluid)
        overflow = jnp.maximum(overflow, rw.overflow)
        visc_s_of = rigid_dense.viscosity_op(
            st, rw, float(RHO_0), st.n_fluid, VISCOSITY_C_S,
            VISCOSITY_ALPHA)
    rho, alpha, S, tension = dense_pre_terms(st, eng, rt)

    def ext_force_fn(vel):
        # Split-bucket pass when the engine is split — same pair set,
        # ~40% fewer capacity-priced slots at hot 1M (dense_visc).
        visc = dense_visc(st, eng, vel, rho)
        if has_rigid:
            # Solid viscosity branch incl. the seeding-order rho-quirk
            # read (base.nbh_viscosity).
            rho_orig = jnp.zeros_like(rho).at[oid].set(rho)
            rho_quirk = rho_orig[jnp.clip(
                jnp.arange(st.n_rigid, dtype=jnp.int32), 0,
                st.n_fluid - 1)]
            visc = visc + visc_s_of(vel, rho, rho_quirk, rigid.vel)
        return tension + visc

    if has_rigid:
        dot_of = rigid_dense.contact_dot_op(st, rw, float(RHO_0),
                                            st.n_fluid)

        def cs_fn(include_alpha, dt_arg):
            v_r = base.rigid_contact_vel(st, rigid, dt_arg, include_alpha)
            return dot_of(v_r)
    else:
        def cs_fn(include_alpha, dt_arg):
            return jnp.float32(0.0)

    scatter_fn = None
    if has_rigid and st.fs_couple:
        rs = rigid_dense.build_rigid_side(
            st, rigid.pos, arrays.rigid_volume, pos_s, dp.starts,
            float(RHO_0), Kf=st.K)
        overflow = jnp.maximum(overflow, rs.overflow)

        def scatter_fn(k_over_rho, rforce):
            # Compact counterpart: gx * (ws k_over_rho_i m) per pair
            # (rigid_scatter_fn); charged once per pair, rigid-side.
            return rigid_dense.rigid_side_force(
                rs, k_over_rho * jnp.float32(st.particle_m), rho, rforce)

    return _Pre(pos=pos_s, perm=perm, oid=oid,
                vel=vel_s, warm_k=warm_s, acc=acc_s,
                rho=rho, alpha=alpha, count=count, S=S, mv=mv,
                mvd=mvd, ext_force_fn=ext_force_fn,
                cs_fn=cs_fn, scatter_fn=scatter_fn, overflow=overflow)


def _prepare_compact(st: SceneStatic, arrays: SceneArrays,
                     state: base.SimState) -> _Pre:
    fluid, rigid = state.fluid, state.rigid
    dt = state.dt
    (warm_k,) = state.extra

    nbh = base.build_nbh(st, arrays, fluid.pos, rigid.pos)
    pos = nbh.pos
    vel = fluid.vel.take(nbh.perm)
    oid = fluid.oid[nbh.perm]
    warm_k = warm_k[nbh.perm]
    n = st.n_fluid
    has_rigid = nbh.rigid_vol is not None

    # Loop-invariant pair geometry (positions are fixed during both solves):
    # gradW = gc * x_ij, plus the per-source mass/volume weights.
    gc_f = sm.cubic_grad_coeff(nbh.r, st.h)
    gx = V3(nbh.x.x * gc_f, nbh.x.y * gc_f, nbh.x.z * gc_f)  # gradW vectors
    wf = jnp.where(nbh.mask_f, jnp.float32(st.particle_m), 0.0)  # fluid m
    ws = (jnp.where(nbh.mask_s, RHO_0 * nbh.rigid_vol, 0.0)
          if has_rigid else None)                                # V_j rho0
    if st.akinci:
        gc_b = sm.cubic_grad_coeff(nbh.br, st.h)
        gb = V3(nbh.bx.x * gc_b, nbh.bx.y * gc_b, nbh.bx.z * gc_b)
        wb = jnp.where(nbh.bmask, RHO_0 * nbh.bvol, 0.0)         # V_b rho0

    # --- initialize: rho + alpha (dfsph_solver.py:423-426, 32-51) -----------
    rho = base.nbh_rho(st, nbh)
    alpha, sb_vec = alpha_terms(
        st, nbh, rho, gx, gc_f, wf, ws=ws if has_rigid else None,
        gb=gb if st.akinci else None, gc_b=gc_b if st.akinci else None,
        wb=wb if st.akinci else None)

    # --- per-step loop engine + hoisted loop-constant vectors ---------------
    # Both loop operators are linear maps against step-fixed coefficients
    # (module docstring): S = S_f + S_s + S_b is the self-side coefficient,
    # the matvec carries the neighbor side. Band (MXU) engine when the
    # matrix fits the byte budget, (N, K) gather engine beyond (1M scale).
    # Engine choice, cheapest-first: reuse the build's CSR plan when its
    # matrix fits the budget; else a tighter pair-derived plan (extra
    # plan_blocks sort, smaller A); else (N, K) gathers (1M scale).
    use_csr_plan = nbh.plan is not None and use_band_engine(n, st.band_nb)
    if use_csr_plan or use_band_engine(n, st.pair_nb):
        band = bandmat.build_band(
            nbh.pos, nbh.idx, nbh.mask_f, h=st.h, m=st.particle_m,
            nbcap=st.band_nb if use_csr_plan else st.pair_nb,
            B=st.band_B, plan=nbh.plan if use_csr_plan else None,
            dtype=BAND_DTYPE)
        S = band.s
        mv, mvd = band_matvec_ops(band)
        engine_overflow = band.overflow
    elif nbh.plan is not None and use_coef_engine(n, st.band_nb, st.band_B):
        # Stored-coefficient MXU engine (the 1M regime): the 3-component
        # matrix would not fit HBM, but the scalar bf16 w does — each
        # matvec is one 4-wide einsum streaming w at HBM rate
        # (bandmat.CoefEngine docstring for the algebra and accuracy).
        ceng = bandmat.build_coef_engine(
            nbh.pos, h=st.h, m=st.particle_m, plan=nbh.plan, B=st.band_B,
            dtype=BAND_DTYPE)
        S = ceng.s
        mv, mvd = bandmat.coef_matvec_ops(ceng, n, st.band_B)
        engine_overflow = ceng.overflow
    elif nbh.plan is not None:
        # Dense-window engine: cache only the (QB, W) position windows of
        # the build's CSR plan and recompute the coefficients inside each
        # matvec (bandmat.WindowEngine docstring for the rationale).
        weng = bandmat.build_window_engine(
            nbh.pos, h=st.h, m=st.particle_m, plan=nbh.plan, B=st.band_B)
        S = weng.s
        mv, mvd = bandmat.window_matvec_ops(weng, nbh.pos, st.h,
                                            st.particle_m, st.band_B)
        engine_overflow = weng.overflow
    else:
        S = base.sum_vec(gx, wf)
        mv, mvd = gather_matvec_ops(st, nbh, wf, gx, rho, alpha)
        engine_overflow = jnp.zeros((), jnp.int32)
    if has_rigid:
        S = S + base.sum_vec(gx, ws)
    if st.akinci:
        S = S + sb_vec

    solid_dot_const = solid_dot_const_fn(st, nbh, rigid, ws, gx) \
        if has_rigid else (lambda include_alpha, dt_arg: jnp.float32(0.0))

    def ext_force_fn(v):
        tension = base.nbh_tension(st, nbh, TENSION_K)
        viscosity = base.nbh_viscosity(st, nbh, v, rho, rigid,
                                       c_s=VISCOSITY_C_S,
                                       alpha=VISCOSITY_ALPHA, oid=oid)
        return tension + viscosity

    scatter_fn = rigid_scatter_fn(st, nbh, ws, gx) if has_rigid else None

    return _Pre(pos=pos, perm=nbh.perm, oid=oid, vel=vel, warm_k=warm_k,
                rho=rho, alpha=alpha, count=nbh.count, S=S, mv=mv, mvd=mvd,
                ext_force_fn=ext_force_fn, cs_fn=solid_dot_const,
                scatter_fn=scatter_fn,
                overflow=jnp.maximum(nbh.overflow, engine_overflow))


def _finish_step(st: SceneStatic, state: base.SimState,
                 pre: _Pre) -> base.SimState:
    """Engine-agnostic solve body: warm start, divergence solve, external
    forces + adaptive CFL dt, density solve, integration — the reference's
    step order (dfsph_solver.py:428-445), shared verbatim by the compact
    and dense prepare paths."""
    fluid, rigid = state.fluid, state.rigid
    dt = state.dt
    vel, warm_k = pre.vel, pre.warm_k
    rho, alpha = pre.rho, pre.alpha

    stiff_vel_delta, vel_dot_terms, rho_derivative, rho_adv_residual = \
        loop_operators(pre.mv, pre.mvd, pre.S, pre.count)

    # --- divergence solve (dfsph_solver.py:393-416) -------------------------
    if WARM_START:
        vel = vel - stiff_vel_delta((warm_k / dt) / rho) * dt
        warm_k = jnp.zeros_like(warm_k)

    cs_div = pre.cs_fn(False, dt)
    dr0, avg0 = rho_derivative(vel, cs_div)

    def div_cond(carry):
        _, _, _, avg, _, stop, it = carry
        return (((it < MIN_ITER_DIV) | (avg > DIV_THRESHOLD))
                & (it < MAX_ITER_DIV) & jnp.logical_not(stop))

    def div_body(carry):
        v, wk, dr, avg, past, _, it = carry
        k_over_rho = (dr * alpha / dt) / rho
        v = v - stiff_vel_delta(k_over_rho) * dt
        wk = wk + dr * alpha          # sum_up_stiff (dfsph_solver.py:381-384)
        new_dr, new_avg = rho_derivative(v, cs_div)
        stop = jnp.abs(new_avg - avg) < STALL_EPS
        return (v, wk, new_dr, new_avg, avg, stop, it + 1)

    vel, warm_k, _, div_avg, _, _, div_iters = while_loop_unrolled(
        div_cond, div_body,
        (vel, warm_k, dr0, avg0, jnp.zeros(()), jnp.zeros((), bool),
         jnp.zeros((), jnp.int32)), unroll=loop_unroll(st))

    # --- external forces + v_adv + adaptive dt (dfsph_solver.py:91-122) -----
    force_ext = base.gravity_acc(st) + pre.ext_force_fn(vel)
    vel_adv = vel + force_ext * (dt / st.particle_m)

    max_vel = jnp.max(vel_adv.norm())
    if st.rigid_active and st.n_rigid > 0:
        rel = V3(rigid.pos.x - rigid.centroid[0],
                 rigid.pos.y - rigid.centroid[1],
                 rigid.pos.z - rigid.centroid[2])
        spin = V3(rigid.omega[0], rigid.omega[1], rigid.omega[2]).cross(rel)
        max_vel = max_vel + jnp.max(jnp.linalg.norm(rigid.vel) + spin.norm())
    if ADAPTIVE_DT:
        cfl_dt = 0.4 * (2.0 * st.particle_radius) / max_vel * 0.2
        dt = jnp.clip(cfl_dt, MIN_DT, MAX_DT)
    dt2 = dt * dt

    # --- density solve (dfsph_solver.py:221-233) ----------------------------
    cs_den = pre.cs_fn(True, dt)
    den_thresh = DENSITY_THRESHOLD * RHO_0 * 0.01

    def den_cond(carry):
        _, avg, _, it = carry
        return (((it < MIN_ITER_DENSITY) | (avg - RHO_0 > den_thresh))
                & (it < MAX_ITER_DENSITY))

    def den_body(carry):
        v_adv, _, rforce, it = carry
        rho_adv, avg = rho_adv_residual(rho, dt, v_adv, cs_den)
        k_over_rho = ((rho_adv - RHO_0) * alpha / dt2) / rho
        if pre.scatter_fn is not None:
            rforce = pre.scatter_fn(k_over_rho, rforce)
        v_adv = v_adv - stiff_vel_delta(k_over_rho) * dt
        return (v_adv, avg, rforce, it + 1)

    vel_adv, den_avg, rigid_force, den_iters = while_loop_unrolled(
        den_cond, den_body,
        (vel_adv, jnp.float32(jnp.inf), rigid.force,
         jnp.zeros((), jnp.int32)), unroll=loop_unroll(st))

    # --- position update (dfsph_solver.py:235-250) --------------------------
    new_pos = pre.pos + vel_adv * (dt * base.ARTIFICIAL_FRICTION)
    new_vel = vel_adv * base.ARTIFICIAL_FRICTION
    if not st.akinci:
        new_pos, new_vel = base.clamp_to_box(st, new_pos, new_vel,
                                             margin=st.particle_radius,
                                             decay_mul=-base.V_DECAY)

    return state._replace(
        overflow=pre.overflow,
        fluid=base.FluidState(
            pos=new_pos, vel=new_vel,
            acc=pre.acc if pre.acc is not None
            else fluid.acc.take(pre.perm), oid=pre.oid),
        rigid=rigid._replace(force=rigid_force),
        dt=dt,
        t=state.t + dt,
        step_count=state.step_count + 1,
        extra=(warm_k,),
        # [divergence iters, divergence residual, density iters,
        #  density error] — the reference's per-step prints
        # (dfsph_solver.py:233,416).
        diag=jnp.stack([div_iters.astype(jnp.float32), div_avg,
                        den_iters.astype(jnp.float32), den_avg - RHO_0]),
    )
