"""Dense-mode fluid-rigid coupling: group-sparse whole-set rigid windows.

Round-3 left rigid-coupled scenes on the round-2 compact engine — every
dense-mode optimization gated on `not rigid_active`, so the reference's
coupling demo was the one bench row that did not improve (VERDICT r03
item 4). The fix exploits the same structure as the Akinci boundary pass
(ops/bandmat.dense_boundary_terms): the rigid body is a SMALL localized
particle set (10^2-10^4 voxels vs 10^4-10^6 fluid), so

  * only RIGID-NEAR fluid query groups (selected by the same cheap CSR
    interval test, over a per-step rigid cell table — the body moves)
    pay anything;
  * the near groups evaluate against the WHOLE padded rigid set — no
    block plan at all (ceil(Nr/128)*128 window slots), recomputing pair
    geometry per pass at dense-VPU rates (nothing per-pair is stored);
  * every fluid-side solid term the solvers need reduces to four
    step-constant sums (rho_s, S_s, qsum_s, g2_s) plus three start-pinned
    closures (contact-velocity dot, predicted density, viscosity);
  * the REACTION force is computed rigid-side from a tiny compact
    (Nr, Kf) fluid-neighbor list (race-free, no scatter into window
    slots): each per-iteration update is an (Nr, Kf) gather of one
    fluid scalar — negligible next to the fluid passes it replaces.

Reference force scatters this mirrors: wcsph_solver.py:117-126,
pcisph_solver.py:178-188, iisph_solver.py:150-160, dfsph_solver.py:204-212;
grid insertion of rigid particles: ParticleSystem.py:399-407.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3

BLOCK = bandmat.BLOCK


class RigidWindows(NamedTuple):
    """Step-constant plumbing of the group-sparse rigid passes. Holds the
    near-group selection, the sorted/padded rigid tables, and the near
    groups' query positions — per-pair geometry is recomputed inside each
    pass ((cap, B, Wr) dense tensors would be hundreds of MB if stored)."""
    gidx: jnp.ndarray      # (cap,) int32 — rigid-near query-group ids
    gmask: jnp.ndarray     # (cap,) bool
    tbx: jnp.ndarray       # (Wr,) — cell-sorted, padded rigid positions
    tby: jnp.ndarray
    tbz: jnp.ndarray
    tvol: jnp.ndarray      # (Wr,) — per-particle volumes (0 at pads)
    lid: jnp.ndarray       # (Wr,) int32 — ORIGINAL rigid index per slot
    svalid: jnp.ndarray    # (Wr,) bool — real-slot mask
    qx: jnp.ndarray        # (cap, B) — near groups' query positions
    qy: jnp.ndarray
    qz: jnp.ndarray
    overflow: jnp.ndarray  # () int32 — near-group capacity overflow


def build_rigid_windows(st, pos_q: V3, qcells: jnp.ndarray,
                        rigid_pos: V3, rigid_vol: jnp.ndarray, *,
                        cap: int) -> RigidWindows:
    """Select rigid-near query groups (per-step rigid cell table + the
    same CSR interval test as the boundary pass) and stage the whole
    padded rigid set as window tables."""
    n = pos_q.x.shape[0]
    nr = rigid_pos.x.shape[0]
    B = qcells.shape[1]
    QB = qcells.shape[0]
    cap = min(cap, QB)
    grid = st.grid

    table = nb.build_cell_table(rigid_pos, grid)
    lo, hi = bandmat.csr_intervals(qcells, table.starts, grid)
    has = jnp.any(hi > lo, axis=1)
    n_near = jnp.sum(has.astype(jnp.int32))
    over_g = jnp.maximum(n_near - cap, 0).astype(jnp.int32)
    # Ascending selection by cumsum + unique-index scatter (see
    # bandmat.build_boundary_windows).
    iota = jnp.arange(QB, dtype=jnp.int32)
    p = jnp.cumsum(has.astype(jnp.int32)) - 1
    tgt = jnp.where(has & (p < cap), p, cap)
    gidx = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(
        iota, mode="drop")[:cap]
    gmask = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(n_near, cap)

    nblk = -(-nr // BLOCK)
    padn = nblk * BLOCK - nr
    srt = rigid_pos.take(table.order)
    tbx = jnp.pad(srt.x, (0, padn))
    tby = jnp.pad(srt.y, (0, padn))
    tbz = jnp.pad(srt.z, (0, padn))
    tvol = jnp.pad(rigid_vol[table.order], (0, padn))
    lid = jnp.pad(table.order, (0, padn))
    svalid = jnp.arange(nblk * BLOCK, dtype=jnp.int32) < nr

    def q(c):
        return jnp.pad(c, (0, QB * B - n), mode="edge").reshape(QB, B)[gidx]

    return RigidWindows(gidx=gidx, gmask=gmask, tbx=tbx, tby=tby, tbz=tbz,
                        tvol=tvol, lid=lid, svalid=svalid,
                        qx=q(pos_q.x), qy=q(pos_q.y), qz=q(pos_q.z),
                        overflow=over_g)


def _scatter(rw: RigidWindows, n: int, vals):
    """(cap, B) group values -> (N,) sorted fluid rows (drop-masked)."""
    B = rw.qx.shape[1]
    QB = -(-n // B)
    gsafe = jnp.where(rw.gmask, rw.gidx, QB)
    out = jnp.zeros((QB + 1, B), jnp.float32)
    return out.at[gsafe].set(vals, mode="drop").reshape(-1)[:QB * B][:n]


def _geom0(rw: RigidWindows, h: float):
    """Start-pinned pair geometry of the near groups (recomputed)."""
    dx0 = rw.qx[:, :, None] - rw.tbx[None, None, :]
    dy0 = rw.qy[:, :, None] - rw.tby[None, None, :]
    dz0 = rw.qz[:, :, None] - rw.tbz[None, None, :]
    r2 = dx0 * dx0 + dy0 * dy0 + dz0 * dz0
    valid = (rw.svalid[None, None, :] & rw.gmask[:, None, None]
             & (r2 <= jnp.float32(h) * jnp.float32(h)))
    r0 = jnp.sqrt(jnp.maximum(r2, 1e-24))
    return dx0, dy0, dz0, r0, valid


class RigidTerms(NamedTuple):
    """Step-constant fluid-side solid sums (sorted fluid order, (N,)):
      rho:  rho0 * Sigma_s V_j W_ij            (density solid term)
      s:    V3 Sigma_s w_s gradW, w_s = rho0 V_j (pressure/d_ii/alpha)
      qsum: Sigma_s (w_s |gradW|)^2            (DFSPH alpha Q term)
      g2:   Sigma_s w_s |gradW|^2              (IISPH a_ii d_ji term)
    """
    rho: jnp.ndarray
    s: V3
    qsum: jnp.ndarray
    g2: jnp.ndarray


def rigid_terms(st, rw: RigidWindows, rho0: float, n: int) -> RigidTerms:
    """The four step-constant sums over the start-pinned windows."""
    dx0, dy0, dz0, r0, valid = _geom0(rw, st.h)
    ws = jnp.where(valid, jnp.float32(rho0) * rw.tvol[None, None, :], 0.0)
    wk = sm.cubic_w(r0, st.h)
    gc = sm.cubic_grad_coeff(r0, st.h)
    wg = ws * gc

    def sc(t):
        return _scatter(rw, n, t.sum(axis=2))

    return RigidTerms(
        rho=sc(ws * wk),
        s=V3(sc(wg * dx0), sc(wg * dy0), sc(wg * dz0)),
        qsum=sc((wg * r0) ** 2),
        g2=sc(wg * gc * r0 * r0))


def contact_dot_op(st, rw: RigidWindows, rho0: float, n: int):
    """fn(v_r: V3 (Nr,) in ORIGINAL rigid order) -> (N,)
    Sigma_s w_s (v_r_j . gradW_ij) — the loop-constant solid velocity dot
    (DFSPH C_s, dfsph_solver.py:288-294; IISPH rho_adv solid term,
    iisph_solver.py:325-334)."""
    def dot_of(v_r: V3) -> jnp.ndarray:
        dx0, dy0, dz0, r0, valid = _geom0(rw, st.h)
        wg = jnp.where(valid, jnp.float32(rho0) * rw.tvol[None, None, :],
                       0.0) * sm.cubic_grad_coeff(r0, st.h)
        vx = v_r.x[rw.lid][None, None, :]
        vy = v_r.y[rw.lid][None, None, :]
        vz = v_r.z[rw.lid][None, None, :]
        acc = wg * (dx0 * vx + dy0 * vy + dz0 * vz)
        return _scatter(rw, n, acc.sum(axis=2))

    return dot_of


def predict_rho_op(st, rw: RigidWindows, rho0: float, n: int):
    """fn(pos_p: V3 (N,) sorted predicted fluid positions) -> (N,)
    rho0 * Sigma_s V_j W(|pos_p_i - x_j|) over start-valid pairs (the
    rigid side keeps its current positions, pcisph_solver.py:143-147)."""
    B = rw.qx.shape[1]
    QB = -(-n // B)
    _, _, _, r0, valid = _geom0(rw, st.h)
    ws0 = jnp.where(valid, jnp.float32(rho0) * rw.tvol[None, None, :], 0.0)

    def q(c):
        return jnp.pad(c, (0, QB * B - n), mode="edge"
                       ).reshape(QB, B)[rw.gidx]

    def rho_of(pos_p: V3) -> jnp.ndarray:
        dx = q(pos_p.x)[:, :, None] - rw.tbx[None, None, :]
        dy = q(pos_p.y)[:, :, None] - rw.tby[None, None, :]
        dz = q(pos_p.z)[:, :, None] - rw.tbz[None, None, :]
        r = jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
        return _scatter(rw, n, (ws0 * sm.cubic_w(r, st.h)).sum(axis=2))

    return rho_of


def viscosity_op(st, rw: RigidWindows, rho0: float, n: int,
                 c_s: float, alpha: float, eps: float = 0.01):
    """fn(vel (N,) sorted, rho (N,), rho_quirk (Nr,) orig order,
    body_vel (3,)) -> V3 (N,) — the solid branch of Monaghan viscosity
    (solver_base.py:190-201): rigid neighbors carry the body linear
    velocity, the neighbor rho is the quirk read, and the result is
    already scaled by particle_m (matching models/base.nbh_viscosity's
    solid branch term-for-term)."""
    B = rw.qx.shape[1]
    QB = -(-n // B)
    nu_num = jnp.float32(2.0 * alpha * st.h * c_s)

    def q(c):
        return jnp.pad(c, (0, QB * B - n), mode="edge"
                       ).reshape(QB, B)[rw.gidx]

    def visc_of(vel: V3, rho: jnp.ndarray, rho_quirk: jnp.ndarray,
                body_vel: jnp.ndarray) -> V3:
        dx0, dy0, dz0, r0, valid = _geom0(rw, st.h)
        gc = sm.cubic_grad_coeff(r0, st.h)
        q2e = r0 * r0 + jnp.float32(eps) * st.h * st.h
        wsv = jnp.float32(rho0) * rw.tvol[None, None, :]
        vix = q(vel.x)[:, :, None] - body_vel[0]
        viy = q(vel.y)[:, :, None] - body_vel[1]
        viz = q(vel.z)[:, :, None] - body_vel[2]
        shear = vix * dx0 + viy * dy0 + viz * dz0
        rho_i = q(rho)[:, :, None]
        rho_j = rho_quirk[rw.lid][None, None, :]
        pi = -(nu_num / (rho_i + rho_j)) * shear / q2e
        scale = jnp.where(valid & (shear < 0.0), -wsv * pi * gc, 0.0)
        return V3(_scatter(rw, n, (scale * dx0).sum(axis=2)),
                  _scatter(rw, n, (scale * dy0).sum(axis=2)),
                  _scatter(rw, n, (scale * dz0).sum(axis=2))
                  ) * jnp.float32(st.particle_m)

    return visc_of


class RigidSide(NamedTuple):
    """Rigid-side reaction plumbing: the compact (Nr, Kf) fluid-neighbor
    list of the rigid particles against the SORTED fluid, with hoisted
    pair geometry. rigid_side_force computes
        F_j += Sigma_i gx_j,i * u_i
    for a per-fluid scalar u (e.g. p_i/rho_i^2 or k_i, pre-scaled by m) —
    one (Nr, Kf) packed gather per call. Replaces the fluid-side scatter
    (the reference's atomic +=, wcsph_solver.py:126) race-free from the
    rigid side; each fluid-rigid pair is charged exactly once."""
    idx: jnp.ndarray      # (Nr, Kf) into sorted fluid
    mask: jnp.ndarray
    gx: V3                # (Nr, Kf) coeff * gradW vectors (x_i - x_j)
    overflow: jnp.ndarray


def build_rigid_side(st, rigid_pos: V3, rigid_vol: jnp.ndarray,
                     pos_s: V3, starts: jnp.ndarray, rho0: float,
                     Kf: int) -> RigidSide:
    """(Nr, Kf) fluid neighbors of each rigid particle over the step's
    sorted-fluid CSR table (identity order: the fluid is already sorted).
    Pair geometry (x_ij = x_fluid - x_rigid, gradW, V_j rho0 coefficient)
    is hoisted; overflow beyond Kf is counted."""
    n = pos_s.x.shape[0]
    table = nb.CellTable(order=jnp.arange(n, dtype=jnp.int32),
                         starts=starts)
    nl = nb.find_neighbors(rigid_pos, None, pos_s, table, st.grid,
                           K=Kf, cell_cap=st.cell_cap, k2=0)
    x = V3(nl.spos.x - rigid_pos.x[:, None],
           nl.spos.y - rigid_pos.y[:, None],
           nl.spos.z - rigid_pos.z[:, None])    # x_i - x_j
    r = x.norm()
    gc = sm.cubic_grad_coeff(r, st.h)
    coeff = jnp.where(nl.mask & (r <= st.h),
                      jnp.float32(rho0) * rigid_vol[:, None] * gc, 0.0)
    over = jnp.maximum(jnp.max(nl.count) - Kf, 0).astype(jnp.int32)
    over = jnp.maximum(over, nl.dropped)
    return RigidSide(idx=nl.idx, mask=nl.mask,
                     gx=V3(x.x * coeff, x.y * coeff, x.z * coeff),
                     overflow=over)


def rigid_side_force(rs: RigidSide, u: jnp.ndarray, rider: jnp.ndarray,
                     force: V3) -> V3:
    """force += Sigma_i gx_j,i * u_i. `rider` packs a second per-fluid
    array into the same gather (distinct lanes keep the fast 4-lane
    slice-gather form; see models/base.jf_pack note)."""
    tbl = jnp.stack([u, rider, u + rider, u - rider], axis=0)
    rows = tbl[:, rs.idx]
    ui = rows[0]
    return V3(force.x + jnp.sum(rs.gx.x * ui, axis=1),
              force.y + jnp.sum(rs.gx.y * ui, axis=1),
              force.z + jnp.sum(rs.gx.z * ui, axis=1))
