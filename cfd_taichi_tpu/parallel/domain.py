"""Spatial domain decomposition over a TPU device mesh with halo exchange.

This is new capability — the reference is strictly single-process/single-GPU
(SURVEY.md §2.2: no distributed execution of any kind). The scaling axis of
this domain is particle count / spatial extent (SURVEY.md §5), and the
TPU-native answer is:

  * 1-D slab decomposition of the simulation box along its longest axis;
    each device owns the particles inside its slab, stored at a fixed
    per-device capacity with a validity mask (static shapes under jit).
  * per step, each device exchanges a 2h-deep *ghost band* of particles with
    its ring neighbors over ICI via `lax.ppermute` (structurally the same
    communication pattern as ring attention, SURVEY.md §5): 2h deep so that
    densities of in-range ghost neighbors are themselves computable locally.
  * after integration, particles that crossed a slab boundary migrate to the
    neighbor device (again `ppermute`), and local slots are re-compacted.
  * global reductions (CFL, residuals, diagnostics) become `lax.pmax/psum`
    over the mesh axis — replacing the reference's kernel-scalar host syncs
    (dfsph_solver.py:125,253; pcisph_solver.py:122).

Particle state is component-separated (V3, ops/vec.py) so every buffer
tiles cleanly on TPU. The sharded step currently covers the WCSPH fluid
path (clamp or Akinci boundary; rigid coupling remains single-chip).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3
from cfd_taichi_tpu.scene import RHO_0, SceneArrays, SceneStatic

AXIS = "shard"


def make_mesh(n_devices: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (AXIS,))


@dataclasses.dataclass(frozen=True)
class ShardSpec:
    """Static decomposition metadata (hashable, jit-static)."""
    ndev: int
    cap: int            # per-device particle capacity
    hcap: int           # per-side halo capacity
    axis: int           # decomposition axis (longest box extent)
    slab_w: float       # slab width along `axis`
    lo: float           # box_min along `axis`


class ShardedFluid(NamedTuple):
    """Device-sharded fluid state; leading dim = ndev * cap, sharded on it."""
    pos: V3             # components (ndev*cap,)
    vel: V3
    mask: jnp.ndarray   # (ndev*cap,) bool — slot validity


def make_spec(st: SceneStatic, n_devices: int, slack: float = 1.7) -> ShardSpec:
    ext = np.asarray(st.box_max) - np.asarray(st.box_min)
    axis = int(np.argmax(ext))
    slab_w = float(ext[axis]) / n_devices
    if slab_w < 2.0 * st.h:
        raise ValueError(
            f"Slabs ({slab_w:.3f}) thinner than the 2h ghost band "
            f"({2*st.h:.3f}); use fewer devices for this scene.")
    cap = int(np.ceil(st.n_fluid / n_devices * slack))
    cap = max((cap + 7) // 8 * 8, 8)
    # Halo band is 2h deep; bound its occupancy by a dense-packing estimate.
    band_particles = (2.0 * st.h / (2.0 * st.particle_radius) + 2) * \
        (ext[(axis + 1) % 3] / (2.0 * st.particle_radius) + 2) * \
        (ext[(axis + 2) % 3] / (2.0 * st.particle_radius) + 2)
    hcap = int(min(band_particles * 1.5, cap))
    hcap = max((hcap + 7) // 8 * 8, 8)
    return ShardSpec(ndev=n_devices, cap=cap, hcap=hcap, axis=axis,
                     slab_w=slab_w, lo=float(np.asarray(st.box_min)[axis]))


def shard_fluid(mesh: Mesh, spec: ShardSpec, pos: np.ndarray,
                vel: np.ndarray | None = None) -> ShardedFluid:
    """Host-side partition of particles into per-device slabs (capacity-padded).

    `pos`/`vel` are host (N, 3) arrays (or V3s, converted)."""
    if hasattr(pos, "to_numpy"):
        pos = pos.to_numpy()
    pos = np.asarray(pos, np.float32)
    if vel is None:
        vel = np.zeros_like(pos)
    elif hasattr(vel, "to_numpy"):
        vel = vel.to_numpy()
    vel = np.asarray(vel, np.float32)
    dev_of = np.clip(((pos[:, spec.axis] - spec.lo) // spec.slab_w).astype(np.int64),
                     0, spec.ndev - 1)
    pos_out = np.zeros((spec.ndev * spec.cap, 3), np.float32)
    vel_out = np.zeros((spec.ndev * spec.cap, 3), np.float32)
    mask_out = np.zeros((spec.ndev * spec.cap,), bool)
    for d in range(spec.ndev):
        idx = np.nonzero(dev_of == d)[0]
        if idx.shape[0] > spec.cap:
            raise ValueError(f"Device {d} over capacity: {idx.shape[0]} > {spec.cap}")
        s = d * spec.cap
        pos_out[s:s + idx.shape[0]] = pos[idx]
        vel_out[s:s + idx.shape[0]] = vel[idx]
        mask_out[s:s + idx.shape[0]] = True
    sh = NamedSharding(mesh, P(AXIS))
    put = lambda a: jax.device_put(jnp.asarray(a), sh)  # noqa: E731
    return ShardedFluid(
        pos=V3(put(pos_out[:, 0]), put(pos_out[:, 1]), put(pos_out[:, 2])),
        vel=V3(put(vel_out[:, 0]), put(vel_out[:, 1]), put(vel_out[:, 2])),
        mask=put(mask_out),
    )


def unshard(fluid: ShardedFluid):
    """Gather valid particles back to host, order-independently."""
    mask = np.asarray(fluid.mask)
    return fluid.pos.to_numpy()[mask], fluid.vel.to_numpy()[mask]


# ---------------------------------------------------------------------------
# In-shard packing helpers (fixed shapes, no dynamic sizes)
# ---------------------------------------------------------------------------

def _pack(select: jnp.ndarray, arrays: list, out_cap: int):
    """Compact rows where `select` is True into the first slots of fixed-size
    (out_cap,) buffers. Returns (packed_arrays, out_mask)."""
    key = select.astype(jnp.int32)
    _, idx = jax.lax.top_k(key, out_cap)          # stable: first selected rows
    got = jnp.take(select, idx)
    packed = [jnp.where(got, jnp.take(a, idx), 0.0) for a in arrays]
    return packed, got


def _ring_shift(x, direction: int):
    """ppermute by +-1 along the shard ring: direction=+1 delivers device i's
    payload to device i+1 (each device receives from its left neighbor)."""
    n = jax.lax.axis_size(AXIS)
    perm = [(i, (i + direction) % n) for i in range(n)]
    return jax.lax.ppermute(x, AXIS, perm)


def _exchange(spec: ShardSpec, arrays: list, select_left, select_right):
    """Pack rows selected per side and trade them with ring neighbors.
    Returns (from_left_arrays, from_left_mask, from_right_arrays,
    from_right_mask) with the wrap-around edges masked off."""
    me = jax.lax.axis_index(AXIS)
    n = jax.lax.axis_size(AXIS)
    packed_l, ml = _pack(select_left, arrays, spec.hcap)
    packed_r, mr = _pack(select_right, arrays, spec.hcap)
    # Payload going right (right-edge band / right-crossers) arrives as the
    # receiver's from_left; symmetric for the other direction.
    from_left = [_ring_shift(t, +1) for t in packed_r + [mr]]
    from_right = [_ring_shift(t, -1) for t in packed_l + [ml]]
    fl_mask = jnp.where(me == 0, False, from_left[-1])
    fr_mask = jnp.where(me == n - 1, False, from_right[-1])
    return from_left[:-1], fl_mask, from_right[:-1], fr_mask


def _halo_exchange(spec: ShardSpec, pos: V3, vel: V3, mask, h: float):
    """Collect each side's 2h ghost band and trade it with ring neighbors.
    Returns halo (pos, vel, mask) of shape (2*hcap,)."""
    me = jax.lax.axis_index(AXIS)
    x = (pos.x, pos.y, pos.z)[spec.axis]
    slab_lo = spec.lo + me.astype(jnp.float32) * spec.slab_w
    slab_hi = slab_lo + spec.slab_w
    send_left = mask & (x < slab_lo + 2.0 * h)
    send_right = mask & (x >= slab_hi - 2.0 * h)
    arrays = [pos.x, pos.y, pos.z, vel.x, vel.y, vel.z]
    fl, fl_m, fr, fr_m = _exchange(spec, arrays, send_left, send_right)
    halo_pos = V3(*(jnp.concatenate([a, b]) for a, b in zip(fl[0:3], fr[0:3])))
    halo_vel = V3(*(jnp.concatenate([a, b]) for a, b in zip(fl[3:6], fr[3:6])))
    halo_mask = jnp.concatenate([fl_m, fr_m])
    return halo_pos, halo_vel, halo_mask


def _migrate(spec: ShardSpec, pos: V3, vel: V3, mask):
    """Send boundary-crossing particles to ring neighbors and re-compact."""
    me = jax.lax.axis_index(AXIS)
    x = (pos.x, pos.y, pos.z)[spec.axis]
    dev_of = jnp.clip(((x - spec.lo) / spec.slab_w).astype(jnp.int32),
                      0, spec.ndev - 1)
    go_left = mask & (dev_of < me)
    go_right = mask & (dev_of > me)
    stay = mask & ~go_left & ~go_right

    arrays = [pos.x, pos.y, pos.z, vel.x, vel.y, vel.z]
    fl, fl_m, fr, fr_m = _exchange(spec, arrays, go_left, go_right)
    packed_stay, ms = _pack(stay, arrays, spec.cap)

    merged = [jnp.concatenate([s, a, b])
              for s, a, b in zip(packed_stay, fl, fr)]
    merged_mask = jnp.concatenate([ms, fl_m, fr_m])
    final, mf = _pack(merged_mask, merged, spec.cap)
    return (V3(final[0], final[1], final[2]), V3(final[3], final[4], final[5]),
            mf)


# ---------------------------------------------------------------------------
# Sharded WCSPH step (fluid-only; clamp or Akinci boundary)
# ---------------------------------------------------------------------------

def make_sharded_wcsph_step(st: SceneStatic, arrays: SceneArrays, mesh: Mesh,
                            spec: ShardSpec):
    """Build a jitted sharded WCSPH step closed over static scene metadata.

    Physics identical to models/wcsph.py (Tait EOS etc.); ghosts are deep
    enough (2h) that a ghost neighbor's density — needed for the symmetric
    pressure term — is computed locally without a second exchange round.
    """
    from jax.experimental.shard_map import shard_map

    from cfd_taichi_tpu.models import wcsph as w

    h = st.h
    dt = jnp.float32(st.dt0)

    def local_step(px, py, pz, vx, vy, vz, mask, bx, by, bz, bvol):
        pos = V3(px, py, pz)
        vel = V3(vx, vy, vz)
        bpos = V3(bx, by, bz)
        halo_pos, halo_vel, halo_mask = _halo_exchange(spec, pos, vel, mask, h)
        src_pos = V3(*(jnp.concatenate([a, b]) for a, b in
                       zip(pos.astuple(), halo_pos.astuple())))
        src_vel = V3(*(jnp.concatenate([a, b]) for a, b in
                       zip(vel.astuple(), halo_vel.astuple())))
        src_mask = jnp.concatenate([mask, halo_mask])
        ns = src_mask.shape[0]

        # Invalid slots go to a virtual cell past the grid so no real cell's
        # capacity is wasted on padding.
        table = nb.build_cell_table(src_pos, st.grid, valid=src_mask)
        qid = jnp.arange(ns, dtype=jnp.int32)
        nlist = nb.find_neighbors(src_pos, qid, src_pos, table, st.grid,
                                  K=st.K, cell_cap=st.cell_cap,
                                  exclude_self=True)
        j = nlist.idx
        pair_mask = nlist.mask & src_mask[j] & src_mask[:, None]

        x_ij = src_pos.expand(1) - src_pos.take(j)
        r = x_ij.norm()
        wk = sm.cubic_w(r, h)
        rho = 0.001 + st.particle_m * jnp.sum(
            jnp.where(pair_mask, wk, 0.0), axis=1)

        if st.akinci:
            btab = nb.build_cell_table(bpos, st.grid)
            blist = nb.find_neighbors(src_pos, None, bpos, btab, st.grid,
                                      K=st.bK, cell_cap=st.cell_cap)
            bj, bm = blist.idx, blist.mask
            xb = src_pos.expand(1) - bpos.take(bj)
            rb = xb.norm()
            wb = sm.cubic_w(rb, h)
            rho = rho + RHO_0 * jnp.sum(
                jnp.where(bm, bvol[bj] * wb, 0.0), axis=1)

        p = w.tait_pressure(rho)
        p_over_rho2 = p / (rho * rho)
        gcoef = sm.cubic_grad_coeff(r, h)
        sym = p_over_rho2[:, None] + p_over_rho2[j]
        pscale = jnp.where(pair_mask, -st.particle_m * sym * gcoef, 0.0)
        acc = x_ij * pscale

        # Viscosity (fluid-only; reference solver_base.py:170-189).
        v_ij = src_vel.expand(1) - src_vel.take(j)
        shear = v_ij.dot(x_ij)
        q2 = x_ij.norm2()
        nu = (2.0 * w.VISCOSITY_ALPHA * h * w.VISCOSITY_C_S) \
            / (rho[:, None] + rho[j])
        pi_v = -nu * shear / (q2 + 0.01 * h * h)
        visc_scale = jnp.where(pair_mask & (shear < 0.0),
                               -st.particle_m * st.particle_m * pi_v * gcoef,
                               0.0)
        acc = acc + x_ij * visc_scale

        tens_scale = jnp.where(pair_mask, -w.TENSION_K * wk * st.particle_m,
                               0.0)
        acc = acc + x_ij * tens_scale
        acc_sum = acc.sum(axis=1)
        acc_tot = V3(acc_sum.x,
                     acc_sum.y - st.gravity,
                     acc_sum.z)
        if st.akinci:
            bgcoef = sm.cubic_grad_coeff(rb, h)
            bscale = jnp.where(
                bm, -bvol[bj] * p_over_rho2[:, None] * bgcoef * RHO_0, 0.0)
            bacc = (xb * bscale).sum(axis=1)
            acc_tot = acc_tot + bacc

        # Integrate only the locally-owned slots.
        def local(c):
            return c[:spec.cap]

        new_vel = V3(*((local(v) + local(a) * dt) * w.WCSPH_DAMPING
                       for v, a in zip(vel.astuple(), acc_tot.astuple())))
        new_pos = V3(*(local(pc) + nv * dt
                       for pc, nv in zip(pos.astuple(), new_vel.astuple())))
        if not st.akinci:
            margin = 2.0 * st.particle_radius
            np_, nv_ = [], []
            for c, v, lo_c, hi_c in zip(new_pos.astuple(), new_vel.astuple(),
                                        st.box_min, st.box_max):
                lo = jnp.float32(lo_c + margin)
                hi = jnp.float32(hi_c - margin)
                hit = (c <= lo) | (c >= hi)
                nv_.append(jnp.where(hit, v * -0.5, v))
                np_.append(jnp.clip(c, lo, hi))
            new_pos, new_vel = V3(*np_), V3(*nv_)
        new_pos = new_pos.where(mask, pos)
        new_vel = new_vel.where(mask, 0.0)

        out_pos, out_vel, out_mask = _migrate(spec, new_pos, new_vel, mask)
        return (*out_pos.astuple(), *out_vel.astuple(), out_mask)

    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(AXIS),) * 7 + (P(), P(), P(), P()),
        out_specs=(P(AXIS),) * 7,
        check_rep=False,
    )

    @jax.jit
    def step(fluid: ShardedFluid) -> ShardedFluid:
        out = mapped(*fluid.pos.astuple(), *fluid.vel.astuple(), fluid.mask,
                     *arrays.boundary_pos.astuple(), arrays.boundary_volume)
        return ShardedFluid(pos=V3(out[0], out[1], out[2]),
                            vel=V3(out[3], out[4], out[5]), mask=out[6])

    return step
