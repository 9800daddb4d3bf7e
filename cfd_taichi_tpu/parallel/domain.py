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

The sharded step currently covers the WCSPH and DFSPH fluid paths
(clamp or Akinci boundary; rigid coupling remains single-chip).
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
from cfd_taichi_tpu.scene import RHO_0, SceneArrays, SceneStatic

AXIS = "shard"


def make_mesh(n_devices: int) -> Mesh:
    devices = np.array(jax.devices()[:n_devices])
    return Mesh(devices, (AXIS,))


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
    pos: jnp.ndarray    # (ndev*cap, 3)
    vel: jnp.ndarray    # (ndev*cap, 3)
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
    """Host-side partition of particles into per-device slabs (capacity-padded)."""
    pos = np.asarray(pos, np.float32)
    vel = np.zeros_like(pos) if vel is None else np.asarray(vel, np.float32)
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
    return ShardedFluid(
        pos=jax.device_put(jnp.asarray(pos_out), sh),
        vel=jax.device_put(jnp.asarray(vel_out), sh),
        mask=jax.device_put(jnp.asarray(mask_out), sh),
    )


def unshard(fluid: ShardedFluid):
    """Gather valid particles back to host order-independently."""
    mask = np.asarray(fluid.mask)
    return np.asarray(fluid.pos)[mask], np.asarray(fluid.vel)[mask]


# ---------------------------------------------------------------------------
# In-shard packing helpers (fixed shapes, no dynamic sizes)
# ---------------------------------------------------------------------------

def _pack(select: jnp.ndarray, arrays: list, out_cap: int, fill=0.0):
    """Compact rows where `select` is True into the first slots of fixed-size
    (out_cap, ...) buffers. Returns (packed_arrays, out_mask)."""
    key = select.astype(jnp.int32)
    _, idx = jax.lax.top_k(key, out_cap)          # stable: first selected rows
    got = jnp.take(select, idx)
    packed = []
    for a in arrays:
        g = jnp.take(a, idx, axis=0)
        packed.append(jnp.where(got[:, None] if a.ndim == 2 else got, g, fill))
    return packed, got


def _ring_shift(x, direction: int):
    """ppermute by +-1 along the shard ring."""
    n = jax.lax.axis_size(AXIS)
    perm = [(i, (i + direction) % n) for i in range(n)]
    return jax.lax.ppermute(x, AXIS, perm)


def _halo_exchange(spec: ShardSpec, pos, vel, mask, h: float):
    """Collect each side's 2h ghost band and trade it with ring neighbors.

    Returns (halo_pos, halo_vel, halo_mask) of shape (2*hcap, ...): ghosts
    received from the left and right neighbors."""
    me = jax.lax.axis_index(AXIS)
    x = pos[:, spec.axis]
    slab_lo = spec.lo + me.astype(jnp.float32) * spec.slab_w
    slab_hi = slab_lo + spec.slab_w

    send_left = mask & (x < slab_lo + 2.0 * h)
    send_right = mask & (x >= slab_hi - 2.0 * h)
    (pl, vl), ml = _pack(send_left, [pos, vel], spec.hcap)
    (pr, vr), mr = _pack(send_right, [pos, vel], spec.hcap)

    # ppermute conventions: _ring_shift(x, +1) delivers device i's payload to
    # device i+1, i.e. each device *receives from its left neighbor*.
    # from_left  = the left neighbor's right-edge band (travels rightward),
    # from_right = the right neighbor's left-edge band (travels leftward).
    from_left = [_ring_shift(t, +1) for t in (pr, vr, mr)]
    from_right = [_ring_shift(t, -1) for t in (pl, vl, ml)]

    halo_pos = jnp.concatenate([from_left[0], from_right[0]], axis=0)
    halo_vel = jnp.concatenate([from_left[1], from_right[1]], axis=0)
    halo_mask = jnp.concatenate([from_left[2], from_right[2]], axis=0)

    # Ring wrap-around: the leftmost device would receive the rightmost
    # device's band (and vice versa) — geometrically bogus; mask it off.
    n = jax.lax.axis_size(AXIS)
    halo_mask = halo_mask.at[:spec.hcap].set(
        jnp.where(me == 0, False, halo_mask[:spec.hcap]))
    halo_mask = halo_mask.at[spec.hcap:].set(
        jnp.where(me == n - 1, False, halo_mask[spec.hcap:]))
    return halo_pos, halo_vel, halo_mask


def _migrate(spec: ShardSpec, pos, vel, mask):
    """Send boundary-crossing particles to ring neighbors and re-compact."""
    me = jax.lax.axis_index(AXIS)
    n = jax.lax.axis_size(AXIS)
    x = pos[:, spec.axis]
    dev_of = jnp.clip(((x - spec.lo) / spec.slab_w).astype(jnp.int32), 0, spec.ndev - 1)
    go_left = mask & (dev_of < me)
    go_right = mask & (dev_of > me)
    stay = mask & ~go_left & ~go_right

    (pl, vl), ml = _pack(go_left, [pos, vel], spec.hcap)
    (pr, vr), mr = _pack(go_right, [pos, vel], spec.hcap)
    # A left-going packet is received by the left neighbor: shift -1.
    in_from_right = [_ring_shift(t, -1) for t in (pl, vl, ml)]
    in_from_left = [_ring_shift(t, +1) for t in (pr, vr, mr)]
    # Mask the wrap-around edges.
    in_from_left[2] = jnp.where(me == 0, False, in_from_left[2])
    in_from_right[2] = jnp.where(me == n - 1, False, in_from_right[2])

    # Re-compact stayers into low slots, then place arrivals after them.
    (ps, vs), ms = _pack(stay, [pos, vel], spec.cap)
    all_pos = jnp.concatenate([ps, in_from_left[0], in_from_right[0]], axis=0)
    all_vel = jnp.concatenate([vs, in_from_left[1], in_from_right[1]], axis=0)
    all_mask = jnp.concatenate([ms, in_from_left[2], in_from_right[2]], axis=0)
    (pf, vf), mf = _pack(all_mask, [all_pos, all_vel], spec.cap)
    return pf, vf, mf


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

    def local_step(pos, vel, mask, bpos, bvol):
        halo_pos, halo_vel, halo_mask = _halo_exchange(spec, pos, vel, mask, h)
        src_pos = jnp.concatenate([pos, halo_pos], axis=0)
        src_vel = jnp.concatenate([vel, halo_vel], axis=0)
        src_mask = jnp.concatenate([mask, halo_mask], axis=0)
        ns = src_pos.shape[0]

        # Invalid slots go to a virtual cell past the grid so no real cell's
        # capacity is wasted on padding.
        src_pos_eff = src_pos
        table = nb.build_cell_table(src_pos_eff, st.grid, valid=src_mask)
        qid = jnp.arange(ns, dtype=jnp.int32)
        nlist = nb.find_neighbors(src_pos_eff, qid, src_pos_eff, table,
                                  st.grid, K=st.K, cell_cap=st.cell_cap,
                                  exclude_self=True)
        j = nlist.idx
        pair_mask = nlist.mask & src_mask[j] & src_mask[:, None]

        x_ij = src_pos_eff[:, None, :] - src_pos_eff[j]
        r = jnp.linalg.norm(x_ij, axis=-1)
        wk = sm.cubic_w(r, h)
        rho = 0.001 + st.particle_m * jnp.sum(jnp.where(pair_mask, wk, 0.0), axis=1)

        if st.akinci:
            btab = nb.build_cell_table(bpos, st.grid)
            blist = nb.find_neighbors(src_pos_eff, None, bpos, btab, st.grid,
                                      K=st.bK, cell_cap=st.cell_cap)
            bj, bm = blist.idx, blist.mask
            xb = src_pos_eff[:, None, :] - bpos[bj]
            wb = sm.cubic_w(jnp.linalg.norm(xb, axis=-1), h)
            rho = rho + RHO_0 * jnp.sum(
                jnp.where(bm, bvol[bj] * wb, 0.0), axis=1)

        p = w.tait_pressure(rho)
        p_over_rho2 = p / (rho * rho)
        gradw = sm.cubic_grad(x_ij, h)
        sym = p_over_rho2[:, None] + p_over_rho2[j]
        acc_p = jnp.sum(jnp.where(pair_mask[..., None],
                                  (-st.particle_m * sym)[..., None] * gradw,
                                  0.0), axis=1)

        # Viscosity (fluid-only; reference solver_base.py:170-189).
        v_ij = src_vel[:, None, :] - src_vel[j]
        shear = jnp.sum(v_ij * x_ij, axis=-1)
        q2 = jnp.sum(x_ij * x_ij, axis=-1)
        nu = (2.0 * w.VISCOSITY_ALPHA * h * w.VISCOSITY_C_S) / (rho[:, None] + rho[j])
        pi_v = -nu * shear / (q2 + 0.01 * h * h)
        visc_mask = pair_mask & (shear < 0.0)
        viscosity = st.particle_m * jnp.sum(
            jnp.where(visc_mask[..., None],
                      (-st.particle_m * pi_v)[..., None] * gradw, 0.0), axis=1)

        tension = st.particle_m * jnp.sum(
            jnp.where(pair_mask[..., None],
                      (-w.TENSION_K * wk)[..., None] * x_ij, 0.0), axis=1)

        acc = jnp.asarray([0.0, -st.gravity, 0.0])[None, :] \
            + acc_p + viscosity + tension
        if st.akinci:
            bgradw = sm.cubic_grad(xb, h)
            bacc = RHO_0 * jnp.sum(
                jnp.where(bm[..., None],
                          (-bvol[bj] * p_over_rho2[:, None])[..., None] * bgradw,
                          0.0), axis=1)
            acc = acc + bacc

        # Integrate only the locally-owned slots.
        new_vel = (src_vel[:spec.cap] + acc[:spec.cap] * dt) * w.WCSPH_DAMPING
        new_pos = src_pos[:spec.cap] + new_vel * dt
        if not st.akinci:
            lo = jnp.asarray(st.box_min, jnp.float32) + 2.0 * st.particle_radius
            hi = jnp.asarray(st.box_max, jnp.float32) - 2.0 * st.particle_radius
            hit = (new_pos <= lo) | (new_pos >= hi)
            new_vel = jnp.where(hit, new_vel * -0.5, new_vel)
            new_pos = jnp.clip(new_pos, lo, hi)
        new_pos = jnp.where(mask[:, None], new_pos, src_pos[:spec.cap])
        new_vel = jnp.where(mask[:, None], new_vel, 0.0)

        return _migrate(spec, new_pos, new_vel, mask)

    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        check_rep=False,
    )

    @jax.jit
    def step(fluid: ShardedFluid) -> ShardedFluid:
        pos, vel, mask = mapped(fluid.pos, fluid.vel, fluid.mask,
                                arrays.boundary_pos, arrays.boundary_volume)
        return ShardedFluid(pos=pos, vel=vel, mask=mask)

    return step
