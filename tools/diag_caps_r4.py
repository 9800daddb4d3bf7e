"""Which dense-mode capacity overflows in the impact-hot phase, and by
how much — per scale. Runs DFSPH N steps with the -3 m/s seed, then
measures every dense channel's TRUE need on the evolved state against
its scene capacity:

  wide     per-member CSR union width      vs band_nb_wide   (B groups)
  pair_q   flagged pair blocks per B group vs pair_nb_q
  pair_l   flagged pair blocks per loop_B  vs pair_nb
  coefB    loop groups beyond coef_nbA     vs coef_capB
  bnear    wall-near B groups              vs bq_cap
  rnear    (skipped: no rigid)

    SIZES=157k,300k timeout 3000 python -u tools/diag_caps_r4.py
"""
import dataclasses
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cfd_taichi_tpu import build_scene
from cfd_taichi_tpu.config import read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops import bandmat
from cfd_taichi_tpu.ops import neighbors as nb
from cfd_taichi_tpu.ops.vec import V3

SIZES = os.environ.get("SIZES", "157k,300k").split(",")
STEPS = int(os.environ.get("STEPS", "14"))

WATER = {
    "30k": ("breaking_dam_30k.json", None),
    "157k": ("breaking_dam_157k.json", None),
    "300k": ("breaking_dam_157k.json", (2.5, 4.375, 2.8)),
    "1m": ("breaking_dam_1m.json", None),
}


def need(size):
    cfg_name, water = WATER[size]
    cfg = read_config(os.path.join(REPO, "configs", cfg_name))
    fl = dataclasses.replace(cfg.fluid, initial_velocity=(0.0, -3.0, 0.0))
    if water is not None:
        fl = dataclasses.replace(fl, water_size=water)
    cfg = dataclasses.replace(cfg, fluid=fl)
    scene = build_scene(cfg)
    st = scene.static
    state = dfsph.init_state(scene)
    step = jax.jit(functools.partial(dfsph.step, st))
    for _ in range(STEPS):
        state = step(scene.arrays, state)
    _ = float(jnp.sum(state.fluid.pos.x))
    print(f"[{size}] n={st.n_fluid} B={st.band_B} loop_B={st.loop_B} "
          f"after {STEPS} steps: overflow={int(state.overflow)} "
          f"diag={np.asarray(state.diag).round(1)}", flush=True)

    B = st.band_B
    Bl = st.loop_B or B
    sub = B // Bl
    n = st.n_fluid
    QB = -(-n // B)
    QBl = -(-n // Bl)

    @jax.jit
    def measure(px, py, pz):
        pos = V3(px, py, pz)
        cid = nb.cell_id(pos, st.grid)
        perm = jnp.argsort(cid, stable=True).astype(jnp.int32)
        pos_s = pos.take(perm)
        scid = cid[perm]
        starts = jnp.searchsorted(
            scid, jnp.arange(st.grid.num_cells + 1, dtype=jnp.int32),
            side="left", method="sort").astype(jnp.int32)
        qcells = jnp.pad(scid, (0, QB * B - n), mode="edge").reshape(QB, B)
        lo, hi = bandmat.csr_intervals(qcells, starts, st.grid)
        # Wide union need: dedupe at a huge cap, read `total`.
        bigcap = 96
        blk, msk, _ = bandmat.plan_from_intervals(
            lo, hi, nblocks_src=-(-n // 128), nbcap=bigcap)
        wide_need = jnp.max(jnp.sum(msk, axis=1))
        plan = (blk, msk, jnp.zeros((), jnp.int32))
        _, _, flags = bandmat.dense_rho_count(
            pos_s, h=st.h, m=st.particle_m, plan=plan, B=B, sub=sub)
        pair_l_need = jnp.max(jnp.sum(flags, axis=1))
        fq = flags.reshape(QB, sub, bigcap).any(axis=1)
        pair_q_need = jnp.max(jnp.sum(fq, axis=1))
        coefB_need = jnp.sum(jnp.sum(flags[:QBl], axis=1) > st.coef_nbA) \
            if st.coef_nbA else jnp.zeros((), jnp.int32)
        blo, bhi = bandmat.csr_intervals(
            qcells, scene.arrays.boundary_table.starts, st.grid)
        bnear_need = jnp.sum(jnp.any(bhi > blo, axis=1))
        bblk, bmsk, _ = bandmat.plan_from_intervals(
            blo, bhi, nblocks_src=-(-st.n_boundary // 128), nbcap=bigcap)
        bwide_need = jnp.max(jnp.sum(bmsk, axis=1))
        return (wide_need, pair_q_need, pair_l_need, coefB_need,
                bnear_need, bwide_need)

    w, pq, pl, cB, bn, bw = [int(v) for v in
                             measure(state.fluid.pos.x, state.fluid.pos.y,
                                     state.fluid.pos.z)]
    rows = [
        ("wide(B)", w, st.band_nb_wide),
        ("pair_q(B)", pq, st.pair_nb_q or st.pair_nb),
        ("pair_loop", pl, st.pair_nb),
        ("coef_capB", cB, st.coef_capB),
        ("bnear", bn, st.bq_cap),
        ("bwide", bw, st.bband_nb),
    ]
    for name, got, cap in rows:
        flag = "OVER" if got > cap else "ok"
        print(f"[{size}] {name:10s} need {got:6d} cap {cap:6d}  {flag}",
              flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    for s in SIZES:
        need(s)
    print("done", flush=True)


if __name__ == "__main__":
    main()
