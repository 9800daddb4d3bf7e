"""Cross-solver integration tests: every solver family runs stably on a tiny
scene, respects its convergence contract, and conserves sanity invariants
(test strategy per SURVEY.md §4; tolerances from the reference's own
convergence thresholds, e.g. pcisph_solver.py:19, dfsph_solver.py:21-25)."""

import copy

import numpy as np
import pytest

from cfd_taichi_tpu.config import parse_config
from cfd_taichi_tpu.runner import Simulation

TINY = {
    "scene": {
        "box_min": [0.0, 0.0, 0.0],
        "box_max": [0.6, 0.8, 0.6],
        "particle_radius": 0.025,
        "gravity": 9.8,
    },
    "solver": {"name": "wcsph", "delta_time": 4e-4, "iter_cnt": 1},
    "fluid": {"start_pos": [0.15, 0.1, 0.15], "water_size": [0.3, 0.3, 0.3]},
}

ALL_SOLVERS = ["wcsph", "pbf", "pcisph", "iisph", "dfsph"]


def make_sim(name, **overrides):
    raw = copy.deepcopy(TINY)
    raw["solver"]["name"] = name
    for path, value in overrides.items():
        section, key = path.split(".")
        raw.setdefault(section, {})[key] = value
    return Simulation(parse_config(raw))


@pytest.mark.parametrize("name", ALL_SOLVERS)
def test_solver_runs_stable(name):
    sim = make_sim(name)
    for _ in range(25):
        sim.step()
    stats = sim.telemetry()
    assert stats["nan_particles"] == 0, f"{name} produced NaNs"
    pos = sim.state.fluid.pos.to_numpy()
    assert np.all(pos >= -0.05) and np.all(pos <= 0.85), f"{name} escaped box"
    # Density bounded: the reference-parity density (no self term) sits near
    # 0.55-0.69 * rho0 at rest and must not blow up.
    assert 100.0 < stats["rho_avg"] < 1500.0


@pytest.mark.parametrize("name", ["pcisph", "dfsph"])
def test_iterative_solver_density_error_contract(name):
    """After settling, the average positive density error stays within the
    solver's own tolerance regime (reference thresholds ~0.1% rho0 => 1.0,
    allow head-room for the tiny scene's splashing)."""
    sim = make_sim(name)
    for _ in range(150):
        sim.step()
    stats = sim.telemetry()
    assert stats["nan_particles"] == 0
    assert stats["avg_pos_err"] < 50.0, f"{name} err {stats['avg_pos_err']}"


def test_dfsph_adaptive_dt_within_bounds():
    sim = make_sim("dfsph")
    dts = []
    for _ in range(20):
        sim.step()
        dts.append(float(sim.state.dt))
    # CFL-clamped to [1e-5, 1e-3] (dfsph_solver.py:28-29,112-117).
    assert all(1e-5 - 1e-9 <= d <= 1e-3 + 1e-9 for d in dts)
    # dt shrinks as the block accelerates in free fall.
    assert dts[-1] <= dts[0]


def test_iisph_warm_start_state_persists():
    sim = make_sim("iisph")
    # Squeeze the block so it is over-dense: pressure must activate at once.
    f = sim.state.fluid
    center = f.pos.mean(axis=0)
    sim.state = sim.state._replace(
        fluid=f._replace(pos=center + (f.pos - center) * 0.85))
    sim.step()
    (p_past,) = sim.state.extra
    # Over-dense fluid must carry positive pressure into the next step's
    # warm start (iisph_solver.py:67,205-206).
    assert float(np.asarray(p_past).max()) > 0.0


def test_dfsph_warm_start_state_persists():
    sim = make_sim("dfsph")
    for _ in range(30):
        sim.step()
    (warm_k,) = sim.state.extra
    assert np.asarray(warm_k).shape == (sim.scene.static.n_fluid,)


def test_momentum_symmetry_wcsph():
    """Internal fluid pressure forces are pairwise-symmetric: with gravity
    off and no boundary contact, total momentum change is ~zero."""
    sim = make_sim("wcsph", **{"scene.gravity": 0.0,
                               "fluid.start_pos": [0.15, 0.25, 0.15]})
    # Slightly compress so pressure becomes active: scale positions inward.
    import jax.numpy as jnp

    f = sim.state.fluid
    center = f.pos.mean(axis=0)
    # 0.9 squeeze = 1.37x density: strong enough to activate pressure while
    # staying inside the neighbor-list capacity headroom (a harder squeeze
    # overflows K by construction, dropping pairs one-sidedly — that case is
    # covered by the overflow assertion below, not by momentum).
    squeezed = center + (f.pos - center) * 0.92
    sim.state = sim.state._replace(fluid=f._replace(pos=squeezed))
    p0 = sim.state.fluid.vel.to_numpy().sum(axis=0)
    for _ in range(5):
        sim.step()
    assert int(sim.state.overflow) == 0, "squeeze exceeded K capacity"
    p1 = sim.state.fluid.vel.to_numpy().sum(axis=0)
    # Velocity damping (0.9998) breaks exact conservation; tolerance covers it.
    assert np.linalg.norm(p1 - p0) < 1e-2 * sim.scene.static.n_fluid ** 0.5


@pytest.mark.parametrize("name", ["pbf", "iisph"])
def test_clamp_mode_all_solvers(name):
    sim = make_sim(name, **{"solver.boundary_handle": False})
    for _ in range(25):
        sim.step()
    stats = sim.telemetry()
    assert stats["nan_particles"] == 0
    pos = sim.state.fluid.pos.to_numpy()
    assert pos.min() >= 0.025 - 1e-5  # margin = radius for non-wcsph solvers


def test_unknown_solver_rejected():
    from cfd_taichi_tpu import models

    with pytest.raises(ValueError, match="Unknown solver"):
        models.get_solver("nope")


def test_overflow_telemetry_reports_drops(monkeypatch):
    """Force a neighbor-capacity overflow and check it surfaces through
    SimState.overflow + runner telemetry (the loud version of the
    reference's silent 512-entry cell truncation). Uses the compact path:
    dense mode has no K channel (every in-plan pair is covered; its loss
    channel is the block-plan capacity, counted the same way)."""
    import dataclasses

    import cfd_taichi_tpu.models.wcsph as W

    monkeypatch.setattr(W, "DENSE_FLUID", False)
    sim = make_sim("wcsph")
    st = sim.scene.static
    # Shrink K far below the true neighbor count.
    sim.scene = dataclasses.replace(
        sim.scene, static=dataclasses.replace(st, K=16, k2=0))
    sim.step()
    assert int(sim.state.overflow) > 0
    stats = sim.telemetry()
    assert stats["window_overflow"] > 0


def test_penetration_check_counts_inside_particles():
    from cfd_taichi_tpu.models import rigid as rigid_mod

    raw = copy.deepcopy(TINY)
    raw["solver"]["name"] = "pcisph"
    raw["solid"] = {"mesh": "builtin:cube", "voxel_radius": 0.025,
                    "rho_0": 2000.0, "scale": [0.15, 0.15, 0.15],
                    "pos_offset": [0.35, 0.5, 0.35],
                    "attitude_offset": [0.0, 0.0, 0.0], "active": True}
    sim = Simulation(parse_config(raw))
    cnt_out = rigid_mod.check_penetration(sim.scene.static, sim.state.rigid,
                                          sim.state.fluid.pos)
    # Fluid starts below the body: no penetration at t=0.
    assert int(cnt_out) == 0
    # A fluid particle teleported to the centroid must be counted.
    f = sim.state.fluid
    import jax.numpy as jnp

    c = sim.state.rigid.centroid
    pos2 = f.pos._replace(x=f.pos.x.at[0].set(c[0]),
                          y=f.pos.y.at[0].set(c[1]),
                          z=f.pos.z.at[0].set(c[2]))
    cnt_in = rigid_mod.check_penetration(sim.scene.static, sim.state.rigid,
                                         pos2)
    assert int(cnt_in) >= 1


def test_color_by_modes():
    """visualize_rho / visualize_neighbour parity hooks (solver_base.py:219-245)."""
    sim = make_sim("wcsph")
    sim.step()
    for mode in ("rho", "neighbors", "none"):
        rgb = sim.particle_colors(mode)
        assert rgb.shape == (sim.scene.static.n_fluid, 3)
        assert np.isfinite(rgb).all() and rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_grouped_build_engine_matches_default(monkeypatch):
    """The two list-build engines (per-query stencil-prune vs grouped
    block windows; chosen by particle count) must produce identical
    physics — run the same DFSPH scene through both and compare."""
    import jax

    sim1 = make_sim("dfsph")
    for _ in range(5):
        sim1.step()
    import cfd_taichi_tpu.models.base as mbase

    monkeypatch.setattr(mbase, "GROUPED_BUILD_MIN_N", 0)
    # jax.jit wrappers of the same module-level step fn share one global
    # trace cache keyed by (fn, static args) — without clearing it, sim2
    # would silently REUSE sim1's trace (the flag is read at trace time)
    # and this test would compare the default engine against itself.
    jax.clear_caches()
    sim2 = make_sim("dfsph")
    for _ in range(5):
        sim2.step()
    assert int(sim2.state.overflow) == 0
    np.testing.assert_allclose(sim2.state.fluid.pos.to_numpy(),
                               sim1.state.fluid.pos.to_numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sim2.state.diag),
                               np.asarray(sim1.state.diag), atol=1e-3)


@pytest.mark.parametrize("name", ["dfsph", "wcsph", "iisph", "pcisph", "pbf"])
def test_dense_mode_matches_compact(name, monkeypatch):
    """The dense-window fluid path (no compact (N, K) list; fused
    band+terms passes, group-sparse boundary sums) must reproduce the
    compact path's physics on a fluid-only scene: same positions to f32
    round-off, same dt and iteration counts, zero overflow. PCISPH also
    covers the per-iteration predicted-rho window ops
    (bandmat.predicted_rho_op / boundary_predict_op)."""
    import cfd_taichi_tpu.models.dfsph as D
    import cfd_taichi_tpu.models.iisph as I  # noqa: F401
    import cfd_taichi_tpu.models.pbf as PB
    import cfd_taichi_tpu.models.pcisph as P
    import cfd_taichi_tpu.models.wcsph as W

    # iisph/pcisph/pbf read dfsph.DENSE_FLUID inside their dense_eligible,
    # so the flag flip targets D for them; wcsph has its own copy.
    gate = {"wcsph": W, "dfsph": D, "iisph": D, "pcisph": P,
            "pbf": PB}[name]
    flag_mod = W if name == "wcsph" else D
    sim_dense = make_sim(name)
    assert gate.dense_eligible(sim_dense.scene.static)
    for _ in range(6):
        sim_dense.step()

    monkeypatch.setattr(flag_mod, "DENSE_FLUID", False)
    # Same-static jit trace reuse would make this test compare the dense
    # path against itself (see test_grouped_build_engine_matches_default).
    import jax

    jax.clear_caches()
    sim_comp = make_sim(name)
    for _ in range(6):
        sim_comp.step()

    oa = np.argsort(np.asarray(sim_dense.state.fluid.oid))
    ob = np.argsort(np.asarray(sim_comp.state.fluid.oid))
    np.testing.assert_allclose(
        sim_dense.state.fluid.pos.to_numpy()[oa],
        sim_comp.state.fluid.pos.to_numpy()[ob], atol=5e-6)
    assert int(sim_dense.state.overflow) == 0
    np.testing.assert_allclose(float(sim_dense.state.dt),
                               float(sim_comp.state.dt), rtol=1e-5)
    # iteration counts must agree (solver-loop contract)
    np.testing.assert_allclose(np.asarray(sim_dense.state.diag)[0],
                               np.asarray(sim_comp.state.diag)[0], atol=0)


def test_large_n_policy_ladder_matches_default(monkeypatch):
    """Force the LARGE-N policy ladder (wide band_B one-shot groups,
    loop_B=8 split-width coef engine, group-sparse boundary caps) onto
    the tiny scene and check the dense DFSPH step reproduces the
    default small-N path — the only CPU-sized coverage of the 1M
    regime's split-width plan compaction (scene.loop_B/pair_nb_q;
    dfsph.build_dense_engine sub-flag path)."""
    import jax

    import cfd_taichi_tpu.models.base as mbase
    import cfd_taichi_tpu.models.dfsph as D
    import cfd_taichi_tpu.scene as scene_mod

    sim1 = make_sim("dfsph")
    for _ in range(5):
        sim1.step()

    monkeypatch.setattr(scene_mod, "GROUPED_BUILD_MIN_N", 0)
    monkeypatch.setattr(mbase, "GROUPED_BUILD_MIN_N", 0)
    # The split-width loop engine is off by default (measured negative,
    # scene.LOOP_B_LARGE note); force it here so its plan-compaction
    # path stays covered.
    monkeypatch.setattr(scene_mod, "LOOP_B_LARGE", 8)
    # Tiny N would still pick the band engine by byte budget; force the
    # (split-)coef engine the 1M scene uses.
    monkeypatch.setattr(D, "BAND_BYTE_BUDGET", 0)
    jax.clear_caches()
    sim2 = make_sim("dfsph")
    st2 = sim2.scene.static
    assert st2.band_B == scene_mod.BAND_B_LARGE and st2.loop_B == 8
    assert st2.coef_nbA > 0 and st2.pair_nb_q > 0
    assert D.dense_eligible(st2)
    for _ in range(5):
        sim2.step()
    assert int(sim2.state.overflow) == 0
    oa = np.argsort(np.asarray(sim1.state.fluid.oid))
    ob = np.argsort(np.asarray(sim2.state.fluid.oid))
    # atol: bf16-w engine noise over 5 steps. Since r5 the coef matvec
    # planes round to bf16 at the table on ALL platforms (on the TPU
    # that rounding already happened inside the MXU's DEFAULT-precision
    # convert — tools/perf_r5_mv5.py, rel 0), so the CPU run now sees
    # the chip's envelope (measured max 9e-5 here).
    np.testing.assert_allclose(sim2.state.fluid.pos.to_numpy()[ob],
                               sim1.state.fluid.pos.to_numpy()[oa],
                               atol=2.5e-4)
    # Iteration counts may differ by one when the residual sits at the
    # DIV_THRESHOLD boundary: the two engines round differently (bf16
    # coef planes vs the band engine's algebra), and the extra
    # iteration is the CONSERVATIVE direction — the threshold contract
    # itself (reference dfsph_solver.py:400) is honored by both.
    np.testing.assert_allclose(np.asarray(sim2.state.diag)[0],
                               np.asarray(sim1.state.diag)[0], atol=1)


def _iisph_synthetic_ops(gain):
    """Synthetic-but-structured Jacobi operators sharing one code path
    between the on-device loop and the host replay. `gain` sets the
    spectral radius of the fixed-point map: <1 converges, >1 diverges
    (which must trip the reference's divergence-trend break)."""
    import jax.numpy as jnp
    from cfd_taichi_tpu.ops.vec import V3

    def d_ij_of(p):
        return V3(0.001 * p, -0.0005 * p, 0.0 * p)

    def r_sum_of(p, d_ij):
        mix = 0.5 * p + 0.25 * jnp.roll(p, 1) + 0.25 * jnp.roll(p, -1)
        return gain * mix + 100.0 * d_ij.x

    def residual_of(p, r_sum):
        # The reference's positive-pressure residual form
        # (iisph_solver.py:101-113) over the synthetic system.
        sel = p > 0.0
        num = jnp.sum(jnp.where(sel, -p + r_sum + 1.5, 0.0))
        cnt = jnp.sum(sel)
        return jnp.where(cnt > 0, num / cnt, 0.0)

    return d_ij_of, r_sum_of, residual_of


def _reference_pressure_solve_replay(ops, p0, a_ii, rho_adv):
    """Host transliteration of the reference's pressure_solve control flow
    (/root/reference/iisph_solver.py:78-99): Python while loop, residual
    list, divergence-trend break `residual - residuals[-1] > 0` checked
    only once a residual has been accepted, residual computed from the
    POST-update p against the r_sum update_p just wrote."""
    import jax.numpy as jnp
    from cfd_taichi_tpu.models import iisph as II

    d_ij_of, r_sum_of, residual_of = ops
    err = II.RHO_ERR_PERCENT * II.RHO_0 * 0.01
    p, l, residual, residuals = p0, 0, float("inf"), []
    broke = False
    while (residual > err or l < II.MIN_ITER) and l < II.MAX_ITER:
        d_ij = d_ij_of(p)
        r_sum = r_sum_of(p, d_ij)
        p_new = jnp.where(jnp.abs(a_ii) > 1e-7,
                          (1.0 - II.OMEGA) * p
                          + II.OMEGA * (II.RHO_0 - rho_adv - r_sum) / a_ii,
                          0.0)
        p = jnp.maximum(p_new, 0.0)
        l += 1
        residual = float(residual_of(p, r_sum))
        if residuals and residual - residuals[-1] > 0:
            broke = True
            break
        residuals.append(residual)
    return p, residual, l, broke


@pytest.mark.parametrize("gain,expect_break", [(0.55, False), (2.5, True)])
def test_iisph_trend_break_matches_reference(gain, expect_break):
    """Pin models.iisph.jacobi_loop (shared by the compact, dense, and
    sharded IISPH paths) to the reference's pressure_solve control flow on
    a system where the Jacobi map's contraction is controlled directly:
    gain<1 exits via convergence, gain>1 must fire the divergence-trend
    break (iisph_solver.py:91-93) with the residual still ABOVE the 0.1%
    tolerance — the reference itself overshoots its printed contract on
    such states, which is why hot-phase bench rows may report >0.1%."""
    import jax.numpy as jnp
    from cfd_taichi_tpu.models import iisph as II

    n = 64
    rng = np.random.default_rng(7)
    p0 = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    a_ii = jnp.full((n,), -1.0, jnp.float32)
    # rho_adv slightly above RHO_0 => positive pressure sustains itself.
    rho_adv = jnp.asarray(
        (II.RHO_0 + 1.0 + rng.uniform(0, 0.5, n)).astype(np.float32))
    ops = _iisph_synthetic_ops(gain)

    p_ref, res_ref, l_ref, broke = _reference_pressure_solve_replay(
        ops, p0, a_ii, rho_adv)
    assert broke == expect_break
    err = II.RHO_ERR_PERCENT * II.RHO_0 * 0.01
    if expect_break:
        assert res_ref > err  # exits hot: the contract is overshot

    p, _, _, res, iters = II.jacobi_loop(*ops, p0, a_ii, rho_adv)
    assert int(iters) == l_ref
    np.testing.assert_allclose(float(res), res_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-6)


def test_build_scene_plan_pos_resizes_capacities():
    """Checkpoint-resume re-planning (scene.build_scene plan_pos): runtime
    capacities must be sized from the SUPPLIED distribution, not the seed
    lattice — a 4x-compressed column must produce strictly larger
    neighbor/occupancy capacities than the seed."""
    from cfd_taichi_tpu import build_scene
    from cfd_taichi_tpu import geometry as geo

    cfg = parse_config(copy.deepcopy(TINY))
    scene_seed = build_scene(cfg)
    pos = geo.seed_fluid_block(cfg.fluid.water_size, cfg.fluid.start_pos,
                               cfg.scene.particle_radius).copy()
    pos[:, 1] = 0.1 + (pos[:, 1] - 0.1) * 0.25  # 4x vertical compression
    scene_plan = build_scene(cfg, plan_pos=pos)
    assert scene_plan.static.cell_cap > scene_seed.static.cell_cap
    assert scene_plan.static.K > scene_seed.static.K
    with pytest.raises(ValueError, match="plan_pos shape"):
        build_scene(cfg, plan_pos=pos[:-1])


def test_checkpoint_resume_with_replanned_capacities(tmp_path):
    """The hot-resume bench protocol end-to-end (VERDICT r04 items 1+2):
    evolve a donor run, checkpoint it, rebuild the scene with capacities
    re-planned from the checkpointed distribution, resume, and continue —
    the resumed run must track the donor's continuation (capacities only
    change static plan shapes, never physics) with matching iteration
    counts."""
    from cfd_taichi_tpu.runner import Simulation
    from cfd_taichi_tpu.utils import io as io_utils

    donor = make_sim("dfsph")
    for _ in range(10):
        donor.step()
    path = str(tmp_path / "hot.npz")
    io_utils.save_checkpoint(path, donor.state)
    plan_pos = donor.state.fluid.pos.to_numpy()

    resumed = Simulation(parse_config(copy.deepcopy(
        {**TINY, "solver": {**TINY["solver"], "name": "dfsph"}})),
        plan_pos=plan_pos)
    resumed.state = io_utils.load_checkpoint(path, resumed.state)

    for _ in range(3):
        donor.step()
        resumed.step()
    np.testing.assert_allclose(np.asarray(resumed.state.diag)[[0, 2]],
                               np.asarray(donor.state.diag)[[0, 2]],
                               atol=0)
    assert int(resumed.state.overflow) == 0
    got = resumed.state.fluid.pos.to_numpy()
    ref = donor.state.fluid.pos.to_numpy()
    oa = np.argsort(np.asarray(donor.state.fluid.oid))
    ob = np.argsort(np.asarray(resumed.state.fluid.oid))
    # Different plan shapes reorder bf16/f32 reductions; same bar as the
    # dense-vs-compact equivalence tests.
    np.testing.assert_allclose(got[ob], ref[oa], atol=5e-5)
