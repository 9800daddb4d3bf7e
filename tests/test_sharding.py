"""Multi-chip domain decomposition tests on the 8-virtual-device CPU mesh:
the sharded WCSPH step must agree with the single-chip solver (same pair
sets, fp-reordering tolerance) and conserve particles across migration."""

import copy

import jax
import numpy as np
import pytest

from cfd_taichi_tpu.config import parse_config
from cfd_taichi_tpu.parallel import domain
from cfd_taichi_tpu.runner import Simulation

NDEV = 4

CFG = {
    "scene": {"box_min": [0, 0, 0], "box_max": [1.0, 0.5, 0.4],
              "particle_radius": 0.025, "gravity": 9.8},
    "solver": {"name": "wcsph", "delta_time": 5e-4, "iter_cnt": 1},
    "fluid": {"start_pos": [0.1, 0.1, 0.1], "water_size": [0.8, 0.2, 0.2]},
}


def _sorted_rows(a):
    a = np.asarray(a)
    return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= NDEV, "conftest must force 8 CPU devices"
    sim = Simulation(parse_config(copy.deepcopy(CFG)))
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(sim.scene.static, NDEV)
    fluid = domain.shard_fluid(mesh, spec, sim.scene.fluid_pos0)
    step = domain.make_sharded_wcsph_step(sim.scene.static, sim.scene.arrays,
                                          mesh, spec)
    return sim, mesh, spec, fluid, step


def test_spec_sane(setup):
    sim, mesh, spec, fluid, step = setup
    assert spec.ndev == NDEV
    assert spec.cap * NDEV >= sim.scene.static.n_fluid
    assert spec.slab_w >= 2 * sim.scene.static.h


def test_shard_roundtrip(setup):
    sim, mesh, spec, fluid, step = setup
    pos, vel = domain.unshard(fluid)
    assert pos.shape[0] == sim.scene.static.n_fluid
    np.testing.assert_allclose(
        _sorted_rows(pos), _sorted_rows(sim.scene.fluid_pos0.to_numpy()),
        atol=0)


def test_sharded_step_matches_single_chip(setup):
    sim, mesh, spec, fluid, step = setup
    n_steps = 5
    for _ in range(n_steps):
        sim.step()
        fluid = step(fluid)
    ref_pos = sim.state.fluid.pos.to_numpy()
    got_pos, got_vel = domain.unshard(fluid)
    assert got_pos.shape[0] == ref_pos.shape[0], "particle count drift"
    np.testing.assert_allclose(_sorted_rows(got_pos), _sorted_rows(ref_pos),
                               atol=5e-5)


def test_particles_conserved_many_steps(setup):
    sim, mesh, spec, fluid, step = setup
    n0 = int(np.asarray(fluid.mask).sum())
    for _ in range(20):
        fluid = step(fluid)
    assert int(np.asarray(fluid.mask).sum()) == n0
    pos, _ = domain.unshard(fluid)
    assert np.isfinite(pos).all()


@pytest.fixture(scope="module")
def setup_dfsph():
    cfg = copy.deepcopy(CFG)
    cfg["solver"]["name"] = "dfsph"
    sim = Simulation(parse_config(cfg))
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(sim.scene.static, NDEV)
    state = domain.init_sharded_dfsph(mesh, spec, sim.scene.static,
                                      sim.scene.fluid_pos0)
    step = domain.make_sharded_dfsph_step(sim.scene.static, sim.scene.arrays,
                                          mesh, spec)
    return sim, spec, state, step


def test_sharded_dfsph_matches_single_chip(setup_dfsph):
    """Sharded DFSPH (per-iteration stiffness exchange + psum residuals +
    pmax CFL dt) agrees with models/dfsph.py up to fp reduction order."""
    sim, spec, state, step = setup_dfsph
    for _ in range(3):
        sim.step()
        state = step(state)
    # Same adaptive dt (global CFL) and same iteration counts.
    np.testing.assert_allclose(float(state.dt), float(sim.state.dt),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.diag)[[0, 2]],
                               np.asarray(sim.state.diag)[[0, 2]], atol=0)
    ref_pos = sim.state.fluid.pos.to_numpy()
    got_pos, _ = domain.unshard(state.fluid)
    assert got_pos.shape[0] == ref_pos.shape[0], "particle count drift"
    # Tolerance note: the solver loops run bf16-stored band matvecs
    # (models/dfsph.BAND_DTYPE). The two paths build DIFFERENT block
    # structures, so f32-level reduction-order noise (~1e-7) in the
    # iterated stiffness can cross a bf16 rounding boundary and flip one
    # product by its 0.4% quantum — amplified over ~20 iterations x 3
    # steps this yields ~1e-4 position scatter between the two
    # implementations (with f32 storage a row-sorted comparison holds at
    # 5e-5; at 1e-4 scatter near-tied lattice coordinates flip lexsort
    # order and mispair rows, so match by nearest neighbor instead).
    # Iteration counts and the adaptive dt still match exactly (asserted
    # above), which is the strong equivalence signal.
    d2 = ((got_pos[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    nearest = np.sqrt(d2.min(axis=1))
    assert nearest.max() < 1e-3, f"max pairing distance {nearest.max()}"


def test_sharded_dfsph_conserves_particles(setup_dfsph):
    sim, spec, state, step = setup_dfsph
    n0 = int(np.asarray(state.fluid.mask).sum())
    for _ in range(10):
        state = step(state)
    assert int(np.asarray(state.fluid.mask).sum()) == n0
    pos, _ = domain.unshard(state.fluid)
    assert np.isfinite(pos).all()


def test_halo_overflow_is_counted(setup):
    """Deliberately undersized halo capacity: the step must COUNT the
    dropped band particles (silent loss is forbidden — the sharded
    analogue of SimState.overflow)."""
    import dataclasses

    sim, mesh, spec, fluid, _ = setup
    tiny = dataclasses.replace(spec, hcap=8)
    step = domain.make_sharded_wcsph_step(sim.scene.static, sim.scene.arrays,
                                          mesh, tiny)
    fluid2 = domain.shard_fluid(mesh, tiny, sim.scene.fluid_pos0)
    out = step(fluid2)
    assert int(np.asarray(out.overflow)) > 0


def test_sharded_overflow_zero_on_healthy_scene(setup_dfsph):
    sim, spec, state, step = setup_dfsph
    out = step(state)
    assert int(np.asarray(out.overflow)) == 0
    assert int(np.asarray(out.fluid.overflow)) == 0


def test_too_many_devices_rejected():
    sim_cfg = parse_config(copy.deepcopy(CFG))
    from cfd_taichi_tpu import build_scene

    scene = build_scene(sim_cfg)
    with pytest.raises(ValueError, match="thinner than"):
        domain.make_spec(scene.static, 8)  # 1.0/8 = 0.125 < 2h = 0.2


def _nearest_match(got_pos, ref_pos, tol):
    d2 = ((got_pos[:, None, :] - ref_pos[None, :, :]) ** 2).sum(-1)
    nearest = np.sqrt(d2.min(axis=1))
    assert nearest.max() < tol, f"max pairing distance {nearest.max()}"


@pytest.mark.parametrize("solver", ["pcisph", "iisph", "pbf"])
def test_sharded_iterative_solver_matches_single_chip(solver):
    """Sharded PCISPH/IISPH (per-iteration pressure exchange through the
    planned halo slots + psum residuals) and PBF (exchange-free constraint
    pass + one post-update trade for XSPH) agree with the single-chip
    solvers, with IDENTICAL iteration counts — the same equivalence bar as
    sharded DFSPH. Reference loops: pcisph_solver.py:47-70,
    iisph_solver.py:78-147; PBF single pass: pbf_solver.py:176-186."""
    cfg = copy.deepcopy(CFG)
    cfg["solver"]["name"] = solver
    sim = Simulation(parse_config(cfg))
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(sim.scene.static, NDEV)
    state = domain.init_sharded_solver(mesh, spec, sim.scene.static,
                                       sim.scene.fluid_pos0, solver)
    consts = None
    if solver == "pcisph":
        from cfd_taichi_tpu.models import pcisph

        consts = {"delta": float(
            pcisph.init_state(sim.scene).extra[0])}
    step = domain.make_sharded_solver_step(sim.scene.static,
                                           sim.scene.arrays, mesh, spec,
                                           solver, consts=consts)
    for _ in range(3):
        sim.step()
        state = step(state)
    # Identical iteration counts (the while-loop exchange machinery must
    # reproduce the single-chip residual trajectory).
    np.testing.assert_allclose(np.asarray(state.diag)[0],
                               np.asarray(sim.state.diag)[0], atol=0)
    assert int(np.asarray(state.overflow)) == 0
    ref_pos = sim.state.fluid.pos.to_numpy()
    got_pos, _ = domain.unshard(state.fluid)
    assert got_pos.shape[0] == ref_pos.shape[0]
    _nearest_match(got_pos, ref_pos, 1e-4)


def test_sharded_migration_stress_dam_break():
    """Slab-crossing dam break (VERDICT r02 item 6): fluid seeded at one
    end of a long box with an initial axial velocity floods across all
    slab boundaries over 60 steps — migration-heavy, while-loop exchange
    machinery exercised far beyond the gentle 3-step equivalence scenes.
    Invariants: exact particle conservation, zero capacity overflow,
    finite state, and substantial cross-slab migration actually
    happened."""
    cfg = copy.deepcopy(CFG)
    cfg["solver"]["name"] = "dfsph"
    sim = Simulation(parse_config(cfg))
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(sim.scene.static, NDEV)
    vel0 = np.tile(np.asarray([[1.5, -0.5, 0.0]], np.float32),
                   (sim.scene.static.n_fluid, 1))
    state = domain.init_sharded_solver(mesh, spec, sim.scene.static,
                                       sim.scene.fluid_pos0, "dfsph",
                                       vel=vel0)
    step = domain.make_sharded_solver_step(sim.scene.static,
                                           sim.scene.arrays, mesh, spec,
                                           "dfsph")

    def slab_counts(fl):
        pos, _ = domain.unshard(fl)
        dev = np.clip(((pos[:, spec.axis] - spec.lo)
                       // spec.slab_w).astype(int), 0, spec.ndev - 1)
        return np.bincount(dev, minlength=spec.ndev)

    n0 = int(np.asarray(state.fluid.mask).sum())
    c0 = slab_counts(state.fluid)
    max_overflow = 0
    for _ in range(60):
        state = step(state)
        max_overflow = max(max_overflow, int(np.asarray(state.overflow)))
    assert int(np.asarray(state.fluid.mask).sum()) == n0, "particles lost"
    assert max_overflow == 0, f"capacity overflow {max_overflow}"
    pos, vel = domain.unshard(state.fluid)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    c1 = slab_counts(state.fluid)
    # The dam moved: occupancy redistributed across slabs (the seed already
    # spans all slabs, so net redistribution is bounded; >10% of particles
    # ending in a different slab demonstrates heavy migration).
    assert np.abs(c1 - c0).sum() > 0.1 * n0, (c0.tolist(), c1.tolist())
    # Solver actually iterated (violent flow).
    assert float(np.asarray(state.diag)[2]) >= 2.0


COUPLED_CFG = {
    "scene": {"box_min": [0, 0, 0], "box_max": [1.2, 0.6, 0.5],
              "particle_radius": 0.025, "gravity": 9.8},
    "solver": {"name": "pcisph", "delta_time": 4e-4, "iter_cnt": 1,
               "boundary_handle": True, "fs_couple": True},
    "fluid": {"start_pos": [0.1, 0.05, 0.1],
              "water_size": [1.0, 0.2, 0.3]},
    "solid": {"mesh": "builtin:cube1", "voxel_radius": 0.025,
              "rho_0": 500, "scale": 0.15, "pos_offset": [0.6, 0.3, 0.25],
              "attitude_offset": [0.0, 0.0, 0.0], "fill": True,
              "active": True},
}


@pytest.mark.parametrize("solver", ["pcisph", "dfsph", "wcsph", "iisph"])
def test_sharded_rigid_coupling_matches_single_chip(solver):
    """Two-way rigid coupling SHARDED (VERDICT r03 item 5): the rigid body
    is replicated per shard, owned fluid rows scatter their reaction
    locally, one psum per step globalizes the force, and the rigid step
    runs on the replicated state. Must agree with the single-chip coupled
    solvers (reference rigid_solver.py:33-128 + the fluid force scatters,
    e.g. pcisph_solver.py:178-188, dfsph_solver.py:204-212,
    wcsph_solver.py:126) with identical iteration counts."""
    from cfd_taichi_tpu.models import base as mbase

    cfg = copy.deepcopy(COUPLED_CFG)
    cfg["solver"]["name"] = solver
    sim = Simulation(parse_config(cfg))
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(sim.scene.static, NDEV)
    rigid0 = mbase.init_rigid_state(sim.scene)
    state = domain.init_sharded_solver(mesh, spec, sim.scene.static,
                                       sim.scene.fluid_pos0, solver,
                                       rigid=rigid0)
    consts = None
    if solver == "pcisph":
        from cfd_taichi_tpu.models import pcisph

        consts = {"delta": float(pcisph.init_state(sim.scene).extra[0])}
    fstep = domain.make_sharded_solver_step(sim.scene.static,
                                            sim.scene.arrays, mesh, spec,
                                            solver, consts=consts)
    rstep = domain.make_sharded_rigid_step(sim.scene.static,
                                           sim.scene.arrays)
    for _ in range(3):
        sim.frame()              # fluid step + rigid step (iter_cnt = 1)
        state = rstep(fstep(state))

    if solver != "wcsph":
        # Identical solver iteration counts (psum'd residual trajectory).
        np.testing.assert_allclose(np.asarray(state.diag)[0],
                                   np.asarray(sim.state.diag)[0], atol=0)
    # Rigid body state agrees (the psum'd force drives it).
    np.testing.assert_allclose(np.asarray(state.rigid.centroid),
                               np.asarray(sim.state.rigid.centroid),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.rigid.vel),
                               np.asarray(sim.state.rigid.vel), atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.rigid.omega),
                               np.asarray(sim.state.rigid.omega),
                               atol=1e-2)
    assert int(np.asarray(state.overflow)) == 0
    # Fluid agrees up to fp/bf16 reduction-order noise (same bar as the
    # fluid-only DFSPH equivalence test above).
    ref_pos = sim.state.fluid.pos.to_numpy()
    got_pos, _ = domain.unshard(state.fluid)
    assert got_pos.shape[0] == ref_pos.shape[0]
    _nearest_match(got_pos, ref_pos, 1e-3)


def test_multihost_single_process_seam():
    """The DCN seam (parallel/multihost) in its only locally-testable
    configuration: 1 process. initialize() must be a no-op that reports
    one process; global_mesh must drive the sharded solver exactly like a
    hand-built mesh."""
    from cfd_taichi_tpu.parallel import multihost

    assert multihost.initialize() == 1
    assert multihost.initialize() == 1  # idempotent
    assert not multihost.is_multihost()
    mesh = multihost.global_mesh(NDEV)
    assert mesh.devices.size == NDEV
    sim = Simulation(parse_config(copy.deepcopy(CFG)))
    spec = domain.make_spec(sim.scene.static, NDEV)
    fluid = domain.shard_fluid(mesh, spec, sim.scene.fluid_pos0)
    step = domain.make_sharded_wcsph_step(sim.scene.static, sim.scene.arrays,
                                          mesh, spec)
    out = step(fluid)
    assert int(np.asarray(out.mask).sum()) == sim.scene.static.n_fluid


@pytest.mark.parametrize("solver",
                         ["dfsph", "iisph", "pcisph", "wcsph", "pbf"])
def test_sharded_dense_route_builds_no_compact_list(solver):
    """VERDICT r03 item 6 + r04 item 4: when the local+halo set is
    dense-eligible on a fluid-only scene, the sharded step must NOT build
    a compact neighbor list — the dense route (ShardCtx.dense for the
    engine solvers, ShardCtx.dp window passes for WCSPH/PBF) replaces it,
    for ALL FIVE solvers. Poisoning the compact-list builders proves the
    route by construction; the step must still run clean (zero overflow,
    sane state)."""
    import importlib

    import cfd_taichi_tpu.ops.neighbors as nbmod

    model = importlib.import_module(f"cfd_taichi_tpu.models.{solver}")
    eligible = getattr(
        model, "dense_eligible",
        importlib.import_module("cfd_taichi_tpu.models.dfsph")
        .dense_eligible)

    cfg = copy.deepcopy(CFG)
    cfg["solver"]["name"] = solver
    sim = Simulation(parse_config(cfg))
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(sim.scene.static, NDEV)
    ns = spec.cap + 2 * spec.hcap
    assert eligible(domain._shim_static(sim.scene.static, ns)), \
        "test scene must be dense-eligible per shard"
    consts = None
    if solver == "pcisph":
        from cfd_taichi_tpu.models import pcisph

        consts = {"delta": float(pcisph.init_state(sim.scene).extra[0])}
    state = domain.init_sharded_solver(mesh, spec, sim.scene.static,
                                       sim.scene.fluid_pos0, solver)
    step = domain.make_sharded_solver_step(sim.scene.static,
                                           sim.scene.arrays, mesh, spec,
                                           solver, consts=consts)

    def boom(*a, **k):
        raise AssertionError("compact list built in the dense regime")

    orig = (nbmod.find_neighbors, nbmod.find_neighbors_grouped)
    nbmod.find_neighbors = nbmod.find_neighbors_grouped = boom
    try:
        state = step(state)  # first call traces local_step -> would boom
    finally:
        nbmod.find_neighbors, nbmod.find_neighbors_grouped = orig
    assert int(np.asarray(state.overflow)) == 0
    pos, vel = domain.unshard(state.fluid)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()


def test_sharded_dense_route_coef_regime_matches_single_chip(monkeypatch):
    """VERDICT r04 item 8: the sharded dense route under the LARGE-N
    policy ladder (BAND_B_LARGE one-shot groups + the stored-coefficient
    split-bucket loop engine the 1M scene uses) — forced onto a
    CPU-sized scene exactly like tests/test_solvers.py::
    test_large_n_policy_ladder_matches_default does single-chip, but
    inside shard_map: the per-shard dense engines must run the coef
    matvecs and agree with the (equally forced) single-chip dense step,
    with zero overflow."""
    import cfd_taichi_tpu.models.base as mbase
    import cfd_taichi_tpu.models.dfsph as D
    import cfd_taichi_tpu.scene as scene_mod

    monkeypatch.setattr(scene_mod, "GROUPED_BUILD_MIN_N", 0)
    monkeypatch.setattr(mbase, "GROUPED_BUILD_MIN_N", 0)
    monkeypatch.setattr(D, "BAND_BYTE_BUDGET", 0)
    jax.clear_caches()

    cfg = copy.deepcopy(CFG)
    cfg["solver"]["name"] = "dfsph"
    sim = Simulation(parse_config(cfg))
    st = sim.scene.static
    assert st.band_B == scene_mod.BAND_B_LARGE and st.coef_nbA > 0
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(st, NDEV)
    ns = spec.cap + 2 * spec.hcap
    assert D.dense_eligible(domain._shim_static(st, ns))
    assert not D.use_band_engine(ns, st.band_nb), \
        "forced coef regime must hold for the shard-local set too"
    state = domain.init_sharded_solver(mesh, spec, st,
                                       sim.scene.fluid_pos0, "dfsph")
    step = domain.make_sharded_solver_step(st, sim.scene.arrays, mesh,
                                           spec, "dfsph")
    for _ in range(3):
        sim.step()
        state = step(state)
    np.testing.assert_allclose(np.asarray(state.diag)[[0, 2]],
                               np.asarray(sim.state.diag)[[0, 2]], atol=0)
    assert int(np.asarray(state.overflow)) == 0
    ref_pos = sim.state.fluid.pos.to_numpy()
    got_pos, _ = domain.unshard(state.fluid)
    assert got_pos.shape[0] == ref_pos.shape[0]
    _nearest_match(got_pos, ref_pos, 1e-4)


@pytest.mark.parametrize("solver", ["pcisph", "dfsph", "iisph", "wcsph"])
def test_sharded_coupled_dense_route_builds_no_compact_list(solver):
    """r04 item 4, second half: COUPLED scenes take the per-shard dense
    route too (group-sparse rigid windows + owned-masked rigid-side
    reaction against the replicated body) — no compact neighbor list,
    proven by poisoning the builders. build_rigid_side's internal
    find_neighbors over the tiny rigid set is exempt (that (Nr, Kf)
    list IS the dense design, rigid_dense.py docstring)."""
    import importlib

    import cfd_taichi_tpu.ops.neighbors as nbmod
    from cfd_taichi_tpu.models import base as mbase
    from cfd_taichi_tpu.ops import rigid_dense

    model = importlib.import_module(f"cfd_taichi_tpu.models.{solver}")
    eligible = getattr(
        model, "dense_eligible",
        importlib.import_module("cfd_taichi_tpu.models.dfsph")
        .dense_eligible)

    cfg = copy.deepcopy(COUPLED_CFG)
    cfg["solver"]["name"] = solver
    sim = Simulation(parse_config(cfg))
    mesh = domain.make_mesh(NDEV)
    spec = domain.make_spec(sim.scene.static, NDEV)
    ns = spec.cap + 2 * spec.hcap
    assert eligible(domain._shim_static(sim.scene.static, ns,
                                        keep_rigid=True)), \
        "test scene must be dense-eligible per shard (coupled)"
    consts = None
    if solver == "pcisph":
        from cfd_taichi_tpu.models import pcisph

        consts = {"delta": float(pcisph.init_state(sim.scene).extra[0])}
    state = domain.init_sharded_solver(mesh, spec, sim.scene.static,
                                       sim.scene.fluid_pos0, solver,
                                       rigid=mbase.init_rigid_state(
                                           sim.scene))
    step = domain.make_sharded_solver_step(sim.scene.static,
                                           sim.scene.arrays, mesh, spec,
                                           solver, consts=consts)

    # The rigid-side (Nr, Kf) list is allowed; every FLUID-query list is
    # poison. Wrap find_neighbors to allow only rigid-sized query sets.
    n_rigid = sim.scene.static.n_rigid
    orig_fn, orig_fg = nbmod.find_neighbors, nbmod.find_neighbors_grouped

    def guarded(qpos, qid, *a, **k):
        if qpos.x.shape[0] != n_rigid:
            raise AssertionError("compact fluid list built in the dense "
                                 "coupled regime")
        return orig_fn(qpos, qid, *a, **k)

    def boom(*a, **k):
        raise AssertionError("grouped compact list built in the dense "
                             "coupled regime")

    nbmod.find_neighbors = guarded
    nbmod.find_neighbors_grouped = boom
    rigid_dense.nb.find_neighbors = guarded
    try:
        state = step(state)
    finally:
        nbmod.find_neighbors, nbmod.find_neighbors_grouped = \
            orig_fn, orig_fg
        rigid_dense.nb.find_neighbors = orig_fn
    assert int(np.asarray(state.overflow)) == 0
    pos, vel = domain.unshard(state.fluid)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
