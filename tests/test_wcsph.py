"""WCSPH end-to-end integration tests on a tiny scene: stability, boundary
containment, density sanity, determinism, and IO round-trips."""

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
    "solver": {"name": "wcsph", "delta_time": 5e-4, "iter_cnt": 1},
    "fluid": {"start_pos": [0.15, 0.1, 0.15], "water_size": [0.3, 0.3, 0.3]},
}


def _make_sim(**overrides):
    import copy

    raw = copy.deepcopy(TINY)
    for path, value in overrides.items():
        section, key = path.split(".")
        raw.setdefault(section, {})[key] = value
    return Simulation(parse_config(raw))


@pytest.fixture(scope="module")
def sim_result():
    sim = _make_sim()
    for _ in range(30):
        sim.step()
    return sim


def test_wcsph_runs_stable(sim_result):
    stats = sim_result.telemetry()
    assert stats["nan_particles"] == 0
    assert stats["steps"] == 30


def test_wcsph_particles_contained(sim_result):
    pos = sim_result.state.fluid.pos.to_numpy()
    lo = np.array([0.0, 0.0, 0.0]) - 0.05
    hi = np.array([0.6, 0.8, 0.6]) + 0.05
    assert np.all(pos >= lo) and np.all(pos <= hi)


def test_wcsph_density_reasonable(sim_result):
    rho = np.asarray(sim_result.density())
    # Reference density excludes the self-term (solver_base.py:41-51), so a
    # rest lattice sits near ~0.68 * rho0; it must stay positive and bounded.
    assert rho.min() > 100.0
    assert rho.max() < 2000.0


def test_wcsph_fluid_falls_under_gravity():
    sim = _make_sim()
    y0 = float(sim.state.fluid.pos.to_numpy()[:, 1].mean())
    for _ in range(30):
        sim.step()
    y1 = float(sim.state.fluid.pos.to_numpy()[:, 1].mean())
    assert y1 < y0  # the suspended block falls


def test_wcsph_deterministic():
    s1 = _make_sim()
    s2 = _make_sim()
    for _ in range(5):
        s1.step()
        s2.step()
    np.testing.assert_array_equal(s1.state.fluid.pos.to_numpy(),
                                  s2.state.fluid.pos.to_numpy())


def test_clamp_boundary_mode():
    sim = _make_sim(**{"solver.boundary_handle": False})
    for _ in range(30):
        sim.step()
    stats = sim.telemetry()
    assert stats["nan_particles"] == 0
    pos = sim.state.fluid.pos.to_numpy()
    # Clamp margin = diameter (wcsph_solver.py:57-63).
    assert pos.min() >= 0.05 - 1e-5
    assert np.all(pos <= np.array([0.6, 0.8, 0.6]) - 0.05 + 1e-5)


def test_checkpoint_roundtrip(tmp_path, sim_result):
    from cfd_taichi_tpu.utils import io as io_utils

    path = str(tmp_path / "ckpt.npz")
    io_utils.save_checkpoint(path, sim_result.state, meta={"t": sim_result.t})
    sim2 = _make_sim()
    restored = io_utils.load_checkpoint(path, sim2.state)
    np.testing.assert_array_equal(restored.fluid.pos.to_numpy(),
                                  sim_result.state.fluid.pos.to_numpy())
    assert float(restored.t) == sim_result.t


def test_ply_obj_export(tmp_path):
    from cfd_taichi_tpu.utils import io as io_utils

    pos = np.random.default_rng(0).uniform(size=(10, 3)).astype(np.float32)
    rgba = np.ones((10, 4), np.float32) * 0.5
    ply = str(tmp_path / "f.ply")
    io_utils.write_ply_ascii(ply, pos, rgba)
    text = open(ply).read()
    assert "element vertex 10" in text and text.count("\n") >= 20

    verts = np.eye(3, dtype=np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    obj = str(tmp_path / "m.obj")
    io_utils.write_obj(obj, verts, faces)
    text = open(obj).read()
    assert text.count("v ") == 3 and "f 1 2 3" in text


def test_resume_replan_cli_path(tmp_path, sim_result):
    """runner.run(resume=..., replan=True): capacities re-planned from the
    checkpointed distribution, state restored, run continues clean
    (the CLI --replan flag's code path)."""
    from cfd_taichi_tpu import runner
    from cfd_taichi_tpu.utils import io as io_utils

    path = str(tmp_path / "ckpt.npz")
    io_utils.save_checkpoint(path, sim_result.state)
    sim = runner.run(sim_result.cfg, frames=2, output_dir=str(tmp_path),
                     resume=path, replan=True, quiet=True)
    assert float(sim.t) > float(sim_result.t)
    assert sim.telemetry()["nan_particles"] == 0
