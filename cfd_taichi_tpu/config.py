"""Typed scene/solver configuration, JSON-compatible with the reference.

Reads the same JSON schema as Jukgei/CFD_Taichi (`default.json:1-35`,
`config/*.json`): sections `scene`, `solver`, `fluid` and optional `solid`,
with the reference's scattered defaults centralized here
(cf. reference main.py:78-83, solver_base.py:31-32, ParticleSystem.py:46,64).

Unlike the reference's stringly-typed importlib dispatch (main.py:66-68),
solver selection goes through an explicit registry (models/__init__.py).
"""

from __future__ import annotations

import dataclasses
import json
import sys
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    box_min: tuple[float, float, float] = (0.0, 0.0, 0.0)
    box_max: tuple[float, float, float] = (1.0, 1.0, 1.0)
    particle_radius: float = 0.025
    gravity: float = 9.8
    is_output_gif: bool = False   # reference main.py:78
    is_output_ply: bool = False   # reference main.py:79
    output_fps: int = 60          # reference main.py:80
    is_simulate: bool = True      # reference main.py:83
    cam_pos: tuple[float, float, float] = (0.0, 0.0, 0.0)
    cam_look_at: tuple[float, float, float] = (0.0, 0.0, -1.0)
    cam_up: tuple[float, float, float] = (0.0, 1.0, 0.0)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    name: str = "wcsph"
    delta_time: float = 1e-3
    iter_cnt: int = 1
    # True -> Akinci-2012 boundary particles; False -> position clamp
    # (reference solver_base.py:31-35).
    boundary_handle: bool = True
    # Two-way fluid-solid coupling toggle (reference solver_base.py:32).
    fs_couple: bool = True


@dataclasses.dataclass(frozen=True)
class FluidConfig:
    start_pos: tuple[float, float, float] = (0.0, 0.0, 0.0)
    water_size: tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Uniform initial velocity (new capability; the reference always seeds
    # at rest). Used by the benchmark protocol to reach the violent
    # hot phase (impact + compression) within a few steps instead of
    # simulating the whole free fall.
    initial_velocity: tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class SolidConfig:
    mesh: str = ""
    voxel_radius: float = 0.025
    rho_0: float = 1000.0
    scale: float = 1.0
    pos_offset: tuple[float, float, float] = (0.0, 0.0, 0.0)
    attitude_offset: tuple[float, float, float] = (0.0, 0.0, 0.0)  # degrees
    fill: bool = True      # reference ParticleSystem.py:46
    active: bool = False   # reference ParticleSystem.py:64


@dataclasses.dataclass(frozen=True)
class SimConfig:
    scene: SceneConfig
    solver: SolverConfig
    fluid: FluidConfig
    solid: Optional[SolidConfig] = None
    # Directory of the source JSON; used to resolve relative mesh paths.
    base_dir: Optional[str] = None

    @property
    def particle_radius(self) -> float:
        return self.scene.particle_radius

    @property
    def particle_diameter(self) -> float:
        return 2.0 * self.scene.particle_radius

    @property
    def support_radius(self) -> float:
        # reference ParticleSystem.py:82
        return 4.0 * self.scene.particle_radius

    @property
    def particle_mass(self) -> float:
        # m = 1000 * (2r)^3, reference ParticleSystem.py:83
        return 1000.0 * (self.scene.particle_radius**3) * 8.0


def _tup(v: Sequence[float]) -> tuple:
    return tuple(float(x) for x in v)


def _filter_fields(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def parse_config(raw: dict, base_dir: Optional[str] = None) -> SimConfig:
    """Build a SimConfig from a parsed reference-schema JSON dict."""
    scene_d = dict(raw.get("scene", {}))
    for key in ("box_min", "box_max", "cam_pos", "cam_look_at", "cam_up"):
        if key in scene_d:
            scene_d[key] = _tup(scene_d[key])
    scene = SceneConfig(**_filter_fields(SceneConfig, scene_d))

    solver_d = dict(raw.get("solver", {}))
    solver = SolverConfig(**_filter_fields(SolverConfig, solver_d))

    fluid_d = dict(raw.get("fluid", {}))
    for key in ("start_pos", "water_size", "initial_velocity"):
        if key in fluid_d:
            fluid_d[key] = _tup(fluid_d[key])
    fluid = FluidConfig(**_filter_fields(FluidConfig, fluid_d))

    solid = None
    if raw.get("solid"):
        solid_d = dict(raw["solid"])
        for key in ("pos_offset", "attitude_offset"):
            if key in solid_d:
                solid_d[key] = _tup(solid_d[key])
        solid = SolidConfig(**_filter_fields(SolidConfig, solid_d))

    return SimConfig(scene=scene, solver=solver, fluid=fluid, solid=solid,
                     base_dir=base_dir)


def resolve_mesh_path(path: str, base_dir: Optional[str]) -> str:
    """Resolve a (possibly relative) mesh path.

    Reference configs use paths like './obj/cube1.stl' relative to the repo
    root, with case mismatches against the actual files (cube1.STL). Try the
    path as-is, then relative to the config's directory, then case-insensitive
    matches in those directories.
    """
    import os

    if path.startswith("builtin:"):  # procedural mesh (geometry.builtin_mesh)
        return path
    candidates = [path]
    if base_dir is not None:
        candidates.append(os.path.join(base_dir, path))
        candidates.append(os.path.join(base_dir, "..", path))
    for cand in list(candidates):
        if os.path.exists(cand):
            return cand
        d, fname = os.path.dirname(cand) or ".", os.path.basename(cand)
        if os.path.isdir(d):
            for entry in os.listdir(d):
                if entry.lower() == fname.lower():
                    return os.path.join(d, entry)
    raise FileNotFoundError(f"Mesh not found: {path} (searched {candidates})")


def read_config(path: str) -> SimConfig:
    """Load a scene JSON. Exits with status 3 on parse failure, matching the
    reference's `utils.read_config` (utils.py:3-10)."""
    import os

    try:
        with open(path) as f:
            raw = json.load(f)
    except Exception as e:  # noqa: BLE001 — parity with reference behavior
        print(f"Config read error: {e}", file=sys.stderr)
        sys.exit(3)
    return parse_config(raw, base_dir=os.path.dirname(os.path.abspath(path)))
