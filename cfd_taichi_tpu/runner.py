"""Simulation driver: config -> scene -> jitted solver loop -> export.

Headless counterpart of the reference's `main.py` (main.py:47-211): same
JSON configs, same frame structure (iter_cnt fluid steps then iter_cnt rigid
steps per frame, main.py:165-173), same stopping rules (sim time > 4 s,
frame cap, main.py:98,205), same export cadence for PLY/OBJ/GIF frames
(main.py:184-201) — minus the interactive GGUI window, replaced by headless
rendering (utils/render.py) and rich telemetry (utils/telemetry.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from cfd_taichi_tpu import models
from cfd_taichi_tpu.config import SimConfig, read_config
from cfd_taichi_tpu.models import base as mbase
from cfd_taichi_tpu.models import rigid as rigid_mod
from cfd_taichi_tpu.scene import RHO_0, build_scene
from cfd_taichi_tpu.utils import io as io_utils
from cfd_taichi_tpu.utils import telemetry

MAX_FRAMES = 100_000     # reference main.py:98
MAX_SIM_TIME = 4.0       # reference main.py:205


class Simulation:
    """Owns scene, solver state, and the jitted step functions."""

    def __init__(self, cfg: SimConfig, check_nan: bool = False,
                 plan_pos: np.ndarray | None = None):
        """`plan_pos`: size runtime capacities from this (N, 3) particle
        distribution instead of the seed — checkpoint-resume re-planning
        (scene.build_scene docstring). Physics is unchanged."""
        self.cfg = cfg
        self.scene = build_scene(cfg, plan_pos=plan_pos)
        self.solver = models.get_solver(cfg.solver.name)
        print(f"\033[32m[Solver]: {cfg.solver.name}\033[0m")  # solver_base.py:39
        self.state = self.solver.init_state(self.scene)
        self._step = jax.jit(self.solver.step, static_argnums=0)
        self._rigid_step = jax.jit(rigid_mod.step, static_argnums=0)
        self.iter_cnt = cfg.solver.iter_cnt
        self.timer = telemetry.StepTimer()
        self.check_nan = check_nan
        self.rigid_enabled = (self.scene.static.has_rigid
                              and self.scene.static.rigid_active)

    def step(self):
        """One fluid solver step. (No per-step device->host syncs: fetching
        even one scalar through a remote-TPU tunnel costs seconds; simulated
        time is read from state.t only when telemetry is requested.)"""
        self.state = self._step(self.scene.static, self.scene.arrays, self.state)
        self.timer.tick(1)

    def rigid_step(self):
        if self.rigid_enabled:
            new_rigid = self._rigid_step(self.scene.static, self.scene.arrays,
                                         self.state.rigid, self.state.dt)
            self.state = self.state._replace(rigid=new_rigid)

    def frame(self):
        """One rendered frame: iter_cnt fluid steps, then iter_cnt rigid steps
        (reference main.py:165-173)."""
        for _ in range(self.iter_cnt):
            self.step()
        for _ in range(self.iter_cnt):
            self.rigid_step()
        if self.check_nan:
            bad = int(telemetry.check_valid(self.state.fluid.pos,
                                            self.state.fluid.vel,
                                            self.state.fluid.acc))
            if bad:
                raise FloatingPointError(f"{bad} particles went NaN/Inf")

    @property
    def t(self) -> float:
        return float(self.state.t)

    def particle_colors(self, mode: str) -> np.ndarray:
        """False-color particles by normalized density or neighbor count —
        the reference's visualize_rho / visualize_neighbour debug views
        (solver_base.py:219-245). mode: 'rho' | 'neighbors' | 'none'."""
        if mode == "rho":
            scalar = np.asarray(self.density())
        elif mode == "neighbors":
            if not hasattr(self, "_counts_fn"):
                def _counts(st, arrays, fluid_pos, rigid_pos):
                    nbh = mbase.build_nbh(st, arrays, fluid_pos, rigid_pos)
                    return mbase.unsort(nbh, nbh.count)

                self._counts_fn = jax.jit(_counts, static_argnums=0)
            scalar = np.asarray(self._counts_fn(
                self.scene.static, self.scene.arrays,
                self.state.fluid.pos, self.state.rigid.pos))
        else:
            n = self.scene.static.n_fluid
            rgb = np.zeros((n, 3), np.float32)
            rgb[:, 1] = 0.28
            rgb[:, 2] = 1.0  # default fluid blue (ParticleSystem.py:117)
            return rgb
        return telemetry.rgb_by_scalar(scalar)

    def density(self):
        if not hasattr(self, "_density_fn"):
            def _density(st, arrays, fluid_pos, rigid_pos):
                nbh = mbase.build_nbh(st, arrays, fluid_pos, rigid_pos)
                rho = mbase.unsort(nbh, mbase.nbh_rho(st, nbh))
                return rho, nbh.overflow

            self._density_fn = jax.jit(_density, static_argnums=0)
        rho, overflow = self._density_fn(self.scene.static, self.scene.arrays,
                                         self.state.fluid.pos,
                                         self.state.rigid.pos)
        self._last_overflow = int(overflow)
        return rho

    def telemetry(self) -> dict:
        self.timer.sim_time = self.t
        out = dict(self.timer.summary())
        out.update(telemetry.density_stats(self.density(), RHO_0))
        out["dt"] = float(self.state.dt)
        out["t"] = self.t
        out["nan_particles"] = int(telemetry.check_valid(
            self.state.fluid.pos, self.state.fluid.vel, self.state.fluid.acc))
        # Window overflow: candidates dropped because a pair-sweep window was
        # full (the analogue of the reference's 512-entry cell capacity).
        # Max of the last solver step's own in-step sweeps (state.overflow —
        # catches mid-step overflows, e.g. PCISPH's predicted-position pass)
        # and the density recomputation just above.
        out["window_overflow"] = max(int(self.state.overflow),
                                     getattr(self, "_last_overflow", 0))
        # Solver convergence telemetry (iteration counts + residuals) — the
        # reference's per-step prints (pcisph_solver.py:70, iisph_solver.py:96,
        # dfsph_solver.py:233,416).
        import numpy as _np

        diag = _np.asarray(self.state.diag)
        out["solver_iters"] = [round(float(diag[0]), 1), round(float(diag[2]), 1)]
        out["solver_residuals"] = [round(float(diag[1]), 4), round(float(diag[3]), 4)]
        return out


def run(cfg: SimConfig, frames: int | None = None, output_dir: str = "./output",
        profile_dir: str | None = None, checkpoint_every: int = 0,
        resume: str | None = None, quiet: bool = False,
        max_sim_time: float = MAX_SIM_TIME, color_by: str = "none",
        replan: bool = False) -> Simulation:
    sim = Simulation(cfg)
    if resume:
        sim.state = io_utils.load_checkpoint(resume, sim.state)
        if replan:
            # Re-plan every runtime capacity from the checkpointed
            # distribution (scene.build_scene plan_pos): seed-sized
            # plans overpay on evolved flows — every windowed pass and
            # loop matvec is capacity-priced (measured 1M dam: the seed
            # needs 33 blocks/group where the hot flow needs 20).
            # Physics is unchanged; overflow counters still guard.
            sim = Simulation(cfg, plan_pos=sim.state.fluid.pos.to_numpy())
            sim.state = io_utils.load_checkpoint(resume, sim.state)
        print(f"Resumed from {resume} at t={sim.t:.4f}"
              + (" (capacities re-planned)" if replan else ""))

    sc = cfg.scene
    os.makedirs(output_dir, exist_ok=True)
    frame_time = 1.0 / sc.output_fps           # main.py:81
    ply_cnt = 0
    gif_frames: list[str] = []
    output_frame_cnt = 0
    frame_limit = frames if frames is not None else MAX_FRAMES

    rgba = np.tile(np.array([[0.0, 0.26, 0.68, 1.0]], np.float32),
                   (sim.scene.static.n_fluid, 1))  # main.py:76, init color

    with telemetry.profile_trace(profile_dir):
        frame_cnt = 0
        while frame_cnt < frame_limit:
            # is_simulate=False renders/exports without stepping (the
            # reference's pause mode, main.py:83,151-153); without advancing
            # t the run ends at the frame limit.
            if sc.is_simulate:
                sim.frame()
            frame_cnt += 1

            if not quiet and frame_cnt % 20 == 0:
                stats = sim.telemetry()
                print(f"frame {frame_cnt}  t={stats['t']:.4f}  dt={stats['dt']:.2e}  "
                      f"steps/s={stats['steps_per_sec']:.2f}  "
                      f"rho_avg={stats['rho_avg']:.1f}")
                if stats["window_overflow"] > 0:
                    # Dropped neighbor pairs: the analogue of the reference's
                    # silent 512-entry cell-capacity truncation, made loud.
                    print(f"WARNING: neighbor capacity overflow "
                          f"{stats['window_overflow']} — pairs dropped; "
                          f"results degraded (check scene geometry/caps)")

            t = sim.t
            if sc.is_output_ply and (t / frame_time) > ply_cnt:
                pos = sim.state.fluid.pos.to_numpy()
                io_utils.write_ply_ascii(
                    os.path.join(output_dir, f"output_{ply_cnt:06d}.ply"),
                    pos, rgba)
                if sim.scene.rigid is not None:
                    io_utils.write_obj(
                        os.path.join(output_dir, f"obj_{ply_cnt:06d}.obj"),
                        sim.state.rigid.vertices.to_numpy(),
                        sim.scene.rigid.faces)
                ply_cnt += 1

            if sc.is_output_gif and (t / frame_time) > output_frame_cnt:
                from cfd_taichi_tpu.utils import render

                fluid_color = (0.0, 0.28, 1.0) if color_by == "none" \
                    else sim.particle_colors(color_by)
                clouds = [(sim.state.fluid.pos.to_numpy(), fluid_color,
                           sim.scene.static.particle_radius)]
                if sim.rigid_enabled:
                    clouds.append((sim.state.rigid.pos.to_numpy(),
                                   (1.0, 0.0, 0.0),
                                   sim.scene.static.particle_radius))
                fp = os.path.join(output_dir, f"frame_{output_frame_cnt:06d}.png")
                render.render_frame(fp, clouds, sc.cam_pos, sc.cam_look_at,
                                    sc.cam_up, sc.box_min, sc.box_max)
                gif_frames.append(fp)
                output_frame_cnt += 1

            if checkpoint_every and frame_cnt % checkpoint_every == 0:
                io_utils.save_checkpoint(
                    os.path.join(output_dir, f"ckpt_{frame_cnt:06d}.npz"),
                    sim.state, meta={"frame": frame_cnt, "t": t})

            if t > max_sim_time:  # main.py:205-206
                break

    if sc.is_output_gif and gif_frames:
        from cfd_taichi_tpu.utils import render

        # The reference emits both video.gif and video.mp4 at exit
        # (main.py:208-209, VideoManager.make_video(gif=True, mp4=True)).
        render.assemble_gif(gif_frames, os.path.join(output_dir, "video.gif"),
                            fps=sc.output_fps)
        render.assemble_mp4(gif_frames, os.path.join(output_dir, "video.mp4"),
                            fps=sc.output_fps)

    if not quiet:
        print("Final telemetry:", json.dumps(sim.telemetry()))
    return sim


def main(argv=None):
    # Persistent compilation cache for interactive runs: configured by the
    # package import (host-fingerprinted .jax_cache/h-*).
    parser = argparse.ArgumentParser(description="SPH on TPU (JAX)")
    parser.add_argument("--config", type=str, default="default.json",
                        help="scene config json file")  # main.py:13-15 parity
    parser.add_argument("--frames", type=int, default=None)
    parser.add_argument("--output-dir", type=str, default="./output")
    parser.add_argument("--profile-dir", type=str, default=None)
    parser.add_argument("--checkpoint-every", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--replan", action="store_true",
                        help="on --resume, re-plan runtime capacities from "
                             "the checkpointed particle distribution "
                             "(faster plans on evolved flows)")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--color-by", type=str, default="none",
                        choices=["none", "rho", "neighbors"],
                        help="false-color exported frames (visualize_rho / "
                             "visualize_neighbour parity)")
    args = parser.parse_args(argv)

    cfg = read_config(args.config)
    t0 = time.time()
    run(cfg, frames=args.frames, output_dir=args.output_dir,
        profile_dir=args.profile_dir, checkpoint_every=args.checkpoint_every,
        resume=args.resume, quiet=args.quiet, color_by=args.color_by,
        replan=args.replan)
    print(f"Simulation time: {time.time() - t0}")  # main.py:211 parity


if __name__ == "__main__":
    main()
