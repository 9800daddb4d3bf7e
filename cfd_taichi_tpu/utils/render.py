"""Headless frame rendering + GIF/MP4-style assembly.

The reference renders through taichi's interactive GGUI window and captures
frames into a GIF/MP4 (main.py:51-62, 184-187, 208-209). A TPU host has no
GPU windowing, so this module renders frames headlessly: a perspective point
projection of the particle clouds using the scene camera (cam_pos /
cam_look_at / cam_up, default.json:11-13) drawn with matplotlib, plus GIF
assembly via PIL.
"""

from __future__ import annotations

import os

import numpy as np


def _camera_basis(cam_pos, look_at, up):
    fwd = np.asarray(look_at, np.float64) - np.asarray(cam_pos, np.float64)
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    return right, true_up, fwd


def project_points(pos, cam_pos, look_at, up, fov_deg=45.0):
    """Perspective-project world points to normalized image coords; returns
    (xy (N,2), depth (N,))."""
    right, true_up, fwd = _camera_basis(cam_pos, look_at, up)
    rel = np.asarray(pos, np.float64) - np.asarray(cam_pos, np.float64)
    x = rel @ right
    y = rel @ true_up
    z = rel @ fwd
    z = np.maximum(z, 1e-6)
    scale = 1.0 / np.tan(np.radians(fov_deg) / 2.0)
    return np.stack([x / z * scale, y / z * scale], axis=-1), z


def render_frame(path, clouds, cam_pos, look_at, up, box_min=None,
                 box_max=None, res=640):
    """Render point clouds [(pos, color, radius), ...] to a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(res / 100, res / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_facecolor("black")
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.axis("off")

    if box_min is not None and box_max is not None:
        corners = np.array([[x, y, z] for x in (box_min[0], box_max[0])
                            for y in (box_min[1], box_max[1])
                            for z in (box_min[2], box_max[2])])
        edges = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
                 (3, 7), (4, 5), (4, 6), (5, 7), (6, 7)]
        xy, _ = project_points(corners, cam_pos, look_at, up)
        for a, b in edges:
            ax.plot([xy[a, 0], xy[b, 0]], [xy[a, 1], xy[b, 1]],
                    color=(0.99, 0.68, 0.28), linewidth=0.8)

    for pos, color, radius in clouds:
        if len(pos) == 0:
            continue
        xy, depth = project_points(pos, cam_pos, look_at, up)
        order = np.argsort(-depth)  # painter's order, far first
        size = np.clip((radius / depth[order]) * 4e4, 0.2, 50.0)
        color = np.asarray(color, np.float32)
        c = color[order] if color.ndim == 2 else [color]
        ax.scatter(xy[order, 0], xy[order, 1], s=size, c=c,
                   linewidths=0, alpha=0.9)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def assemble_gif(frame_paths, out_path, fps=60):
    """GIF assembly from rendered frames (VideoManager.make_video parity,
    main.py:208-209)."""
    from PIL import Image

    if not frame_paths:
        return
    frames = [Image.open(p) for p in frame_paths]
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=max(int(1000 / fps), 20), loop=0)
