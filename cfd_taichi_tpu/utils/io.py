"""Frame export (ascii PLY point clouds, OBJ meshes) and checkpoint/resume.

Replaces the reference's output path (main.py:184-201: taichi PLYWriter ascii
frames + trimesh OBJ export) with dependency-free writers, and adds proper
state checkpointing — a capability the reference lacks entirely
(SURVEY.md §5: "Checkpoint / resume: None").
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess

import jax
import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB = None


def _native_lib():
    """Load (building on first use) the C++ fast-IO runtime (csrc/fastio.cpp).
    Returns None when unavailable; callers fall back to pure Python."""
    global _LIB
    if _LIB is not None:
        return _LIB if _LIB != "unavailable" else None
    so_path = os.path.join(_CSRC, "libfastio.so")
    src_path = os.path.join(_CSRC, "fastio.cpp")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src_path)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so_path, src_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.write_ply_ascii.restype = ctypes.c_int
        lib.write_ply_ascii.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_void_p, ctypes.c_int64]
        lib.write_obj.restype = ctypes.c_int
        lib.write_obj.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        _LIB = lib
        return lib
    except Exception:  # noqa: BLE001 — any failure -> python fallback
        _LIB = "unavailable"
        return None


def write_ply_ascii(path: str, pos: np.ndarray, rgba: np.ndarray | None = None):
    """Ascii PLY with vertex positions and optional uchar RGBA, matching the
    layout the reference emits via ti.tools.PLYWriter (main.py:189-195).
    Uses the native C++ writer when available."""
    pos = np.ascontiguousarray(pos, np.float32)
    n = pos.shape[0]
    lib = _native_lib()
    if lib is not None:
        rgba_u8 = None
        rgba_ptr = None
        if rgba is not None:
            rgba_u8 = np.ascontiguousarray(
                (np.clip(np.asarray(rgba), 0.0, 1.0) * 255), np.uint8)
            rgba_ptr = rgba_u8.ctypes.data_as(ctypes.c_void_p)
        rc = lib.write_ply_ascii(
            path.encode(), pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rgba_ptr, n)
        if rc == 0:
            return
    lines = [
        "ply",
        "format ascii 1.0",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if rgba is not None:
        rgba_u8 = (np.clip(np.asarray(rgba), 0.0, 1.0) * 255).astype(np.uint8)
        lines += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
            "property uchar alpha",
        ]
    lines.append("end_header")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
        if rgba is not None:
            for p, c in zip(pos, rgba_u8):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]} {c[3]}\n")
        else:
            for p in pos:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")


def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray):
    """Minimal OBJ export of the rigid mesh (reference main.py:196-200).
    Uses the native C++ writer when available."""
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces_i32 = np.ascontiguousarray(faces, np.int32)
    lib = _native_lib()
    if lib is not None:
        rc = lib.write_obj(
            path.encode(),
            vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vertices.shape[0],
            faces_i32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            faces_i32.shape[0])
        if rc == 0:
            return
    with open(path, "w") as f:
        for v in np.asarray(vertices, np.float32):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in np.asarray(faces, np.int64) + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def write_stl_binary(path: str, vertices: np.ndarray, faces: np.ndarray):
    """Binary STL export (80-byte header + u32 count + 50 bytes/triangle) —
    the inverse of geometry._load_stl; normals are recomputed per facet."""
    import struct

    verts = np.asarray(vertices, np.float32)
    tri = verts[np.asarray(faces, np.int64)]          # (F, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = (n / np.where(norm > 0, norm, 1.0)).astype(np.float32)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", tri.shape[0]))
        rec = np.zeros((tri.shape[0], 50), np.uint8)
        rec[:, 0:12] = n.astype("<f4").view(np.uint8).reshape(-1, 12)
        rec[:, 12:48] = tri.astype("<f4").reshape(-1, 9).view(np.uint8)
        f.write(rec.tobytes())


def save_checkpoint(path: str, state, meta: dict | None = None):
    """Dump the full solver state pytree to an .npz (all particle arrays,
    rigid state, dt, counters) — new capability over the reference."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)
    side = {"num_leaves": len(leaves), "meta": meta or {}}
    with open(path + ".json", "w") as f:
        json.dump(side, f)


def load_checkpoint(path: str, state_like):
    """Restore a state pytree saved by `save_checkpoint`; `state_like`
    provides the pytree structure (e.g. a freshly initialized state)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(state_like)
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    import jax.numpy as jnp

    leaves = [jnp.asarray(a) for a in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)
