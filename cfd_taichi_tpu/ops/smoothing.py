"""SPH smoothing kernels (cubic spline, spiky, poly6) as vectorized jnp ops.

Functional parity targets (reference Jukgei/CFD_Taichi):
  * cubic spline W       — solver_base.py:74-88   (k = 8/(pi h^3), piecewise at q=0.5)
  * cubic spline grad W  — solver_base.py:90-103  (k = 48/(pi h^3))
  * spiky W / grad W     — solver_base.py:105-120
  * poly6 W              — solver_base.py:122-129 (normalized-q variant, 1/h^3 scale)

All functions are elementwise over arbitrary leading batch dimensions and are
branch-free (jnp.where piecewise selection) so they fuse into surrounding
VPU work under XLA. `h` is the support radius (reference: 4 * particle_radius,
solver_base.py:17).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PI = float(np.pi)


def cubic_w(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Cubic-spline kernel W(r, h). `r` = distance (any shape), `h` static.

    W(q) = k*(6(q^3-q^2)+1)      for 0   <= q <= 0.5
         = 2k*(1-q)^3            for 0.5 <  q <= 1
         = 0                     otherwise,   k = 8/(pi h^3), q = r/h.
    """
    k = 8.0 / (_PI * h**3)
    q = r / h
    q2 = q * q
    q3 = q2 * q
    near = k * (6.0 * (q3 - q2) + 1.0)
    omq = 1.0 - q
    far = 2.0 * k * omq * omq * omq
    w = jnp.where(q <= 0.5, near, far)
    return jnp.where(q <= 1.0, w, 0.0)


def cubic_grad(rvec: jnp.ndarray, h: float, eps: float = 1e-5) -> jnp.ndarray:
    """Gradient of the cubic-spline kernel. `rvec` = x_i - x_j, shape (..., 3).

    grad W = 6k (3q^2 - 2q) * rvec / (h |rvec|)   for eps < q <= 0.5
           = -6k (1-q)^2    * rvec / (h |rvec|)   for 0.5 < q <= 1
           = 0 otherwise,   k = 48/(pi h^3).

    The `eps` guard on q (not on |rvec|) mirrors the reference's
    `1e-5 < q` lower bound (solver_base.py:96).
    """
    k = 48.0 / (_PI * h**3)
    r_norm = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    q = r_norm / h
    # Guarded direction; masked to zero wherever the piecewise value is zero.
    safe = jnp.maximum(r_norm, 1e-12)
    dirn = rvec / (h * safe)
    near = 6.0 * k * (3.0 * q * q - 2.0 * q)
    omq = 1.0 - q
    far = -6.0 * k * omq * omq
    coeff = jnp.where(q <= 0.5, near, far)
    coeff = jnp.where((q > eps) & (q <= 1.0), coeff, 0.0)
    return coeff * dirn


def cubic_grad_coeff(r: jnp.ndarray, h: float, eps: float = 1e-5) -> jnp.ndarray:
    """Scalar factor c(r) with grad W = c(r) * rvec — the component-separated
    form of `cubic_grad` for TPU-friendly V3 math (same piecewise rule and
    1e-5 < q guard as solver_base.py:90-103)."""
    k = 48.0 / (_PI * h**3)
    q = r / h
    near = 6.0 * k * (3.0 * q * q - 2.0 * q)
    omq = 1.0 - q
    far = -6.0 * k * omq * omq
    coeff = jnp.where(q <= 0.5, near, far)
    coeff = jnp.where((q > eps) & (q <= 1.0), coeff, 0.0)
    return coeff / (h * jnp.maximum(r, 1e-12))


def spiky_grad_coeff(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Scalar factor c(r) with spiky grad W = c(r) * rvec
    (solver_base.py:113-120)."""
    q = r / h
    omq = 1.0 - q
    coeff = -45.0 * omq * omq / (_PI * h**4)
    coeff = jnp.where((q > 0.0) & (q <= 1.0), coeff, 0.0)
    return coeff / jnp.maximum(r, 1e-12)


def spiky_w(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Spiky kernel W = 15 (1-q)^3 / (pi h^3) for q <= 1 (solver_base.py:105-111)."""
    q = r / h
    omq = 1.0 - q
    w = 15.0 * omq * omq * omq / (_PI * h**3)
    return jnp.where(q <= 1.0, w, 0.0)


def spiky_grad(rvec: jnp.ndarray, h: float) -> jnp.ndarray:
    """Spiky kernel gradient = -45 (1-q)^2 rvec / (pi h^4 |rvec|), 0 < q <= 1
    (solver_base.py:113-120)."""
    r_norm = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    q = r_norm / h
    safe = jnp.maximum(r_norm, 1e-12)
    omq = 1.0 - q
    coeff = -45.0 * omq * omq / (_PI * h**4)
    coeff = jnp.where((q > 0.0) & (q <= 1.0), coeff, 0.0)
    return coeff * rvec / safe


def poly6_w(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Poly6 kernel, normalized-q variant: 315/(64 pi h^3) (1-q^2)^3, q <= 1
    (solver_base.py:122-129 — note the reference scales by 1/h^3, not 1/h^9)."""
    q = r / h
    t = 1.0 - q * q
    w = 315.0 / (64.0 * _PI * h**3) * t * t * t
    return jnp.where(q <= 1.0, w, 0.0)
