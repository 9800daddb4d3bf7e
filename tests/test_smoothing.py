"""Unit tests for SPH smoothing kernels: closed-form values, normalization,
symmetry, and support compactness (test strategy per SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_taichi_tpu.ops import smoothing

H = 0.1


def test_cubic_w_closed_form():
    k = 8.0 / (np.pi * H**3)
    # q = 0 -> k * 1
    assert np.isclose(float(smoothing.cubic_w(jnp.float32(0.0), H)), k, rtol=1e-5)
    # q = 0.5 -> k*(6*(0.125-0.25)+1) = 0.25k; also = 2k(1-0.5)^3 = 0.25k (continuity)
    assert np.isclose(float(smoothing.cubic_w(jnp.float32(0.05), H)), 0.25 * k, rtol=1e-5)
    # q = 1 -> 0; q > 1 -> 0
    assert float(smoothing.cubic_w(jnp.float32(H), H)) == pytest.approx(0.0, abs=1e-6)
    assert float(smoothing.cubic_w(jnp.float32(2 * H), H)) == 0.0


def test_cubic_w_normalization_lattice():
    # Midpoint-rule integral of W over its support ~ 1.
    n = 40
    xs = (np.arange(n) + 0.5) / n * 2 * H - H
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1).reshape(-1, 3)
    r = np.linalg.norm(g, axis=-1)
    w = smoothing.cubic_w(jnp.asarray(r), H)
    integral = float(jnp.sum(w)) * (2 * H / n) ** 3
    assert np.isclose(integral, 1.0, rtol=2e-2)


def test_cubic_grad_is_6x_analytic_gradient():
    """Reference parity quirk: the reference's cubic_kernel_derivative
    (solver_base.py:90-103, k = 48/(pi h^3) with an extra factor 6) is
    exactly SIX TIMES the analytic gradient of its cubic_kernel. Every solver
    constant (Tait B, PCISPH delta, DFSPH alpha...) is calibrated against
    that scaling, so we preserve it and pin it here."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-H, H, size=(64, 3)).astype(np.float32)
    pts = pts[np.linalg.norm(pts, axis=-1) > 0.15 * H]  # away from 0 and kinks
    eps = 1e-3 * H  # large enough to dodge f32 cancellation in the FD
    g = np.asarray(smoothing.cubic_grad(jnp.asarray(pts), H))
    for axis in range(3):
        dp = pts.copy()
        dp[:, axis] += eps
        dm = pts.copy()
        dm[:, axis] -= eps
        wp = np.asarray(smoothing.cubic_w(jnp.linalg.norm(jnp.asarray(dp), axis=-1), H))
        wm = np.asarray(smoothing.cubic_w(jnp.linalg.norm(jnp.asarray(dm), axis=-1), H))
        fd = (wp - wm) / (2 * eps)
        keep = np.abs(fd) > 1e-3  # skip near-kink points
        assert keep.sum() > 5
        assert np.allclose(g[keep, axis], 6.0 * fd[keep], rtol=5e-2, atol=2.0)


def test_grad_coeff_forms_match_vector_forms():
    rng = np.random.default_rng(2)
    rvec = rng.uniform(-H, H, size=(128, 3)).astype(np.float32)
    r = np.linalg.norm(rvec, axis=-1)
    for grad_fn, coeff_fn in ((smoothing.cubic_grad, smoothing.cubic_grad_coeff),
                              (smoothing.spiky_grad, smoothing.spiky_grad_coeff)):
        gv = np.asarray(grad_fn(jnp.asarray(rvec), H))
        gc = np.asarray(coeff_fn(jnp.asarray(r), H))[:, None] * rvec
        np.testing.assert_allclose(gv, gc, rtol=1e-4, atol=1e-2)


def test_grad_antisymmetry():
    rng = np.random.default_rng(1)
    rvec = jnp.asarray(rng.uniform(-H, H, size=(32, 3)).astype(np.float32))
    for fn in (smoothing.cubic_grad, smoothing.spiky_grad):
        g1 = fn(rvec, H)
        g2 = fn(-rvec, H)
        np.testing.assert_allclose(np.asarray(g1), -np.asarray(g2), rtol=1e-5)


def test_spiky_and_poly_closed_form():
    # Spiky at q=0: 15/(pi h^3); grad spiky at q=0 -> 0 (guarded).
    assert np.isclose(float(smoothing.spiky_w(jnp.float32(0.0), H)),
                      15.0 / (np.pi * H**3), rtol=1e-5)
    g0 = smoothing.spiky_grad(jnp.zeros((3,), jnp.float32), H)
    np.testing.assert_allclose(np.asarray(g0), 0.0)
    # Poly6 at q=0: 315/(64 pi h^3).
    assert np.isclose(float(smoothing.poly6_w(jnp.float32(0.0), H)),
                      315.0 / (64 * np.pi * H**3), rtol=1e-5)
    # Compact support.
    for fn in (smoothing.spiky_w, smoothing.poly6_w):
        assert float(fn(jnp.float32(1.5 * H), H)) == 0.0


def test_kernels_zero_outside_support_vectorized():
    r = jnp.linspace(0, 3 * H, 100)
    w = smoothing.cubic_w(r, H)
    assert float(jnp.max(jnp.where(r > H, w, 0.0))) == 0.0
    assert bool(jnp.all(w >= 0))
