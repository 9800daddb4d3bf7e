"""Band-matrix (block-sparse MXU SpMV) equivalence vs the compact-list
gather ops: the solver-loop operators must be the SAME linear map."""

import jax.numpy as jnp
import numpy as np

from cfd_taichi_tpu.ops import bandmat, neighbors as nb
from cfd_taichi_tpu.ops import smoothing as sm
from cfd_taichi_tpu.ops.vec import V3


def _sorted_cloud(n, box, h, seed=0):
    rng = np.random.default_rng(seed)
    raw = (rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
           * np.asarray(box, np.float32))
    pos = V3.from_rows(raw)
    grid = nb.grid_for_box((0, 0, 0), box, h)
    order = np.asarray(jnp.argsort(nb.cell_id(pos, grid), stable=True))
    pos_s = V3.from_rows(raw[order])
    table = nb.build_cell_table(pos_s, grid)
    qid = jnp.arange(n, dtype=jnp.int32)
    nl = nb.find_neighbors(pos_s, qid, pos_s, table, grid, K=64,
                           cell_cap=64, exclude_self=True)
    assert int(np.asarray(nl.count).max()) <= 64
    return pos_s, nl


def _reference_ops(pos_s, nl, h, m, k, v):
    """(N, K) gather forms of the two loop operators."""
    x = pos_s.expand(1) - nl.spos
    r = x.norm()
    gc = sm.cubic_grad_coeff(r, h)
    wf = jnp.where(nl.mask, jnp.float32(m) * gc, 0.0)
    kj = k[nl.idx]
    delta = V3((wf * (k[:, None] + kj) * x.x).sum(axis=1),
               (wf * (k[:, None] + kj) * x.y).sum(axis=1),
               (wf * (k[:, None] + kj) * x.z).sum(axis=1))
    vj = V3(v.x[nl.idx], v.y[nl.idx], v.z[nl.idx])
    vij = v.expand(1) - vj
    dot = (wf * (vij.x * x.x + vij.y * x.y + vij.z * x.z)).sum(axis=1)
    return delta, dot


def test_band_matvec_matches_gather_ops():
    h, m, n = 0.1, 1.3e-4, 800
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=3)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=16)
    assert int(np.asarray(band.overflow)) == 0

    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    v = V3(*(jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(3)))

    ref_delta, ref_dot = _reference_ops(pos_s, nl, h, m, k, v)

    got_delta = band.s * k + bandmat.matvec(band, k)
    got_dot = (v.x * band.s.x + v.y * band.s.y + v.z * band.s.z
               - bandmat.matvec_dot(band, v))

    np.testing.assert_allclose(np.asarray(got_delta.x),
                               np.asarray(ref_delta.x), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_delta.y),
                               np.asarray(ref_delta.y), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_delta.z),
                               np.asarray(ref_delta.z), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dot), np.asarray(ref_dot),
                               rtol=2e-4, atol=1e-6)


def test_band_row_sums_match_list_sums():
    h, m, n = 0.1, 1.0, 500
    pos_s, nl = _sorted_cloud(n, (0.4, 0.4, 0.4), h, seed=5)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=16)
    x = pos_s.expand(1) - nl.spos
    gc = sm.cubic_grad_coeff(x.norm(), h)
    wf = jnp.where(nl.mask, jnp.float32(m) * gc, 0.0)
    np.testing.assert_allclose(np.asarray(band.s.x),
                               np.asarray((wf * x.x).sum(axis=1)),
                               rtol=2e-4, atol=1e-6)


def test_band_overflow_counted():
    h, m, n = 0.1, 1.0, 800
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=3)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=2)
    assert int(np.asarray(band.overflow)) > 0


def test_band_handles_nonmultiple_sizes():
    # n not a multiple of B or BLOCK: padding rows/cols must not alias.
    h, m, n = 0.12, 0.7, 333
    pos_s, nl = _sorted_cloud(n, (0.4, 0.3, 0.5), h, seed=9)
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=12,
                              B=8)
    k = jnp.ones((n,), jnp.float32)
    ref_delta, _ = _reference_ops(pos_s, nl, h, m, k,
                                  V3.zeros((n,)))
    got = band.s * k + bandmat.matvec(band, k)
    # Different accumulation order than the (N, K) masked sum: compare with
    # an absolute tolerance scaled to the sum's term magnitude (components
    # cancel, so pure rtol is ill-posed on near-zero results).
    scale = float(np.abs(np.asarray(ref_delta.x)).max())
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref_delta.x),
                               rtol=1e-3, atol=2e-5 * scale)


def test_window_engine_matches_gather_ops():
    """Dense-window (recompute-A) engine == the stored-A band engine ==
    the (N, K) gather ops, on the same CSR plan."""
    import jax
    h, m, n = 0.1, 1.3e-4, 900
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=7)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    table = nb.build_cell_table(pos_s, grid)
    qid = jnp.arange(n, dtype=jnp.int32)
    gl, plan = nb.find_neighbors_grouped(pos_s, qid, pos_s, table, grid,
                                         K=64, nbcap=16, B=8,
                                         exclude_self=True)
    assert int(np.asarray(gl.dropped)) == 0

    eng = bandmat.build_window_engine(pos_s, h=h, m=m, plan=plan, B=8)
    mv, mvd = bandmat.window_matvec_ops(eng, pos_s, h, m, 8)

    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    v = V3(*(jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(3)))

    ref_delta, ref_dot = _reference_ops(pos_s, nl, h, m, k, v)
    got_delta = eng.s * k + mv(k)
    got_dot = (v.x * eng.s.x + v.y * eng.s.y + v.z * eng.s.z
               - mvd(v))

    for c in "xyz":
        np.testing.assert_allclose(
            np.asarray(getattr(got_delta, c)),
            np.asarray(getattr(ref_delta, c)), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dot), np.asarray(ref_dot),
                               rtol=2e-4, atol=1e-6)

    # And the stored-A band built from the SAME plan agrees bit-for-bit in
    # structure (f32 storage for exact comparison).
    band = bandmat.build_band(pos_s, nl.idx, nl.mask, h=h, m=m, nbcap=16,
                              B=8, plan=plan, dtype=jnp.float32)
    bmv = bandmat.matvec(band, k)
    wmv = mv(k)
    # Same linear map, different accumulation order (einsum dot vs fused
    # sum-reduce): tolerance scaled to the row magnitudes.
    scale = float(np.abs(np.asarray(bmv.x)).max())
    np.testing.assert_allclose(np.asarray(bmv.x), np.asarray(wmv.x),
                               rtol=1e-3, atol=2e-6 * scale)


def test_coef_engine_matches_gather_ops():
    """Stored-coefficient engine (scalar w + group-centered split) == the
    (N, K) gather ops. f32 storage isolates the algebra from rounding."""
    h, m, n = 0.1, 1.3e-4, 900
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=7)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    table = nb.build_cell_table(pos_s, grid)
    qid = jnp.arange(n, dtype=jnp.int32)
    gl, plan = nb.find_neighbors_grouped(pos_s, qid, pos_s, table, grid,
                                         K=64, nbcap=16, B=8,
                                         exclude_self=True)
    assert int(np.asarray(gl.dropped)) == 0

    eng = bandmat.build_coef_engine(pos_s, h=h, m=m, plan=plan, B=8,
                                    dtype=jnp.float32)
    mv, mvd = bandmat.coef_matvec_ops(eng, n, 8)

    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    v = V3(*(jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(3)))

    ref_delta, ref_dot = _reference_ops(pos_s, nl, h, m, k, v)
    got_delta = eng.s * k + mv(k)
    got_dot = (v.x * eng.s.x + v.y * eng.s.y + v.z * eng.s.z - mvd(v))

    # The centered split cancels large terms (x'_i sums vs x'_j sums):
    # tolerance scaled to the term magnitude, not the near-zero result.
    scale = float(np.abs(np.asarray(ref_delta.x)).max())
    for c in "xyz":
        np.testing.assert_allclose(
            np.asarray(getattr(got_delta, c)),
            np.asarray(getattr(ref_delta, c)), rtol=1e-3, atol=3e-5 * scale)
    dscale = float(np.abs(np.asarray(ref_dot)).max())
    np.testing.assert_allclose(np.asarray(got_dot), np.asarray(ref_dot),
                               rtol=1e-3, atol=3e-5 * dscale)


def test_coef_engine_bf16_accuracy():
    """bf16 w storage keeps the matvec within ~1% of term scale — the
    production accuracy bound the density contract rides on."""
    h, m, n = 0.1, 1.3e-4, 900
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=7)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    table = nb.build_cell_table(pos_s, grid)
    qid = jnp.arange(n, dtype=jnp.int32)
    _, plan = nb.find_neighbors_grouped(pos_s, qid, pos_s, table, grid,
                                        K=64, nbcap=16, B=8,
                                        exclude_self=True)
    eng = bandmat.build_coef_engine(pos_s, h=h, m=m, plan=plan, B=8)
    mv, _ = bandmat.coef_matvec_ops(eng, n, 8)
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    ref_delta, _ = _reference_ops(pos_s, nl, h, m, k, V3.zeros((n,)))
    got = eng.s * k + mv(k)
    scale = float(np.abs(np.asarray(ref_delta.x)).max())
    err = float(np.abs(np.asarray(got.x) - np.asarray(ref_delta.x)).max())
    assert err < 0.02 * scale, (err, scale)


def test_coef_rhs_relative_matches_absolute(monkeypatch):
    """The bf16 BLOCK-RELATIVE product-lane path (COEF_RHS_RELATIVE) must
    stay inside the same ~2%-of-term-scale envelope as the plain bf16-w
    absolute-coordinate path, on BOTH loop operators — the block-extent
    bound on the cancellation amplification is what makes bf16 lanes
    safe (coef_matvec_ops docstring)."""
    h, m, n = 0.1, 1.3e-4, 900
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=7)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    table = nb.build_cell_table(pos_s, grid)
    qid = jnp.arange(n, dtype=jnp.int32)
    _, plan = nb.find_neighbors_grouped(pos_s, qid, pos_s, table, grid,
                                        K=64, nbcap=16, B=8,
                                        exclude_self=True)
    eng = bandmat.build_coef_engine(pos_s, h=h, m=m, plan=plan, B=8)
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    v = V3(*(jnp.asarray(rng.random(n, dtype=np.float32))
             for _ in range(3)))
    ref_delta, ref_dot = _reference_ops(pos_s, nl, h, m, k, v)
    scale = float(np.abs(np.asarray(ref_delta.x)).max())
    dscale = float(np.abs(np.asarray(ref_dot)).max())

    for flag in (True, False):
        monkeypatch.setattr(bandmat, "COEF_RHS_RELATIVE", flag)
        mv, mvd = bandmat.coef_matvec_ops(eng, n, 8)
        got = eng.s * k + mv(k)
        err = float(np.abs(np.asarray(got.x)
                           - np.asarray(ref_delta.x)).max())
        assert err < 0.02 * scale, (flag, err, scale)
        got_dot = (v.x * eng.s.x + v.y * eng.s.y + v.z * eng.s.z
                   - mvd(v))
        derr = float(np.abs(np.asarray(got_dot)
                            - np.asarray(ref_dot)).max())
        # The dot's velocity lanes carry bf16 absolute velocities whose
        # per-block sums are amplified by |x_q - c_b| (~2-3 cells), so
        # its envelope is wider than the matvec's. Since r5 the
        # absolute-coordinate path rounds its plane to bf16 AT THE
        # TABLE for bf16-w engines — on the TPU this is bit-identical
        # to what the MXU's DEFAULT-precision convert already did
        # (tools/perf_r5_mv5.py, rel diff exactly 0), but on CPU (this
        # test) it replaces an exact-f32 einsum, so the CPU envelope
        # now matches the CHIP envelope (measured 6% here). The binding
        # accuracy gate is the END-TO-END density contract (<0.1% rho0)
        # measured on-chip by bench.py.
        assert derr < 0.075 * dscale, (flag, derr, dscale)


def test_dfsph_loop_engines_step_equivalence(monkeypatch):
    """Full DFSPH steps agree across the three loop engines — stored-A
    band, stored-coefficient, dense-window — on the identical CSR plan
    (f32 storage; only accumulation order differs)."""
    import functools
    import jax
    from cfd_taichi_tpu import build_scene
    from cfd_taichi_tpu.config import parse_config
    from cfd_taichi_tpu.models import base as mbase, dfsph

    scene = build_scene(parse_config({
        "scene": {"box_min": [0.0, 0.0, 0.0], "box_max": [0.6, 0.8, 0.6],
                  "particle_radius": 0.025, "gravity": 9.8},
        "solver": {"name": "dfsph", "delta_time": 4e-4, "iter_cnt": 1},
        "fluid": {"start_pos": [0.15, 0.1, 0.15],
                  "water_size": [0.3, 0.3, 0.3]},
    }))
    monkeypatch.setattr(mbase, "GROUPED_BUILD_MIN_N", 0)  # force CSR plan
    monkeypatch.setattr(dfsph, "BAND_DTYPE", jnp.float32)

    def run(band_budget, coef_budget):
        monkeypatch.setattr(dfsph, "BAND_BYTE_BUDGET", band_budget)
        monkeypatch.setattr(dfsph, "COEF_BYTE_BUDGET", coef_budget)
        step = jax.jit(functools.partial(dfsph.step, scene.static))
        st = dfsph.init_state(scene)
        for _ in range(5):
            st = step(scene.arrays, st)
        return st

    a = run(1e18, 0.0)  # stored-A band engine (csr plan)
    b = run(0.0, 0.0)   # dense-window engine (same plan, recompute-A)
    c = run(0.0, 1e18)  # stored-coefficient engine (same plan)
    for other in (b, c):
        assert int(np.asarray(a.overflow)) == 0
        assert int(np.asarray(other.overflow)) == 0
        np.testing.assert_array_equal(np.asarray(a.diag[0]),
                                      np.asarray(other.diag[0]))
        np.testing.assert_array_equal(np.asarray(a.diag[2]),
                                      np.asarray(other.diag[2]))
        np.testing.assert_allclose(np.asarray(a.fluid.pos.x),
                                   np.asarray(other.fluid.pos.x),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.fluid.vel.x),
                                   np.asarray(other.fluid.vel.x),
                                   rtol=0, atol=1e-3)


def _plan_for(pos_s, grid, B, nbcap):
    scid = nb.cell_id(pos_s, grid)
    n = pos_s.x.shape[0]
    QB = -(-n // B)
    qcells = jnp.pad(scid, (0, QB * B - n), mode="edge").reshape(QB, B)
    table = nb.build_cell_table(pos_s, grid)
    return bandmat.plan_from_csr(qcells, table.starts, grid, nbcap)


def test_band_terms_match_list_sums():
    """build_band_terms' fused extras (rho, count, qsum, tension vector)
    must equal the compact-list reductions they replace."""
    h, m, n = 0.1, 1.3e-4, 700
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=5)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    plan = _plan_for(pos_s, grid, B=8, nbcap=24)
    assert int(np.asarray(plan[2])) == 0
    terms = bandmat.build_band_terms(pos_s, h=h, m=m, plan=plan, B=8)

    x = pos_s.expand(1) - nl.spos
    r = x.norm()
    wk = jnp.where(nl.mask, sm.cubic_w(r, h), 0.0)
    gc = sm.cubic_grad_coeff(r, h)
    wf = jnp.where(nl.mask, jnp.float32(m), 0.0)

    np.testing.assert_allclose(np.asarray(terms.rho),
                               np.asarray(jnp.float32(m) * wk.sum(axis=1)),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(terms.count),
                                  np.asarray(nl.count))
    np.testing.assert_allclose(
        np.asarray(terms.qsum),
        np.asarray(jnp.sum((wf * gc * r) ** 2, axis=1)),
        rtol=3e-5, atol=1e-10)
    for got, want in zip(terms.tvec.astuple(),
                         ((wk * x.x).sum(axis=1), (wk * x.y).sum(axis=1),
                          (wk * x.z).sum(axis=1))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_dense_rho_count_matches_list():
    h, m, n = 0.1, 1.3e-4, 700
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=6)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    plan = _plan_for(pos_s, grid, B=8, nbcap=24)
    rho, count, _ = bandmat.dense_rho_count(pos_s, h=h, m=m, plan=plan, B=8)
    x = pos_s.expand(1) - nl.spos
    wk = jnp.where(nl.mask, sm.cubic_w(x.norm(), h), 0.0)
    np.testing.assert_allclose(np.asarray(rho),
                               np.asarray(jnp.float32(m) * wk.sum(axis=1)),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(count), np.asarray(nl.count))


def test_dense_rho_count_split_matches_full():
    """dense_rho_count_split (bulk nbA + scattered tail remainder)
    reproduces the full pass's rho, count, AND full-width pair flags."""
    h, m, n = 0.1, 1.3e-4, 700
    pos_s, _ = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=13)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    plan = _plan_for(pos_s, grid, B=8, nbcap=24)
    rho, count, flags = bandmat.dense_rho_count(pos_s, h=h, m=m,
                                                plan=plan, B=8)
    need = int(jnp.sum(plan[1], axis=1).max())
    nbA = max(need // 2, 1)
    QB = plan[0].shape[0]
    rho_s, count_s, flags_s, over = bandmat.dense_rho_count_split(
        pos_s, h=h, m=m, plan=plan, B=8, nbA=nbA, capB=QB)
    assert int(jnp.sum(jnp.sum(plan[1], axis=1) > nbA)) > 0
    assert int(over) == 0
    np.testing.assert_allclose(np.asarray(rho_s), np.asarray(rho),
                               rtol=2e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(count_s), np.asarray(count))
    np.testing.assert_array_equal(np.asarray(flags_s), np.asarray(flags))
    # Dropping tail groups past capB is counted.
    n_tail = int(jnp.sum(jnp.sum(plan[1], axis=1) > nbA))
    if n_tail > 1:
        _, _, _, over2 = bandmat.dense_rho_count_split(
            pos_s, h=h, m=m, plan=plan, B=8, nbA=nbA, capB=n_tail - 1)
        assert int(over2) == 1


def test_dense_viscosity_matches_compact():
    """dense_viscosity == the (N, K) Monaghan fluid branch."""
    h, m, n = 0.1, 1.3e-4, 600
    pos_s, nl = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=7)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    plan = _plan_for(pos_s, grid, B=8, nbcap=24)
    rng = np.random.default_rng(2)
    vel = V3(*(jnp.asarray(rng.standard_normal(n).astype(np.float32))
               for _ in range(3)))
    rho = jnp.asarray(1000.0 + 20.0
                      * rng.standard_normal(n).astype(np.float32))
    got = bandmat.dense_viscosity(pos_s, vel, rho, h=h, m=m, plan=plan,
                                  B=8, c_s=13.0, alpha=0.08)

    x = pos_s.expand(1) - nl.spos
    r = x.norm()
    gc = sm.cubic_grad_coeff(r, h)
    q2e = r * r + 0.01 * h * h
    vj = V3(vel.x[nl.idx], vel.y[nl.idx], vel.z[nl.idx])
    shear = (vel.expand(1) - vj).dot(x)
    pi = -(2.0 * 0.08 * h * 13.0 / (rho[:, None] + rho[nl.idx])) \
        * shear / q2e
    scale = jnp.where(nl.mask & (shear < 0.0),
                      -jnp.float32(m) * pi * gc, 0.0)
    want = V3((scale * x.x).sum(axis=1), (scale * x.y).sum(axis=1),
              (scale * x.z).sum(axis=1)) * jnp.float32(m)
    for g, w in zip(got.astuple(), want.astuple()):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-8)


def test_dense_viscosity_split_matches_full():
    """The split-bucket viscosity pass (bulk nbA width + scattered tail
    remainder) equals the full-width pass bit-for-bit on the same plan,
    at an nbA narrow enough that many groups spill into the tail."""
    h, m, n = 0.1, 1.3e-4, 600
    pos_s, _ = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=11)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    plan = _plan_for(pos_s, grid, B=8, nbcap=24)
    rng = np.random.default_rng(4)
    vel = V3(*(jnp.asarray(rng.standard_normal(n).astype(np.float32))
               for _ in range(3)))
    rho = jnp.asarray(1000.0 + 20.0
                      * rng.standard_normal(n).astype(np.float32))
    full = bandmat.dense_viscosity(pos_s, vel, rho, h=h, m=m, plan=plan,
                                   B=8, c_s=13.0, alpha=0.08)
    need = int(jnp.sum(plan[1], axis=1).max())
    nbA = max(need // 2, 1)          # force a real tail
    QB = plan[0].shape[0]
    split = bandmat.dense_viscosity_split(
        pos_s, vel, rho, h=h, m=m, plan=plan, B=8, c_s=13.0,
        alpha=0.08, nbA=nbA, capB=QB)
    n_tail = int(jnp.sum(jnp.sum(plan[1], axis=1) > nbA))
    assert n_tail > 0, "fixture must exercise the remainder bucket"
    for g, w in zip(split.astuple(), full.astuple()):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-6, atol=1e-9)
    # Precomputed selection (the engine-reuse path) is identical.
    sel = bandmat.split_tail_select(plan[1], nbA, QB)[:2]
    split2 = bandmat.dense_viscosity_split(
        pos_s, vel, rho, h=h, m=m, plan=plan, B=8, c_s=13.0,
        alpha=0.08, nbA=nbA, capB=QB, sel=sel)
    for g, w in zip(split2.astuple(), split.astuple()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_compact_plan_preserves_matvec():
    """compact_plan (wide CSR cover -> pair-tight blocks) must preserve
    the band operator exactly: every flagged block survives, so the
    matvec over the tight plan equals the wide-plan matvec."""
    h, m, n = 0.1, 1.3e-4, 700
    pos_s, _ = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=9)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    wide = _plan_for(pos_s, grid, B=8, nbcap=30)
    terms = bandmat.build_band_terms(pos_s, h=h, m=m, plan=wide, B=8)
    tight = bandmat.compact_plan(wide, terms.blk_pair, 16)
    assert int(np.asarray(tight[2])) == 0
    band_w = terms.band
    band_t = bandmat.build_band(pos_s, h=h, m=m, plan=tight, B=8)
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    mw = bandmat.matvec(band_w, k)
    mt = bandmat.matvec(band_t, k)
    for a, b in zip(mw.astuple(), mt.astuple()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-7)
    for a, b in zip(band_w.s.astuple(), band_t.s.astuple()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dense_dfsph_terms_match_band_terms():
    """dense_dfsph_terms (the chunked coef-regime pass) must equal
    build_band_terms' fused extras plus the band row sums — the two
    dense-mode term paths cannot drift."""
    h, m, n = 0.1, 1.3e-4, 700
    pos_s, _ = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=7)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    plan = _plan_for(pos_s, grid, B=8, nbcap=24)
    ref = bandmat.build_band_terms(pos_s, h=h, m=m, plan=plan, B=8)
    got = bandmat.dense_dfsph_terms(pos_s, h=h, m=m, plan=plan, B=8)

    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(ref.count))
    np.testing.assert_allclose(np.asarray(got.qsum), np.asarray(ref.qsum),
                               rtol=3e-5, atol=1e-10)
    for g, w in zip(got.s.astuple(), ref.band.s.astuple()):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)
    for g, w in zip(got.tvec.astuple(), ref.tvec.astuple()):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.blk_pair),
                                  np.asarray(ref.blk_pair))


def _boundary_setup(seed=9):
    h, n = 0.1, 400
    rng = np.random.default_rng(seed)
    raw = (rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
           * np.asarray((0.5, 0.4, 0.5), np.float32))
    grid = nb.grid_for_box((0, 0, 0), (0.6, 0.6, 0.6), h)
    order = np.argsort(np.asarray(nb.cell_id(V3.from_rows(raw), grid)),
                       kind="stable")
    pos_s = V3.from_rows(raw[order])
    # boundary plane just below y=0 plus one wall at x~0
    xs, zs = np.meshgrid(np.arange(0.0, 0.6, 0.05),
                         np.arange(0.0, 0.6, 0.05))
    floor = np.stack([xs.ravel(), np.full(xs.size, -0.02), zs.ravel()],
                     axis=1)
    wall = np.stack([np.full(xs.size, -0.02), xs.ravel(), zs.ravel()],
                    axis=1)
    brows = np.concatenate([floor, wall]).astype(np.float32)
    bpos = V3.from_rows(brows)
    bvol = jnp.asarray(rng.uniform(0.5, 1.5, brows.shape[0])
                       .astype(np.float32)) * 1e-4
    btable = nb.build_cell_table(bpos, grid)
    return h, grid, pos_s, bpos, bvol, btable, n


def test_dense_boundary_terms_match_bruteforce():
    """Group-sparse boundary sums equal the O(N*Nb) brute-force Akinci
    reductions (rho_b, gradW row sum, alpha Q term)."""
    h, grid, pos_s, bpos, bvol, btable, n = _boundary_setup()
    B = 8
    QB = -(-n // B)
    scid = nb.cell_id(pos_s, grid)
    qcells = jnp.pad(scid, (0, QB * B - n), mode="edge").reshape(QB, B)
    got = bandmat.dense_boundary_terms(
        pos_s, qcells, bpos, bvol, btable, grid, h=h, rho0=1000.0,
        nbcap=12, B=B, cap=QB)
    assert int(np.asarray(got.overflow)) == 0

    d = pos_s.expand(1) - bpos.expand(0)    # (n, Nb) componentwise
    r = d.norm()
    hit = np.asarray(r) <= h
    wb = jnp.where(hit, 1000.0 * bvol[None, :], 0.0)
    wk = sm.cubic_w(r, h)
    gc = sm.cubic_grad_coeff(r, h)
    np.testing.assert_allclose(np.asarray(got.rho),
                               np.asarray((wb * wk).sum(axis=1)),
                               rtol=3e-5, atol=1e-7)
    wg = wb * gc
    for g, w in zip(got.s.astuple(),
                    ((wg * d.x).sum(axis=1), (wg * d.y).sum(axis=1),
                     (wg * d.z).sum(axis=1))):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.qsum),
                               np.asarray(((wg * r) ** 2).sum(axis=1)),
                               rtol=1e-4, atol=1e-2)
    # far-from-wall queries really are zero (the sparse path skipped them);
    # the setup has a floor at y=-0.02 and a wall at x=-0.02
    far = (np.asarray(pos_s.y) > 0.25) & (np.asarray(pos_s.x) > 0.25)
    if far.any():
        assert np.abs(np.asarray(got.rho)[far]).max() == 0.0


def test_dense_boundary_terms_overflow_counted():
    """A deliberately tiny wall-near group capacity drops groups but is
    COUNTED (the repo's capacity contract: silent loss is impossible)."""
    h, grid, pos_s, bpos, bvol, btable, n = _boundary_setup()
    B = 8
    QB = -(-n // B)
    scid = nb.cell_id(pos_s, grid)
    qcells = jnp.pad(scid, (0, QB * B - n), mode="edge").reshape(QB, B)
    full = bandmat.dense_boundary_terms(
        pos_s, qcells, bpos, bvol, btable, grid, h=h, rho0=1000.0,
        nbcap=12, B=B, cap=QB)
    tiny = bandmat.dense_boundary_terms(
        pos_s, qcells, bpos, bvol, btable, grid, h=h, rho0=1000.0,
        nbcap=12, B=B, cap=8)
    assert int(np.asarray(full.overflow)) == 0
    assert int(np.asarray(tiny.overflow)) > 0


def test_split_coef_engine_matches_plain():
    """Split-bucket (A + remainder) matvecs equal the single-width coef
    engine's — the split is pure layout. nbA is forced small so MANY
    groups carry remainder rows."""
    h, m, n = 0.1, 1.3e-4, 800
    pos_s, _ = _sorted_cloud(n, (0.5, 0.5, 0.5), h, seed=11)
    grid = nb.grid_for_box((0, 0, 0), (0.5, 0.5, 0.5), h)
    B = 8
    plan = _plan_for(pos_s, grid, B=B, nbcap=24)
    QB = plan[0].shape[0]

    plain = bandmat.build_coef_engine(pos_s, h=h, m=m, plan=plan, B=B,
                                      dtype=jnp.float32)
    mv0, mvd0 = bandmat.coef_matvec_ops(plain, n, B)
    split = bandmat.build_split_coef_engine(pos_s, h=h, m=m, plan=plan,
                                            B=B, nbA=6, capB=QB,
                                            dtype=jnp.float32)
    assert int(np.asarray(split.overflow)) == 0
    mv1, mvd1 = bandmat.split_coef_matvec_ops(split, n, B)

    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.random(n, dtype=np.float32))
    v = V3(*(jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(3)))

    for g, w in zip(split.s.astuple(), plain.s.astuple()):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-4)
    # Tolerance note: the matvec combines x_i * (Sigma w k) - Sigma w x k
    # over ABSOLUTE coordinates (bandmat.CoefEngine); the split applies
    # that cancellation per bucket, so f32 rounding amplified by ~|x|/|d|
    # differs between the two layouts by ~1e-3 relative — still an order
    # below the bf16 w quantization both engines share in production.
    a0, a1 = mv0(k), mv1(k)
    for g, w in zip(a1.astuple(), a0.astuple()):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(mvd1(v)), np.asarray(mvd0(v)),
                               rtol=2e-3, atol=2e-3)

    # capB too small: remainder groups beyond it are COUNTED (nbA=2 so
    # nearly every group overflows into the remainder bucket — the tiny
    # cloud only has ceil(800/128)=7 source blocks total)
    tiny = bandmat.build_split_coef_engine(pos_s, h=h, m=m, plan=plan,
                                           B=B, nbA=2, capB=1,
                                           dtype=jnp.float32)
    assert int(np.asarray(tiny.overflow)) > 0
