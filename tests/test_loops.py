"""ops/loops.while_loop_unrolled: exact-semantics contract vs the plain
`lax.while_loop`, including iteration counts that are not multiples of the
unroll factor and data-dependent early stops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_taichi_tpu.models import dfsph
from cfd_taichi_tpu.ops.loops import while_loop_unrolled
from cfd_taichi_tpu.ops.vec import V3


def _run(unroll, n_stop):
    # Carry mixes an array pytree (V3), scalars, a bool stop flag, and a
    # counter — the same shapes the solver loops carry.
    def cond(c):
        v, resid, stop, it = c
        return (resid > 1.0) & (it < 50) & jnp.logical_not(stop)

    def body(c):
        v, resid, stop, it = c
        v = V3(v.x * 0.5, v.y + 1.0, v.z - v.x)
        resid = resid * 0.6
        stop = it + 1 >= n_stop
        return (v, resid, stop, it + 1)

    init = (V3(jnp.arange(4.0), jnp.ones(4), jnp.zeros(4)),
            jnp.float32(100.0), jnp.zeros((), bool),
            jnp.zeros((), jnp.int32))
    return jax.jit(lambda: while_loop_unrolled(cond, body, init,
                                               unroll=unroll))()


@pytest.mark.parametrize("unroll", [2, 3, 4, 7])
@pytest.mark.parametrize("n_stop", [1, 5, 12, 100])
def test_unrolled_matches_plain(unroll, n_stop):
    ref = _run(1, n_stop)
    out = _run(unroll, n_stop)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dfsph_unroll_bitexact(monkeypatch):
    """The flagship solver's realized steps are identical at any unroll."""
    from cfd_taichi_tpu import build_scene
    from cfd_taichi_tpu.config import parse_config
    scene = build_scene(parse_config({
        "scene": {"box_min": [0.0, 0.0, 0.0], "box_max": [0.6, 0.8, 0.6],
                  "particle_radius": 0.025, "gravity": 9.8},
        "solver": {"name": "dfsph", "delta_time": 4e-4, "iter_cnt": 1},
        "fluid": {"start_pos": [0.15, 0.1, 0.15],
                  "water_size": [0.3, 0.3, 0.3]},
    }))

    def steps(u):
        monkeypatch.setattr(dfsph, "LOOP_UNROLL", u)
        import functools
        step = jax.jit(functools.partial(dfsph.step, scene.static))
        st = dfsph.init_state(scene)
        for _ in range(3):
            st = step(scene.arrays, st)
        return st

    a, b = steps(1), steps(3)
    np.testing.assert_array_equal(np.asarray(a.fluid.pos.x),
                                  np.asarray(b.fluid.pos.x))
    np.testing.assert_array_equal(np.asarray(a.diag), np.asarray(b.diag))
    assert float(a.t) == float(b.t)
