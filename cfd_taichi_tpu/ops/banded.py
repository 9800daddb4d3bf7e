"""Banded gather: fetch per-block contiguous slices of a 1-D array.

`out[i, :] = src[starts[i] : starts[i] + W]` — the window-fetch primitive of
the pair-sweep engine (ops/pairwise.py). XLA lowers the equivalent
`src[starts[:, None] + arange(W)]` to a general gather, measured at only
~280M elem/s on TPU (~100 ms for a 1M-particle window set). Each row here is
a contiguous slice, so a Pallas kernel can DMA it at HBM bandwidth instead:
one async copy per grid step with a scalar-prefetched dynamic offset.

`src` must be padded so that `starts[i] + W <= src.shape[0]` for all i
(callers pad the sorted source arrays by W; padded values are masked by
`win_valid` downstream).

Falls back to the XLA gather off-TPU (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ALIGN = 1024  # Mosaic 1-D slice alignment for f32 (tiling), offsets + length


def _make_kernel(W: int):
    def _kernel(starts_ref, src_ref, out_ref, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(j, slot):
            # Callers guarantee ALIGN-aligned starts (pairwise.build_engine);
            # the hint lets Mosaic prove tiled-slice divisibility.
            start = pl.multiple_of(starts_ref[j], ALIGN)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(start, W)],
                out_ref.at[pl.ds(j * W, W)],
                sems.at[slot],
            )

        # 2-deep pipeline: start this row's HBM->HBM copy, wait the previous.
        dma(i, i % 2).start()

        @pl.when(i > 0)
        def _():
            dma(i - 1, (i - 1) % 2).wait()

        @pl.when(i == n - 1)
        def _():
            dma(i, i % 2).wait()

    return _kernel


@functools.partial(jax.jit, static_argnums=2)
def _banded_gather_tpu(src: jnp.ndarray, starts: jnp.ndarray, W: int):
    nblk = starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],   # src stays in HBM
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),    # flat HBM output
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        _make_kernel(W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk * W,), src.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, src)
    return out.reshape(nblk, W)


def banded_gather(src: jnp.ndarray, starts: jnp.ndarray, W: int) -> jnp.ndarray:
    """(Ns_padded,), (nblk,) -> (nblk, W) contiguous row slices.

    TPU path requirements (callers = ops/pairwise, which guarantees them):
    `W` a multiple of ALIGN, every start a multiple of ALIGN, and
    `src.shape[0] >= max(starts) + W`."""
    if jax.default_backend() == "tpu":
        pad = (-src.shape[0]) % ALIGN
        if pad:
            src = jnp.pad(src, (0, pad))
        return _banded_gather_tpu(src, starts, W)
    idx = starts[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    return src[jnp.clip(idx, 0, src.shape[0] - 1)]
