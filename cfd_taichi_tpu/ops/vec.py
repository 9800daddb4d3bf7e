"""Component-separated 3-vectors (structure-of-arrays by axis).

Why: TPU XLA tiles the two minormost dimensions of every buffer to
(8 sublanes, 128 lanes). Any tensor with a trailing dimension of 3 — the
natural `(N, 3)` position/velocity layout, or `(N, K, 3)` gathered neighbor
vectors — is padded 3 -> 128 whenever materialized: measured 3.28 GB of
padded gather temps for a logical 77 MB `(100k, 64, 3)` result, and a 19 GB
allocation for a `(37M, 3)` fusion output that OOM'd the 30k benchmark
scene. Storing each component as its own array keeps every intermediate a
cleanly-tiled 2-D `(N, K)` buffer: the same gather measured ZERO bytes of
temp this way.

`V3` is a pytree (NamedTuple) with vector algebra; all ops broadcast like
the underlying jnp arrays. Per-particle scalars multiplying pair tensors
need explicit `[:, None]` broadcasting at call sites, exactly as with jnp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # --- algebra -----------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, s):
        if isinstance(s, V3):  # Hadamard
            return V3(self.x * s.x, self.y * s.y, self.z * s.z)
        return V3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __truediv__(self, s):
        return V3(self.x / s, self.y / s, self.z / s)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    def dot(self, o: "V3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def norm2(self):
        return self.dot(self)

    def norm(self):
        return jnp.sqrt(self.norm2())

    def cross(self, o: "V3") -> "V3":
        return V3(self.y * o.z - self.z * o.y,
                  self.z * o.x - self.x * o.z,
                  self.x * o.y - self.y * o.x)

    # --- indexing / masking ------------------------------------------------
    def take(self, idx) -> "V3":
        """Gather rows: each component indexed by `idx` (any shape)."""
        return V3(self.x[idx], self.y[idx], self.z[idx])

    def where(self, mask, other=0.0) -> "V3":
        if isinstance(other, V3):
            return V3(jnp.where(mask, self.x, other.x),
                      jnp.where(mask, self.y, other.y),
                      jnp.where(mask, self.z, other.z))
        return V3(jnp.where(mask, self.x, other),
                  jnp.where(mask, self.y, other),
                  jnp.where(mask, self.z, other))

    def msum(self, mask, axis=1) -> "V3":
        """Masked sum along `axis` (the neighbor axis in pair tensors)."""
        return V3(jnp.sum(jnp.where(mask, self.x, 0.0), axis=axis),
                  jnp.sum(jnp.where(mask, self.y, 0.0), axis=axis),
                  jnp.sum(jnp.where(mask, self.z, 0.0), axis=axis))

    def sum(self, axis=None) -> "V3":
        return V3(jnp.sum(self.x, axis=axis), jnp.sum(self.y, axis=axis),
                  jnp.sum(self.z, axis=axis))

    def mean(self, axis=None) -> "V3":
        return V3(jnp.mean(self.x, axis=axis), jnp.mean(self.y, axis=axis),
                  jnp.mean(self.z, axis=axis))

    def expand(self, axis) -> "V3":
        """Insert a broadcast axis in each component (like arr[:, None])."""
        return V3(jnp.expand_dims(self.x, axis), jnp.expand_dims(self.y, axis),
                  jnp.expand_dims(self.z, axis))

    def astuple(self):
        return (self.x, self.y, self.z)

    @property
    def shape(self):
        return self.x.shape

    # --- conversion --------------------------------------------------------
    @staticmethod
    def from_rows(a) -> "V3":
        """(..., 3) row-vector array -> V3 of (...,) components."""
        a = jnp.asarray(a)
        return V3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def of(x, y, z) -> "V3":
        return V3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                  jnp.asarray(z, jnp.float32))

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "V3":
        z = jnp.zeros(shape, dtype)
        return V3(z, z, z)

    @staticmethod
    def full_like(v: "V3", vals) -> "V3":
        return V3(jnp.full_like(v.x, vals[0]), jnp.full_like(v.y, vals[1]),
                  jnp.full_like(v.z, vals[2]))

    def to_rows(self) -> jnp.ndarray:
        """V3 -> (..., 3) row-vector array (host/export paths only)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def to_numpy(self) -> np.ndarray:
        return np.stack([np.asarray(self.x), np.asarray(self.y),
                         np.asarray(self.z)], axis=-1)


def matvec(m: jnp.ndarray, v: V3) -> V3:
    """(3,3) matrix times V3 (components of any broadcastable shape)."""
    return V3(m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
              m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
              m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z)
