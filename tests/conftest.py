"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use an 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`) — the TPU-world answer to
testing distributed code without a physical chip mesh.

Note: this image's sitecustomize registers an `axon` TPU plugin and forces
JAX_PLATFORMS=axon before any user code runs, so the env var alone is not
enough — the platform must also be overridden through jax.config.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The persistent compilation cache (host-fingerprinted, set up by the
# cfd_taichi_tpu package import) is what makes warm suite runs fast: the
# cold cost is dominated by XLA:CPU compiles of the big solver while-loop
# programs (~19 min cold vs minutes warm, measured).
import cfd_taichi_tpu  # noqa: E402,F401
