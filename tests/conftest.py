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
