"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use an 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`) — the TPU-world answer to
testing distributed code without a physical chip mesh.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
