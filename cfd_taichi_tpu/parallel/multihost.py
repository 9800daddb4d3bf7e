"""Multi-host (DCN) execution seam.

SURVEY.md §5 prescribes the two-level TPU topology: slab halo exchange over
ICI within a slice (parallel/domain.py), DCN across hosts/slices. This
module is the DCN seam: process-group initialization + a device mesh that
spans every process's local chips, so `shard_map(..., mesh)` programs built
by parallel/domain.py run unchanged across hosts (XLA routes the ring
ppermute hops that cross process boundaries over DCN automatically).

UNTESTABLE in this 1-chip environment beyond the 1-process case — there is
no multi-host cluster here. The seam exists so a pod user only has to call
`initialize()` once per process before building scenes; everything
downstream already takes an explicit Mesh. The 1-process path is covered by
tests/test_sharding.py::test_multihost_single_process_seam.

Usage on a real pod (one process per host, e.g. via the TPU VM runtime):

    from cfd_taichi_tpu.parallel import multihost, domain
    multihost.initialize()                  # reads the cluster env
    mesh = multihost.global_mesh()          # all chips, all hosts
    spec = domain.make_spec(scene.static, mesh.devices.size)
    state = domain.init_sharded_solver(mesh, spec, scene.static,
                                       scene.fluid_pos0, "dfsph")
    step = domain.make_sharded_solver_step(scene.static, scene.arrays,
                                           mesh, spec, "dfsph")
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from cfd_taichi_tpu.parallel.domain import AXIS

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Join the jax.distributed process group (idempotent).

    With no arguments, jax.distributed reads the cluster environment
    (TPU VM metadata / JAX_COORDINATOR_ADDRESS & friends). In a plain
    single-process run with no cluster environment this is a no-op —
    the single-process "group" needs no coordinator. Returns the number
    of participating processes."""
    global _initialized
    if _initialized:
        return jax.process_count()
    explicit = coordinator_address is not None or num_processes is not None
    if explicit and (num_processes or 1) > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        import os
        if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
                "COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
        # else: single process, nothing to join.
    _initialized = True
    return jax.process_count()


def global_mesh(n_devices: int | None = None) -> Mesh:
    """1-D slab mesh over ALL processes' devices (jax.devices() is the
    global device list once the process group is up). Devices are ordered
    process-major, so ring neighbors inside a process ride ICI and the
    per-process edge hops ride DCN — matching the slab decomposition's
    locality (most halo traffic stays intra-process)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def is_multihost() -> bool:
    return jax.process_count() > 1
