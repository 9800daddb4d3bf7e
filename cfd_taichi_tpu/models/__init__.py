"""Solver registry.

Replaces the reference's stringly-typed dynamic import
(`importlib.import_module(name + '_solver')`, reference main.py:66-68) with
an explicit mapping from config `solver.name` to solver modules. Each module
exposes `init_state(scene) -> SimState` and `make_step(static) ->
(arrays, state) -> state`.
"""

from cfd_taichi_tpu.models import base  # noqa: F401


_REGISTRY = {
    "wcsph": "cfd_taichi_tpu.models.wcsph",
    "pbf": "cfd_taichi_tpu.models.pbf",
    "pcisph": "cfd_taichi_tpu.models.pcisph",
    "iisph": "cfd_taichi_tpu.models.iisph",
    "dfsph": "cfd_taichi_tpu.models.dfsph",
}


def get_solver(name: str):
    import importlib

    try:
        module_name = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown solver '{name}'; available: {sorted(_REGISTRY)}"
        ) from None
    return importlib.import_module(module_name)
