"""cfd_taichi_tpu — a TPU-native SPH fluid simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Taichi
reference simulator Jukgei/CFD_Taichi (five pressure solvers — WCSPH, PBF,
PCISPH, IISPH, DFSPH — Akinci-2012 boundary handling, two-way rigid-fluid
coupling with an impulse-based rigid body solver, uniform-grid neighbor
search, JSON scene configs and PLY/OBJ export).

Architecture (TPU-first, not a port):
  * particle state = pytrees of flat fixed-shape arrays
  * neighbor search = counting-sort cell list + fixed-K compact neighbor
    lists (replaces Taichi dynamic SNode per-cell lists, reference
    ParticleSystem.py:99-110)
  * per-particle accumulation = vectorized masked gathers fused by XLA
    (replaces Taichi `for_all_neighbor` + atomics,
    reference ParticleSystem.py:447-469)
  * pressure-solver iteration = `lax.while_loop` with on-device residuals
    (replaces host loops, e.g. reference dfsph_solver.py:221-233)
  * rigid coupling scatter = deterministic `segment-sum`/`.at[].add`
    (replaces atomic `+=`, e.g. reference wcsph_solver.py:126)
  * multi-chip = spatial domain decomposition via `shard_map` over a
    device mesh with halo exchange (new capability; reference is
    single-GPU only)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax


def _host_fingerprint() -> str:
    """Hash of the host CPU's model + feature flags + jax version. XLA:CPU
    AOT executables are feature-set specific and the persistent cache does
    NOT key on them — loading an entry compiled on a different machine risks
    SIGILL — so the cache directory embeds the fingerprint and a host change
    simply starts a fresh cache (TPU entries are keyed by chip type and
    would have been safe either way). The model name is included because
    LLVM derives tuning pseudo-features (e.g. prefer-no-gather on
    Downfall-mitigated parts) from the model, not the flags line — two
    hosts with identical flags can still produce mismatched AOT blobs."""
    try:
        with open("/proc/cpuinfo") as f:
            key = _jax.__version__
            for line in f:
                if line.startswith(("flags", "model name")):
                    key += line
                    if line.startswith("flags"):
                        break
            import hashlib
            return hashlib.sha1(key.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "generic"


# Persistent compilation cache: solver steps compile in tens of seconds on a
# tunneled TPU (and the test suite's CPU compiles dominate its ~19 min cold
# run); cache them across processes (runs, tests, benchmarks).
# Opt out with CFD_TPU_JAX_CACHE=off.
_cache = _os.environ.get(
    "CFD_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".jax_cache", f"h-{_host_fingerprint()}"))
if _cache != "off":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

from cfd_taichi_tpu.config import SimConfig, read_config  # noqa: F401
from cfd_taichi_tpu.scene import Scene, build_scene  # noqa: F401
