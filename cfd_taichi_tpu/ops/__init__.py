from cfd_taichi_tpu.ops import smoothing  # noqa: F401
from cfd_taichi_tpu.ops import neighbors  # noqa: F401
