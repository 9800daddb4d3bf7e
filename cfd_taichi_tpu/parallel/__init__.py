from cfd_taichi_tpu.parallel import domain  # noqa: F401
