from slam_tpu.core import grid, stats, types  # noqa: F401
