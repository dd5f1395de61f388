from slam_tpu.ops import (  # noqa: F401
    mapping,
    measurement,
    motion,
    raycast,
    resample,
)
