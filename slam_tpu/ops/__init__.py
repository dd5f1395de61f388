from slam_tpu.ops import (  # noqa: F401
    edt,
    lut,
    mapping,
    measurement,
    motion,
    raycast,
    rayfield,
    resample,
)
