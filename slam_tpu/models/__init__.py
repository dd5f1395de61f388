from slam_tpu.models import fake_lidar, mcl, slam  # noqa: F401
