"""Simulated lidar: batched raycasts against a ground-truth grid.

Equivalent of `slam/fake_lidar.cpp:15-33` (N rays evenly spanning
[start, stop) centered on the pose heading, each a `raycast<int>` against the
binary ground-truth map) fused with the app-side hit->(angle, dist)
conversion (`apps/grid_slam.cpp:147-166`): one [n_rays] vectorized raycast,
max-range misses encoded as dist == max_dist.

The reference's `stddev` field is never applied to ranges in the C++
(SURVEY.md section 5 quirk 3); `LidarConfig.noise_stddev > 0` restores the
notebook prototype's noisy-sensor behavior (cell 8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.core.config import LidarConfig, RaycastConfig
from slam_tpu.core.types import Pose, Scan
from slam_tpu.ops.raycast import raycast_march


def scan(
    blocked_gt: jax.Array,
    pose: Pose,
    cfg: LidarConfig,
    rc: RaycastConfig = RaycastConfig(),
    key=None,
) -> Scan:
    """Scan the ground-truth map from `pose` (the sensor pose in the world
    frame). Returns a Scan with beam angles relative to the pose heading."""
    angles = jnp.asarray(cfg.angles, jnp.float32)  # [B]
    dists, hits = raycast_march(
        blocked_gt,
        pose.x,
        pose.y,
        pose.theta + angles,
        step=rc.step,
        max_dist=cfg.max_dist,
        chunk=rc.chunk,
    )
    dists = jnp.where(hits, dists, cfg.max_dist)
    if cfg.noise_stddev > 0.0:
        if key is None:
            raise ValueError("noise_stddev > 0 requires a PRNG key")
        noise = jax.random.normal(key, dists.shape) * cfg.noise_stddev
        dists = jnp.where(hits, jnp.clip(dists + noise, rc.step, cfg.max_dist), dists)
    return Scan(angles=angles, dists=dists)
