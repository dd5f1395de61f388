"""Beam-endpoint measurement model.

TPU-native re-expression of `measurement_model_beam` + the weighting loop of
`MCL::update_inner` (`slam/raycast.cpp:225-242`, `slam/mcl.cpp:49-77`):
instead of N_particles x N_beams scalar ray marches across a pthread fan-out,
one batched raycast over the [N, B] ray grid followed by fused elementwise
log-pdf accumulation.

Architectural note: the reference *mutates each particle's map while
weighting* (mapping fused into the measurement model, SURVEY.md section 5
quirk 4). The shared-map design evaluates all particles against the same
frozen grid and applies the map update separately (slam_tpu.ops.mapping) —
the well-defined parallel semantics SURVEY section 7 calls for.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from slam_tpu.core.stats import log_pdf_normal_clamp_eps
from slam_tpu.core.types import Pose, Scan
from slam_tpu.ops.raycast import raycast_march


def scanner_displacement(scanner_offset):
    """Decompose a mounting offset pose into (d, theta, rot)
    (`slam/mcl.cpp:80-86`)."""
    ox, oy, orot = scanner_offset
    return math.hypot(ox, oy), math.atan2(oy, ox), orot


def sensor_pose(pose: Pose, scanner_offset) -> Pose:
    """Sensor pose in the world frame given the robot pose and the lidar
    mounting offset (`slam/mcl.cpp:88-100`)."""
    d, th, rot = scanner_displacement(scanner_offset)
    return Pose(
        x=pose.x + jnp.cos(pose.theta + th) * d,
        y=pose.y + jnp.sin(pose.theta + th) * d,
        theta=pose.theta + rot,
    )


def beam_log_weights(pred_dist, hit, meas_dist, *, stddev, max_dist, eps=0.1):
    """Per-beam log weight.

    Hit: log(pdf_clamp(sigma, predicted - measured) + eps); no-hit:
    log(pdf_clamp(sigma, measured - max_dist) + eps)
    (`slam/raycast.cpp:225-242`).
    """
    err = jnp.where(hit, pred_dist - meas_dist, meas_dist - max_dist)
    return log_pdf_normal_clamp_eps(stddev, err, eps)


def particle_log_weights(
    blocked: jax.Array,
    poses: Pose,
    scan: Scan,
    *,
    scanner_offset=(0.0, 0.0, 0.0),
    stddev: float = 5.0,
    eps: float = 0.1,
    max_dist: float = 500.0,
    step: float = 0.5,
    chunk: int = 64,
):
    """Log measurement likelihood of every particle given one scan.

    Args:
      blocked: bool[H, W] occupancy (True blocks rays).
      poses: particle poses, batch shape [N].
      scan: B beams (angles relative to heading, measured ranges).

    Returns:
      f32[N] sum of per-beam log weights (the log of `slam/mcl.cpp:69-75`'s
      exp-sum weight).
    """
    sp = sensor_pose(poses, scanner_offset)
    angles = sp.theta[:, None] + scan.angles[None, :]  # [N, B]
    pred, hit = raycast_march(
        blocked,
        sp.x[:, None],
        sp.y[:, None],
        angles,
        step=step,
        max_dist=max_dist,
        chunk=chunk,
    )
    lw = beam_log_weights(
        pred, hit, scan.dists[None, :], stddev=stddev, max_dist=max_dist, eps=eps
    )
    return jnp.sum(lw, axis=-1)
