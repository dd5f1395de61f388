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

from slam_tpu.core.config import RaycastConfig
from slam_tpu.core.stats import log_pdf_normal_clamp_eps
from slam_tpu.core.types import Pose, Scan
from slam_tpu.ops.rayfield import as_ray_field, raycast_field


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


def particle_log_weights_likelihood_field(
    field,
    poses: Pose,
    scan: Scan,
    *,
    rc: RaycastConfig = RaycastConfig(),
    scanner_offset=(0.0, 0.0, 0.0),
    stddev: float = 5.0,
    z_hit: float = 0.95,
    z_rand: float = 0.05,
    ray_sharding=None,
):
    """Likelihood-field measurement model (Thrun et al. table 6.3).

    Each beam's endpoint in the world frame is scored by its Euclidean
    distance to the nearest obstacle (one gather from the EDT) under a
    z_hit * N(0, sigma) + z_rand / z_max mixture; max-range beams are
    skipped, out-of-map endpoints get the random-mixture floor. No
    raycasting — the TPU-fast model for both static and per-step-updated
    maps (the EDT rebuilds gather-free via JFA).
    """
    from slam_tpu.core.stats import pdf_normal
    from slam_tpu.ops.rayfield import as_ray_field
    from slam_tpu.core import grid as gridlib

    field = as_ray_field(field, rc)
    if field.edt is None:
        raise ValueError(
            "likelihood_field needs field.edt (use the 'sdf' backend)"
        )
    h, w = field.edt.shape
    sp = sensor_pose(poses, scanner_offset)
    angles = sp.theta[:, None] + scan.angles[None, :]  # [N, B]
    z = scan.dists[None, :]
    ex = sp.x[:, None] + z * jnp.cos(angles)
    ey = sp.y[:, None] + z * jnp.sin(angles)
    if ray_sharding is not None:
        ex, ey = (
            jax.lax.with_sharding_constraint(a, ray_sharding) for a in (ex, ey)
        )
    i, j = gridlib.world_to_cell((h, w), ex, ey)
    inb = gridlib.in_bounds((h, w), i, j)
    ic, jc = gridlib.clamp_cell((h, w), i, j)
    d = field.edt.reshape(-1)[ic * w + jc]

    p_hit = jnp.where(inb, pdf_normal(stddev, d), 0.0)
    p = z_hit * p_hit + z_rand / rc.max_dist
    lw = jnp.log(jnp.maximum(p, 1e-30))
    # Max-range misses carry no endpoint information (model skip).
    lw = jnp.where(z >= rc.max_dist, 0.0, lw)
    return jnp.sum(lw, axis=-1)


def particle_log_weights(
    field,
    poses: Pose,
    scan: Scan,
    *,
    rc: RaycastConfig = RaycastConfig(),
    scanner_offset=(0.0, 0.0, 0.0),
    stddev: float = 5.0,
    eps: float = 0.1,
    ray_sharding=None,
):
    """Log measurement likelihood of every particle given one scan.

    Args:
      field: a `RayField` (prebuilt backend structure) or a raw bool[H, W]
        blocked mask (wrapped on the fly; see slam_tpu.ops.rayfield).
      poses: particle poses, batch shape [N].
      scan: B beams (angles relative to heading, measured ranges).
      rc: raycast backend config.
      ray_sharding: optional `jax.sharding.Sharding` for the [N, B] ray batch.
        Under a 2D (particle, beam) device mesh this pins the hot raycast to
        both axes; GSPMD then inserts the psum for the beam-axis reduction.

    Returns:
      f32[N] sum of per-beam log weights (the log of `slam/mcl.cpp:69-75`'s
      exp-sum weight).
    """
    field = as_ray_field(field, rc)
    sp = sensor_pose(poses, scanner_offset)
    angles = sp.theta[:, None] + scan.angles[None, :]  # [N, B]
    px = jnp.broadcast_to(sp.x[:, None], angles.shape)
    py = jnp.broadcast_to(sp.y[:, None], angles.shape)
    if ray_sharding is not None:
        px, py, angles = (
            jax.lax.with_sharding_constraint(a, ray_sharding)
            for a in (px, py, angles)
        )
    pred, hit = raycast_field(field, px, py, angles, rc)
    lw = beam_log_weights(
        pred,
        hit,
        scan.dists[None, :],
        stddev=stddev,
        max_dist=rc.max_dist,
        eps=eps,
    )
    return jnp.sum(lw, axis=-1)
