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


def beam_weights_probabilistic(
    prob_occ: jax.Array,
    poses: Pose,
    scan: Scan,
    *,
    scanner_offset=(0.0, 0.0, 0.0),
    stddev: float = 5.0,
    max_dist: float = 500.0,
    step: float = 0.5,
):
    """'Most probable along ray' beam model over an UNCERTAIN occupancy map
    (the reference notebook's cell-10 `measurement_model_beam_probabilistic`,
    which the C++ dropped — SURVEY.md section 2 item 23).

    Marching along each beam, a cell at distance d scores
    q = p * P(occ) * pdf_clamp(z - d) where p is the survival probability
    (prob no earlier cell produced the return, p <- p * (1 - q)); the beam
    weight is the max q, floored by pdf(1.5 sigma) and the max-range term.
    The survival recurrence is sequential along the ray, so this runs as a
    lax.scan over ray steps vectorized across [N, B] beams (K elementwise
    passes + K gathers) — a mapping-mode scoring tool, not the fast
    localization path.

    Returns f32[N, B] beam weights (probabilities, not logs).
    """
    from slam_tpu.core import grid as gridlib
    from slam_tpu.core.stats import pdf_normal, pdf_normal_clamp

    h, w = prob_occ.shape
    prob_flat = prob_occ.reshape(-1)
    sp = sensor_pose(poses, scanner_offset)
    angles = sp.theta[:, None] + scan.angles[None, :]  # [N, B]
    dx = jnp.cos(angles) * step
    dy = jnp.sin(angles) * step
    z = scan.dists[None, :]

    i0, j0 = gridlib.world_to_cell((h, w), sp.x, sp.y)
    cell0 = (i0 * w + j0)[:, None]

    k_total = int(math.ceil(max_dist / step))
    floor = pdf_normal(stddev, 1.5 * stddev)

    def body(carry, k):
        p, best, prev_cell, alive = carry
        d = (k + 1.0) * step
        px = sp.x[:, None] + (k + 1.0) * dx
        py = sp.y[:, None] + (k + 1.0) * dy
        i, j = gridlib.world_to_cell((h, w), px, py)
        inb = gridlib.in_bounds((h, w), i, j)
        ic, jc = gridlib.clamp_cell((h, w), i, j)
        cell = i * w + j
        # The notebook breaks at the first out-of-bounds position and stops
        # scoring before d >= z_max; `alive` carries the not-yet-broken flag.
        score = (cell != prev_cell) & inb & alive & (d < max_dist)
        occ = prob_flat[ic * w + jc]
        q = jnp.where(score, p * occ * pdf_normal_clamp(stddev, z - d), 0.0)
        best = jnp.maximum(best, q)
        p = jnp.where(score, p * (1.0 - q), p)
        prev_cell = jnp.where(score, cell, prev_cell)
        alive = alive & inb
        return (p, best, prev_cell, alive), None

    init = (
        jnp.ones_like(angles),
        jnp.full_like(angles, floor),
        jnp.broadcast_to(cell0, angles.shape),
        jnp.ones(angles.shape, bool),
    )
    (p, best, _, alive), _ = jax.lax.scan(
        body, init, jnp.arange(k_total, dtype=jnp.float32)
    )
    # Max-range term — only for rays that reached z_max inside the map.
    best = jnp.maximum(
        best, jnp.where(alive, p * pdf_normal_clamp(stddev, z - max_dist), 0.0)
    )
    return best


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
