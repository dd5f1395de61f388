"""Probabilistic motion models (Thrun et al., Probabilistic Robotics ch. 5).

Vectorized equivalents of `slam/motion.cpp:9-56`, plus the inverse/density
models that exist only in the reference's notebook prototype
(`notebooks/slam.ipynb` cell 3). All samplers take explicit PRNG keys and
vectorize over any pose batch shape — the per-particle loop of
`slam/mcl.cpp:41-47` becomes one fused elementwise program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.core.stats import normalize_angle, pdf_normal
from slam_tpu.core.types import Odometry, Pose, Velocity


def sample_motion_model_odometry(key, odom: Odometry, pose: Pose, alphas) -> Pose:
    """Sample next pose(s) under the odometry motion model.

    Matches `slam/motion.cpp:9-32`: perturb (rot1, trans, rot2) with
    zero-mean Gaussians whose stddevs are alpha-weighted mixes of the
    commanded motion, then integrate.
    """
    a0, a1, a2, a3 = alphas
    shape = pose.x.shape
    k1, k2, k3 = jax.random.split(key, 3)

    r1, t, r2 = odom.rot1, odom.trans, odom.rot2
    std_r1 = jnp.sqrt(a0 * r1 * r1 + a1 * t * t)
    std_t = jnp.sqrt(a2 * t * t + a3 * (r1 * r1 + r2 * r2))
    std_r2 = jnp.sqrt(a0 * r2 * r2 + a1 * t * t)

    rot1 = r1 - jax.random.normal(k1, shape) * std_r1
    trans = t - jax.random.normal(k2, shape) * std_t
    rot2 = r2 - jax.random.normal(k3, shape) * std_r2

    x = pose.x + trans * jnp.cos(pose.theta + rot1)
    y = pose.y + trans * jnp.sin(pose.theta + rot1)
    theta = normalize_angle(pose.theta + rot1 + rot2)
    return Pose(x=x, y=y, theta=theta)


def sample_motion_model_velocity(
    key, vel: Velocity, pose: Pose, dt, alphas
) -> Pose:
    """Sample next pose(s) under the velocity motion model.

    Counterpart of `slam/motion.cpp:34-56` (same noise structure: v/w
    perturbed, final-heading gamma noise, w==0 guarded). The arc integration
    here uses the textbook form x' = x - v/w sin(th) + v/w sin(th + w dt)
    (Thrun table 5.3); the reference's `-v/w (sin(th) + sin(th + w dt))` has a
    sign deviation from the book on an API no app exercises.
    """
    a0, a1, a2, a3, a4, a5 = alphas
    eps = 1e-6
    shape = pose.x.shape
    k1, k2, k3 = jax.random.split(key, 3)

    v0, w0 = vel.v, vel.w
    v = v0 + jax.random.normal(k1, shape) * jnp.sqrt(
        a0 * v0 * v0 + a1 * w0 * w0
    )
    w = w0 + jax.random.normal(k2, shape) * jnp.sqrt(
        a2 * w0 * w0 + a3 * v0 * v0
    )
    gamma = jax.random.normal(k3, shape) * jnp.sqrt(
        a4 * v0 * v0 + a5 * w0 * w0
    )

    w_safe = jnp.where(w == 0, eps, w)
    r = v / w_safe
    x = pose.x - r * jnp.sin(pose.theta) + r * jnp.sin(pose.theta + w * dt)
    y = pose.y + r * jnp.cos(pose.theta) - r * jnp.cos(pose.theta + w * dt)
    theta = normalize_angle(pose.theta + w * dt + gamma * dt)
    return Pose(x=x, y=y, theta=theta)


def odometry_from_poses(prev: Pose, curr: Pose) -> Odometry:
    """Inverse odometry model: recover (rot1, trans, rot2) from a pose pair
    (notebook cell 3's `motion_model_odometry` decomposition)."""
    dx = curr.x - prev.x
    dy = curr.y - prev.y
    trans = jnp.sqrt(dx * dx + dy * dy)
    rot1 = normalize_angle(jnp.arctan2(dy, dx) - prev.theta)
    rot2 = normalize_angle(curr.theta - prev.theta - rot1)
    return Odometry(rot1=rot1, trans=trans, rot2=rot2)


def motion_model_odometry_density(
    odom: Odometry, prev: Pose, curr: Pose, alphas
):
    """p(curr | prev, odom) under the odometry model (Thrun table 5.5) —
    the closed-form density the notebook validates its sampler against."""
    a0, a1, a2, a3 = alphas
    hat = odometry_from_poses(prev, curr)

    r1, t, r2 = odom.rot1, odom.trans, odom.rot2
    p1 = pdf_normal(
        jnp.sqrt(a0 * r1 * r1 + a1 * t * t) + 1e-12,
        normalize_angle(r1 - hat.rot1),
    )
    p2 = pdf_normal(
        jnp.sqrt(a2 * t * t + a3 * (r1 * r1 + r2 * r2)) + 1e-12,
        t - hat.trans,
    )
    p3 = pdf_normal(
        jnp.sqrt(a0 * r2 * r2 + a1 * t * t) + 1e-12,
        normalize_angle(r2 - hat.rot2),
    )
    return p1 * p2 * p3
