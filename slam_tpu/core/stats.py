"""Distributions, angle math, and pose statistics.

Vectorized JAX equivalents of `slam/util.cpp:9-85`. The one deliberate
behavioral fix (SURVEY.md section 5, quirk 1): the reference re-seeds its RNG
from the system clock on every sample (`slam/util.cpp:29-31`); here all
sampling takes explicit `jax.random` keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT_2PI = 2.5066282746310002


def pdf_normal(stddev, x):
    """N(0, stddev^2) density (`slam/util.cpp:9-13`)."""
    z = x / stddev
    return jnp.exp(-0.5 * z * z) / (stddev * _SQRT_2PI)


def pdf_normal_clamp(stddev, x, multiple_stddev=4.0):
    """Density clamped to zero beyond `multiple_stddev` sigmas
    (`slam/util.cpp:15-19`)."""
    return jnp.where(
        jnp.abs(x) > multiple_stddev * stddev, 0.0, pdf_normal(stddev, x)
    )


def log_pdf_normal_clamp_eps(stddev, x, eps, multiple_stddev=4.0):
    """log(pdf_normal_clamp(stddev, x) + eps), fused & numerically direct.

    This is the per-beam weight factor of the reference measurement model
    (`slam/raycast.cpp:225-242`, EPSILON=0.1 at `:233`).
    """
    return jnp.log(pdf_normal_clamp(stddev, x, multiple_stddev) + eps)


def pdf_triangular(stddev, x):
    """Triangular density (`slam/util.cpp:21-25`)."""
    var = stddev * stddev
    return jnp.maximum(0.0, 1.0 / jnp.sqrt(6 * var) - jnp.abs(x) / (6 * var))


def sample_normal(key, stddev, shape=()):
    """Zero-mean Gaussian sample(s); `stddev` may broadcast against `shape`."""
    return jax.random.normal(key, shape) * stddev


def sample_triangular(key, stddev, shape=()):
    """Triangular sample(s) (`slam/util.cpp:36-43`): sqrt(6)/2 * u1 + u2 with
    u_i ~ U(-stddev, stddev)."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape, minval=-1.0, maxval=1.0) * stddev
    u2 = jax.random.uniform(k2, shape, minval=-1.0, maxval=1.0) * stddev
    return jnp.sqrt(6.0) / 2.0 * u1 + u2


def normalize_angle(angle):
    """Wrap to [-pi, pi). The reference's version (`slam/util.cpp:45-51`)
    leaves some negative angles un-normalized; since angles are only consumed
    through cos/sin this mod-2pi-equivalent form is behavior-preserving."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def average_pose(x, y, theta, weights=None):
    """Mean position + circular-mean heading (`slam/util.cpp:66-85`).

    The reference averages unweighted; pass `weights` for a weighted variant.
    Returns (x, y, theta) scalars.
    """
    if weights is None:
        ax = jnp.mean(x)
        ay = jnp.mean(y)
        cx = jnp.mean(jnp.cos(theta))
        cy = jnp.mean(jnp.sin(theta))
    else:
        w = weights / jnp.sum(weights)
        ax = jnp.sum(w * x)
        ay = jnp.sum(w * y)
        cx = jnp.sum(w * jnp.cos(theta))
        cy = jnp.sum(w * jnp.sin(theta))
    return ax, ay, jnp.arctan2(cy, cx)


def random_cell(key, shape):
    """Uniform random (i, j) cell, the analogue of `slam/util.cpp:53-64`
    (which samples inclusive of rows/cols; we sample the valid half-open
    range)."""
    h, w = shape[0], shape[1]
    ki, kj = jax.random.split(key)
    i = jax.random.randint(ki, (), 0, h)
    j = jax.random.randint(kj, (), 0, w)
    return i, j
