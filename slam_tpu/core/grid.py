"""Occupancy-grid coordinate conventions and log-odds algebra.

Coordinate convention (identical to the reference, `slam/util.h:30-43`):
world coordinates are y-up with the origin at the bottom-left of the map;
image (array) coordinates are (row i, col j) with row 0 at the top:

    i = floor(H - y - 1)        j = floor(x)
    x = j                       y = H - i        (cell -> world)

The map itself is a single shared log-odds grid ``l: f32[H, W]`` holding the
log-odds of OCCUPANCY (textbook additive form, `slam/util.h:72-73`), replacing
the reference's per-particle uint8 probability-of-free maps
(`slam/pose.h:32-37`, `slam/mcl.cpp:30-37`). Conversions:

    p_occ = sigmoid(l)       p_free = sigmoid(-l)
    blocked  <=>  p_free < 0.5  <=>  l > 0      (strict, unknown=0 traversable,
                                                 matching `slam/raycast.cpp:43,90`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def world_to_cell(shape, x, y):
    """World (x, y) -> image (i, j). Truncation matches the reference's
    int cast in `slam/util.h:30-38` (floor for in-bounds positive values)."""
    h = shape[0]
    i = jnp.floor(h - y - 1.0).astype(jnp.int32)
    j = jnp.floor(x).astype(jnp.int32)
    return i, j


def cell_to_world(shape, i, j, dtype=jnp.float32):
    """Image (i, j) -> world (x, y) (`slam/util.h:40-43`)."""
    h = shape[0]
    x = jnp.asarray(j, dtype)
    y = jnp.asarray(h - i, dtype)
    return x, y


def in_bounds(shape, i, j):
    """Bounds test (`slam/util.h:45-53`)."""
    h, w = shape[0], shape[1]
    return (i >= 0) & (i < h) & (j >= 0) & (j < w)


def clamp_cell(shape, i, j):
    """Clamp cell indices into range (for safe gathers; pair with in_bounds)."""
    h, w = shape[0], shape[1]
    return jnp.clip(i, 0, h - 1), jnp.clip(j, 0, w - 1)


def log_odds(p):
    """p -> log odds (`slam/util.h:72`)."""
    return jnp.log(p / (1.0 - p))


def log_odds_inv(l):
    """log odds -> p (`slam/util.h:73`); equals sigmoid(l)."""
    return jax.nn.sigmoid(l)


def blocked_from_logodds(grid_logodds: jax.Array) -> jax.Array:
    """bool[H,W]: cell is blocked iff P(free) < 0.5, i.e. log-odds(occ) > 0."""
    return grid_logodds > 0.0


def blocked_from_prob_free(prob_free: jax.Array) -> jax.Array:
    """bool[H,W] from a probability-of-free map (reference CV_64F convention,
    blocked iff p_free < 0.5, `slam/raycast.cpp:43`)."""
    return prob_free < 0.5


def blocked_from_u8(map_u8: jax.Array) -> jax.Array:
    """bool[H,W] from a quantized uint8 map (blocked iff value < 128,
    `slam/raycast.cpp:90`)."""
    return map_u8 < 128


def blocked_from_binary(map_i32: jax.Array) -> jax.Array:
    """bool[H,W] from a 0/1 ground-truth map (blocked iff value == 0,
    `slam/raycast.cpp:136`)."""
    return map_i32 == 0


def uniform_logodds(shape, dtype=jnp.float32) -> jax.Array:
    """A fresh unknown map: log-odds 0 everywhere == p 0.5, the analogue of
    the reference's 128-gray initial particle maps (`slam/mcl.cpp:30`)."""
    return jnp.zeros(shape, dtype)
