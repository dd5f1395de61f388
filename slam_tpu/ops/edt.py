"""Euclidean distance transforms over occupancy grids.

The reference raycasts by scalar fixed-step DDA marching (`slam/raycast.cpp:
8-141`) — up to max_dist/step (1000) sequential cell probes per ray. That is
hostile to the TPU (a long chain of dependent scalar gathers). The TPU-native
design precomputes a distance field over the map and lets rays take
obstacle-aware adaptive steps (sphere tracing, see ops/raycast.py:raycast_sdf),
turning ~1000 probes into ~tens.

Two implementations:

  * `edt_exact` — exact Euclidean distance via the separable decomposition:
    a vertical run-length pass (cummax/cummin index tricks, no gathers)
    followed by a blocked (min,+) row pass over squared column distances.
    O(H * W^2 / block) work, fully vectorized; used for static maps and as
    the oracle.
  * `edt_jfa` — jump-flooding (JFA+1): O(H * W * log) shifted-min passes,
    no gathers at all. Distances are exact except for rare small
    overestimates; consumers compensate with a safety margin. Used when the
    map evolves every step (SLAM mode).

Distances are measured between CELL CENTERS in pixels; blocked cells have
distance 0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _vertical_sq_dist(blocked: jax.Array, big: float) -> jax.Array:
    """f32[H, W]: squared distance to the nearest blocked cell in the same
    column (big^2 where the column has none)."""
    h = blocked.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, blocked.shape, 0)
    up = ii - jax.lax.cummax(jnp.where(blocked, ii, -(1 << 30)), axis=0)
    down = jax.lax.cummin(jnp.where(blocked, ii, 1 << 30), axis=0, reverse=True) - ii
    g = jnp.minimum(jnp.minimum(up, down), int(big)).astype(jnp.float32)
    return g * g


def edt_exact(blocked: jax.Array, block: int = 64) -> jax.Array:
    """Exact Euclidean distance transform, f32[H, W] pixels."""
    h, w = blocked.shape
    big = float(h + w)
    g2 = _vertical_sq_dist(blocked, big)

    kk = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    n_blocks = -(-w // block)

    def one_block(j0):
        j = j0.astype(jnp.float32) + jnp.arange(block, dtype=jnp.float32)
        d2 = g2[:, None, :] + (j[None, :, None] - kk) ** 2  # [H, block, W]
        return jnp.min(d2, axis=-1)

    outs = jax.lax.map(one_block, jnp.arange(n_blocks, dtype=jnp.int32) * block)
    e2 = jnp.moveaxis(outs, 0, 1).reshape(h, n_blocks * block)[:, :w]
    return jnp.sqrt(jnp.minimum(e2, big * big))


def edt_jfa(blocked: jax.Array, max_dist: float | None = None) -> jax.Array:
    """Jump-flooding EDT (JFA+1), f32[H, W] pixels.

    Gather-free: every pass is 8 rolls + elementwise mins, so a full
    transform on a ~600x1300 map is a handful of bandwidth-bound passes —
    cheap enough to rebuild every SLAM map update. The nearest-seed
    coordinate pair is PACKED into one i32 flat index (seed row/col are
    recomputed by a constant div/mod), so each pass rolls one array instead
    of two — the passes are bandwidth-bound, not ALU-bound.

    `max_dist` caps the propagation radius: step sizes start at
    2^ceil(log2(max_dist)) instead of half the map dimension, dropping
    pass count ~2x on big maps. Distances <= max_dist stay exact (same
    JFA+1 approximation); farther cells saturate to the h+w sentinel. The
    likelihood-field measurement only resolves ~5 sigma of distance, so
    its per-step rebuild uses a ~30 px cap (models/mcl.py update).
    """
    h, w = blocked.shape
    big = jnp.float32(h + w)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    iif = ii.astype(jnp.float32)
    jjf = jj.astype(jnp.float32)

    inf = jnp.float32(1e9)
    idx = jnp.where(blocked, ii * w + jj, -1)  # -1 = no seed known

    def d2_of(idx_):
        si = (idx_ // w).astype(jnp.float32)
        sj = (idx_ % w).astype(jnp.float32)
        return jnp.where(idx_ < 0, inf, (iif - si) ** 2 + (jjf - sj) ** 2)

    d2 = d2_of(idx)

    max_dim = max(h, w)
    if max_dist is None:
        s = 1 << max(0, math.ceil(math.log2(max_dim)) - 1)
    else:
        rng = max(1, min(max_dim, int(math.ceil(max_dist))))
        s = 1 << math.ceil(math.log2(rng))
    steps = []
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.append(1)  # the "+1" refinement pass

    for s in steps:
        for di in (-s, 0, s):
            for dj in (-s, 0, s):
                if di == 0 and dj == 0:
                    continue
                idx_r = jnp.roll(idx, (di, dj), (0, 1))
                # Invalidate wrapped-around entries.
                valid = jnp.ones((h, w), bool)
                if di > 0:
                    valid = valid & (ii >= di)
                elif di < 0:
                    valid = valid & (ii < h + di)
                if dj > 0:
                    valid = valid & (jj >= dj)
                elif dj < 0:
                    valid = valid & (jj < w + dj)
                cand = jnp.where(valid, d2_of(idx_r), inf)
                better = cand < d2
                idx = jnp.where(better, idx_r, idx)
                d2 = jnp.where(better, cand, d2)

    return jnp.sqrt(jnp.minimum(d2, big * big))
