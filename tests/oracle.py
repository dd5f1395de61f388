"""NumPy oracles implementing the reference algorithms' exact semantics
(scalar loops, straight from the C++ behavior) for cross-checking the
vectorized JAX kernels — the brute-force-oracle test pattern the reference
itself uses for its kd-tree (`apps/nearest_neighbor.cpp:25-38`)."""

import math

import numpy as np


def raycast_oracle(blocked, x, y, theta, step=0.5, max_dist=500.0):
    """Scalar port of raycast<T> semantics (slam/raycast.cpp:8-141).

    Returns (dist, hit): dist = k*step at the hit event, max_dist for miss.
    """
    h, w = blocked.shape
    dx = step * math.cos(theta)
    dy = step * math.sin(theta)
    cx, cy = x, y
    prev_i = int(math.floor(h - y - 1))
    prev_j = int(math.floor(x))
    k = 0
    while True:
        k += 1
        cx += dx
        cy += dy
        i = int(math.floor(h - cy - 1))
        j = int(math.floor(cx))
        if i == prev_i and j == prev_j:
            continue
        d = math.hypot(cx - x, cy - y)
        if d >= max_dist:
            return max_dist, False
        if not (0 <= i < h and 0 <= j < w):
            return max_dist, False
        if blocked[i, j]:
            return d, True
        prev_i, prev_j = i, j


def measurement_model_beam_oracle(pred_dist, hit, meas, stddev, max_dist, eps=0.1):
    """Scalar beam weight (slam/raycast.cpp:225-242)."""

    def pdf_clamp(s, v):
        if abs(v) > 4 * s:
            return 0.0
        return math.exp(-0.5 * (v / s) ** 2) / (s * math.sqrt(2 * math.pi))

    if not hit:
        return pdf_clamp(stddev, meas - max_dist) + eps
    return pdf_clamp(stddev, pred_dist - meas) + eps


def mapping_oracle(grid_l, sx, sy, angle, z, step, max_dist, l_occ, l_free,
                   l_min, l_max):
    """Scalar additive log-odds beam update with the march semantics of
    slam/raycast.cpp:143-223 (changed-cell dedup, OOB break, endpoint cell,
    z == max skip). Mutates and returns grid_l (numpy array)."""
    h, w = grid_l.shape
    dx = step * math.cos(angle)
    dy = step * math.sin(angle)
    cx, cy = sx, sy
    prev_i = int(math.floor(h - sy - 1))
    prev_j = int(math.floor(sx))
    k = 0
    k_total = int(math.ceil(max_dist / step))
    drew = False
    while k < k_total:
        k += 1
        cx += dx
        cy += dy
        i = int(math.floor(h - cy - 1))
        j = int(math.floor(cx))
        if i == prev_i and j == prev_j:
            continue
        if not (0 <= i < h and 0 <= j < w):
            break
        d = k * step
        if d < z:
            grid_l[i, j] = min(l_max, max(l_min, grid_l[i, j] + l_free))
        elif not drew:
            if z < max_dist:
                grid_l[i, j] = min(l_max, max(l_min, grid_l[i, j] + l_occ))
            drew = True
        prev_i, prev_j = i, j
    return grid_l


def brute_force_nn(points, query):
    """Linear-scan nearest neighbor (the apps/nearest_neighbor.cpp oracle)."""
    d = np.sum((points - query) ** 2, axis=-1)
    return int(np.argmin(d))


def brute_force_range_query(points, start, stop):
    """All point indices inside the inclusive box [start, stop]."""
    m = (
        (points[:, 0] >= start[0])
        & (points[:, 0] <= stop[0])
        & (points[:, 1] >= start[1])
        & (points[:, 1] <= stop[1])
    )
    return set(np.nonzero(m)[0].tolist())
