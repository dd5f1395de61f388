"""Hybrid A*: kinematically-feasible SE(2) planning, batched for TPU.

Reference: `slam/hastar.{h,cpp}`. State = continuous pose deduplicated into a
rows x cols x theta_res cuboid (`slam/hastar.cpp:54-55,234-241`); successors
= bicycle-model steering arcs theta' = theta + v/L * tan(steer) for
`branching_factor` steer angles and velocities {+v, -v}, edge cost
v + steering_cost * (10 if reverse) (`slam/hastar.cpp:88-112`); edge
feasibility = straight-line raycast + free destination cell
(`slam/hastar.cpp:123-140`); heuristic = Euclidean distance to goal; success
= first expansion within `tol` of the goal (any heading for diff-drive, else
matching theta bin) (`slam/hastar.cpp:178-184`).

The serial heap pops ONE node per `pathfind()` call; here each round pops the
`batch` best open cuboid cells at once (top-k over the open set), expands all
of their 2 x branching successors vectorized, collision-checks the whole edge
batch with one raycast call, and commits improvements with scatter-min. The
expansion order differs from the strict heap, so parity tests compare path
cost/feasibility, not node order (SURVEY.md section 7 "hard parts").

Deliberate fixes vs the reference (kept out of fidelity scope):
  * `can_reach` bounds the collision raycast by the actual edge length — the
    reference passes the SQUARED distance as max_dist (`slam/hastar.cpp:135`),
    scanning far past the destination.
  * blocked iff P(free) < 0.5 on the provided mask — the reference's
    `uchar < 0.5` only blocks exact 0 (`slam/hastar.cpp:128`, SURVEY
    section 5 quirk 5).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from slam_tpu.core.config import HybridAStarConfig, RaycastConfig
from slam_tpu.core.types import Pose
from slam_tpu.ops.rayfield import RayField, make_ray_field, raycast_field

# Host scalar: a module-level jnp array would initialize the device backend
# (and on tunneled TPU environments, open the tunnel) at import time.
INF = 1e30


@struct.dataclass
class HAState:
    g: jax.Array  # f32[S] best committed cost per cuboid cell
    parent: jax.Array  # i32[S] predecessor cuboid index (-1 = none)
    px: jax.Array  # f32[S] continuous pose of the best entrant
    py: jax.Array
    pth: jax.Array
    open_mask: jax.Array  # bool[S]
    goal_idx: jax.Array  # i32 cuboid index of the first in-tolerance pop (-1)
    goal_cost: jax.Array  # f32
    n_expanded: jax.Array  # i32


def _pose_to_cuboid(shape, k, x, y, theta):
    """Cuboid flat index for pose(s) (`slam/hastar.cpp:234-241`)."""
    h, w = shape
    i = jnp.clip(jnp.floor(h - y - 1.0).astype(jnp.int32), 0, h - 1)
    j = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    ang = jnp.mod(theta + 2 * jnp.pi, 2 * jnp.pi)
    kk = jnp.clip((ang / (2 * jnp.pi / k)).astype(jnp.int32), 0, k - 1)
    return (i * w + j) * k + kk


def _steering_tables(cfg: HybridAStarConfig):
    """Steer angles and their costs (`slam/hastar.cpp:68-80`)."""
    b = cfg.branching_factor
    assert b > 2 and b % 2 == 1, "branching_factor must be odd >= 3"
    cost_slope = cfg.velocity / (b - 1)
    dtheta = cfg.max_steering * 2 / (b - 1)
    mid = b // 2
    thetas = [-cfg.max_steering + i * dtheta for i in range(b)]
    costs = [abs(i - mid) * cost_slope for i in range(b)]
    return np.asarray(thetas, np.float32), np.asarray(costs, np.float32)


def _ha_round(
    st: HAState,
    field: RayField,
    goal: jax.Array,
    target_bin: jax.Array,
    hfield: jax.Array,
    cfg: HybridAStarConfig,
    rc: RaycastConfig,
) -> HAState:
    """One batched expansion round (pure; cfg/rc static for jit caching
    across planner instances — per-instance jits would recompile the whole
    search for every query)."""
    h, w = field.blocked.shape
    shape = (h, w)
    kbins = cfg.theta_res
    kpop = cfg.batch
    bx, by = goal[0], goal[1]
    thetas, steer_costs = _steering_tables(cfg)

    if cfg.heuristic == "geodesic":
        # Precomputed obstacle-aware distance-to-goal per cuboid cell.
        heur = hfield
    else:
        heur = jnp.sqrt((st.px - bx) ** 2 + (st.py - by) ** 2)
    f = jnp.where(st.open_mask, st.g + heur, INF)
    # Nodes whose heuristic is INF (goal-unreachable region) are dead:
    # close them so the search terminates instead of popping them forever.
    open_now = st.open_mask & (f < INF)
    f = jnp.where(open_now, f, INF)
    s = f.shape[0]
    if cfg.selection == "grouped":
        # Best open node per strided index group: one O(S) argmin pass
        # instead of an exact global top-k (~10x cheaper per round; the
        # strided classes interleave map columns and theta bins, so pops
        # stay spread across the frontier).
        pad = (-s) % kpop
        f2 = jnp.pad(f, (0, pad), constant_values=INF).reshape(-1, kpop)
        rel = jnp.argmin(f2, axis=0)  # [kpop]
        cols = jnp.arange(kpop, dtype=jnp.int32)
        pop = rel.astype(jnp.int32) * kpop + cols
        fpop = jnp.take_along_axis(f2, rel[None, :], axis=0)[0]
        pop_valid = (fpop < INF) & (pop < s)
        pop = jnp.where(pop_valid, pop, 0)
    elif cfg.selection == "topk":
        neg_f, pop = jax.lax.top_k(-f, kpop)
        fpop = -neg_f
        pop_valid = fpop < INF
    else:
        raise ValueError(f"unknown selection: {cfg.selection}")

    pop_clear = jnp.where(pop_valid, pop, s)  # drop invalid pops
    open_mask = open_now.at[pop_clear].set(False, mode="drop")

    gx = st.px[pop]
    gy = st.py[pop]
    gth = st.pth[pop]
    gg = st.g[pop]

    # Goal test on popped nodes (`slam/hastar.cpp:178-184`).
    tol2 = cfg.tol * cfg.tol
    d2goal = (gx - bx) ** 2 + (gy - by) ** 2
    bin_of = _pose_to_cuboid(shape, kbins, gx, gy, gth) % kbins
    bin_ok = cfg.diff_drive | (bin_of == target_bin)
    at_goal = (d2goal <= tol2) & bin_ok & pop_valid
    # Lowest-f in-tolerance pop wins.
    any_goal = jnp.any(at_goal)
    first = jnp.argmin(jnp.where(at_goal, fpop, INF))
    goal_better = any_goal & (st.goal_idx < 0)
    goal_idx = jnp.where(goal_better, pop[first], st.goal_idx)
    goal_cost = jnp.where(goal_better, gg[first], st.goal_cost)

    # Successor fan: [K, 2B] (`slam/hastar.cpp:88-112`).
    vels = jnp.asarray([cfg.velocity, -cfg.velocity], jnp.float32)
    cost_factor = jnp.asarray([1.0, cfg.reverse_factor], jnp.float32)
    nth = gth[:, None, None] + (
        vels[None, :, None] / cfg.length
    ) * jnp.tan(jnp.asarray(thetas))[None, None, :]
    nx = gx[:, None, None] + vels[None, :, None] * jnp.cos(nth)
    ny = gy[:, None, None] + vels[None, :, None] * jnp.sin(nth)
    ecost = (
        cfg.velocity
        + jnp.asarray(steer_costs)[None, None, :] * cost_factor[None, :, None]
    )
    shape2 = nx.shape

    # Feasibility: free in-bounds destination + clear straight line.
    dx = nx - gx[:, None, None]
    dy = ny - gy[:, None, None]
    edge_len = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)
    di = jnp.floor(h - ny - 1.0).astype(jnp.int32)
    dj = jnp.floor(nx).astype(jnp.int32)
    inb = (di >= 0) & (di < h) & (dj >= 0) & (dj < w)
    dic = jnp.clip(di, 0, h - 1)
    djc = jnp.clip(dj, 0, w - 1)
    dst_free = ~field.blocked[dic, djc] & inb

    hit_d, hit = raycast_field(
        field,
        jnp.broadcast_to(gx[:, None, None], shape2),
        jnp.broadcast_to(gy[:, None, None], shape2),
        ang,
        rc,
    )
    clear = ~hit | (hit_d >= edge_len)
    ok = dst_free & clear & pop_valid[:, None, None]

    tgt = _pose_to_cuboid(shape, kbins, nx, ny, nth)
    cand = jnp.where(ok, gg[:, None, None] + ecost, INF)

    # Improvements only (`slam/hastar.cpp:198` dedup against the cuboid).
    cand = jnp.where(cand < st.g[tgt], cand, INF)

    tgt_f = tgt.reshape(-1)
    cand_f = cand.reshape(-1)
    g = st.g.at[tgt_f].min(cand_f)

    won = (cand_f <= g[tgt_f]) & (cand_f < INF)
    tgt_w = jnp.where(won, tgt_f, 2 ** 30)  # scatter drop for losers
    parent_src = jnp.broadcast_to(
        pop[:, None, None], shape2
    ).reshape(-1)
    parent = st.parent.at[tgt_w].set(
        parent_src, mode="drop"
    )
    px = st.px.at[tgt_w].set(nx.reshape(-1), mode="drop")
    py = st.py.at[tgt_w].set(ny.reshape(-1), mode="drop")
    pth = st.pth.at[tgt_w].set(nth.reshape(-1), mode="drop")
    open_mask = open_mask.at[tgt_w].set(True, mode="drop")

    return HAState(
        g=g,
        parent=parent,
        px=px,
        py=py,
        pth=pth,
        open_mask=open_mask,
        goal_idx=goal_idx,
        goal_cost=goal_cost,
        n_expanded=st.n_expanded + jnp.sum(pop_valid),
    )


def _ha_solve(st, field, goal, target_bin, hfield, max_rounds, cfg, rc):
    """Whole search as ONE device program: a while_loop over rounds, so a
    full pathfind costs a single host<->device round trip (the per-round
    incremental API stays for animation parity)."""

    def cond(carry):
        st, rounds = carry
        return (st.goal_idx < 0) & jnp.any(st.open_mask) & (rounds < max_rounds)

    def body(carry):
        st, rounds = carry
        return _ha_round(st, field, goal, target_bin, hfield, cfg, rc), rounds + 1

    st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return st


_ha_round_jit = jax.jit(_ha_round, static_argnums=(5, 6))
_ha_solve_jit = jax.jit(_ha_solve, static_argnums=(6, 7))


class HybridAStar:
    """Facade mirroring `slam/hastar.h:14-119` (reset / pathfind /
    recover_path) with a jitted batched round."""

    def __init__(
        self,
        free: jax.Array,
        a: Pose,
        b: Pose,
        cfg: HybridAStarConfig = HybridAStarConfig(),
        rc: RaycastConfig = RaycastConfig(backend="sdf", step=1.0),
    ):
        self.cfg = cfg
        # Collision rays only need to cover one steering arc (length = v);
        # clamping max_dist makes every ray resolve in a handful of
        # sphere-trace iterations instead of marching the lidar range.
        import dataclasses

        self.rc = dataclasses.replace(
            rc, max_dist=min(rc.max_dist, cfg.velocity + 2.0)
        )
        self.reset(free, a, b)

    # -- cuboid indexing (`slam/hastar.cpp:234-241`) ----------------------

    def _pose_to_cuboid(self, x, y, theta):
        return _pose_to_cuboid(self.shape, self.cfg.theta_res, x, y, theta)

    def reset(self, free: jax.Array, a: Pose, b: Pose):
        """New map + new query (`slam/hastar.cpp:30-81`). For a new query on
        the SAME map use `reset_query` — it keeps the prebuilt ray field
        (the expensive part, especially for the lut edge backend)."""
        free = jnp.asarray(free, bool)
        self.shape = free.shape
        self._free = free
        self.field = make_ray_field(~free, self.rc)
        self.reset_query(a, b)

    def reset_query(self, a: Pose, b: Pose):
        """Re-target start/goal, reusing the map's ray field."""
        h, w = self.shape
        k = self.cfg.theta_res
        s = h * w * k
        self.a = a
        self.b = b
        self.success = False
        self.used_up = False

        thetas, steer_costs = _steering_tables(self.cfg)
        self._thetas = jnp.asarray(thetas)
        self._steer_costs = jnp.asarray(steer_costs)

        start_idx = self._pose_to_cuboid(a.x, a.y, a.theta)
        self.state = HAState(
            g=jnp.full((s,), INF).at[start_idx].set(0.0),
            parent=jnp.full((s,), -1, jnp.int32),
            px=jnp.zeros((s,), jnp.float32).at[start_idx].set(a.x),
            py=jnp.zeros((s,), jnp.float32).at[start_idx].set(a.y),
            pth=jnp.zeros((s,), jnp.float32).at[start_idx].set(a.theta),
            open_mask=jnp.zeros((s,), bool).at[start_idx].set(True),
            goal_idx=jnp.int32(-1),
            goal_cost=INF,
            n_expanded=jnp.int32(0),
        )
        self._target_bin = jnp.asarray(
            self._pose_to_cuboid(b.x, b.y, b.theta) % k, jnp.int32
        )
        self._goal = jnp.asarray([b.x, b.y], jnp.float32)
        self._hfield = self._build_hfield(self._free, b)

    def _build_hfield(self, free: jax.Array, b: Pose) -> jax.Array:
        """Heuristic table per cuboid cell. "geodesic" runs the A* wavefront
        to the goal on a `coarse`-downsampled grid (max-pooled free space,
        so distances underestimate -> admissible) and tiles it over theta
        bins; "euclid" returns a dummy (computed in-round)."""
        if self.cfg.heuristic != "geodesic":
            return jnp.zeros((1,), jnp.float32)
        from slam_tpu.planners import astar as astar_mod

        h, w = self.shape
        k = self.cfg.theta_res
        f4 = max(1, self.cfg.coarse)
        ph = (-h) % f4
        pw = (-w) % f4
        fpad = jnp.pad(free, ((0, ph), (0, pw)))
        free_c = fpad.reshape((h + ph) // f4, f4, (w + pw) // f4, f4).any((1, 3))
        gi = jnp.clip(jnp.floor(h - b.y - 1.0).astype(jnp.int32), 0, h - 1) // f4
        gj = jnp.clip(jnp.floor(b.x).astype(jnp.int32), 0, w - 1) // f4
        dc = astar_mod.distance_field(free_c, jnp.stack([gi, gj]))
        h2d = jnp.repeat(jnp.repeat(dc * f4, f4, 0), f4, 1)[:h, :w]
        h2d = jnp.minimum(h2d, INF)
        return jnp.repeat(h2d.reshape(-1), k)



    # -- driver -----------------------------------------------------------

    def pathfind(self) -> bool:
        """One batched round; True when finished (`slam/hastar.cpp:152-214`
        returns True on success/exhaustion)."""
        if self.success or self.used_up:
            return True
        self.state = _ha_round_jit(
            self.state, self.field, self._goal, self._target_bin,
            self._hfield, self.cfg, self.rc,
        )
        if int(self.state.goal_idx) >= 0:
            self.success = True
            return True
        if not bool(jnp.any(self.state.open_mask)):
            self.used_up = True
            return True
        return False

    def solve(self, max_rounds: Optional[int] = None) -> bool:
        max_rounds = max_rounds or self.cfg.max_rounds
        self.state = _ha_solve_jit(
            self.state,
            self.field,
            self._goal,
            self._target_bin,
            self._hfield,
            jnp.int32(max_rounds),
            self.cfg,
            self.rc,
        )
        if int(self.state.goal_idx) >= 0:
            self.success = True
        else:
            self.used_up = True
        return self.success

    def recover_path(self) -> List[Tuple[int, int]]:
        """Parent-chain walk returning image coords
        (`slam/hastar.cpp:216-232`)."""
        if not self.success:
            return []
        parent = np.asarray(self.state.parent)
        k = self.cfg.theta_res
        w = self.shape[1]
        path = []
        idx = int(self.state.goal_idx)
        start_idx = int(np.asarray(self._pose_to_cuboid(self.a.x, self.a.y, self.a.theta)))
        seen = 0
        while idx >= 0 and idx != start_idx and seen <= len(parent):
            cell = idx // k
            path.append((cell // w, cell % w))
            idx = int(parent[idx])
            seen += 1
        path.reverse()
        return path

    def path_cost(self) -> float:
        return float(self.state.goal_cost)
