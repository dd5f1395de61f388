"""Planner acceptance tests.

Parity with the reference is on path cost/feasibility, not node-for-node
expansion order (the batched reformulations expand differently by design —
SURVEY.md section 7). A* is checked against an exact numpy Dijkstra oracle;
Hybrid A* and RRT* paths are checked for feasibility and sane cost on maps
with known topology.
"""

import dataclasses
import heapq
import math

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.core.config import HybridAStarConfig, RRTStarConfig, RaycastConfig
from slam_tpu.core.types import Pose
from slam_tpu.models.simulate import synthetic_room
from slam_tpu.ops import spatial
from slam_tpu.planners import AStar, HybridAStar, RRTStar

SQRT2 = math.sqrt(2.0)


def dijkstra_oracle(free: np.ndarray, start):
    """Exact 8-connected distance field (heapq)."""
    h, w = free.shape
    dist = np.full((h, w), np.inf)
    if not free[start]:
        return dist
    dist[start] = 0.0
    q = [(0.0, start)]
    while q:
        d, (i, j) = heapq.heappop(q)
        if d > dist[i, j]:
            continue
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                ni, nj = i + di, j + dj
                if 0 <= ni < h and 0 <= nj < w and free[ni, nj]:
                    nd = d + (SQRT2 if di and dj else 1.0)
                    if nd < dist[ni, nj]:
                        dist[ni, nj] = nd
                        heapq.heappush(q, (nd, (ni, nj)))
    return dist


def wall_map(h=48, w=48, gap=(20, 26)):
    """Free grid with a vertical wall at w//2, open between gap rows."""
    free = np.ones((h, w), bool)
    free[:, w // 2] = False
    free[gap[0] : gap[1], w // 2] = True
    return free


class TestAStar:
    def test_distance_field_matches_dijkstra(self, rng):
        free = rng.random((40, 40)) > 0.25
        free[5, 5] = True
        planner = AStar(jnp.asarray(free), (5, 5), (34, 30))
        planner.solve()
        want = dijkstra_oracle(free, (5, 5))
        got = np.asarray(planner.dist)
        finite = np.isfinite(want)
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-5)
        assert np.all(got[~finite] >= 1e29)

    def test_path_routes_through_gap(self):
        free = wall_map()
        p = AStar(jnp.asarray(free), (10, 10), (10, 40))
        assert p.solve()
        path = p.recover_path()
        assert path[0] == (10, 10) and path[-1] == (10, 40)
        crossings = [ij for ij in path if ij[1] == 24]
        assert all(20 <= i < 26 for i, _ in crossings)
        # Every step is to an 8-neighbor through free space.
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            assert max(abs(i0 - i1), abs(j0 - j1)) == 1
            assert free[i1, j1]

    def test_unreachable(self):
        free = np.ones((32, 32), bool)
        free[:, 16] = False  # solid wall
        p = AStar(jnp.asarray(free), (5, 5), (5, 25))
        assert not p.solve()
        assert p.recover_path() == []

    def test_incremental_pathfind_api(self):
        free = wall_map()
        p = AStar(jnp.asarray(free), (10, 10), (10, 40))
        n = 0
        while not p.pathfind(rounds=8):
            n += 1
            assert n < 100
        assert p.success


class TestHybridAStar:
    CFG = HybridAStarConfig(
        velocity=4.0,
        length=4.0 / math.tan(40 * math.pi / 180) * 2,
        theta_res=8,
        branching_factor=3,
        tol=4.0,
        batch=64,
    )

    def test_open_map_reaches_goal(self):
        free = np.ones((64, 64), bool)
        a = Pose.create(10.0, 10.0, 0.0)
        b = Pose.create(50.0, 50.0, 0.0)
        p = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert p.solve(max_rounds=200)
        # Goal pop is within tolerance of B.
        gi = int(p.state.goal_idx)
        gx, gy = float(p.state.px[gi]), float(p.state.py[gi])
        assert math.hypot(gx - 50.0, gy - 50.0) <= self.CFG.tol
        # Cost at least the straight-line lower bound (v per ~v of arc).
        assert p.path_cost() >= math.hypot(40, 40) - self.CFG.tol * 2
        path = p.recover_path()
        assert len(path) >= 5

    def test_wall_gap(self):
        free = wall_map(64, 64, gap=(28, 38))
        a = Pose.create(10.0, 32.0, 0.0)
        b = Pose.create(54.0, 32.0, 0.0)
        p = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert p.solve(max_rounds=400)
        path = p.recover_path()
        # Crossing column 32 must happen inside the gap rows.
        for i, j in path:
            if j == 32:
                assert 28 <= i < 38

    def test_unreachable(self):
        free = np.ones((48, 48), bool)
        free[:, 24] = False
        a = Pose.create(8.0, 24.0, 0.0)
        b = Pose.create(40.0, 24.0, 0.0)
        p = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert not p.solve(max_rounds=300)


class TestHybridAStarLattice:
    """Lattice mode (cell-center states, precomputed feasibility rolls, no
    raycasts) must find comparable-cost feasible paths."""

    # Bin width must not exceed ~the per-edge heading change (20 deg for
    # this vehicle), or lattice headings can never accumulate a turn.
    CFG = dataclasses.replace(TestHybridAStar.CFG, mode="lattice", theta_res=12)

    def test_rejects_too_coarse_theta_res(self):
        free = np.ones((32, 32), bool)
        bad = dataclasses.replace(self.CFG, theta_res=4)
        with pytest.raises(ValueError, match="lattice"):
            HybridAStar(
                jnp.asarray(free),
                Pose.create(5.0, 5.0, 0.0),
                Pose.create(25.0, 25.0, 0.0),
                bad,
            )

    def test_open_map_reaches_goal_and_cost_parity(self):
        free = np.ones((64, 64), bool)
        a = Pose.create(10.0, 10.0, 0.0)
        b = Pose.create(50.0, 50.0, 0.0)
        p = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert p.solve(max_rounds=200)
        assert len(p.recover_path()) >= 5
        ref = HybridAStar(jnp.asarray(free), a, b, TestHybridAStar.CFG)
        assert ref.solve(max_rounds=200)
        # Within a few edge costs of the continuous-mode path.
        assert abs(p.path_cost() - ref.path_cost()) <= 3 * self.CFG.velocity

    def test_wall_gap(self):
        free = wall_map(64, 64, gap=(28, 38))
        a = Pose.create(10.0, 32.0, 0.0)
        b = Pose.create(54.0, 32.0, 0.0)
        p = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert p.solve(max_rounds=400)
        for i, j in p.recover_path():
            if j == 32:
                assert 28 <= i < 38

    def test_unreachable(self):
        free = np.ones((48, 48), bool)
        free[:, 24] = False
        a = Pose.create(8.0, 24.0, 0.0)
        b = Pose.create(40.0, 24.0, 0.0)
        p = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert not p.solve(max_rounds=300)

    def test_fused_solve_matches_incremental_pathfind(self):
        """solve() (single fused dispatch, lazy init) and the pathfind()
        animation driver run the same rounds — identical cost and path."""
        free = wall_map(64, 64, gap=(28, 38))
        a = Pose.create(10.0, 32.0, 0.0)
        b = Pose.create(54.0, 32.0, 0.0)
        for cfg in (self.CFG, TestHybridAStar.CFG):  # lattice + continuous
            p = HybridAStar(jnp.asarray(free), a, b, cfg)
            assert p.solve(max_rounds=400)
            cost_s, path_s = p.path_cost(), p.recover_path()
            p.reset_query(a, b)
            n = 0
            while not p.pathfind():
                n += 1
                assert n < 500
            assert p.success
            assert abs(p.path_cost() - cost_s) < 1e-3
            assert p.recover_path() == path_s

    def test_depth2_macro_edges_cost_parity(self):
        """lattice_depth=2 (two-edge macro successors) must find the same
        routes: every macro commit has its intermediate committed via a
        depth-1 lane, so paths and costs stay comparable."""
        free = wall_map(64, 64, gap=(28, 38))
        a = Pose.create(10.0, 32.0, 0.0)
        b = Pose.create(54.0, 32.0, 0.0)
        cfg2 = dataclasses.replace(self.CFG, lattice_depth=2)
        p = HybridAStar(jnp.asarray(free), a, b, cfg2)
        assert p.solve(max_rounds=400)
        path = p.recover_path()
        assert len(path) >= 5
        for i, j in path:
            if j == 32:
                assert 28 <= i < 38
        ref = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert ref.solve(max_rounds=400)
        assert abs(p.path_cost() - ref.path_cost()) <= 3 * self.CFG.velocity

    def test_reps_macro_lanes_exact_cost_fewer_rounds(self):
        """lattice_reps adds same-steer repetition lanes (straight runs /
        constant arcs). Reachable costs are EXACTLY unchanged — every
        prefix is also a lane and single-edge costs are quantized before
        composition — while corridors resolve in fewer rounds."""
        free = wall_map(64, 64, gap=(28, 38))
        a = Pose.create(10.0, 32.0, 0.0)
        b = Pose.create(54.0, 32.0, 0.0)

        def run(cfg):
            p = HybridAStar(jnp.asarray(free), a, b, cfg)
            n = 0
            while not p.pathfind():
                n += 1
                assert n < 500
            assert p.success
            return n, p.path_cost(), p.recover_path()

        n1, c1, _ = run(self.CFG)
        cfg3 = dataclasses.replace(self.CFG, lattice_reps=3)
        n3, c3, path3 = run(cfg3)
        assert abs(c3 - c1) < 1e-3
        assert n3 < n1
        for i, j in path3:
            if j == 32:
                assert 28 <= i < 38
        # Fused solve agrees with the incremental driver on macro lanes.
        p = HybridAStar(jnp.asarray(free), a, b, cfg3)
        assert p.solve(max_rounds=400)
        assert abs(p.path_cost() - c3) < 1e-3

    def test_open_ring_overflow_detected(self):
        """A deliberately tiny open ring must count overwritten live
        entries (n_lost) — exhaustion is then not proof of
        unreachability; a sane capacity loses nothing on the same map."""
        free = np.ones((64, 64), bool)
        a = Pose.create(10.0, 10.0, 0.0)
        b = Pose.create(50.0, 50.0, 0.0)
        tiny = dataclasses.replace(self.CFG, open_capacity=64, batch=16)
        p = HybridAStar(jnp.asarray(free), a, b, tiny)
        p.solve(max_rounds=400)
        assert int(p.state.n_lost) > 0
        p2 = HybridAStar(jnp.asarray(free), a, b, self.CFG)
        assert p2.solve(max_rounds=200)
        assert int(p2.state.n_lost) == 0

    def test_weighted_heuristic_bounded_suboptimality(self):
        """heuristic_weight > 1 (weighted A*) still reaches the goal with
        cost within the inflation bound, in no more rounds."""
        free = wall_map(64, 64, gap=(28, 38))
        a = Pose.create(10.0, 32.0, 0.0)
        b = Pose.create(54.0, 32.0, 0.0)

        def run(cfg):
            p = HybridAStar(jnp.asarray(free), a, b, cfg)
            n = 0
            while not p.pathfind():
                n += 1
                assert n < 500
            assert p.success
            return n, p.path_cost()

        for base in (self.CFG, TestHybridAStar.CFG):  # lattice + continuous
            n1, c1 = run(base)
            nw, cw = run(dataclasses.replace(base, heuristic_weight=1.5))
            assert cw <= 1.5 * c1 + 1e-3
            assert nw <= n1

    def test_solve_many_matches_single(self):
        free = wall_map(64, 64, gap=(28, 38))
        queries = [
            (Pose.create(10.0, 32.0, 0.0), Pose.create(54.0, 32.0, 0.0)),
            (Pose.create(10.0, 10.0, 0.0), Pose.create(50.0, 50.0, 0.0)),
            (Pose.create(54.0, 10.0, 0.0), Pose.create(10.0, 50.0, 0.0)),
        ]
        p = HybridAStar(jnp.asarray(free), queries[0][0], queries[0][1], self.CFG)
        fleet = p.solve_many(queries, max_rounds=400)
        fleet_paths = [p.recover_path_for(q) for q in range(len(queries))]
        for q, ((a, b), (ok, cost)) in enumerate(zip(queries, fleet)):
            p.reset_query(a, b)
            assert p.solve(max_rounds=400) == ok
            if ok:
                assert abs(cost - p.path_cost()) < 1e-3
                path = fleet_paths[q]
                assert len(path) >= 3
                # Fleet path ends one edge from the query start cell.
                si = int(free.shape[0] - float(a.y) - 1)
                sj = int(float(a.x))
                assert abs(path[0][0] - si) + abs(path[0][1] - sj) <= 2 * int(
                    self.CFG.velocity
                )
                for i, j in path:
                    if j == 32:
                        assert 28 <= i < 38

    def test_solve_many_multi_axis_mesh_divisor(self):
        """Round-5 advisor fix: on a multi-axis mesh (('p','b') = 4x2),
        NamedSharding(mesh, P('p')) shards the query axis by
        mesh.shape['p'] = 4 only — the divisibility pre-check must accept
        Q=4 (it used to gate on the 8-device total and reject it)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        mesh = Mesh(np.array(devs[:8]).reshape(4, 2), ("p", "b"))
        free = wall_map(64, 64, gap=(28, 38))
        queries = [
            (Pose.create(10.0, 10.0 + 6.0 * q, 0.0),
             Pose.create(54.0, 32.0, 0.0))
            for q in range(4)
        ]
        p = HybridAStar(
            jnp.asarray(free), queries[0][0], queries[0][1], self.CFG
        )
        fleet = p.solve_many(
            queries, max_rounds=400,
            query_sharding=NamedSharding(mesh, P("p")),
        )
        assert len(fleet) == 4
        for (a, b), (ok, cost) in zip(queries, fleet):
            p.reset_query(a, b)
            assert p.solve(max_rounds=400) == ok
            if ok:
                assert abs(cost - p.path_cost()) < 1e-3


class TestRRTStar:
    CFG = RRTStarConfig(reach=6.0, radius=12.0, max_nodes=2048, batch=64)

    def test_open_map_connects_and_path_is_feasible(self):
        free = np.ones((64, 64), bool)
        p = RRTStar(jnp.asarray(free), (10.0, 10.0), (52.0, 50.0), self.CFG, seed=7)
        assert p.solve(max_rounds=60)
        path = p.recover_path()
        assert path[0] == (52.0, 50.0)
        ax, ay = path[-1]
        assert math.hypot(ax - 10.0, ay - 10.0) < 1e-3
        # Segments bounded by the rewire radius (choose-parent may connect
        # any in-radius neighbor), cost near-optimal-ish.
        for (x0, y0), (x1, y1) in zip(path, path[1:]):
            assert math.hypot(x1 - x0, y1 - y0) <= self.CFG.radius + 1e-3
        opt = math.hypot(42, 40)
        assert opt <= p.path_cost() <= 2.2 * opt

    def test_wall_gap_feasible(self):
        free = wall_map(64, 64, gap=(26, 40))
        p = RRTStar(jnp.asarray(free), (12.0, 32.0), (52.0, 32.0), self.CFG, seed=3)
        assert p.solve(max_rounds=120)
        path = p.recover_path()
        # No segment crosses the wall outside the gap (wall at col 32 ->
        # world x in [32, 33); gap rows 26..39 -> world y in (24, 38]).
        for (x0, y0), (x1, y1) in zip(path, path[1:]):
            if (x0 - 32.5) * (x1 - 32.5) < 0:  # crosses the wall column
                t = (32.5 - x0) / (x1 - x0)
                ycross = y0 + t * (y1 - y0)
                assert 24.0 < ycross < 39.0

    def test_node_budget_latch(self):
        free = np.zeros((32, 32), bool)  # fully blocked: no node ever lands
        free[10:13, 10:13] = True
        cfg = RRTStarConfig(reach=4.0, radius=8.0, max_nodes=128, batch=32)
        p = RRTStar(jnp.asarray(free), (11.0, 20.0), (30.0, 30.0), cfg, seed=0)
        assert not p.solve(max_rounds=30)


class TestSpatialOracles:
    def test_nn_matches_brute_force(self, rng):
        n, q = 512, 64
        px, py = rng.random(n) * 100, rng.random(n) * 100
        valid = rng.random(n) > 0.3
        qx, qy = rng.random(q) * 100, rng.random(q) * 100
        idx, dist = spatial.nearest_neighbor(
            jnp.asarray(px, jnp.float32),
            jnp.asarray(py, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(qx, jnp.float32),
            jnp.asarray(qy, jnp.float32),
        )
        d2 = (px[None] - qx[:, None]) ** 2 + (py[None] - qy[:, None]) ** 2
        d2[:, ~valid] = np.inf
        want = np.argmin(d2, 1)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_allclose(
            np.asarray(dist), np.sqrt(d2[np.arange(q), want]), rtol=1e-4
        )

    def test_nn_blocked_matches_plain(self, rng):
        n, q = 1000, 32
        px, py = rng.random(n) * 50, rng.random(n) * 50
        valid = rng.random(n) > 0.5
        qx, qy = rng.random(q) * 50, rng.random(q) * 50
        args = [
            jnp.asarray(px, jnp.float32),
            jnp.asarray(py, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(qx, jnp.float32),
            jnp.asarray(qy, jnp.float32),
        ]
        i0, d0 = spatial.nearest_neighbor(*args)
        i1, d1 = spatial.nearest_neighbor_blocked(*args, block=128)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5)

    def test_range_query_matches_brute_force(self, rng):
        n, q = 256, 16
        px, py = rng.random(n) * 100, rng.random(n) * 100
        valid = rng.random(n) > 0.2
        boxes = np.sort(rng.random((q, 2, 2)) * 100, axis=1)  # x0<x1, y0<y1
        boxes = np.stack(
            [boxes[:, 0, 0], boxes[:, 0, 1], boxes[:, 1, 0], boxes[:, 1, 1]], 1
        )
        got = np.asarray(
            spatial.range_query_boxes(
                jnp.asarray(px, jnp.float32),
                jnp.asarray(py, jnp.float32),
                jnp.asarray(valid),
                jnp.asarray(boxes, jnp.float32),
            )
        )
        for k in range(q):
            x0, y0, x1, y1 = boxes[k]
            want = valid & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            np.testing.assert_array_equal(got[k], want)


def test_lattice_chain_walk_chunked_continuation():
    """Round-5 review fix: the device-side parent-chain walk must CONTINUE
    across chunks when a path outruns one buffer (it used to truncate
    silently). Shrinking the chunk to 4 forces many continuations; the
    recovered path must equal the single-chunk walk exactly."""
    free = wall_map(64, 64, gap=(28, 38))
    a = Pose.create(10.0, 32.0, 0.0)
    b = Pose.create(54.0, 32.0, 0.0)
    cfg = TestHybridAStarLattice.CFG
    p = HybridAStar(jnp.asarray(free), a, b, cfg)
    assert p.solve(max_rounds=600)
    full = p.recover_path()
    assert len(full) > 8
    p._chain_chunk = 4
    chunked = p.recover_path()
    assert chunked == full
