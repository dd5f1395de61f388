"""Unit tests for core types, grid transforms, and distributions against
closed-form expectations (the test pyramid SURVEY.md section 4 prescribes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sstats

from slam_tpu.core import grid, stats
from slam_tpu.core.types import Odometry, Particles, Pose


class TestGrid:
    def test_world_to_cell_matches_reference_convention(self):
        # Reference: i = int(rows - y - 1), j = int(x)  (slam/util.h:30-38)
        shape = (100, 50)
        i, j = grid.world_to_cell(shape, jnp.array(3.7), jnp.array(10.2))
        # rows - y - 1 = 100 - 10.2 - 1 = 88.8 -> 88 ; x = 3.7 -> 3
        assert int(i) == 88 and int(j) == 3

    def test_roundtrip(self):
        shape = (100, 50)
        x, y = grid.cell_to_world(shape, jnp.array(20), jnp.array(30))
        assert float(x) == 30.0 and float(y) == 80.0
        i, j = grid.world_to_cell(shape, x, y)
        # Reference roundtrip: i = 100 - 80 - 1 = 19 (one-off inherent to the
        # reference's own convention: util.h:40-43 inverts with rows - i).
        assert int(i) == 19 and int(j) == 30

    def test_in_bounds(self):
        shape = (10, 20)
        assert bool(grid.in_bounds(shape, jnp.array(0), jnp.array(0)))
        assert bool(grid.in_bounds(shape, jnp.array(9), jnp.array(19)))
        assert not bool(grid.in_bounds(shape, jnp.array(-1), jnp.array(0)))
        assert not bool(grid.in_bounds(shape, jnp.array(10), jnp.array(0)))
        assert not bool(grid.in_bounds(shape, jnp.array(0), jnp.array(20)))

    def test_log_odds_roundtrip(self):
        p = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            grid.log_odds_inv(grid.log_odds(p)), p, atol=1e-6
        )

    def test_blocked_conventions(self):
        l = jnp.array([[-1.0, 0.0, 1.0]])
        np.testing.assert_array_equal(
            grid.blocked_from_logodds(l), [[False, False, True]]
        )
        u8 = jnp.array([[0, 127, 128, 255]], jnp.uint8)
        np.testing.assert_array_equal(
            grid.blocked_from_u8(u8), [[True, True, False, False]]
        )
        b = jnp.array([[0, 1]], jnp.int32)
        np.testing.assert_array_equal(
            grid.blocked_from_binary(b), [[True, False]]
        )


class TestStats:
    def test_pdf_normal_matches_scipy(self):
        x = np.linspace(-20, 20, 41)
        got = np.asarray(stats.pdf_normal(5.0, jnp.array(x)))
        np.testing.assert_allclose(got, sstats.norm.pdf(x, scale=5.0), rtol=1e-5)

    def test_pdf_normal_clamp(self):
        assert float(stats.pdf_normal_clamp(1.0, 4.1)) == 0.0
        assert float(stats.pdf_normal_clamp(1.0, 3.9)) > 0.0

    def test_pdf_triangular_properties(self):
        # Peak at 0, zero beyond sqrt(6)*stddev (slam/util.cpp:21-25).
        s = 2.0
        assert float(stats.pdf_triangular(s, 0.0)) == pytest.approx(
            1.0 / np.sqrt(6 * s * s)
        )
        assert float(stats.pdf_triangular(s, np.sqrt(6) * s + 0.1)) == 0.0

    def test_sample_normal_moments(self):
        key = jax.random.key(0)
        x = np.asarray(stats.sample_normal(key, 3.0, (200000,)))
        assert abs(x.mean()) < 0.05
        assert abs(x.std() - 3.0) < 0.05

    def test_sample_triangular_moments(self):
        # Var = 6/4 * var_u + var_u where var_u = stddev^2/3  => stddev^2 * 5/6
        key = jax.random.key(1)
        s = 2.0
        x = np.asarray(stats.sample_triangular(key, s, (200000,)))
        assert abs(x.mean()) < 0.05
        assert abs(x.var() - s * s * 5.0 / 6.0) < 0.1

    def test_normalize_angle(self):
        a = jnp.array([0.0, np.pi / 2, 3 * np.pi, -3 * np.pi / 2, 2 * np.pi])
        out = np.asarray(stats.normalize_angle(a))
        # All equivalent mod 2pi and within [-pi, pi)
        np.testing.assert_allclose(np.cos(out), np.cos(np.asarray(a)), atol=1e-6)
        np.testing.assert_allclose(np.sin(out), np.sin(np.asarray(a)), atol=1e-6)
        assert np.all(out >= -np.pi) and np.all(out < np.pi)

    def test_average_pose_circular_mean(self):
        # Headings around +-pi must average to pi, not 0 (slam/util.cpp:66-85).
        theta = jnp.array([np.pi - 0.1, -np.pi + 0.1])
        x = jnp.array([1.0, 3.0])
        y = jnp.array([2.0, 4.0])
        ax, ay, at = stats.average_pose(x, y, theta)
        assert float(ax) == pytest.approx(2.0)
        assert float(ay) == pytest.approx(3.0)
        assert abs(abs(float(at)) - np.pi) < 1e-5


class TestTypes:
    def test_particles_uniform_at(self):
        p = Particles.uniform_at(Pose.create(5.0, 6.0, 0.5), 8)
        assert p.n == 8
        np.testing.assert_allclose(p.pose.x, 5.0)
        np.testing.assert_allclose(
            np.exp(p.log_weight), np.full(8, 1 / 8), rtol=1e-6
        )

    def test_pytree_roundtrip(self):
        p = Particles.uniform_at(Pose.create(0.0, 0.0, 0.0), 4)
        leaves, treedef = jax.tree.flatten(p)
        p2 = jax.tree.unflatten(treedef, leaves)
        assert p2.n == 4

    def test_odometry(self):
        o = Odometry.create(0.1, 2.5, -0.1)
        assert float(o.trans) == pytest.approx(2.5)
