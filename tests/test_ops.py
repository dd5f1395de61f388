"""Ops-layer tests: motion-model moments, raycast vs the scalar oracle,
measurement-model values, mapping scatter vs the scalar oracle, and
resampling statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.core.config import RaycastConfig
from slam_tpu.core.types import Odometry, Particles, Pose, Scan, Velocity
from slam_tpu.ops import mapping, measurement, motion, raycast, resample

from oracle import mapping_oracle, measurement_model_beam_oracle, raycast_oracle


def make_test_map(h=64, w=64):
    """Free map with a box obstacle and borders."""
    blocked = np.zeros((h, w), bool)
    blocked[0, :] = blocked[-1, :] = True
    blocked[:, 0] = blocked[:, -1] = True
    blocked[20:30, 40:50] = True
    return blocked


class TestMotion:
    def test_odometry_moments(self):
        """Sample moments match the alpha-model (SURVEY section 4 test plan)."""
        key = jax.random.key(0)
        n = 200000
        odom = Odometry.create(0.1, 10.0, -0.05)
        alphas = (0.01, 0.002, 0.005, 0.003)
        pose = Pose.create(np.zeros(n), np.zeros(n), np.zeros(n))
        out = motion.sample_motion_model_odometry(key, odom, pose, alphas)

        # theta = rot1 + rot2 with variances summed.
        var_r1 = alphas[0] * odom.rot1**2 + alphas[1] * odom.trans**2
        var_r2 = alphas[0] * odom.rot2**2 + alphas[1] * odom.trans**2
        th = np.asarray(out.theta)
        assert abs(th.mean() - (0.1 - 0.05)) < 5e-3
        assert abs(th.var() - float(var_r1 + var_r2)) < 5e-3

        # E[x] = E[trans] * E[cos(rot1)] = trans * cos(mu) * exp(-var/2).
        want_x = 10 * np.cos(0.1) * np.exp(-float(var_r1) / 2)
        assert abs(np.asarray(out.x).mean() - want_x) < 0.02

    def test_velocity_model_straight_line(self):
        key = jax.random.key(1)
        pose = Pose.create(np.zeros(1000), np.zeros(1000), np.zeros(1000))
        out = motion.sample_motion_model_velocity(
            key, Velocity.create(2.0, 0.0), pose, 1.0,
            (1e-6, 1e-6, 1e-6, 1e-6, 1e-6, 1e-6),
        )
        # w == 0: straight along +x by v*dt (textbook arc limit).
        assert abs(np.asarray(out.x).mean() - 2.0) < 0.05
        assert abs(np.asarray(out.y).mean()) < 0.05

    def test_inverse_odometry_roundtrip(self):
        prev = Pose.create(3.0, 4.0, 0.3)
        odom = Odometry.create(0.2, 5.0, -0.1)
        key = jax.random.key(2)
        # Zero noise: sampled pose must invert exactly.
        curr = motion.sample_motion_model_odometry(key, odom, prev, (0, 0, 0, 0))
        rec = motion.odometry_from_poses(prev, curr)
        assert float(rec.rot1) == pytest.approx(0.2, abs=1e-5)
        assert float(rec.trans) == pytest.approx(5.0, abs=1e-4)
        assert float(rec.rot2) == pytest.approx(-0.1, abs=1e-5)

    def test_odometry_density_peak(self):
        prev = Pose.create(0.0, 0.0, 0.0)
        odom = Odometry.create(0.1, 5.0, 0.0)
        alphas = (0.01, 0.01, 0.01, 0.01)
        exact = motion.sample_motion_model_odometry(
            jax.random.key(0), odom, prev, (0, 0, 0, 0)
        )
        off = Pose.create(exact.x + 2.0, exact.y, exact.theta)
        p_exact = float(motion.motion_model_odometry_density(odom, prev, exact, alphas))
        p_off = float(motion.motion_model_odometry_density(odom, prev, off, alphas))
        assert p_exact > p_off


class TestRaycast:
    def test_matches_oracle_grid_of_rays(self):
        blocked = make_test_map()
        jb = jnp.asarray(blocked)
        rng = np.random.default_rng(42)
        xs = rng.uniform(5, 35, 40)
        ys = rng.uniform(5, 58, 40)
        thetas = rng.uniform(-np.pi, np.pi, 40)
        dist, hit = raycast.raycast_march(
            jb, xs, ys, thetas, step=0.5, max_dist=60.0, chunk=16
        )
        for n in range(40):
            od, oh = raycast_oracle(blocked, xs[n], ys[n], thetas[n], 0.5, 60.0)
            assert bool(hit[n]) == oh, f"ray {n}"
            assert float(dist[n]) == pytest.approx(od, abs=1e-3), f"ray {n}"

    def test_miss_at_max_dist(self):
        blocked = jnp.zeros((100, 100), bool)
        dist, hit = raycast.raycast_march(
            blocked, 50.0, 50.0, 0.3, step=0.5, max_dist=20.0
        )
        assert not bool(hit)
        assert float(dist) == 20.0

    def test_start_cell_never_hits(self):
        """A ray starting inside an occupied cell must not hit immediately
        (reference's prev_i/prev_j dedup skips the origin cell)."""
        blocked = np.zeros((32, 32), bool)
        blocked[16, 16] = True  # origin cell
        blocked[16, 20] = True
        # origin (16.5, 15.5) -> cell i = 32-15.5-1 = 15.5 -> 15? compute:
        # want origin cell = (16,16): y with i=16 => floor(32-y-1)=16 => y in (15,16].
        dist, hit = raycast.raycast_march(
            jnp.asarray(blocked), 16.5, 15.5, 0.0, step=0.5, max_dist=30.0
        )
        oracle_d, oracle_h = raycast_oracle(blocked, 16.5, 15.5, 0.0, 0.5, 30.0)
        assert bool(hit) == oracle_h
        assert float(dist) == pytest.approx(oracle_d, abs=1e-4)

    def test_hit_points(self):
        blocked = make_test_map()
        dist, hit = raycast.raycast_march(
            jnp.asarray(blocked), 32.0, 32.0, 0.0, step=0.5, max_dist=60.0
        )
        hx, hy = raycast.raycast_hit_points(32.0, 32.0, 0.0, dist, hit)
        assert bool(hit)
        assert float(hy) == pytest.approx(32.0, abs=1e-4)
        # wall of box obstacle at j=40..49 is blocked; i for y=32: 64-32-1=31
        # box is rows 20..29 -> not on this row; right border at j=63.
        assert float(hx) == pytest.approx(float(dist) + 32.0, abs=1e-4)


class TestMeasurement:
    def test_beam_log_weights_values(self):
        for hit, pred, meas in [(True, 10.0, 12.0), (True, 10.0, 60.0), (False, 0.0, 50.0), (False, 0.0, 20.0)]:
            got = float(
                measurement.beam_log_weights(
                    jnp.float32(pred), jnp.asarray(hit), jnp.float32(meas),
                    stddev=5.0, max_dist=50.0, eps=0.1,
                )
            )
            want = np.log(
                measurement_model_beam_oracle(pred, hit, meas, 5.0, 50.0, 0.1)
            )
            assert got == pytest.approx(float(want), rel=1e-5)

    def test_particle_log_weights_ranks_true_pose_highest(self):
        blocked = make_test_map()
        jb = jnp.asarray(blocked)
        true_pose = Pose.create(32.0, 32.0, 0.7)
        angles = jnp.linspace(-np.pi, np.pi, 16, endpoint=False)
        dists, hits = raycast.raycast_march(
            jb, 32.0, 32.0, true_pose.theta + angles, step=0.5, max_dist=60.0
        )
        scan = Scan(angles=angles, dists=jnp.where(hits, dists, 60.0))

        poses = Pose.create(
            jnp.array([32.0, 20.0, 40.0, 10.0]),
            jnp.array([32.0, 40.0, 15.0, 50.0]),
            jnp.array([0.7, 0.7, 0.7, 0.7]),
        )
        lw = measurement.particle_log_weights(
            jb, poses, scan, rc=RaycastConfig(step=0.5, max_dist=60.0), stddev=5.0
        )
        assert int(jnp.argmax(lw)) == 0

    def test_sensor_pose_offset(self):
        # offset (0, 30): d=30, th=pi/2 (slam/mcl.cpp:80-100 decomposition)
        p = Pose.create(100.0, 100.0, 0.0)
        sp = measurement.sensor_pose(p, (0.0, 30.0, 0.0))
        assert float(sp.x) == pytest.approx(100.0, abs=1e-4)
        assert float(sp.y) == pytest.approx(130.0, abs=1e-4)


class TestMapping:
    def test_scan_update_matches_oracle(self):
        h = w = 48
        grid0 = np.zeros((h, w), np.float32)
        pose = Pose.create(24.0, 24.0, 0.5)
        angles = np.array([-0.5, 0.0, 0.8], np.float32)
        dists = np.array([10.0, 15.0, 20.0], np.float32)  # 20 == max (miss)
        scan = Scan(angles=jnp.asarray(angles), dists=jnp.asarray(dists))

        got = mapping.scan_logodds_update(
            jnp.asarray(grid0), pose, scan,
            step=0.5, max_dist=20.0, l_occ=0.85, l_free=-0.4,
            l_min=-6.0, l_max=6.0,
        )

        want = grid0.copy()
        for a, z in zip(angles, dists):
            mapping_oracle(
                want, 24.0, 24.0, 0.5 + a, z, 0.5, 20.0, 0.85, -0.4, -6.0, 6.0
            )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_fidelity_update_marks_endpoint(self):
        h = w = 40
        maps = jnp.full((2, h, w), 128, jnp.uint8)
        poses = Pose.create(
            jnp.array([20.0, 20.0]), jnp.array([20.0, 20.0]), jnp.array([0.0, 0.0])
        )
        scan = Scan(angles=jnp.array([0.0]), dists=jnp.array([8.0]))
        lw, new_maps = mapping.fidelity_measurement_and_mapping(
            maps, poses, scan, stddev=2.0, max_dist=15.0, step=0.5
        )
        nm = np.asarray(new_maps)
        # Cells along +x direction before endpoint got the free update
        # (128 * 1.2 = 153), endpoint cell the occupied one (128 * 0.8 = 102).
        assert (nm[0] == 153).sum() > 0
        assert (nm == 102).sum() == 2  # one endpoint per particle
        np.testing.assert_array_equal(nm[0], nm[1])
        assert np.asarray(lw).shape == (2,)


class TestResample:
    def test_systematic_proportionality(self):
        # Low-variance guarantee: every particle is selected either
        # floor(N*w) or ceil(N*w) times.
        key = jax.random.key(0)
        n = 1000
        w = np.random.default_rng(7).exponential(size=n)
        w /= w.sum()
        idx = resample.systematic_indices(key, jnp.log(w))
        counts = np.bincount(np.asarray(idx), minlength=n)
        assert np.all(np.abs(counts - n * w) <= 1.0)

    def test_multinomial_proportionality(self):
        key = jax.random.key(3)
        log_w = jnp.log(jnp.tile(jnp.array([0.7, 0.1, 0.1, 0.1]), 500))
        idx = resample.multinomial_indices(key, log_w)
        counts = np.bincount(np.asarray(idx) % 4, minlength=4)
        np.testing.assert_allclose(counts / counts.sum(), [0.7, 0.1, 0.1, 0.1], atol=0.03)

    def test_ess(self):
        uniform = jnp.zeros(100)
        assert float(resample.effective_sample_size(uniform)) == pytest.approx(100.0)
        degenerate = jnp.log(jnp.concatenate([jnp.ones(1), jnp.full((99,), 1e-30)]))
        assert float(resample.effective_sample_size(degenerate)) == pytest.approx(1.0, rel=1e-3)

    def test_resample_resets_weights(self):
        key = jax.random.key(1)
        p = Particles.uniform_at(Pose.create(1.0, 2.0, 0.0), 16)
        p = p.replace(log_weight=jnp.linspace(-3, 0, 16))
        out = resample.resample(key, p)
        np.testing.assert_allclose(
            np.exp(np.asarray(out.log_weight)), 1 / 16, rtol=1e-5
        )

    def test_adaptive_injection(self):
        key = jax.random.key(2)
        blocked = jnp.zeros((32, 32), bool).at[:, :16].set(True)
        p = Particles.uniform_at(Pose.create(20.0, 20.0, 0.0), 2000)
        out = resample.inject_random_particles(key, p, blocked, 0.5)
        moved = np.asarray(out.pose.x != 20.0)
        # ~50% replacement * ~50% free acceptance ~= 25%
        assert 0.15 < moved.mean() < 0.35
        # injected particles only on the free half (x >= 16)
        assert np.all(np.asarray(out.pose.x)[moved] >= 16.0)

    def test_w_averages(self):
        ws, wf = resample.update_w_averages(jnp.log(jnp.full((10,), 0.5)), 1.0, 1.0)
        assert float(ws) == pytest.approx(1.0 - 0.1 * 0.5)
        assert float(wf) == pytest.approx(1.0 - 0.9 * 0.5)
        assert float(resample.injection_ratio(1.0, 0.5)) == pytest.approx(0.5)
        assert float(resample.injection_ratio(1.0, 2.0)) == 0.0


class TestProbabilisticBeamModel:
    def test_matches_notebook_oracle(self, rng):
        """Oracle: direct numpy port of notebook cell 10's
        measurement_model_beam_probabilistic."""
        import math as m

        h = w = 40
        prob_occ = rng.random((h, w)).astype(np.float32) * 0.9
        step = 0.5
        stddev = 2.0
        max_dist = 25.0

        def pdf(s, x):
            return float(np.exp(-0.5 * (x / s) ** 2) / (s * np.sqrt(2 * np.pi)))

        def pdf_clamp(s, x):
            return pdf(s, x) if abs(x) <= 4 * s else 0.0

        def oracle(x, y, theta, z):
            dx, dy = m.cos(theta), m.sin(theta)
            p = 1.0
            best = pdf(stddev, 1.5 * stddev)
            i_, j_ = int(np.floor(h - y - 1)), int(np.floor(x))
            k = 0
            while True:
                k += 1
                d = k * step
                if d >= max_dist:
                    best = max(best, p * pdf_clamp(stddev, z - max_dist))
                    break
                px, py = x + dx * d, y + dy * d
                i, j = int(np.floor(h - py - 1)), int(np.floor(px))
                if not (0 <= i < h and 0 <= j < w):
                    break
                if (i, j) != (i_, j_):
                    q = p * prob_occ[i, j] * pdf_clamp(stddev, z - d)
                    best = max(best, q)
                    p *= 1 - q
                    i_, j_ = i, j
            return best

        poses = Pose.create(
            jnp.array([20.0, 10.0]), jnp.array([20.0, 12.0]), jnp.array([0.3, 2.0])
        )
        scan = Scan(
            angles=jnp.array([0.0, 0.7], jnp.float32),
            dists=jnp.array([8.0, 25.0], jnp.float32),
        )
        got = np.asarray(
            measurement.beam_weights_probabilistic(
                jnp.asarray(prob_occ), poses, scan,
                stddev=stddev, max_dist=max_dist, step=step,
            )
        )
        for n in range(2):
            for b in range(2):
                x = float(poses.x[n]); y = float(poses.y[n])
                th = float(poses.theta[n]) + float(scan.angles[b])
                want = oracle(x, y, th, float(scan.dists[b]))
                assert got[n, b] == pytest.approx(want, rel=1e-4, abs=1e-8), (n, b)


class TestLFTable:
    """Correlative likelihood-field table (`measurement.lf_score_table` /
    `particle_log_weights_lf_table`) vs the direct per-beam model."""

    def _fixture(self):
        from slam_tpu.models.simulate import synthetic_room
        from slam_tpu.ops import edt as edtlib
        from slam_tpu.ops.rayfield import RayField

        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        rc = RaycastConfig(step=1.0, max_dist=50.0, backend="sdf")
        field = RayField(blocked=blocked, edt=edtlib.edt_jfa(blocked))
        b = 24
        angles = (
            jnp.linspace(0.0, 2.0 * np.pi, b, endpoint=False) + 0.0123
        ).astype(jnp.float32)
        dists = jnp.asarray(
            np.random.RandomState(0).uniform(3, 49, b), jnp.float32
        )
        # One max-range beam: must be excluded by both paths.
        dists = dists.at[3].set(rc.max_dist)
        return field, rc, Scan(angles=angles, dists=dists)

    def test_snapped_poses_match_direct_model_exactly(self):
        """Sensor at a cell center + heading on a bin center -> the table
        entry IS the direct model's score (same floor arithmetic)."""
        field, rc, scan = self._fixture()
        h, w = field.edt.shape
        rs = np.random.RandomState(1)
        n = 40
        i0 = rs.randint(5, h - 5, n)
        j0 = rs.randint(5, w - 5, n)
        th = rs.uniform(-np.pi, np.pi, n).astype(np.float32)
        poses = Pose(
            x=jnp.asarray(j0 + 0.5, jnp.float32),
            y=jnp.asarray(h - 1 - i0 - 0.5, jnp.float32),
            theta=jnp.asarray(th),
        )
        direct = measurement.particle_log_weights_likelihood_field(
            field, poses, scan, rc=rc, stddev=4.0
        )
        table = measurement.lf_score_table(
            field.edt, scan, jnp.asarray(th), rc=rc,
            stddev=4.0, z_hit=0.95, z_rand=0.05,
        )
        got = table[jnp.arange(n), jnp.asarray(i0), jnp.asarray(j0)]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(direct), rtol=0, atol=1e-3
        )

    def test_full_path_tracks_direct_model(self):
        """Arbitrary (converged-cloud) poses: windowed table weights agree
        with the direct model up to the documented <=1-cell endpoint
        quantization (high rank correlation, bounded mean deviation)."""
        field, rc, scan = self._fixture()
        h, w = field.edt.shape
        rs = np.random.RandomState(2)
        n = 500
        poses = Pose(
            x=jnp.asarray(rs.uniform(5, w - 5, n), jnp.float32),
            y=jnp.asarray(rs.uniform(5, h - 5, n), jnp.float32),
            theta=jnp.asarray(0.3 + 0.02 * rs.randn(n), jnp.float32),
        )
        lw_t = measurement.particle_log_weights_lf_table(
            field, poses, scan, rc=rc, stddev=4.0
        )
        lw_d = measurement.particle_log_weights_likelihood_field(
            field, poses, scan, rc=rc, stddev=4.0
        )
        d = np.asarray(lw_t) - np.asarray(lw_d)
        assert np.abs(d).mean() < 1.5, f"mean |dlw| {np.abs(d).mean()}"
        corr = np.corrcoef(np.asarray(lw_t), np.asarray(lw_d))[0, 1]
        assert corr > 0.97, f"corr {corr}"

    def test_rejects_missing_edt_and_bad_bins(self):
        from slam_tpu.ops.rayfield import RayField

        field, rc, scan = self._fixture()
        poses = Pose.create(10.0, 10.0, 0.0)
        with pytest.raises(ValueError, match="edt"):
            measurement.particle_log_weights_lf_table(
                RayField(blocked=field.blocked), poses, scan, rc=rc
            )
        with pytest.raises(ValueError, match="table_bins"):
            measurement.particle_log_weights_lf_table(
                field, poses, scan, rc=rc, table_bins=1
            )

    def test_box_build_matches_dense_in_box_and_floors_outliers(self):
        """`box_size` (the spatial analog of the heading window): in-box
        particles score EXACTLY the dense-build value, out-of-box particles
        take the z_rand floor, and a box covering the whole map reproduces
        the dense path bit-for-bit."""
        field, rc, scan = self._fixture()
        h, w = field.edt.shape
        rs = np.random.RandomState(3)
        n = 200
        # Converged cloud near (x=30, y=40) + one far outlier at index 0.
        x = 30.0 + 1.5 * rs.randn(n)
        y = 40.0 + 1.5 * rs.randn(n)
        x[0], y[0] = w - 8.0, h - 8.0
        poses = Pose(
            x=jnp.asarray(x, jnp.float32),
            y=jnp.asarray(y, jnp.float32),
            theta=jnp.asarray(0.3 + 0.02 * rs.randn(n), jnp.float32),
        )
        kw = dict(rc=rc, stddev=4.0, table_bins=12)
        dense = np.asarray(
            measurement.particle_log_weights_lf_table(field, poses, scan, **kw)
        )
        box = np.asarray(
            measurement.particle_log_weights_lf_table(
                field, poses, scan, box_size=32, **kw
            )
        )
        np.testing.assert_array_equal(box[1:], dense[1:])
        n_valid = float(np.sum(np.asarray(scan.dists) < rc.max_dist))
        floor = n_valid * np.log(0.05 / rc.max_dist)
        assert box[0] == pytest.approx(floor, rel=1e-6)
        whole = np.asarray(
            measurement.particle_log_weights_lf_table(
                field, poses, scan, box_size=max(h, w), **kw
            )
        )
        np.testing.assert_array_equal(whole, dense)
