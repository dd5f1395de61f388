"""Fidelity-mode RBPF (per-particle maps) e2e tests."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.core.config import LidarConfig, MCLConfig, RaycastConfig
from slam_tpu.core.types import Pose
from slam_tpu.models import fake_lidar, rbpf
from slam_tpu.models.simulate import synthetic_room
from slam_tpu.core.types import Odometry
from slam_tpu.ops import motion
from slam_tpu.ops.measurement import sensor_pose
from slam_tpu.utils.metrics import ate_rmse


def test_rbpf_tracks_and_maps():
    h = w = 96
    blocked = jnp.asarray(synthetic_room(h, w))
    cfg = MCLConfig(n_particles=64, meas_stddev=3.0, resample="systematic")
    rc = RaycastConfig(step=1.0, max_dist=50.0, chunk=16)
    lidar = LidarConfig(n_rays=20, max_dist=50.0)

    engine = rbpf.RBPF(cfg, rc, seed=0)
    start = Pose.create(30.0, 30.0, 0.4)
    state = engine.init(start, (h, w))

    key = jax.random.key(1)
    gt = start
    est, gts = [], []
    alphas = (2e-3, 2e-3, 2e-3, 2e-3)
    for t in range(25):
        key, k_gt = jax.random.split(key)
        odom = Odometry.create(0.06, 1.5, 0.06)
        gt = motion.sample_motion_model_odometry(k_gt, odom, gt, jnp.asarray(alphas))
        sp = sensor_pose(gt, cfg.scanner_offset)
        scan = fake_lidar.scan(blocked, sp, lidar, rc)
        state = engine.step(state, odom, scan)
        mp = rbpf.mean_pose(state)
        est.append([float(mp.x), float(mp.y)])
        gts.append([float(gt.x), float(gt.y)])

    ate = ate_rmse(np.asarray(est), np.asarray(gts))
    assert ate < 8.0, ate

    # The best particle's map has learned structure: occupied cells darker
    # than free interior along the trajectory.
    pf = np.asarray(rbpf.best_map_prob_free(state))
    assert pf.min() < 0.3  # some cells confidently occupied
    assert pf.max() > 0.7  # some cells confidently free
    # Map entropy decreased from the all-unknown 0.5 start.
    assert np.abs(pf - 0.5).mean() > 0.01


def test_rbpf_multinomial_mode_runs():
    h = w = 64
    blocked = jnp.asarray(synthetic_room(h, w))
    cfg = MCLConfig(n_particles=16, meas_stddev=3.0, resample="multinomial")
    rc = RaycastConfig(step=1.0, max_dist=40.0, chunk=16)
    lidar = LidarConfig(n_rays=12, max_dist=40.0)
    engine = rbpf.RBPF(cfg, rc, seed=2)
    state = engine.init(Pose.create(32.0, 32.0, 0.0), (h, w))
    scan = fake_lidar.scan(blocked, Pose.create(32.0, 32.0, 0.0), lidar, rc)
    state = engine.step(state, Odometry.create(0.0, 1.0, 0.0), scan)
    assert state.maps.shape == (16, h, w)
    assert int(state.step) == 1
