"""Multi-robot MCL fleet: vmapped filters must match independent runs."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.core.config import LidarConfig, MCLConfig, RaycastConfig
from slam_tpu.core.types import Odometry, Pose
from slam_tpu.models import fake_lidar, fleet, mcl as mcl_mod
from slam_tpu.models.simulate import synthetic_room
from slam_tpu.ops import rayfield
from slam_tpu.ops.measurement import sensor_pose


def test_fleet_matches_independent_filters():
    h = w = 96
    blocked = jnp.asarray(synthetic_room(h, w))
    rc = RaycastConfig(step=1.0, max_dist=60.0, backend="sdf")
    lidar = LidarConfig(n_rays=24, max_dist=60.0)
    cfg = MCLConfig(n_particles=128, meas_stddev=3.0)
    field = rayfield.make_ray_field(blocked, rc)
    alphas = jnp.asarray((1e-3, 1e-3, 5e-3, 5e-3))

    r = 3
    starts = [
        Pose.create(30.0, 30.0, 0.3),
        Pose.create(60.0, 40.0, 2.0),
        Pose.create(45.0, 60.0, -1.2),
    ]
    odom = Odometry.create(0.05, 1.5, 0.05)
    scans = [
        fake_lidar.scan(blocked, sensor_pose(p, cfg.scanner_offset), lidar, rc)
        for p in starts
    ]

    fl = fleet.MCLFleet(r, cfg, rc, seed=7)
    poses_b = jax.tree.map(lambda *xs: jnp.stack(xs), *starts)
    states = fl.init(poses_b)
    odoms_b = jax.tree.map(lambda *xs: jnp.stack(xs), *([odom] * r))
    scans_b = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    for _ in range(3):
        states = fl.step(states, odoms_b, scans_b, field, alphas)

    # Reference: R independent single-filter runs with the SAME keys.
    keys = jax.random.split(jax.random.key(7), r)
    for q in range(r):
        st = mcl_mod.init(keys[q], cfg.n_particles, starts[q])
        for _ in range(3):
            st = mcl_mod.predict(st, odom, alphas)
            st = mcl_mod.update(st, scans[q], field, cfg, rc)
        np.testing.assert_allclose(
            np.asarray(states.particles.pose.x[q]),
            np.asarray(st.particles.pose.x),
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(states.particles.log_weight[q]),
            np.asarray(st.particles.log_weight),
            rtol=1e-5, atol=1e-4,
        )


def test_fleet_localizes_all_robots():
    h = w = 96
    blocked = jnp.asarray(synthetic_room(h, w))
    rc = RaycastConfig(step=1.0, max_dist=60.0, backend="sdf")
    lidar = LidarConfig(n_rays=24, max_dist=60.0)
    cfg = MCLConfig(n_particles=192, meas_stddev=3.0)
    field = rayfield.make_ray_field(blocked, rc)
    alphas = jnp.asarray((1e-3, 1e-3, 5e-3, 5e-3))

    r = 2
    gt = [Pose.create(30.0, 30.0, 0.3), Pose.create(60.0, 50.0, 2.0)]
    fl = fleet.MCLFleet(r, cfg, rc, seed=1)
    states = fl.init(jax.tree.map(lambda *xs: jnp.stack(xs), *gt))
    key = jax.random.key(5)
    odom = Odometry.create(0.05, 1.2, 0.05)
    from slam_tpu.ops import motion

    for _ in range(10):
        key, *ks = jax.random.split(key, r + 1)
        gt = [
            motion.sample_motion_model_odometry(ks[q], odom, gt[q], alphas)
            for q in range(r)
        ]
        scans = [
            fake_lidar.scan(
                blocked, sensor_pose(p, cfg.scanner_offset), lidar, rc
            )
            for p in gt
        ]
        states = fl.step(
            states,
            jax.tree.map(lambda *xs: jnp.stack(xs), *([odom] * r)),
            jax.tree.map(lambda *xs: jnp.stack(xs), *scans),
            field,
            alphas,
        )
    mp = fleet.mean_poses(states)
    for q in range(r):
        err = np.hypot(
            float(mp.x[q]) - float(gt[q].x), float(mp.y[q]) - float(gt[q].y)
        )
        assert err < 6.0, f"robot {q} lost: {err:.1f}px"
