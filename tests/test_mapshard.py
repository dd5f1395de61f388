"""Map-block sharding tests (SURVEY section 7 item 8): the row-block-sharded
grid raycast/mapping must match the replicated path exactly, and the
map-sharded SLAM engine must match the single-device engine numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.core.config import (
    LidarConfig,
    MapConfig,
    MCLConfig,
    MotionConfig,
    RaycastConfig,
    SLAMConfig,
)
from slam_tpu.core.types import Odometry, Pose
from slam_tpu.models import fake_lidar, slam as slam_mod
from slam_tpu.models.simulate import synthetic_room
from slam_tpu.ops.raycast import raycast_march
from slam_tpu.parallel import make_mesh
from slam_tpu.parallel.mapshard import (
    MapShardedGridSLAM,
    grid_sharding,
    raycast_march_sharded,
    scan_logodds_update_sharded,
)

H = W = 64
N = 64


def test_block_sharded_march_matches_replicated(rng):
    blocked = jnp.asarray(synthetic_room(H, W))
    mesh = make_mesh(8, beam_axis=4)  # 'b' axis = 4 row blocks
    n = 256
    xs = jnp.asarray(rng.uniform(-4, W + 4, n), jnp.float32)
    ys = jnp.asarray(rng.uniform(-4, H + 4, n), jnp.float32)
    ths = jnp.asarray(rng.uniform(-7, 7, n), jnp.float32)

    d0, h0 = raycast_march(blocked, xs, ys, ths, step=0.7, max_dist=90.0)
    blocked_sh = jax.device_put(blocked, grid_sharding(mesh))
    d1, h1 = raycast_march_sharded(
        mesh, blocked_sh, xs, ys, ths, step=0.7, max_dist=90.0
    )
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_row_window_march_composes():
    """The op-level contract: min over row-block marches == full march."""
    blocked = jnp.asarray(synthetic_room(H, W))
    xs = jnp.asarray([10.0, 30.0, 50.0], jnp.float32)
    ys = jnp.asarray([10.0, 30.0, 50.0], jnp.float32)
    ths = jnp.asarray([0.3, 2.0, -1.7], jnp.float32)
    d0, h0 = raycast_march(blocked, xs, ys, ths, step=0.5, max_dist=80.0)
    lh = H // 4
    dmin = jnp.full_like(d0, 80.0)
    for b in range(4):
        d, hh = raycast_march(
            blocked[b * lh : (b + 1) * lh],
            xs,
            ys,
            ths,
            step=0.5,
            max_dist=80.0,
            row_offset=b * lh,
            full_h=H,
        )
        dmin = jnp.minimum(dmin, jnp.where(hh, d, 80.0))
    np.testing.assert_allclose(
        np.asarray(jnp.where(h0, d0, 80.0)), np.asarray(dmin), rtol=1e-6
    )


def _cfg():
    return SLAMConfig(
        mcl=MCLConfig(n_particles=N, meas_stddev=3.0),
        map=MapConfig(height=H, width=W),
        lidar=LidarConfig(n_rays=16, max_dist=60.0),
        motion=MotionConfig(alphas=(1e-3, 1e-3, 1e-3, 1e-3)),
        raycast=RaycastConfig(step=1.0, max_dist=60.0, chunk=16),
    )


def test_sharded_mapping_scatter_matches():
    from slam_tpu.ops import mapping

    cfg = _cfg()
    mesh = make_mesh(8, beam_axis=4)
    blocked = jnp.asarray(synthetic_room(H, W))
    pose = Pose.create(30.0, 30.0, 0.8)
    scan = fake_lidar.scan(blocked, pose, cfg.lidar, cfg.raycast)
    grid = jnp.zeros((H, W), jnp.float32)

    ref = mapping.scan_logodds_update(
        grid,
        pose,
        scan,
        scanner_offset=cfg.mcl.scanner_offset,
        step=cfg.raycast.step,
        max_dist=cfg.raycast.max_dist,
        l_occ=cfg.map.l_occ,
        l_free=cfg.map.l_free,
        l_min=cfg.map.l_min,
        l_max=cfg.map.l_max,
    )
    grid_sh = jax.device_put(grid, grid_sharding(mesh))
    got = scan_logodds_update_sharded(mesh, grid_sh, pose, scan, cfg=cfg)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_map_sharded_slam_matches_single_device():
    cfg = _cfg()
    blocked = jnp.asarray(synthetic_room(H, W))
    pose = Pose.create(W / 2.0, H / 2.0, np.pi / 2)
    scan = fake_lidar.scan(blocked, pose, cfg.lidar, cfg.raycast)
    odom = Odometry.create(0.05, 1.5, 0.05)

    # Single-device reference (march backend = what the sharded path uses).
    engine0 = slam_mod.GridSLAM(cfg, seed=0)
    st0 = engine0.init(pose)
    for _ in range(2):
        st0 = engine0.step(st0, odom, scan)

    mesh = make_mesh(8, beam_axis=4)
    engine = MapShardedGridSLAM(mesh, cfg)
    st = engine.init(pose, seed=0)
    for _ in range(2):
        st = engine.step(st, odom, scan)
    jax.block_until_ready(st)

    np.testing.assert_allclose(
        np.asarray(st.grid), np.asarray(st0.grid), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st.mcl.particles.pose.x),
        np.asarray(st0.mcl.particles.pose.x),
        rtol=1e-4,
    )
    # The grid really is sharded in row blocks.
    assert st.grid.sharding.shard_shape((H, W))[0] == H // 4


def test_map_sharded_rejects_scanmatch():
    """MapShardedGridSLAM must reject SLAMConfig.scanmatch loudly (the
    refinement needs a replicated full-map EDT — exactly what map-block
    sharding avoids), not silently pin est_pose to the best particle
    while the particle-sharded engine honors the same config."""
    import pytest as _pytest

    from slam_tpu.core.config import ScanMatchConfig
    from slam_tpu.parallel import make_mesh
    from slam_tpu.parallel.mapshard import MapShardedGridSLAM

    cfg = SLAMConfig(
        mcl=MCLConfig(n_particles=16),
        map=MapConfig(height=64, width=64),
        scanmatch=ScanMatchConfig(),
    )
    mesh = make_mesh(8, beam_axis=2)
    with _pytest.raises(ValueError, match="scanmatch"):
        MapShardedGridSLAM(mesh, cfg)
