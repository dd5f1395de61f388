#!/usr/bin/env python
"""Head-to-head trajectory quality vs the C++ reference.

Run `tools/refbench/build.sh`, then
`.build/ref_mcl_traj <map> 200 120 2.5 0.02 > /tmp/ref_traj.jsonl`, then this
script: it replays the identical deterministic trajectory and exact-DDA scans
through the slam_tpu filter and prints both implementations' ATE. See
RESULTS.md for recorded numbers.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from slam_tpu.core.config import *
from slam_tpu.core.types import Odometry, Pose
from slam_tpu.models import fake_lidar, slam as slam_mod, mcl as mcl_mod
from slam_tpu.ops.measurement import sensor_pose
from slam_tpu.utils.maps import load_binary_map
from slam_tpu.utils.metrics import ate_rmse

ref = [json.loads(l) for l in open(sys.argv[1] if len(sys.argv) > 1 else '/tmp/ref_traj.jsonl')]
blocked = jnp.asarray(load_binary_map('/root/reference/assets/floor_plan.png') == 0)
h, w = blocked.shape
cfg = SLAMConfig(
    mcl=MCLConfig(n_particles=200, meas_stddev=5.0, scanner_offset=(0.,30.,0.)),
    map=MapConfig(height=h, width=w),
    lidar=LidarConfig(start=0.0, stop=2*np.pi, max_dist=500.0, n_rays=90),
    motion=MotionConfig(alphas=(5e-4,5e-4,1e-2,1e-2)),
    raycast=RaycastConfig(step=0.5, max_dist=500.0, backend="march"),
)
engine = slam_mod.GridSLAM(cfg, seed=0)
start = Pose.create(w/2.0, h/2.0, np.pi/2)
state = engine.init(start)
gt = start
est_mean, gts = [], []
odom = Odometry.create(0.01, 2.5, 0.01)
for t in range(len(ref)):
    th1 = gt.theta + 0.01
    gt = Pose.create(gt.x + 2.5*jnp.cos(th1), gt.y + 2.5*jnp.sin(th1), th1 + 0.01)
    sp = sensor_pose(gt, cfg.mcl.scanner_offset)
    scan = fake_lidar.scan(blocked, sp, cfg.lidar, cfg.raycast)
    state = engine.step(state, odom, scan)
    mp = mcl_mod.mean_pose(state.mcl)
    est_mean.append([float(mp.x), float(mp.y)])
    gts.append([float(gt.x), float(gt.y)])
print("ours SLAM-mode (unknown map, shared grid) ATE (mean):",
      round(ate_rmse(np.array(est_mean), np.array(gts)), 2))
