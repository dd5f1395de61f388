#!/usr/bin/env python
"""Motion-model particle-cloud visualizer.

Rebuild of the reference's `scripts/motion_model.py` (matplotlib scatter of
particle clouds from JSON on stdin): samples the odometry and velocity
motion models from a fixed start pose and renders the clouds to a PNG so the
alpha noise parameters can be eyeballed, like the notebook's cells 2/4.

    python tools/plot_motion_model.py --alphas 0.01 0.01 0.01 0.01 --out clouds.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--alphas", type=float, nargs=4, default=(0.005, 0.005, 0.01, 0.01))
    ap.add_argument("--trans", type=float, default=30.0)
    ap.add_argument("--rot", type=float, default=0.4)
    ap.add_argument("--out", default="motion_clouds.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slam_tpu.core.types import Odometry, Pose
    from slam_tpu.ops import motion
    from slam_tpu.utils import render

    size = 512
    img = np.full((size, size, 3), 255, np.uint8)
    pose = Pose.create(
        jnp.full((args.n,), 80.0), jnp.full((args.n,), 80.0), jnp.full((args.n,), 0.5)
    )
    key = jax.random.key(0)
    colors = [render.RED, render.BLUE, render.GREEN, render.MAGENTA, render.CYAN]
    odom = Odometry.create(args.rot / 2, args.trans, args.rot / 2)
    for step in range(args.steps):
        key, k = jax.random.split(key)
        pose = motion.sample_motion_model_odometry(
            k, odom, pose, jnp.asarray(args.alphas)
        )
        render.draw_particles(
            img,
            np.asarray(pose.x),
            np.asarray(pose.y),
            colors[step % len(colors)],
            max_draw=args.n,
        )
    render.save_png(img, args.out)
    print(f"{args.steps} clouds of {args.n} samples -> {args.out}")


if __name__ == "__main__":
    main()
