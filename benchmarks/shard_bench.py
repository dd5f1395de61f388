#!/usr/bin/env python
"""Turnkey pod benchmark: the full sharded SLAM step over whatever mesh
exists (VERDICT r2 item 5).

Runs `ShardedGridSLAM` (particles sharded over 'p', rays over 'b', grid
replicated, reduce-scatter resampler) at large N on ALL visible devices and
reports per-chip throughput plus the collective/imbalance overhead: the
sharded step time minus the time of the SAME step program on ONE device at
N / n_devices particles (the perfect-weak-scaling reference). Config matches
tools/slam_roofline.py (floor plan, 90 beams, likelihood-field measurement,
JFA EDT rebuilt inside the step) so single-chip numbers line up with
RESULTS.md's full-SLAM table.

    python benchmarks/shard_bench.py                      # real chip(s)
    python benchmarks/shard_bench.py --virtual 8 --particles 65536
        # correctness/pipeline check on a virtual 8-device CPU mesh

One real pod slice needs zero new code: the mesh is whatever
`jax.devices()` exposes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--particles", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--beam-axis", type=int, default=1)
    ap.add_argument(
        "--measurement",
        default="likelihood_field_table",
        choices=["likelihood_field", "likelihood_field_table"],
        help="table = the large-N fast path (1M step 706 -> 65 ms, "
        "RESULTS.md round 3)",
    )
    ap.add_argument(
        "--table-box", type=int, default=0,
        help="lf_table_box for the table measurement (0 = dense build; "
        "128 is the measured 1M production setting — box-localized build, "
        "round 4)",
    )
    ap.add_argument(
        "--virtual",
        type=int,
        default=0,
        help="N virtual CPU devices (forces CPU; correctness check, not perf)",
    )
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import floor_plan_blocked
    from slam_tpu.core.config import (
        LidarConfig,
        MCLConfig,
        MotionConfig,
        RaycastConfig,
        SLAMConfig,
    )
    from slam_tpu.core.types import Odometry, Pose
    from slam_tpu.models import fake_lidar, slam as slam_mod
    from slam_tpu.parallel import ShardedGridSLAM, make_mesh

    mesh = make_mesh(beam_axis=args.beam_axis)
    n_dev = mesh.devices.size
    p_size = mesh.shape["p"]
    b_size = mesh.shape.get("b", 1)
    # Divisible by 'p', and at least one particle per shard.
    n = max(p_size, args.particles - (args.particles % p_size))

    blocked = jnp.asarray(floor_plan_blocked())
    lidar = LidarConfig(start=0.0, stop=np.pi, max_dist=500.0, n_rays=90)
    rc = RaycastConfig(step=0.5, max_dist=500.0, backend="sdf")

    def make_cfg(n_particles):
        return SLAMConfig(
            mcl=MCLConfig(
                n_particles=n_particles,
                meas_stddev=5.0,
                measurement=args.measurement,
                lf_table_box=args.table_box or None,
            ),
            lidar=lidar,
            motion=MotionConfig(alphas=(5e-4, 5e-4, 1e-2, 1e-2)),
            raycast=rc,
        )

    cfg = make_cfg(n)
    pose = Pose.create(400.0, 400.0, np.pi)
    scan = fake_lidar.scan(blocked, pose, lidar, RaycastConfig(max_dist=500.0))
    odom = Odometry.create(2.5, 0.02, 0.02)

    from slam_tpu.utils.profiling import fence

    # --- sharded step over the full mesh ---
    engine = ShardedGridSLAM(mesh, cfg)
    state = engine.init(pose)
    for _ in range(args.warmup):
        state = engine.step(state, odom, scan)
    fence(state)

    sharded_ms = []
    for _ in range(max(1, args.repeats)):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state = engine.step(state, odom, scan)
        fence(state)
        sharded_ms.append(1e3 * (time.perf_counter() - t0) / args.iters)
    t_shard = float(np.median(sharded_ms))

    # --- perfect-weak-scaling reference: same step, one device, N/D ---
    n_local = n // p_size
    cfg_l = make_cfg(n_local)
    dev0 = mesh.devices.reshape(-1)[0]
    step_l = jax.jit(
        lambda s, o, z: slam_mod.step(s, o, z, cfg_l), device=dev0
    )
    state_l = jax.device_put(
        slam_mod.init(jax.random.key(0), cfg_l, pose), dev0
    )
    odom_l, scan_l = jax.device_put((odom, scan), dev0)
    for _ in range(args.warmup):
        state_l = step_l(state_l, odom_l, scan_l)
    fence(state_l)
    local_ms = []
    for _ in range(max(1, args.repeats)):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state_l = step_l(state_l, odom_l, scan_l)
        fence(state_l)
        local_ms.append(1e3 * (time.perf_counter() - t0) / args.iters)
    t_local = float(np.median(local_ms))

    pu_s = n * 1e3 / t_shard
    # The weak-scaling reference (N/p particles, ALL beams, one device) is
    # an apples-to-apples perfect-scaling model only when the mesh has no
    # beam axis; with b > 1 each device also holds 1/b of the ray grid, so
    # t_shard < t_local can legitimately occur and "overhead" would conflate
    # the beam-split speedup. Flag the fields rather than misreport.
    ref_exact = b_size == 1
    rec = {
        "metric": f"slam_sharded_step_ms_{n // 1000}k",
        "value": round(t_shard, 2),
        "unit": "ms",
        # scaling efficiency vs the perfect-weak-scaling single-device run
        "vs_baseline": round(t_local / t_shard, 3) if ref_exact else None,
        "reference_exact": ref_exact,
        "n_devices": int(n_dev),
        "measurement": args.measurement,
        "mesh": dict(mesh.shape),
        "particles": int(n),
        "particle_updates_per_s": round(pu_s, 1),
        "particle_updates_per_s_per_chip": round(pu_s / n_dev, 1),
        "local_step_ms_n_over_d": round(t_local, 2),
        "collective_overhead_ms": (
            round(t_shard - t_local, 2) if ref_exact else None
        ),
        "spread_ms": {
            "sharded_min": round(min(sharded_ms), 2),
            "sharded_max": round(max(sharded_ms), 2),
        },
    }
    print(json.dumps(rec))
    caveat = (
        ""
        if ref_exact
        else " [reference inexact: beam axis > 1 also splits ray work]"
    )
    print(
        f"# {n} particles over {n_dev} device(s) {dict(mesh.shape)}: sharded "
        f"{t_shard:.1f} ms/step vs local-equivalent {t_local:.1f} ms "
        f"(overhead {t_shard - t_local:.1f} ms, efficiency "
        f"{100 * t_local / max(t_shard, 1e-9):.0f}%{caveat}); "
        f"{pu_s / n_dev:,.0f} particle-updates/s/chip on "
        f"{jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
