#!/usr/bin/env python
"""Roofline evidence for the MCL step (VERDICT round-1 item 8).

Times each phase of the 100k-particle MCL step separately on the real chip
and compares the measurement phase's achieved HBM bandwidth against the
chip's peak, so "the step is bandwidth-limited" (or not) is a measured
claim. Config matches bench.py (= the reference's `benchmark/mcl.cpp:11-64`
scaled to 100k particles).

Byte model of the panorama-fused measurement phase
(`ops/measurement.py:particle_log_weights_lut_fused`):

  reads : N x n_bins x sizeof(lut dtype)   panorama row gathers (the only
          HBM-resident operand; the LUT itself is ~560 MB but only N rows
          of it are touched per step)
  writes: N x 4 B                          log-weights
  plus the bin-alignment matmuls: N x (g + M) one-hots against
  [N, M, g] / [M, 2M] operands -> 2*N*M*(g + 2M) FLOPs (trivial vs MXU peak).

Usage:  nohup setsid python -u tools/roofline.py > /tmp/roofline.log 2>&1 &
        (one TPU client at a time; see CLAUDE.md)
"""

import argparse
import json
import sys
import time

import numpy as np

# v5e (TPU v5 lite) peaks; see jax-ml.github.io/scaling-book (public specs).
PEAK_HBM_GBPS = 819.0
PEAK_BF16_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import floor_plan_blocked
    from slam_tpu.core.config import (
        LidarConfig,
        MCLConfig,
        RaycastConfig,
        beam_bin_stride,
    )
    from slam_tpu.core.types import Odometry, Pose
    from slam_tpu.models import fake_lidar, mcl as mcl_mod
    from slam_tpu.ops import measurement, rayfield, resample

    blocked = jnp.asarray(floor_plan_blocked())
    lidar = LidarConfig(start=0.0, stop=np.pi, max_dist=500.0, n_rays=90)
    rc = RaycastConfig(step=0.5, max_dist=500.0, backend="lut")
    cfg = MCLConfig(
        n_particles=args.particles,
        meas_stddev=5.0,
        scanner_offset=(0.0, 30.0, 0.0),
        lut_beam_stride=beam_bin_stride(lidar, rc),
    )

    pose = Pose.create(400.0, 400.0, np.pi)
    sensor = mcl_mod.MCL.sensor_position(pose, cfg.scanner_offset)
    scan = fake_lidar.scan(blocked, sensor, lidar, RaycastConfig(max_dist=500.0))
    field = rayfield.make_ray_field(blocked, rc)
    odom = Odometry.create(2.5, 0.02, 0.02)
    alphas = jnp.asarray((0.0005, 0.0005, 0.01, 0.01))

    @jax.jit
    def phase_predict(state):
        return mcl_mod.predict(state, odom, alphas)

    @jax.jit
    def phase_weights(state, field, scan):
        return measurement.particle_log_weights(
            field,
            state.particles.pose,
            scan,
            rc=rc,
            scanner_offset=cfg.scanner_offset,
            stddev=cfg.meas_stddev,
            eps=cfg.meas_epsilon,
            lut_beam_stride=cfg.lut_beam_stride,
        )

    @jax.jit
    def phase_resample(key, particles):
        return resample.resample(key, particles, cfg.resample)

    @jax.jit
    def full_step(state, field, scan):
        st = mcl_mod.predict(state, odom, alphas)
        return mcl_mod.update(st, scan, field, cfg, rc)

    def fence(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    state = mcl_mod.init(jax.random.key(0), args.particles, pose)
    state = full_step(state, field, scan)  # realistic (spread) particle set
    key = jax.random.key(1)

    def timeit(fn, *a):
        for _ in range(args.warmup):
            out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        fence(out)
        return (time.perf_counter() - t0) / args.iters

    t_pred = timeit(phase_predict, state)
    t_meas = timeit(phase_weights, state, field, scan)
    t_rs = timeit(phase_resample, key, state.particles)
    t_full = timeit(full_step, state, field, scan)

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = full_step(state, field, scan)
            fence(out)

    n = args.particles
    n_bins = field.lut_bins or field.lut.shape[-1]
    lut_bytes = jnp.dtype(field.lut.dtype).itemsize
    g = cfg.lut_beam_stride
    m = n_bins // g
    # The gather reads the full PADDED storage row per particle.
    meas_bytes = n * field.lut.shape[-1] * lut_bytes + n * 4
    meas_flops = 2 * n * m * (g + 2 * m)
    gbps = meas_bytes / t_meas / 1e9
    sol_ms = meas_bytes / (PEAK_HBM_GBPS * 1e9) * 1e3

    dev = jax.devices()[0].device_kind
    print(f"# device: {dev}; N={n}, n_bins={n_bins}, lut dtype "
          f"{field.lut.dtype} ({lut_bytes} B), stride g={g}, M={m}",
          file=sys.stderr)
    print(f"# predict      {t_pred * 1e3:8.2f} ms", file=sys.stderr)
    print(f"# measurement  {t_meas * 1e3:8.2f} ms   "
          f"{meas_bytes / 1e6:.1f} MB -> {gbps:.0f} GB/s achieved "
          f"({100 * gbps / PEAK_HBM_GBPS:.0f}% of {PEAK_HBM_GBPS:.0f} GB/s peak; "
          f"speed-of-light {sol_ms:.2f} ms)", file=sys.stderr)
    print(f"# matmul side  {meas_flops / 1e9:.2f} GFLOP "
          f"({100 * meas_flops / (t_meas * PEAK_BF16_TFLOPS * 1e12):.2f}% "
          f"of MXU peak over the phase)", file=sys.stderr)
    print(f"# resample     {t_rs * 1e3:8.2f} ms", file=sys.stderr)
    print(f"# full step    {t_full * 1e3:8.2f} ms   (sum of phases "
          f"{(t_pred + t_meas + t_rs) * 1e3:.2f} ms; remainder = weight "
          f"normalization, best-pose, ESS)", file=sys.stderr)
    print(json.dumps({
        "metric": "mcl_measurement_phase_hbm_gbps_100k",
        "value": round(gbps, 1),
        "unit": "GB/s",
        "vs_baseline": round(gbps / PEAK_HBM_GBPS, 3),
        "detail": {
            "predict_ms": round(t_pred * 1e3, 3),
            "measurement_ms": round(t_meas * 1e3, 3),
            "resample_ms": round(t_rs * 1e3, 3),
            "full_step_ms": round(t_full * 1e3, 3),
            "meas_bytes": meas_bytes,
            "speed_of_light_ms": round(sol_ms, 3),
        },
    }))


if __name__ == "__main__":
    main()
