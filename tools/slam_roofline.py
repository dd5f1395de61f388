#!/usr/bin/env python
"""Per-phase timing of the full SLAM step (unknown map, mapping every step)
at large N — the "1M-particle grid SLAM" headline's attribution evidence,
the SLAM-mode companion of tools/roofline.py.

Phases of `slam_tpu.models.slam.step` with measurement='likelihood_field'
(the dynamic-map fast path): motion predict; JFA EDT rebuild (gather-free,
radius-capped); LF weights (one EDT gather per beam endpoint: N x B x 4 B);
systematic resample; log-odds map update from the best pose.

Usage:  nohup setsid python -u tools/slam_roofline.py --particles 1000000 \
            > /tmp/slam_roofline.log 2>&1 &
        (one TPU client at a time; see CLAUDE.md)
"""

import argparse
import json
import sys
import time

import numpy as np

PEAK_HBM_GBPS = 819.0  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--map", default=None,
                    help="path to a map PNG (free=white); default floor plan")
    ap.add_argument("--start", type=float, nargs=2, default=None,
                    help="start x y (world coords); default map-specific")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import floor_plan_blocked
    from slam_tpu.core import grid as gridlib
    from slam_tpu.core.config import (
        LidarConfig,
        MCLConfig,
        MotionConfig,
        RaycastConfig,
        SLAMConfig,
    )
    from slam_tpu.core.types import Odometry, Pose
    from slam_tpu.models import fake_lidar, mcl as mcl_mod, slam as slam_mod
    from slam_tpu.ops import edt as edtlib, mapping, measurement, resample, rayfield

    if args.map:
        from slam_tpu.utils.maps import load_binary_map

        blocked = jnp.asarray(np.asarray(load_binary_map(args.map) == 0))
    else:
        blocked = jnp.asarray(floor_plan_blocked())
    h, w = blocked.shape
    lidar = LidarConfig(start=0.0, stop=np.pi, max_dist=500.0, n_rays=90)
    rc = RaycastConfig(step=0.5, max_dist=500.0, backend="sdf")
    cfg = SLAMConfig(
        mcl=MCLConfig(
            n_particles=args.particles,
            meas_stddev=5.0,
            measurement="likelihood_field",
        ),
        lidar=lidar,
        motion=MotionConfig(alphas=(5e-4, 5e-4, 1e-2, 1e-2)),
        raycast=rc,
    )

    if args.start:
        pose = Pose.create(args.start[0], args.start[1], np.pi)
    elif args.map:
        from benchmarks.maze_bench import find_start

        sx, sy = find_start(np.asarray(blocked))
        pose = Pose.create(sx, sy, 0.9)
    else:
        pose = Pose.create(400.0, 400.0, np.pi)
    scan = fake_lidar.scan(blocked, pose, lidar, RaycastConfig(max_dist=500.0))
    odom = Odometry.create(2.5, 0.02, 0.02)
    edt_cap = 5.0 * cfg.mcl.meas_stddev + 2.0

    state = slam_mod.init(jax.random.key(0), cfg, pose)
    full = jax.jit(lambda st: slam_mod.step(st, odom, scan, cfg))
    state = full(state)  # realistic spread + learned grid

    blocked_now = gridlib.blocked_from_logodds(state.grid)
    edt_now = edtlib.edt_capped(blocked_now, edt_cap)
    field = rayfield.RayField(blocked=blocked_now, edt=edt_now)

    @jax.jit
    def phase_predict(st):
        return mcl_mod.predict(st.mcl, odom, cfg.motion.alphas)

    @jax.jit
    def phase_edt(grid):
        return edtlib.edt_capped(
            gridlib.blocked_from_logodds(grid), edt_cap
        )

    @jax.jit
    def phase_weights(st, field, scan):
        return measurement.particle_log_weights_likelihood_field(
            field,
            st.mcl.particles.pose,
            scan,
            rc=rc,
            scanner_offset=cfg.mcl.scanner_offset,
            stddev=cfg.mcl.meas_stddev,
            z_hit=cfg.mcl.lf_z_hit,
            z_rand=cfg.mcl.lf_z_rand,
        )

    @jax.jit
    def phase_resample(key, st):
        return resample.resample(key, st.mcl.particles, cfg.mcl.resample)

    @jax.jit
    def phase_map(st, scan):
        return mapping.scan_logodds_update(
            st.grid,
            st.mcl.best_pose,
            scan,
            scanner_offset=cfg.mcl.scanner_offset,
            step=rc.step,
            max_dist=rc.max_dist,
            l_occ=cfg.map.l_occ,
            l_free=cfg.map.l_free,
            l_min=cfg.map.l_min,
            l_max=cfg.map.l_max,
        )

    def fence(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    def timeit(fn, *a):
        for _ in range(args.warmup):
            out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        fence(out)
        return (time.perf_counter() - t0) / args.iters

    key = jax.random.key(1)
    t_pred = timeit(phase_predict, state)
    t_edt = timeit(phase_edt, state.grid)
    t_meas = timeit(phase_weights, state, field, scan)
    t_rs = timeit(phase_resample, key, state)
    t_map = timeit(phase_map, state, scan)
    t_full = timeit(full, state)

    # The correlative-table variant (measurement='likelihood_field_table'):
    # the per-beam endpoint gathers (N x B) become a particle-count-
    # independent table build + ONE pair gather per particle — the designed
    # fix for exactly this large-N wall.
    import dataclasses as _dc

    cfg_t = _dc.replace(
        cfg, mcl=_dc.replace(cfg.mcl, measurement="likelihood_field_table")
    )
    full_t = jax.jit(lambda st: slam_mod.step(st, odom, scan, cfg_t))
    state_t = full_t(state)  # compile + one step under the table model

    @jax.jit
    def phase_weights_table(st, field, scan):
        return measurement.particle_log_weights_lf_table(
            field,
            st.mcl.particles.pose,
            scan,
            rc=rc,
            scanner_offset=cfg.mcl.scanner_offset,
            stddev=cfg.mcl.meas_stddev,
            z_hit=cfg.mcl.lf_z_hit,
            z_rand=cfg.mcl.lf_z_rand,
            table_bins=cfg.mcl.lf_table_bins,
            spread_mult=cfg.mcl.lf_table_spread,
            min_halfwidth=cfg.mcl.lf_table_min_halfwidth,
        )

    t_meas_t = timeit(phase_weights_table, state_t, field, scan)
    t_full_t = timeit(full_t, state_t)

    # Build/lookup split of the table phase: time the bare lf_score_table
    # at the same bin count; lookup ~= whole - build (the heading stats are
    # two means over [N], negligible).
    tbins = cfg.mcl.lf_table_bins
    headings = jnp.linspace(-0.2, 0.2, tbins) + float(np.pi)

    @jax.jit
    def phase_table_build(edt_arr, scan):
        return measurement.lf_score_table(
            edt_arr,
            scan,
            headings,
            rc=rc,
            stddev=cfg.mcl.meas_stddev,
            z_hit=cfg.mcl.lf_z_hit,
            z_rand=cfg.mcl.lf_z_rand,
        )

    t_tbuild = timeit(phase_table_build, field.edt, scan)

    # bf16 score-field variant: the build is HBM-bound on the window reads,
    # so halving the element size should land near 2x on the build.
    @jax.jit
    def phase_table_build_bf16(edt_arr, scan):
        return measurement.lf_score_table(
            edt_arr,
            scan,
            headings,
            rc=rc,
            stddev=cfg.mcl.meas_stddev,
            z_hit=cfg.mcl.lf_z_hit,
            z_rand=cfg.mcl.lf_z_rand,
            dtype="bf16",
        )

    t_tbuild16 = timeit(phase_table_build_bf16, field.edt, scan)

    cfg_t16 = _dc.replace(
        cfg_t, mcl=_dc.replace(cfg_t.mcl, lf_table_dtype="bf16")
    )
    full_t16 = jax.jit(lambda st: slam_mod.step(st, odom, scan, cfg_t16))
    state_t16 = full_t16(state_t)
    t_full_t16 = timeit(full_t16, state_t16)

    # Box-localized build (lf_table_box, round 4): traffic T*box^2 instead
    # of T*H*W — the build should drop to ~noise, leaving the pair-gather
    # lookup as the whole table phase.
    cfg_tb = _dc.replace(
        cfg_t, mcl=_dc.replace(cfg_t.mcl, lf_table_box=128)
    )
    full_tb = jax.jit(lambda st: slam_mod.step(st, odom, scan, cfg_tb))
    state_tb = full_tb(state_t)
    t_full_tb = timeit(full_tb, state_tb)

    @jax.jit
    def phase_weights_table_box(st, field, scan):
        return measurement.particle_log_weights_lf_table(
            field,
            st.mcl.particles.pose,
            scan,
            rc=rc,
            scanner_offset=cfg.mcl.scanner_offset,
            stddev=cfg.mcl.meas_stddev,
            z_hit=cfg.mcl.lf_z_hit,
            z_rand=cfg.mcl.lf_z_rand,
            table_bins=cfg.mcl.lf_table_bins,
            spread_mult=cfg.mcl.lf_table_spread,
            min_halfwidth=cfg.mcl.lf_table_min_halfwidth,
            box_size=128,
        )

    t_meas_tb = timeit(phase_weights_table_box, state_tb, field, scan)

    n, b = args.particles, lidar.n_rays
    meas_bytes = n * b * 4 + n * 4  # EDT endpoint gathers + weight writes
    gbps = meas_bytes / t_meas / 1e9
    sol_ms = meas_bytes / (PEAK_HBM_GBPS * 1e9) * 1e3

    dev = jax.devices()[0].device_kind
    print(f"# device: {dev}; N={n}, B={b}, map {h}x{w}, edt cap {edt_cap}",
          file=sys.stderr)
    for name, t in (
        ("predict", t_pred), ("edt rebuild", t_edt), ("lf weights", t_meas),
        ("resample", t_rs), ("map update", t_map), ("full step", t_full),
        ("lf-table weights", t_meas_t), ("full step (table)", t_full_t),
        ("table build alone", t_tbuild),
        ("table build bf16", t_tbuild16),
        ("full step (table bf16)", t_full_t16),
        ("lf-table weights (box 128)", t_meas_tb),
        ("full step (table, box 128)", t_full_tb),
    ):
        print(f"# {name:18s} {t * 1e3:8.2f} ms", file=sys.stderr)
    print(f"# lf weights: {meas_bytes / 1e6:.0f} MB of endpoint gathers -> "
          f"{gbps:.0f} GB/s achieved ({100 * gbps / PEAK_HBM_GBPS:.0f}% of "
          f"peak; speed-of-light {sol_ms:.2f} ms)", file=sys.stderr)
    print(json.dumps({
        "metric": f"slam_step_ms_{n // 1000}k",
        "value": round(t_full * 1e3, 2),
        "unit": "ms",
        "detail": {
            "predict_ms": round(t_pred * 1e3, 3),
            "edt_rebuild_ms": round(t_edt * 1e3, 3),
            "lf_weights_ms": round(t_meas * 1e3, 3),
            "resample_ms": round(t_rs * 1e3, 3),
            "map_update_ms": round(t_map * 1e3, 3),
            "lf_gbps": round(gbps, 1),
            "speed_of_light_ms": round(sol_ms, 3),
            "lf_table_weights_ms": round(t_meas_t * 1e3, 3),
            "full_step_table_ms": round(t_full_t * 1e3, 3),
            "lf_table_build_ms": round(t_tbuild * 1e3, 3),
            "lf_table_build_bf16_ms": round(t_tbuild16 * 1e3, 3),
            "full_step_table_bf16_ms": round(t_full_t16 * 1e3, 3),
            "lf_table_weights_box128_ms": round(t_meas_tb * 1e3, 3),
            "full_step_table_box128_ms": round(t_full_tb * 1e3, 3),
        },
    }))


if __name__ == "__main__":
    main()
