"""Worker program for the real multi-process `jax.distributed` test.

Launched by tests/test_distributed.py as N separate CPU processes (gloo
collectives), each owning `--local-devices` virtual CPU devices, so the
global mesh spans processes the way a pod slice spans hosts. Exercises:

  * `slam_tpu.parallel.distributed.initialize` with explicit coordinator
    (the manual-cluster path, `parallel/distributed.py:24-39`),
  * `host_local_slice` process topology,
  * `replicate_to_all_hosts` (broadcast from process 0),
  * a cross-process ShardedMCL predict+update step (GSPMD collectives over
    the process boundary), numerically checked on every process against the
    single-device reference path computed locally.

Prints "RESULT-OK <process_id>" on success; any assertion/exception makes
the parent test fail on a nonzero exit.
"""

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from slam_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from slam_tpu.core.config import LidarConfig, MCLConfig, RaycastConfig
    from slam_tpu.core.types import Odometry, Pose
    from slam_tpu.models import fake_lidar, mcl as mcl_mod
    from slam_tpu.models.simulate import synthetic_room
    from slam_tpu.parallel import make_mesh, sharded

    n_devices = args.num_processes * args.local_devices
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert len(jax.devices()) == n_devices, jax.devices()
    assert distributed.is_multihost() == (args.num_processes > 1)

    n = 64
    sl = distributed.host_local_slice(n)
    per = n // args.num_processes
    assert sl == slice(args.process_id * per, (args.process_id + 1) * per), sl

    # Broadcast: every process must end up with process 0's value.
    probe = jnp.asarray([args.process_id * 100.0, 7.0])
    out = distributed.replicate_to_all_hosts({"probe": probe})
    np.testing.assert_array_equal(np.asarray(out["probe"]), [0.0, 7.0])

    # --- Cross-process sharded MCL step vs local single-device reference ---
    h = w = 64
    blocked = jnp.asarray(synthetic_room(h, w))
    pose = Pose.create(w / 2.0, h / 2.0, np.pi / 2)
    lidar = LidarConfig(n_rays=16, max_dist=100.0)
    rc = RaycastConfig(max_dist=100.0, chunk=32)
    scan = fake_lidar.scan(blocked, pose, lidar, rc)
    cfg = MCLConfig(n_particles=n, ess_threshold=0.0)  # no resample: exact cmp
    odom = Odometry.create(0.1, 2.0, 0.1)
    alphas = jnp.asarray((1e-3, 1e-3, 1e-3, 1e-3))

    # Single-device reference, computed process-locally. Raw uint32 keys
    # (not typed key arrays) so every leaf survives np.asarray below.
    st0 = mcl_mod.init(jax.random.PRNGKey(0), n, pose)
    ref = mcl_mod.predict(st0, odom, alphas)
    ref = mcl_mod.update(ref, scan, blocked, cfg, rc)

    # Global mesh spanning both processes; state placed shard-by-shard (a
    # multiprocess device_put of host data to non-addressable devices is
    # not allowed, so feed each addressable shard from the local replica).
    mesh = make_mesh(n_devices, beam_axis=1)
    shardings = sharded.state_shardings(st0, mesh, n)

    def to_global(local, shard):
        arr = np.asarray(local)
        return jax.make_array_from_callback(
            arr.shape, shard, lambda idx: arr[idx]
        )

    st = jax.tree.map(to_global, st0, shardings)

    rs = sharded.ray_sharding(mesh)
    step = jax.jit(
        lambda s, scan, blocked: mcl_mod.update(
            mcl_mod.predict(s, odom, alphas), scan, blocked, cfg, rc,
            ray_sharding=rs,
        )
    )
    out_state = step(st, scan, blocked)

    # Every process sees the full result via allgather; must match the
    # local reference bit-for-bit up to f32 collective reduction order.
    got_x = multihost_utils.process_allgather(
        out_state.particles.pose.x, tiled=True
    )
    got_lw = multihost_utils.process_allgather(
        out_state.particles.log_weight, tiled=True
    )
    np.testing.assert_allclose(got_x, np.asarray(ref.particles.pose.x), rtol=1e-5)
    np.testing.assert_allclose(
        got_lw, np.asarray(ref.particles.log_weight), rtol=1e-4, atol=1e-4
    )

    # The particle axis really is sharded across processes: this process
    # addresses only its slice of the global array.
    local_rows = sum(
        s.data.shape[0] for s in out_state.particles.pose.x.addressable_shards
    )
    assert local_rows == n // args.num_processes, local_rows

    print(f"RESULT-OK {args.process_id}", flush=True)


if __name__ == "__main__":
    main()
