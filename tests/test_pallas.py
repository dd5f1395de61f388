"""Pallas kernel tests — TPU only (the kernels use TPU PRNG primitives that
have no CPU interpreter lowering; moment validation also runs on real
hardware via benchmarks, see tools/)."""

import jax
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas TPU kernels need a TPU"
)


@requires_tpu
def test_pallas_motion_moments():
    import jax.numpy as jnp

    from slam_tpu.core.types import Odometry, Pose
    from slam_tpu.ops.motion_pallas import sample_motion_model_odometry_pallas

    n = 65536
    pose = Pose.create(
        jnp.full((n,), 10.0), jnp.full((n,), 20.0), jnp.full((n,), 0.5)
    )
    odom = Odometry.create(0.1, 2.0, 0.2)
    alphas = (0.01, 0.01, 0.01, 0.01)
    out = sample_motion_model_odometry_pallas(7, odom, pose, alphas)
    th = np.asarray(out.theta)

    # Expected std of theta noise: sqrt(std_r1^2 + std_r2^2) with
    # std_r = sqrt(a0 r^2 + a1 t^2).
    sr1 = np.sqrt(0.01 * 0.1**2 + 0.01 * 2.0**2)
    sr2 = np.sqrt(0.01 * 0.2**2 + 0.01 * 2.0**2)
    want_std = np.sqrt(sr1**2 + sr2**2)
    assert abs(th.mean() - 0.8) < 5 * want_std / np.sqrt(n)
    assert abs(th.std() / want_std - 1.0) < 0.05

    # Different seeds decorrelate; same seed reproduces.
    out2 = sample_motion_model_odometry_pallas(8, odom, pose, alphas)
    out3 = sample_motion_model_odometry_pallas(7, odom, pose, alphas)
    assert not np.allclose(np.asarray(out2.x), np.asarray(out.x))
    np.testing.assert_array_equal(np.asarray(out3.x), np.asarray(out.x))
