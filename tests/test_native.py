"""Native host runtime vs JAX/Python oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu import native
from slam_tpu.models.simulate import synthetic_room
from slam_tpu.ops.raycast import raycast_march
from slam_tpu.utils.maps import erode


@pytest.mark.skipif(not native.available(), reason="libslam_native.so not built")
class TestNative:
    def test_raycast_matches_jax_march(self, rng):
        h = w = 96
        blocked = synthetic_room(h, w)
        n = 256
        xs = rng.uniform(5, w - 5, n).astype(np.float32)
        ys = rng.uniform(5, h - 5, n).astype(np.float32)
        ths = rng.uniform(-np.pi, np.pi, n).astype(np.float32)

        nd, nh = native.raycast_batch(blocked, xs, ys, ths, step=0.5, max_dist=120.0)
        jd, jh = raycast_march(
            jnp.asarray(blocked), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ths),
            step=0.5, max_dist=120.0,
        )
        np.testing.assert_array_equal(nh, np.asarray(jh))
        np.testing.assert_allclose(nd, np.asarray(jd), atol=1e-3)

    def test_scan_poses_shapes_and_consistency(self, rng):
        blocked = synthetic_room(64, 64)
        angles = np.linspace(0, 2 * np.pi, 16, endpoint=False).astype(np.float32)
        d, hit = native.scan_poses(
            blocked, [32.0, 40.0], [32.0, 20.0], [0.0, 1.0], angles, max_dist=60.0
        )
        assert d.shape == (2, 16) and hit.shape == (2, 16)
        d1, h1 = native.raycast_batch(
            blocked, np.full(16, 32.0), np.full(16, 32.0), angles, max_dist=60.0
        )
        np.testing.assert_allclose(d[0], d1, atol=1e-5)

    @pytest.mark.parametrize("radius", [1, 3, 7])
    def test_erode_matches_numpy(self, rng, radius):
        binary = (rng.random((48, 56)) > 0.3).astype(np.int32)
        got = native.erode_disc(binary, radius)
        want = erode(binary, radius)
        np.testing.assert_array_equal(got, want)

    def test_prefetcher_round_trip(self):
        blocked = synthetic_room(64, 64)
        angles = np.linspace(0, 2 * np.pi, 8, endpoint=False).astype(np.float32)
        pf = native.ScanPrefetcher(blocked, angles, max_dist=60.0)
        pf.submit(32.0, 32.0, 0.0)
        pf.submit(30.0, 30.0, 0.5)
        d0, h0 = pf.get()
        d1, h1 = pf.get()
        pf.close()
        want, _ = native.scan_poses(blocked, [32.0], [32.0], [0.0], angles, max_dist=60.0)
        np.testing.assert_allclose(d0, want[0], atol=1e-5)
        assert d1.shape == (8,)


def test_python_fallback_raycast():
    """The pure-python fallback obeys the same semantics (tiny case)."""
    blocked = np.zeros((16, 16), bool)
    blocked[:, 10] = True
    d, hit = native._py_raycast(blocked, 16, 16, 3.0, 8.0, 0.0, 0.5, 20.0)
    assert hit == 1 and abs(d - 7.0) <= 0.5
