"""Backend-equivalence tests: sdf sphere tracing and lut queries vs the exact
march oracle, plus end-to-end localization quality with the fast backends."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.core.config import (
    LidarConfig,
    MCLConfig,
    MotionConfig,
    RaycastConfig,
    SLAMConfig,
)
from slam_tpu.core.types import Pose
from slam_tpu.models.simulate import (
    forward_arc_commands,
    run_localization,
    synthetic_room,
)
from slam_tpu.ops import edt as edtlib
from slam_tpu.ops import lut as lutlib
from slam_tpu.ops.raycast import raycast_march, raycast_sdf
from slam_tpu.utils.metrics import ate_rmse


def _ray_batch(rng, n, h, w):
    xs = jnp.asarray(rng.uniform(5, w - 5, n), jnp.float32)
    ys = jnp.asarray(rng.uniform(5, h - 5, n), jnp.float32)
    ths = jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32)
    return xs, ys, ths


class TestSdf:
    @pytest.mark.parametrize("edt_fn", [edtlib.edt_exact, edtlib.edt_jfa])
    def test_matches_march(self, rng, edt_fn):
        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        xs, ys, ths = _ray_batch(rng, 256, h, w)
        d0, h0 = raycast_march(blocked, xs, ys, ths, step=0.5, max_dist=120.0)
        edt = edt_fn(blocked)
        d1, h1 = raycast_sdf(
            edt, xs, ys, ths, step=0.5, max_dist=120.0, margin=1.5
        )
        # Hit/miss must agree except within a step of the max-dist boundary.
        boundary = np.abs(np.asarray(d0) - 120.0) < 2.0
        agree = np.asarray(h0 == h1) | boundary
        assert agree.mean() > 0.99
        both = np.asarray(h0 & h1)
        err = np.abs(np.asarray(d0) - np.asarray(d1))[both]
        assert err.max() < 1.5
        assert np.median(err) < 0.6

    def test_inside_obstacle_hits_neighbor(self):
        blocked = jnp.zeros((32, 32), bool).at[10:20, 10:20].set(True)
        edt = edtlib.edt_exact(blocked)
        # Origin inside the obstacle block: first differing cell is blocked.
        d, h = raycast_sdf(edt, 15.0, 15.0, 0.0, step=0.5, max_dist=30.0)
        assert bool(h) and float(d) <= 1.5


class TestLut:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.uint8])
    def test_matches_march_within_binning_error(self, rng, dtype):
        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        lut = lutlib.build_beam_lut(
            blocked, n_bins=256, max_dist=120.0, dtype=dtype
        )
        xs, ys, ths = _ray_batch(rng, 512, h, w)
        # Snap angles exactly to bins to isolate translation error.
        ths = jnp.round(ths / (2 * np.pi / 256)) * (2 * np.pi / 256)
        d0, h0 = raycast_march(blocked, xs, ys, ths, step=0.5, max_dist=120.0)
        d1, h1 = lutlib.raycast_lut(lut, xs, ys, ths, max_dist=120.0)
        both = np.asarray(h0 & h1)
        assert both.mean() > 0.8  # most rays hit in a closed room
        err = np.abs(np.asarray(d0) - np.asarray(d1))[both]
        # Conservative resampling + center snap: small biased error only.
        assert np.median(err) < 1.5
        assert np.quantile(err, 0.95) < 4.0

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.uint8])
    def test_quad_build_matches_per_bin(self, dtype):
        """The 4-fold-symmetric build (one canvas per 4 bins) vs the direct
        per-bin construction. The seed quarter (bins [0, n/4)) runs the
        identical computation -> bitwise equal. Derived bins are NOT
        bitwise: per-bin evaluates sin/cos at each bin's own f32 angle, and
        on axis-aligned maps that ~1e-7 skew pushes exact-boundary samples
        across floor() — measurably WRONG (e.g. a blocked origin cell reads
        a nonzero distance); the quad path derives the 90/180/270
        directions exactly and keeps the blocked-origin invariant."""
        h, w = 80, 112
        n = 64
        blocked = jnp.asarray(synthetic_room(h, w))
        quad = np.asarray(
            lutlib.build_beam_lut(blocked, n_bins=n, max_dist=90.0, dtype=dtype)
        )
        ref = np.asarray(
            lutlib.build_beam_lut(
                blocked, n_bins=n, max_dist=90.0, dtype=dtype,
                _force_per_bin=True,
            )
        )
        np.testing.assert_array_equal(quad[:, :, : n // 4], ref[:, :, : n // 4])
        same = quad == ref
        assert same.mean() > 0.98, f"quad/per-bin mismatch {1 - same.mean():.2e}"
        # The invariant the per-bin build breaks on derived axis bins:
        # a ray starting inside an obstacle hits immediately.
        B = np.asarray(blocked)
        for b in (0, n // 4, n // 2, 3 * n // 4):
            assert (quad[:, :, b][B] == 0).all(), f"axis bin {b}"

    def test_blocked_origin_and_miss(self):
        blocked = jnp.zeros((64, 64), bool).at[:, 40].set(True)
        lut = lutlib.build_beam_lut(blocked, n_bins=8, max_dist=30.0)
        # Pointing away from the wall from the far side: miss at max_dist.
        d, h = lutlib.raycast_lut(lut, 10.0, 32.0, np.pi, max_dist=30.0)
        assert not bool(h) and float(d) == 30.0
        # Pointing at the wall: hit near 29... wait, x=10 -> wall at 40: 30
        d, h = lutlib.raycast_lut(lut, 12.0, 32.0, 0.0, max_dist=30.0)
        assert bool(h) and abs(float(d) - 28.0) < 2.0

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.uint8])
    def test_padded_storage_queries_match_unpadded(self, rng, dtype):
        """Row-padded tables (lut.pad_lut_rows + explicit n_bins) must
        answer every query identically — pad bins are never read."""
        h = w = 64
        blocked = jnp.asarray(synthetic_room(h, w))
        n_bins = 96
        lut = lutlib.build_beam_lut(
            blocked, n_bins=n_bins, max_dist=80.0, dtype=dtype
        )
        lut_p = lutlib.pad_lut_rows(lut)
        assert lut_p.shape[-1] == lutlib.padded_bins(n_bins, dtype) > n_bins
        xs, ys, ths = _ray_batch(rng, 256, h, w)
        d0, h0 = lutlib.raycast_lut(lut, xs, ys, ths, max_dist=80.0)
        d1, h1 = lutlib.raycast_lut(
            lut_p, xs, ys, ths, max_dist=80.0, n_bins=n_bins
        )
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        p0, i0 = lutlib.panorama_rows(lut, xs, ys)
        p1, i1 = lutlib.panorama_rows(lut_p, xs, ys, n_bins)
        assert p1.shape == p0.shape
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


class TestCddt:
    """Compressed directional table vs the dense LUT (identical canvas
    geometry -> near-exact agreement) and vs the march oracle."""

    def test_matches_dense_lut(self, rng):
        from slam_tpu.ops import cddt as cddtlib

        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        table = cddtlib.build_cddt(blocked, n_bins=256)
        assert table.n_overflow == 0
        # Compression: room walls cross any rotated row only a few times.
        dense_bytes = h * w * 256 * 2
        assert table.nbytes < dense_bytes / 8
        lut = lutlib.build_beam_lut(
            blocked, n_bins=256, max_dist=120.0, dtype=jnp.float32
        )
        xs, ys, ths = _ray_batch(rng, 4096, h, w)
        d0, h0 = lutlib.raycast_lut(lut, xs, ys, ths, max_dist=120.0)
        d1, h1 = cddtlib.raycast_cddt(
            table, xs, ys, ths, max_dist=120.0, shape=(h, w)
        )
        eq = np.asarray((d0 == d1) & (h0 == h1))
        # Not bitwise everywhere: the dense quad build derives bins
        # [n/4, n/2) from the [0, n/4) canvases, cddt evaluates their own
        # f32 angles — ulp ties on grazing rays (cf. the quad/per-bin test).
        assert eq.mean() > 0.995, f"cddt/dense mismatch {1 - eq.mean():.2e}"

    def test_matches_march_within_binning_error(self, rng):
        from slam_tpu.ops import cddt as cddtlib

        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        table = cddtlib.build_cddt(blocked, n_bins=256)
        xs, ys, ths = _ray_batch(rng, 512, h, w)
        ths = jnp.round(ths / (2 * np.pi / 256)) * (2 * np.pi / 256)
        d0, h0 = raycast_march(blocked, xs, ys, ths, step=0.5, max_dist=120.0)
        d1, h1 = cddtlib.raycast_cddt(
            table, xs, ys, ths, max_dist=120.0, shape=(h, w)
        )
        both = np.asarray(h0 & h1)
        assert both.mean() > 0.8
        err = np.abs(np.asarray(d0) - np.asarray(d1))[both]
        assert np.median(err) < 1.5
        assert np.quantile(err, 0.95) < 4.0

    def test_scan_and_search_queries_agree(self, rng):
        """The K-wide scan (K <= 64) and the binary-search fallback must
        answer identically; padding the same map to K > 64 switches paths
        without changing semantics."""
        from slam_tpu.ops import cddt as cddtlib

        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        t_scan = cddtlib.build_cddt(blocked, n_bins=64)
        assert t_scan.k <= 64
        t_search = cddtlib.build_cddt(blocked, n_bins=64, k=80)
        assert t_search.n_overflow == 0
        xs, ys, ths = _ray_batch(rng, 1024, h, w)
        d0, h0 = cddtlib.raycast_cddt(
            t_scan, xs, ys, ths, max_dist=120.0, shape=(h, w)
        )
        d1, h1 = cddtlib.raycast_cddt(
            t_search, xs, ys, ths, max_dist=120.0, shape=(h, w)
        )
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))

    def test_explicit_k_overflow_is_counted(self):
        from slam_tpu.ops import cddt as cddtlib

        blocked = jnp.zeros((32, 32), bool).at[:, ::4].set(True)  # 8 walls
        table = cddtlib.build_cddt(blocked, n_bins=8, k=2)
        assert table.k == 2 and table.n_overflow > 0

    def test_rayfield_dispatch_and_cache(self, rng, tmp_path):
        from slam_tpu.ops import cddt as cddtlib
        from slam_tpu.ops.rayfield import make_ray_field, raycast_field

        h = w = 64
        blocked = jnp.asarray(synthetic_room(h, w))
        rc = RaycastConfig(backend="cddt", max_dist=80.0, lut_bins=96)
        field = make_ray_field(blocked, rc, cache_dir=str(tmp_path))
        assert field.cddt is not None
        field2 = make_ray_field(blocked, rc, cache_dir=str(tmp_path))
        np.testing.assert_array_equal(
            np.asarray(field.cddt.starts), np.asarray(field2.cddt.starts)
        )
        xs, ys, ths = _ray_batch(rng, 128, h, w)
        d0, h0 = raycast_field(field, xs, ys, ths, rc)
        d1, h1 = cddtlib.raycast_cddt(
            field.cddt, xs, ys, ths, max_dist=80.0, shape=(h, w)
        )
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


class TestLutFusedMeasurement:
    """The panorama-fused beam model must reproduce the general per-ray LUT
    path (same binning, same pdf) — it only restructures the gathers."""

    @pytest.mark.parametrize(
        "n_rays,span,lut_bins",
        [
            (24, 2 * np.pi, 96),  # stride 4, beams fill all positions
            (24, np.pi, 96),  # stride 2, half the positions valid
            (90, np.pi, 360),  # the reference benchmark geometry (stride 2)
        ],
    )
    def test_matches_general_path(self, rng, n_rays, span, lut_bins):
        import jax

        from slam_tpu.core.config import beam_bin_stride
        from slam_tpu.models import fake_lidar
        from slam_tpu.ops import measurement, rayfield

        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        rc = RaycastConfig(step=0.5, max_dist=80.0, backend="lut", lut_bins=lut_bins)
        lidar = LidarConfig(start=0.0, stop=span, n_rays=n_rays, max_dist=80.0)
        stride = beam_bin_stride(lidar, rc)
        assert stride is not None
        field = rayfield.make_ray_field(blocked, rc)
        scan = fake_lidar.scan(
            blocked, Pose.create(40.0, 48.0, 0.7), lidar, rc
        )

        n = 512
        xs = jnp.asarray(rng.uniform(-5, w + 5, n), jnp.float32)  # incl. OOB
        ys = jnp.asarray(rng.uniform(-5, h + 5, n), jnp.float32)
        ths = jnp.asarray(rng.uniform(-9, 9, n), jnp.float32)
        poses = Pose(x=xs, y=ys, theta=ths)
        offset = (0.0, 3.0, 0.1)

        kw = dict(rc=rc, scanner_offset=offset, stddev=4.0, eps=0.1)
        lw_gen = measurement.particle_log_weights(field, poses, scan, **kw)
        lw_fused = measurement.particle_log_weights(
            field, poses, scan, lut_beam_stride=stride, **kw
        )
        diff = np.abs(np.asarray(lw_gen) - np.asarray(lw_fused))
        # Same bins, same pdf — agreement to f32 reduction-order noise,
        # except where a bin rounds differently by 1 ulp of the angle
        # arithmetic (a measure-zero tie event).
        assert np.median(diff) < 1e-4
        assert (diff < 1e-3).mean() > 0.99

    def test_matches_general_path_u8(self, rng):
        """Both paths dequantize the same raw values -> still near-exact."""
        from slam_tpu.core.config import beam_bin_stride
        from slam_tpu.models import fake_lidar
        from slam_tpu.ops import measurement, rayfield

        h = w = 96
        blocked = jnp.asarray(synthetic_room(h, w))
        rc = RaycastConfig(
            step=0.5, max_dist=80.0, backend="lut", lut_bins=96, lut_dtype="u8"
        )
        lidar = LidarConfig(start=0.0, stop=2 * np.pi, n_rays=24, max_dist=80.0)
        stride = beam_bin_stride(lidar, rc)
        field = rayfield.make_ray_field(blocked, rc)
        assert field.lut.dtype == jnp.uint8
        scan = fake_lidar.scan(blocked, Pose.create(40.0, 48.0, 0.7), lidar, rc)
        poses = Pose(
            x=jnp.asarray(rng.uniform(5, w - 5, 256), jnp.float32),
            y=jnp.asarray(rng.uniform(5, h - 5, 256), jnp.float32),
            theta=jnp.asarray(rng.uniform(-3, 3, 256), jnp.float32),
        )
        kw = dict(rc=rc, scanner_offset=(0.0, 0.0, 0.0), stddev=4.0, eps=0.1)
        lw_gen = measurement.particle_log_weights(field, poses, scan, **kw)
        lw_fused = measurement.particle_log_weights(
            field, poses, scan, lut_beam_stride=stride, **kw
        )
        diff = np.abs(np.asarray(lw_gen) - np.asarray(lw_fused))
        assert np.median(diff) < 1e-4
        assert (diff < 1e-3).mean() > 0.99

    def test_stride_helper(self):
        from slam_tpu.core.config import beam_bin_stride

        rc = RaycastConfig(backend="lut", lut_bins=360)
        assert beam_bin_stride(LidarConfig(0.0, np.pi, n_rays=90), rc) == 2
        assert beam_bin_stride(LidarConfig(0.0, 2 * np.pi, n_rays=90), rc) == 4
        # Non-integer spacing -> no fused path.
        assert beam_bin_stride(LidarConfig(0.0, 1.0, n_rays=7), rc) is None
        # More beams than bins -> no fused path.
        assert (
            beam_bin_stride(
                LidarConfig(0.0, 2 * np.pi, n_rays=720), rc
            )
            is None
        )


@pytest.mark.parametrize("backend", ["sdf", "lut", "lut_fused", "cddt"])
def test_localization_ate_with_fast_backends(backend):
    from slam_tpu.core.config import beam_bin_stride

    h = w = 128
    blocked = jnp.asarray(synthetic_room(h, w))
    rc = RaycastConfig(
        step=1.0,
        max_dist=60.0,
        chunk=16,
        backend="lut" if backend == "lut_fused" else backend,
        lut_bins=96 if backend == "lut_fused" else 256,
    )
    lidar = LidarConfig(max_dist=60.0, n_rays=24, stddev=3.0)
    stride = None
    if backend == "lut_fused":
        stride = beam_bin_stride(lidar, rc)
        assert stride == 4
    cfg = SLAMConfig(
        mcl=MCLConfig(
            n_particles=256, meas_stddev=3.0, lut_beam_stride=stride
        ),
        lidar=lidar,
        motion=MotionConfig(alphas=(0.002, 0.002, 0.002, 0.002)),
        raycast=rc,
    )
    commands = forward_arc_commands(30, trans=1.5, rot=0.12)
    res = run_localization(
        blocked, cfg, commands, Pose.create(40.0, 40.0, 0.3), seed=3
    )
    ate = ate_rmse(res.est_xy, res.gt_xy)
    assert ate < 6.0, f"{backend} ATE {ate}"


def test_localization_ate_with_likelihood_field():
    h = w = 128
    blocked = jnp.asarray(synthetic_room(h, w))
    cfg = SLAMConfig(
        mcl=MCLConfig(
            n_particles=256, meas_stddev=3.0, measurement="likelihood_field"
        ),
        lidar=LidarConfig(max_dist=60.0, n_rays=24, stddev=3.0),
        motion=MotionConfig(alphas=(0.002, 0.002, 0.002, 0.002)),
        raycast=RaycastConfig(step=1.0, max_dist=60.0, backend="sdf"),
    )
    commands = forward_arc_commands(30, trans=1.5, rot=0.12)
    res = run_localization(
        blocked, cfg, commands, Pose.create(40.0, 40.0, 0.3), seed=3
    )
    ate = ate_rmse(res.est_xy, res.gt_xy)
    assert ate < 6.0, f"likelihood_field ATE {ate}"
