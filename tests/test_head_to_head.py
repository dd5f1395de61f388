"""Opt-in head-to-head regression vs the C++ reference (VERDICT r1 item 7).

Runs the reference binary (`tools/refbench/ref_mcl_traj`, built from the
unmodified sources in /root/reference) along its deterministic trajectory,
replays the IDENTICAL trajectory + exact-DDA scans through slam_tpu grid
SLAM, and asserts "slam_tpu SLAM ATE <= C++ RBPF ATE" — the strongest parity
claim in RESULTS.md, as an enforceable test instead of a manual tool.

Opt-in because it needs the reference assets + a one-off native build and
takes ~3 minutes on CPU:

    python -m pytest tests/test_head_to_head.py -m headtohead
"""

import json
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAJ_BIN = os.path.join(REPO, ".build", "ref_mcl_traj")
FLOOR = "/root/reference/assets/floor_plan.png"

pytestmark = pytest.mark.headtohead


def _ensure_binary():
    if os.path.exists(TRAJ_BIN):
        return True
    build = os.path.join(REPO, "tools", "refbench", "build.sh")
    if not os.path.exists("/root/reference/slam/mcl.cpp"):
        return False
    try:
        subprocess.run(["bash", build], check=True, capture_output=True)
    except Exception:
        return False
    return os.path.exists(TRAJ_BIN)


N_REF_RUNS = 5  # the reference's clock-seeded RNG makes single runs noisy
                # (observed ATE spread 11-45px over repeated runs)


@pytest.fixture(scope="module")
def ref_trajs():
    if not os.path.exists(FLOOR):
        pytest.skip("reference floor plan asset unavailable")
    if not _ensure_binary():
        pytest.skip("reference harness binary unavailable")
    runs = []
    for _ in range(N_REF_RUNS):
        out = subprocess.run(
            [TRAJ_BIN, FLOOR, "200", "120", "2.5", "0.02"],
            check=True,
            capture_output=True,
            text=True,
            timeout=600,
        )
        runs.append(
            [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
        )
    return runs


def test_slam_ate_beats_reference(ref_trajs):
    import jax.numpy as jnp

    from slam_tpu.core.config import (
        LidarConfig,
        MapConfig,
        MCLConfig,
        MotionConfig,
        RaycastConfig,
        SLAMConfig,
    )
    from slam_tpu.models.simulate import run_slam_deterministic
    from slam_tpu.utils.maps import load_binary_map
    from slam_tpu.utils.metrics import ate_rmse

    ref_ates = []
    for traj in ref_trajs:
        g = np.array([r["gt"][:2] for r in traj])
        ref_ates.append(ate_rmse(np.array([r["mean"] for r in traj]), g))
    ref_ate = float(np.mean(ref_ates))
    gt_xy = np.array([r["gt"][:2] for r in ref_trajs[0]])

    blocked = jnp.asarray(load_binary_map(FLOOR) == 0)
    h, w = blocked.shape
    cfg = SLAMConfig(
        mcl=MCLConfig(
            n_particles=200, meas_stddev=5.0, scanner_offset=(0.0, 30.0, 0.0)
        ),
        map=MapConfig(height=h, width=w),
        lidar=LidarConfig(start=0.0, stop=2 * np.pi, max_dist=500.0, n_rays=90),
        motion=MotionConfig(alphas=(5e-4, 5e-4, 1e-2, 1e-2)),
        # march = the exact-DDA config of the recorded head-to-head
        # (RESULTS.md: 19.4px vs 25.1px).
        raycast=RaycastConfig(step=0.5, max_dist=500.0, backend="march"),
    )
    res = run_slam_deterministic(blocked, cfg, len(ref_trajs[0]), 2.5, 0.02)

    # Same trajectory on both sides (sanity that the replay is identical).
    np.testing.assert_allclose(res.gt_xy, gt_xy, atol=1e-2)

    ours = ate_rmse(res.est_xy, res.gt_xy)
    print(
        f"\nATE: slam_tpu {ours:.2f}px (deterministic) vs C++ reference "
        f"mean {ref_ate:.2f}px over {len(ref_ates)} runs "
        f"({[round(a, 1) for a in ref_ates]})"
    )
    assert ours <= ref_ate, (
        f"slam_tpu SLAM ATE {ours:.2f}px worse than C++ mean {ref_ate:.2f}px"
    )
