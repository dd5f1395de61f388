"""Trajectory evaluation: absolute trajectory error (ATE).

The reference has no quantitative evaluation (visual inspection only,
SURVEY.md section 4); ATE vs scripted ground truth is the acceptance metric
BASELINE.md names.
"""

from __future__ import annotations

import numpy as np


def fit_se2(est_xy: np.ndarray, gt_xy: np.ndarray):
    """Closed-form rigid SE(2) alignment est -> gt (Umeyama, no scale).

    Returns (R[2,2], t[2]) with gt ~= est @ R.T + t.
    """
    est = np.asarray(est_xy, np.float64)
    gt = np.asarray(gt_xy, np.float64)
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    h = (est - mu_e).T @ (gt - mu_g)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, d]) @ u.T
    t = mu_g - r @ mu_e
    return r, t


def ate_rmse(est_xy: np.ndarray, gt_xy: np.ndarray, align: bool = False) -> float:
    """RMSE of position error between two [T, 2] trajectories.

    With align=True, applies the closed-form SE(2) Umeyama alignment first
    (useful when comparing trajectories estimated in different frames; SLAM
    and GT here share a frame, so the default is unaligned).
    """
    est = np.asarray(est_xy, np.float64)
    gt = np.asarray(gt_xy, np.float64)
    assert est.shape == gt.shape and est.ndim == 2 and est.shape[1] == 2

    if align:
        r, t = fit_se2(est, gt)
        est = est @ r.T + t

    err = est - gt
    return float(np.sqrt(np.mean(np.sum(err * err, axis=1))))
