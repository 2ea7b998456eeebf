"""Trajectory evaluation: ATE and RPE.

The BASELINE metric is ATE parity vs the reference pipeline; the reference
itself ships no evaluation tooling (SURVEY.md §6), so this supplies it:
absolute trajectory error after optional Sim(3)/SE(3) alignment (monocular
trajectories are scale-ambiguous — Sim(3) alignment is the standard
protocol) and relative pose error over a frame delta.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from da3slam_tpu.ops.registration import umeyama


class TrajectoryErrors(NamedTuple):
    ate_rmse: float
    ate_mean: float
    ate_median: float
    rpe_trans_rmse: float
    rpe_rot_deg_rmse: float
    scale: float  # Sim(3) alignment scale applied to the estimate


def _centers(poses_c2w: np.ndarray) -> np.ndarray:
    return np.asarray(poses_c2w)[:, :3, 3]


def evaluate_trajectory(
    est_c2w: np.ndarray,
    gt_c2w: np.ndarray,
    align: str = "sim3",
    rpe_delta: int = 1,
) -> TrajectoryErrors:
    """Compare two ``[N, 4, 4]`` c2w trajectories.

    align: "sim3" (scale+rigid, the monocular protocol), "se3", or "none".
    """
    est = np.asarray(est_c2w, np.float64)
    gt = np.asarray(gt_c2w, np.float64)
    if est.shape != gt.shape:
        raise ValueError(f"trajectory shapes differ: {est.shape} vs {gt.shape}")

    p_est, p_gt = _centers(est), _centers(gt)
    s, R, t = 1.0, np.eye(3), np.zeros(3)
    if align != "none":
        T = umeyama(
            jnp.asarray(p_est, jnp.float32),
            jnp.asarray(p_gt, jnp.float32),
            with_scale=(align == "sim3"),
        )
        s, R, t = float(T.s), np.asarray(T.R, np.float64), np.asarray(T.t, np.float64)

    p_al = s * (p_est @ R.T) + t
    err = np.linalg.norm(p_al - p_gt, axis=-1)
    ate_rmse = float(np.sqrt(np.mean(err**2)))

    # RPE over delta: relative motions of aligned estimate vs gt
    def rel(poses, scale=1.0):
        out = []
        for i in range(len(poses) - rpe_delta):
            a = poses[i].copy()
            b = poses[i + rpe_delta].copy()
            a[:3, 3] *= scale
            b[:3, 3] *= scale
            out.append(np.linalg.inv(a) @ b)
        return np.stack(out)

    r_est = rel(est, s)
    r_gt = rel(gt)
    d = np.matmul(np.linalg.inv(r_gt), r_est)
    rpe_t = float(np.sqrt(np.mean(np.linalg.norm(d[:, :3, 3], axis=-1) ** 2)))
    cos = np.clip((np.trace(d[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
    rpe_r = float(np.sqrt(np.mean(np.degrees(np.arccos(cos)) ** 2)))

    return TrajectoryErrors(
        ate_rmse=ate_rmse,
        ate_mean=float(err.mean()),
        ate_median=float(np.median(err)),
        rpe_trans_rmse=rpe_t,
        rpe_rot_deg_rmse=rpe_r,
        scale=s,
    )
