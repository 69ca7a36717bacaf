"""Pose-error metrics: cm-degree recall, the OnePose acceptance metric.

Behavioral contract from the reference (src/utils/eval_utils.py:45-120):
translation error in centimeters (||t_pred - t_gt|| * 100), rotation error as
the geodesic angle in degrees; recall at thresholds {1, 3, 5} requires BOTH
trans < X cm AND rot < X deg.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def query_pose_error(pose_pred: jnp.ndarray, pose_gt: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation (deg) and translation (cm) error between [..., 3/4, 4] poses.

    Jit/vmap-safe; works batched.
    """
    Rp = pose_pred[..., :3, :3]
    Rg = pose_gt[..., :3, :3]
    tp = pose_pred[..., :3, 3]
    tg = pose_gt[..., :3, 3]
    trans_err_cm = jnp.linalg.norm(tp - tg, axis=-1) * 100.0
    rel = jnp.einsum("...ij,...kj->...ik", Rp, Rg)  # Rp @ Rg^T
    trace = jnp.trace(rel, axis1=-2, axis2=-1)
    trace = jnp.clip(trace, -1.0, 3.0)
    rot_err_deg = jnp.rad2deg(jnp.arccos((trace - 1.0) / 2.0))
    return rot_err_deg, trans_err_cm


def aggregate_metrics(R_errs, t_errs, thresholds=(1, 3, 5)) -> dict:
    """cm-deg recall at each threshold over a dataset (host-side)."""
    R = np.asarray(R_errs, dtype=np.float64)
    t = np.asarray(t_errs, dtype=np.float64)
    out = {}
    for thr in thresholds:
        out[f"{thr}cm@{thr}degree"] = float(np.mean((R < thr) & (t < thr))) if R.size else 0.0
    return out
