"""Track triangulation: gather observations, DLT, refine, gate.

Replaces the triangulation half of COLMAP `point_triangulator`
(reference src/sfm/triangulation.py:122-148, refinement disabled there for
intrinsics/extrinsics but point positions solved by multi-view DLT +
COLMAP's internal point refinement). Here: one batched masked DLT over all
tracks, Gauss-Newton point refinement, and COLMAP-equivalent gating
(max reprojection error, positive depth, minimum triangulation angle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onepose_tpu.geometry.triangulation import (
    refine_points_gn,
    triangulate_tracks_dlt,
    triangulation_residuals,
)
from onepose_tpu.utils.precision import fp32_matmuls


def gather_track_observations(
    tracks_obs_frame: jnp.ndarray,
    tracks_obs_kpt: jnp.ndarray,
    tracks_obs_mask: jnp.ndarray,
    keypoints: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
):
    """Gather per-track (uv, K, R, t) tensors from per-frame arrays.

    tracks_*: [T, L] padded track layout (see sfm.tracks.Tracks).
    keypoints: [F, N, 2] all frames' keypoints; K/R/t: [F, ...] cameras.
    Returns (uv [T, L, 2], K_t [T, L, 3, 3], R_t [T, L, 3, 3], t_t [T, L, 3]).
    """
    f = jnp.maximum(tracks_obs_frame, 0)
    k = jnp.maximum(tracks_obs_kpt, 0)
    uv = keypoints[f, k]  # [T, L, 2]
    return uv, K[f], R[f], t[f]


def triangulation_angles(
    xyz: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    obs_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Max pairwise triangulation angle (deg) per track.

    xyz: [T, 3]; R/t: [T, L, ...]; obs_mask: [T, L]. The ray set per track
    is small (L <= 32), so the pairwise form stays cheap on device.
    """
    centers = -jnp.einsum("tlji,tlj->tli", R, t)  # [T, L, 3]
    rays = xyz[:, None, :] - centers
    rays = rays / jnp.maximum(
        jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12
    )
    cos = jnp.einsum("tli,tmi->tlm", rays, rays)
    pair_mask = obs_mask[:, :, None] & obs_mask[:, None, :]
    cos = jnp.where(pair_mask, jnp.clip(cos, -1.0, 1.0), 1.0)
    min_cos = jnp.min(cos, axis=(-1, -2))
    return jnp.degrees(jnp.arccos(min_cos))


@fp32_matmuls
@partial(
    jax.jit,
    static_argnames=("refine_iters",),
)
def triangulate_and_filter_tracks(
    tracks_obs_frame: jnp.ndarray,
    tracks_obs_kpt: jnp.ndarray,
    tracks_obs_mask: jnp.ndarray,
    keypoints: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    max_reproj_px: float = 4.0,
    min_tri_angle_deg: float = 1.5,
    refine_iters: int = 5,
) -> dict:
    """Full on-device triangulation of the padded track set.

    Returns dict(xyz [T, 3], ok [T], mean_reproj [T], tri_angle [T],
    obs_inlier [T, L] per-observation reprojection gate).
    Gates follow COLMAP point_triangulator defaults (4 px, 1.5 deg).
    """
    uv, K_t, R_t, t_t = gather_track_observations(
        tracks_obs_frame, tracks_obs_kpt, tracks_obs_mask, keypoints, K, R, t
    )
    P = jnp.einsum(
        "tlij,tljk->tlik",
        K_t,
        jnp.concatenate([R_t, t_t[..., None]], axis=-1),
    )  # [T, L, 3, 4]
    xyz0, ok_dlt = triangulate_tracks_dlt(uv, P, tracks_obs_mask)
    xyz = refine_points_gn(
        xyz0, uv, K_t, R_t, t_t, tracks_obs_mask, iters=refine_iters
    )
    # Keep the refinement only where it is finite.
    xyz = jnp.where(
        jnp.all(jnp.isfinite(xyz), axis=-1, keepdims=True), xyz, xyz0
    )

    mean_err, frac_pos = triangulation_residuals(
        xyz, uv, K_t, R_t, t_t, tracks_obs_mask
    )
    angle = triangulation_angles(xyz, R_t, t_t, tracks_obs_mask)

    # Per-observation gate for downstream observation pruning.
    p_cam = jnp.einsum("tlij,tj->tli", R_t, xyz) + t_t
    pix = jnp.einsum("tlij,tlj->tli", K_t, p_cam)
    uv_hat = pix[..., :2] / jnp.maximum(jnp.abs(pix[..., 2:3]), 1e-9)
    obs_err = jnp.linalg.norm(uv_hat - uv, axis=-1)
    obs_inlier = (
        tracks_obs_mask & (obs_err < max_reproj_px) & (p_cam[..., 2] > 0)
    )

    ok = (
        ok_dlt
        & (mean_err < max_reproj_px)
        & (frac_pos > 0.99)
        & (angle > min_tri_angle_deg)
        & (jnp.sum(obs_inlier, axis=-1) >= 2)
    )
    return {
        "xyz": xyz,
        "ok": ok,
        "mean_reproj": mean_err,
        "tri_angle": angle,
        "obs_inlier": obs_inlier,
    }
