"""Batched multi-view triangulation (DLT) with masked observations.

Replaces the reference's COLMAP `point_triangulator` subprocess
(src/sfm/triangulation.py:122-168) and cv2.triangulatePoints
(src/tracker/ba_tracker.py:267-273) with on-device, fixed-shape linear
algebra: every track is padded to T observations with a validity mask, and
thousands of tracks are solved in one batched 4x4 eigendecomposition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from onepose_tpu.geometry.projection import project_points

from onepose_tpu.utils.precision import fp32_matmuls


def _dlt_solve(A_sq: jnp.ndarray) -> jnp.ndarray:
    """Smallest eigenvector of symmetric [..., 4, 4] (null space of A)."""
    # eigh returns ascending eigenvalues.
    _, vecs = jnp.linalg.eigh(A_sq)
    return vecs[..., :, 0]


@fp32_matmuls
def triangulate_tracks_dlt(
    uv: jnp.ndarray,
    P: jnp.ndarray,
    obs_mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Triangulate tracks with known cameras by masked DLT.

    Args:
      uv: [..., T, 2] pixel observations per track.
      P: [..., T, 3, 4] projection matrices (K @ [R|t]) per observation.
      obs_mask: [..., T] bool validity of each observation.
    Returns:
      (xyz [..., 3] world points, ok [...] bool — at least 2 valid
      observations and a well-conditioned system).
    """
    w = obs_mask.astype(uv.dtype)
    # Rows: u*P2 - P0 and v*P2 - P1, zeroed where masked.
    r0 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]  # [..., T, 4]
    r1 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    r0 = r0 * w[..., None]
    r1 = r1 * w[..., None]
    A_sq = jnp.einsum("...ti,...tj->...ij", r0, r0) + jnp.einsum(
        "...ti,...tj->...ij", r1, r1
    )
    x = _dlt_solve(A_sq)
    wcomp = x[..., 3]
    xyz = x[..., :3] / jnp.where(jnp.abs(wcomp) < 1e-12, 1e-12, wcomp)[..., None]
    n_obs = jnp.sum(obs_mask, axis=-1)
    ok = (n_obs >= 2) & (jnp.abs(wcomp) > 1e-12) & jnp.all(jnp.isfinite(xyz), axis=-1)
    return xyz, ok


@fp32_matmuls
def triangulate_two_view(
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    P0: jnp.ndarray,
    P1: jnp.ndarray,
) -> jnp.ndarray:
    """Two-view DLT for [..., N, 2] correspondences; returns [..., N, 3]."""
    uv = jnp.stack([uv0, uv1], axis=-2)  # [..., N, 2, 2]
    P = jnp.broadcast_to(
        jnp.stack([P0, P1], axis=-3)[..., None, :, :, :],
        uv.shape[:-2] + (2, 3, 4),
    )
    mask = jnp.ones(uv.shape[:-1], dtype=bool)
    xyz, _ = triangulate_tracks_dlt(uv, P, mask)
    return xyz


def triangulation_residuals(
    xyz: jnp.ndarray,
    uv: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    obs_mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-track mean reprojection error and positive-depth check.

    Args:
      xyz: [..., 3]; uv: [..., T, 2]; K/R: [..., T, 3, 3]; t: [..., T, 3];
      obs_mask: [..., T].
    Returns:
      (mean_err [...], frac_pos_depth [...]).
    """
    p_cam = jnp.einsum("...tij,...j->...ti", R, xyz) + t
    depth = p_cam[..., 2]
    pix = jnp.einsum("...tij,...tj->...ti", K, p_cam)
    uv_hat = pix[..., :2] / jnp.maximum(jnp.abs(pix[..., 2:3]), 1e-9)
    err = jnp.linalg.norm(uv_hat - uv, axis=-1)
    w = obs_mask.astype(err.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    mean_err = jnp.sum(err * w, axis=-1) / n
    frac_pos = jnp.sum((depth > 0) * w, axis=-1) / n
    return mean_err, frac_pos


@fp32_matmuls
def refine_points_gn(
    xyz0: jnp.ndarray,
    uv: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    obs_mask: jnp.ndarray,
    iters: int = 5,
    damping: float = 1e-4,
) -> jnp.ndarray:
    """Levenberg-style Gauss-Newton refinement of triangulated points.

    Batched over tracks; each step solves a 3x3 normal system per track.
    This is the on-device analogue of COLMAP's point refinement.
    """

    def residual(x, uv_t, K_t, R_t, t_t):
        p = R_t @ x + t_t
        pix = K_t @ p
        return pix[:2] / jnp.maximum(jnp.abs(pix[2]), 1e-9) - uv_t  # [2]

    def step(xyz, _):
        def track_step(x, uv_i, K_i, R_i, t_i, m_i):
            # Per-observation residual [T, 2] and Jacobian [T, 2, 3].
            J = jax.vmap(lambda a, b, c, d: jax.jacfwd(residual)(x, a, b, c, d))(
                uv_i, K_i, R_i, t_i
            )
            r = jax.vmap(lambda a, b, c, d: residual(x, a, b, c, d))(
                uv_i, K_i, R_i, t_i
            )
            w = m_i.astype(x.dtype)[:, None]
            Jw = J * w[..., None]
            H = jnp.einsum("tri,trj->ij", Jw, J) + damping * jnp.eye(3, dtype=x.dtype)
            g = jnp.einsum("tri,tr->i", Jw, r * w)
            dx = jnp.linalg.solve(H, -g)
            return x + dx

        xyz = jax.vmap(track_step)(xyz, uv, K, R, t, obs_mask)
        return xyz, None

    xyz, _ = jax.lax.scan(step, xyz0, None, length=iters)
    return xyz
