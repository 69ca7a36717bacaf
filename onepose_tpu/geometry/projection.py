"""Pinhole projection and reprojection errors (jit/vmap-safe)."""

from __future__ import annotations

import jax.numpy as jnp


def project_points(
    pts3d: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    eps: float = 1e-9,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points through a pinhole camera.

    Args:
      pts3d: [..., N, 3] world points.
      K: [..., 3, 3] intrinsics.
      R: [..., 3, 3] world->camera rotation.
      t: [..., 3] world->camera translation.
    Returns:
      (uv [..., N, 2] pixel coords, depth [..., N]).
    """
    p_cam = jnp.einsum("...ij,...nj->...ni", R, pts3d) + t[..., None, :]
    depth = p_cam[..., 2]
    p_img = jnp.einsum("...ij,...nj->...ni", K, p_cam)
    z = p_img[..., 2:3]
    z_safe = jnp.where(z >= 0, jnp.maximum(z, eps), jnp.minimum(z, -eps))
    uv = p_img[..., :2] / z_safe
    return uv, depth


def reprojection_errors(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Euclidean pixel reprojection error per point [..., N]."""
    uv, _ = project_points(pts3d, K, R, t)
    return jnp.linalg.norm(uv - pts2d, axis=-1)
