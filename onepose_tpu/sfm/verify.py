"""Two-view geometric verification on device.

Replaces COLMAP `matches_importer` (reference src/sfm/triangulation.py:18-35)
for the known-pose mapping setting: with GT relative pose available, matches
are verified directly against the epipolar constraint — symmetric epipolar
distance w.r.t. the essential matrix E = [t_rel]x R_rel lifted to pixels by
the intrinsics — instead of RANSAC-estimating two-view geometry. Batched
over pairs, jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onepose_tpu.utils.precision import fp32_matmuls


def _skew(t: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(t[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -t[..., 2], t[..., 1]], axis=-1),
            jnp.stack([t[..., 2], z, -t[..., 0]], axis=-1),
            jnp.stack([-t[..., 1], t[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def fundamental_from_poses(
    K0: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    K1: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
) -> jnp.ndarray:
    """F mapping pixels of image 0 to epipolar lines in image 1.

    Poses are world->camera. Relative pose cam0->cam1:
    R_rel = R1 R0^T, t_rel = t1 - R_rel t0; E = [t_rel]x R_rel;
    F = K1^-T E K0^-1. Batched over leading dims.
    """
    R_rel = R1 @ jnp.swapaxes(R0, -1, -2)
    t_rel = t1 - jnp.einsum("...ij,...j->...i", R_rel, t0)
    E = _skew(t_rel) @ R_rel
    K1_invT = jnp.swapaxes(jnp.linalg.inv(K1), -1, -2)
    K0_inv = jnp.linalg.inv(K0)
    return K1_invT @ E @ K0_inv


def symmetric_epipolar_distance(
    uv0: jnp.ndarray, uv1: jnp.ndarray, F: jnp.ndarray
) -> jnp.ndarray:
    """Symmetric epipolar distance in pixels for [..., N, 2] matches."""
    ones = jnp.ones_like(uv0[..., :1])
    x0 = jnp.concatenate([uv0, ones], axis=-1)
    x1 = jnp.concatenate([uv1, ones], axis=-1)
    Fx0 = jnp.einsum("...ij,...nj->...ni", F, x0)  # lines in image 1
    Ftx1 = jnp.einsum("...ji,...nj->...ni", F, x1)  # lines in image 0
    num = jnp.abs(jnp.sum(x1 * Fx0, axis=-1))
    d1 = num / jnp.maximum(
        jnp.linalg.norm(Fx0[..., :2], axis=-1), 1e-9
    )
    d0 = num / jnp.maximum(
        jnp.linalg.norm(Ftx1[..., :2], axis=-1), 1e-9
    )
    return 0.5 * (d0 + d1)


@fp32_matmuls
@partial(jax.jit, static_argnames=())
def epipolar_verify_matches(
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    match_mask: jnp.ndarray,
    K0: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    K1: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    max_epipolar_px: float = 4.0,
) -> jnp.ndarray:
    """Verify matched point pairs against the known relative pose.

    uv0/uv1: [..., N, 2] matched pixel pairs (uv1[i] matched to uv0[i]);
    match_mask: [..., N] validity. Returns the refined mask. The 4 px gate
    mirrors COLMAP's default two-view geometry max error.
    """
    F = fundamental_from_poses(K0, R0, t0, K1, R1, t1)
    d = symmetric_epipolar_distance(uv0, uv1, F)
    return match_mask & (d < max_epipolar_px)
