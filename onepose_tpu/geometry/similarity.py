"""Batched 2D similarity (4-DoF) RANSAC.

Replaces cv2.estimateAffinePartial2D (reference
src/local_feature_2D_detector/local_feature_2D_detector.py:103-105, RANSAC
threshold 6 px): estimates z -> alpha * z + beta over complex coordinates
(alpha = s * e^{i theta}) from 2-point minimal samples, scores a fixed
batch of hypotheses in one fused dispatch, then refits on inliers by
weighted least squares. Fully jittable and vmappable over detector views.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onepose_tpu.utils.precision import fp32_matmuls


def _fit_two_point(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Similarity from 2 correspondences; returns [4]: (re a, im a, re b, im b)."""
    az = a[..., 0, 0] + 1j * a[..., 0, 1]
    az2 = a[..., 1, 0] + 1j * a[..., 1, 1]
    bz = b[..., 0, 0] + 1j * b[..., 0, 1]
    bz2 = b[..., 1, 0] + 1j * b[..., 1, 1]
    denom = az2 - az
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9 + 0j, denom)
    alpha = (bz2 - bz) / denom
    beta = bz - alpha * az
    return jnp.stack(
        [alpha.real, alpha.imag, beta.real, beta.imag], axis=-1
    )


def _apply(params: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (alpha, beta) to [..., N, 2] points."""
    ar, ai, br, bi = (
        params[..., 0:1], params[..., 1:2], params[..., 2:3], params[..., 3:4]
    )
    x, y = pts[..., 0], pts[..., 1]
    return jnp.stack(
        [ar[..., 0] * x - ai[..., 0] * y + br[..., 0],
         ai[..., 0] * x + ar[..., 0] * y + bi[..., 0]],
        axis=-1,
    )


def _refit_ls(src, dst, w):
    """Weighted least-squares similarity fit (closed form over complex)."""
    ws = jnp.maximum(jnp.sum(w), 1e-9)
    sz = src[..., 0] + 1j * src[..., 1]
    dz = dst[..., 0] + 1j * dst[..., 1]
    mu_s = jnp.sum(sz * w) / ws
    mu_d = jnp.sum(dz * w) / ws
    num = jnp.sum(w * (dz - mu_d) * jnp.conj(sz - mu_s))
    den = jnp.sum(w * jnp.abs(sz - mu_s) ** 2)
    alpha = num / jnp.maximum(den, 1e-12)
    beta = mu_d - alpha * mu_s
    return jnp.stack([alpha.real, alpha.imag, beta.real, beta.imag])


@fp32_matmuls
@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_similarity(
    key: jax.Array,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    mask: jnp.ndarray,
    inlier_px: float = 6.0,
    n_hyp: int = 128,
) -> dict:
    """RANSAC similarity transform src -> dst.

    src/dst: [N, 2]; mask: [N]. Returns dict(params [4], A [2, 3] affine
    matrix (cv2 layout), inliers [N], num_inliers, ok).
    """
    n = src.shape[0]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hyp, n)) + logits[None, :]
    _, idx = jax.lax.top_k(g, 2)  # [H, 2]

    params = _fit_two_point(src[idx], dst[idx])  # [H, 4]
    pred = _apply(params[:, None, :], src[None, :, :])  # [H, N, 2]
    err = jnp.linalg.norm(pred - dst[None], axis=-1)
    inl = (err < inlier_px) & mask[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    inliers = inl[best]

    refined = _refit_ls(src, dst, inliers.astype(src.dtype))
    pred_r = _apply(refined[None, :], src)
    err_r = jnp.linalg.norm(pred_r - dst, axis=-1)
    inliers_r = (err_r < inlier_px) & mask
    use_refined = jnp.sum(inliers_r) >= counts[best]
    out_params = jnp.where(use_refined, refined, params[best])
    out_inliers = jnp.where(use_refined, inliers_r, inliers)

    ar, ai, br, bi = out_params
    A = jnp.array([[ar, -ai, br], [ai, ar, bi]])
    num = jnp.sum(out_inliers)
    return {
        "params": out_params,
        "A": A,
        "inliers": out_inliers,
        "num_inliers": num,
        "ok": num >= 2,
    }
