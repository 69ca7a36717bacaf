"""Pyramidal Lucas-Kanade optical flow, jittable.

Replaces cv2.calcOpticalFlowPyrLK as used by the reference tracker
(src/tracker/ba_tracker.py:113-126: winSize 15x15, maxLevel 2, 10
iterations, eps 0.03). Coarse-to-fine over a 3-level pyramid; per keypoint
a fixed-iteration LK update with a bilinear-sampled window; everything
vmapped over keypoints into one device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onepose_tpu.utils.precision import fp32_matmuls


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2x downsample ([H, W] -> [H//2, W//2])."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0])
    k2d = jnp.outer(k, k)
    k2d = k2d / jnp.sum(k2d)
    blurred = jax.scipy.signal.convolve2d(img, k2d, mode="same")
    return blurred[::2, ::2]


def _grad(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients (Scharr-free, matches LK needs)."""
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    gy = gy.at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)
    return gx, gy


def _bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    v00 = img[y0i, x0i]
    v10 = img[y0i, x0i + 1]
    v01 = img[y0i + 1, x0i]
    v11 = img[y0i + 1, x0i + 1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v10 * wx * (1 - wy)
        + v01 * (1 - wx) * wy
        + v11 * wx * wy
    )


@fp32_matmuls
@partial(
    jax.jit,
    static_argnames=("win_radius", "num_levels", "iterations"),
)
def pyramidal_lk(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    pts: jnp.ndarray,
    win_radius: int = 7,
    num_levels: int = 3,
    iterations: int = 10,
    eps: float = 0.03,
    min_eig: float = 1e-4,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Track points from img0 to img1.

    img0/img1: [H, W] grayscale float; pts: [N, 2] (x, y).
    Returns (new_pts [N, 2], status [N] bool). win_radius 7 = 15x15 window.
    """
    h, w = img0.shape
    pyr0 = [img0]
    pyr1 = [img1]
    for _ in range(num_levels - 1):
        pyr0.append(_downsample2(pyr0[-1]))
        pyr1.append(_downsample2(pyr1[-1]))

    offs = jnp.arange(-win_radius, win_radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    oy = oy.reshape(-1)
    ox = ox.reshape(-1)

    def track_level(im0, im1, p0, v):
        """One pyramid level for one point: returns (v_new, ok)."""
        gx, gy = _grad(im0)
        ys = p0[1] + oy
        xs = p0[0] + ox
        t0 = _bilinear(im0, ys, xs)
        ix = _bilinear(gx, ys, xs)
        iy = _bilinear(gy, ys, xs)
        G = jnp.array(
            [
                [jnp.sum(ix * ix), jnp.sum(ix * iy)],
                [jnp.sum(ix * iy), jnp.sum(iy * iy)],
            ]
        )
        tr = G[0, 0] + G[1, 1]
        det = G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]
        lam_min = tr / 2 - jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
        ok = lam_min > min_eig * (2 * win_radius + 1) ** 2
        G_inv = jnp.linalg.inv(G + 1e-9 * jnp.eye(2))

        def body(_, val):
            v_cur, done = val
            t1 = _bilinear(im1, ys + v_cur[1], xs + v_cur[0])
            diff = t0 - t1
            b = jnp.array([jnp.sum(diff * ix), jnp.sum(diff * iy)])
            dv = G_inv @ b
            v_new = v_cur + dv
            done_new = done | (jnp.linalg.norm(dv) < eps)
            return (jnp.where(done, v_cur, v_new), done_new)

        v_out, _ = jax.lax.fori_loop(
            0, iterations, body, (v, jnp.asarray(False))
        )
        return v_out, ok

    def track_point(p):
        v = jnp.zeros(2, img0.dtype)
        ok = jnp.asarray(True)
        for lvl in range(num_levels - 1, -1, -1):
            scale = 2.0**lvl
            p_lvl = p / scale
            v, ok_lvl = track_level(pyr0[lvl], pyr1[lvl], p_lvl, v)
            ok = ok & ok_lvl
            if lvl > 0:
                v = v * 2.0
        new_p = p + v
        inside = (
            (new_p[0] >= 0) & (new_p[0] < w - 1)
            & (new_p[1] >= 0) & (new_p[1] < h - 1)
        )
        return new_p, ok & inside

    new_pts, status = jax.vmap(track_point)(pts.astype(img0.dtype))
    return new_pts, status
