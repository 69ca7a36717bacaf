"""Fixed-iteration batched RANSAC-PnP + SE(3) Gauss-Newton refinement.

TPU-native replacement for cv2.solvePnPRansac(SOLVEPNP_EPNP,
reprojectionError=5, iterationsCount=10000) as used by the reference
(src/utils/eval_utils.py:28-29): data-dependent adaptive iteration becomes a
fixed batch of minimal-sample hypotheses scored in one fused dispatch —
statistically equivalent coverage, no host round-trips, jit/vmap-safe so
whole frame batches solve at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onepose_tpu.geometry.epnp import epnp_solve
from onepose_tpu.geometry.p3p import p3p_solve
from onepose_tpu.geometry.rotations import (
    angle_axis_to_rotmat,
    rotmat_to_angle_axis,
)
from onepose_tpu.utils.precision import fp32_matmuls


def _sample_minimal_sets(
    key, order: jnp.ndarray, n_valid: jnp.ndarray, n_hyp: int, k: int = 4
) -> jnp.ndarray:
    """[n_hyp, k] valid indices, sampled uniformly WITH replacement.

    `order` lists the valid indices first (mask-compacted); n_hyp*k uniform
    draws index into the first n_valid of them. Collisions within a sample
    (probability ~k^2/2n) are rejected by the caller — vastly cheaper than
    per-sample distinct sampling (Gumbel + top_k over [n_hyp, n] measured
    ~60 ms/batch on v5e; this is <1 ms)."""
    u = jax.random.uniform(key, (n_hyp, k))
    r = jnp.minimum(
        (u * jnp.maximum(n_valid, 1).astype(u.dtype)).astype(jnp.int32),
        jnp.maximum(n_valid - 1, 0),
    )
    return order[r]


def _reproj_err(R, t, K, pts3d, pts2d):
    p_cam = pts3d @ R.T + t
    pix = p_cam @ K.T
    z = pix[:, 2]
    uv = pix[:, :2] / jnp.maximum(jnp.abs(z[:, None]), 1e-9)
    err = jnp.linalg.norm(uv - pts2d, axis=-1)
    # Points behind the camera can never be inliers.
    return jnp.where(z > 1e-6, err, jnp.inf)


def _gn_refine(R0, t0, K, pts3d, pts2d, weights, iters: int = 5, damping: float = 1e-6):
    """Gauss-Newton on (angle-axis, t) minimizing weighted reprojection."""
    aa0 = rotmat_to_angle_axis(R0)
    x0 = jnp.concatenate([aa0, t0])

    def residuals(x):
        R = angle_axis_to_rotmat(x[:3])
        p_cam = pts3d @ R.T + x[3:]
        pix = p_cam @ K.T
        z = jnp.maximum(jnp.abs(pix[:, 2]), 1e-9)
        uv = pix[:, :2] / z[:, None]
        return ((uv - pts2d) * weights[:, None]).reshape(-1)

    def step(x, _):
        J = jax.jacfwd(residuals)(x)  # [2N, 6]
        r = residuals(x)
        H = J.T @ J + damping * jnp.eye(6, dtype=x.dtype)
        dx = jnp.linalg.solve(H, -J.T @ r)
        return x + dx, None

    x, _ = jax.lax.scan(step, x0, None, length=iters)
    return angle_axis_to_rotmat(x[:3]), x[3:]


@fp32_matmuls
@partial(jax.jit, static_argnames=("n_hyp", "refine_iters", "epnp_refit"))
def ransac_pnp(
    key: jax.Array,
    pts2d: jnp.ndarray,
    pts3d: jnp.ndarray,
    K: jnp.ndarray,
    mask: jnp.ndarray,
    reproj_threshold: float = 5.0,
    n_hyp: int = 512,
    refine_iters: int = 5,
    scale: float = 1000.0,
    epnp_refit: bool = False,
) -> dict:
    """RANSAC EPnP over masked 2D-3D matches.

    Args:
      key: PRNG key for hypothesis sampling.
      pts2d: [N, 2]; pts3d: [N, 3]; K: [3, 3]; mask: [N] valid matches.
      reproj_threshold: inlier threshold in pixels (reference uses 5).
      n_hyp: number of minimal 3-point P3P samples; each yields up to 4
        candidate poses, all scored in parallel.
      scale: internal metric scale (reference multiplies points by 1000 —
        mm-scale conditioning for EPnP); results are returned unscaled.
    Returns:
      dict(pose_4x4, R, t, inliers [N] bool, num_inliers, ok).
    """
    dtype = jnp.float32
    pts2d = pts2d.astype(dtype)
    pts3d_s = pts3d.astype(dtype) * scale

    # Minimal hypotheses via closed-form P3P (pure elementwise math, no
    # decompositions — the EPnP eigen route is ~30x slower on TPU); each
    # 3-point sample yields up to 4 candidate poses, all scored.
    order = jnp.argsort(~mask)  # stable: valid indices first
    n_valid = jnp.sum(mask)
    idx = _sample_minimal_sets(key, order, n_valid, n_hyp, k=3)  # [H, 3]
    distinct = (
        (idx[:, 0] != idx[:, 1])
        & (idx[:, 0] != idx[:, 2])
        & (idx[:, 1] != idx[:, 2])
    )  # [H]

    def solve_one(ids):
        return p3p_solve(pts3d_s[ids], pts2d[ids], K)

    Rs, ts, oks = jax.vmap(solve_one)(idx)  # [H, 4, ...]
    Rs = Rs.reshape(-1, 3, 3)
    ts = ts.reshape(-1, 3)
    oks = (oks & distinct[:, None]).reshape(-1)

    # Preemptive two-stage scoring: rank all 4H candidate poses on a
    # mask-compacted point subset, then fully score only the survivors —
    # ~8x less reprojection traffic at identical best-pose selection
    # quality for realistic inlier fractions.
    n = pts2d.shape[0]
    n_sub = min(128, n)
    n_keep = min(64, 4 * n_hyp)
    sub_ids = order[:n_sub]
    sub_valid = jnp.arange(n_sub) < n_valid  # first n_valid are the real ones
    errs_sub = jax.vmap(
        lambda R, t: _reproj_err(R, t, K, pts3d_s[sub_ids], pts2d[sub_ids])
    )(Rs, ts)
    counts_sub = jnp.sum(
        (errs_sub < reproj_threshold) & sub_valid[None, :], axis=-1
    ) * oks.astype(jnp.int32)
    _, keep = jax.lax.top_k(counts_sub, n_keep)

    errs = jax.vmap(
        lambda R, t: _reproj_err(R, t, K, pts3d_s, pts2d)
    )(Rs[keep], ts[keep])
    inl = (errs < reproj_threshold) & mask[None, :]
    counts = jnp.sum(inl, axis=-1) * oks[keep].astype(jnp.int32)
    best = jnp.argmax(counts)
    R_best, t_best = Rs[keep[best]], ts[keep[best]]
    inliers = inl[best]
    n_in = counts[best]

    # Refine on inliers. Gauss-Newton from the consensus-best P3P pose
    # converges to the same optimum as cv2's EPnP-on-inliers refit at a
    # fraction of the cost (the 12x12 eigh refit measured 1.66 ms/batch-8
    # on v5e); epnp_refit=True restores the EPnP re-solve as an extra
    # initialization candidate.
    if epnp_refit:
        R_ref, t_ref, ok_ref = epnp_solve(pts3d_s, pts2d, K, inliers)
        use_ref = ok_ref & (
            jnp.sum(_reproj_err(R_ref, t_ref, K, pts3d_s, pts2d) * inliers)
            <= jnp.sum(
                _reproj_err(R_best, t_best, K, pts3d_s, pts2d) * inliers
            )
        )
        R1 = jnp.where(use_ref, R_ref, R_best)
        t1 = jnp.where(use_ref, t_ref, t_best)
    else:
        R1, t1 = R_best, t_best
    R2, t2 = _gn_refine(R1, t1, K, pts3d_s, pts2d, inliers.astype(dtype), iters=refine_iters)

    # Recompute inliers after refinement.
    err_final = _reproj_err(R2, t2, K, pts3d_s, pts2d)
    inliers_final = (err_final < reproj_threshold) & mask

    ok = n_in >= 4
    R_out = jnp.where(ok, R2, jnp.eye(3, dtype=dtype))
    t_out = jnp.where(ok, t2 / scale, jnp.zeros(3, dtype=dtype))
    pose = jnp.eye(4, dtype=dtype)
    pose = pose.at[:3, :3].set(R_out).at[:3, 3].set(t_out)
    return {
        "pose": pose,
        "R": R_out,
        "t": t_out,
        "inliers": inliers_final & ok,
        "num_inliers": jnp.where(ok, jnp.sum(inliers_final & mask), 0),
        "ok": ok,
    }
