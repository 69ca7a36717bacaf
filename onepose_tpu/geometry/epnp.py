"""Batched EPnP: closed-form pose from masked 2D-3D correspondences.

Replaces cv2.solvePnPRansac(..., flags=SOLVEPNP_EPNP) (reference behavior at
src/utils/eval_utils.py:18-42) with a fully jittable, vmap-able solver:

1. Four control points from the weighted centroid + PCA of the 3D points.
2. Barycentric coordinates per point.
3. M^T M (12x12) eigendecomposition -> null-space basis.
4. beta initialization from the 1-vector case + Gauss-Newton refinement of
   the 4 betas on the control-point distance constraints (the EPnP paper's
   relinearization step, batched).
5. Camera-frame control points -> camera points -> weighted Kabsch for R, t.

Everything is O(small dense linalg): one 12x12 eigh, one 3x3 SVD — ideal for
vmapping thousands of RANSAC hypotheses into a single TPU dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from onepose_tpu.utils.precision import fp32_matmuls

_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _control_points(pts3d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[4, 3] control points: centroid + scaled principal axes."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(pts3d * w[:, None], axis=0) / wsum
    centered = (pts3d - c0) * w[:, None]
    cov = centered.T @ (pts3d - c0) / wsum
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    # Scale axes by sqrt(variance); clamp so planar/degenerate clouds still
    # give an invertible basis.
    max_std = jnp.sqrt(jnp.maximum(eigval[2], 1e-12))
    std = jnp.sqrt(jnp.maximum(eigval, 1e-12))
    std = jnp.maximum(std, 1e-3 * jnp.maximum(max_std, 1e-6))
    ctrl = c0[None, :] + (eigvec * std[None, :]).T  # rows = c0 + std_i * v_i
    return jnp.concatenate([c0[None, :], ctrl], axis=0)  # [4, 3]


def _barycentric(pts3d: jnp.ndarray, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Alphas [N, 4] s.t. p = sum_j alpha_j * ctrl_j, sum alpha = 1."""
    basis = (ctrl[1:] - ctrl[0]).T  # [3, 3]
    coeff = jnp.linalg.solve(basis, (pts3d - ctrl[0]).T).T  # [N, 3]
    a0 = 1.0 - jnp.sum(coeff, axis=-1, keepdims=True)
    return jnp.concatenate([a0, coeff], axis=-1)


def _build_MtM(alphas: jnp.ndarray, pts2d: jnp.ndarray, K: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Accumulate M^T M [12, 12] without materializing M [2N, 12]."""
    fu, fv = K[0, 0], K[1, 1]
    uc, vc = K[0, 2], K[1, 2]
    u, v = pts2d[:, 0], pts2d[:, 1]
    N = alphas.shape[0]
    zeros = jnp.zeros((N, 4), alphas.dtype)
    # Row u: [a*fu, 0, a*(uc-u)] interleaved over control points.
    ru = jnp.stack([alphas * fu, zeros, alphas * (uc - u)[:, None]], axis=-1)  # [N,4,3]
    rv = jnp.stack([zeros, alphas * fv, alphas * (vc - v)[:, None]], axis=-1)
    ru = ru.reshape(N, 12) * w[:, None]
    rv = rv.reshape(N, 12) * w[:, None]
    return ru.T @ ru + rv.T @ rv


def _beta_inits(V: jnp.ndarray, dist_w: jnp.ndarray) -> jnp.ndarray:
    """Closed-form beta initializations for EPnP cases N=1, 2, 3.

    V: [4 basis, 4 ctrl, 3]. Returns [3, 4] candidate beta vectors. The three
    cases assume the camera-frame control points use 1, 2 or 3 null-space
    basis vectors; each yields a linear system in the products beta_a*beta_b
    over the 6 control-point distance constraints.
    """
    diffs = jnp.stack([V[:, i, :] - V[:, j, :] for i, j in _PAIRS], axis=1)  # [4, 6, 3]
    # Gram of basis-vector differences per pair: g[a, b, p] = dv_a[p]·dv_b[p]
    g = jnp.einsum("aps,bps->abp", diffs, diffs)
    rho = dist_w**2  # [6]
    dtype = V.dtype

    # Case N=1: b1^2 * g[0,0] = rho.
    b1_sq = jnp.sum(g[0, 0] * rho) / jnp.maximum(jnp.sum(g[0, 0] ** 2), 1e-12)
    beta_c1 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype) * jnp.sqrt(jnp.maximum(b1_sq, 0.0))

    # Case N=2: unknowns [b11, b12, b22]; L is [6, 3].
    L2 = jnp.stack([g[0, 0], 2 * g[0, 1], g[1, 1]], axis=-1)
    sol2, _, _, _ = jnp.linalg.lstsq(L2, rho)
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(sol2[0]), 1e-12))
    b2 = jnp.sqrt(jnp.maximum(jnp.abs(sol2[2]), 1e-12)) * jnp.sign(sol2[1]) * jnp.sign(sol2[0])
    beta_c2 = jnp.stack([b1, b2, jnp.zeros((), dtype), jnp.zeros((), dtype)])

    # Case N=3: unknowns [b11, b12, b13, b22, b23, b33]; L is [6, 6].
    L3 = jnp.stack(
        [g[0, 0], 2 * g[0, 1], 2 * g[0, 2], g[1, 1], 2 * g[1, 2], g[2, 2]],
        axis=-1,
    )
    sol3 = jnp.linalg.solve(
        L3 + 1e-10 * jnp.eye(6, dtype=dtype), rho
    )
    b1_3 = jnp.sqrt(jnp.maximum(jnp.abs(sol3[0]), 1e-12))
    b2_3 = jnp.sqrt(jnp.maximum(jnp.abs(sol3[3]), 1e-12)) * jnp.sign(sol3[1]) * jnp.sign(sol3[0])
    b3_3 = jnp.sqrt(jnp.maximum(jnp.abs(sol3[5]), 1e-12)) * jnp.sign(sol3[2]) * jnp.sign(sol3[0])
    beta_c3 = jnp.stack([b1_3, b2_3, b3_3, jnp.zeros((), dtype)])

    return jnp.stack([beta_c1, beta_c2, beta_c3], axis=0)


def _beta_gn(betas: jnp.ndarray, V: jnp.ndarray, dist_w: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Gauss-Newton on betas: match control-point distances.

    V: [4 basis, 4 ctrl, 3]; residuals over the 6 control-point pairs.
    """
    diffs = jnp.stack([V[:, i, :] - V[:, j, :] for i, j in _PAIRS], axis=1)  # [4, 6, 3]

    def res(b):
        d = jnp.einsum("k,kps->ps", b, diffs)  # [6, 3]
        return jnp.sum(d * d, axis=-1) - dist_w**2  # [6]

    def step(b, _):
        J = jax.jacfwd(res)(b)  # [6, 4]
        r = res(b)
        H = J.T @ J + 1e-9 * jnp.eye(4, dtype=b.dtype)
        db = jnp.linalg.solve(H, -J.T @ r)
        return b + db, None

    betas, _ = jax.lax.scan(step, betas, None, length=iters)
    return betas


def _kabsch(pw: jnp.ndarray, pc: jnp.ndarray, w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid alignment world->camera: returns (R, t)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_w = jnp.sum(pw * w[:, None], axis=0) / wsum
    mu_c = jnp.sum(pc * w[:, None], axis=0) / wsum
    H = jnp.einsum("ni,nj->ij", (pc - mu_c) * w[:, None], pw - mu_w)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = U @ D @ Vt
    t = mu_c - R @ mu_w
    return R, t


@fp32_matmuls
def epnp_solve(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    K: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EPnP pose from masked correspondences.

    Args:
      pts3d: [N, 3] world points; pts2d: [N, 2] pixels; K: [3, 3];
      mask: [N] bool (>= 4 true entries required for a meaningful answer).
    Returns:
      (R [3,3] world->cam, t [3], ok bool).
    """
    dtype = jnp.promote_types(pts3d.dtype, jnp.float32)
    pts3d = pts3d.astype(dtype)
    pts2d = pts2d.astype(dtype)
    K = K.astype(dtype)
    w = mask.astype(dtype)

    ctrl_w = _control_points(pts3d, w)  # [4, 3]
    alphas = _barycentric(pts3d, ctrl_w)  # [N, 4]
    MtM = _build_MtM(alphas, pts2d, K, w)
    _, vecs = jnp.linalg.eigh(MtM)  # ascending eigenvalues
    V = vecs[:, :4].T.reshape(4, 4, 3)  # [basis k, ctrl j, xyz]

    dist_w = jnp.stack(
        [jnp.linalg.norm(ctrl_w[i] - ctrl_w[j]) for i, j in _PAIRS]
    )  # [6]

    # Standard EPnP: try the N=1/2/3 beta cases, Gauss-Newton refine each on
    # the distance constraints, and keep the candidate with the lowest
    # weighted reprojection error.
    beta_cands = _beta_inits(V, dist_w)  # [3, 4]
    betas_all = jax.vmap(lambda b: _beta_gn(b, V, dist_w))(beta_cands)

    def candidate_pose(betas):
        ctrl_c = jnp.einsum("k,kjs->js", betas, V)  # [4, 3]
        pc = alphas @ ctrl_c  # [N, 3] camera-frame points
        # Fix the global sign so the (weighted) average depth is positive.
        depth_sign = jnp.sign(jnp.sum(pc[:, 2] * w))
        depth_sign = jnp.where(depth_sign == 0, 1.0, depth_sign)
        pc = pc * depth_sign
        R, t = _kabsch(pts3d, pc, w)
        p_cam = pts3d @ R.T + t
        pix = p_cam @ K.T
        z = jnp.maximum(jnp.abs(pix[:, 2]), 1e-9)
        uv = pix[:, :2] / z[:, None]
        err = jnp.sum(jnp.linalg.norm(uv - pts2d, axis=-1) * w)
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)
        return R, t, err

    Rs, ts, errs = jax.vmap(candidate_pose)(betas_all)
    best = jnp.argmin(errs)
    R, t = Rs[best], ts[best]
    ok = (jnp.sum(mask) >= 4) & jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    R = jnp.where(ok, R, jnp.eye(3, dtype=dtype))
    t = jnp.where(ok, t, jnp.zeros(3, dtype=dtype))
    return R, t, ok
