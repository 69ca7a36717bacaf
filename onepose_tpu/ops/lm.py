"""Sparse bundle-adjustment Levenberg-Marquardt solver, fully on device.

Replaces the DeepLM C++/CUDA solver used by the reference tracker
(src/tracker/ba_tracker.py:4,401-407: Solve(variables=[points, cam_pose],
constants=[2D obs + f,cx,cy], indices=[ptIdx, camIdx],
fn=SnavelyReprojectionErrorV2, 5 iterations)).

Residual parity (src/tracker/tracking_utils.py:142-169): camera is
(angle_axis[3], t[3]); p_cam = R(aa) X + t; prediction =
f * (x/z, y/z) + (cx, cy); residual = prediction - observation.

TPU-first structure: the Gauss-Newton normal equations have the classic
BA sparsity — Hpp point blocks (3x3) and Hcc camera blocks (6x6) are
block-diagonal; the solver eliminates points via the Schur complement and
solves the small dense reduced camera system. Everything is segment-sums
and batched 3x3 / dense (6W x 6W) linear algebra: one XLA program, no
host round trips, differentiable, vmappable over windows. The
camera-coupling tensor U[p, c] lives in [P, W, 6, 3] — fine for windowed
BA (W <= ~32); a Pallas block-sparse assembly is the planned upgrade for
map-scale global BA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from onepose_tpu.geometry.rotations import angle_axis_rotate_point

from onepose_tpu.utils.precision import fp32_matmuls


def snavely_residuals(
    points: jnp.ndarray,
    cam_poses: jnp.ndarray,
    features: jnp.ndarray,
    pt_idx: jnp.ndarray,
    cam_idx: jnp.ndarray,
    obs_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked reprojection residuals [M, 2].

    points: [P, 3]; cam_poses: [W, 6] (angle-axis, t);
    features: [M, 5] = (u, v, f, cx, cy); pt_idx/cam_idx: [M]; obs_mask: [M].
    """
    X = points[pt_idx]  # [M, 3]
    cam = cam_poses[cam_idx]  # [M, 6]
    p = angle_axis_rotate_point(cam[:, :3], X) + cam[:, 3:6]
    z = p[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = features[:, 2] * (p[:, 0] / z_safe) + features[:, 3]
    v = features[:, 2] * (p[:, 1] / z_safe) + features[:, 4]
    r = jnp.stack([u - features[:, 0], v - features[:, 1]], axis=-1)
    return r * obs_mask[:, None]


def _obs_jacobians(points, cam_poses, features, pt_idx, cam_idx, obs_mask):
    """Per-observation Jacobians via vmapped forward-mode autodiff.

    Returns (r [M, 2], Jp [M, 2, 3], Jc [M, 2, 6]).
    """

    def one(X, cam, feat):
        def res(X_, cam_):
            p = angle_axis_rotate_point(cam_[:3], X_) + cam_[3:6]
            z = p[2]
            z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            u = feat[2] * (p[0] / z_safe) + feat[3]
            v = feat[2] * (p[1] / z_safe) + feat[4]
            return jnp.stack([u - feat[0], v - feat[1]])

        r = res(X, cam)
        Jp = jax.jacfwd(res, argnums=0)(X, cam)
        Jc = jax.jacfwd(res, argnums=1)(X, cam)
        return r, Jp, Jc

    r, Jp, Jc = jax.vmap(one)(
        points[pt_idx], cam_poses[cam_idx], features
    )
    w = obs_mask.astype(r.dtype)
    return r * w[:, None], Jp * w[:, None, None], Jc * w[:, None, None]


def _solve_normal_equations(
    r, Jp, Jc, pt_idx, cam_idx, n_points, n_cams, lam, fix_cam_mask
):
    """One damped GN step via Schur complement.

    Returns (dx_points [P, 3], dx_cams [W, 6]).
    """
    dtype = r.dtype
    # Block assemblies by segment sum.
    Hpp = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", Jp, Jp), pt_idx, n_points
    )  # [P, 3, 3]
    Hcc = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", Jc, Jc), cam_idx, n_cams
    )  # [W, 6, 6]
    bp = jax.ops.segment_sum(
        -jnp.einsum("mri,mr->mi", Jp, r), pt_idx, n_points
    )  # [P, 3]
    bc = jax.ops.segment_sum(
        -jnp.einsum("mri,mr->mi", Jc, r), cam_idx, n_cams
    )  # [W, 6]

    # Camera gauge: zero out rows/cols of fixed cameras, identity diagonal.
    if fix_cam_mask is not None:
        fixed = fix_cam_mask.astype(dtype)  # [W], 1 = fixed
        bc = bc * (1 - fixed)[:, None]

    # LM damping (multiplicative on the diagonal).
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    Hpp_d = Hpp + lam * eye3 * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6
    )[..., None] * eye3
    Hcc_d = Hcc + lam * eye6 * jnp.maximum(
        jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6
    )[..., None] * eye6

    Hpp_inv = jnp.linalg.inv(
        Hpp_d + 1e-9 * eye3
    )  # [P, 3, 3] (masked points have ~eps diagonal -> harmless)

    # Camera-point coupling: U[p, c] = sum_obs Jc^T Jp for (c, p) pairs.
    A = jnp.einsum("mri,mrj->mij", Jc, Jp)  # [M, 6, 3]
    seg = pt_idx * n_cams + cam_idx
    U = jax.ops.segment_sum(A, seg, n_points * n_cams).reshape(
        n_points, n_cams, 6, 3
    )

    # Schur complement S = Hcc - U Hpp^-1 U^T (coupling camera pairs
    # through shared points) and reduced rhs.
    UHinv = jnp.einsum("pcij,pjk->pcik", U, Hpp_inv)  # [P, W, 6, 3]
    S_red = jnp.einsum("pcik,pdlk->cidl", UHinv, U)  # [W, 6, W, 6]
    S = jnp.zeros((n_cams, 6, n_cams, 6), dtype).at[
        jnp.arange(n_cams), :, jnp.arange(n_cams), :
    ].set(Hcc_d) - S_red
    rhs = bc - jnp.einsum("pcik,pk->ci", UHinv, bp)  # [W, 6]

    if fix_cam_mask is not None:
        free = (1 - fix_cam_mask.astype(dtype))
        S = S * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[jnp.arange(n_cams), :, jnp.arange(n_cams), :].add(
            jnp.eye(6, dtype=dtype)[None] * fix_cam_mask.astype(dtype)[:, None, None]
        )
        rhs = rhs * free[:, None]

    S_flat = S.reshape(n_cams * 6, n_cams * 6)
    dc = jnp.linalg.solve(
        S_flat + 1e-9 * jnp.eye(n_cams * 6, dtype=dtype),
        rhs.reshape(-1),
    ).reshape(n_cams, 6)

    # Back-substitute points: dp = Hpp^-1 (bp - U^T dc).
    Ut_dc = jnp.einsum("pcij,ci->pj", U, dc)  # [P, 3]
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Ut_dc)
    return dp, dc


@fp32_matmuls
@partial(
    jax.jit,
    static_argnames=("n_iters",),
)
def ba_solve(
    points: jnp.ndarray,
    cam_poses: jnp.ndarray,
    features: jnp.ndarray,
    pt_idx: jnp.ndarray,
    cam_idx: jnp.ndarray,
    obs_mask: jnp.ndarray,
    point_mask: jnp.ndarray | None = None,
    fix_cam_mask: jnp.ndarray | None = None,
    n_iters: int = 5,
    init_lambda: float = 1e-3,
) -> dict:
    """Levenberg-Marquardt bundle adjustment.

    Args:
      points: [P, 3] initial 3D points (padded slots allowed).
      cam_poses: [W, 6] initial (angle-axis, translation) world->cam.
      features: [M, 5] (u, v, f, cx, cy) observations (padded allowed).
      pt_idx / cam_idx: [M] observation incidence (point i seen by cam j);
        padded observations must have obs_mask False (indices clipped ok).
      obs_mask: [M] validity.
      point_mask: [P] optimize only these points (others frozen).
      fix_cam_mask: [W] 1 = keep this camera fixed (gauge / anchor).
      n_iters: LM iterations (reference uses 5).
    Returns dict(points, cam_poses, cost_initial, cost_final, lambda).
    """
    pt_idx = jnp.clip(pt_idx, 0, points.shape[0] - 1)
    cam_idx = jnp.clip(cam_idx, 0, cam_poses.shape[0] - 1)

    def cost(pts, cams):
        r = snavely_residuals(pts, cams, features, pt_idx, cam_idx, obs_mask)
        return 0.5 * jnp.sum(r * r)

    c0 = cost(points, cam_poses)

    def step(carry, _):
        pts, cams, lam = carry
        r, Jp, Jc = _obs_jacobians(
            pts, cams, features, pt_idx, cam_idx, obs_mask
        )
        dp, dc = _solve_normal_equations(
            r, Jp, Jc, pt_idx, cam_idx,
            pts.shape[0], cams.shape[0], lam, fix_cam_mask,
        )
        if point_mask is not None:
            dp = dp * point_mask.astype(dp.dtype)[:, None]
        cand_pts = pts + dp
        cand_cams = cams + dc
        c_old = cost(pts, cams)
        c_new = cost(cand_pts, cand_cams)
        improved = (c_new < c_old) & jnp.isfinite(c_new)
        pts = jnp.where(improved, cand_pts, pts)
        cams = jnp.where(improved, cand_cams, cams)
        lam = jnp.where(improved, lam * 0.3, lam * 6.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (pts, cams, lam), c_new

    (points, cam_poses, lam), _ = jax.lax.scan(
        step, (points, cam_poses, jnp.asarray(init_lambda, points.dtype)),
        None, length=n_iters,
    )
    return {
        "points": points,
        "cam_poses": cam_poses,
        "cost_initial": c0,
        "cost_final": cost(points, cam_poses),
        "lambda": lam,
    }
