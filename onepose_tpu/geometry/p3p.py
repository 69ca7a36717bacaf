"""Closed-form P3P minimal solver (Grunert), TPU-native.

The RANSAC hypothesis path needs thousands of minimal pose solves per
frame; decomposition-based solvers (EPnP's 12x12 eigendecomposition) are
scalar-loop poison on TPU. Grunert's classical P3P reduces to a QUARTIC
with closed-form (Ferrari) roots — pure elementwise arithmetic that vmaps
into a single fused dispatch, no eigh/svd anywhere:

1. Bearing vectors v_i = normalize(K^-1 [u_i, v_i, 1]).
2. Grunert's quartic in the distance ratio; up to 4 real roots.
3. Distances -> camera-frame points -> rigid alignment by orthonormal
   triad construction (no SVD needed for 3 points).

Each sample yields up to 4 candidate poses; RANSAC scores them all.
Formulation follows the classical Grunert 1841 system as presented in
Haralick et al., "Review and Analysis of Solutions of the Three Point
Perspective Pose Estimation Problem" (IJCV 1994).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from onepose_tpu.utils.precision import fp32_matmuls


def _solve_quartic(c4, c3, c2, c1, c0, iters: int = 40):
    """Real roots of c4 x^4 + ... + c0 via Durand-Kerner iteration.

    Closed-form Ferrari is numerically fragile in fp32 complex; the
    Durand-Kerner (Weierstrass) simultaneous iteration is branch-free,
    purely elementwise, converges fast from the standard complex seed, and
    vectorizes perfectly — exactly what the TPU wants. Returns
    (roots [4], is_real [4]). Degenerate leading coefficients yield junk
    roots flagged non-real or scoring zero inliers downstream.
    """
    c4 = jnp.where(jnp.abs(c4) < 1e-10, 1e-10, c4)
    b3 = (c3 / c4).astype(jnp.complex64)
    b2 = (c2 / c4).astype(jnp.complex64)
    b1 = (c1 / c4).astype(jnp.complex64)
    b0 = (c0 / c4).astype(jnp.complex64)

    def p(x):
        return (((x + b3) * x + b2) * x + b1) * x + b0

    # Standard seed: powers of (0.4 + 0.9i), scaled by a root bound so
    # large-magnitude roots are reachable.
    bound = 1.0 + jnp.maximum(
        jnp.maximum(jnp.abs(b3), jnp.abs(b2)),
        jnp.maximum(jnp.abs(b1), jnp.abs(b0)),
    )
    seed = (0.4 + 0.9j) ** jnp.arange(4)
    x = (seed * bound).astype(jnp.complex64)

    eye_c = jnp.eye(4, dtype=jnp.complex64)

    def body(x, _):
        diff = x[:, None] - x[None, :] + eye_c  # diag 0 -> 1 (no scatter)
        denom = jnp.prod(diff, axis=1)
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12 + 0j, denom)
        x = x - p(x) / denom
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    is_real = jnp.abs(x.imag) < 1e-3 * (1.0 + jnp.abs(x.real))
    return x.real.astype(jnp.float32), is_real


def _solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A^-1 b for a 3x3 system via the adjugate — branch-free
    elementwise arithmetic only (no pivoting), safe under vmap."""
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a10, a11, a12 = A[1, 0], A[1, 1], A[1, 2]
    a20, a21, a22 = A[2, 0], A[2, 1], A[2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    x0 = (c00 * b[0] + c10 * b[1] + c20 * b[2]) / det
    x1 = (c01 * b[0] + c11 * b[1] + c21 * b[2]) / det
    x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) / det
    return jnp.stack([x0, x1, x2])


@fp32_matmuls
def p3p_solve(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    K: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """P3P from exactly 3 correspondences.

    pts3d: [3, 3] world points; pts2d: [3, 2] pixels; K: [3, 3].
    Returns (R [4, 3, 3], t [4, 3], valid [4]) — up to 4 candidate poses
    (world->camera).
    """
    dtype = jnp.float32
    K = K.astype(dtype)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    # Bearing vectors.
    x = (pts2d[:, 0] - cx) / fx
    y = (pts2d[:, 1] - cy) / fy
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)  # [3, 3]

    P1, P2, P3 = pts3d[0], pts3d[1], pts3d[2]
    # Side lengths: a = |P2-P3|, b = |P1-P3|, c = |P1-P2|.
    a = jnp.linalg.norm(P2 - P3)
    b = jnp.linalg.norm(P1 - P3)
    c = jnp.linalg.norm(P1 - P2)
    b = jnp.maximum(b, 1e-9)
    cos_a = jnp.dot(v[1], v[2])  # angle at viewpoint opposite side a
    cos_b = jnp.dot(v[0], v[2])
    cos_g = jnp.dot(v[0], v[1])

    a2b = (a * a) / (b * b)
    c2b = (c * c) / (b * b)
    acb = a2b - c2b  # (a^2 - c^2)/b^2

    # Grunert's system with s2 = u s1, s3 = v s1 gives
    #   u(v) = N(v) / D(v),
    #   N = (acb - 1) v^2 - 2 acb cos_b v + (1 + acb),
    #   D = 2 (cos_g - v cos_a),
    # and substituting into (1 + u^2 - 2 u cos_g) = c2b (1 + v^2 -
    # 2 v cos_b) yields the quartic
    #   N^2 + D^2 (1 - c2b (1 + v^2 - 2 v cos_b)) - 2 cos_g N D = 0.
    # The coefficients are built by explicit polynomial arithmetic
    # (ascending order) — derived, not transcribed.
    N = jnp.stack([1.0 + acb, -2.0 * acb * cos_b, acb - 1.0])
    D = jnp.stack([2.0 * cos_g, -2.0 * cos_a])
    Q = jnp.stack([1.0 - c2b, 2.0 * c2b * cos_b, -c2b])

    def polymul(p, q, out_len):
        out = jnp.zeros(out_len, p.dtype)
        for i in range(p.shape[0]):
            for j in range(q.shape[0]):
                out = out.at[i + j].add(p[i] * q[j])
        return out

    poly = (
        polymul(N, N, 5)
        + polymul(polymul(D, D, 3), Q, 5)
        - 2.0 * cos_g * polymul(N, D, 5)
    )
    roots, is_real = _solve_quartic(
        poly[4], poly[3], poly[2], poly[1], poly[0]
    )  # v = s3/s1

    def pose_from_root(vr):
        denom_u = 2.0 * (cos_g - vr * cos_a)
        denom_u = jnp.where(
            jnp.abs(denom_u) < 1e-9, 1e-9, denom_u
        )
        u = (
            (-1.0 + acb) * vr * vr
            - 2.0 * acb * cos_b * vr
            + 1.0
            + acb
        ) / denom_u  # u = s2/s1
        s1_sq = (b * b) / jnp.maximum(
            vr * vr - 2.0 * vr * cos_b + 1.0, 1e-12
        )
        s1 = jnp.sqrt(s1_sq)
        s2 = u * s1
        s3 = vr * s1

        # Newton polish on the original distance system: the collapsed
        # quartic is ill-conditioned in fp32 (clustered roots), but the
        # 3x3 system around a near-solution is well-behaved.
        def newton(s, _):
            s1_, s2_, s3_ = s[0], s[1], s[2]
            F = jnp.stack(
                [
                    s1_ * s1_ + s2_ * s2_ - 2 * s1_ * s2_ * cos_g - c * c,
                    s1_ * s1_ + s3_ * s3_ - 2 * s1_ * s3_ * cos_b - b * b,
                    s2_ * s2_ + s3_ * s3_ - 2 * s2_ * s3_ * cos_a - a * a,
                ]
            )
            J = 2.0 * jnp.array(
                [
                    [s1_ - s2_ * cos_g, s2_ - s1_ * cos_g, 0.0],
                    [s1_ - s3_ * cos_b, 0.0, s3_ - s1_ * cos_b],
                    [0.0, s2_ - s3_ * cos_a, s3_ - s2_ * cos_a],
                ]
            )
            # Closed-form 3x3 solve (Cramer / adjugate): pivoted LU is a
            # scalar-loop slow path on TPU when vmapped over thousands of
            # hypotheses; the explicit cofactor form is pure VPU math.
            ds = _solve3x3(J + 1e-9 * jnp.eye(3, dtype=J.dtype), -F)
            return s + ds, None

        s_vec, _ = jax.lax.scan(
            newton, jnp.stack([s1, s2, s3]), None, length=4
        )
        s1, s2, s3 = s_vec[0], s_vec[1], s_vec[2]
        C1 = s1 * v[0]
        C2 = s2 * v[1]
        C3 = s3 * v[2]

        # Rigid alignment from the two triads (no SVD for 3 points).
        def triad(p1, p2, p3):
            e1 = p2 - p1
            e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
            n = jnp.cross(e1, p3 - p1)
            e3 = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
            e2 = jnp.cross(e3, e1)
            return jnp.stack([e1, e2, e3], axis=-1)  # columns

        Tw = triad(P1, P2, P3)
        Tc = triad(C1, C2, C3)
        R = Tc @ Tw.T
        t = C1 - R @ P1
        ok = (
            (s1 > 0)
            & (s2 > 0)
            & (s3 > 0)
            & jnp.all(jnp.isfinite(R))
            & jnp.all(jnp.isfinite(t))
        )
        return R, t, ok

    R, t, ok = jax.vmap(pose_from_root)(roots)
    return R, t, ok & is_real
