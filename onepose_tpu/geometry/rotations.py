"""Rotation parameterizations: quaternion, rotation matrix, angle-axis.

Conventions (matching COLMAP / the OnePose data format, see reference
src/utils/colmap/read_write_model.py:454-479 for the qvec contract):
- qvec is (w, x, y, z), Hamilton convention, unit norm.
- Poses are world->camera: x_cam = R @ x_world + t.

All functions are jnp-native and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def qvec_to_rotmat(qvec: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = qvec[..., 0], qvec[..., 1], qvec[..., 2], qvec[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(qvec.shape[:-1] + (3, 3))


def rotmat_to_qvec(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion (w,x,y,z) [..., 4].

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the numerically best one (largest pivot), which is
    jit-safe (no data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is largest.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) / 2.0
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]

    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                       (m10 - m01) / (4 * w0)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1),
                       (m02 + m20) / (4 * x1)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2,
                       (m12 + m21) / (4 * y2)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3),
                       (m12 + m21) / (4 * z3), z3], axis=-1),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4]
    pick = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, pick[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def angle_axis_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues)."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = aa / jnp.where(small, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    t = theta[..., 0]
    c, s = jnp.cos(t), jnp.sin(t)
    C = 1 - c
    R = jnp.stack(
        [
            c + x * x * C, x * y * C - z * s, x * z * C + y * s,
            y * x * C + z * s, c + y * y * C, y * z * C - x * s,
            z * x * C - y * s, z * y * C + x * s, c + z * z * C,
        ],
        axis=-1,
    ).reshape(aa.shape[:-1] + (3, 3))
    # Near-zero angle: first-order I + skew(aa).
    ax, ay, az = aa[..., 0], aa[..., 1], aa[..., 2]
    one = jnp.ones_like(ax)
    R_small = jnp.stack(
        [one, -az, ay, az, one, -ax, -ay, ax, one], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    return jnp.where(small[..., None], R_small, R)


def rotmat_to_angle_axis(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> angle-axis [..., 3].

    Uses the quaternion route for numerical stability near 0 and pi.
    """
    q = rotmat_to_qvec(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn[..., 0], w)
    scale = jnp.where(vn[..., 0] < 1e-12, 2.0, theta / jnp.maximum(vn[..., 0], 1e-12))
    return v * scale[..., None]


def angle_axis_rotate_point(aa: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate points p [..., 3] by angle-axis aa [..., 3] without building R.

    The Rodrigues rotation formula applied directly — this is the hot inner
    op of the bundle-adjustment residual (reference behavior:
    src/tracker/tracking_utils.py:91-139), kept matrix-free so its JVP/VJP
    stay cheap inside the LM solver.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-16
    axis = aa / theta
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    d = jnp.sum(axis * p, axis=-1, keepdims=True)
    cross = jnp.cross(axis, p)
    rotated = p * c + cross * s + axis * d * (1 - c)
    # Small-angle: p + aa x p.
    return jnp.where(small, p + jnp.cross(aa, p), rotated)
