"""Crop-and-resize affine transforms and the intrinsics-update contract.

This is the K_crop contract used throughout the framework: cropping an image
to a box and resizing to a target shape is a single affine map A (2x3); the
cropped camera has K_crop = homo(A) @ K. Matches the semantics of the
reference pipeline (src/utils/data_utils.py:24-57, 233-272) so that maps /
checkpoints / annotations interoperate, but implemented from the closed form
rather than a 3-point cv2 solve.

Host-side functions (numpy) prepare parameters; `crop_img_affine` is the
jittable on-device bilinear warp.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def get_affine_transform(
    center,
    scale,
    rot: float = 0.0,
    output_size=(512, 512),
    shift=(0.0, 0.0),
    inv: bool = False,
) -> np.ndarray:
    """2x3 affine mapping a source box to an output image.

    The map takes `center` (source px) to the output center, with uniform
    scale `output_size[0] / scale[0]` and rotation `rot` degrees. This is the
    closed form of the reference's 3-point construction
    (data_utils.py:24-57): note it intentionally uses only the box *width*
    for the scale — boxes are squared before cropping.

    Args:
      center: (2,) source box center (x, y).
      scale: scalar or (2,) source box size; only scale[0] is used.
      rot: rotation in degrees.
      output_size: (w, h) of the output image.
      shift: normalized shift of the source center, in units of `scale`.
      inv: if True, return the inverse map (output -> source).
    """
    center = np.asarray(center, dtype=np.float64)
    scale = np.atleast_1d(np.asarray(scale, dtype=np.float64))
    shift = np.asarray(shift, dtype=np.float64)
    src_w = scale[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    cs, sn = np.cos(rot_rad), np.sin(rot_rad)
    s = dst_w / src_w
    # The 3-point construction reduces to a similarity: scale s, rotation
    # -rot (image coords, y down), center -> center.
    lin = s * np.array([[cs, sn], [-sn, cs]])
    src_center = center + (scale[0] if scale.size == 1 else scale[:2]) * shift
    dst_center = np.array([dst_w * 0.5, dst_h * 0.5])
    trans = np.zeros((2, 3), dtype=np.float64)
    trans[:, :2] = lin
    trans[:, 2] = dst_center - lin @ src_center
    if inv:
        lin_i = np.linalg.inv(lin)
        out = np.zeros((2, 3), dtype=np.float64)
        out[:, :2] = lin_i
        out[:, 2] = -lin_i @ trans[:, 2]
        return out.astype(np.float32)
    return trans.astype(np.float32)


def bbox_center_scale(box) -> tuple[np.ndarray, np.ndarray]:
    """[x0, y0, x1, y1] -> (center (2,), scale (2,))."""
    box = np.asarray(box, dtype=np.float64)
    center = np.array([(box[0] + box[2]) / 2.0, (box[1] + box[3]) / 2.0])
    scale = np.array([box[2] - box[0], box[3] - box[1]])
    return center, scale


def get_K_crop_resize(box, K_orig, resize_shape) -> tuple[np.ndarray, np.ndarray]:
    """Intrinsics update for crop-to-box + resize (the K_crop contract).

    Args:
      box: [x0, y0, x1, y1] in source pixels.
      K_orig: [3,3] or [3,4] intrinsics.
      resize_shape: (h, w) of the crop.
    Returns:
      (K_crop [3,3], K_crop_homo [3,4]).
    """
    center, scale = bbox_center_scale(box)
    resize_h, resize_w = resize_shape
    trans = get_affine_transform(center, scale, 0.0, (resize_w, resize_h))
    trans_homo = np.concatenate([trans, np.array([[0, 0, 1]], dtype=np.float32)], axis=0)
    K_orig = np.asarray(K_orig, dtype=np.float64)
    if K_orig.shape == (3, 3):
        K_homo = np.concatenate([K_orig, np.zeros((3, 1))], axis=-1)
    else:
        K_homo = K_orig.copy()
    K_crop_homo = trans_homo @ K_homo
    return K_crop_homo[:3, :3].astype(np.float32), K_crop_homo.astype(np.float32)


def _bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img [H, W(, C)] at float coords; zero outside."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = img[yi_c, xi_c]
        if img.ndim == 3:
            return jnp.where(valid[..., None], v, 0.0)
        return jnp.where(valid, v, 0.0)

    w00 = (1 - wx) * (1 - wy)
    w10 = wx * (1 - wy)
    w01 = (1 - wx) * wy
    w11 = wx * wy
    if img.ndim == 3:
        w00, w10, w01, w11 = (w[..., None] for w in (w00, w10, w01, w11))
    return (
        gather(y0i, x0i) * w00
        + gather(y0i, x0i + 1) * w10
        + gather(y0i + 1, x0i) * w01
        + gather(y0i + 1, x0i + 1) * w11
    )


from functools import partial


@partial(jax.jit, static_argnames=("out_hw",))
def crop_img_affine(img: jnp.ndarray, trans_inv: jnp.ndarray, out_hw: tuple[int, int] = (512, 512)) -> jnp.ndarray:
    """On-device warp: out(y, x) = img(trans_inv @ (x, y, 1)), bilinear.

    `trans_inv` is the OUTPUT->SOURCE 2x3 affine (pass inv=True to
    get_affine_transform). Pixel centers at integer coordinates, matching
    cv2.warpAffine INTER_LINEAR semantics with zero border.
    """
    out_h, out_w = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    src_x = trans_inv[0, 0] * xs + trans_inv[0, 1] * ys + trans_inv[0, 2]
    src_y = trans_inv[1, 0] * xs + trans_inv[1, 1] * ys + trans_inv[1, 2]
    return _bilinear_sample(img, src_x, src_y)
