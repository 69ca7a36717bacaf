"""Tests: LM bundle adjustment and pyramidal LK optical flow."""

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.geometry.rotations import (
    angle_axis_to_rotmat,
    rotmat_to_angle_axis,
)
from onepose_tpu.ops.lm import ba_solve, snavely_residuals
from onepose_tpu.ops.optical_flow import pyramidal_lk


def make_ba_problem(rng, n_pts=60, n_cams=6, noise_pts=0.01, noise_cam=0.02):
    """Synthetic BA window with GT and perturbed initializations."""
    pts_gt = (rng.random((n_pts, 3)) - 0.5) * 0.4
    f, cx, cy = 500.0, 256.0, 256.0
    cams_gt = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / max(n_cams, 8)
        center = np.array([np.cos(ang), np.sin(ang), 0.6]) * 1.2
        z = -center / np.linalg.norm(center)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ center
        aa = np.asarray(rotmat_to_angle_axis(jnp.asarray(R, jnp.float32)))
        cams_gt.append(np.concatenate([aa, t]))
    cams_gt = np.stack(cams_gt).astype(np.float64)

    obs_f, obs_uv, pt_idx, cam_idx = [], [], [], []
    for c in range(n_cams):
        R = np.asarray(
            angle_axis_to_rotmat(jnp.asarray(cams_gt[c, :3], jnp.float32))
        )
        t = cams_gt[c, 3:]
        pc = pts_gt @ R.T + t
        uv = np.stack(
            [f * pc[:, 0] / pc[:, 2] + cx, f * pc[:, 1] / pc[:, 2] + cy],
            axis=-1,
        )
        for p in range(n_pts):
            obs_uv.append(uv[p])
            obs_f.append([f, cx, cy])
            pt_idx.append(p)
            cam_idx.append(c)
    features = np.concatenate(
        [np.asarray(obs_uv), np.asarray(obs_f)], axis=-1
    ).astype(np.float32)

    pts0 = pts_gt + rng.normal(size=pts_gt.shape) * noise_pts
    cams0 = cams_gt + rng.normal(size=cams_gt.shape) * noise_cam
    return {
        "pts_gt": pts_gt,
        "cams_gt": cams_gt,
        "pts0": pts0.astype(np.float32),
        "cams0": cams0.astype(np.float32),
        "features": features,
        "pt_idx": np.asarray(pt_idx, np.int32),
        "cam_idx": np.asarray(cam_idx, np.int32),
    }


class TestBASolver:
    def test_residuals_zero_at_gt(self):
        rng = np.random.default_rng(0)
        prob = make_ba_problem(rng, noise_pts=0, noise_cam=0)
        r = snavely_residuals(
            jnp.asarray(prob["pts_gt"], jnp.float32),
            jnp.asarray(prob["cams_gt"], jnp.float32),
            jnp.asarray(prob["features"]),
            jnp.asarray(prob["pt_idx"]),
            jnp.asarray(prob["cam_idx"]),
            jnp.ones(len(prob["pt_idx"]), bool),
        )
        assert float(jnp.abs(r).max()) < 1e-2

    def test_converges_to_gt(self):
        rng = np.random.default_rng(1)
        prob = make_ba_problem(rng)
        mask = np.ones(len(prob["pt_idx"]), bool)
        # Fix the first camera as gauge anchor at its GT value.
        cams0 = prob["cams0"].copy()
        cams0[0] = prob["cams_gt"][0]
        out = ba_solve(
            jnp.asarray(prob["pts0"]),
            jnp.asarray(cams0),
            jnp.asarray(prob["features"]),
            jnp.asarray(prob["pt_idx"]),
            jnp.asarray(prob["cam_idx"]),
            jnp.asarray(mask),
            fix_cam_mask=jnp.zeros(6, jnp.float32).at[0].set(1.0),
            n_iters=8,
        )
        assert float(out["cost_final"]) < float(out["cost_initial"]) * 1e-3
        # Points land on GT (gauge fixed by the anchored camera).
        err = np.linalg.norm(
            np.asarray(out["points"]) - prob["pts_gt"], axis=-1
        )
        assert err.mean() < 2e-3, err.mean()
        cam_err = np.abs(np.asarray(out["cam_poses"]) - prob["cams_gt"])
        assert cam_err.max() < 5e-3, cam_err.max()

    def test_masked_obs_ignored(self):
        rng = np.random.default_rng(2)
        prob = make_ba_problem(rng, noise_pts=0.0, noise_cam=0.0)
        features = prob["features"].copy()
        n = len(prob["pt_idx"])
        mask = np.ones(n, bool)
        # Corrupt half the observations but mask them out.
        features[::2, :2] += 500.0
        mask[::2] = False
        out = ba_solve(
            jnp.asarray(prob["pts_gt"], jnp.float32),
            jnp.asarray(prob["cams_gt"], jnp.float32),
            jnp.asarray(features),
            jnp.asarray(prob["pt_idx"]),
            jnp.asarray(prob["cam_idx"]),
            jnp.asarray(mask),
            n_iters=3,
        )
        # Nothing to correct: cost stays ~0 and variables stay put.
        assert float(out["cost_final"]) < 1e-2
        np.testing.assert_allclose(
            np.asarray(out["points"]), prob["pts_gt"], atol=1e-3
        )

    def test_frozen_points(self):
        rng = np.random.default_rng(3)
        prob = make_ba_problem(rng)
        pmask = np.zeros(60, bool)  # all points frozen
        out = ba_solve(
            jnp.asarray(prob["pts0"]),
            jnp.asarray(prob["cams0"]),
            jnp.asarray(prob["features"]),
            jnp.asarray(prob["pt_idx"]),
            jnp.asarray(prob["cam_idx"]),
            jnp.ones(len(prob["pt_idx"]), bool),
            point_mask=jnp.asarray(pmask),
            n_iters=5,
        )
        np.testing.assert_array_equal(
            np.asarray(out["points"]), prob["pts0"]
        )
        assert float(out["cost_final"]) < float(out["cost_initial"])


class TestOpticalFlow:
    def _textured(self, rng, h=96, w=96):
        img = rng.random((h, w)).astype(np.float32)
        # Smooth it a little so gradients are informative.
        k = np.array([0.25, 0.5, 0.25])
        img = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, img
        )
        img = np.apply_along_axis(
            lambda c: np.convolve(c, k, mode="same"), 0, img
        )
        return img

    def test_pure_translation(self):
        rng = np.random.default_rng(4)
        img = self._textured(rng)
        dx, dy = 3.0, -2.0
        # Shift by integer + fractional part via roll + interpolation:
        # use exact integer shift for a clean oracle.
        img1 = np.roll(np.roll(img, 3, axis=1), -2, axis=0)
        pts = np.array(
            [[30.0, 40.0], [50.0, 50.0], [64.0, 30.0], [20.0, 60.0]],
            np.float32,
        )
        new_pts, status = pyramidal_lk(
            jnp.asarray(img), jnp.asarray(img1), jnp.asarray(pts)
        )
        assert bool(jnp.all(status))
        np.testing.assert_allclose(
            np.asarray(new_pts), pts + np.array([dx, dy]), atol=0.3
        )

    def test_flat_region_rejected(self):
        img = np.zeros((64, 64), np.float32)
        img1 = np.zeros((64, 64), np.float32)
        pts = np.array([[32.0, 32.0]], np.float32)
        _, status = pyramidal_lk(
            jnp.asarray(img), jnp.asarray(img1), jnp.asarray(pts)
        )
        assert not bool(status[0])

    def test_out_of_bounds_rejected(self):
        rng = np.random.default_rng(5)
        img = self._textured(rng)
        # Move content far so the point exits the frame.
        img1 = np.roll(img, 60, axis=1)
        pts = np.array([[90.0, 48.0]], np.float32)
        new_pts, status = pyramidal_lk(
            jnp.asarray(img), jnp.asarray(img1), jnp.asarray(pts)
        )
        # Either rejected or still inside; must not be NaN.
        assert np.all(np.isfinite(np.asarray(new_pts)))
