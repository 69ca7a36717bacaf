"""Geometry unit tests with closed-form oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_tpu.geometry import (
    qvec_to_rotmat,
    rotmat_to_qvec,
    angle_axis_to_rotmat,
    rotmat_to_angle_axis,
    angle_axis_rotate_point,
    get_affine_transform,
    get_K_crop_resize,
    crop_img_affine,
    project_points,
    reprojection_errors,
    query_pose_error,
    aggregate_metrics,
    triangulate_tracks_dlt,
    triangulate_two_view,
    epnp_solve,
    ransac_pnp,
)
from onepose_tpu.geometry.triangulation import refine_points_gn


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(qvec_to_rotmat(jnp.asarray(q)))


def make_camera(rng, img=(512, 512)):
    """Pinhole camera at ~1m from origin, looking at the origin."""
    K = np.array([[600.0, 0, img[0] / 2], [0, 600.0, img[1] / 2], [0, 0, 1]])
    c = rng.normal(size=3)
    c = c / np.linalg.norm(c) * 1.0
    z = -c / np.linalg.norm(c)  # camera z-axis: toward origin
    up = rng.normal(size=3)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)  # rows = camera axes in world frame
    t = -R @ c
    return K, R, t


class TestRotations:
    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(64, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q *= np.where(q[:, :1] < 0, -1.0, 1.0)
        R = qvec_to_rotmat(jnp.asarray(q, jnp.float32))
        q2 = rotmat_to_qvec(R)
        np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)

    def test_rotmat_orthonormal(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(16, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = np.asarray(qvec_to_rotmat(jnp.asarray(q, jnp.float32)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_angle_axis_roundtrip(self):
        rng = np.random.default_rng(2)
        aa = rng.normal(size=(32, 3))
        R = angle_axis_to_rotmat(jnp.asarray(aa, jnp.float32))
        aa2 = rotmat_to_angle_axis(R)
        R2 = angle_axis_to_rotmat(aa2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_angle_axis_small(self):
        aa = jnp.array([[1e-10, 0, 0], [0.0, 0, 0]])
        R = angle_axis_to_rotmat(aa)
        np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (2, 1, 1)), atol=1e-7)

    def test_angle_axis_rotate_point_matches_matrix(self):
        rng = np.random.default_rng(3)
        aa = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        R = angle_axis_to_rotmat(aa)
        expected = jnp.einsum("bij,bj->bi", R, p)
        got = angle_axis_rotate_point(aa, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


class TestTransforms:
    def test_affine_identity_box(self):
        # Crop a 512-wide box centered at (256, 256) to 512x512 -> identity.
        A = get_affine_transform((256, 256), (512, 512), 0, (512, 512))
        np.testing.assert_allclose(A, np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-5)

    def test_affine_scale_translate(self):
        # Box [100, 200, 356, 456] (256 wide) -> 512x512: scale 2.
        A = get_affine_transform((228, 328), (256, 256), 0, (512, 512))
        src = np.array([228.0, 328.0, 1.0])
        np.testing.assert_allclose(A @ src, [256, 256], atol=1e-4)
        corner = np.array([100.0, 200.0, 1.0])
        np.testing.assert_allclose(A @ corner, [0, 0], atol=1e-4)

    def test_affine_inverse(self):
        A = get_affine_transform((228, 328), (256,), 0, (512, 512))
        Ai = get_affine_transform((228, 328), (256,), 0, (512, 512), inv=True)
        Ah = np.vstack([A, [0, 0, 1]])
        Aih = np.vstack([Ai, [0, 0, 1]])
        np.testing.assert_allclose(Ah @ Aih, np.eye(3), atol=1e-4)

    def test_K_crop_contract(self):
        # Projecting with K through the crop transform == projecting with
        # K_crop directly: the core contract every consumer relies on.
        rng = np.random.default_rng(4)
        K = np.array([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]])
        box = [100, 80, 420, 400]
        K_crop, _ = get_K_crop_resize(box, K, (512, 512))
        A = get_affine_transform(
            ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2),
            (box[2] - box[0], box[3] - box[1]),
            0,
            (512, 512),
        )
        pts = rng.normal(size=(50, 3)) * 0.1 + np.array([0, 0, 1.0])
        uv_full = (pts @ K.T)
        uv_full = uv_full[:, :2] / uv_full[:, 2:3]
        uv_crop_direct = pts @ K_crop.T
        uv_crop_direct = uv_crop_direct[:, :2] / uv_crop_direct[:, 2:3]
        uv_crop_via_A = uv_full @ A[:, :2].T + A[:, 2]
        np.testing.assert_allclose(uv_crop_direct, uv_crop_via_A, atol=1e-3)

    def test_crop_img_affine_identity(self):
        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32))
        Ai = get_affine_transform((32, 32), (64, 64), 0, (64, 64), inv=True)
        out = crop_img_affine(img, jnp.asarray(Ai), (64, 64))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_crop_img_affine_upsample(self):
        # 2x upsample of a linear ramp stays linear.
        ramp = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32)[None, :], (32, 32))
        Ai = get_affine_transform((16, 16), (32, 32), 0, (64, 64), inv=True)
        out = np.asarray(crop_img_affine(ramp, jnp.asarray(Ai), (64, 64)))
        # Interior rows should be a linear ramp with slope 0.5.
        diffs = np.diff(out[32, 2:-2])
        np.testing.assert_allclose(diffs, 0.5, atol=1e-4)


class TestProjectionMetrics:
    def test_project_points(self):
        rng = np.random.default_rng(6)
        K, R, t = make_camera(rng)
        pts = rng.normal(size=(20, 3)) * 0.1
        uv, depth = project_points(
            jnp.asarray(pts, jnp.float32), jnp.asarray(K, jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        )
        # Oracle
        pc = pts @ R.T + t
        uv_np = pc @ K.T
        uv_np = uv_np[:, :2] / uv_np[:, 2:3]
        np.testing.assert_allclose(np.asarray(uv), uv_np, rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(depth), pc[:, 2], rtol=1e-4, atol=1e-5)

    def test_query_pose_error_zero(self):
        rng = np.random.default_rng(7)
        R = random_rotation(rng)
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = [0.1, 0.2, 0.3]
        r_err, t_err = query_pose_error(jnp.asarray(pose, jnp.float32), jnp.asarray(pose, jnp.float32))
        assert float(r_err) < 0.1
        assert float(t_err) < 1e-4

    def test_query_pose_error_known(self):
        # 10-degree rotation about z, 2cm translation offset.
        th = np.deg2rad(10.0)
        Rz = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        p1 = np.eye(4)
        p2 = np.eye(4)
        p2[:3, :3] = Rz
        p2[:3, 3] = [0.02, 0, 0]
        r_err, t_err = query_pose_error(jnp.asarray(p2, jnp.float32), jnp.asarray(p1, jnp.float32))
        np.testing.assert_allclose(float(r_err), 10.0, atol=0.05)
        np.testing.assert_allclose(float(t_err), 2.0, atol=1e-3)

    def test_aggregate_metrics(self):
        R_errs = [0.5, 2.0, 4.0, 10.0]
        t_errs = [0.5, 2.0, 4.0, 10.0]
        m = aggregate_metrics(R_errs, t_errs)
        assert m["1cm@1degree"] == 0.25
        assert m["3cm@3degree"] == 0.5
        assert m["5cm@5degree"] == 0.75


class TestTriangulation:
    def test_two_view_exact(self):
        rng = np.random.default_rng(8)
        K, R0, t0 = make_camera(rng)
        _, R1, t1 = make_camera(rng)
        pts = rng.normal(size=(40, 3)) * 0.1
        P0 = K @ np.hstack([R0, t0[:, None]])
        P1 = K @ np.hstack([R1, t1[:, None]])

        def proj(P, X):
            x = np.hstack([X, np.ones((len(X), 1))]) @ P.T
            return x[:, :2] / x[:, 2:3]

        uv0 = proj(P0, pts)
        uv1 = proj(P1, pts)
        xyz = triangulate_two_view(
            jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32),
            jnp.asarray(P0, jnp.float32), jnp.asarray(P1, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(xyz), pts, atol=5e-3)

    def test_multiview_masked(self):
        rng = np.random.default_rng(9)
        n_tracks, T = 30, 6
        pts = rng.normal(size=(n_tracks, 3)) * 0.1
        Ps, Ks, Rs, ts = [], [], [], []
        for _ in range(T):
            K, R, t = make_camera(rng)
            Ps.append(K @ np.hstack([R, t[:, None]]))
            Ks.append(K), Rs.append(R), ts.append(t)
        P = np.stack(Ps)
        uv = np.zeros((n_tracks, T, 2))
        for j in range(T):
            x = np.hstack([pts, np.ones((n_tracks, 1))]) @ P[j].T
            uv[:, j] = x[:, :2] / x[:, 2:3]
        mask = rng.uniform(size=(n_tracks, T)) > 0.3
        # Guarantee >= 3 observations per track.
        mask[:, :3] = True
        xyz, ok = triangulate_tracks_dlt(
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(np.broadcast_to(P, (n_tracks, T, 3, 4)), jnp.float32),
            jnp.asarray(mask),
        )
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(xyz), pts, atol=5e-3)

    def test_refine_improves_noisy(self):
        rng = np.random.default_rng(10)
        n_tracks, T = 20, 8
        pts = rng.normal(size=(n_tracks, 3)) * 0.1
        Ks, Rs, ts = [], [], []
        for _ in range(T):
            K, R, t = make_camera(rng)
            Ks.append(K), Rs.append(R), ts.append(t)
        K = np.stack(Ks)
        R = np.stack(Rs)
        t = np.stack(ts)
        uv = np.zeros((n_tracks, T, 2))
        for j in range(T):
            pc = pts @ R[j].T + t[j]
            x = pc @ K[j].T
            uv[:, j] = x[:, :2] / x[:, 2:3]
        uv += rng.normal(size=uv.shape) * 0.5  # px noise
        mask = np.ones((n_tracks, T), bool)
        xyz0 = jnp.asarray(pts + rng.normal(size=pts.shape) * 0.01, jnp.float32)
        argK = jnp.asarray(np.broadcast_to(K, (n_tracks, T, 3, 3)), jnp.float32)
        argR = jnp.asarray(np.broadcast_to(R, (n_tracks, T, 3, 3)), jnp.float32)
        argt = jnp.asarray(np.broadcast_to(t, (n_tracks, T, 3)), jnp.float32)
        xyz = refine_points_gn(xyz0, jnp.asarray(uv, jnp.float32), argK, argR, argt, jnp.asarray(mask))
        err0 = np.linalg.norm(np.asarray(xyz0) - pts, axis=-1).mean()
        err1 = np.linalg.norm(np.asarray(xyz) - pts, axis=-1).mean()
        assert err1 < err0


class TestPnP:
    def _make_problem(self, rng, n=100, noise=0.0, outlier_frac=0.0):
        K, R, t = make_camera(rng)
        pts3d = rng.normal(size=(n, 3)) * 0.1
        pc = pts3d @ R.T + t
        x = pc @ K.T
        uv = x[:, :2] / x[:, 2:3]
        uv += rng.normal(size=uv.shape) * noise
        n_out = int(n * outlier_frac)
        if n_out:
            out_idx = rng.choice(n, n_out, replace=False)
            uv[out_idx] = rng.uniform(0, 512, size=(n_out, 2))
        return K, R, t, pts3d, uv

    @pytest.mark.slow
    def test_epnp_exact(self):
        rng = np.random.default_rng(11)
        K, R, t, pts3d, uv = self._make_problem(rng, n=50)
        R_est, t_est, ok = epnp_solve(
            jnp.asarray(pts3d, jnp.float32), jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.ones(50, bool),
        )
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-2)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-2)

    def test_epnp_minimal_4pt(self):
        rng = np.random.default_rng(12)
        K, R, t, pts3d, uv = self._make_problem(rng, n=4)
        R_est, t_est, ok = epnp_solve(
            jnp.asarray(pts3d, jnp.float32), jnp.asarray(uv, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.ones(4, bool),
        )
        assert bool(ok)
        # Minimal case is less stable; accept small error.
        pose_est = np.eye(4); pose_est[:3, :3] = np.asarray(R_est); pose_est[:3, 3] = np.asarray(t_est)
        pose_gt = np.eye(4); pose_gt[:3, :3] = R; pose_gt[:3, 3] = t
        r_err, t_err = query_pose_error(jnp.asarray(pose_est, jnp.float32), jnp.asarray(pose_gt, jnp.float32))
        assert float(r_err) < 3.0
        assert float(t_err) < 3.0

    def test_ransac_pnp_outliers(self):
        rng = np.random.default_rng(13)
        K, R, t, pts3d, uv = self._make_problem(rng, n=200, noise=0.5, outlier_frac=0.4)
        out = ransac_pnp(
            jax.random.PRNGKey(0),
            jnp.asarray(uv, jnp.float32), jnp.asarray(pts3d, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.ones(200, bool),
            n_hyp=256,
        )
        assert bool(out["ok"])
        pose_gt = np.eye(4); pose_gt[:3, :3] = R; pose_gt[:3, 3] = t
        r_err, t_err = query_pose_error(out["pose"], jnp.asarray(pose_gt, jnp.float32))
        assert float(r_err) < 1.0, f"rot err {float(r_err)}"
        assert float(t_err) < 1.0, f"trans err {float(t_err)} cm"
        assert int(out["num_inliers"]) > 100

    def test_ransac_pnp_masked_padding(self):
        # Padded (masked-out) garbage must not affect the solution.
        rng = np.random.default_rng(14)
        K, R, t, pts3d, uv = self._make_problem(rng, n=80, noise=0.3)
        N = 128
        pts3d_pad = np.concatenate([pts3d, rng.normal(size=(N - 80, 3)) * 10], 0)
        uv_pad = np.concatenate([uv, rng.uniform(0, 512, size=(N - 80, 2))], 0)
        mask = np.zeros(N, bool)
        mask[:80] = True
        out = ransac_pnp(
            jax.random.PRNGKey(1),
            jnp.asarray(uv_pad, jnp.float32), jnp.asarray(pts3d_pad, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.asarray(mask), n_hyp=256,
        )
        pose_gt = np.eye(4); pose_gt[:3, :3] = R; pose_gt[:3, 3] = t
        r_err, t_err = query_pose_error(out["pose"], jnp.asarray(pose_gt, jnp.float32))
        assert float(r_err) < 1.0
        assert float(t_err) < 1.0
        assert not bool(jnp.any(out["inliers"][80:]))

    def test_ransac_pnp_too_few(self):
        rng = np.random.default_rng(15)
        K, _, _, pts3d, uv = self._make_problem(rng, n=16)
        mask = np.zeros(16, bool)
        mask[:3] = True  # < 4 valid
        out = ransac_pnp(
            jax.random.PRNGKey(2),
            jnp.asarray(uv, jnp.float32), jnp.asarray(pts3d, jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.asarray(mask), n_hyp=64,
        )
        # Must not produce NaNs; pose falls back to identity-like.
        assert np.all(np.isfinite(np.asarray(out["pose"])))
