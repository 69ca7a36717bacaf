"""Tracker test: synthetic textured scene, camera orbit, pose tracking."""

import pytest
import numpy as np
import jax.numpy as jnp

from onepose_tpu.geometry import query_pose_error
from onepose_tpu.tracker import BATracker, TrackerConfig


def render_scene(rng, pose, K, pts3d, tex_phase, img=160):
    """'Render' a frame: project points and make each a bright blob on a
    noisy background (enough texture for LK)."""
    R, t = pose[:3, :3], pose[:3, 3]
    pc = pts3d @ R.T + t
    uv = pc @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    vis = (
        (pc[:, 2] > 0.05)
        & (uv[:, 0] > 10) & (uv[:, 0] < img - 10)
        & (uv[:, 1] > 10) & (uv[:, 1] < img - 10)
    )
    # Background texture fixed in IMAGE space would break flow; instead
    # synthesize blobs at projected points over a dark field.
    ys, xs = np.mgrid[0:img, 0:img]
    image = np.zeros((img, img), np.float32)
    for p, phase in zip(uv[vis], tex_phase[vis]):
        d2 = (xs - p[0]) ** 2 + (ys - p[1]) ** 2
        image += (0.5 + 0.5 * np.sin(phase)) * np.exp(-d2 / 8.0)
    image = np.clip(image, 0, 1)
    return image, uv, vis


def look_at(center):
    z = -center / np.linalg.norm(center)
    x = np.cross([0, 0, 1.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    t = -R @ center
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R
    pose[:3, 3] = t
    return pose


class TestTracker:
    @pytest.mark.slow
    def test_orbit_tracking(self):
        rng = np.random.default_rng(0)
        img = 160
        n_pts = 120
        pts3d = ((rng.random((n_pts, 3)) - 0.5) * 0.2).astype(np.float32)
        tex_phase = rng.random(n_pts) * 6.28
        K = np.array(
            [[300.0, 0, img / 2], [0, 300.0, img / 2], [0, 0, 1]],
            np.float32,
        )
        desc = rng.normal(size=(n_pts, 32)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)

        def camera(i):
            ang = 0.02 * i
            return look_at(
                np.array(
                    [np.cos(ang) * 0.6, np.sin(ang) * 0.6, 0.35 + 0.002 * i]
                )
            )

        cfg = TrackerConfig(
            window_size=4, n_kpts=128, point_capacity=512,
            kf_interval=2, ransac_hyp=64, ba_iters=3,
        )
        tracker = BATracker(cfg)

        # Frame 0: initialize with GT pose and known 2D-3D ids.
        pose0 = camera(0)
        image0, uv0, vis0 = render_scene(rng, pose0, K, pts3d, tex_phase, img)
        ids0 = np.nonzero(vis0)[0][: cfg.n_kpts]
        n0 = len(ids0)
        kpts = np.zeros((cfg.n_kpts, 2), np.float32)
        kpts[:n0] = uv0[ids0]
        descs = np.zeros((cfg.n_kpts, 32), np.float32)
        descs[:n0] = desc[ids0]
        mask = np.zeros(cfg.n_kpts, bool)
        mask[:n0] = True
        p3d_ids = np.full(cfg.n_kpts, -1, np.int32)
        p3d_ids[:n0] = np.arange(n0)
        tracker.initialize(
            jnp.asarray(image0), kpts, descs, mask,
            p3d_ids, pts3d[ids0], pose0, K,
        )

        errs = []
        for i in range(1, 8):
            pose_gt = camera(i)
            image, uv, vis = render_scene(
                rng, pose_gt, K, pts3d, tex_phase, img
            )
            ids = np.nonzero(vis)[0][: cfg.n_kpts]
            n = len(ids)
            kpts = np.zeros((cfg.n_kpts, 2), np.float32)
            kpts[:n] = uv[ids] + rng.normal(size=(n, 2)) * 0.2
            descs = np.zeros((cfg.n_kpts, 32), np.float32)
            descs[:n] = desc[ids]
            mask = np.zeros(cfg.n_kpts, bool)
            mask[:n] = True
            out = tracker.track(jnp.asarray(image), kpts, descs, mask, K)
            r_err, t_err = query_pose_error(
                out["pose"], jnp.asarray(pose_gt)
            )
            errs.append((float(r_err), float(t_err)))

        r_errs = np.array([e[0] for e in errs])
        t_errs = np.array([e[1] for e in errs])
        # Tracking stays locked: every frame within 5 cm / 5 deg, most
        # within 1 cm / 1 deg.
        assert r_errs.max() < 5.0, errs
        assert t_errs.max() < 5.0, errs
        assert (r_errs < 1.0).mean() > 0.5, errs

    @pytest.mark.slow
    def test_motion_fallback_on_blank_frame(self):
        rng = np.random.default_rng(1)
        img = 160
        pts3d = ((rng.random((60, 3)) - 0.5) * 0.2).astype(np.float32)
        tex_phase = rng.random(60) * 6.28
        K = np.array(
            [[300.0, 0, img / 2], [0, 300.0, img / 2], [0, 0, 1]],
            np.float32,
        )
        desc = rng.normal(size=(60, 16)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        pose0 = look_at(np.array([0.6, 0.0, 0.35]))
        image0, uv0, vis0 = render_scene(rng, pose0, K, pts3d, tex_phase, img)
        cfg = TrackerConfig(
            window_size=3, n_kpts=64, point_capacity=256,
            kf_interval=2, ransac_hyp=32, ba_iters=2,
        )
        tracker = BATracker(cfg)
        ids0 = np.nonzero(vis0)[0][:64]
        n0 = len(ids0)
        kpts = np.zeros((64, 2), np.float32)
        kpts[:n0] = uv0[ids0]
        descs = np.zeros((64, 16), np.float32)
        descs[:n0] = desc[ids0]
        mask = np.zeros(64, bool)
        mask[:n0] = True
        p3d = np.full(64, -1, np.int32)
        p3d[:n0] = np.arange(n0)
        tracker.initialize(
            jnp.asarray(image0), kpts, descs, mask, p3d,
            pts3d[ids0], pose0, K,
        )
        # A blank frame: flow must fail, motion fallback must keep the
        # pose finite and close to the last pose.
        blank = jnp.zeros((img, img), jnp.float32)
        out = tracker.track(
            blank, np.zeros((64, 2), np.float32),
            np.zeros((64, 16), np.float32), np.zeros(64, bool), K,
        )
        assert out["used_motion"]
        assert np.all(np.isfinite(np.asarray(out["pose"])))
        r_err, t_err = query_pose_error(
            out["pose"], jnp.asarray(pose0)
        )
        assert float(t_err) < 5.0

    def test_track_is_one_dispatch_one_fetch(self):
        """The tracked-frame contract (SURVEY §7.1 'no per-frame host
        sync'): track() issues EXACTLY one device dispatch (the fused
        _megastep program) and one host fetch (the packed diagnostics),
        and reuses one compiled program across frames (keyframe cadence
        flags are traced, not static)."""
        import onepose_tpu.tracker.ba_tracker as bt

        rng = np.random.default_rng(2)
        img = 96
        pts3d = ((rng.random((40, 3)) - 0.5) * 0.2).astype(np.float32)
        tex_phase = rng.random(40) * 6.28
        K = np.array(
            [[200.0, 0, img / 2], [0, 200.0, img / 2], [0, 0, 1]],
            np.float32,
        )
        desc = rng.normal(size=(40, 16)).astype(np.float32)
        pose0 = look_at(np.array([0.6, 0.0, 0.35]))
        image0, uv0, vis0 = render_scene(
            rng, pose0, K, pts3d, tex_phase, img
        )
        cfg = TrackerConfig(
            window_size=3, n_kpts=32, point_capacity=128,
            kf_interval=2, ransac_hyp=32, ba_iters=2,
        )
        tracker = BATracker(cfg)
        ids0 = np.nonzero(vis0)[0][:32]
        n0 = len(ids0)
        kpts = np.zeros((32, 2), np.float32)
        kpts[:n0] = uv0[ids0]
        descs = np.zeros((32, 16), np.float32)
        descs[:n0] = desc[ids0]
        mask = np.zeros(32, bool)
        mask[:n0] = True
        p3d = np.full(32, -1, np.int32)
        p3d[:n0] = np.arange(n0)
        tracker.initialize(
            jnp.asarray(image0), kpts, descs, mask, p3d,
            pts3d[ids0], pose0, K,
        )

        calls = []
        orig_mega = bt._megastep
        orig_unpack = BATracker._unpack

        def spy_mega(*a, **k):
            calls.append("dispatch")
            return orig_mega(*a, **k)

        def spy_unpack(self, packed):
            calls.append("fetch")
            return orig_unpack(self, packed)

        from unittest import mock

        cache_before = orig_mega._cache_size()
        with mock.patch.object(bt, "_megastep", spy_mega), \
                mock.patch.object(BATracker, "_unpack", spy_unpack):
            for i in range(3):
                calls.clear()
                tracker.track(jnp.asarray(image0), kpts, descs, mask, K)
                assert calls == ["dispatch", "fetch"], calls
        # ONE new compiled program serves keyframe and non-keyframe
        # cadences alike (other tests may have populated the cache with
        # other TrackerConfig shapes, so assert the delta).
        assert orig_mega._cache_size() - cache_before == 1
