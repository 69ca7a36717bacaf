"""SfM subsystem tests: synthetic scene with known geometry end-to-end."""

import pytest
import numpy as np
import jax.numpy as jnp

from onepose_tpu.models.nn_matcher import mutual_nn_match
from onepose_tpu.sfm import (
    covis_pairs_from_poses,
    epipolar_verify_matches,
    build_tracks,
    filter_points_by_box,
    merge_close_points,
    track_length_for_max_points,
)
from onepose_tpu.sfm.mapping import MappingConfig, run_mapping


def look_at_pose(center, target=np.zeros(3), up_hint=np.array([0.0, 0.0, 1.0])):
    z = target - center
    z = z / np.linalg.norm(z)
    x = np.cross(up_hint, z)
    if np.linalg.norm(x) < 1e-6:
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)
    t = -R @ center
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = t
    return pose


def make_scene(rng, n_pts=300, n_frames=12, n_slots=256, img=512, noise=0.0):
    """Synthetic object + ring of cameras; returns frame features + GT."""
    pts = (rng.random((n_pts, 3)) - 0.5) * 0.2
    desc_gt = rng.normal(size=(n_pts, 32)).astype(np.float32)
    desc_gt /= np.linalg.norm(desc_gt, axis=-1, keepdims=True)
    K = np.array([[500.0, 0, img / 2], [0, 500.0, img / 2], [0, 0, 1]])

    poses, kpts, descs, scores, masks, gt_ids = [], [], [], [], [], []
    for f in range(n_frames):
        ang = 2 * np.pi * f / n_frames
        center = np.array(
            [np.cos(ang), np.sin(ang), 0.4 + 0.1 * np.sin(3 * ang)]
        )
        pose = look_at_pose(center)
        R, t = pose[:3, :3], pose[:3, 3]
        pc = pts @ R.T + t
        uv = pc @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        vis = (
            (pc[:, 2] > 0.1)
            & (uv[:, 0] > 8) & (uv[:, 0] < img - 8)
            & (uv[:, 1] > 8) & (uv[:, 1] < img - 8)
        )
        ids = np.nonzero(vis)[0][:n_slots]
        n = len(ids)
        kp = np.zeros((n_slots, 2), np.float32)
        kp[:n] = uv[ids] + rng.normal(size=(n, 2)) * noise
        de = np.ones((n_slots, 32), np.float32)
        de[:n] = desc_gt[ids]
        sc = np.zeros((n_slots,), np.float32)
        sc[:n] = rng.random(n)
        mk = np.zeros(n_slots, bool)
        mk[:n] = True
        gid = np.full(n_slots, -1, np.int64)
        gid[:n] = ids
        poses.append(pose)
        kpts.append(kp)
        descs.append(de)
        scores.append(sc)
        masks.append(mk)
        gt_ids.append(gid)
    return {
        "pts": pts,
        "desc_gt": desc_gt,
        "K": np.broadcast_to(K, (n_frames, 3, 3)).astype(np.float32),
        "poses": np.stack(poses).astype(np.float32),
        "keypoints": np.stack(kpts),
        "descriptors": np.stack(descs),
        "scores": np.stack(scores),
        "mask": np.stack(masks),
        "gt_ids": np.stack(gt_ids),
    }


def nn_pair_matcher(scene):
    def match(pairs):
        out = []
        for i, j in pairs:
            m = mutual_nn_match(
                jnp.asarray(scene["descriptors"][i]),
                jnp.asarray(scene["descriptors"][j]),
                jnp.asarray(scene["mask"][i]),
                jnp.asarray(scene["mask"][j]),
                distance_thresh=0.2,
            )
            out.append(np.asarray(m["matches0"]))
        return np.stack(out)

    return match


class TestCovis:
    def test_pairs_valid_rotation(self):
        rng = np.random.default_rng(0)
        scene = make_scene(rng, n_frames=8)
        pairs = covis_pairs_from_poses(scene["poses"], num_matched=4)
        assert len(pairs) > 0
        R = scene["poses"][:, :3, :3]
        for i, j in pairs:
            rel = R[i] @ R[j].T
            ang = np.degrees(
                np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1))
            )
            assert ang > 10.0


class TestVerify:
    def test_epipolar_gate(self):
        rng = np.random.default_rng(1)
        scene = make_scene(rng, n_frames=4)
        i, j = 0, 1
        # True correspondences pass; corrupted ones fail.
        ids_i = scene["gt_ids"][i]
        ids_j = scene["gt_ids"][j]
        common = np.intersect1d(ids_i[ids_i >= 0], ids_j[ids_j >= 0])[:50]
        pos_i = np.array([np.nonzero(ids_i == c)[0][0] for c in common])
        pos_j = np.array([np.nonzero(ids_j == c)[0][0] for c in common])
        uv0 = scene["keypoints"][i][pos_i]
        uv1 = scene["keypoints"][j][pos_j]
        good = epipolar_verify_matches(
            jnp.asarray(uv0), jnp.asarray(uv1),
            jnp.ones(len(uv0), bool),
            jnp.asarray(scene["K"][i]),
            jnp.asarray(scene["poses"][i][:3, :3]),
            jnp.asarray(scene["poses"][i][:3, 3]),
            jnp.asarray(scene["K"][j]),
            jnp.asarray(scene["poses"][j][:3, :3]),
            jnp.asarray(scene["poses"][j][:3, 3]),
        )
        assert np.asarray(good).mean() > 0.95
        bad = epipolar_verify_matches(
            jnp.asarray(uv0),
            jnp.asarray(uv1[::-1].copy()),
            jnp.ones(len(uv0), bool),
            jnp.asarray(scene["K"][i]),
            jnp.asarray(scene["poses"][i][:3, :3]),
            jnp.asarray(scene["poses"][i][:3, 3]),
            jnp.asarray(scene["K"][j]),
            jnp.asarray(scene["poses"][j][:3, :3]),
            jnp.asarray(scene["poses"][j][:3, 3]),
        )
        assert np.asarray(bad).mean() < 0.2


class TestTracks:
    def test_chain_merging(self):
        # Frames 0-1-2 chained matches on the same physical point ->
        # single track of length 3.
        pairs = np.array([[0, 1], [1, 2]])
        matches0 = np.full((2, 4), -1)
        matches0[0, 0] = 2  # f0 kpt0 <-> f1 kpt2
        matches0[1, 2] = 3  # f1 kpt2 <-> f2 kpt3
        tr = build_tracks(pairs, matches0, 3, 4)
        assert tr.n_tracks == 1
        assert tr.lengths[0] == 3
        obs = set(
            zip(
                tr.obs_frame[0][tr.obs_mask[0]].tolist(),
                tr.obs_kpt[0][tr.obs_mask[0]].tolist(),
            )
        )
        assert obs == {(0, 0), (1, 2), (2, 3)}

    def test_conflict_dropped(self):
        # Two kpts of frame 0 joined to the same frame-1 kpt: one
        # observation per frame survives.
        pairs = np.array([[0, 1]])
        matches0 = np.full((1, 4), -1)
        matches0[0, 0] = 1
        matches0[0, 2] = 1
        tr = build_tracks(pairs, matches0, 2, 4)
        assert tr.n_tracks == 1
        assert tr.lengths[0] == 2


class TestFiltering:
    def test_track_length_threshold(self):
        lengths = np.array([2] * 50 + [3] * 30 + [5] * 10)
        assert track_length_for_max_points(lengths, 90) == 2
        assert track_length_for_max_points(lengths, 40) == 3
        assert track_length_for_max_points(lengths, 10) == 5
        assert track_length_for_max_points(lengths, 5) == 6

    def test_box_filter(self):
        # Unit box corners in the OnePose layout.
        corners = np.array(
            [
                [0, 1, 0], [0, 1, 1], [1, 1, 1], [1, 1, 0],
                [0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0],
            ],
            float,
        )
        pts = np.array(
            [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]]
        )
        keep = filter_points_by_box(pts, corners)
        assert keep.tolist() == [True, False, False]

    def test_merge(self):
        pts = np.array(
            [[0, 0, 0], [0, 0, 0.0005], [1, 1, 1], [2, 2, 2]], float
        )
        merged, groups = merge_close_points(pts, np.arange(4), 1e-3)
        assert len(merged) == 3
        sizes = sorted(len(v) for v in groups.values())
        assert sizes == [1, 1, 2]
        g2 = [v for v in groups.values() if len(v) == 2][0]
        assert set(g2.tolist()) == {0, 1}


class TestMappingEndToEnd:
    def test_reconstruction_accuracy(self):
        rng = np.random.default_rng(42)
        scene = make_scene(rng, n_pts=300, n_frames=12, noise=0.3)
        res = run_mapping(
            scene["keypoints"], scene["descriptors"], scene["scores"],
            scene["mask"], scene["K"], scene["poses"],
            nn_pair_matcher(scene),
            config=MappingConfig(max_points3d=500, num_covis=6),
            pad_points_to=512,
        )
        # Most of the visible object should be reconstructed.
        assert res.stats["num_points3d"] > 150, res.stats
        assert res.stats["mean_reproj_error_px"] < 1.0, res.stats
        assert res.stats["mean_track_length"] >= 3, res.stats

        # Every reconstructed point must be close to a GT point, and its
        # aggregated descriptor close to that point's GT descriptor.
        d = np.linalg.norm(
            res.points_xyz[:, None, :] - scene["pts"][None], axis=-1
        )
        nearest = d.argmin(axis=1)
        np.testing.assert_array_less(d.min(axis=1), 5e-3)
        desc_sim = np.einsum(
            "pc,pc->p",
            res.annotation.desc3d[: len(nearest)] /
            np.linalg.norm(
                np.asarray(res.annotation.desc3d[: len(nearest)]),
                axis=-1, keepdims=True,
            ),
            scene["desc_gt"][nearest],
        )
        assert desc_sim.mean() > 0.99

        # Annotation mask marks exactly the real slots.
        P = res.stats["num_points3d"]
        assert bool(np.all(np.asarray(res.annotation.mask3d[:P])))
        assert not bool(np.any(np.asarray(res.annotation.mask3d[P:])))

        # Assign matrices reference valid ids and are 1-to-1.
        for f, am in res.frame_assign.items():
            if am.shape[1] == 0:
                continue
            assert len(np.unique(am[0])) == am.shape[1]
            assert len(np.unique(am[1])) == am.shape[1]
            assert am[1].max() < P

    @pytest.mark.slow
    def test_global_ba_improves_map(self):
        """global_ba=True (reference global_ba.py equivalent) must reduce
        reprojection RMSE and tighten the map against GT geometry."""
        rng = np.random.default_rng(3)
        scene = make_scene(rng, n_pts=250, n_frames=12, noise=1.0)
        base_cfg = dict(max_points3d=500, num_covis=6)
        res_plain = run_mapping(
            scene["keypoints"], scene["descriptors"], scene["scores"],
            scene["mask"], scene["K"], scene["poses"],
            nn_pair_matcher(scene),
            config=MappingConfig(**base_cfg),
            pad_points_to=512,
        )
        res_ba = run_mapping(
            scene["keypoints"], scene["descriptors"], scene["scores"],
            scene["mask"], scene["K"], scene["poses"],
            nn_pair_matcher(scene),
            config=MappingConfig(global_ba=True, **base_cfg),
            pad_points_to=512,
        )
        assert "global_ba_rmse_final_px" in res_ba.stats
        assert (
            res_ba.stats["global_ba_rmse_final_px"]
            <= res_ba.stats["global_ba_rmse_initial_px"] + 1e-6
        ), res_ba.stats
        assert res_ba.refined_poses is None  # cameras fixed by default

        def gt_err(res):
            d = np.linalg.norm(
                res.points_xyz[:, None, :] - scene["pts"][None], axis=-1
            )
            return d.min(axis=1).mean()

        assert gt_err(res_ba) <= gt_err(res_plain) + 1e-6

        # Refining cameras too must still converge and return poses.
        res_cam = run_mapping(
            scene["keypoints"], scene["descriptors"], scene["scores"],
            scene["mask"], scene["K"], scene["poses"],
            nn_pair_matcher(scene),
            config=MappingConfig(
                global_ba=True, global_ba_refine_cameras=True, **base_cfg
            ),
            pad_points_to=512,
        )
        assert res_cam.refined_poses is not None
        assert res_cam.refined_poses.shape == scene["poses"].shape
        assert (
            res_cam.stats["global_ba_rmse_final_px"]
            <= res_cam.stats["global_ba_rmse_initial_px"] + 1e-6
        )

    def test_box_filter_in_mapping(self):
        rng = np.random.default_rng(7)
        scene = make_scene(rng, n_pts=200, n_frames=10)
        half = np.array(
            [
                [-0.2, 0.2, -0.2], [-0.2, 0.2, 0.2],
                [0.0, 0.2, 0.2], [0.0, 0.2, -0.2],
                [-0.2, -0.2, -0.2], [-0.2, -0.2, 0.2],
                [0.0, -0.2, 0.2], [0.0, -0.2, -0.2],
            ]
        )  # box covering only x < 0
        res = run_mapping(
            scene["keypoints"], scene["descriptors"], scene["scores"],
            scene["mask"], scene["K"], scene["poses"],
            nn_pair_matcher(scene),
            box_corners=half,
            config=MappingConfig(max_points3d=500, num_covis=6),
            pad_points_to=256,
        )
        assert np.all(res.points_xyz[:, 0] < 0.0)
