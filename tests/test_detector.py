"""Tests: similarity RANSAC, feature detector, evaluator."""

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.detector.feature_detector import (
    FeatureObjectDetector,
    ReferenceDB,
    select_reference_views,
)
from onepose_tpu.eval import Evaluator
from onepose_tpu.geometry.similarity import ransac_similarity
from onepose_tpu.models.nn_matcher import mutual_nn_match


class TestSimilarityRansac:
    def test_exact_recovery(self):
        rng = np.random.default_rng(0)
        n = 100
        src = rng.random((n, 2)).astype(np.float32) * 100
        s, th = 1.7, np.deg2rad(25)
        A = s * np.array(
            [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        )
        b = np.array([30.0, -12.0])
        dst = (src @ A.T + b).astype(np.float32)
        out = ransac_similarity(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
            jnp.ones(n, bool),
        )
        assert bool(out["ok"])
        A_est = np.asarray(out["A"])
        np.testing.assert_allclose(A_est[:, :2], A, atol=1e-3)
        np.testing.assert_allclose(A_est[:, 2], b, atol=1e-2)
        assert int(out["num_inliers"]) == n

    def test_outliers_and_mask(self):
        rng = np.random.default_rng(1)
        n = 128
        src = rng.random((n, 2)).astype(np.float32) * 100
        dst = (src * 2.0 + np.array([5, 5])).astype(np.float32)
        n_out = 50
        dst[:n_out] = rng.random((n_out, 2)).astype(np.float32) * 500
        mask = np.ones(n, bool)
        mask[-10:] = False  # padded garbage
        dst[-10:] = 1e6
        out = ransac_similarity(
            jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(mask),
        )
        A_est = np.asarray(out["A"])
        np.testing.assert_allclose(
            A_est[:, :2], 2.0 * np.eye(2), atol=1e-2
        )
        assert not bool(jnp.any(out["inliers"][-10:]))


class TestFeatureDetector:
    def _make_db(self, rng, V=4, N=64, C=32, img=128):
        kpts = rng.random((V, N, 2)).astype(np.float32) * img
        desc = rng.normal(size=(V, N, C)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        return ReferenceDB(
            keypoints=jnp.asarray(kpts),
            descriptors=jnp.asarray(desc),
            scores=jnp.asarray(rng.random((V, N)).astype(np.float32)),
            mask=jnp.ones((V, N), bool),
            sizes_hw=np.full((V, 2), img),
        )

    def test_detect_translated_object(self):
        rng = np.random.default_rng(2)
        img = 128
        db = self._make_db(rng, img=img)
        # Query = view 1 shifted by (+40, +20) and scaled 1.5, with noise
        # keypoints appended.
        view = 1
        shift = np.array([40.0, 20.0])
        q_true = np.asarray(db.keypoints[view]) * 1.5 + shift
        q_noise = rng.random((30, 2)).astype(np.float32) * img
        q_kpts = np.concatenate([q_true, q_noise]).astype(np.float32)
        q_desc = np.concatenate(
            [
                np.asarray(db.descriptors[view]),
                rng.normal(size=(30, 32)).astype(np.float32),
            ]
        )
        q_desc /= np.linalg.norm(q_desc, axis=-1, keepdims=True)

        def match_fn(db_, query):
            m = mutual_nn_match(
                db_.descriptors,
                jnp.broadcast_to(
                    jnp.asarray(query["descriptors"])[None],
                    (db_.descriptors.shape[0],) + query["descriptors"].shape,
                ),
                db_.mask,
                jnp.broadcast_to(
                    jnp.asarray(query["mask"])[None],
                    (db_.descriptors.shape[0],) + query["mask"].shape,
                ),
                distance_thresh=0.2,
            )
            return m["matches0"]

        det = FeatureObjectDetector(db, match_fn)
        out = det.detect_bbox(
            {
                "keypoints": q_kpts,
                "descriptors": q_desc,
                "scores": np.ones(len(q_kpts), np.float32),
                "mask": np.ones(len(q_kpts), bool),
            }
        )
        assert out["ok"]
        assert out["view"] == view
        # Corners of the 128-image through scale 1.5 + shift.
        np.testing.assert_allclose(
            out["bbox"],
            [shift[0], shift[1], img * 1.5 + shift[0], img * 1.5 + shift[1]],
            atol=1.0,
        )

    def test_crop_K_contract(self):
        rng = np.random.default_rng(3)
        db = self._make_db(rng)
        det = FeatureObjectDetector(db, lambda a, b: None, crop_size=64)
        K = np.array([[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]])
        image = jnp.asarray(rng.random((128, 128), np.float32))
        bbox = np.array([20.0, 30.0, 84.0, 94.0])
        crop, K_crop = det.crop(image, bbox, K)
        assert crop.shape == (64, 64)
        # A world point projecting to the bbox center must project to the
        # crop center under K_crop.
        uv_c = np.array([(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2])
        p = np.linalg.inv(K) @ np.array([uv_c[0], uv_c[1], 1.0])
        uv_crop = K_crop @ p
        uv_crop = uv_crop[:2] / uv_crop[2]
        np.testing.assert_allclose(uv_crop, [32, 32], atol=1e-3)

    def test_previous_pose_detect(self):
        rng = np.random.default_rng(4)
        db = self._make_db(rng)
        det = FeatureObjectDetector(db, lambda a, b: None)
        K = np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]])
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, 1.0]
        corners = (np.array(
            [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)]
        ) * 0.05)
        bbox = det.previous_pose_detect(K, pose, corners)
        # Symmetric box at image center.
        assert abs((bbox[0] + bbox[2]) / 2 - 64) < 1
        assert abs((bbox[1] + bbox[3]) / 2 - 64) < 1
        assert bbox[2] > bbox[0] and bbox[3] > bbox[1]

    def test_select_reference_views(self):
        idx = select_reference_views(150, 15)
        assert len(idx) == 15
        assert idx[0] == 0 and idx[-1] <= 149


class TestEvaluator:
    def test_accumulate_and_summarize(self):
        ev = Evaluator()
        pose = np.eye(4)
        ev.evaluate(pose, pose)  # perfect
        bad = np.eye(4)
        bad[:3, 3] = [0.1, 0, 0]  # 10 cm off
        ev.evaluate(bad, np.eye(4))
        ev.evaluate(None, np.eye(4))  # failed frame
        m = ev.summarize()
        assert m["num_frames"] == 3
        np.testing.assert_allclose(m["cmd1"], 1 / 3)
        np.testing.assert_allclose(m["cmd5"], 1 / 3)
        # Summarize resets.
        assert ev.summarize()["num_frames"] == 0

    def test_batched(self):
        ev = Evaluator()
        poses = np.tile(np.eye(4), (5, 1, 1))
        ev.evaluate(poses, poses)
        assert ev.summarize()["cmd1"] == 1.0
