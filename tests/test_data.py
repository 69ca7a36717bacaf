"""Data-layer tests: padding, annotation I/O round trips, dataset, parser."""

import json
import os.path as osp

import numpy as np
import pytest

from onepose_tpu.data.anno_io import (
    annotation_from_npz_dir,
    load_anno2d,
    merge_anno_indices,
    read_anno_index,
    save_anno2d,
    save_annotation_npz,
    write_anno_index,
)
from onepose_tpu.data.dataset import GATsSPGDataset, batch_iterator
from onepose_tpu.data.padding import (
    assign_to_conf_matrix,
    pad_keypoints2d,
    pad_points3d,
)
from onepose_tpu.data.scan_parser import (
    parse_box,
    parse_intrinsics,
    parse_poses,
)


class TestPadding:
    def test_pad_keypoints2d(self):
        rng = np.random.default_rng(0)
        out = pad_keypoints2d(
            rng.random((10, 2)).astype(np.float32) * 100,
            rng.normal(size=(10, 16)).astype(np.float32),
            rng.random(10).astype(np.float32),
            128, 128, 32, rng=rng,
        )
        assert out["keypoints"].shape == (32, 2)
        assert out["mask"].sum() == 10
        # Pad fill contract: descriptor ones, score zero, coords in image.
        np.testing.assert_array_equal(out["descriptors"][10:], 1.0)
        np.testing.assert_array_equal(out["scores"][10:], 0.0)
        assert out["keypoints"][10:].max() < 128

    def test_truncation(self):
        rng = np.random.default_rng(1)
        out = pad_points3d(
            rng.random((50, 3)).astype(np.float32),
            rng.normal(size=(50, 8)).astype(np.float32),
            rng.random(50).astype(np.float32),
            20, rng=rng,
        )
        assert out["points3d"].shape == (20, 3)
        assert out["mask"].all()

    def test_conf_matrix(self):
        am = np.array([[0, 3, 5], [1, 0, 9]])
        conf = assign_to_conf_matrix(am, 6, 10, 8, 12)
        assert conf.shape == (8, 12)
        assert conf.sum() == 3
        assert conf[0, 1] == 1 and conf[3, 0] == 1 and conf[5, 9] == 1
        # Out-of-shape pairs dropped.
        am2 = np.array([[7], [11]])
        assert assign_to_conf_matrix(am2, 6, 10, 8, 12).sum() == 0


class TestAnnoIO:
    def _mapping_result(self, rng, tmp_path):
        import sys

        sys.path.insert(0, osp.dirname(__file__))
        from test_sfm import make_scene, nn_pair_matcher
        from onepose_tpu.sfm.mapping import MappingConfig, run_mapping

        scene = make_scene(rng, n_pts=150, n_frames=8)
        res = run_mapping(
            scene["keypoints"], scene["descriptors"], scene["scores"],
            scene["mask"], scene["K"], scene["poses"],
            nn_pair_matcher(scene),
            config=MappingConfig(max_points3d=300, num_covis=4),
            pad_points_to=256,
        )
        return res

    def test_npz_round_trip(self, tmp_path):
        rng = np.random.default_rng(2)
        res = self._mapping_result(rng, tmp_path)
        anno_dir = str(tmp_path / "anno")
        save_annotation_npz(res, anno_dir)
        anno = annotation_from_npz_dir(anno_dir, num_leaf=8, shape3d=256)
        P = res.stats["num_points3d"]
        np.testing.assert_allclose(
            np.asarray(anno.points3d[:P]), res.points_xyz, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(anno.desc3d[:P]),
            np.asarray(res.annotation.desc3d[:P]),
            atol=1e-5,
        )
        assert bool(np.all(np.asarray(anno.mask3d[:P])))
        assert not bool(np.any(np.asarray(anno.mask3d[P:])))

    def test_anno2d_round_trip(self, tmp_path):
        rng = np.random.default_rng(3)
        path = str(tmp_path / "anno" / "0.json")
        kp = rng.random((12, 2)).astype(np.float32)
        de = rng.normal(size=(12, 8)).astype(np.float32)
        sc = rng.random(12).astype(np.float32)
        am = np.array([[0, 1], [5, 2]])
        save_anno2d(path, kp, de, sc, am)
        back = load_anno2d(path)
        np.testing.assert_allclose(back["keypoints2d"], kp, atol=1e-6)
        np.testing.assert_allclose(back["descriptors2d"], de, atol=1e-6)
        np.testing.assert_array_equal(back["assign_matrix"], am)

    def test_merge_indices(self, tmp_path):
        a = str(tmp_path / "a.json")
        b = str(tmp_path / "b.json")
        write_anno_index(
            a, [{"anno_id": 1, "anno_file": "x", "img_file": "y",
                 "pose_file": "z"}]
        )
        write_anno_index(
            b,
            [
                {"anno_id": 1, "anno_file": "u", "img_file": "v",
                 "pose_file": "w"},
                {"anno_id": 2, "anno_file": "q", "img_file": "r",
                 "pose_file": "s"},
            ],
        )
        out = str(tmp_path / "merged.json")
        n = merge_anno_indices([a, b], out)
        assert n == 3
        merged = read_anno_index(out)
        assert [e["anno_id"] for e in merged] == [1, 2, 3]


class TestDataset:
    def _build_fixture(self, tmp_path, rng, n_imgs=3):
        import cv2
        import sys

        sys.path.insert(0, osp.dirname(__file__))
        from test_sfm import make_scene, nn_pair_matcher
        from onepose_tpu.sfm.mapping import MappingConfig, run_mapping

        scene = make_scene(rng, n_pts=150, n_frames=8)
        res = run_mapping(
            scene["keypoints"], scene["descriptors"], scene["scores"],
            scene["mask"], scene["K"], scene["poses"],
            nn_pair_matcher(scene),
            config=MappingConfig(max_points3d=300, num_covis=4),
            pad_points_to=256,
        )
        anno_dir = tmp_path / "obj" / "anno"
        save_annotation_npz(res, str(anno_dir))
        entries = []
        (tmp_path / "obj" / "seq" / "color").mkdir(parents=True)
        for i in range(n_imgs):
            img_file = str(tmp_path / "obj" / "seq" / "color" / f"{i}.png")
            cv2.imwrite(
                img_file,
                (rng.random((64, 64)) * 255).astype(np.uint8),
            )
            anno_file = str(anno_dir / f"img_{i}.json")
            am = res.frame_assign.get(i, np.zeros((2, 0), np.int64))
            save_anno2d(
                anno_file,
                scene["keypoints"][i],
                scene["descriptors"][i],
                scene["scores"][i],
                am,
            )
            entries.append(
                {
                    "anno_id": i + 1,
                    "anno_file": anno_file,
                    "anno3d_dir": str(anno_dir),
                    "img_file": img_file,
                    "pose_file": "",
                    "height": 64,
                    "width": 64,
                }
            )
        index = str(tmp_path / "train.json")
        write_anno_index(index, entries)
        return index, res

    def test_item_shapes_and_gt(self, tmp_path):
        rng = np.random.default_rng(4)
        index, res = self._build_fixture(tmp_path, rng)
        ds = GATsSPGDataset(
            index, num_leaf=4, shape2d=300, shape3d=256
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["desc2d"].shape == (300, 32)
        assert item["desc3d"].shape == (256, 32)
        assert item["leaf_desc"].shape == (256, 4, 32)
        assert item["conf_gt"].shape == (300, 256)
        # GT matches count equals the stored assign matrix size.
        am = res.frame_assign.get(0, np.zeros((2, 0)))
        assert item["conf_gt"].sum() == am.shape[1]
        # Positives only on valid slots.
        pos2d = np.nonzero(item["conf_gt"].sum(1))[0]
        assert item["mask2d"][pos2d].all()

    def test_batch_iterator(self, tmp_path):
        rng = np.random.default_rng(5)
        index, _ = self._build_fixture(tmp_path, rng)
        ds = GATsSPGDataset(index, num_leaf=4, shape2d=300, shape3d=256)
        batches = list(batch_iterator(ds, batch_size=2, seed=0))
        assert len(batches) == 1
        assert batches[0]["desc2d"].shape == (2, 300, 32)
        assert batches[0]["conf_gt"].shape == (2, 300, 256)


class TestScanParser:
    def test_parse_intrinsics(self, tmp_path):
        f = tmp_path / "intrinsics.txt"
        f.write_text(
            "# header\n0,0.0,500,510,320,240\n1,0.1,502,512,322,242\n"
        )
        K = parse_intrinsics(str(f))
        np.testing.assert_allclose(K[0, 0], 501.0)
        np.testing.assert_allclose(K[1, 2], 241.0)

    def test_parse_box_and_poses(self, tmp_path):
        box = tmp_path / "Box.txt"
        box.write_text(
            "header\n0.1,0.2,0.3,0.4,0.6,0.8,1,0,0,0\n"
        )
        corners, T_ow = parse_box(str(box))
        assert corners.shape == (8, 3)
        np.testing.assert_allclose(np.abs(corners).max(axis=0), [0.2, 0.3, 0.4])
        np.testing.assert_allclose(T_ow[:3, 3], [0.1, 0.2, 0.3])

        poses = tmp_path / "ARposes.txt"
        poses.write_text(
            "# c\n0.0,0.5,0.0,1.0,1,0,0,0\n\n0.1,0.5,0.1,1.0,1,0,0,0\n"
        )
        out = parse_poses(str(poses), T_ow)
        assert set(out.keys()) == {0, 1}
        T_oc = out[0]
        # Round trip: object origin maps to the camera coordinates of the
        # object center; verify inversion identity instead of hand values.
        T_cw = np.eye(4)
        T_cw[:3, :3] = np.diag([1.0, -1.0, -1.0])
        T_cw[:3, 3] = [0.5, 0.0, 1.0]
        np.testing.assert_allclose(
            T_oc, np.linalg.inv(T_cw) @ T_ow, atol=1e-12
        )

    def test_full_parse_scan(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(6)
        # Build a tiny capture: object at origin, camera 0.5m in front.
        (tmp_path / "cap").mkdir()
        cap_dir = str(tmp_path / "cap")
        with open(osp.join(cap_dir, "intrinsics.txt"), "w") as f:
            f.write("0,0.0,100,100,64,64\n")
        with open(osp.join(cap_dir, "Box.txt"), "w") as f:
            f.write("h\n0,0,0,0.2,0.2,0.2,1,0,0,0\n")
        with open(osp.join(cap_dir, "ARposes.txt"), "w") as f:
            # Camera at z=0.5 in ARKit frame looking at origin after the
            # diag(1,-1,-1) flip.
            for i in range(4):
                f.write(f"{i * 0.1},0,0,0.5,1,0,0,0\n")
        writer = cv2.VideoWriter(
            osp.join(cap_dir, "Frames.m4v"),
            cv2.VideoWriter_fourcc(*"mp4v"),
            10,
            (128, 128),
        )
        if not writer.isOpened():
            pytest.skip("no mp4 codec available")
        for _ in range(4):
            writer.write(
                (rng.random((128, 128, 3)) * 255).astype(np.uint8)
            )
        writer.release()

        from onepose_tpu.data.scan_parser import parse_scan

        out = parse_scan(cap_dir, str(tmp_path / "out"), crop_size=64)
        assert out["num_frames"] == 4
        for sub in ("color", "poses_ba", "intrin_ba", "M"):
            assert osp.isdir(osp.join(str(tmp_path / "out"), sub))
        img = cv2.imread(
            osp.join(str(tmp_path / "out"), "color", "0.png")
        )
        assert img.shape[:2] == (64, 64)
        K2 = np.loadtxt(
            osp.join(str(tmp_path / "out"), "intrin_ba", "0.txt")
        )
        assert K2.shape == (3, 3) and np.isfinite(K2).all()
