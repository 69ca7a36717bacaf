"""Tests: COLMAP binary I/O (cross-checked vs the reference reader),
checkpointing, vis, profiling."""

import os
import os.path as osp
import sys

import numpy as np
import pytest

from onepose_tpu.data.colmap_io import (
    Camera,
    Image,
    Point3D,
    export_ply,
    read_model,
    write_model,
)
from onepose_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from onepose_tpu.utils.profiling import StageTimer
from onepose_tpu.utils.vis import (
    draw_3d_box,
    make_matching_plot,
    reproject,
)


def _toy_model(rng):
    cameras = {
        1: Camera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0]))
    }
    images = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = Image(
            i, q, rng.normal(size=3), 1, f"frame_{i}.png",
            rng.random((5, 2)) * 100,
            np.array([0, -1, 1, -1, 2], np.int64),
        )
    points = {
        j: Point3D(
            j, rng.normal(size=3), np.array([10, 20, 30], np.uint8),
            0.5, np.array([1, 2]), np.array([0, 2]),
        )
        for j in range(3)
    }
    return cameras, images, points


class TestColmapIO:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        cams, imgs, pts = _toy_model(rng)
        write_model(str(tmp_path), cams, imgs, pts)
        cams2, imgs2, pts2 = read_model(str(tmp_path))
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        assert cams2[1].model == "PINHOLE"
        for i in imgs:
            np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec)
            np.testing.assert_allclose(imgs2[i].xys, imgs[i].xys)
            np.testing.assert_array_equal(
                imgs2[i].point3D_ids, imgs[i].point3D_ids
            )
            assert imgs2[i].name == imgs[i].name
        for j in pts:
            np.testing.assert_allclose(pts2[j].xyz, pts[j].xyz)
            np.testing.assert_array_equal(
                pts2[j].image_ids, pts[j].image_ids
            )

    @pytest.mark.skipif(
        not os.path.isdir("/root/reference"),
        reason="reference not mounted",
    )
    def test_reference_reader_compat(self, tmp_path):
        """Our writer must produce files the reference's COLMAP reader
        parses identically (binary-format interop oracle)."""
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from src.utils.colmap.read_write_model import (
            read_cameras_binary,
            read_images_binary,
            read_points3d_binary,
        )

        rng = np.random.default_rng(1)
        cams, imgs, pts = _toy_model(rng)
        write_model(str(tmp_path), cams, imgs, pts)
        ref_cams = read_cameras_binary(str(tmp_path / "cameras.bin"))
        ref_imgs = read_images_binary(str(tmp_path / "images.bin"))
        ref_pts = read_points3d_binary(str(tmp_path / "points3D.bin"))
        assert ref_cams[1].model == "PINHOLE"
        np.testing.assert_allclose(ref_cams[1].params, cams[1].params)
        for i in imgs:
            np.testing.assert_allclose(ref_imgs[i].qvec, imgs[i].qvec)
            np.testing.assert_array_equal(
                ref_imgs[i].point3D_ids, imgs[i].point3D_ids
            )
        for j in pts:
            np.testing.assert_allclose(ref_pts[j].xyz, pts[j].xyz)

    def test_ply(self, tmp_path):
        xyz = np.random.default_rng(2).random((10, 3))
        path = str(tmp_path / "p.ply")
        export_ply(path, xyz)
        text = open(path).read()
        assert "element vertex 10" in text


class TestCheckpoint:
    def test_save_load_latest_prune(self, tmp_path):
        ckpt_dir = str(tmp_path / "ck")
        target = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "b": 1}
        for step in range(5):
            target["b"] = step
            save_checkpoint(ckpt_dir, target, step, keep=3)
        files = sorted(os.listdir(ckpt_dir))
        assert len(files) == 3  # pruned to keep=3
        latest = latest_checkpoint(ckpt_dir)
        assert latest.endswith("ckpt_4.msgpack")
        restored = load_checkpoint(latest, {"w": np.zeros((2, 3), np.float32), "b": 0})
        assert restored["b"] == 4
        np.testing.assert_array_equal(restored["w"], target["w"])


class TestVis:
    def test_reproject_and_box(self):
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, 1.0]
        corners = (
            np.array(
                [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)]
            )
            * 0.05
        )
        uv = reproject(K, pose, corners)
        assert np.all(np.abs(uv - 32) < 10)
        img = np.zeros((64, 64, 3), np.uint8)
        out = draw_3d_box(img, K, pose, corners)
        assert out.sum() > 0  # something was drawn

    def test_matching_plot(self):
        img0 = np.zeros((32, 32), np.uint8)
        img1 = np.zeros((32, 48), np.uint8)
        canvas = make_matching_plot(
            img0, img1, np.array([[5, 5]]), np.array([[10, 10]])
        )
        assert canvas.shape == (32, 80, 3)
        assert canvas.sum() > 0


class TestProfiler:
    def test_stage_timer(self):
        tm = StageTimer()
        with tm.stage("a"):
            pass
        tm.tick("b")
        tm.tock("b")
        rep = tm.report()
        assert set(rep) == {"a", "b"}
        assert rep["a"]["count"] == 1
        assert "a:" in tm.pretty()


class TestColmapDatabase:
    def test_roundtrip_and_pair_encoding(self, tmp_path):
        import numpy as np
        from onepose_tpu.data.colmap_database import (
            ColmapDatabase,
            images_from_pair_id,
            pair_id_from_images,
        )

        assert images_from_pair_id(pair_id_from_images(7, 3)) == (3, 7)

        db_path = str(tmp_path / "test.db")
        kp = np.array([[1.0, 2.0], [10.0, 20.0]], np.float32)
        m = np.array([[0, 1]], np.uint32)
        with ColmapDatabase(db_path) as db:
            cam = db.add_camera(1, 640, 480, np.array([500.0, 500, 320, 240]))
            i1 = db.add_image("a.png", cam)
            i2 = db.add_image("b.png", cam)
            db.add_keypoints(i1, kp)
            db.add_keypoints(i2, kp + 1)
            db.add_matches(i2, i1, m)  # reversed order: columns swap
            db.add_two_view_geometry(i1, i2, m)

        with ColmapDatabase(db_path) as db:
            np.testing.assert_allclose(db.read_keypoints(i1), kp + 0.5)
            np.testing.assert_array_equal(
                db.read_matches(i2, i1), m
            )
            np.testing.assert_array_equal(
                db.read_matches(i1, i2), m[:, ::-1]
            )

    def test_export_sequence(self, tmp_path):
        import numpy as np
        from onepose_tpu.data.colmap_database import (
            ColmapDatabase,
            export_sequence_to_db,
        )

        rng = np.random.default_rng(0)
        F, N = 3, 10
        feats = {
            "keypoints": rng.random((F, N, 2)).astype(np.float32) * 100,
            "mask": np.ones((F, N), bool),
            "K": np.tile(np.eye(3, dtype=np.float32) * 100, (F, 1, 1)),
            "image_paths": [f"/x/{i}.png" for i in range(F)],
        }
        pairs = {(0, 1): np.array([[0, 0], [1, 2]], np.uint32)}
        db_path = str(tmp_path / "seq.db")
        n = export_sequence_to_db(db_path, feats, pairs, (128, 128))
        assert n == F
        with ColmapDatabase(db_path) as db:
            assert db.read_keypoints(1).shape == (N, 2)
            assert db.read_matches(1, 2).shape == (2, 2)


class TestCocoExport:
    def test_export(self, tmp_path):
        from onepose_tpu.data.anno_io import (
            export_coco_anno,
            read_anno_index,
            write_anno_index,
        )

        idx = str(tmp_path / "index.json")
        write_anno_index(
            idx,
            [
                {"anno_id": 1, "anno_file": "a.json", "img_file": "a.png"},
                {"anno_id": 2, "anno_file": "b.json", "img_file": "b.png"},
            ],
        )
        coco = export_coco_anno(idx, str(tmp_path / "coco.json"))
        assert len(coco["images"]) == 2
        assert coco["annotations"][0]["image_id"] == coco["images"][0]["id"]
