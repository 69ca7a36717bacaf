"""CLI end-to-end tests on a synthetic on-disk sequence.

Builds a real sequence directory (color/, poses_ba/, intrin_ba/,
box3d_corners.txt) of rendered blob images, then drives
`python -m onepose_tpu map` and `infer` through the module entry point.
Random-weight networks: the gates check the plumbing (artifacts, formats,
metric structure), not learned accuracy.
"""

import json
import os.path as osp
import sys

import numpy as np
import pytest

from onepose_tpu.__main__ import main as cli_main
from onepose_tpu.config import load_config, get_by_dotted, snapshot_config


def build_sequence(tmp_path, rng, n_frames=10, img=128, n_pts=60):
    cv2 = pytest.importorskip("cv2")
    obj_root = tmp_path / "obj"
    seq = obj_root / "seq"
    for sub in ("color", "color_full", "poses_ba", "intrin_ba"):
        (seq / sub).mkdir(parents=True)
    pts3d = ((rng.random((n_pts, 3)) - 0.5) * 0.2).astype(np.float32)
    K = np.array(
        [[200.0, 0, img / 2], [0, 200.0, img / 2], [0, 0, 1]], np.float32
    )
    np.savetxt(
        str(obj_root / "box3d_corners.txt"),
        np.array(
            [[x, y, z] for y in (0.15, -0.15) for x, z in
             [(-0.15, -0.15), (-0.15, 0.15), (0.15, 0.15), (0.15, -0.15)]]
        ),
    )
    phases = rng.random(n_pts) * 6.28
    sizes = rng.uniform(2.0, 5.0, n_pts)
    ys, xs = np.mgrid[0:img, 0:img]
    for f in range(n_frames):
        ang = 0.5 * f / n_frames * 2 * np.pi
        center = np.array(
            [np.cos(ang) * 0.8, np.sin(ang) * 0.8, 0.5]
        )
        z = -center / np.linalg.norm(center)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ center
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = t
        pc = pts3d @ R.T + t
        uv = pc @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        image = np.zeros((img, img), np.float32)
        for p, ph, s in zip(uv, phases, sizes):
            if 5 < p[0] < img - 5 and 5 < p[1] < img - 5:
                d2 = (xs - p[0]) ** 2 + (ys - p[1]) ** 2
                image += (0.4 + 0.6 * np.sin(ph) ** 2) * np.exp(-d2 / s)
        png = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(str(seq / "color" / f"{f}.png"), png)
        cv2.imwrite(str(seq / "color_full" / f"{f}.png"), png)
        np.savetxt(str(seq / "poses_ba" / f"{f}.txt"), pose)
        np.savetxt(str(seq / "intrin_ba" / f"{f}.txt"), K)
    with open(str(seq / "intrinsics.txt"), "w") as fh:
        fh.write(
            f"fx: {K[0, 0]}\nfy: {K[1, 1]}\ncx: {K[0, 2]}\ncy: {K[1, 2]}"
        )
    return str(seq)


class TestConfig:
    def test_load_and_override(self, tmp_path):
        defaults = {"a": 1, "nested": {"x": "y"}}
        cfg = load_config(defaults, None, ["a=5", "nested.x=z", "new.k=[1,2]"])
        assert cfg["a"] == 5
        assert cfg["nested"]["x"] == "z"
        assert get_by_dotted(cfg, "new.k") == [1, 2]
        # defaults untouched
        assert defaults["a"] == 1

    def test_yaml_overlay_and_snapshot(self, tmp_path):
        yaml_file = tmp_path / "c.yaml"
        yaml_file.write_text("a: 7\nnested:\n  x: file\n")
        cfg = load_config(
            {"a": 1, "nested": {"x": "y", "keep": True}},
            str(yaml_file),
            ["nested.x=cli"],
        )
        assert cfg["a"] == 7
        assert cfg["nested"]["x"] == "cli"  # CLI beats YAML
        assert cfg["nested"]["keep"] is True
        path = snapshot_config(cfg, str(tmp_path / "run"))
        assert osp.exists(path)


class TestMapInferCLI:
    @pytest.fixture(scope="class")
    def seq_dir(self, tmp_path_factory):
        rng = np.random.default_rng(0)
        return build_sequence(tmp_path_factory.mktemp("data"), rng)

    def test_map_and_infer(self, seq_dir, capsys):
        out_dir = osp.join(osp.dirname(seq_dir), "outputs")
        rc = cli_main(
            [
                "map",
                f"data_dir={seq_dir}",
                f"out_dir={out_dir}",
                "max_keypoints=256",
                "num_covis=4",
                "max_points3d=300",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["num_points3d"] > 10, stats
        assert stats["mean_reproj_error_px"] < 4.0, stats
        for artifact in (
            "anno/anno_3d_average.npz",
            "anno/anno_3d_collect.npz",
            "anno/idxs.npy",
            "anno/anno_index.json",
            "points.ply",
            "stats.json",
        ):
            assert osp.exists(osp.join(out_dir, artifact)), artifact

        rc = cli_main(
            [
                "infer",
                f"data_dir={seq_dir}",
                f"anno_dir={osp.join(out_dir, 'anno')}",
                "max_keypoints=256",
                "shape3d=300",
                "batch=4",
            ]
        )
        assert rc == 0
        metrics = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert metrics["num_frames"] == 10
        assert set(metrics) >= {"cmd1", "cmd3", "cmd5"}

    def test_infer_roster(self, seq_dir, tmp_path, capsys):
        """Comma-separated sequence rosters aggregate over all frames and
        record per-sequence metrics (reference inference.py:185-198)."""
        out_dir = osp.join(osp.dirname(seq_dir), "outputs")
        eval_out = str(tmp_path / "eval")
        rc = cli_main(
            [
                "infer",
                f"data_dir={seq_dir},{seq_dir}",
                f"anno_dir={osp.join(out_dir, 'anno')}",
                "max_keypoints=256",
                "shape3d=300",
                "batch=4",
                f"eval_out={eval_out}",
            ]
        )
        assert rc == 0
        metrics = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert metrics["num_frames"] == 20
        assert len(metrics["per_seq"]) == 1  # same dir twice -> same name
        seq_name = next(iter(metrics["per_seq"]))
        assert metrics["per_seq"][seq_name]["num_frames"] == 10
        assert osp.exists(osp.join(eval_out, "ALL.txt"))
        assert osp.exists(osp.join(eval_out, f"{seq_name}.txt"))

    def test_demo(self, seq_dir, tmp_path, capsys):
        out_root = osp.join(osp.dirname(seq_dir), "outputs")
        if not osp.exists(osp.join(out_root, "anno")):
            cli_main(
                [
                    "map", f"data_dir={seq_dir}", f"out_dir={out_root}",
                    "max_keypoints=256", "num_covis=4", "max_points3d=300",
                ]
            )
            capsys.readouterr()
        demo_dir = str(tmp_path / "demo")
        rc = cli_main(
            [
                "demo",
                f"data_dir={seq_dir}",
                f"anno_dir={osp.join(out_root, 'anno')}",
                f"out_dir={demo_dir}",
                "max_keypoints=256",
                "shape3d=300",
                "n_ref_views=4",
                "make_video=true",
            ]
        )
        assert rc == 0
        summary = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert summary["num_frames"] == 10
        assert osp.exists(osp.join(demo_dir, "frames", "0.png"))
        if summary["video"]:
            assert osp.exists(summary["video"])

    def test_detect(self, seq_dir, capsys):
        rc = cli_main(
            [
                "detect",
                f"db_dir={seq_dir}",
                f"query_dir={seq_dir}",
                "max_keypoints=256",
                "n_ref_views=4",
                "crop_size=128",
            ]
        )
        assert rc == 0
        summary = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert summary["num_frames"] == 10
        assert osp.exists(osp.join(seq_dir, "color_det", "0.png"))
        K_crop = np.loadtxt(osp.join(seq_dir, "intrin_det", "0.txt"))
        assert K_crop.shape == (3, 3) and np.isfinite(K_crop).all()

    def test_train_cmd(self, seq_dir, tmp_path, capsys):
        out_root = osp.join(osp.dirname(seq_dir), "outputs")
        if not osp.exists(osp.join(out_root, "anno", "anno_index.json")):
            cli_main(
                [
                    "map", f"data_dir={seq_dir}", f"out_dir={out_root}",
                    "max_keypoints=256", "num_covis=4", "max_points3d=300",
                ]
            )
            capsys.readouterr()
        run_dir = str(tmp_path / "train_run")
        rc = cli_main(
            [
                "train",
                f"anno_index={osp.join(out_root, 'anno', 'anno_index.json')}",
                f"run_dir={run_dir}",
                "shape2d=256",
                "shape3d=300",
                "num_leaf=4",
                "batch_size=2",
                "max_epochs=2",
            ]
        )
        assert rc == 0
        record = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert np.isfinite(record["train_loss"])
        assert osp.exists(osp.join(run_dir, "ckpt", "ckpt_1.msgpack"))
        assert osp.exists(osp.join(run_dir, "metrics.jsonl"))


class TestMergeAnno:
    def test_merge_and_coco(self, tmp_path, capsys):
        from onepose_tpu.data.anno_io import write_anno_index

        idx1 = str(tmp_path / "a.json")
        idx2 = str(tmp_path / "b.json")
        write_anno_index(
            idx1, [{"anno_id": 1, "anno_file": "x.json", "img_file": "x.png"}]
        )
        write_anno_index(
            idx2, [{"anno_id": 1, "anno_file": "y.json", "img_file": "y.png"}]
        )
        out = str(tmp_path / "merged.json")
        coco = str(tmp_path / "coco.json")
        rc = cli_main(
            [
                "merge-anno",
                f"indices={idx1},{idx2}",
                f"out={out}",
                f"coco_out={coco}",
            ]
        )
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["num_annotations"] == 2
        data = json.load(open(coco))
        assert len(data["images"]) == 2
        # re-numbered unique ids
        merged = json.load(open(out))
        assert sorted(e["anno_id"] for e in merged) == [1, 2]


class TestMapResume:
    def test_redo_false_skips_existing(self, tmp_path, capsys):
        rng = np.random.default_rng(3)
        seq = build_sequence(tmp_path, rng, n_frames=6, img=96, n_pts=40)
        out_dir = osp.join(osp.dirname(seq), "outputs")
        args = [
            "map", f"data_dir={seq}", f"out_dir={out_dir}",
            "max_keypoints=128", "num_covis=3", "max_points3d=200",
        ]
        assert cli_main(args) == 0
        first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert cli_main(args + ["redo=false"]) == 0
        second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert second.get("skipped_existing") is True
        assert second["num_points3d"] == first["num_points3d"]


class TestConvertCLI:
    def test_convert_superpoint(self, tmp_path, capsys):
        torch = pytest.importorskip("torch")
        import os
        import sys as _sys

        REF = "/root/reference"
        if not osp.isdir(REF):
            pytest.skip("reference repo not mounted")
        if REF not in _sys.path:
            _sys.path.insert(0, REF)
        from src.models.extractors.SuperPoint.superpoint import (
            SuperPoint as TorchSP,
        )

        torch.manual_seed(0)
        tsp = TorchSP({}).eval()
        pth = str(tmp_path / "sp.pth")
        torch.save(tsp.state_dict(), pth)

        out = str(tmp_path / "sp.msgpack")
        rc = cli_main(["convert", "model=superpoint", f"weights={pth}",
                       f"out={out}"])
        assert rc == 0
        assert osp.exists(out)

        # The converted checkpoint loads into our model and runs.
        import jax.numpy as jnp
        from onepose_tpu.cli.common import load_superpoint_params
        from onepose_tpu.models import SuperPoint

        model = SuperPoint()
        params = load_superpoint_params(model, out)
        d = model.apply(
            params, jnp.zeros((1, 64, 64, 1), jnp.float32)
        )
        assert d["score_map"].shape == (1, 64, 64)
