"""Tests for training callbacks, prefetch loaders, comm helpers, seeding,
and the 3D scene dump."""

import json
import os.path as osp

import pytest
import numpy as np
import jax.numpy as jnp

from onepose_tpu.train.callbacks import (
    BestCheckpoint,
    BestMetricTracker,
    CodeSnapshot,
    ConfusionMatrixLogger,
    GradientWatch,
    MatchPRCurve,
    TensorBoardLogger,
    count_parameters,
    log_hyperparameters,
    match_confusion,
    match_pr_curve,
)
from onepose_tpu.utils.comm import (
    all_gather_pytree,
    get_rank,
    get_world_size,
    reduce_dict,
    synchronize,
)
from onepose_tpu.utils.seeding import seed_everything
from onepose_tpu.utils.vis import dump_scene_3d


class TestCallbacks:
    def test_best_metric_tracker(self, tmp_path):
        cb = BestMetricTracker(run_dir=str(tmp_path))
        cb.on_train_start(str(tmp_path), {})
        cb.on_epoch_end(0, {"train_loss": 1.0, "val_cmd5": 0.2}, None)
        cb.on_epoch_end(1, {"train_loss": 2.0, "val_cmd5": 0.5}, None)
        best = json.load(open(tmp_path / "best_metrics.json"))
        assert best["train_loss"] == 1.0  # loss minimized
        assert best["val_cmd5"] == 0.5  # recall maximized

    def test_best_checkpoint(self, tmp_path):
        cb = BestCheckpoint(str(tmp_path), monitor="val_loss")
        state = {"params": jnp.zeros(3)}
        cb.on_epoch_end(0, {"val_loss": 1.0}, state)
        cb.on_epoch_end(1, {"val_loss": 2.0}, state)  # worse: no overwrite
        meta = json.load(open(tmp_path / "best.json"))
        assert meta["epoch"] == 0
        assert osp.exists(tmp_path / "best.msgpack")

    def test_code_snapshot(self, tmp_path):
        cb = CodeSnapshot()
        cb.on_train_start(str(tmp_path), {})
        assert osp.exists(tmp_path / "code_snapshot.zip")

    @pytest.mark.slow
    def test_tensorboard_logger(self, tmp_path):
        cb = TensorBoardLogger(str(tmp_path / "tb"))
        cb.on_train_start(str(tmp_path), {"a": 1})
        cb.on_epoch_end(0, {"train_loss": 0.5, "epoch": 0}, None)
        cb.on_train_end([])
        # Event files written (or logger degraded gracefully to no-op).
        if cb._writer is not None or osp.isdir(tmp_path / "tb"):
            assert any((tmp_path / "tb").iterdir())

    def test_match_pr_curve(self):
        rng = np.random.default_rng(0)
        gt = (rng.random((2, 16, 24)) < 0.05).astype(np.float32)
        conf = np.where(gt > 0, 0.9, 0.01 * rng.random((2, 16, 24)))
        curve = match_pr_curve(conf, gt)
        assert max(curve["f1"]) > 0.99  # perfectly separable

    def test_match_pr_callback(self, tmp_path):
        from onepose_tpu.models import GATsSPG
        import jax

        model = GATsSPG(num_blocks=1)
        b, n2, n3, L, C = 1, 8, 12, 2, 256
        rng = np.random.default_rng(0)
        batch = {
            "desc2d": jnp.asarray(rng.normal(size=(b, n2, C)), jnp.float32),
            "desc3d": jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32),
            "leaf_desc": jnp.asarray(
                rng.normal(size=(b, n3, L, C)), jnp.float32
            ),
            "conf_gt": jnp.zeros((b, n2, n3)).at[:, 0, 0].set(1.0),
        }
        params = model.init(
            jax.random.PRNGKey(0),
            batch["desc2d"], batch["desc3d"], batch["leaf_desc"],
        )

        class S:
            pass

        state = S()
        state.params = params
        cb = MatchPRCurve(batch, model, run_dir=str(tmp_path))
        cb.on_train_start(str(tmp_path), {})
        record = {}
        cb.on_epoch_end(0, record, state)
        assert "match_f1" in record
        assert osp.exists(tmp_path / "pr_curve_epoch0.json")


def _matcher_batch(b=1, n2=8, n3=12, L=2, C=256, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "desc2d": jnp.asarray(rng.normal(size=(b, n2, C)), jnp.float32),
        "desc3d": jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32),
        "leaf_desc": jnp.asarray(rng.normal(size=(b, n3, L, C)), jnp.float32),
        "mask2d": jnp.ones((b, n2), bool),
        "mask3d": jnp.ones((b, n3), bool),
        "leaf_mask": jnp.ones((b, n3, L), bool),
        "conf_gt": jnp.zeros((b, n2, n3)).at[:, 0, 0].set(1.0),
    }


class _State:
    def __init__(self, params):
        self.params = params


class TestNewCallbacks:
    def test_match_confusion_counts(self):
        conf = np.array([[[0.9, 0.1], [0.05, 0.3]]])
        gt = np.array([[[1.0, 0.0], [0.0, 0.0]]])
        cm = match_confusion(conf, gt, threshold=0.2)
        assert (cm["tp"], cm["fp"], cm["fn"], cm["tn"]) == (1, 1, 0, 2)
        assert cm["accuracy"] == 0.75

    def test_confusion_callback(self, tmp_path):
        from onepose_tpu.models import GATsSPG
        import jax

        model = GATsSPG(num_blocks=1)
        batch = _matcher_batch()
        params = model.init(
            jax.random.PRNGKey(0),
            batch["desc2d"], batch["desc3d"], batch["leaf_desc"],
        )
        cb = ConfusionMatrixLogger(batch, model, run_dir=str(tmp_path))
        cb.on_train_start(str(tmp_path), {})
        record = {}
        cb.on_epoch_end(0, record, _State(params))
        assert {"confusion_tp", "confusion_fp", "confusion_accuracy"} <= set(
            record
        )
        saved = json.load(open(tmp_path / "confusion_epoch0.json"))
        assert saved["tp"] + saved["fp"] + saved["fn"] + saved["tn"] == 8 * 12

    def test_gradient_watch(self, tmp_path):
        from onepose_tpu.models import GATsSPG
        import jax

        model = GATsSPG(num_blocks=1, fused_match=False)
        batch = _matcher_batch()
        params = model.init(
            jax.random.PRNGKey(0),
            batch["desc2d"], batch["desc3d"], batch["leaf_desc"],
        )
        cb = GradientWatch(batch, model, run_dir=str(tmp_path))
        cb.on_train_start(str(tmp_path), {})
        record = {}
        cb.on_epoch_end(0, record, _State(params))
        assert record["grad_global_norm"] > 0
        watch = json.load(open(tmp_path / "watch_epoch0.json"))
        assert any(k.startswith("grad_norm/") for k in watch)
        assert any(k.startswith("param_norm/") for k in watch)

    def test_log_hyperparameters(self, tmp_path):
        params = {"params": {"dense": {"kernel": np.zeros((4, 5))}}}
        rec = log_hyperparameters(
            str(tmp_path), {"lr": 1e-3}, _State(params)
        )
        assert rec["model/params_total"] == 20
        assert count_parameters(params) == 20
        saved = json.load(open(tmp_path / "hparams.json"))
        assert saved["config"]["lr"] == 1e-3


class TestConfigTree:
    def test_format_tree(self):
        from onepose_tpu.config import format_config_tree

        txt = format_config_tree(
            {"b": {"y": 2, "x": 1}, "a": "s", "n": None}
        )
        lines = txt.splitlines()
        assert lines[0] == "a: 's'"
        assert lines[1] == "b:"
        assert lines[2] == "  x: 1"
        assert "n: None" in txt


class TestLoaders:
    def test_threaded_batch_iterator_matches_serial(self):
        from onepose_tpu.data.dataset import batch_iterator

        class DS:
            def __len__(self):
                return 13

            def __getitem__(self, i):
                return {"x": np.full((3,), i, np.float32)}

        serial = list(batch_iterator(DS(), 4, seed=3, num_workers=0))
        threaded = list(batch_iterator(DS(), 4, seed=3, num_workers=4))
        assert len(serial) == len(threaded) == 3
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a["x"], b["x"])

    def test_prefetch_to_device(self):
        from onepose_tpu.data.dataset import prefetch_to_device

        batches = [{"x": np.ones((2,)) * i} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        np.testing.assert_array_equal(np.asarray(out[3]["x"]), batches[3]["x"])


class TestCommSeeding:
    def test_single_process_comm(self):
        assert get_world_size() == 1
        assert get_rank() == 0
        synchronize()
        tree = {"a": np.arange(3), "b": 1.5}
        gathered = all_gather_pytree(tree)
        assert len(gathered) == 1
        np.testing.assert_array_equal(gathered[0]["a"], tree["a"])
        red = reduce_dict({"m": 2.0})
        assert red["m"] == 2.0

    def test_seed_everything(self):
        seed_everything(7)
        a = np.random.random(4)
        seed_everything(7)
        b = np.random.random(4)
        np.testing.assert_array_equal(a, b)


class TestDump3D:
    def test_dump_scene(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(50, 3))
        pose = np.eye(4)
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        d = dump_scene_3d(
            str(tmp_path), "0", pts, pose, K,
            kpts2d=np.zeros((5, 2)), matched_pts3d=pts[:5],
        )
        assert osp.exists(osp.join(d, "points.ply"))
        meta = json.load(open(osp.join(d, "camera.json")))
        assert len(meta["matched_pts3d"]) == 5
