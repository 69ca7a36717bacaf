"""Training callbacks: observability parity with the reference's callback
suite (src/callbacks/wandb_callbacks.py:17-234 + PL ModelCheckpoint), built
on local artifacts instead of a hosted service:

- TensorBoardLogger      <- TB/W&B scalar logging (train_GATsSPG.yaml:95-99)
- BestMetricTracker      <- LogBestMetricScoresToWandb
- CodeSnapshot           <- UploadCodeToWandbAsArtifact
- BestCheckpoint         <- ModelCheckpoint(monitor='val/loss') semantics
- MatchPRCurve           <- LogF1PrecisionRecallHeatmapToWandb (threshold
                            sweep of the dual-softmax confidence matrix)
- ConfusionMatrixLogger  <- LogConfusionMatrixToWandb
- GradientWatch          <- WatchModelWithWandb (gradient/parameter norms)
- log_hyperparameters    <- template_utils.log_hparams_to_all_loggers
                            (resolved config + model parameter counts)

Callbacks receive plain dicts; the loop calls them at epoch end. All are
no-ops on non-zero processes (multi-host safe).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import zipfile
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class Callback:
    def on_train_start(self, run_dir: str, config: dict) -> None: ...

    def on_epoch_end(self, epoch: int, record: dict, state) -> None: ...

    def on_train_end(self, history: list) -> None: ...


def _is_main_process() -> bool:
    return jax.process_index() == 0


class TensorBoardLogger(Callback):
    """Scalar logging to TensorBoard event files (torch.utils.tensorboard
    backend; degrades to a no-op if unavailable)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._writer = None

    def on_train_start(self, run_dir: str, config: dict) -> None:
        if not _is_main_process():
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(self.log_dir)
            self._writer.add_text("config", json.dumps(config, default=str))
        except Exception:
            self._writer = None

    def on_epoch_end(self, epoch: int, record: dict, state) -> None:
        if self._writer is None:
            return
        for k, v in record.items():
            if isinstance(v, (int, float)) and k != "epoch":
                self._writer.add_scalar(k, v, epoch)
        self._writer.flush()

    def on_train_end(self, history: list) -> None:
        if self._writer is not None:
            self._writer.close()


class BestMetricTracker(Callback):
    """Track the best value of each metric seen so far; write
    best_metrics.json at every improvement (LogBestMetricScoresToWandb
    parity, wandb_callbacks.py:205-234)."""

    def __init__(self, run_dir: Optional[str] = None, minimize=("loss",)):
        self.run_dir = run_dir
        self.minimize_keys = tuple(minimize)
        self.best: dict = {}

    def on_train_start(self, run_dir: str, config: dict) -> None:
        self.run_dir = self.run_dir or run_dir

    def _better(self, key: str, value: float) -> bool:
        if key not in self.best:
            return True
        lo = any(m in key for m in self.minimize_keys)
        return value < self.best[key] if lo else value > self.best[key]

    def on_epoch_end(self, epoch: int, record: dict, state) -> None:
        improved = False
        for k, v in record.items():
            if isinstance(v, (int, float)) and k != "epoch":
                if self._better(k, v):
                    self.best[k] = v
                    improved = True
        if improved and _is_main_process() and self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            with open(osp.join(self.run_dir, "best_metrics.json"), "w") as f:
                json.dump(self.best, f, indent=1)


class CodeSnapshot(Callback):
    """Zip the onepose_tpu package source into the run directory so every
    run is reproducible from its artifacts (UploadCodeToWandbAsArtifact
    parity, wandb_callbacks.py:32-56)."""

    def on_train_start(self, run_dir: str, config: dict) -> None:
        if not _is_main_process():
            return
        import onepose_tpu

        pkg_dir = osp.dirname(onepose_tpu.__file__)
        os.makedirs(run_dir, exist_ok=True)
        out = osp.join(run_dir, "code_snapshot.zip")
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        p = osp.join(root, fn)
                        zf.write(p, osp.relpath(p, osp.dirname(pkg_dir)))


class BestCheckpoint(Callback):
    """Save a `best.msgpack` checkpoint whenever the monitored metric
    improves (PL ModelCheckpoint monitor semantics,
    train_GATsSPG.yaml:83-91)."""

    def __init__(self, ckpt_dir: str, monitor: str = "val_loss", mode: str = "min"):
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.mode = mode
        self.best_value: Optional[float] = None

    def on_epoch_end(self, epoch: int, record: dict, state) -> None:
        if self.monitor not in record or not _is_main_process():
            return
        v = float(record[self.monitor])
        better = (
            self.best_value is None
            or (v < self.best_value if self.mode == "min" else v > self.best_value)
        )
        if better:
            self.best_value = v
            from flax import serialization

            os.makedirs(self.ckpt_dir, exist_ok=True)
            path = osp.join(self.ckpt_dir, "best.msgpack")
            with open(path + ".tmp", "wb") as f:
                f.write(serialization.to_bytes(state))
            os.replace(path + ".tmp", path)
            with open(osp.join(self.ckpt_dir, "best.json"), "w") as f:
                json.dump({"epoch": epoch, self.monitor: v}, f)


def match_pr_curve(
    conf_matrix: np.ndarray,
    conf_gt: np.ndarray,
    thresholds: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5, 0.7),
) -> dict:
    """Precision/recall/F1 of thresholded dual-softmax confidences against
    the GT assignment (F1/PR heatmap parity, wandb_callbacks.py:96-157)."""
    gt = conf_gt > 0.5
    out = {"thresholds": list(thresholds), "precision": [], "recall": [], "f1": []}
    for t in thresholds:
        pred = conf_matrix > t
        tp = float(np.sum(pred & gt))
        p = tp / max(float(np.sum(pred)), 1.0)
        r = tp / max(float(np.sum(gt)), 1.0)
        f1 = 2 * p * r / max(p + r, 1e-9)
        out["precision"].append(p)
        out["recall"].append(r)
        out["f1"].append(f1)
    return out


def match_confusion(
    conf_matrix: np.ndarray,
    conf_gt: np.ndarray,
    threshold: float = 0.2,
) -> dict:
    """2x2 confusion of thresholded match confidences vs the GT assignment
    (LogConfusionMatrixToWandb parity, wandb_callbacks.py:159-203, applied
    to the matching task's binary decision per conf-matrix cell)."""
    pred = conf_matrix > threshold
    gt = conf_gt > 0.5
    tp = int(np.sum(pred & gt))
    fp = int(np.sum(pred & ~gt))
    fn = int(np.sum(~pred & gt))
    tn = int(np.sum(~pred & ~gt))
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "accuracy": (tp + tn) / max(tp + fp + fn + tn, 1),
        "threshold": threshold,
    }


class ConfusionMatrixLogger(Callback):
    """Log the match confusion matrix on a held-out batch each epoch."""

    def __init__(
        self,
        val_batch: dict,
        model,
        threshold: float = 0.2,
        run_dir: Optional[str] = None,
    ):
        self.batch = val_batch
        self.model = model
        self.threshold = threshold
        self.run_dir = run_dir
        self._apply = None

    def on_train_start(self, run_dir: str, config: dict) -> None:
        self.run_dir = self.run_dir or run_dir
        self._apply = jax.jit(
            lambda p, b: self.model.apply(
                p, b["desc2d"], b["desc3d"], b["leaf_desc"],
                b.get("mask2d"), b.get("mask3d"), b.get("leaf_mask"),
            )["conf_matrix"]
        )

    def on_epoch_end(self, epoch: int, record: dict, state) -> None:
        if not _is_main_process() or self._apply is None:
            return
        conf = np.asarray(self._apply(state.params, self.batch))
        cm = match_confusion(
            conf, np.asarray(self.batch["conf_gt"]), self.threshold
        )
        record.update(
            confusion_tp=cm["tp"], confusion_fp=cm["fp"],
            confusion_fn=cm["fn"], confusion_accuracy=cm["accuracy"],
        )
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            with open(
                osp.join(self.run_dir, f"confusion_epoch{epoch}.json"), "w"
            ) as f:
                json.dump(cm, f)


class GradientWatch(Callback):
    """Gradient observability (WatchModelWithWandb parity,
    wandb_callbacks.py:59-71): at each epoch end, compute the focal-loss
    gradient on a fixed watch batch and log the global gradient norm plus
    per-top-level-module norms of gradients and parameters."""

    def __init__(self, watch_batch: dict, model, run_dir: Optional[str] = None):
        self.batch = watch_batch
        self.model = model
        self.run_dir = run_dir
        self._grad = None

    def on_train_start(self, run_dir: str, config: dict) -> None:
        from onepose_tpu.train.train_step import TrainConfig, loss_fn

        self.run_dir = self.run_dir or run_dir
        cfg = TrainConfig()

        def g(params, batch):
            grads = jax.grad(
                lambda p: loss_fn(p, self.model.apply, batch, cfg)[0]
            )(params)
            return grads

        self._grad = jax.jit(g)

    @staticmethod
    def _module_norms(tree: dict, prefix: str) -> dict:
        out = {}
        params = tree.get("params", tree)
        for mod, sub in params.items():
            sq = jax.tree.reduce(
                lambda a, x: a + float(jnp.sum(jnp.square(x))), sub, 0.0
            )
            out[f"{prefix}/{mod}"] = float(np.sqrt(sq))
        return out

    def on_epoch_end(self, epoch: int, record: dict, state) -> None:
        if not _is_main_process() or self._grad is None:
            return
        grads = self._grad(state.params, self.batch)
        gnorms = self._module_norms(grads, "grad_norm")
        pnorms = self._module_norms(state.params, "param_norm")
        global_norm = float(
            np.sqrt(sum(v * v for v in gnorms.values()))
        )
        record["grad_global_norm"] = global_norm
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            with open(
                osp.join(self.run_dir, f"watch_epoch{epoch}.json"), "w"
            ) as f:
                json.dump(
                    {"global_grad_norm": global_norm, **gnorms, **pnorms}, f
                )


def count_parameters(params) -> int:
    return int(
        jax.tree.reduce(lambda a, x: a + int(np.prod(x.shape)), params, 0)
    )


def log_hyperparameters(run_dir: str, config: dict, state=None) -> dict:
    """Write hparams.json with the resolved config and model parameter
    counts (template_utils.log_hparams_to_all_loggers parity,
    src/utils/template_utils.py:76-129)."""
    rec = {"config": config}
    if state is not None:
        params = getattr(state, "params", state)
        rec["model/params_total"] = count_parameters(params)
    if _is_main_process():
        os.makedirs(run_dir, exist_ok=True)
        with open(osp.join(run_dir, "hparams.json"), "w") as f:
            json.dump(rec, f, indent=1, default=str)
    return rec


class MatchPRCurve(Callback):
    """Log the PR sweep on a held-out batch each epoch."""

    def __init__(self, val_batch: dict, model, run_dir: Optional[str] = None):
        self.batch = val_batch
        self.model = model
        self.run_dir = run_dir
        self._apply = None

    def on_train_start(self, run_dir: str, config: dict) -> None:
        self.run_dir = self.run_dir or run_dir
        self._apply = jax.jit(
            lambda p, b: self.model.apply(
                p, b["desc2d"], b["desc3d"], b["leaf_desc"],
                b.get("mask2d"), b.get("mask3d"), b.get("leaf_mask"),
            )["conf_matrix"]
        )

    def on_epoch_end(self, epoch: int, record: dict, state) -> None:
        if not _is_main_process() or self._apply is None:
            return
        conf = np.asarray(self._apply(state.params, self.batch))
        curve = match_pr_curve(conf, np.asarray(self.batch["conf_gt"]))
        record.update(
            match_f1=max(curve["f1"]),
            match_precision=curve["precision"][curve["f1"].index(max(curve["f1"]))],
        )
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            with open(
                osp.join(self.run_dir, f"pr_curve_epoch{epoch}.json"), "w"
            ) as f:
                json.dump(curve, f)
