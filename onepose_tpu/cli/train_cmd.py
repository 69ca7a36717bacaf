"""`train` command: GATsSPG matcher training from an annotation index.

Reference equivalent: `python train.py +experiment=train_GATsSPG`
(train.py:14-101) with the shipped optimization recipe.
"""

from __future__ import annotations

import json

DEFAULTS = {
    "anno_index": None,
    "val_anno_index": None,
    "run_dir": "runs/train",
    "num_leaf": 8,
    "shape2d": 1000,
    "shape3d": 2000,
    "batch_size": 8,
    "max_epochs": 10,
    "lr": 1e-3,
    "accumulate": 2,
    "seed": 12345,
    "num_workers": 4,
    "tensorboard": True,
    "code_snapshot": True,
    # Sweep hook: name of the history metric to return/emit for
    # hyperparameter search (reference train.py:92-94 `optimized_metric`).
    "optimized_metric": "train_loss",
}


def run(cfg: dict) -> dict:
    import os.path as osp

    from onepose_tpu.data.dataset import GATsSPGDataset
    from onepose_tpu.models import GATsSPG
    from onepose_tpu.train.loop import LoopConfig, train
    from onepose_tpu.train.train_step import TrainConfig

    from functools import partial

    from onepose_tpu.data.dataset import batch_iterator
    from onepose_tpu.train.callbacks import (
        BestCheckpoint,
        BestMetricTracker,
        CodeSnapshot,
        TensorBoardLogger,
    )
    from onepose_tpu.utils.comm import init_distributed
    from onepose_tpu.utils.seeding import seed_everything

    assert cfg["anno_index"], "train: anno_index is required"
    # Multi-host (DCN) join when JAX_COORDINATOR_ADDRESS etc. are set;
    # no-op for the common single-process run.
    init_distributed()
    seed_everything(cfg["seed"])
    ds = GATsSPGDataset(
        cfg["anno_index"],
        num_leaf=cfg["num_leaf"],
        shape2d=cfg["shape2d"],
        shape3d=cfg["shape3d"],
        seed=cfg["seed"],
    )
    callbacks = [BestMetricTracker()]
    if cfg["tensorboard"]:
        callbacks.append(TensorBoardLogger(osp.join(cfg["run_dir"], "tb")))
    if cfg["code_snapshot"]:
        callbacks.append(CodeSnapshot())
    callbacks.append(
        BestCheckpoint(osp.join(cfg["run_dir"], "ckpt"), monitor="train_loss")
    )
    steps_per_epoch = max(len(ds) // cfg["batch_size"], 1)
    out = train(
        ds,
        model=GATsSPG(fused_match=False),
        train_cfg=TrainConfig(
            lr=cfg["lr"],
            accumulate=cfg["accumulate"],
            steps_per_epoch=steps_per_epoch,
        ),
        loop_cfg=LoopConfig(
            max_epochs=cfg["max_epochs"],
            batch_size=cfg["batch_size"],
            ckpt_dir=osp.join(cfg["run_dir"], "ckpt"),
            metrics_file=osp.join(cfg["run_dir"], "metrics.jsonl"),
            seed=cfg["seed"],
            optimized_metric=cfg["optimized_metric"],
        ),
        batch_iterator_fn=partial(
            batch_iterator, num_workers=cfg["num_workers"]
        ),
        callbacks=callbacks,
    )
    summary = dict(out["history"][-1]) if out["history"] else {}
    if cfg["optimized_metric"]:
        summary["optimized_metric"] = cfg["optimized_metric"]
        summary["optimized_metric_value"] = out.get(
            "optimized_metric_value"
        )
    print(json.dumps(summary))
    return summary


def add_parser(subparsers):
    p = subparsers.add_parser("train", help="train the GATsSPG matcher")
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(_defaults=DEFAULTS, _run=run)
