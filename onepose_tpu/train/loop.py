"""Training loop driver for the GATsSPG matcher.

Mirrors the reference training recipe (train.py +
configs/experiment/train_GATsSPG.yaml: Adam 1e-3, MultiStepLR [5,10,15,20]
x0.5, batch 8, accumulate 2, clip 0.5, 10 epochs, focal loss) as an SPMD
loop: batches are sharded over the mesh's data axis, metrics aggregate on
device, checkpoints are epoch-indexed. Validation computes REAL pose
errors (matcher -> RANSAC PnP -> cm-deg recall), matching the reference's
validation step (GATsSPG_lightning_model.py:53-73).
"""

from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.eval import Evaluator
from onepose_tpu.geometry.ransac import ransac_pnp
from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.parallel.mesh import make_mesh, shard_batch
from onepose_tpu.train.train_step import (
    TrainConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from onepose_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


@dataclasses.dataclass
class LoopConfig:
    max_epochs: int = 10
    batch_size: int = 8
    log_every: int = 50
    ckpt_dir: str = "runs/ckpt"
    metrics_file: str = "runs/metrics.jsonl"
    resume: bool = True
    seed: int = 12345
    # Name of the history metric returned to sweep tooling (the
    # reference's `optimized_metric` return for Optuna,
    # /root/reference/train.py:92-94), e.g. "val_cmd5" or "train_loss".
    optimized_metric: Optional[str] = None


def _log(metrics_file: str, record: dict) -> None:
    # Rank-0 only under multi-process training (the reference's
    # rank-guarded logging, GATsSPG_lightning_model.py:46).
    if jax.process_index() != 0:
        return
    os.makedirs(osp.dirname(metrics_file) or ".", exist_ok=True)
    with open(metrics_file, "a") as f:
        f.write(json.dumps(record) + "\n")


def adapt_batch(batch: dict) -> dict:
    """Dataset batch -> train-step batch naming."""
    return {
        "desc2d": batch["desc2d"],
        "desc3d": batch["desc3d"],
        "leaf_desc": batch["leaf_desc"],
        "mask2d": batch["mask2d"],
        "mask3d": batch["mask3d"],
        "leaf_mask": batch["leaf_mask"],
        "conf_gt": batch["conf_gt"],
    }


def train(
    dataset,
    model: GATsSPG = None,
    train_cfg: TrainConfig = None,
    loop_cfg: LoopConfig = LoopConfig(),
    batch_iterator_fn: Callable = None,
    val_fn: Callable = None,
    callbacks: Optional[list] = None,
) -> dict:
    """Run training; returns {'state': final TrainState, 'history': [...]}.

    dataset: indexable dataset yielding padded items (see data.dataset).
    batch_iterator_fn(dataset, batch_size, seed) -> iterator of batches.
    val_fn(state) -> dict of validation metrics (optional).
    callbacks: train.callbacks.Callback list (TensorBoard, best-metric
    tracking, code snapshot, best checkpoint, PR sweeps).
    """
    from onepose_tpu.data.dataset import batch_iterator as default_iter

    model = model or GATsSPG(fused_match=False)
    batch_iterator_fn = batch_iterator_fn or default_iter
    steps_per_epoch = max(len(dataset) // loop_cfg.batch_size, 1)
    train_cfg = train_cfg or TrainConfig(steps_per_epoch=steps_per_epoch)

    # Data axis must divide the batch: use the largest divisor of
    # batch_size that fits the GLOBAL device count. Under multi-process
    # (multi-host) training this builds ONE mesh over every process's
    # devices — the SPMD equivalent of the reference's DDP Trainer
    # (train.py:73): every process runs this identical loop, feeds the
    # identical (seeded) batch stream, and owns only its addressable
    # shard of each global batch.
    n_dev = jax.device_count()
    n_data = max(
        d for d in range(1, n_dev + 1) if loop_cfg.batch_size % d == 0
    )
    mesh = make_mesh(n_data=n_data, devices=jax.devices()[:n_data])
    multiprocess = jax.process_count() > 1
    example = next(
        batch_iterator_fn(dataset, loop_cfg.batch_size, seed=0)
    )
    example = adapt_batch(example)
    rng = jax.random.PRNGKey(loop_cfg.seed)
    state = create_train_state(rng, model, train_cfg, example)

    start_epoch = 0
    if loop_cfg.resume:
        ckpt = latest_checkpoint(loop_cfg.ckpt_dir)
        if ckpt is not None:
            from onepose_tpu.utils.checkpoint import checkpoint_step

            state = load_checkpoint(ckpt, state)
            start_epoch = checkpoint_step(ckpt) + 1

    callbacks = callbacks or []
    run_dir = osp.dirname(loop_cfg.metrics_file) or "."
    for cb in callbacks:
        cb.on_train_start(run_dir, dataclasses.asdict(loop_cfg))

    if multiprocess:
        # Params/opt-state replicate over the global mesh (identical on
        # every process by seeded construction / checkpoint load).
        from onepose_tpu.parallel.mesh import replicate_pytree

        state = replicate_pytree(mesh, state)

    step_fn = jax.jit(make_train_step(model, train_cfg))
    history = []
    global_step = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, loop_cfg.max_epochs):
        t0 = time.time()
        epoch_metrics = []
        for i, batch in enumerate(
            batch_iterator_fn(
                dataset, loop_cfg.batch_size, seed=loop_cfg.seed + epoch
            )
        ):
            batch = shard_batch(mesh, adapt_batch(batch))
            state, metrics = step_fn(state, batch)
            global_step += 1
            if (i + 1) % loop_cfg.log_every == 0 or i == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(epoch=epoch, step=global_step)
                _log(loop_cfg.metrics_file, m)
            epoch_metrics.append(metrics)

        mean_loss = float(
            jnp.mean(jnp.stack([m["loss"] for m in epoch_metrics]))
        )
        record = {
            "epoch": epoch,
            "train_loss": mean_loss,
            "epoch_seconds": time.time() - t0,
        }
        if val_fn is not None:
            # Validation shards ITEMS across processes (strided), so each
            # process must run it on process-LOCAL params — hand val_fn a
            # host copy of the (replicated) state, not the global arrays,
            # or per-process jits would deadlock waiting for lockstep.
            val_state = (
                jax.tree.map(lambda x: np.asarray(x), state)
                if multiprocess
                else state
            )
            record.update(val_fn(val_state))
        for cb in callbacks:
            cb.on_epoch_end(epoch, record, state)
        _log(loop_cfg.metrics_file, record)
        history.append(record)
        if jax.process_index() == 0:
            save_checkpoint(loop_cfg.ckpt_dir, state, epoch)
    for cb in callbacks:
        cb.on_train_end(history)
    result = {"state": state, "history": history}
    if loop_cfg.optimized_metric is not None:
        # Final value of the monitored metric (reference semantics: the
        # trainer's callback_metrics entry after fit, train.py:92-94).
        vals = [
            r[loop_cfg.optimized_metric]
            for r in history
            if loop_cfg.optimized_metric in r
        ]
        result["optimized_metric_value"] = (
            float(vals[-1]) if vals else None
        )
    return result


def make_pose_val_fn(
    val_dataset,
    model: GATsSPG,
    batch_size: int = 1,
    n_hyp: int = 256,
    distributed: bool = True,
) -> Callable:
    """Validation that closes the loop to metric pose accuracy: matcher ->
    mutual matches -> RANSAC PnP -> cm-deg recall (the reference's
    validation semantics, GATsSPG_lightning_model.py:53-73).

    val_dataset items must include kpts2d, points3d, pose_gt, K.

    distributed: under jax.process_count() > 1, each process evaluates a
    strided shard of the val set and sufficient statistics are summed
    across processes (the reference's cross-rank comm.gather of val
    metrics, GATsSPG_lightning_model.py:99-103) — every process returns
    the identical full-dataset metrics.
    """

    def val_fn(state) -> dict:
        n_proc = jax.process_count() if distributed else 1
        ev = Evaluator()
        apply = jax.jit(
            lambda p, b: model.apply(
                p,
                b["desc2d"],
                b["desc3d"],
                b["leaf_desc"],
                b["mask2d"],
                b["mask3d"],
                b["leaf_mask"],
            )
        )
        indices = range(len(val_dataset))
        if n_proc > 1:
            indices = range(
                jax.process_index(), len(val_dataset), n_proc
            )
        for i in indices:
            item = val_dataset[i]
            batch = {
                k: jnp.asarray(v)[None]
                for k, v in item.items()
                if k not in ("pose_gt", "K")
            }
            out = apply(state.params, batch)
            idx = jnp.maximum(out["matches0"][0], 0)
            pts3d = jnp.asarray(item["points3d"])[idx]
            res = ransac_pnp(
                jax.random.PRNGKey(i),
                jnp.asarray(item["kpts2d"]),
                pts3d,
                jnp.asarray(item["K"]),
                out["matches0"][0] >= 0,
                n_hyp=n_hyp,
            )
            ev.evaluate(
                np.asarray(res["pose"]), np.asarray(item["pose_gt"])
            )
        if n_proc > 1:
            from onepose_tpu.utils.comm import all_gather_pytree

            counts = all_gather_pytree(ev.counts())
            metrics = Evaluator.combine_counts(counts)
        else:
            metrics = ev.summarize()
        return {f"val_{k}": v for k, v in metrics.items()}

    return val_fn
