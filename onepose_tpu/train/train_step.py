"""SPMD training step for the GATsSPG matcher.

Optimization contract from the reference training configuration
(configs/experiment/train_GATsSPG.yaml:21-41 +
src/models/GATsSPG_lightning_model.py:117-127): Adam, lr 1e-3, MultiStepLR
milestones [5, 10, 15, 20] epochs x0.5, gradient clip 0.5, batch 8 with
2-step accumulation, focal loss (alpha .5, gamma 2) on the dual-softmax
confidence matrix, max 10 epochs.

TPU-first differences: the step is one jitted SPMD program over the
(data, points) mesh — batch sharded over "data", the 3D-point/leaf axes
shardable over "points" (XLA inserts the all-gathers/psums the
cross-attention and dual-softmax need). Loss/metric aggregation across
devices is jnp.mean under SPMD, not a pickle gather
(reference src/utils/comm.py is replaced by compiler collectives).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.train.losses import focal_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    weight_decay: float = 0.0
    clip_norm: float = 0.5
    milestones: tuple = (5, 10, 15, 20)  # epochs
    lr_gamma: float = 0.5
    steps_per_epoch: int = 1000
    accumulate: int = 1
    focal_alpha: float = 0.5
    focal_gamma: float = 2.0
    pos_weight: float = 0.5
    neg_weight: float = 0.5


class TrainState(train_state.TrainState):
    pass


def make_lr_schedule(cfg: TrainConfig):
    """MultiStepLR with milestones in epochs (reference
    src/models/GATsSPG_lightning_model.py:117-127, milestones [5,10,15,20]).

    The schedule is indexed by the inner optimizer's update count. Under
    `optax.MultiSteps(every_k_schedule=accumulate)` that counter advances
    once per `accumulate` micro-batches, so epoch boundaries (measured in
    dataset batches, `steps_per_epoch`) must be divided by the accumulation
    factor — otherwise milestones fire `accumulate`x too late.
    """
    updates_per_epoch = max(cfg.steps_per_epoch // max(cfg.accumulate, 1), 1)
    boundaries = {
        int(m * updates_per_epoch): cfg.lr_gamma for m in cfg.milestones
    }
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(make_lr_schedule(cfg), weight_decay=cfg.weight_decay)
        if cfg.weight_decay
        else optax.adam(make_lr_schedule(cfg)),
    )
    if cfg.accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate)
    return tx


def create_train_state(
    rng: jax.Array,
    model: GATsSPG,
    cfg: TrainConfig,
    example_batch: dict,
) -> TrainState:
    params = model.init(
        rng,
        example_batch["desc2d"],
        example_batch["desc3d"],
        example_batch["leaf_desc"],
        example_batch.get("mask2d"),
        example_batch.get("mask3d"),
        example_batch.get("leaf_mask"),
    )
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg)
    )


def loss_fn(params, apply_fn, batch, cfg: TrainConfig):
    out = apply_fn(
        params,
        batch["desc2d"],
        batch["desc3d"],
        batch["leaf_desc"],
        batch.get("mask2d"),
        batch.get("mask3d"),
        batch.get("leaf_mask"),
    )
    assert out["conf_matrix"] is not None, (
        "training needs the dense confidence matrix: construct the "
        "matcher with GATsSPG(fused_match=False)"
    )
    loss = focal_loss(
        out["conf_matrix"],
        batch["conf_gt"],
        alpha=cfg.focal_alpha,
        gamma=cfg.focal_gamma,
        pos_weight=cfg.pos_weight,
        neg_weight=cfg.neg_weight,
    )
    # Match-quality metrics, computed on device.
    pred_pos = out["conf_matrix"] > 0.2
    gt_pos = batch["conf_gt"] > 0.5
    tp = jnp.sum(pred_pos & gt_pos)
    precision = tp / jnp.maximum(jnp.sum(pred_pos), 1)
    recall = tp / jnp.maximum(jnp.sum(gt_pos), 1)
    return loss, {"loss": loss, "precision": precision, "recall": recall}


def make_train_step(model: GATsSPG, cfg: TrainConfig):
    """Returns train_step(state, batch) -> (state, metrics), to be jitted
    (optionally with shardings) by the caller."""

    def train_step(state: TrainState, batch: dict):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state.params, state.apply_fn, batch, cfg
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state, metrics

    return train_step


def make_eval_step(model: GATsSPG, cfg: TrainConfig):
    def eval_step(state: TrainState, batch: dict):
        _, metrics = loss_fn(state.params, state.apply_fn, batch, cfg)
        return metrics

    return eval_step
