"""Losses.

Focal loss on the dual-softmax confidence matrix, matching the reference
(src/losses/focal_loss.py:4-32) with the shipped hyperparameters
(configs/experiment/train_GATsSPG.yaml:52-55: alpha=0.5, gamma=2,
pos/neg weights 0.5/0.5)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def focal_loss(
    conf: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 0.5,
    gamma: float = 2.0,
    pos_weight: float = 0.5,
    neg_weight: float = 0.5,
    valid_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Mean focal loss over positive and negative entries.

    conf: [..., N2, N3] dual-softmax confidences in (0, 1).
    target: [..., N2, N3] binary ground-truth assignment matrix.
    valid_mask: optional [..., N2, N3] mask of pairs that should contribute
      (the reference computes the loss over padded slots too — pass None for
      strict parity; pass the pad mask for the mask-aware variant).

    Positive term: -alpha * (1 - p)^gamma * log(p), mean over positives.
    Negative term: -(1 - alpha) * p^gamma * log(1 - p), mean over negatives.
    Total = pos_weight * pos_mean + neg_weight * neg_mean.
    """
    conf = jnp.clip(conf, eps, 1.0 - eps)
    pos = target > 0.5
    neg = ~pos
    if valid_mask is not None:
        pos = pos & valid_mask
        neg = neg & valid_mask
    posf = pos.astype(conf.dtype)
    negf = neg.astype(conf.dtype)

    loss_pos = -alpha * jnp.power(1.0 - conf, gamma) * jnp.log(conf)
    loss_neg = -(1.0 - alpha) * jnp.power(conf, gamma) * jnp.log(1.0 - conf)

    n_pos = jnp.sum(posf)
    n_neg = jnp.sum(negf)
    mean_pos = jnp.sum(loss_pos * posf) / jnp.maximum(n_pos, 1.0)
    mean_neg = jnp.sum(loss_neg * negf) / jnp.maximum(n_neg, 1.0)
    # Empty-side handling mirrors the reference: a side with no samples
    # contributes zero (its mean is zeroed by the max(n, 1) guard).
    return pos_weight * mean_pos + neg_weight * mean_neg
