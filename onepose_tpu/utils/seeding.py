"""Determinism helpers.

The reference calls pytorch-lightning seed_everything(12345) at import in
every inference entry (inference.py:13-14, inference_demo.py:18-20) and
via config for training (train_GATsSPG.yaml:17). JAX randomness is
explicitly keyed, so the remaining ambient state is numpy + python's
random (used by dataset shuffling/padding)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 12345) -> int:
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
