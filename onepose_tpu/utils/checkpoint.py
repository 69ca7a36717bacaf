"""Checkpoint save/load with epoch indexing and pruning.

Behavioral spec from the reference model I/O (src/utils/model_io.py:6-90):
epoch-indexed checkpoint files, latest-selection on load, pruning beyond a
cap. Uses orbax-compatible msgpack serialization via flax; parameters are
plain pytrees so checkpoints are framework-portable.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from glob import glob
from typing import Any, Optional

import numpy as np
from flax import serialization


_CKPT_RE = re.compile(r"ckpt_(\d+)\.msgpack$")


def save_checkpoint(
    ckpt_dir: str,
    target: Any,
    step: int,
    keep: int = 200,
) -> str:
    """Serialize a pytree to <ckpt_dir>/ckpt_<step>.msgpack; prune old."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = osp.join(ckpt_dir, f"ckpt_{step}.msgpack")
    data = serialization.to_bytes(target)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    # Prune: keep the most recent `keep` checkpoints (reference prunes at
    # 200, model_io.py:29-43).
    ckpts = sorted(
        glob(osp.join(ckpt_dir, "ckpt_*.msgpack")),
        key=lambda p: int(_CKPT_RE.search(p).group(1)),
    )
    for old in ckpts[:-keep]:
        os.remove(old)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = [
        p
        for p in glob(osp.join(ckpt_dir, "ckpt_*.msgpack"))
        if _CKPT_RE.search(p)
    ]
    if not ckpts:
        return None
    return max(ckpts, key=lambda p: int(_CKPT_RE.search(p).group(1)))


def load_checkpoint(path: str, target: Any) -> Any:
    """Deserialize into the structure of `target` (pass an example
    pytree, e.g. freshly initialized params)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def checkpoint_step(path: str) -> int:
    m = _CKPT_RE.search(path)
    return int(m.group(1)) if m else -1
