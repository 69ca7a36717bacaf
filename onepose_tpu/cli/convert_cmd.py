"""`convert` command: torch checkpoints -> this framework's msgpack params.

Reference users arrive with the released torch weights (superpoint_v1.pth,
SuperGlue indoor/outdoor .pth, GATsSPG .ckpt — loaded by the reference via
src/utils/model_io.py:58-90). This converts them once, offline, so the
serving path never imports torch. Conversion handles the layout contracts
documented in models/convert.py (Conv2d/Conv1d transposes, folded
BatchNorm, head-major attention channel permutation).
"""

from __future__ import annotations

import os
import os.path as osp

DEFAULTS = {
    "model": None,  # 'superpoint' | 'superglue' | 'gats_spg'
    "weights": None,  # input torch .pth/.ckpt path
    "out": None,  # output .msgpack path (default: alongside input)
}


def run(cfg: dict) -> dict:
    import torch
    from flax import serialization

    from onepose_tpu.models import convert as C

    model = cfg["model"]
    weights = cfg["weights"]
    assert model in ("superpoint", "superglue", "gats_spg"), model
    assert weights, "convert: weights is required"

    sd = torch.load(weights, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    # Lightning checkpoints prefix the matcher module.
    stripped = {}
    for k, v in sd.items():
        for pref in ("matcher.", "model.", "module."):
            if k.startswith(pref):
                k = k[len(pref):]
        stripped[k] = v

    fn = {
        "superpoint": C.superpoint_from_torch,
        "superglue": C.superglue_from_torch,
        "gats_spg": C.gats_spg_from_torch,
    }[model]
    params = fn(stripped)

    out = cfg["out"] or osp.splitext(weights)[0] + ".msgpack"
    os.makedirs(osp.dirname(osp.abspath(out)), exist_ok=True)
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(params))
    n = sum(
        p.size for p in _leaves(params)
    )
    result = {"model": model, "out": out, "n_params": int(n)}
    print(result)
    return result


def _leaves(tree):
    import jax

    return [x for x in jax.tree.leaves(tree) if hasattr(x, "size")]


def add_parser(subparsers):
    p = subparsers.add_parser(
        "convert", help="convert torch weights to msgpack params"
    )
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(_defaults=DEFAULTS, _run=run)
