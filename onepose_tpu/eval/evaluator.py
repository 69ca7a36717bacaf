"""cm-degree recall evaluator.

Behavioral spec from the reference (src/evaluators/cmd_evaluator.py:3-62):
per-frame booleans trans < X cm AND rot < X deg for X in {1, 3, 5};
`summarize` returns mean recalls and resets. This version accepts whole
batches of poses at once (device arrays welcome) and also tracks the
underlying error arrays for aggregate_metrics-style reporting
(src/utils/eval_utils.py:105-120).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from onepose_tpu.geometry.metrics import query_pose_error


class Evaluator:
    def __init__(self, thresholds=(1, 3, 5)):
        self.thresholds = tuple(thresholds)
        self.reset()

    def reset(self) -> None:
        self.r_errs: list[float] = []
        self.t_errs: list[float] = []

    def evaluate(self, pose_pred, pose_gt) -> None:
        """Accumulate one pose or a batch ([..., 4, 4] or [..., 3, 4]).

        pose_pred=None records a failed frame (counts against recall),
        matching the reference's None branch (cmd_evaluator.py:36-41).
        """
        if pose_pred is None:
            self.r_errs.append(np.inf)
            self.t_errs.append(np.inf)
            return
        pred = np.asarray(pose_pred, dtype=np.float64)
        gt = np.asarray(pose_gt, dtype=np.float64)
        r, t = query_pose_error(pred, gt)
        self.r_errs.extend(np.atleast_1d(np.asarray(r)).tolist())
        self.t_errs.extend(np.atleast_1d(np.asarray(t)).tolist())

    def summarize(self, reset: bool = True) -> dict:
        r = np.asarray(self.r_errs)
        t = np.asarray(self.t_errs)
        out = {}
        for x in self.thresholds:
            val = float(np.mean((r < x) & (t < x))) if len(r) else 0.0
            out[f"cmd{x}"] = val
        out["mean_rot_deg"] = float(np.mean(r[np.isfinite(r)])) if np.any(np.isfinite(r)) else float("inf")
        out["mean_trans_cm"] = float(np.mean(t[np.isfinite(t)])) if np.any(np.isfinite(t)) else float("inf")
        out["num_frames"] = int(len(r))
        if reset:
            self.reset()
        return out

    def counts(self) -> dict:
        """Fixed-size sufficient statistics for cross-process aggregation
        (the reference gathers per-rank metric lists with comm.gather,
        GATsSPG_lightning_model.py:99-103; here the statistics are summed
        so only O(1) floats cross DCN)."""
        r = np.asarray(self.r_errs)
        t = np.asarray(self.t_errs)
        out = {
            f"hits_{x}": float(np.sum((r < x) & (t < x))) if len(r) else 0.0
            for x in self.thresholds
        }
        out["n"] = float(len(r))
        fin = np.isfinite(r)
        out["rot_sum"] = float(np.sum(r[fin])) if fin.any() else 0.0
        out["rot_cnt"] = float(fin.sum())
        fin = np.isfinite(t)
        out["trans_sum"] = float(np.sum(t[fin])) if fin.any() else 0.0
        out["trans_cnt"] = float(fin.sum())
        return out

    @staticmethod
    def combine_counts(counts: list) -> dict:
        """Merge per-process `counts()` dicts into summarize()-format
        metrics. Exact: recalls weight every frame equally regardless of
        how frames were sharded across processes."""
        tot = {k: sum(float(c[k]) for c in counts) for k in counts[0]}
        n = tot["n"]
        out = {}
        for k in tot:
            if k.startswith("hits_"):
                out["cmd" + k[5:]] = tot[k] / n if n else 0.0
        out["mean_rot_deg"] = (
            tot["rot_sum"] / tot["rot_cnt"] if tot["rot_cnt"] else float("inf")
        )
        out["mean_trans_cm"] = (
            tot["trans_sum"] / tot["trans_cnt"]
            if tot["trans_cnt"]
            else float("inf")
        )
        out["num_frames"] = int(n)
        return out


def record_eval_result(out_dir: str, name: str, metrics: dict) -> str:
    """Write per-sequence eval results as a text file
    (reference behavior: src/utils/eval_utils.py:7-15)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.txt")
    with open(path, "w") as f:
        for k, v in metrics.items():
            f.write(f"{k}: {v}\n")
    return path
