"""`detect` command: feature-matching object detection preprocessing.

Reference equivalent: `python feature_matching_object_detector.py
+experiment=object_detector` (feature_matching_object_detector.py:117-148):
build a reference-view feature DB from the mapping sequence, detect the
object box in every query frame, and write the 512x512 crops to
`color_det/` plus the per-frame cropped intrinsics to `intrin_det/` —
the inputs `infer` consumes with detection mode `feature_matching`.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

DEFAULTS = {
    "db_dir": None,  # mapping sequence root (crops; reference-view DB)
    "query_dir": None,  # query sequence root with color_full/
    "weights": {"superpoint": None, "superglue": None},
    "max_keypoints": 1000,
    "n_ref_views": 15,
    "crop_size": 512,
    # 'nn' (weight-free mutual-NN) | 'superglue' (reference detector
    # matcher, local_feature_2D_detector.py:76-133).
    "detector_matcher": "nn",
}


def run(cfg: dict) -> dict:
    import cv2
    from glob import glob

    from onepose_tpu.cli.common import (
        build_feature_detector,
        load_superpoint_params,
    )
    from onepose_tpu.data import paths as path_utils
    from onepose_tpu.models import SuperPoint
    from onepose_tpu.models.superpoint import extract_keypoints

    db_dir = cfg["db_dir"]
    query_dir = cfg["query_dir"]
    assert db_dir and query_dir, "detect: db_dir and query_dir are required"

    sp = SuperPoint()
    sp_params = load_superpoint_params(sp, cfg["weights"]["superpoint"])
    sp_fwd = jax.jit(lambda p, x: sp.apply(p, x))

    detector, db_feats = build_feature_detector(
        db_dir,
        sp_params,
        sp,
        n_ref_views=cfg["n_ref_views"],
        max_keypoints=cfg["max_keypoints"],
        crop_size=cfg["crop_size"],
        match_kind=cfg["detector_matcher"],
        sg_weights=cfg["weights"].get("superglue"),
    )

    full_dir = osp.join(query_dir, "color_full")
    frame_paths = sorted(
        glob(osp.join(full_dir, "*.png")),
        key=lambda p: (
            int(osp.splitext(osp.basename(p))[0])
            if osp.splitext(osp.basename(p))[0].isdigit()
            else 0
        ),
    )
    assert frame_paths, f"no frames in {full_dir}"

    intrin_file = path_utils.intrin_full_path(query_dir)
    vals = {}
    for line in open(intrin_file):
        if ":" in line:
            k, v = line.split(":")
            vals[k.strip()] = float(v)
    K_full = np.array(
        [[vals["fx"], 0, vals["cx"]], [0, vals["fy"], vals["cy"]], [0, 0, 1]],
        np.float32,
    )

    color_det = osp.join(query_dir, "color_det")
    intrin_det = osp.join(query_dir, "intrin_det")
    os.makedirs(color_det, exist_ok=True)
    os.makedirs(intrin_det, exist_ok=True)

    from onepose_tpu.native.frame_loader import FrameLoader

    n_ok = 0
    for fi, gray in FrameLoader(frame_paths, queue_cap=4):
        fp = frame_paths[fi]
        if gray is None:
            raise FileNotFoundError(fp)
        dense = sp_fwd(sp_params, jnp.asarray(gray)[None, ..., None])
        qf = extract_keypoints(
            dense["score_map"],
            dense["descriptor_map"],
            max_keypoints=cfg["max_keypoints"],
        )
        det = detector.detect_bbox(
            {
                "keypoints": np.asarray(qf["keypoints"][0]),
                "descriptors": np.asarray(qf["descriptors"][0]),
                "scores": np.asarray(qf["scores"][0]),
                "mask": np.asarray(qf["mask"][0]),
                "image_hw": gray.shape,
            }
        )
        bbox = det["bbox"]
        h, w = gray.shape
        bbox = np.array(
            [
                max(bbox[0], 0),
                max(bbox[1], 0),
                min(bbox[2], w - 1),
                min(bbox[3], h - 1),
            ]
        )
        if bbox[2] - bbox[0] < 16 or bbox[3] - bbox[1] < 16:
            bbox = np.array([0, 0, w - 1, h - 1])
        crop, K_crop = detector.crop(jnp.asarray(gray), bbox, K_full)

        name = osp.splitext(osp.basename(fp))[0]
        cv2.imwrite(
            osp.join(color_det, f"{name}.png"),
            (np.asarray(crop) * 255).astype(np.uint8),
        )
        np.savetxt(osp.join(intrin_det, f"{name}.txt"), np.asarray(K_crop))
        n_ok += int(det["ok"])

    summary = {
        "num_frames": len(frame_paths),
        "num_detected": n_ok,
        "color_det": color_det,
        "intrin_det": intrin_det,
    }
    print(json.dumps(summary))
    return summary


def add_parser(subparsers):
    p = subparsers.add_parser(
        "detect", help="feature-matching 2D detection preprocessing"
    )
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(_defaults=DEFAULTS, _run=run)
