"""`demo` command: full-image video inference with detection + tracking.

Reference equivalent: `python inference_demo.py +experiment=test_demo`
(inference_demo.py:136-314). Per frame:
- frame 0 (or after a tracking failure): feature-matching object detection
  over the reference-view DB;
- later frames: project the annotated 3D box by the previous pose to get
  the crop (previous_pose_detect), falling back to re-detection when the
  PnP inlier count drops below `redetect_inliers` (reference threshold 8,
  inference_demo.py:204-210);
- crop -> SuperPoint -> GATsSPG -> RANSAC PnP (the fused PosePipeline);
- with use_tracking=True (reference inference_demo.py:253-299): the full
  matcher pipeline runs only on keyframe-cadence frames (kf_interval=5,
  reference track_interval) and re-seeds the BATracker via update_kf
  (pose-jump rejection); in-between frames run SuperPoint + tracker.track()
  only (LK flow -> PnP init -> NN match -> window BA), which skips the
  GATsSPG matcher and RANSAC entirely;
- demo video with the reprojected 3D box; per-stage StageTimer report.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

DEFAULTS = {
    "data_dir": None,  # sequence root with color_full/, intrinsics.txt
    "anno_dir": None,
    "box_path": None,  # defaults to <data_dir>/../box3d_corners.txt
    "weights": {"superpoint": None, "matcher": None, "superglue": None},
    "matcher": "gats",  # 'gats' (learned) | 'nn' (descriptor mutual-NN)
    # 2D-detector DB matcher: 'nn' (weight-free mutual-NN) | 'superglue'
    # (the reference's detector matcher, weights from weights.superglue).
    "detector_matcher": "nn",
    "nn_distance_thresh": 0.7,
    "max_keypoints": 1000,
    "shape3d": 2000,
    "num_leaf": 8,
    "n_ref_views": 8,
    "redetect_inliers": 8,
    "crop_size": 512,
    "use_tracking": False,
    "kf_interval": 5,  # matcher/keyframe cadence (reference track_interval)
    "out_dir": "runs/demo",
    "make_video": True,
}


def run(cfg: dict) -> dict:
    import cv2
    from glob import glob

    from onepose_tpu.cli.common import (
        build_feature_detector,
        build_matcher,
        load_superpoint_params,
    )
    from onepose_tpu.data import paths as path_utils
    from onepose_tpu.data.anno_io import annotation_from_npz_dir
    from onepose_tpu.models import SuperPoint
    from onepose_tpu.models.superpoint import extract_keypoints
    from onepose_tpu.runtime.pipeline import PosePipeline
    from onepose_tpu.utils.vis import save_demo_image, make_video

    data_dir = cfg["data_dir"]
    assert data_dir, "demo: data_dir is required"
    anno_dir = cfg["anno_dir"] or osp.join(
        osp.dirname(data_dir), "outputs", "anno"
    )
    box_path = cfg["box_path"]
    if not box_path:
        # Object-root convention first; parse-scan writes the corners
        # inside the sequence dir itself.
        for cand in (osp.dirname(data_dir), data_dir):
            box_path = path_utils.box3d_path(cand)
            if osp.exists(box_path):
                break
    box_corners = np.loadtxt(box_path)
    anno = annotation_from_npz_dir(
        anno_dir, num_leaf=cfg["num_leaf"], shape3d=cfg["shape3d"]
    )

    sp = SuperPoint()
    sp_params = load_superpoint_params(sp, cfg["weights"]["superpoint"])
    matcher, m_params = build_matcher(cfg)
    pipe = PosePipeline(sp, matcher, max_keypoints=cfg["max_keypoints"])
    sp_fwd = jax.jit(lambda p, x: sp.apply(p, x))

    # Reference-view DB from the mapping sequence (crops).
    detector, db_feats = build_feature_detector(
        data_dir,
        sp_params,
        sp,
        n_ref_views=cfg["n_ref_views"],
        max_keypoints=cfg["max_keypoints"],
        crop_size=cfg["crop_size"],
        match_kind=cfg["detector_matcher"],
        sg_weights=cfg["weights"].get("superglue"),
    )

    # Full frames + original intrinsics.
    full_dir = osp.join(data_dir, "color_full")
    frame_paths = sorted(
        glob(osp.join(full_dir, "*.png")),
        key=lambda p: int(osp.splitext(osp.basename(p))[0])
        if osp.splitext(osp.basename(p))[0].isdigit()
        else 0,
    )
    assert frame_paths, f"no frames in {full_dir}"
    intrin_file = path_utils.intrin_full_path(data_dir)
    if osp.exists(intrin_file):
        vals = {}
        for line in open(intrin_file):
            if ":" in line:
                k, v = line.split(":")
                vals[k.strip()] = float(v)
        K_full = np.array(
            [
                [vals["fx"], 0, vals["cx"]],
                [0, vals["fy"], vals["cy"]],
                [0, 0, 1],
            ],
            np.float32,
        )
    else:
        # Fall back to the first crop K (detector-style demos).
        K_full = db_feats["K"][0]

    tracker = None
    if cfg["use_tracking"]:
        from onepose_tpu.tracker import BATracker, TrackerConfig

        tracker = BATracker(
            TrackerConfig(
                n_kpts=cfg["max_keypoints"],
                kf_interval=cfg["kf_interval"],
            )
        )
    tracker_ready = False

    from onepose_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    img_out = osp.join(cfg["out_dir"], "frames")
    os.makedirs(img_out, exist_ok=True)
    prev_pose = None
    prev_conf = 0  # matcher inliers or tracker n_tracked of the last frame
    n_detect, n_box_track, n_matcher, n_flow = 0, 0, 0, 0
    results = []
    from onepose_tpu.native.frame_loader import FrameLoader

    # One fused program for crop extraction on tracked frames (dense
    # forward + NMS/top-k/descriptor sampling): a single dispatch instead
    # of the eager per-op chain extract_keypoints would otherwise issue.
    @jax.jit
    def _extract_crop_feats(crop):
        dense = sp.apply(sp_params, crop[None, ..., None])
        return extract_keypoints(
            dense["score_map"], dense["descriptor_map"],
            max_keypoints=cfg["max_keypoints"],
        )

    for fi, gray in FrameLoader(frame_paths, queue_cap=4):
        fp = frame_paths[fi]
        if gray is None:
            raise FileNotFoundError(fp)

        if prev_pose is None or prev_conf < cfg["redetect_inliers"]:
            with timer.stage("detect"):
                dense = sp_fwd(
                    sp_params, jnp.asarray(gray)[None, ..., None]
                )
                qf = extract_keypoints(
                    dense["score_map"], dense["descriptor_map"],
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
            n_detect += 1
        else:
            bbox = detector.previous_pose_detect(
                K_full, prev_pose, box_corners
            )
            n_box_track += 1

        # Clamp the box to the image and square it.
        h, w = gray.shape
        bbox = np.array(
            [
                max(bbox[0], 0), max(bbox[1], 0),
                min(bbox[2], w - 1), min(bbox[3], h - 1),
            ]
        )
        if bbox[2] - bbox[0] < 16 or bbox[3] - bbox[1] < 16:
            bbox = np.array([0, 0, w - 1, h - 1])
        crop, K_crop = detector.crop(jnp.asarray(gray), bbox, K_full)
        K_crop = jnp.asarray(K_crop, jnp.float32)

        # The full matcher pipeline runs every frame without tracking;
        # with tracking only on keyframe cadence, on the first frame, and
        # after a confidence drop (reference inference_demo.py:264-267).
        run_matcher = (
            tracker is None
            or not tracker_ready
            or fi % cfg["kf_interval"] == 0
            or prev_conf < cfg["redetect_inliers"]
        )

        if run_matcher:
            with timer.stage("matcher_pipeline"):
                out = pipe(
                    sp_params, m_params,
                    crop[None, ..., None],
                    K_crop[None],
                    anno,
                    jax.random.PRNGKey(fi),
                )
            n_matcher += 1
            pose = np.asarray(out["pose"][0])
            inliers = int(out["num_inliers"][0])
            conf = inliers

            if tracker is not None and inliers >= cfg["redetect_inliers"]:
                # Keypoint 3D ids: PnP-inlier matcher correspondences only
                # (reference kf_dict construction, inference_demo.py:265-291).
                matches0 = np.asarray(out["matches0"][0])
                inl = np.asarray(out["inliers"][0]).astype(bool)
                p3d_ids = np.where((matches0 >= 0) & inl, matches0, -1)
                kf_args = (
                    crop,
                    out["keypoints"][0],
                    out["descriptors"][0],
                    out["kpt_mask"][0],
                    p3d_ids,
                )
                if not tracker_ready:
                    tracker.initialize(
                        *kf_args, anno.points3d, pose, K_crop
                    )
                    tracker_ready = True
                else:
                    accepted = tracker.update_kf(*kf_args, pose, K_crop)
                    if not accepted:
                        # Tracker drifted away from the (confident) matcher
                        # pose: re-seed rather than keep a bad window.
                        tracker.initialize(
                            *kf_args, anno.points3d, pose, K_crop
                        )
        else:
            with timer.stage("superpoint"):
                qf = _extract_crop_feats(crop)
            with timer.stage("track"):
                tr = tracker.track(
                    crop,
                    qf["keypoints"][0],
                    qf["descriptors"][0],
                    qf["mask"][0],
                    K_crop,
                    key=jax.random.PRNGKey(fi),
                )
            n_flow += 1
            pose = np.asarray(tr["pose"])
            conf = int(tr["n_tracked"])

        prev_conf = conf
        prev_pose = pose if np.isfinite(pose).all() else None

        save_demo_image(
            (gray * 255).astype(np.uint8),
            K_full, pose, box_corners,
            osp.join(img_out, f"{fi}.png"),
        )
        results.append(
            {
                "frame": fi,
                "conf": conf,
                "pose": pose.tolist() if np.isfinite(pose).all() else None,
                "tracked": not run_matcher,
            }
        )

    video_path = None
    if cfg["make_video"]:
        video_path = make_video(
            img_out, osp.join(cfg["out_dir"], "demo.mp4")
        )
    stage_report = timer.report()
    summary = {
        "num_frames": len(frame_paths),
        "n_detect": n_detect,
        "n_box_track": n_box_track,
        "n_matcher": n_matcher,
        "n_flow_track": n_flow,
        "stage_ms": {
            k: round(v["mean_ms"], 2) for k, v in stage_report.items()
        },
        # Medians exclude first-call jit compiles (the per-frame truth;
        # reference emits per-frame stage ms, tracking_utils.py:5-46).
        "stage_p50_ms": {
            k: round(v["p50_ms"], 2) for k, v in stage_report.items()
        },
        "video": video_path,
    }
    with open(osp.join(cfg["out_dir"], "results.json"), "w") as f:
        json.dump({"summary": summary, "frames": results}, f)
    print(json.dumps(summary))
    return summary


def add_parser(subparsers):
    p = subparsers.add_parser(
        "demo", help="full-image video inference with detection"
    )
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(_defaults=DEFAULTS, _run=run)
