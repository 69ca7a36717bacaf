"""`infer` command: GT-box evaluation inference over a sequence.

Reference equivalent: `python inference.py +experiment=test_GATsSPG`
(inference.py:97-182). Per frame-batch: SuperPoint on the crop, GATsSPG
against the object annotation, RANSAC PnP, cm-deg evaluation — all fused
on device via PosePipeline.
"""

from __future__ import annotations

import json
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

DEFAULTS = {
    "data_dir": None,  # sequence root with color/, poses_ba/, intrin_ba/
    "anno_dir": None,  # anno npz dir (defaults to ../outputs/anno)
    "weights": {"superpoint": None, "matcher": None},
    "matcher": "gats",  # 'gats' (learned) | 'nn' (descriptor mutual-NN)
    "nn_distance_thresh": 0.7,
    "max_keypoints": 1000,
    "shape3d": 2000,
    "num_leaf": 8,
    "batch": 8,
    "det_type": "GT_box",
    # Evaluate from a reference-layout feature cache (feats-superpoint.h5,
    # keyed by image basename or full relative path) instead of running the
    # extractor on images. Decouples matcher/solver evaluation from
    # extraction; also the injection point of the oracle accuracy gate.
    "features_h5": None,
    "eval_out": None,
    "seq_name": "seq",
    "dump_vis3d": None,  # dir for per-frame 3D dumps (Wis3D-export parity)
    # Multi-chip serving: shard frame batches over the local device mesh
    # (PosePipeline.sharded). False = single device; True = all local
    # devices; an int = that many. The batch is rounded up to the device
    # count. Replaces the reference's serial per-sequence GPU loop
    # (inference.py:185-198) with SPMD data parallelism.
    "data_parallel": False,
    # Mixed-object batches: flatten the whole roster into one frame
    # stream and serve each batch against a per-frame gathered batched
    # annotation (runtime.pipeline.stack_annotations) — no per-sequence
    # tail padding, one fused program for the entire roster. The
    # reference evaluates objects strictly serially.
    "batch_objects": False,
}


def run(cfg: dict) -> dict:
    from onepose_tpu.cli.common import (
        build_matcher,
        load_superpoint_params,
    )
    from onepose_tpu.data import paths as path_utils
    from onepose_tpu.data.anno_io import annotation_from_npz_dir
    from onepose_tpu.eval import Evaluator, record_eval_result
    from onepose_tpu.models import SuperPoint
    from onepose_tpu.runtime.pipeline import PosePipeline

    assert cfg["data_dir"], "infer: data_dir is required"
    # Multi-host (DCN) join when JAX_COORDINATOR_ADDRESS etc. are set;
    # no-op for the common single-process run.
    from onepose_tpu.utils.comm import init_distributed

    init_distributed()
    # Roster support (reference inference.py:185-198 loops all object
    # sequences): data_dir may be one directory, a comma-separated list,
    # or a glob pattern. Metrics are recorded per sequence and aggregated
    # over all frames.
    from glob import glob

    seq_dirs = []
    for d in str(cfg["data_dir"]).split(","):
        d = d.strip()
        if not d:
            continue
        hits = sorted(glob(d)) if any(c in d for c in "*?[") else [d]
        seq_dirs.extend(hits or [d])
    assert seq_dirs, f"infer: no sequences match {cfg['data_dir']}"

    sp = SuperPoint()
    sp_params = load_superpoint_params(sp, cfg["weights"]["superpoint"])
    matcher, m_params = build_matcher(cfg)
    pipe = PosePipeline(sp, matcher, max_keypoints=cfg["max_keypoints"])

    # Multi-chip serving: frame batches sharded over the data axis.
    from onepose_tpu.parallel.sfm_parallel import resolve_sfm_mesh

    mesh = resolve_sfm_mesh(cfg["data_parallel"])
    pipe_call = None
    if mesh is not None:
        n_dev = mesh.devices.size
        cfg = dict(cfg)
        cfg["batch"] = ((cfg["batch"] + n_dev - 1) // n_dev) * n_dev
        pipe_call = pipe.sharded(mesh)

    # Multi-host roster sharding (mirrors `map`, cli/map_object.py):
    # each process evaluates a strided share of the sequences; aggregate
    # recalls combine EXACTLY across processes via Evaluator sufficient
    # statistics (the reference's DDP val gather,
    # GATsSPG_lightning_model.py:99-103).
    n_proc = jax.process_count()
    my_seq_dirs = (
        seq_dirs[jax.process_index() :: n_proc]
        if n_proc > 1
        else seq_dirs
    )

    per_seq = {}
    overall = Evaluator()
    total_frames = 0
    if cfg["batch_objects"] and my_seq_dirs:
        assert not cfg.get("features_h5"), (
            "batch_objects evaluates from images (the feature cache is "
            "per-sequence)"
        )
        per_seq = _eval_roster_batched(
            cfg, my_seq_dirs, pipe, sp_params, m_params, overall,
            pipe_call=pipe_call,
        )
        for seq_name, m in per_seq.items():
            total_frames += m["num_frames"]
            if cfg["eval_out"]:
                record_eval_result(cfg["eval_out"], seq_name, m)
    else:
        for seq_dir in my_seq_dirs:
            anno_dir = cfg["anno_dir"] or osp.join(
                osp.dirname(seq_dir), "outputs", "anno"
            )
            anno = annotation_from_npz_dir(
                anno_dir, num_leaf=cfg["num_leaf"], shape3d=cfg["shape3d"]
            )
            seq_name = (
                cfg["seq_name"]
                if len(seq_dirs) == 1
                else osp.basename(osp.normpath(seq_dir))
            )
            m = _eval_sequence(
                cfg, seq_dir, anno, pipe, sp_params, m_params, overall,
                pipe_call=pipe_call,
            )
            per_seq[seq_name] = m
            total_frames += m["num_frames"]
            if cfg["eval_out"]:
                record_eval_result(cfg["eval_out"], seq_name, m)

    if n_proc > 1:
        # Exact cross-process aggregation; every process returns the
        # identical full-roster metrics. per_seq stays process-local
        # (each rank records its own sequences to eval_out above).
        from onepose_tpu.utils.comm import all_gather_pytree

        counts = all_gather_pytree(overall.counts())
        frames = all_gather_pytree(np.asarray(total_frames))
        metrics = Evaluator.combine_counts(counts)
        metrics["num_frames"] = int(sum(int(f) for f in frames))
        metrics["per_seq"] = per_seq
        if cfg["eval_out"] and jax.process_index() == 0:
            record_eval_result(
                cfg["eval_out"],
                "ALL",
                {k: v for k, v in metrics.items() if k != "per_seq"},
            )
    elif len(seq_dirs) == 1:
        metrics = next(iter(per_seq.values()))
    else:
        metrics = overall.summarize()
        metrics["num_frames"] = total_frames
        metrics["per_seq"] = per_seq
        if cfg["eval_out"]:
            record_eval_result(
                cfg["eval_out"],
                "ALL",
                {k: v for k, v in metrics.items() if k != "per_seq"},
            )
    print(json.dumps(metrics))
    return metrics


def _eval_sequence(
    cfg: dict, data_dir: str, anno, pipe, sp_params, m_params, overall,
    pipe_call=None,
) -> dict:
    """pipe_call overrides the image-path pipeline invocation (e.g. the
    sharded SPMD program); the cached-features path stays single-device."""
    from onepose_tpu.data import paths as path_utils
    from onepose_tpu.eval import Evaluator

    img_paths = path_utils.list_color_images(data_dir, cfg["det_type"])
    ev = Evaluator()
    B = cfg["batch"]
    n_frames = 0

    cached_feats = None
    if cfg.get("features_h5"):
        from onepose_tpu.sfm.cache import load_features_h5

        cached_feats = load_features_h5(
            cfg["features_h5"],
            [osp.basename(p) for p in img_paths],
            pad_to=cfg["max_keypoints"],
        )
        frames = None
    else:
        # Native threaded prefetch: decode of upcoming frames overlaps the
        # device batch in flight (native/frame_loader.cpp).
        from onepose_tpu.native.frame_loader import FrameLoader

        frames = iter(FrameLoader(img_paths, queue_cap=2 * B))
    for s in range(0, len(img_paths), B):
        chunk = img_paths[s : s + B]
        imgs, Ks, poses = [], [], []
        for p in chunk:
            if frames is not None:
                _, img = next(frames)
                if img is None:
                    raise FileNotFoundError(p)
                imgs.append(img)
            K = np.loadtxt(
                path_utils.intrin_path_by_color(p, cfg["det_type"])
            ).astype(np.float32)
            pose = np.loadtxt(
                path_utils.gt_pose_path_by_color(p, cfg["det_type"])
            ).astype(np.float32)
            Ks.append(K)
            poses.append(pose)
        pad = B - len(chunk)
        if pad:
            imgs += [imgs[-1]] * pad if imgs else []
            Ks += [Ks[-1]] * pad
            poses += [poses[-1]] * pad
        if cached_feats is not None:
            sl = [min(s + j, len(img_paths) - 1) for j in range(B)]
            feats_b = {
                "keypoints": jnp.asarray(cached_feats["keypoints"][sl]),
                "descriptors": jnp.asarray(cached_feats["descriptors"][sl]),
                "scores": jnp.asarray(cached_feats["scores"][sl]),
                "mask": jnp.asarray(cached_feats["mask"][sl]),
            }
            out = pipe.from_features(
                m_params, feats_b, jnp.asarray(np.stack(Ks)), anno,
                jax.random.PRNGKey(s),
            )
        else:
            call = pipe_call or pipe
            out = call(
                sp_params, m_params,
                jnp.asarray(np.stack(imgs))[..., None],
                jnp.asarray(np.stack(Ks)),
                anno,
                jax.random.PRNGKey(s),
            )
        pose_pred = np.asarray(out["pose"])[: len(chunk)]
        gt = np.stack(poses)[: len(chunk)]
        ev.evaluate(pose_pred, gt)
        overall.evaluate(pose_pred, gt)
        if cfg["dump_vis3d"]:
            from onepose_tpu.utils.vis import dump_scene_3d

            pts3d_all = np.asarray(anno.points3d)
            for j, p in enumerate(chunk):
                m0 = np.asarray(out["matches0"][j])
                matched = pts3d_all[m0[m0 >= 0]]
                dump_scene_3d(
                    cfg["dump_vis3d"],
                    osp.splitext(osp.basename(p))[0],
                    pts3d_all,
                    pose_pred[j],
                    Ks[j],
                    kpts2d=np.asarray(out["keypoints"][j]),
                    matched_pts3d=matched,
                )
        n_frames += len(chunk)

    metrics = ev.summarize()
    metrics["num_frames"] = n_frames
    return metrics


def _eval_roster_batched(
    cfg: dict, seq_dirs, pipe, sp_params, m_params, overall,
    pipe_call=None,
) -> dict:
    """Mixed-object roster evaluation: ONE frame stream over every
    sequence, each batch matched against a per-frame batched annotation
    gathered on device from the stacked object annotations
    (runtime.pipeline.stack_annotations). Removes per-sequence batch-tail
    padding and keeps a single compiled program for the whole roster.
    Returns {seq_name: metrics}."""
    from onepose_tpu.data import paths as path_utils
    from onepose_tpu.data.anno_io import annotation_from_npz_dir
    from onepose_tpu.eval import Evaluator
    from onepose_tpu.native.frame_loader import FrameLoader
    from onepose_tpu.runtime.pipeline import stack_annotations

    annos, jobs, seq_names = [], [], []
    for si, seq_dir in enumerate(seq_dirs):
        anno_dir = cfg["anno_dir"] or osp.join(
            osp.dirname(seq_dir), "outputs", "anno"
        )
        annos.append(
            annotation_from_npz_dir(
                anno_dir, num_leaf=cfg["num_leaf"], shape3d=cfg["shape3d"]
            )
        )
        seq_names.append(osp.basename(osp.normpath(seq_dir)))
        for p in path_utils.list_color_images(seq_dir, cfg["det_type"]):
            jobs.append((si, p))
    stacked = stack_annotations(annos)  # leaves [K_obj, ...] on device

    B = cfg["batch"]
    evs = [Evaluator() for _ in seq_dirs]
    frames = iter(FrameLoader([p for _, p in jobs], queue_cap=2 * B))
    call = pipe_call or pipe
    for s in range(0, len(jobs), B):
        chunk = jobs[s : s + B]
        imgs, Ks, poses, sis = [], [], [], []
        for si, p in chunk:
            _, img = next(frames)
            if img is None:
                raise FileNotFoundError(p)
            imgs.append(img)
            Ks.append(
                np.loadtxt(
                    path_utils.intrin_path_by_color(p, cfg["det_type"])
                ).astype(np.float32)
            )
            poses.append(
                np.loadtxt(
                    path_utils.gt_pose_path_by_color(p, cfg["det_type"])
                ).astype(np.float32)
            )
            sis.append(si)
        pad = B - len(chunk)
        if pad:
            imgs += [imgs[-1]] * pad
            Ks += [Ks[-1]] * pad
            sis += [sis[-1]] * pad
        # Per-frame annotation: a device-side gather of the stacked
        # object annotations by sequence index (a few MB, no host copy).
        obj_idx = jnp.asarray(np.asarray(sis))
        banno = jax.tree.map(lambda x: x[obj_idx], stacked)
        out = call(
            sp_params, m_params,
            jnp.asarray(np.stack(imgs))[..., None],
            jnp.asarray(np.stack(Ks)),
            banno,
            jax.random.PRNGKey(s),
        )
        pose_pred = np.asarray(out["pose"])[: len(chunk)]
        gt = np.stack(poses)
        for j, (si, _) in enumerate(chunk):
            evs[si].evaluate(pose_pred[j][None], gt[j][None])
        overall.evaluate(pose_pred, gt)

    per_seq = {}
    for name, ev in zip(seq_names, evs):
        per_seq[name] = ev.summarize()
    return per_seq


def add_parser(subparsers):
    p = subparsers.add_parser("infer", help="GT-box evaluation inference")
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(_defaults=DEFAULTS, _run=run)
