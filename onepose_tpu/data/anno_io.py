"""Annotation artifact I/O, format-compatible with the reference.

Artifacts (reference src/sfm/postprocess/feature_process.py:192-196,
365-378):
- anno_3d_average.npz: keypoints3d [m, 3], descriptors3d [C, m],
  scores3d [m, 1]
- anno_3d_collect.npz: keypoints3d [m, 3], descriptors3d [C, k],
  scores3d [k, 1] (concatenated leaves)
- idxs.npy: [m] per-point leaf counts
- anno_2d.json (per image): keypoints2d, descriptors2d [C, n], scores2d,
  assign_matrix [2, K], num_matches
- anno index json: list of {anno_id, anno_file, img_file, pose_file}

These loaders bridge maps built by the reference pipeline into our
ObjectAnnotation and vice versa.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np
import jax.numpy as jnp

from onepose_tpu.data.padding import pad_points3d
from onepose_tpu.runtime.pipeline import ObjectAnnotation
from onepose_tpu.sfm.aggregate import build_leaf_slots


def save_annotation_npz(result, anno_dir: str) -> None:
    """Write a MappingResult's artifacts in the reference npz layout."""
    os.makedirs(anno_dir, exist_ok=True)
    xyz = np.asarray(result.points_xyz)
    P = len(xyz)
    desc_avg = np.asarray(result.annotation.desc3d)[:P]
    np.savez(
        osp.join(anno_dir, "anno_3d_average.npz"),
        keypoints3d=xyz,
        descriptors3d=desc_avg.T,
        scores3d=np.asarray(result.scores_avg).reshape(-1, 1),
    )
    np.savez(
        osp.join(anno_dir, "anno_3d_collect.npz"),
        keypoints3d=xyz,
        descriptors3d=np.asarray(result.desc_concat).T,
        scores3d=np.asarray(result.scores_concat).reshape(-1, 1),
    )
    np.save(osp.join(anno_dir, "idxs.npy"), np.asarray(result.idxs))


def load_annotation_npz(anno_dir: str) -> dict:
    """Read the three artifacts back as numpy (unpadded)."""
    avg = np.load(osp.join(anno_dir, "anno_3d_average.npz"))
    clt = np.load(osp.join(anno_dir, "anno_3d_collect.npz"))
    idxs = np.load(osp.join(anno_dir, "idxs.npy"))
    return {
        "keypoints3d": avg["keypoints3d"],
        "desc_avg": avg["descriptors3d"].T,  # [m, C]
        "scores_avg": avg["scores3d"].reshape(-1),
        "desc_concat": clt["descriptors3d"].T,  # [k, C]
        "scores_concat": clt["scores3d"].reshape(-1),
        "idxs": idxs,
    }


def annotation_from_npz_dir(
    anno_dir: str,
    num_leaf: int = 8,
    shape3d: int = 2000,
    seed: int = 0,
) -> ObjectAnnotation:
    """Build the runtime ObjectAnnotation from reference-format artifacts
    (the inference.py:120-126 load path: pad_features3d_random +
    build_features3d_leaves)."""
    raw = load_annotation_npz(anno_dir)
    rng = np.random.default_rng(seed)
    padded = pad_points3d(
        raw["keypoints3d"], raw["desc_avg"], raw["scores_avg"],
        shape3d, rng=rng,
    )
    leaves = build_leaf_slots(
        raw["desc_concat"], raw["scores_concat"], raw["idxs"],
        num_leaf, rng=rng,
    )
    P = len(raw["idxs"])
    C = raw["desc_avg"].shape[-1]
    leaf_desc = np.ones((shape3d, num_leaf, C), np.float32)
    leaf_mask = np.zeros((shape3d, num_leaf), bool)
    k = min(P, shape3d)
    leaf_desc[:k] = leaves["leaf_desc"][:k]
    leaf_mask[:k] = leaves["leaf_mask"][:k]
    return ObjectAnnotation(
        points3d=jnp.asarray(padded["points3d"]),
        desc3d=jnp.asarray(padded["descriptors"]),
        leaf_desc=jnp.asarray(leaf_desc),
        mask3d=jnp.asarray(padded["mask"]),
        leaf_mask=jnp.asarray(leaf_mask),
    )


def save_anno2d(
    path: str,
    keypoints2d: np.ndarray,
    descriptors2d: np.ndarray,
    scores2d: np.ndarray,
    assign_matrix: np.ndarray,
) -> None:
    """Per-image 2D annotation in the reference json layout
    (feature_process.py:265-294; descriptors stored [C, n])."""
    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "keypoints2d": np.asarray(keypoints2d).tolist(),
                "descriptors2d": np.asarray(descriptors2d).T.tolist(),
                "scores2d": np.asarray(scores2d).reshape(-1, 1).tolist(),
                "assign_matrix": np.asarray(assign_matrix).tolist(),
                "num_matches": int(np.asarray(assign_matrix).shape[-1]),
            },
            f,
        )


def save_anno2d_npz(
    path: str,
    keypoints2d: np.ndarray,
    descriptors2d: np.ndarray,
    scores2d: np.ndarray,
    assign_matrix: np.ndarray,
) -> None:
    """Binary per-image 2D annotation (same fields as the reference json
    layout; ~70x faster to write and ~20x to read at 1024x256 — the json
    path costs 0.37 s/frame in Python serialization alone). Selected by
    `map anno_format=npz`; json stays the default for reference interop."""
    os.makedirs(osp.dirname(path), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp[:-4],
        keypoints2d=np.asarray(keypoints2d, np.float32),
        descriptors2d=np.asarray(descriptors2d, np.float32),
        scores2d=np.asarray(scores2d, np.float32).reshape(-1),
        assign_matrix=np.asarray(assign_matrix, np.int64).reshape(2, -1),
    )
    os.replace(tmp, path)


def load_anno2d(path: str) -> dict:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {
                "keypoints2d": z["keypoints2d"],
                "descriptors2d": z["descriptors2d"],
                "scores2d": z["scores2d"],
                "assign_matrix": z["assign_matrix"],
            }
    with open(path) as f:
        data = json.load(f)
    return {
        "keypoints2d": np.asarray(data["keypoints2d"], np.float32),
        "descriptors2d": np.asarray(data["descriptors2d"], np.float32).T,
        "scores2d": np.asarray(data["scores2d"], np.float32).reshape(-1),
        "assign_matrix": np.asarray(data["assign_matrix"], np.int64).reshape(
            2, -1
        ),
    }


def write_anno_index(path: str, annotations: list[dict]) -> None:
    """COCO-style-lite index: [{anno_id, anno_file, img_file, pose_file}]."""
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(annotations, f)


def read_anno_index(path: str) -> list[dict]:
    with open(path) as f:
        return json.load(f)


def merge_anno_indices(index_paths: list[str], out_path: str) -> int:
    """Merge per-object annotation indices into one training index
    (reference run.py:46-93 merge_anno, without the COCO wrapper)."""
    merged = []
    next_id = 1
    for p in index_paths:
        for entry in read_anno_index(p):
            entry = dict(entry)
            entry["anno_id"] = next_id
            next_id += 1
            merged.append(entry)
    write_anno_index(out_path, merged)
    return len(merged)


def export_coco_anno(index_path: str, out_path: str) -> dict:
    """Export an annotation index in the reference's COCO-style layout
    (run.py:62-93 merge_anno/merge_: images[] + annotations[] arrays with
    matching ids), so reference-format consumers (pycocotools loaders,
    GATs_spg_dataset.py:27-36) can read maps built by this framework."""
    entries = read_anno_index(index_path)
    images, annotations = [], []
    for i, e in enumerate(entries):
        img_id = i + 1
        images.append(
            {
                "id": img_id,
                "img_file": e["img_file"],
            }
        )
        annotations.append(
            {
                "id": e.get("anno_id", img_id),
                "image_id": img_id,
                "anno2d_file": e["anno_file"],
                "avg_anno3d_file": e.get("avg_anno3d_file", ""),
                "collect_anno3d_file": e.get("collect_anno3d_file", ""),
                "idxs_file": e.get("idxs_file", ""),
            }
        )
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }
    os.makedirs(osp.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(coco, f)
    return coco
