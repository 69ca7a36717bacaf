"""Object mapping driver: frames -> sparse 3D object map + annotations.

The orchestrator replacing the reference's `run.py sfm` call stack
(run.py:96-249: extract -> covis pairs -> match -> COLMAP triangulate ->
filter -> aggregate). Device work (extraction, matching, verification,
triangulation) is batched and jitted; graph work (tracks, merge) is
host-side numpy; the output is the ObjectAnnotation consumed by the
inference pipeline plus reconstruction statistics equivalent to COLMAP's
model_analyzer (reference triangulation.py:150-168).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.runtime.pipeline import ObjectAnnotation
from onepose_tpu.sfm.aggregate import (
    aggregate_point_features,
    assign_matrix_for_frame,
    build_leaf_slots,
)
from onepose_tpu.sfm.covis import covis_pairs_from_poses
from onepose_tpu.sfm.filtering import (
    filter_points_by_box,
    merge_close_points,
    track_length_for_max_points,
)
from onepose_tpu.sfm.tracks import build_tracks
from onepose_tpu.sfm.triangulate import triangulate_and_filter_tracks
from onepose_tpu.sfm.verify import epipolar_verify_matches


@dataclasses.dataclass
class MappingConfig:
    num_covis: int = 10
    min_rotation_deg: float = 10.0
    max_epipolar_px: float = 4.0
    max_reproj_px: float = 4.0
    min_tri_angle_deg: float = 1.5
    min_track_length: int = 2
    max_track_length: int = 32
    max_points3d: int = 2500
    merge_dist: float = 1e-3
    num_leaf: int = 8
    pair_batch: int = 32
    leaf_seed: int = 0


@dataclasses.dataclass
class MappingResult:
    annotation: ObjectAnnotation
    points_xyz: np.ndarray  # [P, 3] unpadded
    leaf_scores: np.ndarray
    scores_avg: np.ndarray
    desc_concat: np.ndarray
    scores_concat: np.ndarray
    idxs: np.ndarray
    frame_assign: dict  # {frame_idx: [2, K] assign matrix}
    stats: dict


def run_mapping(
    keypoints: np.ndarray,
    descriptors: np.ndarray,
    scores: np.ndarray,
    kpt_mask: np.ndarray,
    K: np.ndarray,
    poses: np.ndarray,
    match_pair_fn: Callable[[np.ndarray], np.ndarray],
    box_corners: Optional[np.ndarray] = None,
    seq_ids: Optional[np.ndarray] = None,
    config: MappingConfig = MappingConfig(),
    pad_points_to: Optional[int] = None,
) -> MappingResult:
    """Build an object map from per-frame features with known poses.

    Args:
      keypoints: [F, N, 2]; descriptors: [F, N, C]; scores: [F, N];
      kpt_mask: [F, N]; K: [F, 3, 3]; poses: [F, 4, 4] world->cam.
      match_pair_fn: pairs [P, 2] -> matches0 [P, N] (-1 = unmatched).
        The caller chooses the matcher (SuperGlue-class model or mutual-NN)
        and owns its batching.
      box_corners: optional [8, 3] annotated object box for point filtering.
      pad_points_to: pad the annotation to this many 3D slots (defaults to
        config.max_points3d).
    """
    cfg = config
    F, N = keypoints.shape[:2]
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]

    pairs = covis_pairs_from_poses(
        poses, seq_ids, num_matched=cfg.num_covis,
        min_rotation_deg=cfg.min_rotation_deg,
    )
    if len(pairs) == 0:
        raise ValueError("no covisible pairs — check poses / thresholds")

    matches0 = np.asarray(match_pair_fn(pairs))  # [P, N]

    # Epipolar verification (batched on device).
    i, j = pairs[:, 0], pairs[:, 1]
    midx = np.maximum(matches0, 0)
    uv0 = keypoints[i[:, None], np.arange(N)[None, :]]
    uv1 = keypoints[j[:, None], midx]
    valid = (
        (matches0 >= 0)
        & kpt_mask[i[:, None], np.arange(N)[None, :]]
        & kpt_mask[j[:, None], midx]
    )
    verified = np.asarray(
        epipolar_verify_matches(
            jnp.asarray(uv0), jnp.asarray(uv1), jnp.asarray(valid),
            jnp.asarray(K[i]), jnp.asarray(R[i]), jnp.asarray(t[i]),
            jnp.asarray(K[j]), jnp.asarray(R[j]), jnp.asarray(t[j]),
            max_epipolar_px=cfg.max_epipolar_px,
        )
    )
    matches0 = np.where(verified, matches0, -1)

    tracks = build_tracks(
        pairs, matches0, F, N,
        min_track_length=cfg.min_track_length,
        max_track_length=cfg.max_track_length,
    )
    if tracks.n_tracks == 0:
        raise ValueError("no tracks survived verification")

    tri = jax.tree.map(
        np.asarray,
        triangulate_and_filter_tracks(
            jnp.asarray(tracks.obs_frame),
            jnp.asarray(tracks.obs_kpt),
            jnp.asarray(tracks.obs_mask),
            jnp.asarray(keypoints), jnp.asarray(K),
            jnp.asarray(R), jnp.asarray(t),
            max_reproj_px=cfg.max_reproj_px,
            min_tri_angle_deg=cfg.min_tri_angle_deg,
        ),
    )
    ok = tri["ok"]

    # Track-length threshold so that <= max_points3d points survive
    # (reference filter_tkl.get_tkl semantics, applied to inlier counts).
    inlier_counts = tri["obs_inlier"].sum(axis=1)
    surviving = inlier_counts[ok]
    tkl = track_length_for_max_points(surviving, cfg.max_points3d)
    ok = ok & (inlier_counts >= tkl)

    if box_corners is not None:
        ok = ok & filter_points_by_box(tri["xyz"], np.asarray(box_corners))
    track_ids = np.nonzero(ok)[0]
    if len(track_ids) == 0:
        raise ValueError("no 3D points survived filtering")

    merged_xyz, groups = merge_close_points(
        tri["xyz"][track_ids], track_ids, dist_threshold=cfg.merge_dist
    )

    agg = aggregate_point_features(
        tracks, tri["obs_inlier"], ok, groups, descriptors, scores
    )
    leaves = build_leaf_slots(
        agg["desc_concat"], agg["scores_concat"], agg["idxs"],
        cfg.num_leaf, rng=np.random.default_rng(cfg.leaf_seed),
    )

    frame_assign = {
        f: assign_matrix_for_frame(obs, N, len(merged_xyz))
        for f, obs in agg["frame_obs"].items()
    }

    # Pad to the static annotation layout.
    P = len(merged_xyz)
    target = pad_points_to or cfg.max_points3d
    C = descriptors.shape[-1]
    pad = max(target - P, 0)

    def pad0(x, value=0.0):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x[:target], widths, constant_values=value)

    annotation = ObjectAnnotation(
        points3d=jnp.asarray(pad0(merged_xyz), jnp.float32),
        desc3d=jnp.asarray(pad0(agg["desc_avg"], 1.0), jnp.float32),
        leaf_desc=jnp.asarray(pad0(leaves["leaf_desc"], 1.0), jnp.float32),
        mask3d=jnp.asarray(pad0(np.ones(P, bool), False)),
        leaf_mask=jnp.asarray(pad0(leaves["leaf_mask"], False)),
    )

    stats = {
        "num_frames": int(F),
        "num_pairs": int(len(pairs)),
        "num_tracks": int(tracks.n_tracks),
        "num_points3d": int(P),
        "track_length_threshold": int(tkl),
        "mean_track_length": float(
            inlier_counts[track_ids].mean() if len(track_ids) else 0.0
        ),
        "mean_reproj_error_px": float(tri["mean_reproj"][track_ids].mean()),
        "num_observations": int(inlier_counts[track_ids].sum()),
    }
    return MappingResult(
        annotation=annotation,
        points_xyz=merged_xyz,
        leaf_scores=leaves["leaf_scores"],
        scores_avg=agg["scores_avg"],
        desc_concat=agg["desc_concat"],
        scores_concat=agg["scores_concat"],
        idxs=agg["idxs"],
        frame_assign=frame_assign,
        stats=stats,
    )
