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
    # Optional global bundle adjustment after triangulation + merge — the
    # reference's `colmap bundle_adjuster` step (src/sfm/global_ba.py:9-39:
    # LM refinement with intrinsics fixed). refine_cameras=False keeps the
    # known capture poses as gauge and refines point positions only.
    global_ba: bool = False
    global_ba_iters: int = 10
    global_ba_refine_cameras: bool = False
    # Device mesh for map-block parallelism. When set (>1 device), global
    # BA runs the distributed Schur-complement solver with points sharded
    # over the devices (parallel/distributed_ba.py) instead of the
    # single-device solver — same math, psum-reduced camera system.
    mesh: Optional[object] = None


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
    refined_poses: Optional[np.ndarray] = None  # [F, 4, 4] if global BA
    # refined the camera poses (global_ba_refine_cameras=True)


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

    ba_stats: dict = {}
    refined_poses = None
    if cfg.global_ba:
        merged_xyz, refined_poses, ba_stats = _global_ba(
            merged_xyz, groups, tracks, tri["obs_inlier"],
            keypoints, K, poses, cfg,
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
        **ba_stats,
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
        refined_poses=refined_poses,
    )


def _global_ba(
    merged_xyz: np.ndarray,
    groups: dict,
    tracks,
    obs_inlier: np.ndarray,
    keypoints: np.ndarray,
    K: np.ndarray,
    poses: np.ndarray,
    cfg: MappingConfig,
):
    """Global LM bundle adjustment over the merged map (reference
    src/sfm/global_ba.py:9-39 — `colmap bundle_adjuster` with intrinsics
    refinement disabled). Returns (points, refined_poses | None, stats)."""
    from onepose_tpu.geometry.rotations import (
        angle_axis_to_rotmat,
        rotmat_to_angle_axis,
    )
    from onepose_tpu.ops.lm import ba_solve

    P = len(merged_xyz)
    pt_l, cam_l, uv_l = [], [], []
    for new_id in range(P):
        for tid in np.atleast_1d(groups[new_id]):
            sel = tracks.obs_mask[tid] & obs_inlier[tid].astype(bool)
            fr = tracks.obs_frame[tid][sel]
            kp = tracks.obs_kpt[tid][sel]
            pt_l.append(np.full(len(fr), new_id, np.int32))
            cam_l.append(fr.astype(np.int32))
            uv_l.append(keypoints[fr, kp])
    pt_idx = np.concatenate(pt_l)
    cam_idx = np.concatenate(cam_l)
    uv = np.concatenate(uv_l).astype(np.float32)
    f = 0.5 * (K[cam_idx, 0, 0] + K[cam_idx, 1, 1])
    feats = np.concatenate(
        [uv, f[:, None], K[cam_idx, 0, 2:3], K[cam_idx, 1, 2:3]], axis=1
    ).astype(np.float32)

    aa = np.asarray(
        jax.vmap(rotmat_to_angle_axis)(jnp.asarray(poses[:, :3, :3]))
    )
    cam6 = np.concatenate([aa, poses[:, :3, 3]], axis=1).astype(np.float32)
    fix = (
        None
        if cfg.global_ba_refine_cameras
        else jnp.ones((len(cam6),), jnp.float32)
    )
    n_dev = cfg.mesh.devices.size if cfg.mesh is not None else 1
    if n_dev > 1:
        # Distributed Schur BA: shard points (and their observations) over
        # all mesh devices. Points are padded to a multiple of the shard
        # count; padded points carry no observations, so their Hpp block is
        # pure damping and their update is exactly zero.
        from onepose_tpu.parallel.distributed_ba import (
            distributed_ba_solve,
            partition_obs_by_point,
        )
        from onepose_tpu.parallel.mesh import make_mesh

        P_pad = ((P + n_dev - 1) // n_dev) * n_dev
        pts_pad = np.pad(
            merged_xyz.astype(np.float32), ((0, P_pad - P), (0, 0))
        )
        ba_mesh = make_mesh(
            n_data=1, n_points=n_dev,
            devices=list(cfg.mesh.devices.ravel()),
        )
        fs, ps, cs, ms = partition_obs_by_point(
            P_pad, n_dev, feats, pt_idx, cam_idx,
            np.ones((len(pt_idx),), bool),
        )
        out = distributed_ba_solve(
            ba_mesh,
            jnp.asarray(pts_pad),
            jnp.asarray(cam6),
            jnp.asarray(fs), jnp.asarray(ps), jnp.asarray(cs),
            jnp.asarray(ms),
            fix_cam_mask=fix,
            n_iters=cfg.global_ba_iters,
        )
        out = dict(out)
        out["points"] = out["points"][:P]
    else:
        out = ba_solve(
            jnp.asarray(merged_xyz, jnp.float32),
            jnp.asarray(cam6),
            jnp.asarray(feats),
            jnp.asarray(pt_idx),
            jnp.asarray(cam_idx),
            jnp.ones((len(pt_idx),), bool),
            fix_cam_mask=fix,
            n_iters=cfg.global_ba_iters,
        )
    n_obs = max(len(pt_idx), 1)
    stats = {
        "global_ba_rmse_initial_px": float(
            np.sqrt(2.0 * float(out["cost_initial"]) / n_obs)
        ),
        "global_ba_rmse_final_px": float(
            np.sqrt(2.0 * float(out["cost_final"]) / n_obs)
        ),
    }
    refined_poses = None
    if cfg.global_ba_refine_cameras:
        cams = np.asarray(out["cam_poses"])
        Rs = np.asarray(
            jax.vmap(angle_axis_to_rotmat)(jnp.asarray(cams[:, :3]))
        )
        refined_poses = np.tile(np.eye(4, dtype=np.float32), (len(cams), 1, 1))
        refined_poses[:, :3, :3] = Rs
        refined_poses[:, :3, 3] = cams[:, 3:6]
    return np.asarray(out["points"]), refined_poses, stats
