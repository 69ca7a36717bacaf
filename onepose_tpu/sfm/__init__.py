"""Sparse object mapping (SfM with known poses), TPU-native.

Replaces the reference's COLMAP subprocess pipeline
(src/sfm/triangulation.py + postprocess/) with on-device batched geometry:
covisibility pair selection -> pair matching -> epipolar verification ->
track building -> batched DLT triangulation + GN refinement -> filtering /
merging -> per-point descriptor aggregation.
"""

from onepose_tpu.sfm.covis import covis_pairs_from_poses
from onepose_tpu.sfm.verify import epipolar_verify_matches
from onepose_tpu.sfm.tracks import build_tracks, Tracks
from onepose_tpu.sfm.triangulate import triangulate_and_filter_tracks
from onepose_tpu.sfm.filtering import (
    track_length_for_max_points,
    filter_points_by_box,
    merge_close_points,
)
from onepose_tpu.sfm.aggregate import (
    aggregate_point_features,
    build_leaf_slots,
    assign_matrix_for_frame,
)
