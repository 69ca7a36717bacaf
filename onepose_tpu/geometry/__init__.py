"""Core geometry: rotations, projection, crop/intrinsics contracts,
triangulation, PnP. All functions are pure; the jittable ones operate on
static shapes with validity masks."""

from onepose_tpu.geometry.rotations import (
    qvec_to_rotmat,
    rotmat_to_qvec,
    angle_axis_to_rotmat,
    rotmat_to_angle_axis,
    angle_axis_rotate_point,
)
from onepose_tpu.geometry.transforms import (
    get_affine_transform,
    get_K_crop_resize,
    bbox_center_scale,
    crop_img_affine,
)
from onepose_tpu.geometry.projection import (
    project_points,
    reprojection_errors,
)
from onepose_tpu.geometry.metrics import (
    query_pose_error,
    aggregate_metrics,
)
from onepose_tpu.geometry.triangulation import (
    triangulate_tracks_dlt,
    triangulate_two_view,
)
from onepose_tpu.geometry.epnp import epnp_solve
from onepose_tpu.geometry.ransac import ransac_pnp
