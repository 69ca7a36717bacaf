"""Feature-matching 2D object detector.

Behavioral spec from the reference LocalFeatureObjectDetector
(src/local_feature_2D_detector/local_feature_2D_detector.py:42-258):
- Build a DB of SuperPoint features for n_ref_view reference frames
  sampled uniformly from the mapping images.
- Match the query against every DB view; fit a similarity transform
  (RANSAC, 6 px) DB -> query; map the DB image corners through it to get a
  candidate box; keep the candidate with the most inliers.
- Crop the query to the box (square 512 crop) with the K_crop intrinsics
  update; `previous_pose_detect` instead projects the annotated 3D box
  corners by the previous pose.

TPU-first differences: the V reference views are matched in ONE batched
device call (the reference loops Python-side per view,
local_feature_2D_detector.py:77-133), and the similarity RANSAC is the
batched JAX version. Matching is pluggable: any callable
(query_feats, db_feats) -> matches works (SuperGlue-class model or
mutual-NN).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.geometry.projection import project_points
from onepose_tpu.geometry.similarity import ransac_similarity
from onepose_tpu.geometry.transforms import (
    get_affine_transform,
    get_K_crop_resize,
    crop_img_affine,
)


@dataclasses.dataclass
class ReferenceDB:
    """Stacked reference-view features: [V, N, ...] arrays + view sizes."""

    keypoints: jnp.ndarray  # [V, N, 2]
    descriptors: jnp.ndarray  # [V, N, C]
    scores: jnp.ndarray  # [V, N]
    mask: jnp.ndarray  # [V, N]
    sizes_hw: np.ndarray  # [V, 2] (h, w) per view


def select_reference_views(n_images: int, n_ref_views: int) -> np.ndarray:
    """Uniformly sample reference view indices (reference samples every
    len(images)//n_ref_view-th image, local_feature_2D_detector.py:55-60)."""
    gap = max(n_images // n_ref_views, 1)
    return np.arange(0, n_images, gap)[:n_ref_views]


class FeatureObjectDetector:
    def __init__(
        self,
        db: ReferenceDB,
        match_fn: Callable,
        crop_size: int = 512,
        ransac_px: float = 6.0,
        n_hyp: int = 128,
    ):
        """match_fn(db_feats: dict, query_feats: dict) -> matches0 [V, N]
        (index into query keypoints, -1 = unmatched), given stacked DB
        views and a single query's features broadcast to [V, ...]."""
        self.db = db
        self.match_fn = match_fn
        self.crop_size = crop_size
        self.ransac_px = ransac_px
        self.n_hyp = n_hyp

    def detect_bbox(
        self, query_feats: dict, key: Optional[jax.Array] = None
    ) -> dict:
        """Detect the object box in the query image.

        query_feats: dict(keypoints [N, 2], descriptors [N, C],
        scores [N], mask [N]).
        Returns dict(bbox [4] x0 y0 x1 y1, num_inliers, view, ok).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        V, N = self.db.keypoints.shape[:2]
        matches0 = self.match_fn(self.db, query_feats)  # [V, N]

        q_kpts = jnp.asarray(query_feats["keypoints"])
        midx = jnp.maximum(matches0, 0)
        dst = q_kpts[midx]  # [V, N, 2]
        valid = (matches0 >= 0) & self.db.mask

        keys = jax.random.split(key, V)
        fit = jax.vmap(
            lambda k, s, d, m: ransac_similarity(
                k, s, d, m, inlier_px=self.ransac_px, n_hyp=self.n_hyp
            )
        )(keys, self.db.keypoints, dst, valid)

        counts = np.asarray(fit["num_inliers"])
        best = int(np.argmax(counts))
        A = np.asarray(fit["A"][best])  # [2, 3]
        h, w = self.db.sizes_hw[best]
        corners = np.array(
            [[0, 0, 1], [w, 0, 1], [0, h, 1], [w, h, 1]], dtype=np.float64
        ).T
        bbox_pts = (A @ corners).T  # [4, 2]
        lt = bbox_pts.min(axis=0)
        rb = bbox_pts.max(axis=0)
        bbox = np.array([lt[0], lt[1], rb[0], rb[1]])
        return {
            "bbox": bbox,
            "num_inliers": int(counts[best]),
            "view": best,
            "ok": bool(counts[best] >= 6),
        }

    def previous_pose_detect(
        self, K: np.ndarray, prev_pose: np.ndarray, box3d_corners: np.ndarray
    ) -> np.ndarray:
        """Box from projecting the annotated 3D corners by the previous
        pose (local_feature_2D_detector.py:232-258)."""
        pose = np.asarray(prev_pose)
        uv, _ = project_points(
            jnp.asarray(box3d_corners, jnp.float32)[None],
            jnp.asarray(K, jnp.float32)[None],
            jnp.asarray(pose[:3, :3], jnp.float32)[None],
            jnp.asarray(pose[:3, 3], jnp.float32)[None],
        )
        uv = np.asarray(uv[0])
        lt = uv.min(axis=0)
        rb = uv.max(axis=0)
        return np.array([lt[0], lt[1], rb[0], rb[1]])

    def crop(
        self, image: jnp.ndarray, bbox: np.ndarray, K: np.ndarray
    ) -> tuple[jnp.ndarray, np.ndarray]:
        """Square crop to crop_size with the K_crop contract.

        Mirrors the reference's two-stage crop (crop to box, then resize to
        square — local_feature_2D_detector.py:160-186) as a single affine:
        the composed map takes the box to a crop_size x crop_size image
        with the box width driving the scale.
        """
        bbox = np.asarray(bbox, dtype=np.float64)
        size = (self.crop_size, self.crop_size)
        # Stage 1: box -> (box_w, box_h); stage 2: square resize. The
        # composition equals get_K_crop_resize of the original box applied
        # twice, which we reproduce exactly for K parity.
        K1, _ = get_K_crop_resize(
            bbox, K, (int(bbox[3] - bbox[1]), int(bbox[2] - bbox[0]))
        )
        bbox2 = [0, 0, bbox[2] - bbox[0], bbox[3] - bbox[1]]
        K2, _ = get_K_crop_resize(bbox2, K1, size)

        center = ((bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2)
        scale1 = (bbox[2] - bbox[0], bbox[3] - bbox[1])
        A1_inv = get_affine_transform(
            center, scale1, 0,
            (int(bbox[2] - bbox[0]), int(bbox[3] - bbox[1])), inv=True,
        )
        center2 = ((bbox2[0] + bbox2[2]) / 2, (bbox2[1] + bbox2[3]) / 2)
        A2_inv = get_affine_transform(
            center2, (bbox2[2] - bbox2[0], bbox2[3] - bbox2[1]), 0, size,
            inv=True,
        )
        # Compose output->source: A1_inv o A2_inv.
        A2h = np.vstack([A2_inv, [0, 0, 1]])
        A1h = np.vstack([A1_inv, [0, 0, 1]])
        A_inv = (A1h @ A2h)[:2]
        crop = crop_img_affine(
            image, jnp.asarray(A_inv, jnp.float32), size
        )
        return crop, K2
