"""End-to-end one-shot pose estimation pipeline, fused on device.

Reference behavior (inference.py:97-182): per frame — SuperPoint on the
cropped query image, pack with the object's 3D annotation, GATsSPG 2D-3D
matching, mutual-max matches, RANSAC EPnP, cm-deg evaluation. The reference
round-trips device<->host at least four times per frame
(inference.py:141-155); here extract -> match -> solve is ONE jitted XLA
program per frame batch, and frames are batched.

Flow per batch:
  images [B, H, W, 1] --SuperPoint--> keypoints/descriptors (static K slots)
  --GATsSPG vs ObjectAnnotation--> matches (idx + validity)
  --gather--> 2D-3D correspondences --RANSAC EPnP + GN refine--> poses
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from onepose_tpu.geometry.ransac import ransac_pnp
from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.models.superpoint import SuperPoint, extract_keypoints


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObjectAnnotation:
    """The 3D side of the matcher: one scanned object's point cloud with
    aggregated descriptors (the output of SfM postprocessing; reference
    artifact anno_3d_average.npz / anno_3d_collect.npz / idxs.npy,
    src/sfm/postprocess/feature_process.py:165-188).

    points3d: [N3, 3]; desc3d: [N3, C] averaged track descriptors;
    leaf_desc: [N3, L, C]; mask3d: [N3]; leaf_mask: [N3, L];
    scores3d: [N3] mean keypoint scores (optional, used by encoders).
    """

    points3d: jnp.ndarray
    desc3d: jnp.ndarray
    leaf_desc: jnp.ndarray
    mask3d: jnp.ndarray
    leaf_mask: jnp.ndarray

    @property
    def batched(self) -> bool:
        """True when the annotation carries a leading batch axis (one
        object PER FRAME — mixed-object serving batches; see
        PosePipeline and stack_annotations)."""
        return self.mask3d.ndim == 2

    @property
    def n_points(self) -> int:
        return self.points3d.shape[-2]


def stack_annotations(annos: list) -> ObjectAnnotation:
    """Stack per-object annotations into a batched ObjectAnnotation so a
    single serving batch can match each frame against its OWN object
    (multi-object serving; the reference evaluates objects strictly
    serially, inference.py:185-198). All annotations must share the
    padded shapes (shape3d / num_leaf)."""
    return ObjectAnnotation(
        **{
            k: jnp.stack([getattr(a, k) for a in annos])
            for k in (
                "points3d", "desc3d", "leaf_desc", "mask3d", "leaf_mask"
            )
        }
    )


class PosePipeline:
    """Jit-compiled whole-frame pose estimation.

    Static configuration (image size, keypoint budget, hypothesis count)
    is bound at construction; weights and annotations are runtime pytrees.
    """

    def __init__(
        self,
        superpoint: SuperPoint | None = None,
        matcher: GATsSPG | None = None,
        max_keypoints: int = 1000,
        keypoint_threshold: float = 0.005,
        border: int = 4,
        nms_radius: int = 4,
        ransac_hypotheses: int = 512,
        reproj_threshold: float = 5.0,
        compute_dtype: jnp.dtype = jnp.bfloat16,
    ):
        """compute_dtype sets the GNN/conv compute precision of the
        default-constructed models (serving default bfloat16: the conv
        stack and attention projections ride the MXU at double rate while
        score ordering, normalizations, the match head, and the whole
        RANSAC-PnP solve stay fp32 — measured 98.7% identical keypoints
        and match agreement within the fp32 pipeline's own noise; pass
        jnp.float32 or prebuilt modules for full fp32).
        Explicitly passed superpoint/matcher modules are used as-is."""
        self.superpoint = superpoint or SuperPoint(
            nms_radius=nms_radius, dtype=compute_dtype
        )
        self.matcher = matcher or GATsSPG(dtype=compute_dtype)
        self.max_keypoints = max_keypoints
        self.keypoint_threshold = keypoint_threshold
        self.border = border
        self.ransac_hypotheses = ransac_hypotheses
        self.reproj_threshold = reproj_threshold
        self._jitted = jax.jit(self._forward)
        self._jitted_features = jax.jit(self._match_solve)

    def _forward(
        self,
        sp_params,
        matcher_params,
        images: jnp.ndarray,
        K: jnp.ndarray,
        anno: ObjectAnnotation,
        key: jax.Array,
    ) -> dict:
        dense = self.superpoint.apply(sp_params, images)
        feats = extract_keypoints(
            dense["score_map"],
            dense["descriptor_map"],
            max_keypoints=self.max_keypoints,
            keypoint_threshold=self.keypoint_threshold,
            border=self.border,
        )
        return self._match_solve(matcher_params, feats, K, anno, key)

    def _match_solve(
        self,
        matcher_params,
        feats: dict,
        K: jnp.ndarray,
        anno: ObjectAnnotation,
        key: jax.Array,
    ) -> dict:
        """Match precomputed keypoint features against the annotation and
        solve poses — the extraction-free tail of the pipeline. feats:
        dict(keypoints [B, N, 2], descriptors [B, N, C], scores [B, N],
        mask [B, N])."""
        b = feats["keypoints"].shape[0]
        # Single-object annotations broadcast over the frame batch;
        # batched annotations (anno.batched — one object per frame) pass
        # through as-is.
        def per_frame(x):
            return (
                x
                if anno.batched
                else jnp.broadcast_to(x[None], (b,) + x.shape)
            )

        desc3d = per_frame(anno.desc3d)
        leaves = per_frame(anno.leaf_desc)
        mask3d = per_frame(anno.mask3d)
        leaf_mask = per_frame(anno.leaf_mask)
        match = self.matcher.apply(
            matcher_params,
            feats["descriptors"],
            desc3d,
            leaves,
            feats["mask"],
            mask3d,
            leaf_mask,
        )

        # Gather 2D-3D correspondences (static shape: one slot per 2D kpt).
        idx = jnp.maximum(match["matches0"], 0)  # [B, N2]
        pts3d = jnp.take_along_axis(
            per_frame(anno.points3d),
            idx[..., None],
            axis=1,
        )  # [B, N2, 3]
        corr_mask = match["matches0"] >= 0

        keys = jax.random.split(key, b)
        solve = partial(
            ransac_pnp,
            n_hyp=self.ransac_hypotheses,
            reproj_threshold=self.reproj_threshold,
        )
        pnp = jax.vmap(solve)(keys, feats["keypoints"], pts3d, K, corr_mask)

        return {
            "pose": pnp["pose"],
            "num_inliers": pnp["num_inliers"],
            "pnp_ok": pnp["ok"],
            "inliers": pnp["inliers"],
            "keypoints": feats["keypoints"],
            "descriptors": feats["descriptors"],
            "kpt_mask": feats["mask"],
            "kpt_scores": feats["scores"],
            "matches0": match["matches0"],
            "matching_scores0": match["matching_scores0"],
            "num_matches": jnp.sum(corr_mask, axis=-1),
        }

    def __call__(
        self,
        sp_params,
        matcher_params,
        images: jnp.ndarray,
        K: jnp.ndarray,
        anno: ObjectAnnotation,
        key: Optional[jax.Array] = None,
    ) -> dict:
        """images: [B, H, W, 1] grayscale in [0, 1]; K: [B, 3, 3].

        Returns dict with pose [B, 4, 4] (world->cam), inlier stats, and
        raw keypoints/matches for visualization.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._jitted(
            sp_params, matcher_params, images, K, anno, key
        )

    def from_features(
        self,
        matcher_params,
        feats: dict,
        K: jnp.ndarray,
        anno: ObjectAnnotation,
        key: Optional[jax.Array] = None,
    ) -> dict:
        """Run match -> RANSAC-PnP from precomputed features (no image /
        extractor): feats = dict(keypoints [B, N, 2], descriptors
        [B, N, C], scores [B, N], mask [B, N]). Serves feature-cache
        evaluation (`infer features_h5=...`) and the oracle end-to-end
        accuracy gate."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._jitted_features(matcher_params, feats, K, anno, key)

    def sharded(self, mesh=None):
        """SPMD serving: the frame batch sharded over the mesh's data axis
        (multi-chip throughput / multi-object evaluation — each chip runs
        the whole per-frame program on its shard of frames; weights and
        the object annotation are replicated, so the only communication is
        the initial broadcast).

        Returns fn(sp_params, matcher_params, images, K, anno, key) with
        the same contract as __call__; the global batch must divide the
        data-axis size. Build the mesh once and reuse the returned fn —
        it is jitted with explicit shardings.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from onepose_tpu.parallel.mesh import DATA_AXIS, make_mesh

        mesh = mesh or make_mesh(n_points=1)
        repl = NamedSharding(mesh, P())

        def spec(x):
            if hasattr(x, "ndim") and x.ndim >= 1:
                return NamedSharding(
                    mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))
                )
            return repl

        cache = {}

        def run(sp_params, matcher_params, images, K, anno, key=None):
            if key is None:
                key = jax.random.PRNGKey(0)
            # Build the jitted program once and reuse it across calls
            # (a fresh jax.jit wrapper per call would re-trace every
            # batch in steady-state serving).
            if "fn" not in cache:
                batch_sh = (spec(images), spec(K))
                # Batched (per-frame-object) annotations shard with the
                # frame batch; single-object annotations replicate.
                anno_sh = (
                    jax.tree.map(spec, anno)
                    if anno.batched
                    else jax.tree.map(lambda _: repl, anno)
                )
                cache["fn"] = jax.jit(
                    self._forward,
                    in_shardings=(
                        jax.tree.map(lambda _: repl, sp_params),
                        jax.tree.map(lambda _: repl, matcher_params),
                        *batch_sh,
                        anno_sh,
                        repl,
                    ),
                )
            return cache["fn"](sp_params, matcher_params, images, K, anno, key)

        return run
