"""Pipeline (stage) parallelism for serving: extract / match / solve on
distinct devices with micro-batches in flight concurrently.

SURVEY §2.3 row: "pipeline stages across devices for throughput". The
TPU-idiomatic realization is NOT an SPMD program — the three stages have
wildly different shapes (conv grid vs GNN vs RANSAC) — but a host-driven
software pipeline over per-stage jitted programs:

- stage 1 (SuperPoint dense + keypoint extraction) holds its weights on
  device 0, stage 2 (GATsSPG + correspondence gather) on device 1,
  stage 3 (RANSAC-PnP) on device 2 (devices wrap when fewer than 3);
- each micro-batch's stage output is device_put to the next stage's
  device; JAX dispatch is asynchronous, so issuing micro-batch i+1's
  stage-1 work enqueues while micro-batch i's stage-2 runs — the host
  never blocks until the final fetch, and the per-device programs plus
  the inter-device copies (ICI on real multi-chip, host RAM on the CPU
  mesh) overlap;
- steady-state throughput is set by the slowest stage instead of the
  stage sum, at the cost of 2 inter-device activation hops per
  micro-batch. For this model DP (PosePipeline.sharded) is usually the
  better axis — measured stage times are far from balanced (see
  docs/PERFORMANCE.md) — but the axis exists, composes with DP (give
  each pipeline replica 3 devices), and serves the multi-object case
  where stage-2/3 annotations differ per stream.

Numerical contract: identical outputs to PosePipeline.__call__ (same
programs, only placement differs) — tested on the CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from onepose_tpu.geometry.ransac import ransac_pnp
from onepose_tpu.models.superpoint import extract_keypoints
from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline


class StagePipeline:
    """Three-stage pipeline-parallel executor around a PosePipeline."""

    def __init__(
        self,
        pipe: PosePipeline,
        sp_params,
        matcher_params,
        anno: ObjectAnnotation,
        devices: Optional[Sequence[jax.Device]] = None,
    ):
        devs = list(devices) if devices else list(jax.devices())
        while len(devs) < 3:
            devs = devs + devs
        self.devices = devs[:3]
        d0, d1, d2 = self.devices
        self.pipe = pipe

        # Stage weights live on their stage's device.
        self.sp_params = jax.device_put(sp_params, d0)
        self.m_params = jax.device_put(matcher_params, d1)
        self.anno_match = jax.device_put(anno, d1)
        self.points3d = jax.device_put(anno.points3d, d2)

        sp = pipe.superpoint
        matcher = pipe.matcher

        def _extract(params, images):
            dense = sp.apply(params, images)
            return extract_keypoints(
                dense["score_map"],
                dense["descriptor_map"],
                max_keypoints=pipe.max_keypoints,
                keypoint_threshold=pipe.keypoint_threshold,
                border=pipe.border,
            )

        def _match(params, feats, anno):
            b = feats["keypoints"].shape[0]
            bc = lambda a: jnp.broadcast_to(a[None], (b,) + a.shape)
            out = matcher.apply(
                params,
                feats["descriptors"],
                bc(anno.desc3d),
                bc(anno.leaf_desc),
                feats["mask"],
                bc(anno.mask3d),
                bc(anno.leaf_mask),
            )
            return {
                "matches0": out["matches0"],
                "matching_scores0": out["matching_scores0"],
            }

        def _solve(points3d, keypoints, matches0, K, key):
            b = keypoints.shape[0]
            idx = jnp.maximum(matches0, 0)
            pts3d = jnp.take_along_axis(
                jnp.broadcast_to(
                    points3d[None], (b,) + points3d.shape
                ),
                idx[..., None],
                axis=1,
            )
            corr_mask = matches0 >= 0
            keys = jax.random.split(key, b)
            pnp = jax.vmap(
                partial(
                    ransac_pnp,
                    n_hyp=pipe.ransac_hypotheses,
                    reproj_threshold=pipe.reproj_threshold,
                )
            )(keys, keypoints, pts3d, K, corr_mask)
            return {
                "pose": pnp["pose"],
                "num_inliers": pnp["num_inliers"],
                "pnp_ok": pnp["ok"],
            }

        self._extract = jax.jit(_extract)
        self._match = jax.jit(_match)
        self._solve = jax.jit(_solve)

    def run(self, micro_batches, Ks, key=None):
        """Drive micro-batches through the pipeline.

        micro_batches: iterable of [b, H, W, 1] images; Ks: matching
        iterable of [b, 3, 3]. Returns the per-micro-batch stage-3 output
        dicts (in order). All stage work is enqueued asynchronously; this
        only blocks on the final results.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        d0, d1, d2 = self.devices
        outs = []
        for i, (imgs, K) in enumerate(zip(micro_batches, Ks)):
            imgs = jax.device_put(imgs, d0)
            feats = self._extract(self.sp_params, imgs)
            # Hand off to the matcher device (async copy).
            feats1 = jax.device_put(
                {
                    "keypoints": feats["keypoints"],
                    "descriptors": feats["descriptors"],
                    "mask": feats["mask"],
                },
                d1,
            )
            match = self._match(
                self.m_params,
                {**feats1, "descriptors": feats1["descriptors"]},
                self.anno_match,
            )
            kp2, m2, K2 = jax.device_put(
                (feats1["keypoints"], match["matches0"], K), d2
            )
            outs.append(
                self._solve(
                    self.points3d, kp2, m2, K2, jax.random.fold_in(key, i)
                )
            )
        jax.block_until_ready(outs)
        return outs
