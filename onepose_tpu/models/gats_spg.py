"""GATsSPG: the flagship one-shot 2D-3D matcher.

Behavioral spec from the reference
(src/models/GATsSPG_architectures/GATs_SuperGlue.py:162-278):
- GNN layer pattern ['GATs', 'self', 'cross'] * 4 over 256-d descriptors.
  GATs layers refresh the 3D descriptors from their 2D leaves; self/cross
  layers are residual linear-attention message passing with 4 heads.
- The reference defines 2D/3D keypoint-position encoders but never applies
  them in forward (GATs_SuperGlue.py:172-182 vs 203-278); they are omitted.
- Final shared 1x1 projection, L2 normalization, similarity / scale_factor
  (0.07), dual-softmax confidence, mutual-max + threshold (0.2) matching.

TPU-first differences:
- Static shapes with masks: n2d / n3d / leaves are padded; masked entries
  cannot win matches or influence attention.
- Mutual-max and match extraction are pure array ops — no host sync; the
  downstream RANSAC-PnP consumes (idx, mask) directly on device.
- Channel-last layouts; one jit region end-to-end.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from onepose_tpu.models.common import AttentionalPropagation, NEG_INF
from onepose_tpu.models.gats import GraphAttentionLayer


class GATsSPG(nn.Module):
    d_model: int = 256
    num_heads: int = 4
    num_blocks: int = 4  # each block = [GATs, self, cross]
    scale_factor: float = 0.07
    match_threshold: float = 0.2
    include_self: bool = True
    additional: bool = False
    with_linear_transform: bool = False
    gats_use_pallas: Optional[bool] = None  # None = auto (TPU backend)
    # Fused dual-softmax + mutual-max head (ops/pallas/dual_softmax): the
    # conf matrix never touches HBM, so conf_matrix comes back None —
    # inference-only. None = auto (TPU backend). TRAINING MUST PASS False
    # (the focal loss consumes conf_matrix).
    fused_match: Optional[bool] = None
    # Fused [GATs, self, cross] block kernel (ops/pallas/gats_block): each
    # block runs as ONE Pallas call with activations resident in VMEM.
    # Inference-only (no custom VJP); opt-in per the kernel policy.
    block_fused: bool = False
    # Sequence parallelism (SURVEY §2.3 long-context axis): with a mesh the
    # 3D point / leaf axes are sharded over mesh['points'] and the
    # 2D<->3D attention + dual-softmax become the explicit shard_map
    # collectives of parallel/sharded_attention.py — psum'd KV moments for
    # the linear attention (O(H*D^2) bytes over ICI, independent of the
    # point count) and a psum'd softmax normalizer for the confidence.
    # Incompatible with the Pallas kernel paths (custom calls are not
    # auto-partitionable); batch stays sharded over mesh['data'].
    mesh: Optional[jax.sharding.Mesh] = None
    dtype: jnp.dtype = jnp.float32
    # Mixed-precision attention internals (MultiHeadAttention.mixed): bf16
    # contraction operands + fp32 accumulation/normalizers. Only active
    # when dtype is bf16; opt-in per the kernel policy (flip requires an
    # end-to-end bench + match-agreement check).
    mixed_attention: bool = False

    @nn.compact
    def __call__(
        self,
        desc2d: jnp.ndarray,
        desc3d: jnp.ndarray,
        leaf_desc: jnp.ndarray,
        mask2d: Optional[jnp.ndarray] = None,
        mask3d: Optional[jnp.ndarray] = None,
        leaf_mask: Optional[jnp.ndarray] = None,
    ) -> dict:
        """Match 2D query keypoints against the 3D point cloud.

        Args:
          desc2d: [B, N2, C] query keypoint descriptors.
          desc3d: [B, N3, C] aggregated 3D point descriptors.
          leaf_desc: [B, N3, L, C] per-point 2D leaf descriptors.
          mask2d / mask3d / leaf_mask: validity masks (True = real).
        Returns:
          dict with conf_matrix [B, N2, N3], matches0 [B, N2] (int, -1 =
          unmatched), matching_scores0 [B, N2], matches1 [B, N3],
          matching_scores1 [B, N3].
        """
        x2 = desc2d.astype(self.dtype)
        x3 = desc3d.astype(self.dtype)
        leaves = leaf_desc.astype(self.dtype)

        spmd = self.mesh is not None
        if spmd:
            assert not self.block_fused and not bool(self.fused_match), (
                "points-sharded GATsSPG is incompatible with the Pallas "
                "fused paths (custom calls are not auto-partitionable)"
            )
            # Pin the point/leaf shardings so the GATs leaf aggregation
            # (per-point, communication-free) stays local to each shard.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from onepose_tpu.parallel.mesh import POINTS_AXIS

            def pin(a, *axes):
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(self.mesh, P(*axes))
                )

            from onepose_tpu.parallel.sharded_attention import _batch_spec

            d = _batch_spec(self.mesh, x2.shape[0])
            x2 = pin(x2, d)
            x3 = pin(x3, d, POINTS_AXIS)
            leaves = pin(leaves, d, POINTS_AXIS)

        for blk in range(self.num_blocks):
            gats = GraphAttentionLayer(
                in_features=self.d_model,
                out_features=self.d_model,
                include_self=self.include_self,
                additional=self.additional,
                with_linear_transform=self.with_linear_transform,
                # Under block_fused this layer only materializes params via
                # a tiny dummy call (N3=1) — force the XLA path so the GATs
                # Pallas kernel is never invoked at tile-unfriendly shapes.
                use_pallas=False if self.block_fused else self.gats_use_pallas,
                dtype=self.dtype,
                name=f"gats_{blk}",
            )
            # Self/cross attention (linear), residual. ONE layer serves
            # both streams (shared weights), matching the reference GNN
            # loop (GATs_SuperGlue.py:74-83).
            self_layer = AttentionalPropagation(
                self.d_model, self.num_heads, kind="linear", norm="instance",
                mesh=self.mesh, dtype=self.dtype,
                mixed_attention=self.mixed_attention, name=f"self_{blk}",
            )
            cross_layer = AttentionalPropagation(
                self.d_model, self.num_heads, kind="linear", norm="instance",
                mesh=self.mesh, dtype=self.dtype,
                mixed_attention=self.mixed_attention, name=f"cross_{blk}",
            )

            if self.block_fused:
                # Materialize identical param trees with tiny dummy calls
                # (outputs are dead code), then run the whole block as one
                # Pallas call per example.
                from onepose_tpu.ops.pallas.gats_block import (
                    fused_gats_block,
                    pack_block_params,
                )

                _ = gats(leaves[:, :1], x3[:, :1], None)
                _ = self_layer(x2[:, :1], x2[:, :1])
                _ = cross_layer(x2[:, :1], x3[:, :1])
                packed = pack_block_params(
                    gats.variables["params"],
                    self_layer.variables["params"],
                    cross_layer.variables["params"],
                )
                x2, x3 = fused_gats_block(
                    x2, x3, leaves, mask2d, mask3d, leaf_mask,
                    packed, num_heads=self.num_heads, dtype=self.dtype,
                )
                x2 = x2.astype(self.dtype)
                x3 = x3.astype(self.dtype)
                continue

            # Sharding roles under spmd: x2 (queries) is replicated within
            # a data row, x3/leaves are sharded on the points axis. The
            # 2D self-attention and the 3D<-2D cross-attention need no
            # collectives (keys replicated); the 3D self-attention psums
            # its own KV moments ('qkv'); the 2D<-3D cross-attention psums
            # the sharded keys' moments ('kv').
            x3 = gats(leaves, x3, leaf_mask)
            x2 = x2 + self_layer(x2, x2, mask2d, mask2d)
            x3 = x3 + self_layer(
                x3, x3, mask3d, mask3d, spmd="qkv" if spmd else None
            )
            d2 = cross_layer(
                x2, x3, mask3d, mask2d, spmd="kv" if spmd else None
            )
            d3 = cross_layer(x3, x2, mask2d, mask3d)
            x2, x3 = x2 + d2, x3 + d3

        proj = nn.Dense(self.d_model, dtype=self.dtype, name="final_proj")
        # Similarity / dual-softmax head in fp32 regardless of the GNN
        # compute dtype: confidences feed match thresholds directly.
        m2 = proj(x2).astype(jnp.float32)
        m3 = proj(x3).astype(jnp.float32)
        m2 = m2 / jnp.maximum(
            jnp.linalg.norm(m2, axis=-1, keepdims=True), 1e-12
        )
        m3 = m3 / jnp.maximum(
            jnp.linalg.norm(m3, axis=-1, keepdims=True), 1e-12
        )

        scores = (
            jnp.einsum("bnc,bmc->bnm", m2, m3) / self.scale_factor
        )  # [B, N2, N3]
        if mask2d is not None:
            scores = jnp.where(mask2d[:, :, None], scores, NEG_INF)
        if mask3d is not None:
            scores = jnp.where(mask3d[:, None, :], scores, NEG_INF)

        # Opt-in only: isolated the fused head is 1.06x faster, but inside
        # the whole fused frame program it REGRESSED end-to-end throughput
        # (439 -> 410 fps) — the custom call blocks XLA from fusing/
        # scheduling around the head. Measured on v5e; see
        # docs/PERFORMANCE.md.
        fused = bool(self.fused_match)
        if fused:
            from onepose_tpu.ops.pallas.dual_softmax import (
                dual_softmax_match,
            )

            out = dual_softmax_match(scores, self.match_threshold)
            if mask2d is not None:
                out["matches0"] = jnp.where(mask2d, out["matches0"], -1)
            if mask3d is not None:
                out["matches1"] = jnp.where(mask3d, out["matches1"], -1)
            out["conf_matrix"] = None
            return out

        if spmd:
            # Dual-softmax over the sharded N3 axis: the N2 softmax is
            # local, the N3 softmax psums its max/normalizer over the
            # points axis (masking already applied above and re-applied
            # inside from the masks).
            from onepose_tpu.parallel.sharded_attention import (
                sharded_dual_softmax,
            )

            b, n2, n3 = scores.shape
            m2 = mask2d if mask2d is not None else jnp.ones((b, n2), bool)
            m3 = mask3d if mask3d is not None else jnp.ones((b, n3), bool)
            conf = sharded_dual_softmax(self.mesh, scores, m2, m3)
        else:
            conf = jax.nn.softmax(scores, axis=1) * jax.nn.softmax(
                scores, axis=2
            )
        out = match_from_conf(
            conf, self.match_threshold, mask2d=mask2d, mask3d=mask3d
        )
        out["conf_matrix"] = conf
        return out


def match_from_conf(
    conf: jnp.ndarray,
    threshold: float,
    mask2d: Optional[jnp.ndarray] = None,
    mask3d: Optional[jnp.ndarray] = None,
) -> dict:
    """Mutual-max + threshold match extraction from a confidence matrix.

    Pure array version of the reference's gather-based extraction
    (GATs_SuperGlue.py:255-267); -1 marks unmatched slots.
    """
    b, n2, n3 = conf.shape
    idx0 = jnp.argmax(conf, axis=2)  # [B, N2] best 3D per 2D
    idx1 = jnp.argmax(conf, axis=1)  # [B, N3] best 2D per 3D
    max0 = jnp.max(conf, axis=2)
    arange2 = jnp.arange(n2)[None, :]
    arange3 = jnp.arange(n3)[None, :]
    mutual0 = arange2 == jnp.take_along_axis(idx1, idx0, axis=1)
    mutual1 = arange3 == jnp.take_along_axis(idx0, idx1, axis=1)
    mscores0 = jnp.where(mutual0, max0, 0.0)
    mscores1 = jnp.where(
        mutual1, jnp.take_along_axis(mscores0, idx1, axis=1), 0.0
    )
    valid0 = mutual0 & (mscores0 > threshold)
    if mask2d is not None:
        valid0 &= mask2d
    valid1 = mutual1 & jnp.take_along_axis(valid0, idx1, axis=1)
    if mask3d is not None:
        valid1 &= mask3d
    matches0 = jnp.where(valid0, idx0, -1)
    matches1 = jnp.where(valid1, idx1, -1)
    return {
        "matches0": matches0,
        "matches1": matches1,
        "matching_scores0": mscores0,
        "matching_scores1": mscores1,
        "valid0": valid0,
        "valid1": valid1,
    }
