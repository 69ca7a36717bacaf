"""Graph-attention (GATs) leaf aggregation layer.

Behavioral spec from the reference
(src/models/GATsSPG_architectures/GATs.py:9-123): each 3D point owns a
fixed fan-out of `num_leaf` 2D "leaf" descriptors (its track observations).
The layer computes attention logits e = LeakyReLU(a_l . Wh_leaf +
a_r . Wh_3d), softmaxes over (self + leaves), and aggregates the RAW (or
linearly transformed) descriptors into a refreshed 3D descriptor.

The shipped training configuration (configs/experiment/train_GATsSPG.yaml:
58-61) uses include_self=True, with_linear_transform=False,
additional=False, concat(elu)=True — that is the default here. Dropout is
declared but never applied in the reference forward; it is omitted.

Layout: leaves are [B, N3, L, C] (the reference flattens to [B, N3*L, C];
keeping the leaf axis explicit makes the structured attention a plain
batched softmax over L+1, which XLA fuses into one VPU pass).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# NOTE on SPMD: the fused Pallas path is a custom call XLA cannot
# auto-partition; when the 3D-point axis is sharded over a mesh (sequence
# parallelism), construct the layer with use_pallas=False (the XLA path
# partitions cleanly) or wrap the kernel in shard_map.

from onepose_tpu.models.common import NEG_INF


class GraphAttentionLayer(nn.Module):
    in_features: int = 256
    out_features: int = 256
    alpha: float = 0.2  # LeakyReLU negative slope
    include_self: bool = True
    additional: bool = False
    with_linear_transform: bool = False
    concat: bool = True
    use_pallas: Optional[bool] = None  # None = auto (TPU + shipped config)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        leaf_desc: jnp.ndarray,
        desc3d: jnp.ndarray,
        leaf_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """leaf_desc: [B, N3, L, C]; desc3d: [B, N3, C];
        leaf_mask: [B, N3, L] (True = real observation).
        Returns refreshed desc3d [B, N3, C].
        """
        W = self.param(
            "W",
            nn.initializers.xavier_normal(),
            (self.in_features, self.out_features),
        ).astype(self.dtype)
        a = self.param(
            "a",
            nn.initializers.xavier_normal(),
            (2 * self.out_features, 1),
        ).astype(self.dtype)
        a_leaf = a[: self.out_features, 0]
        a_self = a[self.out_features :, 0]

        # Fused Pallas path (projection -> logits -> softmax -> aggregate
        # in VMEM, leaves read once) for the shipped configuration.
        shipped = (
            self.include_self
            and not self.additional
            and not self.with_linear_transform
            and self.concat
            and self.dtype == jnp.float32
        )
        # Opt-in only (policy for all Pallas kernels here): isolated wins
        # can regress the WHOLE fused frame program — custom calls are
        # scheduling/fusion barriers for XLA. Measure end-to-end before
        # enabling; see docs/PERFORMANCE.md.
        use_pallas = bool(self.use_pallas)
        if use_pallas and shipped:
            from onepose_tpu.ops.pallas.gats import gats_leaf_attention

            return gats_leaf_attention(
                leaf_desc.astype(jnp.float32),
                desc3d.astype(jnp.float32),
                leaf_mask,
                W.astype(jnp.float32),
                jnp.stack([a_leaf, a_self]).astype(jnp.float32),
                self.alpha,
            )

        if self.with_linear_transform:
            wh_leaf = leaf_desc @ W  # [B, N3, L, C']
            wh_3d = desc3d @ W  # [B, N3, C']
            e_leaf = wh_leaf @ a_leaf  # [B, N3, L]
            e_3d = wh_3d @ a_self  # [B, N3]
        else:
            # Without the linear transform, Wh only ever feeds the scalar
            # logits, so (X @ W) @ a collapses to X @ (W @ a): a [C] matvec
            # instead of a [C, C'] projection of every leaf — ~256x fewer
            # FLOPs on the dominant leaf tensor, numerically the same dot
            # product reassociated.
            e_leaf = leaf_desc @ (W @ a_leaf)  # [B, N3, L]
            e_3d = desc3d @ (W @ a_self)  # [B, N3]
            wh_leaf = wh_3d = None

        if self.include_self:
            # Reference parity (GATs.py:117-122): the self column reuses the
            # right-hand score a_r . Wh3d, so its logit is 2 * e_3d after the
            # broadcast add below.
            logits = jnp.concatenate(
                [e_3d[..., None], e_leaf], axis=-1
            )  # [B, N3, 1+L]
            if self.with_linear_transform:
                values_w = jnp.concatenate(
                    [wh_3d[..., None, :], wh_leaf], axis=-2
                )
            else:
                values_w = None
            values_raw = jnp.concatenate(
                [desc3d[..., None, :], leaf_desc], axis=-2
            )
            if leaf_mask is not None:
                full_mask = jnp.concatenate(
                    [jnp.ones_like(leaf_mask[..., :1]), leaf_mask], axis=-1
                )
            else:
                full_mask = None
        else:
            logits = e_leaf
            values_w = wh_leaf
            values_raw = leaf_desc
            full_mask = leaf_mask

        logits = nn.leaky_relu(
            logits + e_3d[..., None], negative_slope=self.alpha
        )
        if full_mask is not None:
            logits = jnp.where(full_mask, logits, NEG_INF)
        attn = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        ).astype(self.dtype)  # [B, N3, (1+)L]

        values = values_w if self.with_linear_transform else values_raw
        h_prime = jnp.einsum("bnl,bnlc->bnc", attn, values)

        if self.include_self:
            if self.additional:
                h_prime = h_prime + desc3d
        else:
            base = wh_3d if self.with_linear_transform else desc3d
            h_prime = h_prime / 2.0 + base

        if self.concat:
            h_prime = nn.elu(h_prime)
        return h_prime
