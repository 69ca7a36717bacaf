"""Shared model building blocks: point-MLPs, masked attention primitives.

Conventions (deliberately different from the reference's [B, C, N] conv1d
layout): all point sets are channel-LAST [B, N, C] so that every matmul maps
onto the MXU as a plain [N, C] x [C, C'] contraction, and every mask is a
bool [B, N] with True = valid. Padded slots must never influence valid
outputs through attention or normalization statistics unless explicitly
documented (instance-norm parity mode).

Behavioral contracts mirrored from the reference (for checkpoint interop):
- MLP = 1x1 conv stack with norm+ReLU between layers
  (reference: src/models/matchers/SuperGlue/superglue.py:50-65 BatchNorm1d
  variant, src/models/GATsSPG_architectures/GATs_SuperGlue.py:135-147
  InstanceNorm1d variant).
- Softmax attention: scores = q.k / sqrt(head_dim)
  (reference: superglue.py:103-119).
- Linear attention: elu(x)+1 feature map, value length normalization
  (reference: GATs_SuperGlue.py:88-99).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9

_MIXED_DOT_SUPPORTED: Optional[bool] = None


def backend_supports_mixed_dot() -> bool:
    """True if this backend can execute bf16 x bf16 -> f32 contractions.

    TPU's MXU accumulates bf16 operands in fp32 natively; some CPU
    backends reject the pattern at dispatch ("Unsupported element type for
    DotThunk"). Probed once per process with a tiny eager dot; on failure
    the mixed-precision attention paths upcast operands to fp32 (same
    math, no MXU win — only reachable off-TPU)."""
    global _MIXED_DOT_SUPPORTED
    if _MIXED_DOT_SUPPORTED is None:
        # Capability probes are unreliable here: the CPU backend routes
        # small contractions through a generic loop that accepts bf16 but
        # rejects the same dtype combination in its optimized DotThunk,
        # so whether a given dot fails depends on shape/layout heuristics.
        # Accelerator backends (MXU / tensor cores) support the pattern
        # natively; everything else gets the fp32-operand fallback.
        _MIXED_DOT_SUPPORTED = jax.default_backend() in ("tpu", "gpu")
    return _MIXED_DOT_SUPPORTED


class PointMLP(nn.Module):
    """MLP applied pointwise over [B, N, C]: Dense+norm+ReLU stack.

    norm: 'instance' normalizes each channel over the N axis per example
    (no learned affine, matching torch InstanceNorm1d defaults); 'batch'
    uses learned scale/bias with batch statistics folded at conversion time
    (i.e. a pure affine in inference; see convert.fold_batchnorm); 'none'
    skips normalization. The norm is applied between layers, not after the
    final Dense (reference MLP contract).

    instance_mask_aware: if True, instance-norm statistics are computed over
    valid points only. Default False for parity with the reference, which
    computes statistics over padded points too.
    """

    features: Sequence[int]
    norm: str = "instance"
    instance_mask_aware: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n_layers = len(self.features)
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n_layers - 1:
                if self.norm == "instance":
                    x = masked_instance_norm(
                        x, mask if self.instance_mask_aware else None
                    )
                elif self.norm == "batch":
                    # Folded batchnorm: per-channel affine (scale, bias)
                    # learned / converted from running statistics.
                    scale = self.param(
                        f"bn_scale_{i}", nn.initializers.ones, (feat,)
                    )
                    bias = self.param(
                        f"bn_bias_{i}", nn.initializers.zeros, (feat,)
                    )
                    x = x * scale.astype(x.dtype) + bias.astype(x.dtype)
                x = nn.relu(x)
        return x


def masked_instance_norm(
    x: jnp.ndarray, mask: Optional[jnp.ndarray], eps: float = 1e-5
) -> jnp.ndarray:
    """InstanceNorm over the point axis of [B, N, C] (no affine).

    With mask=None this matches torch InstanceNorm1d(C) on [B, C, N]:
    per-(example, channel) mean/var over all N points, biased variance.
    """
    dtype = x.dtype
    x = x.astype(jnp.float32)  # stats in fp32: bf16 variance is garbage
    if mask is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
    else:
        w = mask.astype(x.dtype)[..., None]
        n = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * w, axis=1, keepdims=True) / n
        var = jnp.sum(jnp.square(x - mean) * w, axis=1, keepdims=True) / n
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def _flash_softmax_attention(q, k, v, kv_mask, sm_scale):
    """O(N)-memory attention via the TPU Pallas flash kernel: the
    [N, M] logits/probs never touch HBM. q/k/v: [B, N|M, H, D].

    OPT-IN (kernel policy, docs/PERFORMANCE.md): at the largest shape
    this repo runs (SuperGlue at the 4096-keypoint SfM budget) the XLA
    attention already measures 0.77 ms/call on v5e (scan method) — XLA
    fuses the logits->softmax->AV chain well enough that the flash
    kernel (0.91 ms) does not win; parity max|diff| 4.8e-4. Kept for
    larger future shapes where O(N^2) materialization must actually be
    avoided (e.g. >8k keypoints)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, n, h, dh = q.shape
    m = k.shape[1]
    np_ = -(-n // 512) * 512
    mp = -(-m // 512) * 512
    qt = jnp.pad(
        q.astype(jnp.float32), ((0, 0), (0, np_ - n), (0, 0), (0, 0))
    ).transpose(0, 2, 1, 3)
    kt = jnp.pad(
        k.astype(jnp.float32), ((0, 0), (0, mp - m), (0, 0), (0, 0))
    ).transpose(0, 2, 1, 3)
    vt = jnp.pad(
        v.astype(jnp.float32), ((0, 0), (0, mp - m), (0, 0), (0, 0))
    ).transpose(0, 2, 1, 3)
    # Key-side masking (incl. the pad tail) via segment ids: queries live
    # in segment 1, valid keys in 1, masked/pad keys in 0.
    valid = (
        kv_mask
        if kv_mask is not None
        else jnp.ones((b, m), bool)
    )
    kv_seg = jnp.pad(
        valid.astype(jnp.int32), ((0, 0), (0, mp - m))
    )
    q_seg = jnp.ones((b, np_), jnp.int32)
    out = flash_attention(
        qt, kt, vt,
        segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
        sm_scale=sm_scale,
    )
    out = out.transpose(0, 2, 1, 3)[:, :n]
    if kv_mask is not None:
        # Fully-masked key sets: the XLA path yields the uniform-average
        # of v (softmax of all-NEG_INF); the flash kernel's normalizer is
        # ~0 there. Zero those rows explicitly so downstream stays finite
        # (they belong to examples with no valid keypoints and are masked
        # out of matching anyway).
        has_valid = jnp.any(kv_mask, axis=1)
        out = jnp.where(has_valid[:, None, None, None], out, 0.0)
    return out


def masked_softmax_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head scaled dot-product attention with key-side masking.

    q: [B, N, H, D]; k, v: [B, M, H, D]; kv_mask: [B, M] (True = valid).
    Returns [B, N, H, D]. Invalid keys receive ~zero probability.

    compute_dtype (e.g. bfloat16) feeds the two big contractions
    low-precision OPERANDS with fp32 MXU accumulation
    (preferred_element_type); the softmax itself stays fp32. None keeps
    the all-fp32 path.

    use_flash: route through the TPU flash-attention kernel — exact
    softmax (online normalizer), no [N, M] materialization, fp32.
    OPT-IN: measured neutral-to-negative vs XLA's fused attention at
    this repo's shapes (see _flash_softmax_attention); default False.
    """
    d = q.shape[-1]
    if use_flash:
        return _flash_softmax_attention(
            q, k, v, kv_mask, sm_scale=1.0 / float(d) ** 0.5
        )
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        # Round operands through compute_dtype always (deterministic
        # numerics across backends); feed the dots fp32 operands where the
        # backend can't execute mixed-operand accumulation.
        cd = (
            compute_dtype if backend_supports_mixed_dot() else jnp.float32
        )
        q = q.astype(compute_dtype)
        k = k.astype(compute_dtype)
        v = v.astype(compute_dtype)
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm",
            q.astype(cd),
            k.astype(cd),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.asarray(d, jnp.float32))
        if kv_mask is not None:
            logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhnm,bmhd->bnhd",
            probs.astype(cd),
            v.astype(cd),
            preferred_element_type=jnp.float32,
        )
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
        jnp.asarray(d, q.dtype)
    )
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def masked_linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Linear (kernelized) attention with the elu+1 feature map.

    q: [B, N, H, D]; k, v: [B, M, H, D]; kv_mask: [B, M].
    O(N*D^2) instead of O(N*M): out = phi(q) @ (phi(k)^T V) / (phi(q) @ sum
    phi(k)). Masked keys contribute nothing (phi(k) is zeroed — valid
    because phi > 0 elsewhere). Matches the reference's value-length
    conditioning (divide V by M, multiply the result back).

    compute_dtype (e.g. bfloat16) feeds the two big contractions
    low-precision OPERANDS with fp32 MXU accumulation; the feature map and
    the normalizer z stay fp32 (bf16 normalizers are unstable). None keeps
    the all-fp32 path.
    """
    m = v.shape[1]
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        cd = (
            compute_dtype if backend_supports_mixed_dot() else jnp.float32
        )
        # Round through compute_dtype for backend-independent numerics.
        v = v.astype(compute_dtype)
        phi_q = nn.elu(q.astype(jnp.float32)) + 1.0
        phi_k = nn.elu(k.astype(jnp.float32)) + 1.0
        if kv_mask is not None:
            phi_k = phi_k * kv_mask.astype(phi_k.dtype)[:, :, None, None]
        kv = jnp.einsum(
            "bmhd,bmhe->bhde",
            phi_k.astype(cd),
            (v.astype(jnp.float32) / m).astype(cd),
            preferred_element_type=jnp.float32,
        )
        z = 1.0 / (
            jnp.einsum("bnhd,bhd->bnh", phi_q, jnp.sum(phi_k, axis=1)) + eps
        )
        out = jnp.einsum(
            "bnhd,bhde->bnhe",
            phi_q.astype(cd),
            kv.astype(cd),
            preferred_element_type=jnp.float32,
        )
        return out * (z[..., None] * m)
    phi_q = nn.elu(q) + 1.0
    phi_k = nn.elu(k) + 1.0
    if kv_mask is not None:
        phi_k = phi_k * kv_mask.astype(phi_k.dtype)[:, :, None, None]
    v_scaled = v / m
    kv = jnp.einsum("bmhd,bmhe->bhde", phi_k, v_scaled)
    z = 1.0 / (
        jnp.einsum("bnhd,bhd->bnh", phi_q, jnp.sum(phi_k, axis=1)) + eps
    )
    out = jnp.einsum("bnhd,bhde,bnh->bnhe", phi_q, kv, z) * m
    return out


class MultiHeadAttention(nn.Module):
    """Q/K/V projections + attention + output merge.

    kind: 'softmax' (SuperGlue-class, superglue.py:103-119) or 'linear'
    (GATsSPG-class, GATs_SuperGlue.py:102-120). All projections carry bias,
    matching the torch Conv1d(k=1) layers.

    mesh + spmd (call arg) select the sequence-parallel attention kernels
    (parallel/sharded_attention.py) when the source point axis is sharded
    over the mesh's points axis:
    - spmd='kv':  keys/values sharded, queries replicated (2D<-3D cross);
    - spmd='qkv': queries AND keys/values sharded (3D-stream self-attn).
    With mesh=None (default) or spmd=None the attention is the plain local
    computation (GSPMD still partitions it automatically under jit when
    inputs carry shardings).
    """

    num_heads: int
    d_model: int
    kind: str = "softmax"
    mesh: Optional[jax.sharding.Mesh] = None
    dtype: jnp.dtype = jnp.float32
    # Mixed-precision attention internals: the big contraction einsums take
    # `dtype` (bf16) OPERANDS with fp32 MXU accumulation instead of full
    # fp32 operands; softmax / linear-attention normalizers stay fp32
    # either way. No effect when dtype is fp32 or on the sharded paths.
    mixed: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        source: jnp.ndarray,
        source_mask: Optional[jnp.ndarray] = None,
        spmd: Optional[str] = None,
    ) -> jnp.ndarray:
        head_dim = self.d_model // self.num_heads
        b, n, _ = x.shape
        m = source.shape[1]
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(x)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(source)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(source)
        # Head-major channel order [h*D + d]: the head split is a plain
        # reshape, no per-layer transpose. The torch checkpoints use
        # c = d*H + h (their view(B, D, H, N)); conversion permutes the
        # projection columns / merge rows once at load time
        # (convert._attn_propagation) so the math is identical while the
        # runtime avoids 3 relayouts per attention layer.
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, m, self.num_heads, head_dim)
        v = v.reshape(b, m, self.num_heads, head_dim)
        # Attention internals in fp32 (softmax / linear-attention
        # normalizers lose too much in bf16); the projections above and the
        # merge below carry the bf16 MXU benefit — they hold the FLOPs.
        # mixed=True additionally feeds the contraction einsums bf16
        # operands with fp32 accumulation (normalizers still fp32).
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
        cd = (
            self.dtype
            if self.mixed and jnp.dtype(self.dtype) != jnp.float32
            else None
        )
        if self.mesh is not None and spmd in ("kv", "qkv"):
            # Deferred import: parallel.sharded_attention imports NEG_INF
            # from this module.
            from onepose_tpu.parallel.sharded_attention import (
                ring_softmax_attention,
                sharded_linear_attention,
            )

            mask = (
                source_mask
                if source_mask is not None
                else jnp.ones(source.shape[:2], bool)
            )
            if self.kind == "softmax":
                out = ring_softmax_attention(
                    self.mesh, q, k, v, mask, q_sharded=(spmd == "qkv")
                )
            else:
                out = sharded_linear_attention(
                    self.mesh, q, k, v, mask,
                    v_length=m, q_sharded=(spmd == "qkv"),
                )
        elif self.kind == "softmax":
            out = masked_softmax_attention(
                q, k, v, source_mask, compute_dtype=cd
            )
        else:
            out = masked_linear_attention(
                q, k, v, source_mask, compute_dtype=cd
            )
        out = out.astype(self.dtype)
        out = out.reshape(b, n, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="merge")(out)


class AttentionalPropagation(nn.Module):
    """One message-passing step: attend to source, MLP on [x, message].

    The residual add happens in the caller (matching the reference GNN
    loops). norm selects the MLP normalization flavor: 'batch' for the
    SuperGlue-class GNN, 'instance' for the GATsSPG-class GNN.
    """

    d_model: int
    num_heads: int
    kind: str = "softmax"
    norm: str = "batch"
    mesh: Optional[jax.sharding.Mesh] = None
    dtype: jnp.dtype = jnp.float32
    mixed_attention: bool = False  # see MultiHeadAttention.mixed

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        source: jnp.ndarray,
        source_mask: Optional[jnp.ndarray] = None,
        x_mask: Optional[jnp.ndarray] = None,
        spmd: Optional[str] = None,
    ) -> jnp.ndarray:
        message = MultiHeadAttention(
            self.num_heads, self.d_model, kind=self.kind, mesh=self.mesh,
            dtype=self.dtype, mixed=self.mixed_attention, name="attn",
        )(x, source, source_mask, spmd=spmd)
        mlp = PointMLP(
            [2 * self.d_model, self.d_model],
            norm=self.norm,
            dtype=self.dtype,
            name="mlp",
        )
        return mlp(jnp.concatenate([x, message], axis=-1), x_mask)
