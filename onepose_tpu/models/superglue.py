"""SuperGlue-class 2D-2D matcher with masked Sinkhorn optimal transport.

Behavioral spec from the reference
(src/models/matchers/SuperGlue/superglue.py:219-327):
- Keypoint positions normalized by image size (center, 0.7 * max-dim scale).
- Keypoint MLP encoder [3 -> 32 -> 64 -> 128 -> 256 -> 256] (BatchNorm
  between layers) added to the visual descriptors.
- 9 x (self, cross) residual softmax-attention message passing, 4 heads.
- Final 1x1 projection; scores = <d0, d1> / sqrt(256).
- Log-space Sinkhorn optimal transport with a learned dustbin score
  (100 iterations), then mutual-max + threshold (0.2) extraction.

TPU-first differences: static shapes + masks everywhere. Padded keypoints
get zero marginal mass in the transport problem (they must end in the
dustbin), and masked attention keeps them out of message passing. The
Sinkhorn loop is a lax.scan — one fused on-device loop instead of 100
Python-level kernel launches.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from onepose_tpu.models.common import (
    AttentionalPropagation,
    PointMLP,
    NEG_INF,
)


def normalize_keypoints(
    kpts: jnp.ndarray, image_hw: tuple[int, int] | jnp.ndarray
) -> jnp.ndarray:
    """Center + scale keypoints by image size (superglue.py:67-84).

    kpts: [B, N, 2] (x, y); image_hw: (h, w) static tuple or [B, 2] array.
    """
    if isinstance(image_hw, tuple):
        h, w = image_hw
        size = jnp.array([w, h], kpts.dtype)[None, None, :]
    else:
        size = jnp.flip(image_hw.astype(kpts.dtype), axis=-1)[:, None, :]
    center = size / 2.0
    scaling = jnp.max(size, axis=-1, keepdims=True) * 0.7
    return (kpts - center) / scaling


def log_sinkhorn(
    scores: jnp.ndarray,
    bin_score: jnp.ndarray,
    mask0: Optional[jnp.ndarray],
    mask1: Optional[jnp.ndarray],
    iters: int,
    use_pallas: Optional[bool] = None,
    stream_bf16: bool = False,
) -> jnp.ndarray:
    """Masked log-space Sinkhorn with dustbin row/column.

    scores: [B, M, N]; returns the [B, M+1, N+1] log-assignment matrix
    scaled by (m + n) (matching superglue.py:181-210). Masked keypoints get
    -inf marginal mass: they cannot carry transport; real points each carry
    one unit; each dustbin absorbs the opposite side's count.

    use_pallas: run the iteration loop as a Pallas kernel (default: on TPU
    backends). Problems that fit the VMEM budget pin the whole coupling
    on-chip (ops/pallas/sinkhorn.py — measured end-to-end win). Larger
    problems (e.g. the reference's 4096-keypoint SfM budget,
    src/sfm/extract_features.py:8-26) default to the XLA scan: measured
    on chip (docs/PERFORMANCE.md, scan method), XLA already fuses both
    logsumexp updates into ONE coupling sweep per iteration (7.05 ms at
    4097^2 x 100 iters ~= the single-sweep bandwidth bound), so the
    row-blocked streaming kernel (ops/pallas/sinkhorn_stream.py) is
    neutral in context — it stays opt-in per the repo kernel policy:
    explicit use_pallas=True streams above the VMEM budget, and
    stream_bf16=True additionally stores the streamed coupling in
    bfloat16 (half the HBM bytes, fp32 arithmetic; bare-kernel 6.60 vs
    7.05 ms). The scan path also serves non-TPU backends, parity tests,
    and gradients.
    """
    b, m, n = scores.shape
    dtype = scores.dtype
    if mask0 is None:
        mask0 = jnp.ones((b, m), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, n), bool)
    ms = jnp.sum(mask0, axis=-1).astype(dtype)  # [B]
    ns = jnp.sum(mask1, axis=-1).astype(dtype)

    # Pad with the learned dustbin score; invalid pairs get NEG_INF.
    pair_valid = mask0[:, :, None] & mask1[:, None, :]
    scores = jnp.where(pair_valid, scores, NEG_INF)
    bins0 = jnp.where(mask0, bin_score, NEG_INF)[:, :, None]  # [B, M, 1]
    bins1 = jnp.where(mask1, bin_score, NEG_INF)[:, None, :]  # [B, 1, N]
    alpha = jnp.full((b, 1, 1), bin_score, dtype)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=2),
            jnp.concatenate([bins1, alpha], axis=2),
        ],
        axis=1,
    )  # [B, M+1, N+1]

    # Clamp for the fully-degenerate case (no valid keypoints on EITHER
    # side): ms + ns = 0 would give norm = inf and poison every slot with
    # NaN. With the clamp the transport problem reduces to the
    # dustbin-dustbin cell and all outputs stay finite (matches all -1).
    norm = -jnp.log(jnp.maximum(ms + ns, 1.0))  # [B]
    log_mu = jnp.concatenate(
        [
            jnp.where(mask0, norm[:, None], NEG_INF),
            (jnp.log(jnp.maximum(ns, 1e-9)) + norm)[:, None],
        ],
        axis=1,
    )  # [B, M+1]
    log_nu = jnp.concatenate(
        [
            jnp.where(mask1, norm[:, None], NEG_INF),
            (jnp.log(jnp.maximum(ms, 1e-9)) + norm)[:, None],
        ],
        axis=1,
    )  # [B, N+1]

    auto = use_pallas is None
    if auto:
        use_pallas = jax.default_backend() == "tpu"
    use_stream = False
    if use_pallas:
        from onepose_tpu.ops.pallas.sinkhorn import fits_vmem

        # VMEM guard: the resident kernel pins the whole [M+1, N+1]
        # coupling in VMEM. Above the budget the default (auto) path is
        # the XLA scan — measured at the single-sweep bound already; the
        # streaming kernel runs only on explicit request (use_pallas=True
        # or stream_bf16=True). See the docstring + docs/PERFORMANCE.md.
        if not fits_vmem(couplings.shape[1], couplings.shape[2]):
            use_stream = (not auto) or stream_bf16
            use_pallas = use_stream
    if use_pallas and use_stream:
        from onepose_tpu.ops.pallas.sinkhorn_stream import (
            sinkhorn_potentials_streamed,
        )

        u, v = sinkhorn_potentials_streamed(
            couplings, log_mu, log_nu, iters,
            coupling_dtype=jnp.bfloat16 if stream_bf16 else None,
        )
    elif use_pallas:
        from onepose_tpu.ops.pallas.sinkhorn import sinkhorn_potentials

        u, v = sinkhorn_potentials(couplings, log_mu, log_nu, iters)
    else:

        def body(carry, _):
            u, v = carry
            u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
            v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
            return (u, v), None

        u0 = jnp.zeros_like(log_mu)
        v0 = jnp.zeros_like(log_nu)
        (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    z = couplings + u[:, :, None] + v[:, None, :]
    return z - norm[:, None, None]


class SuperGlue(nn.Module):
    d_model: int = 256
    num_heads: int = 4
    num_layers: int = 9  # (self, cross) pairs
    keypoint_encoder: tuple = (32, 64, 128, 256)
    sinkhorn_iterations: int = 100
    sinkhorn_use_pallas: Optional[bool] = None  # None = auto (TPU backend)
    # bf16-stored coupling for the streaming (above-VMEM) Sinkhorn path.
    sinkhorn_stream_bf16: bool = False
    match_threshold: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        kpts0: jnp.ndarray,
        kpts1: jnp.ndarray,
        desc0: jnp.ndarray,
        desc1: jnp.ndarray,
        scores0: jnp.ndarray,
        scores1: jnp.ndarray,
        image_hw0,
        image_hw1,
        mask0: Optional[jnp.ndarray] = None,
        mask1: Optional[jnp.ndarray] = None,
    ) -> dict:
        """Match two keypoint sets.

        kpts*: [B, N, 2] (x, y) pixels; desc*: [B, N, C]; scores*: [B, N];
        image_hw*: (h, w); mask*: [B, N] validity.
        """
        x0 = desc0.astype(self.dtype)
        x1 = desc1.astype(self.dtype)
        k0 = normalize_keypoints(kpts0.astype(self.dtype), image_hw0)
        k1 = normalize_keypoints(kpts1.astype(self.dtype), image_hw1)

        kenc = PointMLP(
            list(self.keypoint_encoder) + [self.d_model],
            norm="batch",
            dtype=self.dtype,
            name="kenc",
        )
        inp0 = jnp.concatenate([k0, scores0[..., None].astype(self.dtype)], -1)
        inp1 = jnp.concatenate([k1, scores1[..., None].astype(self.dtype)], -1)
        x0 = x0 + kenc(inp0)
        x1 = x1 + kenc(inp1)

        for i in range(self.num_layers):
            # One layer serves both images (shared weights), matching the
            # reference GNN loop (superglue.py:162-178).
            self_layer = AttentionalPropagation(
                self.d_model, self.num_heads, kind="softmax", norm="batch",
                dtype=self.dtype, name=f"self_{i}",
            )
            x0 = x0 + self_layer(x0, x0, mask0, mask0)
            x1 = x1 + self_layer(x1, x1, mask1, mask1)
            cross_layer = AttentionalPropagation(
                self.d_model, self.num_heads, kind="softmax", norm="batch",
                dtype=self.dtype, name=f"cross_{i}",
            )
            delta0 = cross_layer(x0, x1, mask1, mask0)
            delta1 = cross_layer(x1, x0, mask0, mask1)
            x0, x1 = x0 + delta0, x1 + delta1

        proj = nn.Dense(self.d_model, dtype=self.dtype, name="final_proj")
        m0 = proj(x0)
        m1 = proj(x1)
        sim = jnp.einsum("bnc,bmc->bnm", m0, m1) / jnp.sqrt(
            jnp.asarray(self.d_model, self.dtype)
        )

        bin_score = self.param(
            "bin_score", nn.initializers.ones, ()
        ).astype(self.dtype)
        z = log_sinkhorn(
            sim, bin_score, mask0, mask1, self.sinkhorn_iterations,
            use_pallas=self.sinkhorn_use_pallas,
            stream_bf16=self.sinkhorn_stream_bf16,
        )

        return extract_matches(
            z, self.match_threshold, mask0=mask0, mask1=mask1
        )


def extract_matches(
    z: jnp.ndarray,
    threshold: float,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> dict:
    """Mutual-max + threshold extraction from the [B, M+1, N+1] log-OT
    matrix (superglue.py:301-320). Returns matches with -1 = unmatched."""
    inner = z[:, :-1, :-1]
    b, m, n = inner.shape
    idx0 = jnp.argmax(inner, axis=2)
    idx1 = jnp.argmax(inner, axis=1)
    max0 = jnp.max(inner, axis=2)
    mutual0 = jnp.arange(m)[None, :] == jnp.take_along_axis(idx1, idx0, 1)
    mutual1 = jnp.arange(n)[None, :] == jnp.take_along_axis(idx0, idx1, 1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(
        mutual1, jnp.take_along_axis(mscores0, idx1, axis=1), 0.0
    )
    valid0 = mutual0 & (mscores0 > threshold)
    if mask0 is not None:
        valid0 &= mask0
    valid1 = mutual1 & jnp.take_along_axis(valid0, idx1, axis=1)
    if mask1 is not None:
        valid1 &= mask1
    return {
        "matches0": jnp.where(valid0, idx0, -1),
        "matches1": jnp.where(valid1, idx1, -1),
        "matching_scores0": mscores0,
        "matching_scores1": mscores1,
        "valid0": valid0,
        "valid1": valid1,
        "log_assignment": z,
    }
