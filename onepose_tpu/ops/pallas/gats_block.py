"""Fused GATsSPG block kernel: [GATs, self, cross] in one Pallas call.

The matcher's XLA path runs 12 attention layers + 4 GATs layers as ~50
separate HBM-roundtripping ops per block — measured bandwidth/dispatch
bound (3.5-4 ms/batch-8 vs ~0.1 ms of MXU time). This kernel executes one
whole block per example with x2/x3/leaves resident in VMEM:

  x3 <- elu(GATs leaf attention)           (gats.py semantics, shipped cfg)
  x2 <- x2 + MLP([x2, selfattn(x2)])       (shared self weights)
  x3 <- x3 + MLP([x3, selfattn(x3)])
  x2, x3 <- x2 + MLP([x2, cross(x2<-x3)]), x3 + MLP([x3, cross(x3<-x2)])

Key trick — headless linear attention in lanes: with the head-major
channel order (models/common.py, c' = h*D + d), head h occupies lanes
[h*D, (h+1)*D). The per-head contraction kv_h = phi_k_h^T v_h becomes one
[C, C] matmul followed by a block-diagonal mask (off-head blocks zeroed),
and the per-head normalizer is two tiny segment-sum matmuls against a
[C, H] block-indicator. Everything stays MXU/VPU; no [N, H, D] reshapes.

The reference's v/m then *m value conditioning (GATs_SuperGlue.py:88-99)
cancels exactly and is skipped; accumulation is fp32 (preferred_element_
type) so the [C, C] kv entries (~O(M)) are safe.

Matmuls run with `dtype` inputs (bf16 in serving, fp32 in parity tests)
and fp32 accumulation; softmax/normalization statistics always fp32.
Inference-only: training uses the XLA path (block_fused=False).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onepose_tpu.ops.pallas import use_interpret_mode

NEG_INF = -1e9
EPS_ATTN = 1e-6
EPS_NORM = 1e-5


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _lrelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _block_kernel(
    x2_ref,  # [1, N2, C] fp32
    x3_ref,  # [1, N3, C] fp32
    leaf_ref,  # [1, N3, L, C] fp32
    m2_ref,  # [1, N2, 1] fp32 multiplicative (1 valid / 0 pad)
    m3_ref,  # [1, N3, 1] fp32
    leafadd_ref,  # [1, N3, L] fp32 additive (0 valid / NEG_INF pad)
    wa_ref,  # [2, C]  rows: (W @ a_leaf, W @ a_self)
    sw4_ref,  # [4, C, C] self (q, k, v, merge) kernels
    sb4_ref,  # [4, C] self biases
    sw0_ref,  # [2C, 2C] self MLP dense_0
    sb0_ref,  # [1, 2C]
    sw1_ref,  # [2C, C] self MLP dense_1
    sb1_ref,  # [1, C]
    cw4_ref, cb4_ref, cw0_ref, cb0_ref, cw1_ref, cb1_ref,  # cross set
    x2o_ref,  # [1, N2, C] fp32
    x3o_ref,  # [1, N3, C] fp32
    *,
    alpha: float,
    num_heads: int,
    dtype,
):
    C = x2_ref.shape[-1]
    D = C // num_heads
    x2 = x2_ref[0]
    x3 = x3_ref[0]
    leaves = leaf_ref[0]
    m2 = m2_ref[0]  # [N2, 1]
    m3 = m3_ref[0]  # [N3, 1]

    # --- GATs leaf attention (shipped config; gats.py:97-161). The
    # (X @ W) @ a contraction is collapsed to X @ (W @ a) outside.
    wa_leaf = wa_ref[0, :]
    wa_self = wa_ref[1, :]
    e_leaf = jnp.sum(
        leaves * wa_leaf[None, None, :], axis=-1
    )  # [N3, L]
    e3 = jnp.sum(x3 * wa_self[None, :], axis=-1, keepdims=True)  # [N3, 1]
    l_leaf = _lrelu(e_leaf + e3, alpha) + leafadd_ref[0]
    l_self = _lrelu(2.0 * e3, alpha)
    mx = jnp.maximum(jnp.max(l_leaf, axis=1, keepdims=True), l_self)
    p_leaf = jnp.exp(l_leaf - mx)
    p_self = jnp.exp(l_self - mx)
    denom = p_self + jnp.sum(p_leaf, axis=1, keepdims=True)
    x3 = _elu(
        (p_self / denom) * x3
        + jnp.sum((p_leaf / denom)[:, :, None] * leaves, axis=1)
    )  # [N3, C]

    # Head block-diagonal mask [C, C] and segment indicator [C, H].
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // D
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // D
    bd_mask = (lane == lane_t).astype(jnp.float32)
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, num_heads), 0) // D
        == jax.lax.broadcasted_iota(jnp.int32, (C, num_heads), 1)
    ).astype(jnp.float32)  # [C, H]

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def linear_attn(xq, xkv, mkv, w4, b4):
        """Masked multi-head linear attention + merge ([N, C] message)."""
        q = dot(xq, w4[0]) + b4[0][None, :]
        k = dot(xkv, w4[1]) + b4[1][None, :]
        v = dot(xkv, w4[2]) + b4[2][None, :]
        phi_q = _elu(q) + 1.0
        phi_k = (_elu(k) + 1.0) * mkv  # masked keys contribute nothing
        # All-head kv in one [C, C] contraction; off-head blocks masked.
        kv = jax.lax.dot_general(
            phi_k.astype(dtype), v.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * bd_mask  # [C, C]
        num = dot(phi_q, kv)  # [N, C]
        s_k = jnp.sum(phi_k, axis=0, keepdims=True)  # [1, C]
        z_h = dot(phi_q * s_k, seg)  # [N, H] per-head normalizer
        z_lane = dot(1.0 / (z_h + EPS_ATTN), seg.T)  # [N, C]
        out = num * z_lane
        return dot(out, w4[3]) + b4[3][None, :]

    def mlp(x, msg, w0, b0, w1, b1):
        """PointMLP([x, msg]): dense -> instance-norm -> relu -> dense.
        W0 split by input half avoids an in-kernel lane concat."""
        t = (
            dot(x, w0[:C, :]) + dot(msg, w0[C:, :]) + b0[0][None, :]
        )  # [N, 2C]
        mu = jnp.mean(t, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(t - mu), axis=0, keepdims=True)
        t = jnp.maximum((t - mu) * jax.lax.rsqrt(var + EPS_NORM), 0.0)
        return dot(t, w1) + b1[0][None, :]

    sw4, sb4 = sw4_ref[:], sb4_ref[:]
    # Self attention (shared weights across both streams).
    x2 = x2 + mlp(
        x2, linear_attn(x2, x2, m2, sw4, sb4),
        sw0_ref[:], sb0_ref[:], sw1_ref[:], sb1_ref[:],
    )
    x3 = x3 + mlp(
        x3, linear_attn(x3, x3, m3, sw4, sb4),
        sw0_ref[:], sb0_ref[:], sw1_ref[:], sb1_ref[:],
    )

    cw4, cb4 = cw4_ref[:], cb4_ref[:]
    d2 = mlp(
        x2, linear_attn(x2, x3, m3, cw4, cb4),
        cw0_ref[:], cb0_ref[:], cw1_ref[:], cb1_ref[:],
    )
    d3 = mlp(
        x3, linear_attn(x3, x2, m2, cw4, cb4),
        cw0_ref[:], cb0_ref[:], cw1_ref[:], cb1_ref[:],
    )
    x2o_ref[0] = x2 + d2
    x3o_ref[0] = x3 + d3


def fused_gats_block(
    x2: jnp.ndarray,  # [B, N2, C]
    x3: jnp.ndarray,  # [B, N3, C]
    leaves: jnp.ndarray,  # [B, N3, L, C]
    mask2,  # [B, N2] bool or None
    mask3,  # [B, N3] bool or None
    leaf_mask,  # [B, N3, L] bool or None
    params: dict,
    alpha: float = 0.2,
    num_heads: int = 4,
    dtype=jnp.bfloat16,
):
    """One [GATs, self, cross] matcher block, fused per example.

    params keys: wa [2, C]; self_w4 [4, C, C], self_b4 [4, C],
    self_w0 [2C, 2C], self_b0 [2C], self_w1 [2C, C], self_b1 [C];
    cross_* likewise. Returns (x2', x3') fp32.
    """
    B, N2, C = x2.shape
    N3 = x3.shape[1]
    L = leaves.shape[2]
    f32 = jnp.float32

    m2 = (
        jnp.ones((B, N2, 1), f32)
        if mask2 is None
        else mask2.astype(f32)[..., None]
    )
    m3 = (
        jnp.ones((B, N3, 1), f32)
        if mask3 is None
        else mask3.astype(f32)[..., None]
    )
    leafadd = (
        jnp.zeros((B, N3, L), f32)
        if leaf_mask is None
        else jnp.where(leaf_mask, 0.0, NEG_INF).astype(f32)
    )

    def bspec(shape, grid_dep=True):
        nd = len(shape)
        if grid_dep:
            return pl.BlockSpec(
                (1,) + shape,
                lambda b: (b,) + (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM
        )

    kernel = partial(
        _block_kernel, alpha=alpha, num_heads=num_heads, dtype=dtype
    )
    p = params
    x2o, x3o = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, N2, C), f32),
            jax.ShapeDtypeStruct((B, N3, C), f32),
        ),
        grid=(B,),
        in_specs=[
            bspec((N2, C)), bspec((N3, C)), bspec((N3, L, C)),
            bspec((N2, 1)), bspec((N3, 1)), bspec((N3, L)),
            bspec((2, C), False),
            bspec((4, C, C), False), bspec((4, C), False),
            bspec((2 * C, 2 * C), False), bspec((1, 2 * C), False),
            bspec((2 * C, C), False), bspec((1, C), False),
            bspec((4, C, C), False), bspec((4, C), False),
            bspec((2 * C, 2 * C), False), bspec((1, 2 * C), False),
            bspec((2 * C, C), False), bspec((1, C), False),
        ],
        out_specs=(bspec((N2, C)), bspec((N3, C))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=use_interpret_mode(),
    )(
        x2.astype(f32), x3.astype(f32), leaves.astype(f32),
        m2, m3, leafadd,
        p["wa"].astype(f32),
        p["self_w4"].astype(f32), p["self_b4"].astype(f32),
        p["self_w0"].astype(f32), p["self_b0"].astype(f32)[None, :],
        p["self_w1"].astype(f32), p["self_b1"].astype(f32)[None, :],
        p["cross_w4"].astype(f32), p["cross_b4"].astype(f32),
        p["cross_w0"].astype(f32), p["cross_b0"].astype(f32)[None, :],
        p["cross_w1"].astype(f32), p["cross_b1"].astype(f32)[None, :],
    )
    return x2o, x3o


def pack_block_params(gats_vars: dict, self_vars: dict, cross_vars: dict):
    """Flax variables of (GraphAttentionLayer, AttentionalPropagation x2)
    -> the packed param dict fused_gats_block expects."""
    C = gats_vars["W"].shape[0]
    W = gats_vars["W"]
    a = gats_vars["a"][:, 0]
    wa = jnp.stack([W @ a[:C], W @ a[C:]])

    def attn_pack(v):
        att = v["attn"]
        w4 = jnp.stack(
            [att[k]["kernel"] for k in ("proj_q", "proj_k", "proj_v", "merge")]
        )
        b4 = jnp.stack(
            [att[k]["bias"] for k in ("proj_q", "proj_k", "proj_v", "merge")]
        )
        mlp = v["mlp"]
        return {
            "w4": w4,
            "b4": b4,
            "w0": mlp["dense_0"]["kernel"],
            "b0": mlp["dense_0"]["bias"],
            "w1": mlp["dense_1"]["kernel"],
            "b1": mlp["dense_1"]["bias"],
        }

    s = attn_pack(self_vars)
    c = attn_pack(cross_vars)
    return {
        "wa": wa,
        **{f"self_{k}": v for k, v in s.items()},
        **{f"cross_{k}": v for k, v in c.items()},
    }
