"""Fused GATs leaf-attention kernel.

The XLA path (onepose_tpu/models/gats.py) materializes Wh_leaf
[B, N3, L, C] to HBM (131 MB at production shapes) and re-reads both it
and the raw leaves for the attention aggregate. This kernel tiles the
3D-point axis and performs projection -> logits -> masked softmax ->
aggregate entirely in VMEM, so the leaf tensor is read exactly once and
nothing intermediate touches HBM.

Supports the shipped configuration (include_self=True, additional=False,
with_linear_transform=False, concat/elu=True — reference
configs/experiment/train_GATsSPG.yaml:58-61); callers fall back to the
XLA path otherwise. Gradients flow via a custom VJP whose backward pass
recomputes through the XLA reference implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onepose_tpu.ops.pallas import use_interpret_mode

NEG_INF = -1e9


def _gats_kernel(
    leaf_ref,  # [T, L, C]
    d3_ref,  # [T, C]
    maskadd_ref,  # [T, L] additive mask (0 valid / NEG_INF invalid)
    w_ref,  # [C, C]
    a_ref,  # [2, C]  rows: (a_leaf, a_self)
    out_ref,  # [T, C]
    *,
    alpha: float,
):
    t, L, c = leaf_ref.shape
    leaf = leaf_ref[:]
    d3 = d3_ref[:]
    W = w_ref[:]

    wh_leaf = jax.lax.dot_general(
        leaf.reshape(t * L, c),
        W,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T*L, C]
    wh3 = jnp.dot(d3, W, preferred_element_type=jnp.float32)  # [T, C]

    a_leaf = a_ref[0, :]  # [C]
    a_self = a_ref[1, :]
    e_leaf = jnp.sum(
        wh_leaf * a_leaf[None, :], axis=-1
    ).reshape(t, L)  # [T, L]
    e3 = jnp.sum(wh3 * a_self[None, :], axis=-1, keepdims=True)  # [T, 1]

    # Self column logit doubles e3 (reference GATs.py:117-122); leaky-ReLU
    # then masked softmax over (self + leaves). The self term is kept as a
    # separate [T, 1] lane (Mosaic cannot lower slices of a concatenated
    # (1+L)-wide array).
    def lrelu(x):
        return jnp.where(x >= 0, x, alpha * x)

    l_leaf = lrelu(e_leaf + e3) + maskadd_ref[:]  # [T, L]
    l_self = lrelu(2.0 * e3)  # [T, 1]
    m = jnp.maximum(jnp.max(l_leaf, axis=1, keepdims=True), l_self)
    p_leaf = jnp.exp(l_leaf - m)  # [T, L]
    p_self = jnp.exp(l_self - m)  # [T, 1]
    denom = p_self + jnp.sum(p_leaf, axis=1, keepdims=True)  # [T, 1]

    h = (p_self / denom) * d3 + jnp.sum(
        (p_leaf / denom)[:, :, None] * leaf, axis=1
    )  # [T, C]
    # elu (concat=True path, GATs.py:104-113)
    out_ref[:] = jnp.where(h > 0, h, jnp.exp(jnp.minimum(h, 0.0)) - 1.0)


def _gats_pallas_raw(
    leaf_desc: jnp.ndarray,  # [N3, L, C]
    desc3d: jnp.ndarray,  # [N3, C]
    mask_add: jnp.ndarray,  # [N3, L] additive
    W: jnp.ndarray,  # [C, C]
    a2: jnp.ndarray,  # [2, C]
    alpha: float,
    tile: int = 256,
) -> jnp.ndarray:
    n3, L, c = leaf_desc.shape
    pad = (-n3) % tile
    if pad:
        leaf_desc = jnp.pad(leaf_desc, ((0, pad), (0, 0), (0, 0)))
        desc3d = jnp.pad(desc3d, ((0, pad), (0, 0)))
        mask_add = jnp.pad(mask_add, ((0, pad), (0, 0)))
    n3p = n3 + pad

    out = pl.pallas_call(
        partial(_gats_kernel, alpha=alpha),
        out_shape=jax.ShapeDtypeStruct((n3p, c), jnp.float32),
        grid=(n3p // tile,),
        in_specs=[
            pl.BlockSpec(
                (tile, L, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=use_interpret_mode(),
    )(leaf_desc, desc3d, mask_add, W, a2)
    return out[:n3]


def gats_reference_xla(leaf_desc, desc3d, leaf_mask, W, a2, alpha):
    """Pure-XLA reference of the same computation (shipped GATs config),
    used for the backward pass and parity tests."""
    wh_leaf = leaf_desc @ W
    wh3 = desc3d @ W
    e_leaf = jnp.einsum("...lc,c->...l", wh_leaf, a2[0])
    e3 = jnp.einsum("...c,c->...", wh3, a2[1])
    logits = jnp.concatenate([e3[..., None], e_leaf], axis=-1) + e3[..., None]
    logits = jnp.where(logits >= 0, logits, alpha * logits)
    if leaf_mask is not None:
        full = jnp.concatenate(
            [jnp.ones_like(leaf_mask[..., :1]), leaf_mask], axis=-1
        )
        logits = jnp.where(full, logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    values = jnp.concatenate([desc3d[..., None, :], leaf_desc], axis=-2)
    h = jnp.einsum("...l,...lc->...c", attn, values)
    return jax.nn.elu(h)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def gats_leaf_attention(leaf_desc, desc3d, leaf_mask, W, a2, alpha=0.2):
    """Fused leaf attention for [B, N3, L, C] leaves (shipped GATs config).

    leaf_mask: [B, N3, L] bool or None. Returns [B, N3, C].
    """
    if leaf_mask is None:
        mask_add = jnp.zeros(leaf_desc.shape[:-1], jnp.float32)
    else:
        mask_add = jnp.where(leaf_mask, 0.0, NEG_INF).astype(jnp.float32)
    return jax.vmap(
        lambda l, d, m: _gats_pallas_raw(l, d, m, W, a2, alpha)
    )(leaf_desc, desc3d, mask_add)


def _fwd(leaf_desc, desc3d, leaf_mask, W, a2, alpha):
    out = gats_leaf_attention(leaf_desc, desc3d, leaf_mask, W, a2, alpha)
    return out, (leaf_desc, desc3d, leaf_mask, W, a2)


def _bwd(alpha, res, g):
    leaf_desc, desc3d, leaf_mask, W, a2 = res
    _, vjp = jax.vjp(
        lambda l, d, w, a: gats_reference_xla(l, d, leaf_mask, w, a, alpha),
        leaf_desc,
        desc3d,
        W,
        a2,
    )
    dl, dd, dW, da = vjp(g)
    return dl, dd, None, dW, da


gats_leaf_attention.defvjp(_fwd, _bwd)
