"""Fused NMS kernel for the SuperPoint score map.

The reference NMS (src/models/extractors/SuperPoint/superpoint.py:47-68)
is two refinement rounds over five window-max passes. In XLA each pass
streams the [B, H, W] fp32 map through HBM (plus layout juggling after
the depth-to-space transpose feeding it) — measured ~1-2.4 ms/batch-8 of
the 8.9 ms dense forward at 512x512. Here one grid step runs ALL passes
for one image in VMEM (the 512x512 map is 1 MB): max-pools are 9-tap
shifted maxima — rows via sublane slices of a NEG-padded copy, columns
via lane rolls (lane slicing is not Mosaic-friendly; the rolled wrap
region only ever reads NEG pad lanes). Only the final NMS'd map touches
HBM.

The depth-to-space reshape itself must stay OUTSIDE the kernel: Mosaic
cannot split the lane dimension (vector<...x64xf32> -> ...x8x8xf32), and
the logits tensor is tiny anyway — the multi-pass NMS is the expensive
part.

Forward-only by design: SuperPoint is frozen during matcher training
(reference GATsSPG_lightning_model.py:21-22); a custom VJP recomputes
through the XLA reference if gradients are ever requested.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onepose_tpu.ops.pallas import use_interpret_mode

NEG = -1e30


def _roll(x, shift, axis):
    shift = shift % x.shape[axis]
    if use_interpret_mode():
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


def _max_pool(x, radius: int):
    """[H, Wp] window max over (2r+1)^2, separable; NEG pad lanes at the
    right edge make the roll wrap region suppression-neutral."""
    H = x.shape[0]
    xp = jnp.concatenate(
        [
            jnp.full((radius, x.shape[1]), NEG, x.dtype),
            x,
            jnp.full((radius, x.shape[1]), NEG, x.dtype),
        ],
        axis=0,
    )
    y = x
    for dy in range(2 * radius + 1):
        if dy == radius:
            continue
        y = jnp.maximum(y, xp[dy : dy + H])
    z = y
    for dx in range(1, radius + 1):
        z = jnp.maximum(z, _roll(y, -dx, 1))
        z = jnp.maximum(z, _roll(y, dx, 1))
    return z


def _kernel(s_ref, out_ref, *, radius: int, W: int, pad_w: int):
    H = s_ref.shape[1]
    s = s_ref[0].astype(jnp.float32)
    # NEG pad lanes so column rolls read suppression-neutral values; the
    # pad region must stay NEG (and out of the max masks) through every
    # pass or `NEG == max_pool(NEG)` would mark pad lanes as maxima and
    # bleed suppression into the last `radius` real columns.
    s = jnp.concatenate(
        [s, jnp.full((H, pad_w), NEG, s.dtype)], axis=1
    )
    col_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W + pad_w), 1) < W
    )
    zeros = jnp.zeros_like(s)

    mp = partial(_max_pool, radius=radius)
    max_mask = (s == mp(s)) & col_valid
    for _ in range(2):
        supp = mp(jnp.where(max_mask, 1.0, 0.0)) > 0
        ss = jnp.where(col_valid, jnp.where(supp, zeros, s), NEG)
        new_max = (ss == mp(ss)) & col_valid
        max_mask = max_mask | (new_max & (~supp))
    out_ref[0] = jnp.where(max_mask, s, zeros)[:, :W]


def simple_nms_pallas(
    scores: jnp.ndarray, nms_radius: int = 4
) -> jnp.ndarray:
    """VMEM-resident simple_nms: [B, H, W] -> [B, H, W], one image per
    grid step. Exact reference semantics (parity-tested)."""
    b, H, W = scores.shape
    pad_w = (-W) % 128 or 128
    # The wrap region of the column rolls must land entirely in NEG pad
    # lanes: with pad_w < nms_radius (W % 128 in {125..127}, or a large
    # radius) a roll by dx > pad_w would read real columns from the other
    # edge and corrupt suppression there. Widen by whole lane tiles.
    while pad_w < nms_radius:
        pad_w += 128
    kern = partial(_kernel, radius=nms_radius, W=W, pad_w=pad_w)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret_mode(),
    )(scores.astype(jnp.float32))


def _xla_reference(scores: jnp.ndarray, nms_radius: int) -> jnp.ndarray:
    from onepose_tpu.models.superpoint import simple_nms

    return simple_nms(scores, nms_radius)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def nms(scores: jnp.ndarray, nms_radius: int = 4) -> jnp.ndarray:
    """simple_nms via the VMEM kernel, with an XLA-recompute VJP."""
    return simple_nms_pallas(scores, nms_radius)


def _fwd(scores, nms_radius):
    return simple_nms_pallas(scores, nms_radius), scores


def _bwd(nms_radius, scores, g):
    _, vjp = jax.vjp(lambda s: _xla_reference(s, nms_radius), scores)
    return (vjp(g)[0],)


nms.defvjp(_fwd, _bwd)
