"""Fused conv3x3 -> relu -> conv3x3 -> relu [-> maxpool2x2] Pallas stage.

The SuperPoint encoder is HBM-bound: at 512x512 the 64-channel activations
between conv1a/conv1b/pool are ~270 MB/batch-8 each and XLA streams every
one through HBM (measured 9.7 ms/batch-8 dense forward; bf16 compute alone
buys only 1.13x). This kernel runs a whole VGG stage per ROW BAND in VMEM:
both convolutions run as 9-tap accumulated matmuls on the MXU and only the
stage output returns to HBM — the inter-conv activation never leaves the
chip.

Halo handling: Mosaic's DMA path requires (8, 128)-aligned slices in the
tiled dims, which overlapping halo windows violate. Instead the input is
passed TWICE with block-aligned BlockSpecs — an exact th-row main band at
block index i and a 4-row halo band at block index (i+1)*th/4 — and the
kernel concatenates them, so the built-in (double-buffered) pipeline does
all copies. The single-channel image stage keeps columns on the lane dim
and realizes its taps with pltpu.roll (lane slicing is not allowed).

Matmul taps compute in bf16 with fp32 accumulation; biases/relu/pool in
fp32. Forward-only by design (SuperPoint is frozen in this framework's
training recipe, as in the reference GATsSPG_lightning_model.py:21-22); a
custom VJP recomputes through the XLA reference if gradients are ever
requested.

STATUS: FROZEN (round-3 go/no-go). Measured 14.6 ms vs XLA's 10.0 for
the full dense forward; the roofline audit (docs/PERFORMANCE.md) bounds
the best-case win of a perfect fusion kernel at <25% end-to-end, and the
remaining gap is Mosaic layout work (fp32 roll round-trip, per-row
rank-3 dot) with uncertain payoff. Kept in-tree as opt-in infrastructure;
no further optimization planned.

Reference architecture: src/models/extractors/SuperPoint/superpoint.py:
119-156 (conv1a..conv4b, three 2x2 max-pools).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onepose_tpu.ops.pallas import use_interpret_mode


def _roll(x, shift, axis):
    """Circular shift; pltpu.roll wants non-negative shifts (callers never
    read the wrapped region)."""
    shift = shift % x.shape[axis]
    if use_interpret_mode():
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


def _conv_block(x, w_ref, b_ref, out_h, out_w, dtype):
    """Valid 3x3 conv on [rows, cols, cin] -> [out_h, out_w, cout], relu.

    Tap-BATCHED im2col: the three ROW taps are concatenated on the channel
    (lane) axis — row slices live on the untiled dim-0, so all operands
    share one canonical layout (Mosaic rejects lane-concat of views with
    mismatched sublane/lane offsets, which is what rolled/sliced COLUMN
    taps produce: "result/input offset mismatch on non-concat dimension").
    The three column taps are then realized by rolling the patch tensor
    and feeding the MXU directly — K = 3*cin = 192 per matmul, three
    matmuls accumulated in fp32. The round-1 revision ran 9 separate K=cin
    taps through a fori_loop/switch, which serialized 9 quarter-
    utilization matmuls and lost 12x to XLA's conv emitters."""
    cin = x.shape[-1]
    cout = w_ref.shape[-1]
    w = w_ref[:].astype(dtype)  # [3, 3, cin, cout]
    x3 = jnp.concatenate(
        [x[dy : dy + out_h] for dy in range(3)], axis=-1
    ).astype(jnp.float32)  # [out_h, cols, 3*cin] (dy-major lane order)
    # w reordered to match: lanes are [dy0|dy1|dy2] x cin.
    acc = None
    for dx in range(3):
        wk = w[:, dx].reshape(3 * cin, cout)  # [3(dy)*cin, cout]
        part = jax.lax.dot_general(
            _roll(x3, -dx, 1)[:, :out_w, :].astype(dtype),
            wk,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return jnp.maximum(acc + b_ref[0][None, None, :], 0.0).astype(dtype)


def _edge_mask(i, th, H, W, rows, cols):
    """fp32 mask zeroing the conv1 halo ring that falls outside the image
    (conv2's SAME padding needs true zeros there, not relu(conv1(0)+b))."""
    gy = i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) - 1
    return (
        (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
    ).astype(jnp.float32)


def _stage_kernel_multi(
    main_ref,  # [1, th, W+4, Cin]
    halo_ref,  # [1, 4, W+4, Cin]
    w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref,  # [1, th(/2), W(/2), C2]
    *, th: int, H: int, W: int, pool: bool, dtype,
):
    i = pl.program_id(1)
    x = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0).astype(dtype)
    h1, w1n = th + 2, W + 2
    y = _conv_block(x, w1_ref, b1_ref, h1, w1n, dtype)
    y = (y * _edge_mask(i, th, H, W, h1, w1n)[..., None].astype(y.dtype)
         ).astype(dtype)
    z = _conv_block(y, w2_ref, b2_ref, th, W, dtype)
    c2 = z.shape[-1]
    if pool:
        z = jnp.max(z.reshape(th // 2, 2, W // 2, 2, c2), axis=(1, 3))
    out_ref[0] = z.astype(out_ref.dtype)


def _stage_kernel_image(
    main_ref,  # [1, th, Wp] single-channel image rows
    halo_ref,  # [1, 8, Wp]
    w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref,
    *, th: int, H: int, W: int, pool: bool, dtype,
):
    i = pl.program_id(1)
    x2d = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)  # [th+8, Wp]
    c1 = w1_ref.shape[-1]

    # Row taps via dim-0 slices (untiled dim: always layout-canonical, so
    # the lane-dim concat is legal), column taps via roll feeding the MXU
    # directly — the same structure as _conv_block. K = 3 is tiny here,
    # but so are this stage's FLOPs.
    rows1 = th + 6
    x3 = jnp.concatenate(
        [x2d[dy : dy + rows1][:, :, None] for dy in range(3)], axis=-1
    ).astype(jnp.float32)  # [rows1, Wp, 3]
    acc3 = None
    for dx in range(3):
        wk = w1_ref[:, dx, 0, :].astype(dtype)  # [3(dy), c1]
        part = jax.lax.dot_general(
            _roll(x3, -dx, 1).astype(dtype), wk,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc3 = part if acc3 is None else acc3 + part
    y = jnp.maximum(acc3 + b1_ref[0][None, None, :], 0.0)
    y = (
        y * _edge_mask(i, th, H, W, y.shape[0], y.shape[1])[..., None]
    ).astype(dtype)

    z = _conv_block(y, w2_ref, b2_ref, th, W, dtype)
    c2 = z.shape[-1]
    if pool:
        z = jnp.max(z.reshape(th // 2, 2, W // 2, 2, c2), axis=(1, 3))
    out_ref[0] = z.astype(out_ref.dtype)


def _vgg_stage_pallas(
    x: jnp.ndarray,  # [B, H, W, Cin]
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    pool: bool,
    tile: int = 16,
    dtype=jnp.bfloat16,
    io_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    B, H, W, cin = x.shape
    c1 = w1.shape[-1]
    c2 = w2.shape[-1]
    th = min(tile, H)
    assert H % th == 0 and th % 8 == 0, (H, th)
    single = cin == 1
    oh, ow = (H // 2, W // 2) if pool else (H, W)
    to_h = th // 2 if pool else th
    grid = (B, H // th)

    if single:
        # Width padded to a lane multiple; rows: 2-px top halo, bottom
        # padded so the final 8-row halo block exists.
        wp = -(-(W + 4) // 128) * 128
        hp = H + 2 + 8
        hp = -(-hp // 8) * 8
        xp = jnp.zeros((B, hp, wp), x.dtype)
        xp = jax.lax.dynamic_update_slice(xp, x[..., 0], (0, 2, 2))
        kernel = partial(
            _stage_kernel_image, th=th, H=H, W=W, pool=pool, dtype=dtype
        )
        main_spec = pl.BlockSpec(
            (1, th, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec(
            (1, 8, wp),
            lambda b, i: (b, (i + 1) * (th // 8), 0),
            memory_space=pltpu.VMEM,
        )
        w_specs = [
            pl.BlockSpec(
                (3, 3, 1, c1), lambda b, i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c1), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, c1, c2), lambda b, i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c2), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
    else:
        assert th % 4 == 0
        xp = jnp.pad(x.astype(io_dtype), ((0, 0), (2, 2), (2, 2), (0, 0)))
        kernel = partial(
            _stage_kernel_multi, th=th, H=H, W=W, pool=pool, dtype=dtype
        )
        main_spec = pl.BlockSpec(
            (1, th, W + 4, cin),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        halo_spec = pl.BlockSpec(
            (1, 4, W + 4, cin),
            lambda b, i: (b, (i + 1) * (th // 4), 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_specs = [
            pl.BlockSpec(
                (3, 3, cin, c1), lambda b, i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c1), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, c1, c2), lambda b, i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c2), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (B, oh, ow, c2), jnp.float32 if single else io_dtype
        ),
        grid=grid,
        in_specs=[main_spec, halo_spec] + w_specs,
        out_specs=pl.BlockSpec(
            (1, to_h, ow, c2),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret_mode(),
    )(xp, xp, w1, b1[None, :], w2, b2[None, :])


def vgg_stage_reference_xla(x, w1, b1, w2, b2, pool):
    """Plain XLA version (used for gradients and parity tests)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w1.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=dn
    )
    y = jnp.maximum(y + b1, 0.0)
    z = jax.lax.conv_general_dilated(
        y, w2, (1, 1), "SAME", dimension_numbers=dn
    )
    z = jnp.maximum(z + b2, 0.0)
    if pool:
        B, H, W, C = z.shape
        z = jnp.max(z.reshape(B, H // 2, 2, W // 2, 2, C), axis=(2, 4))
    return z


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def vgg_stage(x, w1, b1, w2, b2, pool=True, tile=16, dtype=jnp.bfloat16):
    """Fused VGG stage; see module docstring. x: [B, H, W, Cin]; the
    multi-channel path reads/writes bf16 activations in HBM."""
    return _vgg_stage_pallas(x, w1, b1, w2, b2, pool, tile, dtype)


def _fwd(x, w1, b1, w2, b2, pool, tile, dtype):
    return vgg_stage(x, w1, b1, w2, b2, pool, tile, dtype), (
        x, w1, b1, w2, b2,
    )


def _bwd(pool, tile, dtype, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: vgg_stage_reference_xla(*a, pool), x, w1, b1, w2, b2
    )
    return vjp(g.astype(jnp.float32))


vgg_stage.defvjp(_fwd, _bwd)
