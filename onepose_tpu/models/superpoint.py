"""SuperPoint-class keypoint detector + descriptor, TPU-native.

Behavioral spec from the reference extractor
(src/models/extractors/SuperPoint/superpoint.py:119-244): VGG-style shared
encoder (64, 64, 128, 128, 256 channels, three 2x2 max-pools -> stride 8),
a 65-channel detector head (softmax, dustbin dropped, 8x8 depth-to-space),
iterative max-pool NMS (superpoint.py:47-68), border removal, top-k
selection, and a 256-d descriptor head bilinearly sampled at keypoints with
align_corners=True semantics (superpoint.py:95-113) and L2-normalized.

TPU-first differences:
- NHWC layout; the whole forward is one jit region with static shapes.
- Keypoint selection returns FIXED-SIZE [B, K] arrays plus a validity mask
  (the reference returns ragged per-image lists, forcing host sync).
- NMS is expressed as reduce_window max-pooling, fusing into the XLA graph.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def simple_nms(scores: jnp.ndarray, nms_radius: int) -> jnp.ndarray:
    """Iterative max-pool non-maximum suppression on [B, H, W] score maps.

    Exact re-statement of the reference algorithm (superpoint.py:47-68):
    two refinement rounds where suppressed neighborhoods are zeroed and
    local maxima are recomputed.
    """
    assert nms_radius >= 0
    win = 2 * nms_radius + 1

    def max_pool(x):
        # Separable max: two 1D reduce_windows (2*win compares/px) instead
        # of one 2D window (win^2) — identical result, ~4.5x less VPU work
        # at radius 4.
        r = nms_radius
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, win, 1),
            window_strides=(1, 1, 1),
            padding=[(0, 0), (r, r), (0, 0)],
        )
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, win),
            window_strides=(1, 1, 1),
            padding=[(0, 0), (0, 0), (r, r)],
        )

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = (
            max_pool(max_mask.astype(scores.dtype)) > 0
        )
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


class SuperPoint(nn.Module):
    """Dense forward: grayscale [B, H, W, 1] -> (score map, descriptor map).

    H and W must be multiples of 8.
    """

    descriptor_dim: int = 256
    nms_radius: int = 4
    use_pallas: Optional[bool] = None  # fused VGG stages (frozen; opt-in)
    # VMEM NMS kernel (ops/pallas/score_path): parity-exact and 1.4x in
    # isolation, but end-to-end NEUTRAL vs the d2s-barrier XLA path
    # (605 vs 606 fps) — the custom call costs the same scheduling
    # barrier the XLA path pays explicitly. Opt-in per kernel policy
    # (docs/PERFORMANCE.md).
    nms_pallas: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> dict:
        conv = partial(
            nn.Conv, kernel_size=(3, 3), strides=(1, 1), padding="SAME",
            dtype=self.dtype,
        )
        pool = partial(
            nn.max_pool, window_shape=(2, 2), strides=(2, 2)
        )
        x = image.astype(self.dtype)

        # Fused Pallas VGG stages are opt-in only: measured 12x SLOWER
        # than XLA's conv emitters on v5e (the per-tap fori/switch
        # serialization starves the MXU; see docs/PERFORMANCE.md). Kept as
        # tested infrastructure for future tap-batched revisions.
        use_pallas = bool(self.use_pallas)

        if use_pallas:
            # Fused conv-conv-pool stages in VMEM (ops/pallas/vgg_stage):
            # the inter-conv activations (270 MB/batch-8 at 512x512x64)
            # never touch HBM. The Conv modules are still declared (on a
            # tiny dummy) so the parameter pytree paths stay identical to
            # the XLA branch — converted checkpoints load either way.
            from onepose_tpu.ops.pallas.vgg_stage import vgg_stage

            def conv_params(name, feats, cin):
                m = conv(features=feats, name=name)
                _ = m(jnp.zeros((1, 8, 8, cin), self.dtype))
                return (
                    m.variables["params"]["kernel"],
                    m.variables["params"]["bias"],
                )

            stages = [
                ("conv1a", "conv1b", 64, 64, True),
                ("conv2a", "conv2b", 64, 64, True),
                ("conv3a", "conv3b", 128, 128, True),
                ("conv4a", "conv4b", 128, 128, False),
            ]
            x = x.astype(jnp.float32)
            for na, nb, fa, fb, do_pool in stages:
                cin = x.shape[-1]
                wa, ba = conv_params(na, fa, cin)
                wb, bb = conv_params(nb, fb, fa)
                x = vgg_stage(x, wa, ba, wb, bb, do_pool)
        else:
            x = nn.relu(conv(features=64, name="conv1a")(x))
            x = nn.relu(conv(features=64, name="conv1b")(x))
            x = pool(x)
            x = nn.relu(conv(features=64, name="conv2a")(x))
            x = nn.relu(conv(features=64, name="conv2b")(x))
            x = pool(x)
            x = nn.relu(conv(features=128, name="conv3a")(x))
            x = nn.relu(conv(features=128, name="conv3b")(x))
            x = pool(x)
            x = nn.relu(conv(features=128, name="conv4a")(x))
            x = nn.relu(conv(features=128, name="conv4b")(x))

        # Detector head: 65 logits per 8x8 cell; softmax; drop the dustbin;
        # depth-to-space back to full resolution.
        cpa = nn.relu(conv(features=256, name="convPa")(x))
        logits = nn.Conv(
            features=65, kernel_size=(1, 1), dtype=self.dtype, name="convPb"
        )(cpa)
        # Head outputs are promoted to fp32: with dtype=bfloat16 the conv
        # stack rides the MXU at double rate, while score ordering (NMS /
        # top-k) and descriptor normalization keep full precision.
        probs = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        )[..., :-1]  # [B, h, w, 64]
        b, h, w, _ = probs.shape
        scores = probs.reshape(b, h, w, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
        use_nms_kernel = bool(self.nms_pallas)
        if use_nms_kernel:
            # VMEM-resident NMS (ops/pallas/score_path): all five max-pool
            # passes for an image run on one VMEM-held map; parity-exact.
            # The custom call also materializes the d2s result, which the
            # XLA path needs an explicit barrier for (below).
            from onepose_tpu.ops.pallas.score_path import nms as nms_kernel

            scores = nms_kernel(scores, self.nms_radius)
        else:
            # Materialize the depth-to-space result before NMS: fusing the
            # transposed-layout d2s into the reduce_window chain makes XLA
            # re-derive the transpose per NMS pass — the barrier cuts the
            # dense forward 8.88 -> 7.30 ms/batch-8 on v5e (measured,
            # scripts/bench_sp_variants.py; bit-identical output).
            scores = jax.lax.optimization_barrier(scores)
            scores = simple_nms(scores, self.nms_radius)

        # Descriptor head: 256-d dense map at stride 8, L2-normalized.
        cda = nn.relu(conv(features=256, name="convDa")(x))
        desc = nn.Conv(
            features=self.descriptor_dim, kernel_size=(1, 1),
            dtype=self.dtype, name="convDb",
        )(cda)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)

        return {"score_map": scores, "descriptor_map": desc}


def sample_descriptors(
    keypoints: jnp.ndarray,
    descriptor_map: jnp.ndarray,
    stride: int = 8,
) -> jnp.ndarray:
    """Bilinear descriptor sampling at keypoint pixel locations.

    keypoints: [B, K, 2] (x, y) full-resolution pixels.
    descriptor_map: [B, h, w, C] stride-8 dense descriptors.
    Matches torch grid_sample(align_corners=True) through the reference's
    normalization (superpoint.py:95-113), then L2-normalizes.
    """
    b, hf, wf, c = descriptor_map.shape
    s = float(stride)
    kp = keypoints.astype(descriptor_map.dtype)
    kp = kp - s / 2 + 0.5
    denom = jnp.array(
        [wf * s - s / 2 - 0.5, hf * s - s / 2 - 0.5],
        descriptor_map.dtype,
    )
    grid = kp / denom * 2.0 - 1.0  # [-1, 1]
    # align_corners=True: g -> (g + 1) / 2 * (size - 1)
    fx = (grid[..., 0] + 1.0) * 0.5 * (wf - 1)
    fy = (grid[..., 1] + 1.0) * 0.5 * (hf - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(dmap, yi, xi):
        valid = (xi >= 0) & (xi < wf) & (yi >= 0) & (yi < hf)
        v = dmap[jnp.clip(yi, 0, hf - 1), jnp.clip(xi, 0, wf - 1)]
        return v * valid[..., None].astype(v.dtype)

    # Per-example gather of the 4 corners (vmapped over batch).
    g00 = jax.vmap(gather)(descriptor_map, y0i, x0i)
    g10 = jax.vmap(gather)(descriptor_map, y0i, x0i + 1)
    g01 = jax.vmap(gather)(descriptor_map, y0i + 1, x0i)
    g11 = jax.vmap(gather)(descriptor_map, y0i + 1, x0i + 1)
    desc = (
        g00 * (1 - wx) * (1 - wy)
        + g10 * wx * (1 - wy)
        + g01 * (1 - wx) * wy
        + g11 * wx * wy
    )
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-12)


def _two_stage_top_k(gated: jnp.ndarray, k: int):
    """Top-k over an NMS'd [B, H, W] score map via per-block pre-selection.

    A full sort over H*W dominates extraction time on TPU. After NMS with
    radius >= 3, peaks are >= 4 px apart, so an 8x16 block holds at most 8
    survivors; keeping 16 per block is safely lossless and shrinks the
    final top-k by 16x. Falls back to the flat top-k when shapes don't
    tile.
    """
    b, H, W = gated.shape
    HB, WB, CAND = 8, 16, 16
    if H % HB or W % WB or (H // HB) * (W // WB) * CAND < k:
        flat = gated.reshape(b, H * W)
        return jax.lax.top_k(flat, k)
    nby, nbx = H // HB, W // WB
    blocks = (
        gated.reshape(b, nby, HB, nbx, WB)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, nby * nbx, HB * WB)
    )
    vals, idx_in = jax.lax.top_k(blocks, CAND)  # [B, NB, CAND]
    block_id = jnp.arange(nby * nbx)[None, :, None]
    by = (block_id // nbx) * HB + idx_in // WB
    bx = (block_id % nbx) * WB + idx_in % WB
    cand_flat = (by * W + bx).reshape(b, -1)
    cand_vals = vals.reshape(b, -1)
    top_scores, ci = jax.lax.top_k(cand_vals, k)
    top_idx = jnp.take_along_axis(cand_flat, ci, axis=1)
    return top_scores, top_idx


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "border", "stride"),
)
def extract_keypoints(
    score_map: jnp.ndarray,
    descriptor_map: jnp.ndarray,
    max_keypoints: int = 1024,
    keypoint_threshold: float = 0.005,
    border: int = 4,
    stride: int = 8,
) -> dict:
    """Static-shape keypoint selection from a NMS'd score map.

    Reference flow (superpoint.py:203-239): threshold -> border removal ->
    top-k -> (x, y) -> bilinear descriptor sampling. Here all images in the
    batch yield exactly `max_keypoints` slots with a validity mask.

    Returns dict(keypoints [B, K, 2] float xy, scores [B, K],
    descriptors [B, K, C], mask [B, K] bool).
    """
    b, H, W = score_map.shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    in_border = (
        (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    )
    gated = jnp.where(
        in_border & (score_map > keypoint_threshold), score_map, 0.0
    )
    top_scores, top_idx = _two_stage_top_k(gated, max_keypoints)
    kx = (top_idx % W).astype(jnp.float32)
    ky = (top_idx // W).astype(jnp.float32)
    keypoints = jnp.stack([kx, ky], axis=-1)  # (x, y)
    mask = top_scores > keypoint_threshold
    descriptors = sample_descriptors(keypoints, descriptor_map, stride)
    zero_kp = jnp.zeros_like(keypoints)
    return {
        "keypoints": jnp.where(mask[..., None], keypoints, zero_kp),
        "scores": jnp.where(mask, top_scores, 0.0),
        "descriptors": descriptors * mask[..., None],
        "mask": mask,
    }
