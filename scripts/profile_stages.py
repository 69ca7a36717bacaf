"""Per-stage device timing of the fused pipeline on the real chip.

Each stage is timed as a jitted lax.scan over N dependent iterations with a
single final host fetch (the bench.py methodology), so tunnel RPC latency
does not pollute per-stage numbers.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.models.superpoint import SuperPoint, extract_keypoints
from onepose_tpu.runtime.pipeline import ObjectAnnotation
from onepose_tpu.geometry.ransac import ransac_pnp

import os as _os
BATCH = int(_os.environ.get("PROFILE_BATCH", "8"))
IMG = 512
N_KPTS = 1000
N3 = 2000
L = 8
ITERS = 30


def timed_scan(fn, carry_init, n=ITERS):
    @partial(jax.jit, static_argnames=())
    def run(carry):
        def body(c, i):
            out = fn(c, i)
            return out, 0.0

        c, _ = jax.lax.scan(body, carry, jnp.arange(n))
        return jax.tree.map(lambda x: jnp.sum(x * 0.0), c)

    r = run(carry_init)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(carry_init)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return dt / n * 1000.0  # ms per iteration


def main():
    import os

    dtype = (
        jnp.bfloat16
        if os.environ.get("PROFILE_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    sp = SuperPoint(dtype=dtype)
    matcher = GATsSPG(dtype=dtype)
    print(f"compute dtype: {dtype.__name__}")

    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 1), np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]], jnp.float32),
        (BATCH, 3, 3),
    )
    anno = ObjectAnnotation(
        points3d=jnp.asarray(rng.normal(size=(N3, 3)) * 0.1, jnp.float32),
        desc3d=jnp.asarray(rng.normal(size=(N3, 256)), jnp.float32),
        leaf_desc=jnp.asarray(rng.normal(size=(N3, L, 256)), jnp.float32),
        mask3d=jnp.ones((N3,), bool),
        leaf_mask=jnp.ones((N3, L), bool),
    )
    sp_params = sp.init(key, images[:1])
    m_params = matcher.init(
        key,
        jnp.zeros((1, N_KPTS, 256), jnp.float32),
        anno.desc3d[None],
        anno.leaf_desc[None],
        jnp.ones((1, N_KPTS), bool),
        anno.mask3d[None],
        anno.leaf_mask[None],
    )

    # Stage 1: SuperPoint dense forward
    def s1(c, i):
        d = sp.apply(sp_params, c)
        return c + 1e-12 * d["score_map"][0, 0, 0]

    print(f"superpoint_dense: {timed_scan(s1, images):8.2f} ms/iter (b={BATCH})")

    dense = sp.apply(sp_params, images)

    # Stage 2: keypoint extraction (NMS + topk + sampling)
    def s2(c, i):
        f = extract_keypoints(
            c, dense["descriptor_map"], max_keypoints=N_KPTS,
            keypoint_threshold=0.005, border=4,
        )
        return c + 1e-12 * f["keypoints"][0, 0, 0]

    print(f"extract_kpts:     {timed_scan(s2, dense['score_map']):8.2f} ms/iter")

    feats = extract_keypoints(
        dense["score_map"], dense["descriptor_map"], max_keypoints=N_KPTS,
        keypoint_threshold=0.005, border=4,
    )

    b = BATCH
    desc3d = jnp.broadcast_to(anno.desc3d[None], (b,) + anno.desc3d.shape)
    leaves = jnp.broadcast_to(anno.leaf_desc[None], (b,) + anno.leaf_desc.shape)
    mask3d = jnp.broadcast_to(anno.mask3d[None], (b,) + anno.mask3d.shape)
    leaf_mask = jnp.broadcast_to(
        anno.leaf_mask[None], (b,) + anno.leaf_mask.shape
    )

    # Stage 3: GATsSPG matcher
    def s3(c, i):
        m = matcher.apply(
            m_params, c, desc3d, leaves, feats["mask"], mask3d, leaf_mask
        )
        return c + 1e-12 * m["matching_scores0"][0, 0]

    print(f"gats_spg:         {timed_scan(s3, feats['descriptors']):8.2f} ms/iter")

    match = matcher.apply(
        m_params, feats["descriptors"], desc3d, leaves, feats["mask"],
        mask3d, leaf_mask,
    )
    idx = jnp.maximum(match["matches0"], 0)
    pts3d = jnp.take_along_axis(
        jnp.broadcast_to(anno.points3d[None], (b,) + anno.points3d.shape),
        idx[..., None], axis=1,
    )
    corr_mask = match["matches0"] >= 0
    keys = jax.random.split(key, b)

    # Stage 4: RANSAC PnP
    def s4(c, i):
        solve = partial(ransac_pnp, n_hyp=512, reproj_threshold=5.0)
        p = jax.vmap(solve)(keys, c, pts3d, K, corr_mask)
        return c + 1e-12 * p["pose"][0, 0, 0]

    print(f"ransac_pnp:       {timed_scan(s4, feats['keypoints']):8.2f} ms/iter")


if __name__ == "__main__":
    main()
