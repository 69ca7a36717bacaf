"""Bisect the fused pipeline cost: time full _forward, and variants with
stages knocked out, under the same dependent-scan methodology."""

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

BATCH = 8
IMG = 512
N_KPTS = 1000
N3 = 2000
L = 8
ITERS = 30


def bench(fn, *args, n=ITERS):
    @partial(jax.jit, static_argnames=())
    def run(*a):
        def body(c, i):
            out = fn(c, i, *a[1:])
            return c + 1e-12 * out, 0.0

        c, _ = jax.lax.scan(body, a[0], jnp.arange(n))
        return jnp.sum(c * 0.0)

    r = run(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    sp = SuperPoint()
    matcher = GATsSPG()

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
    b = BATCH

    def front(img):
        dense = sp.apply(sp_params, img)
        feats = extract_keypoints(
            dense["score_map"], dense["descriptor_map"],
            max_keypoints=N_KPTS, keypoint_threshold=0.005, border=4,
        )
        desc3d = jnp.broadcast_to(anno.desc3d[None], (b,) + anno.desc3d.shape)
        leaves = jnp.broadcast_to(
            anno.leaf_desc[None], (b,) + anno.leaf_desc.shape
        )
        mask3d = jnp.broadcast_to(anno.mask3d[None], (b,) + anno.mask3d.shape)
        leaf_mask = jnp.broadcast_to(
            anno.leaf_mask[None], (b,) + anno.leaf_mask.shape
        )
        match = matcher.apply(
            m_params, feats["descriptors"], desc3d, leaves, feats["mask"],
            mask3d, leaf_mask,
        )
        return feats, match

    def upto_match(img, i):
        feats, match = front(img)
        return match["matching_scores0"][0, 0]

    def full(img, i):
        feats, match = front(img)
        idx = jnp.maximum(match["matches0"], 0)
        pts3d = jnp.take_along_axis(
            jnp.broadcast_to(anno.points3d[None], (b,) + anno.points3d.shape),
            idx[..., None], axis=1,
        )
        corr_mask = match["matches0"] >= 0
        keys = jax.random.split(jax.random.fold_in(key, i), b)
        solve = partial(ransac_pnp, n_hyp=512, reproj_threshold=5.0)
        pnp = jax.vmap(solve)(keys, feats["keypoints"], pts3d, K, corr_mask)
        return pnp["pose"][0, 0, 0]

    print(f"upto_match: {bench(upto_match, images):8.2f} ms/iter")
    print(f"full:       {bench(full, images):8.2f} ms/iter")


if __name__ == "__main__":
    main()
