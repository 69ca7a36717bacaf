"""SuperPoint dense forward: XLA vs fused-Pallas VGG stages on chip."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.superpoint import SuperPoint, extract_keypoints

B, IMG = 8, 512
ITERS = 30
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float32))


def bench(use_pallas):
    sp = SuperPoint(use_pallas=use_pallas)
    params = SuperPoint(use_pallas=False).init(
        jax.random.PRNGKey(0), images[:1]
    )

    @jax.jit
    def run(imgs):
        def body(c, i):
            d = sp.apply(params, c)
            return c + 1e-12 * d["score_map"][0, 0, 0], 0.0

        c, _ = jax.lax.scan(body, imgs, jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    jax.block_until_ready(run(images))
    t0 = time.perf_counter()
    jax.block_until_ready(run(images))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    d = sp.apply(params, images)
    f = extract_keypoints(
        d["score_map"], d["descriptor_map"], max_keypoints=1000
    )
    return dt, f


t_x, fx = bench(False)
t_p, fp = bench(True)
print(f"xla:    {t_x:8.2f} ms/iter (b={B})")
print(f"pallas: {t_p:8.2f} ms/iter (b={B})  speedup {t_x / t_p:.2f}x")
agree = 0.0
for b in range(B):
    sx = {tuple(k) for k, v in zip(np.asarray(fx["keypoints"][b]),
                                   np.asarray(fx["mask"][b])) if v}
    sp_ = {tuple(k) for k, v in zip(np.asarray(fp["keypoints"][b]),
                                    np.asarray(fp["mask"][b])) if v}
    agree += len(sx & sp_) / max(len(sx), 1)
print(f"keypoint agreement: {agree / B * 100:.1f}%")
