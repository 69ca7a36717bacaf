"""Compare SuperPoint dense forward f32 vs bf16 compute on chip, and check
keypoint agreement."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.superpoint import SuperPoint, extract_keypoints

B, IMG = 8, 512
ITERS = 30
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float32))


def bench(dtype):
    sp = SuperPoint(dtype=dtype)
    params = sp.init(jax.random.PRNGKey(0), images[:1])

    @jax.jit
    def run(imgs):
        def body(c, i):
            d = sp.apply(params, c)
            return c + 1e-12 * d["score_map"][0, 0, 0].astype(c.dtype), 0.0

        c, _ = jax.lax.scan(body, imgs, jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    jax.block_until_ready(run(images))
    t0 = time.perf_counter()
    jax.block_until_ready(run(images))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    d = sp.apply(params, images)
    f = extract_keypoints(
        d["score_map"], d["descriptor_map"], max_keypoints=1000,
        keypoint_threshold=0.005, border=4,
    )
    return dt, np.asarray(f["keypoints"]), np.asarray(f["mask"]), np.asarray(
        f["descriptors"]
    )


t32, kp32, m32, d32 = bench(jnp.float32)
t16, kp16, m16, d16 = bench(jnp.bfloat16)
print(f"f32:  {t32:.2f} ms/iter (b={B})")
print(f"bf16: {t16:.2f} ms/iter (b={B})  speedup {t32 / t16:.2f}x")
# agreement: fraction of f32 keypoints reproduced exactly by bf16
common = min(m32.sum(), m16.sum())
same = 0
for b in range(B):
    s32 = {tuple(k) for k, v in zip(kp32[b], m32[b]) if v}
    s16 = {tuple(k) for k, v in zip(kp16[b], m16[b]) if v}
    inter = len(s32 & s16)
    same += inter / max(len(s32), 1)
print(f"keypoint agreement: {same / B * 100:.1f}%")
