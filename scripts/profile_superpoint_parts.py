"""Where do SuperPoint's ms go? Times encoder / heads / NMS separately on
the chip (dependent-scan method, bench.py methodology).

Findings drive kernel work: the dense forward is the single largest stage
of the fused pipeline (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from onepose_tpu.models.superpoint import SuperPoint, simple_nms

B, IMG = 8, 512
ITERS = 30
DTYPE = jnp.bfloat16


def timed(fn, *args):
    @jax.jit
    def run(*a):
        def body(c, i):
            out = fn(c, *a[1:])
            return c + 1e-12 * out.astype(c.dtype), 0.0

        c, _ = jax.lax.scan(body, a[0], jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    jax.block_until_ready(run(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(*args))
    return (time.perf_counter() - t0) / ITERS * 1000.0


class EncoderOnly(nn.Module):
    dtype: jnp.dtype = DTYPE

    @nn.compact
    def __call__(self, image):
        conv = partial(
            nn.Conv, kernel_size=(3, 3), padding="SAME", dtype=self.dtype
        )
        pool = partial(nn.max_pool, window_shape=(2, 2), strides=(2, 2))
        x = image.astype(self.dtype)
        for i, (f, p) in enumerate(
            [(64, True), (64, True), (128, True), (128, False)]
        ):
            x = nn.relu(conv(features=f, name=f"c{i}a")(x))
            x = nn.relu(conv(features=f, name=f"c{i}b")(x))
            if p:
                x = pool(x)
        return x


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float32))

    enc = EncoderOnly()
    p_enc = enc.init(jax.random.PRNGKey(0), images[:1])
    t_enc = timed(
        lambda c: enc.apply(p_enc, c)[:, 0, 0, 0].sum(), images
    )
    print(f"encoder only (bf16):        {t_enc:7.2f} ms/iter")

    sp = SuperPoint(dtype=DTYPE)
    p_sp = sp.init(jax.random.PRNGKey(0), images[:1])
    t_full = timed(
        lambda c: sp.apply(p_sp, c)["score_map"][:, 0, 0].sum()
        + sp.apply(p_sp, c)["descriptor_map"][:, 0, 0, 0].sum(),
        images,
    )
    print(f"full dense fwd (bf16):      {t_full:7.2f} ms/iter")

    scores = jnp.asarray(rng.random((B, IMG, IMG), np.float32))
    t_nms = timed(lambda c: simple_nms(c, 4)[:, 0, 0].sum(), scores)
    print(f"simple_nms r=4 (fp32):      {t_nms:7.2f} ms/iter")

    sp32 = SuperPoint(dtype=jnp.float32)
    p32 = sp32.init(jax.random.PRNGKey(0), images[:1])
    t32 = timed(
        lambda c: sp32.apply(p32, c)["score_map"][:, 0, 0].sum(), images
    )
    print(f"full dense fwd (fp32):      {t32:7.2f} ms/iter")


if __name__ == "__main__":
    main()
