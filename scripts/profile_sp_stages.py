"""Per-stage timing of the SuperPoint encoder on chip: which resolution
level holds the milliseconds? (dependent-scan method)."""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

B = 8
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


class Stage(nn.Module):
    feats: int
    pool: bool = True
    dtype: jnp.dtype = DTYPE

    @nn.compact
    def __call__(self, x):
        conv = partial(
            nn.Conv, kernel_size=(3, 3), padding="SAME", dtype=self.dtype
        )
        x = nn.relu(conv(features=self.feats, name="a")(x))
        x = nn.relu(conv(features=self.feats, name="b")(x))
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class Heads(nn.Module):
    dtype: jnp.dtype = DTYPE

    @nn.compact
    def __call__(self, x):
        conv = partial(
            nn.Conv, kernel_size=(3, 3), padding="SAME", dtype=self.dtype
        )
        cpa = nn.relu(conv(features=256, name="convPa")(x))
        logits = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(cpa)
        cda = nn.relu(conv(features=256, name="convDa")(x))
        desc = nn.Conv(256, (1, 1), dtype=self.dtype, name="convDb")(cda)
        return logits.sum() + desc.sum()


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    shapes = [
        ("stage1 512^2 1->64->64 +pool", (B, 512, 512, 1), 64, True),
        ("stage2 256^2 64->64->64 +pool", (B, 256, 256, 64), 64, True),
        ("stage3 128^2 64->128->128 +pool", (B, 128, 128, 64), 128, True),
        ("stage4 64^2 128->128->128", (B, 64, 64, 128), 128, False),
    ]
    for name, shp, feats, pool in shapes:
        x = jnp.asarray(rng.random(shp, np.float32).astype(np.float32))
        st = Stage(feats=feats, pool=pool)
        p = st.init(key, x[:1])
        t = timed(lambda c: st.apply(p, c)[:, 0, 0, 0].sum(), x)
        print(f"{name:36s} {t:7.2f} ms/iter")

    x4 = jnp.asarray(rng.random((B, 64, 64, 128), np.float32))
    hd = Heads()
    ph = hd.init(key, x4[:1])
    t = timed(lambda c: hd.apply(ph, c), x4)
    print(f"{'heads convPa/Pb convDa/Db':36s} {t:7.2f} ms/iter")

    # Softmax + depth-to-space + NMS tail at full res.
    from onepose_tpu.models.superpoint import simple_nms

    logits = jnp.asarray(rng.random((B, 64, 64, 65), np.float32))

    def tail(lg):
        probs = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]
        b, h, w, _ = probs.shape
        s = probs.reshape(b, h, w, 8, 8)
        s = s.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
        return simple_nms(s, 4)[:, 0, 0].sum()

    t = timed(tail, logits)
    print(f"{'softmax+d2s+nms tail':36s} {t:7.2f} ms/iter")


if __name__ == "__main__":
    main()
