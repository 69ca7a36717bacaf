"""Full SuperPoint dense-forward variants on chip: (a) optimization
barrier between depth-to-space and NMS; (b) im2col-9 input conv.
Both are semantics-identical; whichever wins end-to-end gets folded into
models/superpoint.py.

Usage: python scripts/bench_sp_variants.py
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

B, IMG = 8, 512

_NULL = []


def _null_fetch():
    if not _NULL:
        _NULL.append(jax.jit(lambda x: jnp.sum(x).astype(jnp.float32) * 0.0))
    return _NULL[0]

ITERS = 50


def timed(fn, *args):
    """Fetch-forced steady-state ms (bench.py methodology):
    block_until_ready does NOT reliably force execution on the tunneled
    axon backend — only a host fetch does."""

    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(a[0] + c, *a[1:])
            return jnp.mean(out).astype(jnp.float32) * 1e-20, 0.0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    float(run(*args))
    null = _null_fetch()
    float(null(args[0]))
    ov = 0.0
    for _ in range(3):
        s = time.perf_counter()
        float(null(args[0]))
        ov += (time.perf_counter() - s) / 3
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0 - ov) / ITERS * 1000.0)
    return best


class SP(nn.Module):
    barrier: bool = False
    im2col: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image):
        from onepose_tpu.models.superpoint import simple_nms

        conv = partial(
            nn.Conv, kernel_size=(3, 3), strides=(1, 1), padding="SAME",
            dtype=self.dtype,
        )
        pool = partial(nn.max_pool, window_shape=(2, 2), strides=(2, 2))
        x = image.astype(self.dtype)
        if self.im2col:
            m = conv(features=64, name="conv1a")
            _ = m(jnp.zeros((1, 8, 8, 1), self.dtype))
            w = m.variables["params"]["kernel"].astype(self.dtype)
            bsz, Hh, Ww, _ = x.shape
            xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
            taps = [
                xp[:, dy : dy + Hh, dx : dx + Ww]
                for dy in range(3)
                for dx in range(3)
            ]
            patches = jnp.stack(taps, axis=-1)
            y = jnp.einsum("bhwk,kc->bhwc", patches, w.reshape(9, 64))
            x = nn.relu(y + m.variables["params"]["bias"].astype(self.dtype))
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

        cpa = nn.relu(conv(features=256, name="convPa")(x))
        logits = nn.Conv(
            features=65, kernel_size=(1, 1), dtype=self.dtype, name="convPb"
        )(cpa)
        probs = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        )[..., :-1]
        b, h, w_, _ = probs.shape
        scores = probs.reshape(b, h, w_, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w_ * 8)
        if self.barrier:
            scores = jax.lax.optimization_barrier(scores)
        scores = simple_nms(scores, 4)

        cda = nn.relu(conv(features=256, name="convDa")(x))
        desc = nn.Conv(
            features=256, kernel_size=(1, 1), dtype=self.dtype, name="convDb"
        )(cda)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
        return scores + 1e-12 * jnp.mean(desc)


def main():
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, IMG, IMG, 1)), jnp.float32)
    key = jax.random.PRNGKey(0)

    ref_out = None
    params = SP().init(key, img[:1])
    for barrier in (False, True):
        for im2col in (False, True):
            m = SP(barrier=barrier, im2col=im2col)
            ms = timed(lambda x, p: m.apply(p, x), img, params)
            out = np.asarray(m.apply(params, img), np.float32)
            if ref_out is None:
                ref_out = out
            err = np.abs(out - ref_out).max()
            print(
                f"barrier={barrier!s:5s} im2col={im2col!s:5s}: "
                f"{ms:7.3f} ms  (err vs v0 {err:.2e})",
                flush=True,
            )


if __name__ == "__main__":
    main()
