"""Per-layer cost of the SuperPoint dense forward on the TPU chip, by
prefix differencing: time the jitted prefix stack ending after each layer
(dependent-scan method, one fused program per prefix) and report the
marginal ms of each layer IN CONTEXT. This avoids the isolated-op
measurement trap (a big scan carry adds more traffic than a small op).

Drives VERDICT r3 item 4: where does superpoint_dense's 1.9x-of-bound
gap live?

Usage: python scripts/profile_sp_layers.py
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
PEAK_FLOPS = 197e12


def timed_prefix(apply_prefix, img):
    """Steady-state ms of one prefix program: scan ITERS dependent calls,
    scalar carry folded into the input (negligible traffic). The timing
    fetch uses float(...) — on the tunneled axon backend
    block_until_ready does NOT reliably force execution; only a host
    fetch does (bench.py methodology)."""

    @jax.jit
    def run(x):
        def body(c, _):
            out = apply_prefix(x + c)
            return jnp.mean(out).astype(jnp.float32) * 1e-20, 0.0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    float(run(img))
    null = _null_fetch()
    float(null(img))
    ov = 0.0
    for _ in range(3):
        s = time.perf_counter()
        float(null(img))
        ov += (time.perf_counter() - s) / 3
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(img))
        best = min(best, (time.perf_counter() - t0 - ov) / ITERS * 1000.0)
    return best


class Prefix(nn.Module):
    """First `n_layers` ops of the SuperPoint dense forward."""

    n_layers: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = partial(
            nn.Conv, kernel_size=(3, 3), padding="SAME", dtype=self.dtype
        )
        pool = partial(nn.max_pool, window_shape=(2, 2), strides=(2, 2))
        steps = []
        steps.append(("conv1a", lambda x: nn.relu(conv(64, name="c1a")(x))))
        steps.append(("conv1b", lambda x: nn.relu(conv(64, name="c1b")(x))))
        steps.append(("pool1", pool))
        steps.append(("conv2a", lambda x: nn.relu(conv(64, name="c2a")(x))))
        steps.append(("conv2b", lambda x: nn.relu(conv(64, name="c2b")(x))))
        steps.append(("pool2", pool))
        steps.append(("conv3a", lambda x: nn.relu(conv(128, name="c3a")(x))))
        steps.append(("conv3b", lambda x: nn.relu(conv(128, name="c3b")(x))))
        steps.append(("pool3", pool))
        steps.append(("conv4a", lambda x: nn.relu(conv(128, name="c4a")(x))))
        steps.append(("conv4b", lambda x: nn.relu(conv(128, name="c4b")(x))))
        steps.append(("convPa", lambda x: nn.relu(conv(256, name="cPa")(x))))
        steps.append(
            (
                "convPb+score",
                lambda x: _score_path(
                    nn.Conv(65, (1, 1), dtype=self.dtype, name="cPb")(x)
                ),
            )
        )
        x = x.astype(self.dtype)
        for _, f in steps[: self.n_layers]:
            x = f(x)
        return x


def _score_path(logits):
    from onepose_tpu.models.superpoint import simple_nms

    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1]
    b, h, w, _ = p.shape
    s = p.reshape(b, h, w, 8, 8).transpose(0, 1, 3, 2, 4)
    return simple_nms(s.reshape(b, h * 8, w * 8), 4)


NAMES = [
    "conv1a", "conv1b", "pool1", "conv2a", "conv2b", "pool2",
    "conv3a", "conv3b", "pool3", "conv4a", "conv4b", "convPa",
    "convPb+score(NMS)",
]

GFLOPS = [2.4, 154.6, 0, 38.7, 38.7, 0, 19.3, 38.7, 0, 9.7, 9.7, 19.3, 1.1]


def main():
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, IMG, IMG, 1)), jnp.float32)
    key = jax.random.PRNGKey(0)

    times = []
    full = Prefix(n_layers=len(NAMES))
    params_full = full.init(key, img[:1])
    for n in range(1, len(NAMES) + 1):
        m = Prefix(n_layers=n)
        ms = timed_prefix(lambda x: m.apply(params_full, x), img)
        times.append(ms)
        prev = times[-2] if n > 1 else 0.0
        marg = ms - prev
        gf = GFLOPS[n - 1]
        mfu = gf / max(marg, 1e-9) * 1e-3 / (PEAK_FLOPS / 1e12) * 100
        print(
            f"{NAMES[n-1]:18s} prefix {ms:7.3f} ms   marginal "
            f"{marg:7.3f} ms   {gf:6.1f} GF  MFU {mfu:5.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
