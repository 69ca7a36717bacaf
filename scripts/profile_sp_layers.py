"""Per-layer timing of the SuperPoint dense forward on the TPU chip.

Times every conv / pool / head / NMS op of the dense forward separately
(dependent-scan method) and prints implied MFU + BW per layer against v5e
peaks. Drives the decision on VERDICT r3 item 4: whether the 1.9x-of-bound
gap of superpoint_dense lives in the C=64 convs (space-to-depth candidate)
or elsewhere.

Usage: python scripts/profile_sp_layers.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

B, IMG = 8, 512
ITERS = 50
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def timed(fn, *args):
    @jax.jit
    def run(c0, *a):
        def body(c, _):
            out = fn(c, *a)
            return (
                c + 1e-12 * jnp.sum(out).astype(c.dtype),
                0.0,
            )

        c, _ = jax.lax.scan(body, c0, jnp.arange(ITERS))
        return c * 0.0

    c0 = args[0]
    jax.block_until_ready(run(c0, *args[1:]))
    t0 = time.perf_counter()
    jax.block_until_ready(run(c0, *args[1:]))
    return (time.perf_counter() - t0) / ITERS * 1000.0


def conv_flops_bytes(h, w, cin, cout, k=3, dtype_bytes=2):
    flops = 2 * k * k * cin * cout * h * w * B
    bytes_ = dtype_bytes * B * h * w * (cin + cout)
    return flops, bytes_


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def mkconv(cin, cout, k=3):
        w = jnp.asarray(
            rng.normal(scale=0.05, size=(k, k, cin, cout)), dt
        )
        b = jnp.zeros((cout,), dt)

        def f(x, w=w, b=b):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jax.nn.relu(y + b)

        return f

    rows = []

    def bench(name, fn, x, flops, nbytes):
        ms = timed(lambda c, xx: fn(xx + 0 * c[..., :1, :1, :1]), x, x)
        mfu = flops / (ms / 1e3) / PEAK_FLOPS * 100
        bw = nbytes / (ms / 1e3) / PEAK_BW * 100
        rows.append((name, ms, flops / 1e9, nbytes / 1e6, mfu, bw))
        return ms

    # Encoder layers at their in-pipeline shapes.
    specs = [
        ("conv1a 512^2 1->64", IMG, 1, 64),
        ("conv1b 512^2 64->64", IMG, 64, 64),
        ("conv2a 256^2 64->64", IMG // 2, 64, 64),
        ("conv2b 256^2 64->64", IMG // 2, 64, 64),
        ("conv3a 128^2 64->128", IMG // 4, 64, 128),
        ("conv3b 128^2 128->128", IMG // 4, 128, 128),
        ("conv4a 64^2 128->128", IMG // 8, 128, 128),
        ("conv4b 64^2 128->128", IMG // 8, 128, 128),
        ("convPa 64^2 128->256", IMG // 8, 128, 256),
        ("convDa 64^2 128->256", IMG // 8, 128, 256),
    ]
    for name, hw, cin, cout in specs:
        x = jnp.asarray(rng.normal(size=(B, hw, hw, cin)), dt)
        f, by = conv_flops_bytes(hw, hw, cin, cout)
        bench(name, mkconv(cin, cout), x, f, by)

    # Heads (1x1) + pools + NMS.
    x64 = jnp.asarray(rng.normal(size=(B, 64, 64, 256)), dt)
    f, by = conv_flops_bytes(64, 64, 256, 65, k=1)
    bench("convPb 64^2 256->65 (1x1)", mkconv(256, 65, k=1), x64, f, by)
    f, by = conv_flops_bytes(64, 64, 256, 256, k=1)
    bench("convDb 64^2 256->256 (1x1)", mkconv(256, 256, k=1), x64, f, by)

    xp = jnp.asarray(rng.normal(size=(B, IMG, IMG, 64)), dt)

    def pool(x):
        import flax.linen as nn

        return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))

    bench(
        "pool1 512^2x64", lambda x: pool(x), xp,
        0, 2 * B * IMG * IMG * 64 * 1.25,
    )

    from onepose_tpu.models.superpoint import simple_nms

    smap = jnp.asarray(rng.random((B, IMG, IMG)), jnp.float32)
    bench(
        "simple_nms r4 fp32", lambda s: simple_nms(s, 4), smap,
        0, 4 * B * IMG * IMG * 12,
    )

    # softmax + depth-to-space score path at head shapes.
    logits = jnp.asarray(rng.normal(size=(B, 64, 64, 65)), dt)

    def score_path(lg):
        p = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]
        b, h, w, _ = p.shape
        s = p.reshape(b, h, w, 8, 8)
        return s.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)

    bench(
        "softmax+d2s fp32", score_path, logits,
        0, 4 * B * IMG * IMG * 2,
    )

    # Whole dense forward for cross-check.
    from onepose_tpu.models.superpoint import SuperPoint

    sp = SuperPoint(dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((B, IMG, IMG, 1)), jnp.float32)
    params = sp.init(key, img[:1])

    def full(x):
        return sp.apply(params, x)["score_map"]

    ms_full = timed(lambda c, xx: full(xx + 0 * c[..., :1, :1, :1]), img, img)

    print(f"{'layer':28s} {'ms':>7s} {'GFLOP':>8s} {'MB':>8s} "
          f"{'MFU%':>6s} {'BW%':>6s}")
    tot = 0.0
    for name, ms, gf, mb, mfu, bw in rows:
        tot += ms
        print(f"{name:28s} {ms:7.3f} {gf:8.1f} {mb:8.0f} "
              f"{mfu:6.1f} {bw:6.1f}")
    print(f"{'SUM of layers':28s} {tot:7.3f}")
    print(f"{'full dense forward':28s} {ms_full:7.3f}")


if __name__ == "__main__":
    main()
