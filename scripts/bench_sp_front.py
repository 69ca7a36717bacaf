"""Variant benchmarks for SuperPoint's two slow non-MXU chunks
(profile_sp_layers.py findings): the C=1 input conv and the score path
(softmax -> depth-to-space -> NMS). Each variant is semantics-preserving;
winners get folded into models/superpoint.py.

Usage: python scripts/bench_sp_front.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

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
            out = fn(a[0] + jnp.asarray(c, a[0].dtype), *a[1:])
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


def main():
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from onepose_tpu.models.superpoint import simple_nms

    rng = np.random.default_rng(0)

    # ---------------- input conv variants ----------------
    img = jnp.asarray(rng.random((B, IMG, IMG, 1)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.3, size=(3, 3, 1, 64)), jnp.bfloat16)
    b64 = jnp.asarray(rng.normal(size=(64,)), jnp.bfloat16)

    def conv1a_v0(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + b64)

    def conv1a_pad8(x):
        xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0),) * 3 + ((0, 7),))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 7), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, wp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + b64)

    def conv1a_im2col(x):
        # 9 shifted views stacked on channels -> 1x1 conv (K=9 matmul).
        xb = x[..., 0].astype(jnp.bfloat16)
        xpad = jnp.pad(xb, ((0, 0), (1, 1), (1, 1)))
        taps = [
            xpad[:, dy : dy + IMG, dx : dx + IMG]
            for dy in range(3)
            for dx in range(3)
        ]
        patches = jnp.stack(taps, axis=-1)  # [B, H, W, 9]
        wf = w.reshape(9, 64)
        y = jnp.einsum("bhwk,kc->bhwc", patches, wf)
        return jax.nn.relu(y + b64)

    # Space-to-depth folding was evaluated on paper and REJECTED before
    # benching: the exactly-folded packed 3x3 kernels are 75% structured
    # zeros (4x FLOP inflation the MXU cannot skip), so even perfect MFU
    # loses to the unpacked conv — see docs/PERFORMANCE.md.

    v0 = timed(conv1a_v0, img)
    vp = timed(conv1a_pad8, img)
    vi = timed(conv1a_im2col, img)
    print(f"conv1a v0 (3x3 C=1)      : {v0:7.3f} ms")
    print(f"conv1a pad-to-8 channels : {vp:7.3f} ms")
    print(f"conv1a im2col-9 matmul   : {vi:7.3f} ms")

    # numerically identical?
    a = np.asarray(conv1a_v0(img), np.float32)
    c = np.asarray(conv1a_im2col(img), np.float32)
    print("  im2col max err:", np.abs(a - c).max())

    # ---------------- score path variants ----------------
    logits = jnp.asarray(rng.normal(size=(B, 64, 64, 65)), jnp.bfloat16)

    def score_v0(lg):
        p = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]
        b, h, w_, _ = p.shape
        s = p.reshape(b, h, w_, 8, 8).transpose(0, 1, 3, 2, 4)
        return s.reshape(b, h * 8, w_ * 8)

    def score_v0_nms(lg):
        return simple_nms(score_v0(lg), 4)

    def softmax_only(lg):
        return jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]

    s_sm = timed(softmax_only, logits)
    s_d2s = timed(score_v0, logits)
    s_full = timed(score_v0_nms, logits)
    print(f"softmax only             : {s_sm:7.3f} ms")
    print(f"softmax + d2s            : {s_d2s:7.3f} ms")
    print(f"softmax + d2s + NMS      : {s_full:7.3f} ms")

    # NMS on the flat map alone (fp32 and bf16).
    smap = jnp.asarray(rng.random((B, IMG, IMG)), jnp.float32)
    n32 = timed(lambda s: simple_nms(s, 4), smap)
    n16 = timed(lambda s: simple_nms(s, 4), smap.astype(jnp.bfloat16))
    print(f"NMS fp32                 : {n32:7.3f} ms")
    print(f"NMS bf16                 : {n16:7.3f} ms")

    # d2s alternatives.
    probs = jnp.asarray(rng.random((B, 64, 64, 64)), jnp.float32)

    def d2s_v0(p):
        b, h, w_, _ = p.shape
        return (
            p.reshape(b, h, w_, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, h * 8, w_ * 8)
        )

    def d2s_convT(p):
        # depth-to-space as a transposed conv with a one-hot kernel:
        # rides the conv emitter instead of the transpose path.
        k = np.zeros((8, 8, 1, 64), np.float32)
        for dy in range(8):
            for dx in range(8):
                k[dy, dx, 0, dy * 8 + dx] = 1.0
        kj = jnp.asarray(k)
        y = jax.lax.conv_transpose(
            p, kj, (8, 8), "VALID",
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
            transpose_kernel=True,
        )
        return y[..., 0]

    t0_ = timed(d2s_v0, probs)
    print(f"d2s v0 (transpose)       : {t0_:7.3f} ms")
    try:
        tc = timed(d2s_convT, probs)
        err = np.abs(
            np.asarray(d2s_v0(probs)) - np.asarray(d2s_convT(probs))
        ).max()
        print(f"d2s conv_transpose       : {tc:7.3f} ms  (err {err:.2e})")
    except Exception as e:  # noqa: BLE001
        print("d2s conv_transpose failed:", e)


if __name__ == "__main__":
    main()
