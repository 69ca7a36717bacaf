"""Score-path (softmax -> d2s -> NMS) variant hunt on chip.

Usage: python scripts/bench_sp_score.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

B, IMG = 8, 512
H = IMG // 8
ITERS = 50


def timed(fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*[x * (1.0 + 0.0 * c) if i == 0 else x
                       for i, x in enumerate(a)])
            return jnp.mean(out).astype(jnp.float32) * 1e-20, 0.0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    jax.block_until_ready(run(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1000.0)
    return best


def main():
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from onepose_tpu.models.superpoint import simple_nms

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, H, H, 65)), jnp.bfloat16)

    def softmax_v0(lg):
        return jax.nn.softmax(lg.astype(jnp.float32), axis=-1)[..., :-1]

    def softmax_pad128(lg):
        lgp = jnp.pad(
            lg.astype(jnp.float32),
            ((0, 0), (0, 0), (0, 0), (0, 63)),
            constant_values=-1e30,
        )
        return jax.nn.softmax(lgp, axis=-1)[..., :64]

    def softmax_manual(lg):
        x = lg.astype(jnp.float32)
        m = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(x - m)
        return (e / jnp.sum(e, axis=-1, keepdims=True))[..., :-1]

    def softmax_chan_first(lg):
        # reduce over a major axis instead of lanes: [B,65,H,H]
        x = lg.astype(jnp.float32).transpose(0, 3, 1, 2)
        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        return p[:, :-1].transpose(0, 2, 3, 1)

    for name, f in [
        ("softmax v0", softmax_v0),
        ("softmax pad128", softmax_pad128),
        ("softmax manual", softmax_manual),
        ("softmax chan-first", softmax_chan_first),
    ]:
        ms = timed(f, logits)
        err = np.abs(
            np.asarray(f(logits)) - np.asarray(softmax_v0(logits))
        ).max()
        print(f"{name:24s}: {ms:7.3f} ms  (err {err:.2e})")

    def d2s(p):
        b, h, w_, _ = p.shape
        return (
            p.reshape(b, h, w_, 8, 8)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, h * 8, w_ * 8)
        )

    def path_v0(lg):
        return simple_nms(d2s(softmax_v0(lg)), 4)

    def path_barrier(lg):
        s = d2s(softmax_v0(lg))
        s = jax.lax.optimization_barrier(s)
        return simple_nms(s, 4)

    def path_nms_cellspace(lg):
        # NMS before d2s is wrong; instead d2s with channel-last minor
        # kept: [b, h*8, w, 8] intermediate then final reshape.
        p = softmax_v0(lg)
        b, h, w_, _ = p.shape
        s = p.reshape(b, h, w_, 8, 8).transpose(0, 1, 3, 2, 4)
        s = s.reshape(b, h * 8, w_ * 8)
        return simple_nms(s, 4)

    def nms_bf16(s, r=4):
        return simple_nms(s.astype(jnp.bfloat16), r)

    def path_bf16_nms(lg):
        return simple_nms(
            d2s(softmax_v0(lg)).astype(jnp.bfloat16), 4
        )

    for name, f in [
        ("path v0 (sm+d2s+nms)", path_v0),
        ("path + opt_barrier", path_barrier),
        ("path bf16 NMS", path_bf16_nms),
    ]:
        ms = timed(f, logits)
        print(f"{name:24s}: {ms:7.3f} ms")

    # NMS formulation variants on a standalone map.
    smap = jnp.asarray(rng.random((B, IMG, IMG)), jnp.float32)

    def nms_2d_window(s):
        # single 2D reduce_window per max_pool instead of separable
        def mp(x):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, 9, 9), (1, 1, 1),
                [(0, 0), (4, 4), (4, 4)],
            )

        zeros = jnp.zeros_like(s)
        mm = s == mp(s)
        for _ in range(2):
            supp = mp(mm.astype(s.dtype)) > 0
            ss = jnp.where(supp, zeros, s)
            nm = ss == mp(ss)
            mm = mm | (nm & (~supp))
        return jnp.where(mm, s, zeros)

    def nms_chan_tiled(s):
        # operate as [B*512, 512] 2D? reduce_window on last two dims with
        # W in lanes: reshape to put W on lanes is default; try 4D
        # [B, 512, 4, 128] with window over H and (lane-tiled) W
        return simple_nms(s, 4)

    print(f"{'nms v0 separable':24s}: {timed(lambda s: simple_nms(s, 4), smap):7.3f} ms")
    print(f"{'nms 2D window':24s}: {timed(nms_2d_window, smap):7.3f} ms")


if __name__ == "__main__":
    main()
