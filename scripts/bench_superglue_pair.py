"""Bench SuperGlue pair matching on chip at SfM keypoint budgets.

Usage: python scripts/bench_superglue_pair.py [n_kpts ...]
Defaults to 1024 (demo budget, Pallas Sinkhorn in VMEM) and 4096 (the
reference SfM extraction budget, src/sfm/extract_features.py:8-26 — above
the VMEM guard). Above-VMEM sizes compare three Sinkhorn paths: the XLA
scan (two coupling reads/iter), the row-blocked streaming kernel (one
read/iter), and the streaming kernel with a bf16-stored coupling (half
the bytes again).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models import SuperGlue
from onepose_tpu.ops.pallas.sinkhorn import fits_vmem

sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096]
HW = (512, 512)


def bench(sg, label, n, inputs):
    kpts0, kpts1, d0, d1, s0, s1, m0, m1 = inputs
    params = sg.init(
        jax.random.PRNGKey(0), kpts0, kpts1, d0, d1, s0, s1, HW, HW,
        m0, m1,
    )
    fwd = jax.jit(
        lambda p, *a: sg.apply(p, *a, HW, HW, m0, m1)["matches0"]
    )
    # On the tunneled axon backend block_until_ready can return at enqueue
    # time; a host fetch of the result is the only reliable completion
    # barrier. Per-device execution is serial and in-order, so fetching
    # the last rep's output forces all reps.
    out = fwd(params, kpts0, kpts1, d0, d1, s0, s1)
    ref = np.asarray(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fwd(params, kpts0, kpts1, d0, d1, s0, s1)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(
        f"n_kpts={n:5d}  sinkhorn={label:14s}  {dt:8.2f} ms/pair  "
        f"({1e3 / dt:6.1f} pairs/s)"
    )
    return ref


for n in sizes:
    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(rng.uniform(0, 511, size=(1, n, 2)), jnp.float32)
    kpts1 = jnp.asarray(rng.uniform(0, 511, size=(1, n, 2)), jnp.float32)
    d0 = jnp.asarray(rng.normal(size=(1, n, 256)), jnp.float32)
    d1 = jnp.asarray(rng.normal(size=(1, n, 256)), jnp.float32)
    s0 = jnp.asarray(rng.random((1, n)), jnp.float32)
    s1 = jnp.asarray(rng.random((1, n)), jnp.float32)
    m0 = jnp.ones((1, n), bool)
    m1 = jnp.ones((1, n), bool)
    inputs = (kpts0, kpts1, d0, d1, s0, s1, m0, m1)

    if fits_vmem(n + 1, n + 1):
        bench(SuperGlue(), "pallas-vmem", n, inputs)
        continue
    ref = bench(
        SuperGlue(sinkhorn_use_pallas=False), "xla-scan", n, inputs
    )
    st = bench(SuperGlue(), "stream-f32", n, inputs)
    st16 = bench(
        SuperGlue(sinkhorn_stream_bf16=True), "stream-bf16", n, inputs
    )
    print(
        f"    match agreement vs scan: f32 {(st == ref).mean():.4f}  "
        f"bf16 {(st16 == ref).mean():.4f}"
    )
