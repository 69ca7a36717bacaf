"""Microbench: Pallas VMEM-resident Sinkhorn vs XLA scan, SuperGlue shapes."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.superglue import log_sinkhorn

B, M, N = 8, 1024, 1024
ITERS_SCAN = 10


def bench(use_pallas):
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(B, M, N)), jnp.float32)
    mask0 = jnp.asarray(rng.random((B, M)) < 0.9)
    mask1 = jnp.asarray(rng.random((B, N)) < 0.9)

    @jax.jit
    def run(s):
        def body(c, i):
            z = log_sinkhorn(
                c, jnp.asarray(1.0), mask0, mask1, 100, use_pallas=use_pallas
            )
            return c + 1e-12 * z[:, 0, 0, None, None], 0.0

        c, _ = jax.lax.scan(body, s, jnp.arange(ITERS_SCAN))
        return jnp.sum(c * 0.0)

    jax.block_until_ready(run(scores))
    t0 = time.perf_counter()
    jax.block_until_ready(run(scores))
    return (time.perf_counter() - t0) / ITERS_SCAN * 1000.0


print(f"xla_scan: {bench(False):8.2f} ms / batch-8 100-iter sinkhorn")
print(f"pallas:   {bench(True):8.2f} ms / batch-8 100-iter sinkhorn")
