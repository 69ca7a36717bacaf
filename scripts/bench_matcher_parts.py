"""Decompose GATsSPG cost: head-only (num_blocks=0) vs 2 vs 4 blocks."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.gats_spg import GATsSPG

B, N2, N3, L, C = 8, 1000, 2000, 8, 256
ITERS = 30

rng = np.random.default_rng(0)
d2 = jnp.asarray(rng.normal(size=(B, N2, C)), jnp.float32)
d3 = jnp.asarray(rng.normal(size=(B, N3, C)), jnp.float32)
lv = jnp.asarray(rng.normal(size=(B, N3, L, C)), jnp.float32)
m2 = jnp.ones((B, N2), bool)
m3 = jnp.ones((B, N3), bool)
lm = jnp.ones((B, N3, L), bool)


def bench(num_blocks):
    model = GATsSPG(num_blocks=num_blocks, gats_use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), d2, d3, lv, m2, m3, lm)

    @jax.jit
    def run(x):
        def body(c, i):
            out = model.apply(params, c, d3, lv, m2, m3, lm)
            return c + 1e-12 * out["matching_scores0"][0, 0], 0.0

        c, _ = jax.lax.scan(body, x, jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    float(run(d2))
    t0 = time.perf_counter()
    float(run(d2))
    return (time.perf_counter() - t0) / ITERS * 1000


for nb in (0, 2, 4):
    print(f"blocks={nb}: {bench(nb):8.2f} ms/iter")
