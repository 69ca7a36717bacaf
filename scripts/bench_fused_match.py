"""GATsSPG with XLA vs fused-Pallas dual-softmax match head on chip."""

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


def bench(fused):
    model = GATsSPG(fused_match=fused)
    params = GATsSPG(fused_match=False).init(
        jax.random.PRNGKey(0), d2, d3, lv, m2, m3, lm
    )

    @jax.jit
    def run(x):
        def body(c, i):
            out = model.apply(params, c, d3, lv, m2, m3, lm)
            return c + 1e-12 * out["matching_scores0"][0, 0], 0.0

        c, _ = jax.lax.scan(body, x, jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    jax.block_until_ready(run(d2))
    t0 = time.perf_counter()
    jax.block_until_ready(run(d2))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    out = jax.jit(lambda p: model.apply(p, d2, d3, lv, m2, m3, lm))(params)
    return dt, np.asarray(out["matches0"])


t_x, mx = bench(False)
t_p, mp = bench(True)
print(f"xla head:    {t_x:8.2f} ms/iter (b={B})")
print(f"pallas head: {t_p:8.2f} ms/iter  speedup {t_x / t_p:.2f}x")
print(f"match agreement: {float((mx == mp).mean()) * 100:.2f}%")
