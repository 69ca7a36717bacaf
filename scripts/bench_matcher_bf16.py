"""GATsSPG f32 vs bf16 compute dtype on chip: speed + match agreement."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.gats_spg import GATsSPG

B, N2, N3, L, C = 8, 1000, 2000, 8, 256
ITERS = 30

rng = np.random.default_rng(0)
# Correlated descriptors so matches are meaningful, not random argmaxes.
base = rng.normal(size=(B, N3, C)).astype(np.float32)
d3 = jnp.asarray(base)
d2 = jnp.asarray(
    base[:, :N2] + 0.3 * rng.normal(size=(B, N2, C)).astype(np.float32)
)
lv = jnp.asarray(
    base[:, :, None, :] + 0.2 * rng.normal(size=(B, N3, L, C)),
    jnp.float32,
)
m2 = jnp.ones((B, N2), bool)
m3 = jnp.ones((B, N3), bool)
lm = jnp.ones((B, N3, L), bool)


def bench(dtype):
    model = GATsSPG(dtype=dtype)
    params = GATsSPG(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), d2, d3, lv, m2, m3, lm
    )
    fwd = jax.jit(lambda p: model.apply(p, d2, d3, lv, m2, m3, lm))
    out = fwd(params)

    @jax.jit
    def run(x):
        def body(c, i):
            o = model.apply(params, c, d3, lv, m2, m3, lm)
            return c + 1e-12 * o["matching_scores0"][0, 0].astype(c.dtype), 0.0

        c, _ = jax.lax.scan(body, x, jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    jax.block_until_ready(run(d2))
    t0 = time.perf_counter()
    jax.block_until_ready(run(d2))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    return dt, jax.tree.map(np.asarray, out)


t32, o32 = bench(jnp.float32)
t16, o16 = bench(jnp.bfloat16)
agree = float(np.mean(o32["matches0"] == o16["matches0"]))
n_match32 = int((o32["matches0"] >= 0).sum())
n_match16 = int((o16["matches0"] >= 0).sum())
print(f"f32:  {t32:8.2f} ms/iter ({n_match32} matches)")
print(f"bf16: {t16:8.2f} ms/iter ({n_match16} matches) "
      f"speedup {t32 / t16:.2f}x  agreement {agree * 100:.2f}%")
