"""GATsSPG matcher: XLA path vs fused-block Pallas kernel on chip."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.models.gats_spg import GATsSPG

B, N2, N3, L, C = 8, 1000, 2000, 8, 256
import os
ITERS = int(os.environ.get("ITERS", "30"))
ONLY = os.environ.get("ONLY", "")
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

desc2d = jnp.asarray(rng.normal(size=(B, N2, C)), jnp.float32)
desc3d = jnp.asarray(rng.normal(size=(B, N3, C)), jnp.float32)
leaves = jnp.asarray(rng.normal(size=(B, N3, L, C)), jnp.float32)
mask2 = jnp.asarray(rng.random((B, N2)) < 0.9)
mask3 = jnp.ones((B, N3), bool)
leaf_mask = jnp.asarray(rng.random((B, N3, L)) < 0.8)
args = (desc2d, desc3d, leaves, mask2, mask3, leaf_mask)

params = GATsSPG(block_fused=False).init(key, *args)


def bench(block_fused):
    model = GATsSPG(dtype=jnp.bfloat16, block_fused=block_fused)

    @jax.jit
    def run(c):
        def body(c, i):
            m = model.apply(params, c, *args[1:])
            return c + 1e-12 * m["matching_scores0"][0, 0], 0.0

        c, _ = jax.lax.scan(body, c, jnp.arange(ITERS))
        return jnp.sum(c * 0.0)

    out = jax.jit(lambda c: model.apply(params, c, *args[1:]))(desc2d)
    out = jax.tree.map(
        lambda x: np.asarray(x) if x is not None else None, out
    )
    jax.block_until_ready(run(desc2d))
    t0 = time.perf_counter()
    jax.block_until_ready(run(desc2d))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    return dt, out


if ONLY != "fused":
    t_x, ox = bench(False)
    print(f"xla:    {t_x:7.2f} ms/iter (b={B})", flush=True)
else:
    t_x, ox = None, None  # baseline skipped: report the fused time only
t_p, op = bench(True)
if t_x is None:
    print(f"fused:  {t_p:7.2f} ms/iter  (XLA baseline skipped)")
else:
    print(f"fused:  {t_p:7.2f} ms/iter  speedup {t_x / t_p:.2f}x")
if ox is not None:
    m_x = np.asarray(ox["matches0"])
    m_p = np.asarray(op["matches0"])
    agree = float(np.mean(m_x == m_p))
    valid = m_x >= 0
    agree_v = float(np.mean(m_x[valid] == m_p[valid])) if valid.any() else 1.0
    print(f"match agreement: {agree * 100:.2f}% (valid slots {agree_v * 100:.2f}%)")
