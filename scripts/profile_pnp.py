"""Drill into the RANSAC-PnP cost: fixed vs varying keys, and sub-stages."""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.geometry.ransac import ransac_pnp, _sample_minimal_sets
from onepose_tpu.geometry.p3p import p3p_solve

BATCH = 8
N_KPTS = 1000
N3 = 2000
ITERS = 30


def bench(fn, carry, n=ITERS):
    @jax.jit
    def run(c0):
        def body(c, i):
            out = fn(c, i)
            return c + 1e-12 * out, 0.0

        c, _ = jax.lax.scan(body, c0, jnp.arange(n))
        return jnp.sum(c * 0.0)

    r = run(carry)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(run(carry))
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    K = jnp.asarray(
        [[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]], jnp.float32
    )
    Kb = jnp.broadcast_to(K, (BATCH, 3, 3))
    pts2d = jnp.asarray(rng.random((BATCH, N_KPTS, 2)) * 512, jnp.float32)
    pts3d = jnp.asarray(rng.normal(size=(BATCH, N_KPTS, 3)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.random((BATCH, N_KPTS)) < 0.3)

    solve = partial(ransac_pnp, n_hyp=512, reproj_threshold=5.0)

    def pnp_fixed(c, i):
        keys = jax.random.split(key, BATCH)
        p = jax.vmap(solve)(keys, c, pts3d, Kb, mask)
        return p["pose"][0, 0, 0]

    def pnp_varying(c, i):
        keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
        p = jax.vmap(solve)(keys, c, pts3d, Kb, mask)
        return p["pose"][0, 0, 0]

    def sample_only(c, i):
        keys = jax.random.split(jax.random.fold_in(key, i), BATCH)

        def one(k, m):
            order = jnp.argsort(~m)
            return _sample_minimal_sets(k, order, jnp.sum(m), 512, k=3)

        idx = jax.vmap(one)(keys, mask)
        return jnp.sum(idx).astype(jnp.float32) * 1e-12 + c[0, 0, 0]

    def p3p_varying(c, i):
        keys = jax.random.split(jax.random.fold_in(key, i), BATCH)

        def per_frame(k, m, p2, p3):
            order = jnp.argsort(~m)
            idx = _sample_minimal_sets(k, order, jnp.sum(m), 512, k=3)
            Rs, ts, oks = jax.vmap(
                lambda ids: p3p_solve(p3[ids], p2[ids], K)
            )(idx)
            return jnp.sum(Rs) + jnp.sum(ts)

        s = jax.vmap(per_frame)(keys, mask, pts2d + c * 0, pts3d)
        return jnp.sum(s) * 1e-12

    print(f"pnp_fixed_keys:   {bench(pnp_fixed, pts2d):8.2f} ms/iter")
    print(f"pnp_varying_keys: {bench(pnp_varying, pts2d):8.2f} ms/iter")
    print(f"sample_only:      {bench(sample_only, pts2d):8.2f} ms/iter")
    print(f"sample+p3p:       {bench(p3p_varying, pts2d):8.2f} ms/iter")


if __name__ == "__main__":
    main()
