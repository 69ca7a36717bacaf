"""Parity tests for Pallas TPU kernels (interpreter mode on the CPU mesh)
against their pure-XLA reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_tpu.models.superglue import log_sinkhorn


class TestSinkhornKernel:
    @pytest.mark.parametrize("m,n", [(64, 96), (129, 200)])
    def test_matches_xla_path(self, m, n):
        rng = np.random.default_rng(0)
        b = 2
        scores = jnp.asarray(rng.normal(size=(b, m, n)), jnp.float32)
        bin_score = jnp.asarray(0.7, jnp.float32)
        mask0 = jnp.asarray(rng.random((b, m)) < 0.8)
        mask1 = jnp.asarray(rng.random((b, n)) < 0.8)

        z_xla = log_sinkhorn(
            scores, bin_score, mask0, mask1, iters=30, use_pallas=False
        )
        z_pallas = log_sinkhorn(
            scores, bin_score, mask0, mask1, iters=30, use_pallas=True
        )
        # Compare on slots that carry mass (masked slots hold huge
        # sentinel negatives whose exact value is irrelevant).
        m0 = jnp.concatenate([mask0, jnp.ones((b, 1), bool)], axis=1)
        m1 = jnp.concatenate([mask1, jnp.ones((b, 1), bool)], axis=1)
        valid = m0[:, :, None] & m1[:, None, :]
        np.testing.assert_allclose(
            np.where(valid, z_pallas, 0.0),
            np.where(valid, z_xla, 0.0),
            atol=1e-4,
        )

    def test_marginals_sum_to_one(self):
        rng = np.random.default_rng(1)
        b, m, n = 1, 40, 56
        scores = jnp.asarray(rng.normal(size=(b, m, n)), jnp.float32)
        mask0 = jnp.asarray(rng.random((b, m)) < 0.9)
        z = log_sinkhorn(
            scores, jnp.asarray(1.0), mask0, None, iters=100, use_pallas=True
        )
        # Each valid row (real keypoint) transports exactly 1/(ms+ns).
        p = np.exp(np.asarray(z, np.float64))
        row_mass = p.sum(axis=2)[0, :-1]
        ms = float(mask0.sum())
        expected = 1.0 / (ms + n) * (ms + n)  # normalized by norm term
        np.testing.assert_allclose(
            row_mass[np.asarray(mask0[0])], expected, rtol=1e-3
        )
