"""Sequence-parallel attention vs dense reference on the CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onepose_tpu.models.common import (
    masked_linear_attention,
    masked_softmax_attention,
)
from onepose_tpu.parallel.mesh import make_mesh
from onepose_tpu.parallel.sharded_attention import (
    ring_softmax_attention,
    sharded_dual_softmax,
    sharded_linear_attention,
)


def _qkv(rng, B=2, N=16, M=32, H=4, D=16):
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.2)
    return q, k, v, mask


def test_sharded_linear_attention_matches_dense():
    rng = np.random.default_rng(0)
    q, k, v, mask = _qkv(rng)
    mesh = make_mesh(n_points=4)
    dense = masked_linear_attention(q, k, v, mask)
    sharded = sharded_linear_attention(
        mesh, q, k, v, mask, v_length=k.shape[1]
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=2e-5
    )


def test_ring_softmax_attention_matches_dense():
    rng = np.random.default_rng(1)
    q, k, v, mask = _qkv(rng)
    mesh = make_mesh(n_points=4)
    dense = masked_softmax_attention(q, k, v, mask)
    ring = ring_softmax_attention(mesh, q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(ring), np.asarray(dense), atol=2e-5
    )


def test_ring_handles_fully_masked_shard():
    rng = np.random.default_rng(2)
    q, k, v, mask = _qkv(rng, M=32)
    # Mask out an entire shard's keys (slots 8..16 with 4 shards of 8).
    mask = mask.at[:, 8:16].set(False)
    mesh = make_mesh(n_points=4)
    dense = masked_softmax_attention(q, k, v, mask)
    ring = ring_softmax_attention(mesh, q, k, v, mask)
    assert np.all(np.isfinite(np.asarray(ring)))
    np.testing.assert_allclose(
        np.asarray(ring), np.asarray(dense), atol=2e-5
    )


def test_sharded_dual_softmax_matches_dense():
    rng = np.random.default_rng(3)
    B, N2, N3 = 2, 12, 32
    scores = jnp.asarray(rng.normal(size=(B, N2, N3)), jnp.float32)
    m2 = jnp.asarray(rng.random((B, N2)) > 0.2)
    m3 = jnp.asarray(rng.random((B, N3)) > 0.2)
    mesh = make_mesh(n_points=4)

    from onepose_tpu.models.common import NEG_INF

    s = jnp.where(m2[:, :, None], scores, NEG_INF)
    s = jnp.where(m3[:, None, :], s, NEG_INF)
    dense = jax.nn.softmax(s, axis=1) * jax.nn.softmax(s, axis=2)
    sharded = sharded_dual_softmax(mesh, scores, m2, m3)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=2e-5
    )


class TestShardedGATsSPG:
    """The flagship matcher with mesh= set (points-sharded SPMD mode) must
    agree with the dense single-device model — forward and backward."""

    def _inputs(self, rng, b=2, n2=32, n3=64, L=4, C=256):
        import jax.numpy as jnp

        args = [
            jnp.asarray(rng.normal(size=s), jnp.float32)
            for s in [(b, n2, C), (b, n3, C), (b, n3, L, C)]
        ]
        masks = [
            jnp.asarray(rng.random((b, n2)) > 0.1),
            jnp.asarray(rng.random((b, n3)) > 0.1),
            jnp.asarray(rng.random((b, n3, L)) > 0.2),
        ]
        return args, masks

    def test_forward_matches_dense(self):
        from onepose_tpu.models.gats_spg import GATsSPG

        rng = np.random.default_rng(0)
        args, masks = self._inputs(rng)
        mesh = make_mesh(n_points=4)
        dense = GATsSPG()
        params = dense.init(jax.random.PRNGKey(0), *args, *masks)
        out_d = jax.jit(dense.apply)(params, *args, *masks)
        out_s = jax.jit(GATsSPG(mesh=mesh).apply)(params, *args, *masks)
        np.testing.assert_allclose(
            np.asarray(out_s["conf_matrix"]),
            np.asarray(out_d["conf_matrix"]),
            atol=3e-5,
        )
        agree = (
            np.asarray(out_s["matches0"]) == np.asarray(out_d["matches0"])
        ).mean()
        assert agree > 0.99, agree

    def test_grad_matches_dense(self):
        from onepose_tpu.models.gats_spg import GATsSPG

        rng = np.random.default_rng(1)
        args, masks = self._inputs(rng, b=1)
        mesh = make_mesh(n_points=4)
        dense = GATsSPG()
        params = dense.init(jax.random.PRNGKey(0), *args, *masks)

        def grad_of(model):
            def f(p):
                out = model.apply(p, *args, *masks)
                return jnp.sum(out["conf_matrix"] ** 2)

            return jax.jit(jax.grad(f))(params)

        gd = grad_of(dense)
        gs = grad_of(GATsSPG(mesh=mesh))
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), gd, gs
        )
        mx = max(jax.tree.leaves(diffs))
        assert mx < 1e-4, mx

    @pytest.mark.slow
    def test_long_context_beyond_reference_cap(self):
        """The long-context scaling axis DELIVERS beyond-reference
        capacity: a 16384-point cloud (8x the reference's 2000-point
        padding, 6.5x its hard 2500-point cap from filter_tkl,
        src/sfm/postprocess/filter_tkl.py:36-53) points-sharded 8 ways
        matches the dense model, and the HLO collective audit shows the
        per-device comm volume is the SAME 1.057 MB/step as at n3=2000
        (scripts/audit_collectives.py 16000 4 8) — the map size scales
        with chips, not comm."""
        from onepose_tpu.models.gats_spg import GATsSPG

        rng = np.random.default_rng(3)
        args, masks = self._inputs(rng, b=1, n2=64, n3=16384, L=2, C=256)
        mesh = make_mesh(n_points=8)
        dense = GATsSPG(num_blocks=1)
        params = dense.init(jax.random.PRNGKey(0), *args, *masks)
        out_d = jax.jit(dense.apply)(params, *args, *masks)
        out_s = jax.jit(GATsSPG(num_blocks=1, mesh=mesh).apply)(
            params, *args, *masks
        )
        np.testing.assert_allclose(
            np.asarray(out_s["conf_matrix"]),
            np.asarray(out_d["conf_matrix"]),
            atol=3e-5,
        )
        agree = (
            np.asarray(out_s["matches0"]) == np.asarray(out_d["matches0"])
        ).mean()
        assert agree > 0.99, agree

    def test_pallas_paths_rejected(self):
        import pytest

        from onepose_tpu.models.gats_spg import GATsSPG

        rng = np.random.default_rng(2)
        args, masks = self._inputs(rng, b=1, n2=8, n3=16, L=2)
        mesh = make_mesh(n_points=4)
        model = GATsSPG(mesh=mesh, fused_match=True)
        params = GATsSPG().init(jax.random.PRNGKey(0), *args, *masks)
        with pytest.raises(AssertionError, match="points-sharded"):
            model.apply(params, *args, *masks)


def test_mixed_precision_attention_matches_fp32():
    """bf16-operand / fp32-accumulate attention internals
    (compute_dtype=bfloat16) must track the fp32 path to bf16 rounding
    tolerance for both attention kinds."""
    rng = np.random.default_rng(5)
    q, k, v, mask = _qkv(rng, B=2, N=64, M=128)
    for fn in (masked_linear_attention, masked_softmax_attention):
        ref = np.asarray(fn(q, k, v, mask))
        mixed = np.asarray(
            fn(q, k, v, mask, compute_dtype=jnp.bfloat16)
        )
        assert mixed.dtype == np.float32  # fp32 accumulation output
        scale = np.abs(ref).max()
        np.testing.assert_allclose(mixed, ref, atol=2e-2 * scale)


def test_mixed_attention_matcher_same_matches():
    """GATsSPG(dtype=bf16, mixed_attention=True) must produce (nearly)
    the same matches as the pinned-fp32-internals bf16 matcher, with an
    unchanged parameter tree."""
    from onepose_tpu.models.gats_spg import GATsSPG

    rng = np.random.default_rng(6)
    b, n2, n3, L, C = 1, 96, 160, 8, 256
    d2 = jnp.asarray(rng.normal(size=(b, n2, C)), jnp.float32)
    # Plant correlated descriptors so real matches exist.
    d3 = jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32)
    d3 = d3.at[:, :n2].set(d2 + 0.05 * d3[:, :n2])
    leaves = jnp.asarray(rng.normal(size=(b, n3, L, C)), jnp.float32)
    m2 = jnp.ones((b, n2), bool)
    m3 = jnp.ones((b, n3), bool)
    lm = jnp.ones((b, n3, L), bool)

    base = GATsSPG(dtype=jnp.bfloat16, fused_match=False)
    mixed = GATsSPG(
        dtype=jnp.bfloat16, fused_match=False, mixed_attention=True
    )
    params = base.init(jax.random.PRNGKey(0), d2, d3, leaves, m2, m3, lm)
    params_m = mixed.init(jax.random.PRNGKey(0), d2, d3, leaves, m2, m3, lm)
    assert jax.tree.structure(params) == jax.tree.structure(params_m)

    out_b = base.apply(params, d2, d3, leaves, m2, m3, lm)
    out_m = mixed.apply(params, d2, d3, leaves, m2, m3, lm)
    agree = np.mean(
        np.asarray(out_b["matches0"]) == np.asarray(out_m["matches0"])
    )
    assert agree > 0.99, agree
    np.testing.assert_allclose(
        np.asarray(out_m["conf_matrix"]),
        np.asarray(out_b["conf_matrix"]),
        atol=5e-2,
    )
