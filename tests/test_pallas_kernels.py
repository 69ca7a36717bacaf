"""Parity tests for Pallas TPU kernels (interpreter mode on the CPU mesh)
against their pure-XLA reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_tpu.models.superglue import log_sinkhorn
from onepose_tpu.ops.pallas.gats import (
    gats_leaf_attention,
    gats_reference_xla,
)


class TestSinkhornKernel:
    @pytest.mark.parametrize("m,n", [(64, 96), (129, 200)])
    @pytest.mark.slow
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

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_both_sides_fully_masked_stays_finite(self, use_pallas):
        """Degenerate probe: zero valid keypoints on BOTH sides. Before
        the norm clamp, -log(ms + ns) = inf poisoned every slot with NaN
        (found by the round-5 on-chip verify drive)."""
        from onepose_tpu.models.superglue import extract_matches

        rng = np.random.default_rng(3)
        b, m, n = 1, 24, 32
        scores = jnp.asarray(rng.normal(size=(b, m, n)), jnp.float32)
        z = log_sinkhorn(
            scores, jnp.asarray(0.5), jnp.zeros((b, m), bool),
            jnp.zeros((b, n), bool), iters=20, use_pallas=use_pallas,
        )
        out = extract_matches(
            z, 0.2, mask0=jnp.zeros((b, m), bool),
            mask1=jnp.zeros((b, n), bool),
        )
        assert np.isfinite(np.asarray(out["matching_scores0"])).all()
        assert (np.asarray(out["matches0"]) == -1).all()
        assert (np.asarray(out["matches1"]) == -1).all()

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


class TestGATsKernel:
    def _data(self, n3=100, L=4, C=256, b=2, seed=0):
        rng = np.random.default_rng(seed)
        leaf = jnp.asarray(rng.normal(size=(b, n3, L, C)), jnp.float32)
        d3 = jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32)
        mask = jnp.asarray(rng.random((b, n3, L)) < 0.8)
        W = jnp.asarray(rng.normal(size=(C, C)) * 0.06, jnp.float32)
        a2 = jnp.asarray(rng.normal(size=(2, C)) * 0.06, jnp.float32)
        return leaf, d3, mask, W, a2

    def test_matches_xla(self):
        leaf, d3, mask, W, a2 = self._data()
        out_k = gats_leaf_attention(leaf, d3, mask, W, a2, 0.2)
        out_r = gats_reference_xla(leaf, d3, mask, W, a2, 0.2)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_r), atol=2e-5
        )

    def test_matches_module(self):
        """The flax layer with use_pallas=True equals use_pallas=False."""
        import jax
        from onepose_tpu.models.gats import GraphAttentionLayer

        leaf, d3, mask, W, a2 = self._data(n3=60)
        layer_x = GraphAttentionLayer(use_pallas=False)
        layer_p = GraphAttentionLayer(use_pallas=True)
        params = layer_x.init(jax.random.PRNGKey(0), leaf, d3, mask)
        out_x = layer_x.apply(params, leaf, d3, mask)
        out_p = layer_p.apply(params, leaf, d3, mask)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_x), atol=2e-5
        )

    @pytest.mark.slow
    def test_gradients_match(self):
        import jax

        leaf, d3, mask, W, a2 = self._data(n3=40, b=1)

        def loss_k(l, d, w, a):
            return jnp.sum(gats_leaf_attention(l, d, mask, w, a, 0.2) ** 2)

        def loss_r(l, d, w, a):
            return jnp.sum(gats_reference_xla(l, d, mask, w, a, 0.2) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(leaf, d3, W, a2)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(leaf, d3, W, a2)
        for a_, b_ in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), atol=1e-3, rtol=1e-3
            )

    def test_nondivisible_tile_and_no_mask(self):
        leaf, d3, _, W, a2 = self._data(n3=37, b=1)
        out_k = gats_leaf_attention(leaf, d3, None, W, a2, 0.2)
        out_r = gats_reference_xla(leaf, d3, None, W, a2, 0.2)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_r), atol=2e-5
        )


class TestVggStageKernel:
    def test_matches_xla(self):
        import jax
        from onepose_tpu.ops.pallas.vgg_stage import (
            vgg_stage,
            vgg_stage_reference_xla,
        )

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(16,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(16,)) * 0.1, jnp.float32)
        for pool in (True, False):
            out_k = vgg_stage(x, w1, b1, w2, b2, pool, 16)
            out_r = vgg_stage_reference_xla(x, w1, b1, w2, b2, pool)
            # bf16 taps with fp32 accumulation: ~1e-2 absolute slop.
            np.testing.assert_allclose(
                np.asarray(out_k), np.asarray(out_r), atol=5e-2, rtol=1e-2
            )

    def test_superpoint_pallas_path_parity(self):
        import jax
        from onepose_tpu.models.superpoint import SuperPoint

        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
        mx = SuperPoint(use_pallas=False)
        mp = SuperPoint(use_pallas=True)
        params = mx.init(jax.random.PRNGKey(0), img)
        # Same parameter pytree must load into both branches.
        params_p = mp.init(jax.random.PRNGKey(0), img)
        assert jax.tree.structure(params) == jax.tree.structure(params_p)
        ox = mx.apply(params, img)
        op = mp.apply(params, img)
        # bf16 taps chained over 4 stages: ~2e-2 score slop. What matters
        # is that keypoint SELECTION and descriptors stay faithful.
        np.testing.assert_allclose(
            np.asarray(op["score_map"]),
            np.asarray(ox["score_map"]),
            atol=5e-2,
        )
        np.testing.assert_allclose(
            np.asarray(op["descriptor_map"]),
            np.asarray(ox["descriptor_map"]),
            atol=2e-2,
        )
        from onepose_tpu.models.superpoint import extract_keypoints

        fx = extract_keypoints(
            ox["score_map"], ox["descriptor_map"], max_keypoints=64
        )
        fp = extract_keypoints(
            op["score_map"], op["descriptor_map"], max_keypoints=64
        )
        sx = {
            tuple(k)
            for k, v in zip(
                np.asarray(fx["keypoints"][0]), np.asarray(fx["mask"][0])
            )
            if v
        }
        sp_ = {
            tuple(k)
            for k, v in zip(
                np.asarray(fp["keypoints"][0]), np.asarray(fp["mask"][0])
            )
            if v
        }
        overlap = len(sx & sp_) / max(len(sx), 1)
        assert overlap > 0.9, overlap

    def test_gradients_via_xla_recompute(self):
        import jax
        from onepose_tpu.ops.pallas.vgg_stage import (
            vgg_stage,
            vgg_stage_reference_xla,
        )

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 4, 8)) * 0.1, jnp.float32)
        b1 = jnp.zeros((8,), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
        b2 = jnp.zeros((8,), jnp.float32)
        gk = jax.grad(lambda *a: jnp.sum(vgg_stage(*a, True, 8) ** 2),
                      argnums=(1, 3))(x, w1, b1, w2, b2)
        gr = jax.grad(
            lambda *a: jnp.sum(vgg_stage_reference_xla(*a, True) ** 2),
            argnums=(1, 3),
        )(x, w1, b1, w2, b2)
        for a_, b_ in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), atol=5e-2, rtol=5e-2
            )


class TestDualSoftmaxMatch:
    @pytest.mark.slow
    def test_matches_xla_path(self):
        from onepose_tpu.models.gats_spg import match_from_conf
        from onepose_tpu.ops.pallas.dual_softmax import (
            NEG_INF,
            dual_softmax_match,
        )

        rng = np.random.default_rng(0)
        b, m, n = 2, 100, 150
        # Correlated scores so real mutual matches exist.
        base = rng.normal(size=(b, n, 32))
        s2 = base[:, :m] + 0.1 * rng.normal(size=(b, m, 32))
        scores = np.einsum("bmc,bnc->bmn", s2, base) * 2.0
        mask2d = rng.random((b, m)) < 0.9
        mask3d = rng.random((b, n)) < 0.9
        scores = np.where(mask2d[:, :, None], scores, NEG_INF)
        scores = np.where(mask3d[:, None, :], scores, NEG_INF)
        scores = jnp.asarray(scores, jnp.float32)

        conf = jax.nn.softmax(scores, axis=1) * jax.nn.softmax(
            scores, axis=2
        )
        ref = match_from_conf(
            conf, 0.2, mask2d=jnp.asarray(mask2d), mask3d=jnp.asarray(mask3d)
        )
        out = dual_softmax_match(scores, 0.2)
        np.testing.assert_array_equal(
            np.asarray(out["matches0"]), np.asarray(ref["matches0"])
        )
        np.testing.assert_array_equal(
            np.asarray(out["matches1"]), np.asarray(ref["matches1"])
        )
        got = np.asarray(out["matching_scores0"])
        want = np.asarray(ref["matching_scores0"])
        valid = np.asarray(ref["valid0"])
        np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5)
        assert (np.asarray(out["matches0"]) >= 0).sum() > 10

    def test_module_fused_flag(self):
        import jax as _jax
        from onepose_tpu.models import GATsSPG

        rng = np.random.default_rng(1)
        b, n2, n3, L, C = 1, 32, 48, 2, 256
        d2 = jnp.asarray(rng.normal(size=(b, n2, C)), jnp.float32)
        d3 = jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32)
        lv = jnp.asarray(rng.normal(size=(b, n3, L, C)), jnp.float32)
        mx = GATsSPG(fused_match=False)
        mp = GATsSPG(fused_match=True)
        params = mx.init(_jax.random.PRNGKey(0), d2, d3, lv)
        ox = mx.apply(params, d2, d3, lv)
        op = mp.apply(params, d2, d3, lv)
        np.testing.assert_array_equal(
            np.asarray(op["matches0"]), np.asarray(ox["matches0"])
        )
        assert op["conf_matrix"] is None
        assert ox["conf_matrix"] is not None


class TestFusedGatsBlock:
    def _setup(self, seed=0, b=2, n2=16, n3=24, L=4, C=256):
        import jax

        from onepose_tpu.models.gats_spg import GATsSPG

        rng = np.random.default_rng(seed)
        desc2d = jnp.asarray(rng.normal(size=(b, n2, C)), jnp.float32)
        desc3d = jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32)
        leaves = jnp.asarray(rng.normal(size=(b, n3, L, C)), jnp.float32)
        mask2 = jnp.asarray(rng.random((b, n2)) < 0.8)
        mask3 = jnp.asarray(rng.random((b, n3)) < 0.8)
        leaf_mask = jnp.asarray(rng.random((b, n3, L)) < 0.7)
        args = (desc2d, desc3d, leaves, mask2, mask3, leaf_mask)
        ref_model = GATsSPG(num_blocks=2, block_fused=False)
        params = ref_model.init(jax.random.PRNGKey(1), *args)
        return args, params, ref_model

    @pytest.mark.slow
    def test_matches_xla_path(self):
        from onepose_tpu.models.gats_spg import GATsSPG

        args, params, ref_model = self._setup()
        fused_model = GATsSPG(num_blocks=2, block_fused=True)

        ref = ref_model.apply(params, *args)
        out = fused_model.apply(params, *args)

        np.testing.assert_allclose(
            np.asarray(out["conf_matrix"]),
            np.asarray(ref["conf_matrix"]),
            atol=5e-5, rtol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(out["matches0"]), np.asarray(ref["matches0"])
        )

    def test_no_mask(self):
        from onepose_tpu.models.gats_spg import GATsSPG

        args, params, ref_model = self._setup(seed=3)
        args = args[:3] + (None, None, None)
        fused_model = GATsSPG(num_blocks=2, block_fused=True)
        ref = ref_model.apply(params, *args)
        out = fused_model.apply(params, *args)
        np.testing.assert_allclose(
            np.asarray(out["conf_matrix"]),
            np.asarray(ref["conf_matrix"]),
            atol=5e-5, rtol=1e-4,
        )

    def test_param_tree_identical(self):
        import jax

        from onepose_tpu.models.gats_spg import GATsSPG

        args, params, _ = self._setup(seed=5)
        fused_model = GATsSPG(num_blocks=2, block_fused=True)
        p2 = fused_model.init(jax.random.PRNGKey(1), *args)
        t1 = jax.tree.structure(params)
        t2 = jax.tree.structure(p2)
        assert t1 == t2


class TestSinkhornVmemGuard:
    def test_fits_vmem_boundaries(self):
        from onepose_tpu.ops.pallas.sinkhorn import fits_vmem

        # SuperGlue demo budget (1024 kpts + dustbin) fits;
        # the SfM extraction budget (4096 + dustbin) must not
        # (reference src/sfm/extract_features.py:8-26).
        assert fits_vmem(1025, 1025)
        assert not fits_vmem(4097, 4097)
        assert not fits_vmem(2049, 2049)

    def test_guard_falls_back_above_budget(self):
        """use_pallas=True above the VMEM budget must route to the XLA
        scan (no crash) and agree with the explicit XLA path."""
        from unittest import mock

        import onepose_tpu.ops.pallas.sinkhorn as sk
        from onepose_tpu.models.superglue import log_sinkhorn

        rng = np.random.default_rng(0)
        b, m, n = 1, 16, 24
        scores = jnp.asarray(rng.normal(size=(b, m, n)), jnp.float32)
        m0 = jnp.ones((b, m), bool)
        m1 = jnp.ones((b, n), bool)
        bin_score = jnp.asarray(0.5, jnp.float32)
        with mock.patch.object(sk, "_VMEM_BUDGET_ELEMS", 1):
            z_guarded = log_sinkhorn(
                scores, bin_score, m0, m1, iters=20, use_pallas=True
            )
        z_xla = log_sinkhorn(
            scores, bin_score, m0, m1, iters=20, use_pallas=False
        )
        np.testing.assert_allclose(
            np.asarray(z_guarded), np.asarray(z_xla), atol=1e-5
        )


class TestSinkhornStreamed:
    """Row-blocked HBM-streaming Sinkhorn (ops/pallas/sinkhorn_stream) —
    the above-VMEM path for the reference's 4096-keypoint SfM budget
    (src/sfm/extract_features.py:8-26). Parity vs the XLA scan."""

    @pytest.mark.parametrize("m,n", [(130, 200), (300, 260)])
    def test_matches_scan_path(self, m, n):
        from onepose_tpu.ops.pallas.sinkhorn_stream import (
            sinkhorn_potentials_streamed,
        )

        rng = np.random.default_rng(0)
        b = 2
        scores = jnp.asarray(rng.normal(size=(b, m, n)), jnp.float32)
        NEG = -1e9
        mask0 = np.asarray(rng.random((b, m)) < 0.8)
        mask1 = np.asarray(rng.random((b, n)) < 0.8)
        scores = jnp.where(
            mask0[:, :, None] & mask1[:, None, :], scores, NEG
        )
        log_mu = jnp.where(mask0, -np.log(m), NEG)
        log_nu = jnp.where(mask1, -np.log(n), NEG)

        iters = 30

        def scan(c, mu, nu):
            def body(carry, _):
                u, v = carry
                u = mu - jax.nn.logsumexp(c + v[:, None, :], axis=2)
                v = nu - jax.nn.logsumexp(c + u[:, :, None], axis=1)
                return (u, v), None

            (u, v), _ = jax.lax.scan(
                body, (jnp.zeros_like(mu), jnp.zeros_like(nu)), None,
                length=iters,
            )
            return u, v

        u_ref, v_ref = scan(scores, log_mu, log_nu)
        # block_rows=128 with m=300 -> 3 row blocks: the online column
        # accumulator spans multiple blocks.
        u, v = sinkhorn_potentials_streamed(
            scores, log_mu, log_nu, iters, block_rows=128
        )
        np.testing.assert_allclose(
            np.where(mask0, np.asarray(u), 0.0),
            np.where(mask0, np.asarray(u_ref), 0.0),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.where(mask1, np.asarray(v), 0.0),
            np.where(mask1, np.asarray(v_ref), 0.0),
            atol=1e-4,
        )

    def test_log_sinkhorn_routes_large_to_stream(self):
        """Above the VMEM budget, use_pallas=True must route to the
        streaming kernel and agree with the explicit XLA scan."""
        from unittest import mock

        import onepose_tpu.ops.pallas.sinkhorn as sk
        import onepose_tpu.ops.pallas.sinkhorn_stream as sks

        rng = np.random.default_rng(1)
        b, m, n = 1, 140, 150
        scores = jnp.asarray(rng.normal(size=(b, m, n)), jnp.float32)
        m0 = jnp.asarray(rng.random((b, m)) < 0.9)
        m1 = jnp.asarray(rng.random((b, n)) < 0.9)
        bin_score = jnp.asarray(0.5, jnp.float32)
        called = {}
        orig = sks.sinkhorn_potentials_streamed

        def spy(*a, **k):
            called["stream"] = True
            return orig(*a, **k)

        with mock.patch.object(sk, "_VMEM_BUDGET_ELEMS", 1), \
                mock.patch.object(
                    sks, "sinkhorn_potentials_streamed", spy):
            z_stream = log_sinkhorn(
                scores, bin_score, m0, m1, iters=25, use_pallas=True
            )
        assert called.get("stream"), "large problem must use the stream"
        z_xla = log_sinkhorn(
            scores, bin_score, m0, m1, iters=25, use_pallas=False
        )
        mm0 = jnp.concatenate([m0, jnp.ones((b, 1), bool)], axis=1)
        mm1 = jnp.concatenate([m1, jnp.ones((b, 1), bool)], axis=1)
        valid = mm0[:, :, None] & mm1[:, None, :]
        np.testing.assert_allclose(
            np.where(valid, z_stream, 0.0),
            np.where(valid, z_xla, 0.0),
            atol=1e-4,
        )

    def test_bf16_coupling_match_agreement(self):
        """bf16-stored coupling: potentials differ by the coupling's
        quantization (~4e-3) but the extracted mutual-max matches must
        agree with fp32 on a realistic (noisy-correspondence) problem."""
        from onepose_tpu.models.superglue import extract_matches

        rng = np.random.default_rng(2)
        b, n = 1, 180
        # Planted assignment: descriptor similarity with noise.
        d = rng.normal(size=(n, 64)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d2 = d + 0.2 * rng.normal(size=(n, 64)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        scores = jnp.asarray((d @ d2.T)[None] * 8.0)
        m0 = jnp.ones((b, n), bool)
        bin_score = jnp.asarray(1.0, jnp.float32)

        from unittest import mock

        import onepose_tpu.ops.pallas.sinkhorn as sk

        with mock.patch.object(sk, "_VMEM_BUDGET_ELEMS", 1):
            z32 = log_sinkhorn(
                scores, bin_score, m0, m0, iters=50, use_pallas=True
            )
            z16 = log_sinkhorn(
                scores, bin_score, m0, m0, iters=50, use_pallas=True,
                stream_bf16=True,
            )
        mt32 = extract_matches(z32, 0.2)["matches0"]
        mt16 = extract_matches(z16, 0.2)["matches0"]
        agree = (np.asarray(mt32) == np.asarray(mt16)).mean()
        assert agree > 0.99, agree


class TestFlashAttention:
    """Opt-in flash path of masked_softmax_attention (models/common.py):
    parity vs the XLA path, incl. key-side masking via segment ids and
    the fully-masked guard. Interpreter mode on CPU."""

    def test_matches_xla_path(self):
        from jax.experimental.pallas import tpu as pltpu

        from onepose_tpu.models.common import masked_softmax_attention

        rng = np.random.default_rng(0)
        B, N, M, H, D = 2, 300, 260, 4, 64  # pads to 512 inside
        q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, M)) < 0.8)
        mask = mask.at[1].set(False)  # one example fully masked

        ref = masked_softmax_attention(q, k, v, mask, use_flash=False)
        with pltpu.force_tpu_interpret_mode():
            out = masked_softmax_attention(q, k, v, mask, use_flash=True)
        # Example 0: numerical parity. Example 1 (no valid keys): the
        # guard zeroes the flash output (the XLA path yields the
        # uniform-average of v there; both are don't-care but must be
        # finite).
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(ref[0]), atol=2e-4
        )
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_array_equal(np.asarray(out[1]), 0.0)


class TestNMSKernel:
    def test_matches_simple_nms(self):
        """VMEM NMS kernel (ops/pallas/score_path) must be bit-exact vs
        simple_nms, including plateau/tie cells and image edges."""
        from onepose_tpu.models.superpoint import simple_nms
        from onepose_tpu.ops.pallas.score_path import nms

        rng = np.random.default_rng(3)
        for (b, H, W, r) in [(2, 64, 64, 4), (1, 32, 128, 3)]:
            s = rng.random((b, H, W)).astype(np.float32)
            # Inject plateaus (ties) and zeros.
            s[:, 5:8, 5:8] = 0.7
            s[:, :, :4] = 0.0
            a = np.asarray(nms(jnp.asarray(s), r))
            ref = np.asarray(simple_nms(jnp.asarray(s), r))
            np.testing.assert_array_equal(a, ref)

    def test_vjp_matches_xla(self):
        from onepose_tpu.models.superpoint import simple_nms
        from onepose_tpu.ops.pallas.score_path import nms

        rng = np.random.default_rng(4)
        s = jnp.asarray(rng.random((1, 32, 32)).astype(np.float32))
        g1 = jax.grad(lambda x: jnp.sum(nms(x, 4) ** 2))(s)
        g2 = jax.grad(lambda x: jnp.sum(simple_nms(x, 4) ** 2))(s)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))

    def test_superpoint_flag_parity(self):
        """SuperPoint(nms_pallas=True) == default XLA path."""
        from onepose_tpu.models import SuperPoint

        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
        m0 = SuperPoint()
        params = m0.init(jax.random.PRNGKey(0), img)
        d0 = m0.apply(params, img)
        d1 = SuperPoint(nms_pallas=True).apply(params, img)
        np.testing.assert_array_equal(
            np.asarray(d0["score_map"]), np.asarray(d1["score_map"])
        )
