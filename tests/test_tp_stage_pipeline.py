"""Tensor parallelism (Megatron param split) and pipeline-stage
parallelism vs the dense/fused references on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_tpu.models.gats_spg import GATsSPG


def _matcher_inputs(rng, b=2, n2=32, n3=64, L=4, C=256):
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


class TestTensorParallel:
    def test_tp_matches_dense(self):
        from onepose_tpu.parallel.tensor_parallel import (
            make_tp_mesh,
            shard_params,
        )

        rng = np.random.default_rng(0)
        args, masks = _matcher_inputs(rng)
        m = GATsSPG()
        params = m.init(jax.random.PRNGKey(0), *args, *masks)
        out_d = jax.jit(m.apply)(params, *args, *masks)

        mesh = make_tp_mesh(4)
        p_tp = shard_params(params, mesh)
        out_tp = jax.jit(m.apply)(p_tp, *args, *masks)
        np.testing.assert_allclose(
            np.asarray(out_tp["conf_matrix"]),
            np.asarray(out_d["conf_matrix"]),
            atol=3e-5,
        )

    def test_specs_shard_attention_and_mlp(self):
        from jax.sharding import PartitionSpec as P

        from onepose_tpu.parallel.tensor_parallel import (
            MODEL_AXIS,
            gats_spg_tp_specs,
            make_tp_mesh,
        )

        rng = np.random.default_rng(1)
        args, masks = _matcher_inputs(rng, b=1, n2=8, n3=16, L=2)
        m = GATsSPG()
        params = m.init(jax.random.PRNGKey(0), *args, *masks)
        specs = gats_spg_tp_specs(params, make_tp_mesh(4))
        p = specs["params"]["self_0"]
        assert p["attn"]["proj_q"]["kernel"] == P(None, MODEL_AXIS)
        assert p["attn"]["merge"]["kernel"] == P(MODEL_AXIS, None)
        assert p["mlp"]["dense_0"]["kernel"] == P(None, MODEL_AXIS)
        assert p["mlp"]["dense_1"]["kernel"] == P(MODEL_AXIS, None)
        assert specs["params"]["final_proj"]["kernel"] == P()
        assert specs["params"]["gats_0"]["W"] == P()


class TestStagePipeline:
    @pytest.fixture(scope="class")
    def setup(self):
        from onepose_tpu.runtime.pipeline import (
            ObjectAnnotation,
            PosePipeline,
        )

        rng = np.random.default_rng(0)
        B, IMG, NK, N3, L = 2, 128, 128, 256, 4
        pipe = PosePipeline(max_keypoints=NK, compute_dtype=jnp.float32)
        images = jnp.asarray(rng.random((B, IMG, IMG, 1), np.float32))
        K = jnp.broadcast_to(
            jnp.asarray(
                [[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]], jnp.float32
            ),
            (B, 3, 3),
        )
        anno = ObjectAnnotation(
            points3d=jnp.asarray(
                rng.normal(size=(N3, 3)) * 0.1, jnp.float32
            ),
            desc3d=jnp.asarray(rng.normal(size=(N3, 256)), jnp.float32),
            leaf_desc=jnp.asarray(
                rng.normal(size=(N3, L, 256)), jnp.float32
            ),
            mask3d=jnp.ones((N3,), bool),
            leaf_mask=jnp.ones((N3, L), bool),
        )
        sp_params = pipe.superpoint.init(jax.random.PRNGKey(0), images[:1])
        m_params = pipe.matcher.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, NK, 256)),
            anno.desc3d[None],
            anno.leaf_desc[None],
            jnp.ones((1, NK), bool),
            anno.mask3d[None],
            anno.leaf_mask[None],
        )
        return pipe, sp_params, m_params, anno, images, K

    def test_matches_fused_pipeline(self, setup):
        from onepose_tpu.parallel.stage_pipeline import StagePipeline

        pipe, sp_params, m_params, anno, images, K = setup
        key = jax.random.PRNGKey(5)
        ref = pipe(sp_params, m_params, images, K, anno, key)
        sp3 = StagePipeline(
            pipe, sp_params, m_params, anno, devices=jax.devices()[:3]
        )
        outs = sp3.run([images], [K], key=key)
        np.testing.assert_allclose(
            np.asarray(outs[0]["pose"]),
            np.asarray(ref["pose"]),
            atol=1e-4,
        )
        # Stage weights actually live on their stage devices.
        d0, d1, d2 = sp3.devices
        leaf0 = jax.tree.leaves(sp3.sp_params)[0]
        leaf1 = jax.tree.leaves(sp3.m_params)[0]
        assert list(leaf0.devices()) == [d0]
        assert list(leaf1.devices()) == [d1]
        assert list(sp3.points3d.devices()) == [d2]

    def test_multiple_microbatches(self, setup):
        from onepose_tpu.parallel.stage_pipeline import StagePipeline

        pipe, sp_params, m_params, anno, images, K = setup
        sp3 = StagePipeline(
            pipe, sp_params, m_params, anno, devices=jax.devices()[:3]
        )
        outs = sp3.run([images, images + 0.01, images + 0.02], [K] * 3)
        assert len(outs) == 3
        for o in outs:
            assert np.isfinite(np.asarray(o["pose"])).all()

    def test_wraps_on_single_device(self, setup):
        from onepose_tpu.parallel.stage_pipeline import StagePipeline

        pipe, sp_params, m_params, anno, images, K = setup
        sp1 = StagePipeline(
            pipe, sp_params, m_params, anno, devices=jax.devices()[:1]
        )
        outs = sp1.run([images], [K])
        assert np.isfinite(np.asarray(outs[0]["pose"])).all()
