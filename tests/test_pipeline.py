"""Integration tests: end-to-end pipeline, NN matcher oracle, train step,
multi-device shardings (on the 8-device CPU mesh from conftest)."""

import chex
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.geometry import query_pose_error, ransac_pnp
from onepose_tpu.models.gats_spg import GATsSPG
from onepose_tpu.models.nn_matcher import mutual_nn_match
from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline
from onepose_tpu.models.superpoint import SuperPoint, extract_keypoints
from onepose_tpu.train.losses import focal_loss
from onepose_tpu.train.train_step import (
    TrainConfig,
    create_train_state,
    make_train_step,
)


def _unit(rng, n, c=64):
    d = rng.normal(size=(n, c)).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


class TestNNMatcherPose:
    def test_nn_match_to_pose(self):
        """Synthetic object with oracle descriptors: mutual-NN matching ->
        RANSAC PnP must recover the ground-truth pose. Exercises the whole
        match->solve path that the learned matcher feeds in production."""
        rng = np.random.default_rng(0)
        n3d, n2d = 300, 200
        pts3d = (rng.random((n3d, 3), np.float32) - 0.5) * 0.2
        desc3d = _unit(rng, n3d)

        K = np.array([[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]], np.float32)
        R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
        t = np.array([0.01, -0.02, 0.7], np.float32)

        vis = rng.choice(n3d, n2d, replace=False)
        pc = pts3d[vis] @ R.T + t
        uv = pc @ K.T
        uv = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
        desc2d = desc3d[vis] + rng.normal(size=(n2d, 64)).astype(np.float32) * 0.05
        desc2d /= np.linalg.norm(desc2d, axis=-1, keepdims=True)

        m = mutual_nn_match(
            jnp.asarray(desc2d), jnp.asarray(desc3d), distance_thresh=0.3
        )
        idx = np.asarray(m["matches0"])
        valid = idx >= 0
        assert valid.sum() > 150
        # Matched 3D ids must be the true correspondences almost always.
        acc = np.mean(idx[valid] == vis[valid])
        assert acc > 0.95, acc

        out = ransac_pnp(
            jax.random.PRNGKey(0),
            jnp.asarray(uv),
            jnp.asarray(pts3d)[jnp.maximum(m["matches0"], 0)],
            jnp.asarray(K),
            m["matches0"] >= 0,
            n_hyp=128,
        )
        pose_gt = np.eye(4, dtype=np.float32)
        pose_gt[:3, :3] = R
        pose_gt[:3, 3] = t
        r_err, t_err = query_pose_error(out["pose"], jnp.asarray(pose_gt))
        assert float(r_err) < 1.0 and float(t_err) < 1.0


class TestPipeline:
    @pytest.mark.slow
    def test_pipeline_shapes_and_finiteness(self):
        rng = np.random.default_rng(1)
        b, img, n_kpts, n3d, L = 2, 64, 64, 32, 4
        sp = SuperPoint()
        matcher = GATsSPG(num_blocks=1)
        pipe = PosePipeline(
            sp, matcher, max_keypoints=n_kpts, ransac_hypotheses=32
        )
        images = jnp.asarray(rng.random((b, img, img, 1), np.float32))
        K = jnp.broadcast_to(
            jnp.asarray(
                [[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], jnp.float32
            ),
            (b, 3, 3),
        )
        anno = ObjectAnnotation(
            points3d=jnp.asarray(rng.normal(size=(n3d, 3)) * 0.1, jnp.float32),
            desc3d=jnp.asarray(rng.normal(size=(n3d, 256)), jnp.float32),
            leaf_desc=jnp.asarray(
                rng.normal(size=(n3d, L, 256)), jnp.float32
            ),
            mask3d=jnp.ones((n3d,), bool),
            leaf_mask=jnp.ones((n3d, L), bool),
        )
        key = jax.random.PRNGKey(0)
        sp_params = sp.init(key, images[:1])
        m_params = matcher.init(
            key,
            jnp.zeros((1, n_kpts, 256), jnp.float32),
            anno.desc3d[None],
            anno.leaf_desc[None],
            jnp.ones((1, n_kpts), bool),
            anno.mask3d[None],
            anno.leaf_mask[None],
        )
        out = pipe(sp_params, m_params, images, K, anno)
        assert out["pose"].shape == (b, 4, 4)
        assert np.all(np.isfinite(np.asarray(out["pose"])))
        assert out["matches0"].shape == (b, n_kpts)
        # Unmatched / failed frames fall back to finite identity-like poses.
        assert np.all(np.isfinite(np.asarray(out["matching_scores0"])))

    @pytest.mark.slow
    def test_multi_object_batched_annotation(self):
        """Mixed-object serving batch: a batched ObjectAnnotation (one
        object per frame, stack_annotations) must produce the same
        poses/matches as per-object single-annotation calls — the
        reference evaluates objects strictly serially
        (inference.py:185-198); here one fused program serves them."""
        from onepose_tpu.runtime.pipeline import stack_annotations

        rng = np.random.default_rng(9)
        b, img, n_kpts, n3d, L = 4, 64, 64, 32, 4
        sp = SuperPoint()
        matcher = GATsSPG(num_blocks=1)
        pipe = PosePipeline(
            sp, matcher, max_keypoints=n_kpts, ransac_hypotheses=32
        )
        images = jnp.asarray(rng.random((b, img, img, 1), np.float32))
        K = jnp.broadcast_to(
            jnp.asarray(
                [[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], jnp.float32
            ),
            (b, 3, 3),
        )

        def make_anno(seed):
            r = np.random.default_rng(seed)
            return ObjectAnnotation(
                points3d=jnp.asarray(
                    r.normal(size=(n3d, 3)) * 0.1, jnp.float32
                ),
                desc3d=jnp.asarray(r.normal(size=(n3d, 256)), jnp.float32),
                leaf_desc=jnp.asarray(
                    r.normal(size=(n3d, L, 256)), jnp.float32
                ),
                mask3d=jnp.ones((n3d,), bool),
                leaf_mask=jnp.ones((n3d, L), bool),
            )

        annos = [make_anno(s) for s in (0, 1)]
        # Frames alternate objects: [obj0, obj1, obj0, obj1].
        batched = stack_annotations([annos[i % 2] for i in range(b)])
        assert batched.batched and not annos[0].batched

        key = jax.random.PRNGKey(0)
        sp_params = sp.init(key, images[:1])
        m_params = matcher.init(
            key,
            jnp.zeros((1, n_kpts, 256), jnp.float32),
            annos[0].desc3d[None],
            annos[0].leaf_desc[None],
            jnp.ones((1, n_kpts), bool),
            annos[0].mask3d[None],
            annos[0].leaf_mask[None],
        )
        out = pipe(sp_params, m_params, images, K, batched, key)

        # Reference: each frame served with its own single annotation
        # (same RANSAC key per frame slot via the batch key split).
        for i in range(b):
            ref = pipe(
                sp_params,
                m_params,
                jnp.broadcast_to(images[i], (b,) + images.shape[1:]),
                K,
                annos[i % 2],
                key,
            )
            np.testing.assert_allclose(
                np.asarray(out["pose"][i]),
                np.asarray(ref["pose"][i]),
                atol=1e-4,
            )
            np.testing.assert_array_equal(
                np.asarray(out["matches0"][i]),
                np.asarray(ref["matches0"][i]),
            )

        # Sharded serving path accepts the batched annotation too.
        from onepose_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=4, n_points=1)
        out_sh = pipe.sharded(mesh)(
            sp_params, m_params, images, K, batched, key
        )
        np.testing.assert_allclose(
            np.asarray(out_sh["pose"]),
            np.asarray(out["pose"]),
            atol=1e-4,
        )

    @pytest.mark.slow
    def test_bf16_serving_default_agrees_with_fp32(self):
        """Default-constructed PosePipeline computes the GNN/convs in bf16
        (serving default); keypoints must agree with the fp32 pipeline at
        high rate and outputs stay finite."""
        rng = np.random.default_rng(5)
        b, img, n_kpts = 2, 64, 64
        pipe16 = PosePipeline(max_keypoints=n_kpts, ransac_hypotheses=32)
        assert pipe16.superpoint.dtype == jnp.bfloat16
        pipe32 = PosePipeline(
            max_keypoints=n_kpts,
            ransac_hypotheses=32,
            compute_dtype=jnp.float32,
        )
        images = jnp.asarray(rng.random((b, img, img, 1), np.float32))
        key = jax.random.PRNGKey(0)
        p16 = pipe16.superpoint.init(key, images[:1])
        p32 = pipe32.superpoint.init(key, images[:1])
        # Identical parameter trees (params stay fp32; dtype only affects
        # compute) — converted checkpoints load into either.
        chex.assert_trees_all_close(p16, p32)
        d16 = pipe16.superpoint.apply(p16, images)
        d32 = pipe32.superpoint.apply(p32, images)
        f16 = extract_keypoints(
            d16["score_map"], d16["descriptor_map"], max_keypoints=n_kpts
        )
        f32 = extract_keypoints(
            d32["score_map"], d32["descriptor_map"], max_keypoints=n_kpts
        )
        agree = 0.0
        for i in range(b):
            s16 = {
                tuple(k)
                for k, v in zip(
                    np.asarray(f16["keypoints"][i]), np.asarray(f16["mask"][i])
                )
                if v
            }
            s32 = {
                tuple(k)
                for k, v in zip(
                    np.asarray(f32["keypoints"][i]), np.asarray(f32["mask"][i])
                )
                if v
            }
            agree += len(s16 & s32) / max(len(s32), 1) / b
        assert agree > 0.9, agree
        assert np.isfinite(np.asarray(d16["descriptor_map"])).all()


class TestTraining:
    def _batch(self, rng, b=8, n2=32, n3=16, L=4, C=256):
        conf_gt = np.zeros((b, n2, n3), np.float32)
        for i in range(min(n2, n3)):
            conf_gt[:, i, i] = 1.0
        return {
            "desc2d": jnp.asarray(rng.normal(size=(b, n2, C)), jnp.float32),
            "desc3d": jnp.asarray(rng.normal(size=(b, n3, C)), jnp.float32),
            "leaf_desc": jnp.asarray(
                rng.normal(size=(b, n3, L, C)), jnp.float32
            ),
            "mask2d": jnp.ones((b, n2), bool),
            "mask3d": jnp.ones((b, n3), bool),
            "leaf_mask": jnp.ones((b, n3, L), bool),
            "conf_gt": jnp.asarray(conf_gt),
        }

    def test_focal_loss_basics(self):
        conf = jnp.array([[[0.9, 0.1], [0.2, 0.8]]])
        target = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
        good = float(focal_loss(conf, target))
        bad = float(focal_loss(1.0 - conf, target))
        assert good < bad
        assert np.isfinite(good)
        # Extreme confidences stay finite (clipping).
        assert np.isfinite(
            float(focal_loss(jnp.zeros((1, 2, 2)), target))
        )

    @pytest.mark.slow
    def test_train_step_descends(self):
        rng = np.random.default_rng(2)
        batch = self._batch(rng)
        model = GATsSPG(num_blocks=1)
        cfg = TrainConfig(steps_per_epoch=100)
        state = create_train_state(jax.random.PRNGKey(0), model, cfg, batch)
        step = jax.jit(make_train_step(model, cfg))
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.all(np.isfinite(losses))

    def test_lr_milestones_respect_accumulation(self):
        """Milestones are epochs; the schedule is indexed by optimizer
        updates, which advance once per `accumulate` micro-batches under
        optax.MultiSteps. The LR must halve exactly at each epoch boundary
        for accumulate in {1, 2} (reference MultiStepLR semantics,
        src/models/GATsSPG_lightning_model.py:117-127)."""
        import optax

        from onepose_tpu.train.train_step import (
            make_lr_schedule,
            make_optimizer,
        )

        for accumulate in (1, 2):
            cfg = TrainConfig(
                lr=1e-3,
                lr_gamma=0.5,
                milestones=(5, 10),
                steps_per_epoch=100,
                accumulate=accumulate,
            )
            sched = make_lr_schedule(cfg)
            updates_per_epoch = cfg.steps_per_epoch // accumulate
            np.testing.assert_allclose(
                float(sched(5 * updates_per_epoch - 1)), 1e-3, rtol=1e-6
            )
            np.testing.assert_allclose(
                float(sched(5 * updates_per_epoch)), 5e-4, rtol=1e-6
            )
            np.testing.assert_allclose(
                float(sched(10 * updates_per_epoch)), 2.5e-4, rtol=1e-6
            )

            # End-to-end: after 5 epochs of micro-batches the optimizer's
            # update count must sit exactly at the first milestone, so the
            # very next update uses the halved LR.
            if accumulate > 1:
                tx = make_optimizer(cfg)
                params = {"w": jnp.zeros(4)}
                grads = {"w": jnp.ones(4)}
                opt_state = tx.init(params)
                n_micro = 5 * cfg.steps_per_epoch

                def body(state, _):
                    _, state = tx.update(grads, state, params)
                    return state, None

                opt_state, _ = jax.lax.scan(
                    body, opt_state, None, length=n_micro
                )
                assert isinstance(opt_state, optax.MultiStepsState)
                n_updates = int(opt_state.gradient_step)
                assert n_updates == n_micro // accumulate
                np.testing.assert_allclose(
                    float(sched(n_updates)), 5e-4, rtol=1e-6
                )

    @pytest.mark.slow
    def test_train_step_sharded_matches_single(self):
        """The same step on a (4, 2) mesh with dp + points sharding must
        produce the same loss as the unsharded run."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from onepose_tpu.parallel.mesh import (
            make_mesh,
            DATA_AXIS,
            POINTS_AXIS,
        )

        rng = np.random.default_rng(3)
        batch = self._batch(rng, b=4, n3=16)
        model = GATsSPG(num_blocks=1)
        cfg = TrainConfig(steps_per_epoch=100)
        state = create_train_state(jax.random.PRNGKey(0), model, cfg, batch)
        step_fn = make_train_step(model, cfg)

        _, metrics_ref = jax.jit(step_fn)(state, batch)

        mesh = make_mesh(n_points=2)

        def spec_for(name):
            if name in ("desc3d", "mask3d", "leaf_desc", "leaf_mask"):
                return P(DATA_AXIS, POINTS_AXIS)
            if name == "conf_gt":
                return P(DATA_AXIS, None, POINTS_AXIS)
            return P(DATA_AXIS)

        batch_sh = {
            k: jax.device_put(v, NamedSharding(mesh, spec_for(k)))
            for k, v in batch.items()
        }
        repl = NamedSharding(mesh, P())
        state_sh = jax.device_put(state, jax.tree.map(lambda _: repl, state))
        step = jax.jit(step_fn)
        _, metrics = step(state_sh, batch_sh)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-5
        )


class TestShardedPipeline:
    @pytest.mark.slow
    def test_sharded_matches_single_device(self):
        """Data-parallel SPMD serving over the 8-device mesh must produce
        the same poses as the single-device path (fp32 CPU: exact)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from onepose_tpu.models.gats_spg import GATsSPG
        from onepose_tpu.models.superpoint import SuperPoint
        from onepose_tpu.parallel.mesh import make_mesh
        from onepose_tpu.runtime.pipeline import ObjectAnnotation, PosePipeline

        rng = np.random.default_rng(0)
        b, img, n3, L = 8, 64, 64, 4
        sp = SuperPoint()
        matcher = GATsSPG(num_blocks=1)
        pipe = PosePipeline(sp, matcher, max_keypoints=64,
                            ransac_hypotheses=64)
        images = jnp.asarray(rng.random((b, img, img, 1), np.float32))
        K = jnp.broadcast_to(
            jnp.asarray(
                [[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], jnp.float32
            ),
            (b, 3, 3),
        )
        anno = ObjectAnnotation(
            points3d=jnp.asarray(rng.normal(size=(n3, 3)) * 0.1, jnp.float32),
            desc3d=jnp.asarray(rng.normal(size=(n3, 256)), jnp.float32),
            leaf_desc=jnp.asarray(
                rng.normal(size=(n3, L, 256)), jnp.float32
            ),
            mask3d=jnp.ones((n3,), bool),
            leaf_mask=jnp.ones((n3, L), bool),
        )
        sp_params = sp.init(jax.random.PRNGKey(0), images[:1])
        m_params = matcher.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 256), jnp.float32),
            anno.desc3d[None],
            anno.leaf_desc[None],
            jnp.ones((1, 64), bool),
            anno.mask3d[None],
            anno.leaf_mask[None],
        )
        key = jax.random.PRNGKey(7)
        out_single = pipe(sp_params, m_params, images, K, anno, key)

        mesh = make_mesh(n_data=8, n_points=1)
        run = pipe.sharded(mesh)
        out_sharded = run(sp_params, m_params, images, K, anno, key)
        np.testing.assert_allclose(
            np.asarray(out_sharded["pose"]),
            np.asarray(out_single["pose"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(out_sharded["matches0"]),
            np.asarray(out_single["matches0"]),
        )
