"""Map-block SfM parallelism: batched/sharded pair matching must be
numerically identical to the reference-style serial per-pair loop
(src/sfm/match_features.py:45-85), and the `map` CLI must produce the
same reconstruction with data_parallel on and off."""

import json
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_tpu.models.nn_matcher import mutual_nn_match
from onepose_tpu.parallel.mesh import make_mesh
from onepose_tpu.parallel.sfm_parallel import (
    make_nn_pair_matcher,
    make_superglue_pair_matcher,
    resolve_sfm_mesh,
)


def _random_feats(rng, F=10, N=48, C=32, hw=(96, 96)):
    desc = rng.normal(size=(F, N, C)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    n_valid = rng.integers(N // 2, N + 1, size=F)
    mask = np.arange(N)[None] < n_valid[:, None]
    return {
        "keypoints": rng.uniform(0, hw[0], size=(F, N, 2)).astype(
            np.float32
        ),
        "descriptors": desc,
        "scores": rng.random((F, N)).astype(np.float32),
        "mask": mask,
        "image_hw": hw,
    }


def _random_pairs(rng, F, P):
    pairs = []
    while len(pairs) < P:
        i, j = rng.integers(0, F, size=2)
        if i != j:
            pairs.append((i, j))
    return np.asarray(pairs)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_nn_pair_matcher_matches_serial(use_mesh):
    rng = np.random.default_rng(0)
    feats = _random_feats(rng)
    pairs = _random_pairs(rng, 10, 11)  # odd count: exercises padding
    mesh = make_mesh(n_data=8, n_points=1) if use_mesh else None

    batched = make_nn_pair_matcher(
        feats["descriptors"], feats["mask"],
        distance_thresh=0.7, mesh=mesh, pair_chunk=4,
    )
    got = batched(pairs)

    want = np.stack(
        [
            np.asarray(
                mutual_nn_match(
                    jnp.asarray(feats["descriptors"][i]),
                    jnp.asarray(feats["descriptors"][j]),
                    jnp.asarray(feats["mask"][i]),
                    jnp.asarray(feats["mask"][j]),
                    distance_thresh=0.7,
                )["matches0"]
            )
            for i, j in pairs
        ]
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_superglue_pair_matcher_matches_serial(use_mesh):
    from onepose_tpu.models import SuperGlue

    rng = np.random.default_rng(1)
    feats = _random_feats(rng, F=6, N=32, C=256)
    pairs = _random_pairs(rng, 6, 5)
    mesh = make_mesh(n_data=8, n_points=1) if use_mesh else None

    sg = SuperGlue(num_layers=2, sinkhorn_iterations=10)
    N = feats["keypoints"].shape[1]
    params = sg.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, N, 2)), jnp.zeros((1, N, 2)),
        jnp.zeros((1, N, 256)), jnp.zeros((1, N, 256)),
        jnp.zeros((1, N)), jnp.zeros((1, N)),
        feats["image_hw"], feats["image_hw"],
    )
    batched = make_superglue_pair_matcher(
        sg, params, feats, mesh=mesh, pair_chunk=4
    )
    got = batched(pairs)

    apply_one = jax.jit(
        lambda k0, k1, d0, d1, s0, s1, m0, m1: sg.apply(
            params, k0, k1, d0, d1, s0, s1,
            feats["image_hw"], feats["image_hw"], m0, m1,
        )["matches0"]
    )
    want = np.stack(
        [
            np.asarray(
                apply_one(
                    jnp.asarray(feats["keypoints"][i])[None],
                    jnp.asarray(feats["keypoints"][j])[None],
                    jnp.asarray(feats["descriptors"][i])[None],
                    jnp.asarray(feats["descriptors"][j])[None],
                    jnp.asarray(feats["scores"][i])[None],
                    jnp.asarray(feats["scores"][j])[None],
                    jnp.asarray(feats["mask"][i])[None],
                    jnp.asarray(feats["mask"][j])[None],
                )[0]
            )
            for i, j in pairs
        ]
    )
    np.testing.assert_array_equal(got, want)


def test_resolve_sfm_mesh():
    assert resolve_sfm_mesh(False) is None
    assert resolve_sfm_mesh(None) is None
    assert resolve_sfm_mesh(1) is None
    m = resolve_sfm_mesh(True)
    assert m is not None and m.devices.size == len(jax.devices())
    m4 = resolve_sfm_mesh(4)
    assert m4.devices.size == 4


def test_global_ba_distributed_matches_single():
    """run_mapping with a mesh routes global BA through the distributed
    Schur solver (points sharded over all 8 devices, padded to the shard
    count); the refined map must agree with the single-device solver."""
    from onepose_tpu.sfm.mapping import MappingConfig, run_mapping
    from tests.test_sfm import make_scene, nn_pair_matcher

    rng = np.random.default_rng(5)
    scene = make_scene(rng, n_pts=200, n_frames=10, noise=1.0)
    base = dict(
        max_points3d=400, num_covis=5, global_ba=True, global_ba_iters=5
    )
    args = (
        scene["keypoints"], scene["descriptors"], scene["scores"],
        scene["mask"], scene["K"], scene["poses"],
        nn_pair_matcher(scene),
    )
    res_single = run_mapping(*args, config=MappingConfig(**base))
    mesh = make_mesh(n_data=1, n_points=8)
    res_dist = run_mapping(*args, config=MappingConfig(mesh=mesh, **base))

    assert "global_ba_rmse_final_px" in res_dist.stats
    s, d = res_single.stats, res_dist.stats
    assert d["global_ba_rmse_final_px"] <= d["global_ba_rmse_initial_px"]
    np.testing.assert_allclose(
        d["global_ba_rmse_final_px"],
        s["global_ba_rmse_final_px"],
        rtol=1e-3,
    )
    assert res_single.points_xyz.shape == res_dist.points_xyz.shape
    np.testing.assert_allclose(
        res_dist.points_xyz, res_single.points_xyz, atol=1e-4
    )


def test_infer_data_parallel_matches_serial(tmp_path, capsys):
    """`infer data_parallel=true` (PosePipeline.sharded over the 8-device
    mesh) must produce the same recall metrics as the single-device run."""
    from onepose_tpu.__main__ import main as cli_main
    from tests.test_cli import build_sequence

    rng = np.random.default_rng(11)
    seq_dir = build_sequence(tmp_path, rng, n_frames=8, img=96, n_pts=40)
    out_dir = str(tmp_path / "out")
    rc = cli_main(
        [
            "map",
            f"data_dir={seq_dir}",
            f"out_dir={out_dir}",
            "max_keypoints=128",
            "num_covis=3",
            "max_points3d=200",
        ]
    )
    assert rc == 0
    capsys.readouterr()

    metrics = {}
    for tag, dp in (("serial", "false"), ("dp", "true")):
        rc = cli_main(
            [
                "infer",
                f"data_dir={seq_dir}",
                f"anno_dir={osp.join(out_dir, 'anno')}",
                "max_keypoints=128",
                "shape3d=200",
                "batch=4",
                f"data_parallel={dp}",
            ]
        )
        assert rc == 0
        metrics[tag] = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
    assert metrics["dp"]["num_frames"] == metrics["serial"]["num_frames"]
    for k in ("cmd1", "cmd3", "cmd5"):
        np.testing.assert_allclose(
            metrics["dp"][k], metrics["serial"][k], atol=1e-9
        ), (k, metrics)


def test_map_data_parallel_matches_serial(tmp_path, capsys):
    """`map` with data_parallel=True reproduces the serial reconstruction
    bit-for-bit (same stats, same point count): frame extraction and pair
    matching are pure DP over the mesh."""
    from onepose_tpu.__main__ import main as cli_main
    from tests.test_cli import build_sequence

    rng = np.random.default_rng(3)
    seq_dir = build_sequence(tmp_path, rng, n_frames=8, img=96, n_pts=40)

    stats = {}
    for tag, dp in (("serial", "false"), ("dp", "true")):
        out_dir = str(tmp_path / f"out_{tag}")
        rc = cli_main(
            [
                "map",
                f"data_dir={seq_dir}",
                f"out_dir={out_dir}",
                "max_keypoints=128",
                "num_covis=3",
                "max_points3d=200",
                f"data_parallel={dp}",
                "pair_chunk=4",
            ]
        )
        assert rc == 0
        stats[tag] = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert osp.exists(osp.join(out_dir, "anno", "anno_index.json"))

    # stage_s is wall-clock timing — everything else must be identical.
    strip = lambda s: {k: v for k, v in s.items() if k != "stage_s"}
    assert strip(stats["serial"]) == strip(stats["dp"]), stats
