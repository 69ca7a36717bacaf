"""Distributed BA: sharded solve must match the single-device solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onepose_tpu.ops.lm import ba_solve
from onepose_tpu.parallel.distributed_ba import (
    distributed_ba_solve,
    partition_obs_by_point,
)
from onepose_tpu.parallel.mesh import make_mesh

from test_ops import make_ba_problem


@pytest.mark.parametrize("n_shards", [2, 4])
def test_matches_single_device(n_shards):
    rng = np.random.default_rng(0)
    prob = make_ba_problem(rng, n_pts=64, n_cams=5)
    n_pts = 64
    mask = np.ones(len(prob["pt_idx"]), bool)
    cams0 = prob["cams0"].copy()
    cams0[0] = prob["cams_gt"][0]
    fix = jnp.zeros(5, jnp.float32).at[0].set(1.0)

    ref = ba_solve(
        jnp.asarray(prob["pts0"]),
        jnp.asarray(cams0),
        jnp.asarray(prob["features"]),
        jnp.asarray(prob["pt_idx"]),
        jnp.asarray(prob["cam_idx"]),
        jnp.asarray(mask),
        fix_cam_mask=fix,
        n_iters=10,
    )

    mesh = make_mesh(n_points=n_shards)
    feats, pt_l, cam_l, m = partition_obs_by_point(
        n_pts, n_shards, prob["features"], prob["pt_idx"],
        prob["cam_idx"], mask,
    )
    out = distributed_ba_solve(
        mesh,
        jnp.asarray(prob["pts0"]),
        jnp.asarray(cams0),
        jnp.asarray(feats),
        jnp.asarray(pt_l),
        jnp.asarray(cam_l),
        jnp.asarray(m),
        fix_cam_mask=fix,
        n_iters=10,
    )
    assert float(out["cost_final"]) < float(out["cost_initial"]) * 1e-3
    # Identical math -> near-identical result to the single-device solver.
    np.testing.assert_allclose(
        np.asarray(out["points"]), np.asarray(ref["points"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["cam_poses"]), np.asarray(ref["cam_poses"]),
        atol=1e-4,
    )
    # Both land near ground truth (loose gate: a single anchored camera
    # leaves the scale gauge free, so a small uniform drift is expected).
    err = np.linalg.norm(
        np.asarray(out["points"]) - prob["pts_gt"], axis=-1
    )
    assert err.mean() < 2e-2


def test_partition_covers_all_observations():
    rng = np.random.default_rng(1)
    prob = make_ba_problem(rng, n_pts=32, n_cams=3)
    mask = rng.random(len(prob["pt_idx"])) > 0.2
    feats, pt_l, cam_l, m = partition_obs_by_point(
        32, 4, prob["features"], prob["pt_idx"], prob["cam_idx"], mask
    )
    assert m.sum() == mask.sum()
    # Every local id stays within its shard block.
    assert pt_l.max() < 32 // 4
