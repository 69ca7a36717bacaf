"""Distributed Schur-complement bundle adjustment over a device mesh.

The scaling north star (BASELINE.md / SURVEY.md §2.2): point blocks are
embarrassingly parallel, so points and their observations are sharded over
the mesh's "points" axis; each device assembles its local Hpp / coupling /
reduced-system contributions, the small dense camera system
(6W x 6W) is psum-reduced over ICI and solved replicated, and the point
back-substitution stays local. One jitted shard_map program per LM
iteration sweep — no host round trips.

Observation layout: the host partitions observations by point owner
(partition_obs_by_point), so every (point, its observations) pair lives on
one device and Hpp/back-substitution need no communication at all; only
the [W, 6, W, 6] reduced system and the cost scalar cross devices.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from onepose_tpu.ops.lm import _obs_jacobians, snavely_residuals
from onepose_tpu.parallel.mesh import POINTS_AXIS


def partition_obs_by_point(
    n_points: int,
    n_shards: int,
    features: np.ndarray,
    pt_idx: np.ndarray,
    cam_idx: np.ndarray,
    obs_mask: np.ndarray,
):
    """Host-side: group observations by point shard with padding.

    Points are block-partitioned: shard s owns points
    [s * P/D, (s+1) * P/D). Returns per-shard arrays stacked on axis 0:
    (features [D, M_max, 5], local_pt_idx [D, M_max], cam_idx [D, M_max],
    mask [D, M_max]). Local point ids are relative to the shard block.
    """
    assert n_points % n_shards == 0, (n_points, n_shards)
    block = n_points // n_shards
    owner = np.asarray(pt_idx) // block
    valid = np.asarray(obs_mask)
    per_shard = [
        np.nonzero((owner == s) & valid)[0] for s in range(n_shards)
    ]
    m_max = max((len(ix) for ix in per_shard), default=1)
    m_max = max(m_max, 1)

    f_out = np.zeros((n_shards, m_max, features.shape[-1]), features.dtype)
    p_out = np.zeros((n_shards, m_max), np.int32)
    c_out = np.zeros((n_shards, m_max), np.int32)
    m_out = np.zeros((n_shards, m_max), bool)
    for s, ix in enumerate(per_shard):
        n = len(ix)
        f_out[s, :n] = features[ix]
        p_out[s, :n] = pt_idx[ix] - s * block
        c_out[s, :n] = cam_idx[ix]
        m_out[s, :n] = True
    return f_out, p_out, c_out, m_out


def _local_assemble(points_l, cams, feats, pt_idx, cam_idx, mask, lam):
    """Per-device block assembly; returns local pieces + reduced-system
    contributions (to be psum'd)."""
    n_local = points_l.shape[0]
    n_cams = cams.shape[0]
    r, Jp, Jc = _obs_jacobians(
        points_l, cams, feats, pt_idx, cam_idx, mask
    )
    Hpp = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", Jp, Jp), pt_idx, n_local
    )
    bp = jax.ops.segment_sum(
        -jnp.einsum("mri,mr->mi", Jp, r), pt_idx, n_local
    )
    Hcc = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", Jc, Jc), cam_idx, n_cams
    )
    bc = jax.ops.segment_sum(
        -jnp.einsum("mri,mr->mi", Jc, r), cam_idx, n_cams
    )
    eye3 = jnp.eye(3, dtype=r.dtype)
    Hpp_d = Hpp + lam * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6
    )[..., None] * eye3
    Hpp_inv = jnp.linalg.inv(Hpp_d + 1e-9 * eye3)

    A = jnp.einsum("mri,mrj->mij", Jc, Jp)  # [M, 6, 3]
    seg = pt_idx * n_cams + cam_idx
    U = jax.ops.segment_sum(A, seg, n_local * n_cams).reshape(
        n_local, n_cams, 6, 3
    )
    UHinv = jnp.einsum("pcij,pjk->pcik", U, Hpp_inv)
    S_red = jnp.einsum("pcik,pdlk->cidl", UHinv, U)
    rhs_red = jnp.einsum("pcik,pk->ci", UHinv, bp)
    cost = 0.5 * jnp.sum(r * r)
    return {
        "Hcc": Hcc, "bc": bc, "S_red": S_red, "rhs_red": rhs_red,
        "Hpp_inv": Hpp_inv, "bp": bp, "U": U, "cost": cost,
    }


@partial(
    jax.jit,
    static_argnames=("mesh", "n_iters"),
)
def distributed_ba_solve(
    mesh,
    points: jnp.ndarray,
    cam_poses: jnp.ndarray,
    features: jnp.ndarray,
    pt_idx: jnp.ndarray,
    cam_idx: jnp.ndarray,
    obs_mask: jnp.ndarray,
    fix_cam_mask: jnp.ndarray | None = None,
    n_iters: int = 5,
    init_lambda: float = 1e-3,
) -> dict:
    """LM bundle adjustment with points sharded over mesh[POINTS_AXIS].

    points: [P, 3] (P divisible by the points-axis size); per-shard
    observation arrays from partition_obs_by_point, stacked on axis 0 =
    shard: features [D, M, 5], pt_idx [D, M] (local ids), cam_idx [D, M],
    obs_mask [D, M]. Cameras are replicated. Returns updated
    (points, cam_poses, costs).
    """
    from jax import shard_map

    D = mesh.shape[POINTS_AXIS]
    n_cams = cam_poses.shape[0]
    dtype = points.dtype
    fix = (
        fix_cam_mask
        if fix_cam_mask is not None
        else jnp.zeros((n_cams,), dtype)
    )

    def solver(points_blk, cams, feats_blk, pt_blk, cam_blk, mask_blk, fix):
        # Shapes inside: points_blk [P/D, 3]; *_blk [1, M, ...] (leading
        # shard axis of size 1 after sharding).
        feats = feats_blk[0]
        pt_l = pt_blk[0]
        cam_l = cam_blk[0]
        mask_l = mask_blk[0]

        def cost_fn(pts, cms):
            r = snavely_residuals(pts, cms, feats, pt_l, cam_l, mask_l)
            return jax.lax.psum(0.5 * jnp.sum(r * r), POINTS_AXIS)

        def lm_step(carry, _):
            pts, cms, lam = carry
            loc = _local_assemble(pts, cms, feats, pt_l, cam_l, mask_l, lam)
            Hcc = jax.lax.psum(loc["Hcc"], POINTS_AXIS)
            bc = jax.lax.psum(loc["bc"], POINTS_AXIS)
            S_red = jax.lax.psum(loc["S_red"], POINTS_AXIS)
            rhs_red = jax.lax.psum(loc["rhs_red"], POINTS_AXIS)

            eye6 = jnp.eye(6, dtype=dtype)
            Hcc_d = Hcc + lam * jnp.maximum(
                jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6
            )[..., None] * eye6
            S = jnp.zeros((n_cams, 6, n_cams, 6), dtype).at[
                jnp.arange(n_cams), :, jnp.arange(n_cams), :
            ].set(Hcc_d) - S_red
            rhs = bc - rhs_red
            free = 1.0 - fix
            S = S * free[:, None, None, None] * free[None, None, :, None]
            S = S.at[jnp.arange(n_cams), :, jnp.arange(n_cams), :].add(
                eye6[None] * fix[:, None, None]
            )
            rhs = rhs * free[:, None]
            dc = jnp.linalg.solve(
                S.reshape(n_cams * 6, n_cams * 6)
                + 1e-9 * jnp.eye(n_cams * 6, dtype=dtype),
                rhs.reshape(-1),
            ).reshape(n_cams, 6)

            Ut_dc = jnp.einsum("pcij,ci->pj", loc["U"], dc)
            dp = jnp.einsum(
                "pij,pj->pi", loc["Hpp_inv"], loc["bp"] - Ut_dc
            )

            c_old = cost_fn(pts, cms)
            c_new = cost_fn(pts + dp, cms + dc)
            improved = (c_new < c_old) & jnp.isfinite(c_new)
            pts = jnp.where(improved, pts + dp, pts)
            cms = jnp.where(improved, cms + dc, cms)
            lam = jnp.clip(
                jnp.where(improved, lam * 0.3, lam * 6.0), 1e-9, 1e6
            )
            return (pts, cms, lam), c_new

        c0 = cost_fn(points_blk, cams)
        (pts, cms, lam), _ = jax.lax.scan(
            lm_step,
            (points_blk, cams, jnp.asarray(init_lambda, dtype)),
            None,
            length=n_iters,
        )
        return pts, cms, c0, cost_fn(pts, cms)

    sharded = shard_map(
        solver,
        mesh=mesh,
        in_specs=(
            P(POINTS_AXIS, None),  # points
            P(),  # cameras replicated
            P(POINTS_AXIS, None, None),  # features [D, M, 5]
            P(POINTS_AXIS, None),
            P(POINTS_AXIS, None),
            P(POINTS_AXIS, None),
            P(),
        ),
        out_specs=(P(POINTS_AXIS, None), P(), P(), P()),
        check_vma=False,
    )
    pts, cams, c0, c1 = sharded(
        points, cam_poses, features, pt_idx, cam_idx, obs_mask, fix
    )
    return {
        "points": pts,
        "cam_poses": cams,
        "cost_initial": c0,
        "cost_final": c1,
    }
