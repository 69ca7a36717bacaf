"""Map-block SfM parallelism: batched pair matching over a device mesh.

The reference matches covisibility pairs one at a time on one GPU
(src/sfm/match_features.py:45-85, a `for (name0, name1) in pairs` loop
around a single SuperGlue forward). On TPU the pair axis IS the
map-block axis from SURVEY §2.3 ("multi-object / map-block
parallelism"): pairs have no cross-pair interaction, so matching is
pure data parallelism over fixed-size chunks of pairs, sharded over the
mesh's data axis when one is given (zero collectives — GSPMD runs each
shard locally).

Data movement design: the sequence's feature arrays are uploaded to
device ONCE per object and the per-pair gather happens INSIDE the jitted
program (`jnp.take` on the frame axis). Per chunk, only the pair-index
vectors go up and the [chunk, N] match rows come down — on a tunneled
TPU this is the difference between ~128 MB and ~128 B of per-chunk
transfer. The frame axis is padded to a bucket (multiple of 32) so
rosters of different sequence lengths reuse one compiled program per
bucket instead of recompiling per object.

Both matchers return the `match_pairs(pairs) -> [P, N] int64` callable
that `sfm.mapping.run_mapping` and `sfm.cache.CachedPairMatcher`
consume, so caching/resume composes with sharding unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.parallel.mesh import batch_sharding, replicated

_F_BUCKET = 32  # frame-axis padding quantum (compile once per bucket)


def _chunk_size(pair_chunk: int, mesh) -> int:
    """Round the chunk up so the pair axis divides the data axis."""
    if mesh is None:
        return pair_chunk
    n = mesh.devices.size
    return max(pair_chunk, ((pair_chunk + n - 1) // n) * n)


def _pad_frames(x: np.ndarray) -> np.ndarray:
    """Pad axis 0 (frames) to the bucket size; padded rows are never
    indexed (pairs reference real frames only)."""
    F = x.shape[0]
    pad = (-F) % _F_BUCKET
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths)


def _put(arrays: dict, mesh) -> dict:
    """Upload feature arrays once — replicated across the mesh (the
    per-chunk gather output is what gets sharded, via its indices)."""
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in arrays.items()}
    r = replicated(mesh)
    return {k: jax.device_put(jnp.asarray(v), r) for k, v in arrays.items()}


def _run_chunked(fn, feats_dev: dict, pairs: np.ndarray, chunk: int, mesh):
    """Run `fn(feats..., ii, jj)` over the pair axis in fixed-size chunks.

    Pads the final chunk by repeating pair 0 (its outputs are dropped),
    so one compiled program serves the whole run."""
    n_pairs = len(pairs)
    outs = []
    for s in range(0, n_pairs, chunk):
        e = min(s + chunk, n_pairs)
        sel = pairs[s:e]
        if e - s < chunk:
            sel = np.concatenate(
                [sel, np.tile(sel[:1], (chunk - (e - s), 1))]
            )
        ii = jnp.asarray(sel[:, 0], jnp.int32)
        jj = jnp.asarray(sel[:, 1], jnp.int32)
        if mesh is not None:
            ii = jax.device_put(ii, batch_sharding(mesh, 1))
            jj = jax.device_put(jj, batch_sharding(mesh, 1))
        out = np.asarray(fn(ii=ii, jj=jj, **feats_dev))
        outs.append(out[: e - s])
    return np.concatenate(outs, axis=0)


# Jitted chunk programs are cached at module level (keyed by matcher
# config); shapes are bucketed, so multi-object rosters reuse compiled
# programs instead of recompiling per object.
@functools.lru_cache(maxsize=None)
def _nn_match_fn(distance_thresh: float):
    from onepose_tpu.models.nn_matcher import mutual_nn_match

    @jax.jit
    def _match(desc, mask, ii, jj):
        return mutual_nn_match(
            jnp.take(desc, ii, axis=0),
            jnp.take(desc, jj, axis=0),
            jnp.take(mask, ii, axis=0),
            jnp.take(mask, jj, axis=0),
            distance_thresh=distance_thresh,
        )["matches0"]

    return _match


@functools.lru_cache(maxsize=None)
def _superglue_match_fn(superglue, hw: tuple):
    @jax.jit
    def _match(params, kpts, desc, scores, mask, ii, jj):
        g = lambda x, idx: jnp.take(x, idx, axis=0)
        out = superglue.apply(
            params,
            g(kpts, ii), g(kpts, jj),
            g(desc, ii), g(desc, jj),
            g(scores, ii), g(scores, jj),
            hw, hw,
            g(mask, ii), g(mask, jj),
        )
        return out["matches0"]

    return _match


def make_nn_pair_matcher(
    descriptors: np.ndarray,
    mask: np.ndarray,
    distance_thresh: float = 0.7,
    mesh=None,
    pair_chunk: int = 16,
):
    """Batched mutual-NN pair matcher over [F, N, C] sequence features.

    Returns `match_pairs(pairs) -> [P, N] int64` (-1 = unmatched),
    numerically identical to the per-pair `mutual_nn_match` loop.
    """
    feats_dev = _put(
        {
            "desc": _pad_frames(np.asarray(descriptors)),
            "mask": _pad_frames(np.asarray(mask)),
        },
        mesh,
    )
    chunk = _chunk_size(pair_chunk, mesh)
    _match = _nn_match_fn(float(distance_thresh))
    n_kpts = descriptors.shape[1]

    def match_pairs(pairs) -> np.ndarray:
        pairs = np.asarray(pairs)
        if len(pairs) == 0:
            return np.zeros((0, n_kpts), np.int64)
        return _run_chunked(_match, feats_dev, pairs, chunk, mesh)

    return match_pairs


def make_superglue_pair_matcher(
    superglue,
    params,
    feats: dict,
    mesh=None,
    pair_chunk: int = 8,
):
    """Batched SuperGlue pair matcher over extracted sequence features.

    `feats` is the `extract_sequence_features` dict (keypoints [F, N, 2],
    descriptors [F, N, C], scores [F, N], mask [F, N], image_hw). The
    18-layer GNN + Sinkhorn runs once per chunk of pairs instead of once
    per pair (reference match_features.py:45-85), sharded over the mesh
    data axis when one is given.
    """
    feats_dev = _put(
        {
            "kpts": _pad_frames(np.asarray(feats["keypoints"])),
            "desc": _pad_frames(np.asarray(feats["descriptors"])),
            "scores": _pad_frames(np.asarray(feats["scores"])),
            "mask": _pad_frames(np.asarray(feats["mask"])),
        },
        mesh,
    )
    hw = tuple(feats["image_hw"])
    # HBM guard: each in-flight pair holds ~3 [N+1, N+1] fp32 coupling
    # buffers through Sinkhorn (reference SfM budget is 4096 kpts ->
    # ~200 MB/pair); cap the chunk near 1.5 GB of couplings per shard.
    n = np.asarray(feats["keypoints"]).shape[1]
    per_pair = 3 * 4 * (n + 1) * (n + 1)
    cap = max(1, int(1.5e9 // per_pair))
    if mesh is not None:
        cap *= mesh.devices.size
    chunk = _chunk_size(min(pair_chunk, cap), mesh)
    _match_fn = _superglue_match_fn(superglue, hw)
    _match = functools.partial(_match_fn, params)
    n_kpts = feats["keypoints"].shape[1]

    def match_pairs(pairs) -> np.ndarray:
        pairs = np.asarray(pairs)
        if len(pairs) == 0:
            return np.zeros((0, n_kpts), np.int64)
        return _run_chunked(_match, feats_dev, pairs, chunk, mesh)

    return match_pairs


def resolve_sfm_mesh(data_parallel) -> Optional[object]:
    """Mesh for the SfM front end per the `data_parallel` config value:
    False/None -> no mesh; True -> all local devices on the data axis;
    an int -> that many devices."""
    if not data_parallel:
        return None
    from onepose_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    n = len(devices) if data_parallel is True else int(data_parallel)
    n = max(1, min(n, len(devices)))
    if n == 1:
        return None
    return make_mesh(n_data=n, n_points=1, devices=devices[:n])
