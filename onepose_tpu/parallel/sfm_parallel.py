"""Map-block SfM parallelism: batched pair matching over a device mesh.

The reference matches covisibility pairs one at a time on one GPU
(src/sfm/match_features.py:45-85, a `for (name0, name1) in pairs` loop
around a single SuperGlue forward). On TPU the pair axis IS the
map-block axis from SURVEY §2.3 ("multi-object / map-block
parallelism"): pairs have no cross-pair interaction, so matching is
pure data parallelism — gather per-pair features into a stacked batch,
pad the pair axis to a chunk that divides the mesh's data axis, and let
GSPMD run each shard locally with zero collectives. The same chunked
program is reused across all chunks (and across objects), so the
matcher compiles exactly once per map run.

Both matchers return the `match_pairs(pairs) -> [P, N] int64` callable
that `sfm.mapping.run_mapping` and `sfm.cache.CachedPairMatcher`
consume, so caching/resume composes with sharding unchanged.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.parallel.mesh import batch_sharding


def _chunk_size(pair_chunk: int, mesh) -> int:
    """Round the chunk up so the pair axis divides the data axis."""
    if mesh is None:
        return pair_chunk
    n = mesh.devices.size
    return max(pair_chunk, ((pair_chunk + n - 1) // n) * n)


def _run_chunked(fn, arrays: dict, n_pairs: int, chunk: int, mesh) -> np.ndarray:
    """Run `fn(**arrays_chunk)` over the pair axis in fixed-size chunks.

    Pads the final chunk by repeating row 0 (its outputs are dropped), so
    the jitted program has one static shape for the whole run.
    """
    outs = []
    for s in range(0, n_pairs, chunk):
        e = min(s + chunk, n_pairs)
        idx = np.arange(s, e)
        if e - s < chunk:
            idx = np.concatenate(
                [idx, np.zeros(chunk - (e - s), np.int64)]
            )
        batch = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        if mesh is not None:
            batch = {
                k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                for k, v in batch.items()
            }
        out = np.asarray(fn(**batch))
        outs.append(out[: e - s])
    return np.concatenate(outs, axis=0)


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
    from onepose_tpu.models.nn_matcher import mutual_nn_match

    descriptors = np.asarray(descriptors)
    mask = np.asarray(mask)
    chunk = _chunk_size(pair_chunk, mesh)

    @jax.jit
    def _match(d0, d1, m0, m1):
        return mutual_nn_match(
            d0, d1, m0, m1, distance_thresh=distance_thresh
        )["matches0"]

    def match_pairs(pairs) -> np.ndarray:
        pairs = np.asarray(pairs)
        if len(pairs) == 0:
            return np.zeros((0, descriptors.shape[1]), np.int64)
        arrays = {
            "d0": descriptors[pairs[:, 0]],
            "d1": descriptors[pairs[:, 1]],
            "m0": mask[pairs[:, 0]],
            "m1": mask[pairs[:, 1]],
        }
        return _run_chunked(_match, arrays, len(pairs), chunk, mesh)

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
    kpts = np.asarray(feats["keypoints"])
    desc = np.asarray(feats["descriptors"])
    scores = np.asarray(feats["scores"])
    mask = np.asarray(feats["mask"])
    hw = tuple(feats["image_hw"])
    chunk = _chunk_size(pair_chunk, mesh)

    @jax.jit
    def _match(k0, k1, d0, d1, s0, s1, m0, m1):
        out = superglue.apply(
            params, k0, k1, d0, d1, s0, s1, hw, hw, m0, m1
        )
        return out["matches0"]

    def match_pairs(pairs) -> np.ndarray:
        pairs = np.asarray(pairs)
        if len(pairs) == 0:
            return np.zeros((0, kpts.shape[1]), np.int64)
        i, j = pairs[:, 0], pairs[:, 1]
        arrays = {
            "k0": kpts[i], "k1": kpts[j],
            "d0": desc[i], "d1": desc[j],
            "s0": scores[i], "s1": scores[j],
            "m0": mask[i], "m1": mask[j],
        }
        return _run_chunked(_match, arrays, len(pairs), chunk, mesh)

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
