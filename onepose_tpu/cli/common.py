"""Shared CLI plumbing: model loading, feature extraction over sequences."""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.data import paths as path_utils
from onepose_tpu.models import GATsSPG, SuperPoint
from onepose_tpu.models.superpoint import extract_keypoints


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache for CLI invocations.

    Every CLI entry pays full XLA compilation on a cold start (demo/detect
    one-off programs compile in 28-55 s on the tunneled chip); with the
    cache, a repeat invocation of the same command reloads compiled
    executables from disk in milliseconds. cache_dir=None picks the
    default ~/.cache/onepose_tpu/xla_cache (override per run with the
    `compilation_cache_dir=` config key); an empty string disables.
    Returns the active cache dir (or None when disabled)."""
    if cache_dir == "":
        return None
    cache_dir = cache_dir or osp.join(
        osp.expanduser("~"), ".cache", "onepose_tpu", "xla_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache even fast-compiling programs: CLI runs compile dozens of small
    # jitted helpers whose compile times add up across invocations.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


# One jitted forward per model config, shared across calls: multi-object
# rosters (reference run.py:96-137 loops ~50 objects) reuse the compiled
# extractor program instead of recompiling per object.
_JITTED_APPLY: dict = {}


def _jitted_apply(model):
    fn = _JITTED_APPLY.get(model)
    if fn is None:
        fn = jax.jit(model.apply)
        _JITTED_APPLY[model] = fn
    return fn


def load_superpoint_params(
    model: SuperPoint, weights: Optional[str], key=None
):
    """Load SuperPoint params from a torch .pth (converted) or a msgpack
    checkpoint; random init when weights is None (smoke/bench mode)."""
    if weights is None:
        key = key or jax.random.PRNGKey(0)
        return model.init(key, jnp.zeros((1, 64, 64, 1), jnp.float32))
    if weights.endswith((".pth", ".tar", ".pt", ".ckpt")):
        import torch

        from onepose_tpu.models.convert import superpoint_from_torch

        sd = torch.load(weights, map_location="cpu")
        sd = sd.get("state_dict", sd)
        return superpoint_from_torch(sd)
    from onepose_tpu.utils.checkpoint import load_checkpoint

    key = key or jax.random.PRNGKey(0)
    example = model.init(key, jnp.zeros((1, 64, 64, 1), jnp.float32))
    return load_checkpoint(weights, example)


def load_matcher_params(
    model: GATsSPG, weights: Optional[str], key=None, shapes=(16, 8, 4, 256)
):
    n2, n3, L, C = shapes
    key = key or jax.random.PRNGKey(0)
    example = model.init(
        key,
        jnp.zeros((1, n2, C), jnp.float32),
        jnp.zeros((1, n3, C), jnp.float32),
        jnp.zeros((1, n3, L, C), jnp.float32),
        jnp.ones((1, n2), bool),
        jnp.ones((1, n3), bool),
        jnp.ones((1, n3, L), bool),
    )
    if weights is None:
        return example
    if weights.endswith((".pth", ".tar", ".pt", ".ckpt")):
        import torch

        from onepose_tpu.models.convert import gats_spg_from_torch

        sd = torch.load(weights, map_location="cpu")
        sd = sd.get("state_dict", sd)
        return gats_spg_from_torch(sd)
    # msgpack: either bare params or a full TrainState saved by the train
    # loop (ckpt_<epoch>.msgpack / best.msgpack) — the reference's
    # load_from_checkpoint likewise accepts Lightning checkpoints that
    # carry optimizer state (inference.py:55).
    from flax import serialization

    with open(weights, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and {"step", "params", "opt_state"} <= set(raw):
        raw = raw["params"]
    return serialization.from_state_dict(example, raw)


def build_matcher(cfg: dict):
    """Construct the 2D-3D matcher per cfg['matcher']:
    - 'gats' (default): the learned GATsSPG (reference inference path,
      inference.py:49-77), params from cfg['weights']['matcher'];
    - 'nn': descriptor mutual-NN (NNMatcher2D3D) — the weight-free oracle
      path used by the end-to-end accuracy gate and quick diagnostics.
    Returns (matcher, params)."""
    kind = cfg.get("matcher", "gats")
    if kind == "nn":
        from onepose_tpu.models.nn_matcher import NNMatcher2D3D

        m = NNMatcher2D3D(
            distance_thresh=cfg.get("nn_distance_thresh", 0.7)
        )
        return m, {}
    assert kind == "gats", f"unknown matcher {kind!r}"
    matcher = GATsSPG()
    return matcher, load_matcher_params(matcher, cfg["weights"]["matcher"])


def load_superglue_params(
    model, weights: Optional[str], key=None, n: int = 16
):
    """Load SuperGlue params from a torch .pth (converted) or a msgpack
    checkpoint; random init when weights is None."""
    import jax.numpy as jnp

    key = key or jax.random.PRNGKey(0)
    example = model.init(
        key,
        jnp.zeros((1, n, 2)), jnp.zeros((1, n, 2)),
        jnp.zeros((1, n, model.d_model)), jnp.zeros((1, n, model.d_model)),
        jnp.zeros((1, n)), jnp.zeros((1, n)),
        (64, 64), (64, 64),
    )
    if weights is None:
        return example
    if weights.endswith((".pth", ".tar", ".pt", ".ckpt")):
        import torch

        from onepose_tpu.models.convert import superglue_from_torch

        sd = torch.load(weights, map_location="cpu")
        sd = sd.get("state_dict", sd)
        return superglue_from_torch(sd)
    from flax import serialization

    with open(weights, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(example, raw)


def build_feature_detector(
    db_seq_root: str,
    sp_params,
    sp_model: SuperPoint,
    n_ref_views: int = 15,
    max_keypoints: int = 1024,
    crop_size: int = 512,
    distance_thresh: float = 0.7,
    match_kind: str = "nn",
    sg_weights: Optional[str] = None,
):
    """Build a FeatureObjectDetector whose reference DB is SuperPoint
    features of views sampled from a mapping sequence (reference
    local_feature_2D_detector.py:52-74).

    match_kind: 'nn' (default — batched mutual-NN, the weight-free
    TPU-first matcher) or 'superglue' (the reference's detector matcher,
    local_feature_2D_detector.py:76-133; params from sg_weights, all V
    views matched in ONE batched forward). Returns (detector, db_feats).
    """
    from onepose_tpu.detector.feature_detector import (
        FeatureObjectDetector,
        ReferenceDB,
        select_reference_views,
    )
    from onepose_tpu.models.nn_matcher import mutual_nn_match

    db_feats = extract_sequence_features(
        db_seq_root, sp_params, sp_model, max_keypoints=max_keypoints
    )
    view_idx = select_reference_views(
        len(db_feats["image_paths"]), n_ref_views
    )
    db = ReferenceDB(
        keypoints=jnp.asarray(db_feats["keypoints"][view_idx]),
        descriptors=jnp.asarray(db_feats["descriptors"][view_idx]),
        scores=jnp.asarray(db_feats["scores"][view_idx]),
        mask=jnp.asarray(db_feats["mask"][view_idx]),
        sizes_hw=np.tile(db_feats["image_hw"], (len(view_idx), 1)),
    )

    def bc(x, V):
        x = jnp.asarray(x)
        return jnp.broadcast_to(x[None], (V,) + x.shape)

    if match_kind == "superglue":
        from onepose_tpu.models import SuperGlue

        sg = SuperGlue()
        sg_params = load_superglue_params(sg, sg_weights)
        db_hw = jnp.asarray(db.sizes_hw, jnp.float32)  # [V, 2]

        fwd = jax.jit(
            lambda p, k0, k1, d0, d1, s0, s1, m0, m1, hw1: sg.apply(
                p, k0, k1, d0, d1, s0, s1, db_hw, hw1, m0, m1
            )["matches0"]
        )

        def match_fn(db_, query):
            V = db_.descriptors.shape[0]
            q_hw = jnp.asarray(
                np.asarray(
                    query.get("image_hw", db_feats["image_hw"]),
                    np.float32,
                )
            )
            return fwd(
                sg_params,
                db_.keypoints, bc(query["keypoints"], V),
                db_.descriptors, bc(query["descriptors"], V),
                db_.scores, bc(query["scores"], V),
                db_.mask, bc(query["mask"], V),
                jnp.broadcast_to(q_hw[None], (V, 2)),
            )

    else:
        assert match_kind == "nn", f"unknown detector matcher {match_kind!r}"

        def match_fn(db_, query):
            V = db_.descriptors.shape[0]
            m = mutual_nn_match(
                db_.descriptors,
                bc(query["descriptors"], V),
                db_.mask,
                bc(query["mask"], V),
                distance_thresh=distance_thresh,
            )
            return m["matches0"]

    return (
        FeatureObjectDetector(db, match_fn, crop_size=crop_size),
        db_feats,
    )


def extract_sequence_features(
    seq_root: str,
    sp_params,
    model: SuperPoint,
    max_keypoints: int = 1024,
    keypoint_threshold: float = 0.005,
    det_type: str = "GT_box",
    batch: int = 8,
    mesh=None,
) -> dict:
    """Run SuperPoint over a sequence directory; returns stacked arrays
    keypoints [F, N, 2], descriptors [F, N, C], scores [F, N],
    mask [F, N], K [F, 3, 3], poses [F, 4, 4], image_paths.

    With `mesh`, frame batches are sharded over the mesh's data axis
    (map-block parallelism — frames are independent, so this is pure DP).
    The final batch is padded to the full batch size so one compiled
    program serves the whole sequence."""
    img_paths = path_utils.list_color_images(seq_root, det_type)
    if not img_paths:
        raise FileNotFoundError(f"no images under {seq_root}")
    fwd = _jitted_apply(model)

    feats, Ks, poses = [], [], []
    imgs_buf = []
    metas = []
    for p in img_paths:
        img, K, pose = path_utils.load_frame(p, det_type)
        imgs_buf.append(img)
        Ks.append(K)
        poses.append(pose)

    if mesh is not None:
        from onepose_tpu.parallel.mesh import batch_sharding

        n_dev = mesh.devices.size
        batch = max(batch, ((batch + n_dev - 1) // n_dev) * n_dev)

    h, w = imgs_buf[0].shape
    all_out = []
    for s in range(0, len(imgs_buf), batch):
        chunk = imgs_buf[s : s + batch]
        n_real = len(chunk)
        if n_real < batch:
            chunk = chunk + [chunk[0]] * (batch - n_real)
        x = jnp.asarray(np.stack(chunk))[..., None]
        if mesh is not None:
            x = jax.device_put(x, batch_sharding(mesh, x.ndim))
        dense = fwd(sp_params, x)
        out = extract_keypoints(
            dense["score_map"],
            dense["descriptor_map"],
            max_keypoints=max_keypoints,
            keypoint_threshold=keypoint_threshold,
        )
        out = jax.tree.map(lambda a: np.asarray(a)[:n_real], out)
        all_out.append(out)
    stacked = {
        k: np.concatenate([o[k] for o in all_out], axis=0)
        for k in all_out[0]
    }
    return {
        "keypoints": stacked["keypoints"],
        "descriptors": stacked["descriptors"],
        "scores": stacked["scores"],
        "mask": stacked["mask"],
        "K": np.stack(Ks),
        "poses": np.stack(poses),
        "image_paths": img_paths,
        "image_hw": (h, w),
    }
