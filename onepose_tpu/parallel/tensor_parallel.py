"""Megatron-style tensor parallelism for the GATsSPG matcher.

SURVEY §2.3 marks TP low-priority for this model (the whole parameter set
is ~12 MB, far below HBM), but the axis exists as a first-class option for
completeness and for larger descriptor widths. The design is the
jax-idiomatic one: NO model-code changes — a parameter PartitionSpec tree
plus jit/device_put. GSPMD then derives the communication:

- attention q/k/v projection kernels are COLUMN-sharded over the 'model'
  axis. The runtime uses head-major channel order (models/common.py:
  MultiHeadAttention — columns are [h * head_dim + d]), so a column shard
  IS a head shard: each device computes its own heads' attention with no
  communication, the TPU analogue of Megatron's per-head split.
- the attention merge kernel is ROW-sharded (input dim): each device
  contributes a partial output from its heads and GSPMD inserts ONE
  all-reduce per attention layer.
- MLP dense_0 is column-sharded, dense_1 row-sharded: one more all-reduce
  per layer, the classic Megatron MLP pattern. The instance norm between
  them is per-channel over the point axis, so it needs no communication
  on channel-sharded activations.
- biases follow their kernels (sharded for column-parallel layers,
  replicated for row-parallel outputs); everything else (GATs W/a, the
  final projection) is replicated — they are tiny.

Use: specs = gats_spg_tp_specs(params, mesh); then device_put the params
with NamedSharding(mesh, spec) (or pass as jit in_shardings). Composes
with the data axis (batch) of the same mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def make_tp_mesh(n_model: int, devices=None) -> Mesh:
    """A (data, model) mesh: batch over 'data', heads/channels over
    'model'. n_model must divide the head count (4) for the attention
    split to be communication-free."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devs, ("data", MODEL_AXIS))


def _spec_for(path: tuple[str, ...]) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if parent in ("proj_q", "proj_k", "proj_v"):
        # Column-parallel: output channels (head-major) sharded.
        return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
    if parent == "merge":
        # Row-parallel: input channels sharded, output all-reduced.
        return P(MODEL_AXIS, None) if leaf == "kernel" else P()
    if "mlp" in joined and parent == "dense_0":
        return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
    if "mlp" in joined and parent == "dense_1":
        return P(MODEL_AXIS, None) if leaf == "kernel" else P()
    return P()  # GATs W/a, final_proj, anything else: replicated


def gats_spg_tp_specs(params, mesh: Mesh):
    """PartitionSpec tree (same structure as params) implementing the
    Megatron split above. Apply with
    jax.device_put(params, jax.tree.map(lambda s: NamedSharding(mesh, s),
    specs)) or as jit in_shardings."""
    del mesh  # specs are mesh-independent; kept for API symmetry
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for(path), params
    )


def shard_params(params, mesh: Mesh):
    """device_put the parameter tree with the TP specs."""
    specs = gats_spg_tp_specs(params, mesh)
    return jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
