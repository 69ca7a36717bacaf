"""Cross-process communication helpers (multi-host).

Replaces the reference's torch.distributed pickle-gather suite
(src/utils/comm.py:141-258, gloo all_gather of pickled objects padded to
max size) with structured-pytree collectives: inside jit, SPMD psum/gather
are compiler-inserted; at the Python level these helpers wrap
jax.experimental.multihost_utils for host-side aggregation (validation
metrics, eval-result reduction). Single-process (world size 1) degrades to
identity, matching comm.py:22-27 semantics.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (DCN) if configured; no-op otherwise.

    The reference sets up torch.distributed process groups through
    PyTorch-Lightning (src/utils/comm.py:84-98); here a pod slice or
    multi-host CPU ring is joined via jax.distributed. Arguments default
    to the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or an orchestrator-provided environment jax can
    auto-detect). Safe to call unconditionally: single-process runs with
    no coordinator configured are left untouched.
    """
    import os

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return  # single-process / auto-detected environments
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    except RuntimeError:
        # Already initialized (idempotent callers).
        pass


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across processes (no-op for a single process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("onepose_tpu.comm.synchronize")


def all_gather_pytree(tree: Any) -> list:
    """Gather a numeric pytree from every process; returns a list of
    per-process pytrees on all processes (comm.all_gather parity —
    structured arrays instead of pickles)."""
    n = jax.process_count()
    if n == 1:
        return [tree]
    from jax.experimental import multihost_utils

    def gather_leaf(x):
        x = np.asarray(x)
        stacked = multihost_utils.process_allgather(x)
        return stacked  # [P, ...]

    gathered = jax.tree.map(gather_leaf, tree)
    return [
        jax.tree.map(lambda g, i=i: g[i], gathered) for i in range(n)
    ]


def reduce_dict(d: dict, average: bool = True) -> dict:
    """Mean/sum scalar dicts across processes (comm.reduce_dict parity,
    comm.py:231-258)."""
    n = jax.process_count()
    if n == 1:
        return {k: float(v) for k, v in d.items()}
    gathered = all_gather_pytree({k: np.float64(v) for k, v in d.items()})
    out = {}
    for k in d:
        vals = [float(g[k]) for g in gathered]
        out[k] = sum(vals) / n if average else sum(vals)
    return out
