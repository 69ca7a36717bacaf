"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINTS_AXIS = "points"


def make_mesh(
    n_data: Optional[int] = None,
    n_points: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, points) mesh.

    Defaults to all available devices on the data axis. The points axis
    shards the 3D-point dimension of the matcher (sequence parallelism);
    it should divide the padded point count.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_points
    devs = np.asarray(devices[: n_data * n_points]).reshape(n_data, n_points)
    return Mesh(devs, (DATA_AXIS, POINTS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def points_sharding(mesh: Mesh, points_axis: int, ndim: int) -> NamedSharding:
    """Shard axis 0 over data and `points_axis` over the points axis."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    spec[points_axis] = POINTS_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree so axis 0 is sharded over the data axis.

    Multi-process safe: when the mesh spans processes (multi-host DCN
    training), each process holds the identical host batch and
    materializes only its addressable shards via
    jax.make_array_from_callback — jax.device_put cannot target
    non-addressable devices."""
    if jax.process_count() > 1:
        def to_global(x):
            x = np.asarray(x)
            sh = batch_sharding(mesh, x.ndim)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx]
            )

        return jax.tree.map(to_global, batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def replicate_pytree(mesh: Mesh, tree):
    """Replicate a (process-locally identical) pytree over a possibly
    process-spanning mesh."""
    if jax.process_count() > 1:
        def to_global(x):
            x = np.asarray(x)
            sh = replicated(mesh)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx]
            )

        return jax.tree.map(to_global, tree)
    return jax.device_put(tree, replicated(mesh))
