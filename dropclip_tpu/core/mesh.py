"""Device mesh + sharding helpers.

The reference's one parallelism strategy is single-node data parallelism via
NCCL DDP (reference tools/train_distil.py:98-144, SURVEY §2.3). TPU-natively
that is a 1-D ``Mesh`` over all chips with the batch sharded on the ``data``
axis and parameters replicated; XLA inserts the gradient all-reduces over ICI.
We additionally expose a ``point`` axis so large point clouds can shard the
voxel/point dimension of fusion segment reductions (this project's analogue
of sequence parallelism — SURVEY §5 long-context).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINT_AXIS = "point"


def make_mesh(
    n_data: Optional[int] = None,
    n_point: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, point) mesh over the available devices.

    Defaults to all devices on the data axis — the reference's DDP topology.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_point
    assert n_data * n_point <= len(devices), (
        f"mesh {n_data}x{n_point} needs {n_data * n_point} devices, "
        f"have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_point]).reshape(n_data, n_point)
    return Mesh(grid, (DATA_AXIS, POINT_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def point_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (point) dim over the point axis."""
    return NamedSharding(mesh, P(POINT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh: Mesh):
    """Device-put a host pytree with leading batch dims onto the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def all_reduce_mean_host(values):
    """Mean of per-process scalar metrics across JAX processes (replaces
    the reference's dist.all_reduce-then-divide, engine/distil.py:475-493).
    Single-process: identity."""
    import numpy as np

    if jax.process_count() == 1:
        return values
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    arr = jnp.asarray(np.asarray(values, np.float32))
    return np.asarray(
        multihost_utils.process_allgather(arr)).mean(axis=0)


def concat_all_gather_host(array):
    """Concatenate a per-process array across processes (replaces the
    reference's concat_all_gather, utils/misc.py:85-97)."""
    import numpy as np

    if jax.process_count() == 1:
        return array
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jax.numpy.asarray(array))
    return np.asarray(gathered).reshape((-1,) + tuple(array.shape[1:]))
