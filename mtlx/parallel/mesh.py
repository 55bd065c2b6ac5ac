"""Device mesh + sharding helpers — the framework's parallelism layer.

Replaces the reference's entire distribution stack (SURVEY.md §3.9:
model_deploy clones for in-graph data parallelism, gRPC parameter servers
for multi-host) with the TPU-native single-program model:

  * one `jax.sharding.Mesh` over all chips; axis "data" for batch
    data-parallelism (the detector fits one chip, so TP/PP/EP axes are
    intentionally absent — documented in SURVEY.md §6.7/§3.9)
  * parameters replicated, batch sharded on "data"
  * gradients all-reduced by XLA over ICI (psum inserted by jit from the
    sharding annotations — no hand-written collectives, no PS, and sync
    SGD semantics matching the reference's sync_replicas=true mode)
  * multi-host: same program on every process; each host feeds its local
    shard (see mtlx/data/loader.py process sharding)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def create_mesh_for_batch(batch_size: int,
                          devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Data-parallel mesh using the largest device count that divides
    batch_size (a batch must shard evenly over the data axis)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n < len(devices):
        # the reference errors loudly when clones don't divide the batch;
        # we shrink the mesh but never silently — dropped chips are lost
        # throughput
        import warnings

        warnings.warn(
            f"batch_size={batch_size} does not divide over {len(devices)} "
            f"devices; using a {n}-device mesh ({len(devices) - n} devices "
            "idle). Pick a batch size divisible by the device count.",
            stacklevel=2,
        )
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put every leaf with its batch dim sharded over `mesh`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
