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
DCN_AXIS = "data_dcn"


def create_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def create_hybrid_mesh(num_slices: Optional[int] = None,
                       devices: Optional[Sequence[Any]] = None) -> Mesh:
    """2-D (DCN, ICI) data-parallel mesh for multi-slice deployments
    (SURVEY.md §3.9/§6.8: all-reduce over ICI within a slice, DCN across
    slices).

    The major axis crosses slices, the minor axis stays inside one slice,
    so XLA's hierarchical all-reduce keeps the heavy reduce-scatter/
    all-gather traffic on ICI and moves only slice-level partials over
    DCN. Slices come from `device.slice_index` when the runtime exposes
    it (real multi-slice TPU jobs); pass `num_slices` explicitly to
    partition a flat device list (virtual/CPU testing).

    Everything downstream is unchanged: `batch_sharding` shards the batch
    over BOTH axes and parameters stay replicated — the mesh shape alone
    encodes the network hierarchy.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if num_slices is None and slice_ids != {None}:
        groups: dict = {}
        for d in devices:
            groups.setdefault(d.slice_index, []).append(d)
        sizes = {len(g) for g in groups.values()}
        if len(sizes) != 1:
            raise ValueError(f"uneven slices: { {k: len(v) for k, v in groups.items()} }")
        arr = np.asarray([groups[k] for k in sorted(groups)])
        return Mesh(arr, (DCN_AXIS, DATA_AXIS))
    if num_slices is None:
        raise ValueError(
            "devices expose no slice_index; pass num_slices explicitly"
        )
    if len(devices) % num_slices != 0:
        raise ValueError(
            f"{len(devices)} devices do not split into {num_slices} slices"
        )
    arr = np.asarray(devices).reshape(num_slices, -1)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS))


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
    """Shard the leading (batch) dim over every data axis of the mesh
    ((data,) for single-slice, (data_dcn, data) for hybrid meshes)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put every leaf with its batch dim sharded over `mesh`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
