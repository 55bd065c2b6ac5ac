"""Spatial partitioning — shard the image H axis across devices.

The reference has no sequence/context parallelism (no sequence dim —
SURVEY.md §6.7); the honest TPU-native analog of "scale the long axis" is
partitioning the image spatial axes. XLA's SPMD partitioner inserts the
halo exchanges convolutions need automatically, so this is pure sharding
annotation: a 2-D (data, spatial) mesh where images are
P('data', 'spatial', None, None).

Use for very large inputs (aerial/medical imagery) where one chip cannot
hold the activation memory of a full image; for 600x1024 detection inputs
plain data parallelism is strictly better (documented, not default).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def create_spatial_mesh(
    n_data: int, n_spatial: int, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_data * n_spatial:
        raise ValueError(
            f"need {n_data * n_spatial} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] images: batch over data, height over spatial."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatially_sharded_features(model, variables, images, mesh: Mesh):
    """Run the detector backbone with H-sharded images; returns the
    stride-16 feature map with the same sharding. XLA inserts conv halo
    exchanges over the `spatial` axis; no manual collectives."""
    from mtlx.detector.faster_rcnn import FasterRCNNModules

    fn = jax.jit(
        lambda v, im: model.modules.apply(
            v, im, method=FasterRCNNModules.features
        ),
        in_shardings=(replicated(mesh), image_sharding(mesh)),
        out_shardings=image_sharding(mesh),
    )
    return fn(variables, images)
