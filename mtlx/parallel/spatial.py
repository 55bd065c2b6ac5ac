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


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over data; spatial axis unused."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch_spatial(mesh: Mesh, batch):
    """device_put a train batch for the 2-D (data, spatial) mesh: images
    [B, H, W, 3] sharded (batch over data, H over spatial), every other
    leaf batch-sharded over data only."""
    out = {}
    for k, v in batch.items():
        s = image_sharding(mesh) if k == "image" else data_sharding(mesh)
        out[k] = jax.device_put(v, s)
    return out


def make_spatial_train_step(model, mesh: Mesh, **train_step_kwargs):
    """The FULL jitted train step under 2-D (data, spatial) sharding.

    Images enter H-sharded; a with_sharding_constraint keeps the backbone
    convs partitioned over the spatial axis (XLA SPMD inserts the halo
    exchanges), and GSPMD re-gathers automatically where the program needs
    whole feature maps (RPN top-k/NMS, ROI crops). Gradients all-reduce
    over BOTH axes — the spatial group contributes partial sums of the
    same images' gradients, the data group across images. Numerically
    identical to the plain DP step (tests/test_parallel.py asserts it).
    """
    from mtlx.train.train_step import make_train_step

    base = make_train_step(model, **train_step_kwargs)

    def step(state, batch, rng):
        batch = dict(
            batch,
            image=jax.lax.with_sharding_constraint(
                batch["image"], image_sharding(mesh)
            ),
        )
        return base(state, batch, rng)

    return jax.jit(step, donate_argnums=(0,))


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
