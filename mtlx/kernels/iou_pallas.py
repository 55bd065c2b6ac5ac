"""Pallas TPU kernel: pairwise IoU matrix.

The IoU matrix (anchors x groundtruth during assignment, boxes x boxes in
NMS) is the framework's hottest geometry primitive (SURVEY.md §3.12). The
kernel tiles the [N, M] output into 128-aligned VMEM blocks; each block
reads its 4 box coordinates as [tile, 1]-shaped lanes and computes the
whole tile on the VPU — one HBM pass over the output, no gather.

Validated against mtlx.geometry.box_ops.iou (which is itself validated
against the numpy oracle): pallas == jnp == numpy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlx.geometry import box_ops

TILE_N = 256
TILE_M = 128


def _iou_kernel(b1_ref, b2_ref, out_ref):
    b1 = b1_ref[:]  # [TILE_N, 4]
    b2 = b2_ref[:]  # [TILE_M, 4]
    ymin1, xmin1, ymax1, xmax1 = (b1[:, i : i + 1] for i in range(4))  # [N, 1]
    ymin2, xmin2, ymax2, xmax2 = (b2[:, i : i + 1].T for i in range(4))  # [1, M]
    ih = jnp.maximum(0.0, jnp.minimum(ymax1, ymax2) - jnp.maximum(ymin1, ymin2))
    iw = jnp.maximum(0.0, jnp.minimum(xmax1, xmax2) - jnp.maximum(xmin1, xmin2))
    inter = ih * iw
    area1 = (ymax1 - ymin1) * (xmax1 - xmin1)
    area2 = (ymax2 - ymin2) * (xmax2 - xmin2)
    union = area1 + area2 - inter
    out_ref[:] = jnp.where(union > 0, inter / jnp.maximum(union, 1e-30), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def iou_matrix(boxes1: Array, boxes2: Array, interpret: bool = False) -> Array:
    """Pairwise IoU via Pallas. [N, 4] x [M, 4] -> [N, M] float32.

    N and M are padded up to tile multiples internally; padded rows come
    back as zeros (degenerate boxes have IoU 0 by convention).
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    np_ = -(-n // TILE_N) * TILE_N
    mp = -(-m // TILE_M) * TILE_M
    b1 = jnp.zeros((np_, 4), jnp.float32).at[:n].set(boxes1.astype(jnp.float32))
    b2 = jnp.zeros((mp, 4), jnp.float32).at[:m].set(boxes2.astype(jnp.float32))

    out = pl.pallas_call(
        _iou_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp), jnp.float32),
        grid=(np_ // TILE_N, mp // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, TILE_M), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(b1, b2)
    return out[:n, :m]


def iou(boxes1: Array, boxes2: Array) -> Array:
    """Drop-in for box_ops.iou on 2-D inputs; falls back to jnp off-TPU."""
    if boxes1.ndim != 2 or jax.default_backend() not in ("tpu", "axon"):
        return box_ops.iou(boxes1, boxes2)
    return iou_matrix(boxes1, boxes2)
