"""Region similarity calculators (reference core/region_similarity_calculator.py)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mtlx.geometry import box_ops


def iou_similarity(boxes1: Array, boxes2: Array) -> Array:
    return box_ops.iou(boxes1, boxes2)


def ioa_similarity(boxes1: Array, boxes2: Array) -> Array:
    return box_ops.ioa(boxes1, boxes2)


def neg_sq_dist_similarity(boxes1: Array, boxes2: Array) -> Array:
    """Negative squared L2 distance between box corner vectors."""
    diff = boxes1[..., :, None, :] - boxes2[..., None, :, :]
    return -jnp.sum(diff * diff, axis=-1)
