"""Core box geometry as pure jnp functions (TPU-native).

Semantics mirror the reference's `object_detection/core/box_list_ops.py` [U]
(SURVEY.md §3.1), but the design is JAX-first:

  * no tensor-container class on the hot path — plain `[..., N, 4]` arrays in
    `[ymin, xmin, ymax, xmax]` order, batched via `vmap` or leading dims
  * variable-length sets are PADDED to static N and carried with a validity
    mask; functions that "prune" in the reference instead return masks here
    (pruning by gather is a dynamic-shape op XLA cannot tile)
  * everything is differentiable and jit-safe; no data-dependent control flow

The numpy oracles in `mtlx.geometry.np_box_ops` define the expected values
for every function here (tested in tests/test_box_ops.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

# divisor guard for IoU/IoA ratios: must match the numpy oracle's 1e-30
# (a 1e-8 floor gave tiny-but-real unions an arbitrary partial IoU —
# normalized SSD-coordinate boxes of side ~3e-5 have unions ~1e-9).
# The reference encoder's width/height stabilizer stays 1e-8 separately.
EPSILON = 1e-30


def area(boxes: Array) -> Array:
    """Areas of boxes. [..., N, 4] -> [..., N]."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    return jnp.squeeze((ymax - ymin) * (xmax - xmin), axis=-1)


def height_width(boxes: Array):
    """[..., N, 4] -> (heights, widths) each [..., N]."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    return jnp.squeeze(ymax - ymin, -1), jnp.squeeze(xmax - xmin, -1)


def center_coordinates_and_sizes(boxes: Array):
    """[..., N, 4] -> (ycenter, xcenter, h, w), each [..., N]."""
    ymin, xmin, ymax, xmax = (boxes[..., i] for i in range(4))
    h = ymax - ymin
    w = xmax - xmin
    return ymin + 0.5 * h, xmin + 0.5 * w, h, w


def from_center_coordinates(ycenter, xcenter, h, w) -> Array:
    """Inverse of center_coordinates_and_sizes; stacks on a new last axis."""
    return jnp.stack(
        [ycenter - 0.5 * h, xcenter - 0.5 * w, ycenter + 0.5 * h, xcenter + 0.5 * w],
        axis=-1,
    )


def intersection(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise intersection areas. [..., N, 4] x [..., M, 4] -> [..., N, M]."""
    ymin1, xmin1, ymax1, xmax1 = jnp.split(boxes1, 4, axis=-1)
    ymin2, xmin2, ymax2, xmax2 = jnp.split(boxes2, 4, axis=-1)
    # [..., N, 1] vs [..., 1, M]
    min_ymax = jnp.minimum(ymax1, jnp.swapaxes(ymax2, -1, -2))
    max_ymin = jnp.maximum(ymin1, jnp.swapaxes(ymin2, -1, -2))
    ih = jnp.maximum(0.0, min_ymax - max_ymin)
    min_xmax = jnp.minimum(xmax1, jnp.swapaxes(xmax2, -1, -2))
    max_xmin = jnp.maximum(xmin1, jnp.swapaxes(xmin2, -1, -2))
    iw = jnp.maximum(0.0, min_xmax - max_xmin)
    return ih * iw


def matched_intersection(boxes1: Array, boxes2: Array) -> Array:
    """Elementwise intersection of aligned box sets. [..., N, 4] x2 -> [..., N]."""
    ih = jnp.maximum(
        0.0,
        jnp.minimum(boxes1[..., 2], boxes2[..., 2])
        - jnp.maximum(boxes1[..., 0], boxes2[..., 0]),
    )
    iw = jnp.maximum(
        0.0,
        jnp.minimum(boxes1[..., 3], boxes2[..., 3])
        - jnp.maximum(boxes1[..., 1], boxes2[..., 1]),
    )
    return ih * iw


def iou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise IoU. [..., N, 4] x [..., M, 4] -> [..., N, M].

    Zero-area pairs get IoU 0 (matches reference convention for padded rows).
    """
    inter = intersection(boxes1, boxes2)
    a1 = area(boxes1)
    a2 = area(boxes2)
    union = a1[..., :, None] + a2[..., None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPSILON), 0.0)


def matched_iou(boxes1: Array, boxes2: Array) -> Array:
    """Elementwise IoU of aligned box sets. [..., N]."""
    inter = matched_intersection(boxes1, boxes2)
    union = area(boxes1) + area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPSILON), 0.0)


def ioa(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise intersection over the area of boxes2. [..., N, M]."""
    inter = intersection(boxes1, boxes2)
    a2 = area(boxes2)[..., None, :]
    return jnp.where(a2 > 0, inter / jnp.maximum(a2, EPSILON), 0.0)


def clip_to_window(boxes: Array, window: Array) -> Array:
    """Clip boxes to window [ymin, xmin, ymax, xmax] (broadcastable)."""
    wy0 = window[..., 0:1]
    wx0 = window[..., 1:2]
    wy1 = window[..., 2:3]
    wx1 = window[..., 3:4]
    ymin = jnp.clip(boxes[..., 0], wy0, wy1)
    xmin = jnp.clip(boxes[..., 1], wx0, wx1)
    ymax = jnp.clip(boxes[..., 2], wy0, wy1)
    xmax = jnp.clip(boxes[..., 3], wx0, wx1)
    return jnp.stack([ymin, xmin, ymax, xmax], axis=-1)


def outside_window_mask(boxes: Array, window: Array) -> Array:
    """True where a box falls at least partly outside `window`.

    Static-shape replacement for the reference's `prune_outside_window`
    (which gathers): callers AND the negation into their validity mask.
    """
    wy0, wx0, wy1, wx1 = (window[..., i] for i in range(4))
    return (
        (boxes[..., 0] < wy0[..., None])
        | (boxes[..., 1] < wx0[..., None])
        | (boxes[..., 2] > wy1[..., None])
        | (boxes[..., 3] > wx1[..., None])
    )


def completely_outside_window_mask(boxes: Array, window: Array) -> Array:
    """True where a box is entirely outside `window`
    (static-shape replacement for prune_completely_outside_window)."""
    wy0, wx0, wy1, wx1 = (window[..., i] for i in range(4))
    return (
        (boxes[..., 0] >= wy1[..., None])
        | (boxes[..., 2] <= wy0[..., None])
        | (boxes[..., 1] >= wx1[..., None])
        | (boxes[..., 3] <= wx0[..., None])
    )


def change_coordinate_frame(boxes: Array, window: Array) -> Array:
    """Express boxes relative to window, normalized by the window size."""
    wy0 = window[..., 0:1]
    wx0 = window[..., 1:2]
    h = window[..., 2:3] - wy0
    w = window[..., 3:4] - wx0
    return jnp.stack(
        [
            (boxes[..., 0] - wy0) / h,
            (boxes[..., 1] - wx0) / w,
            (boxes[..., 2] - wy0) / h,
            (boxes[..., 3] - wx0) / w,
        ],
        axis=-1,
    )


def scale(boxes: Array, y_scale, x_scale) -> Array:
    """Scale box coordinates in y and x dimensions."""
    y_scale = jnp.asarray(y_scale)
    x_scale = jnp.asarray(x_scale)
    return jnp.stack(
        [
            boxes[..., 0] * y_scale,
            boxes[..., 1] * x_scale,
            boxes[..., 2] * y_scale,
            boxes[..., 3] * x_scale,
        ],
        axis=-1,
    )


def to_normalized_coordinates(boxes: Array, height, width) -> Array:
    """Absolute pixel coordinates -> normalized [0, 1] coordinates."""
    return scale(boxes, 1.0 / jnp.asarray(height), 1.0 / jnp.asarray(width))


def to_absolute_coordinates(boxes: Array, height, width) -> Array:
    """Normalized [0, 1] coordinates -> absolute pixel coordinates."""
    return scale(boxes, jnp.asarray(height), jnp.asarray(width))


def normalized_to_image_coordinates(boxes: Array, image_shape) -> Array:
    """Alias matching the reference utils/ops.py helper name."""
    return to_absolute_coordinates(boxes, image_shape[0], image_shape[1])
