"""Numpy oracle implementations of box geometry.

Mirrors the semantics of the reference's numpy mirrors
(`object_detection/utils/np_box_ops.py` [U] per SURVEY.md §3.7), which the
reference uses as ground truth for its TF implementations and for the
out-of-graph VOC evaluator. Here they serve the same two roles: oracles for
the jnp/Pallas implementations in `mtlx.geometry.box_ops` and the compute
core of the numpy evaluator in `mtlx.eval`.

Boxes are float arrays of shape [N, 4] in [ymin, xmin, ymax, xmax] order
(normalized or absolute — callers keep track, as in the reference).
"""

from __future__ import annotations

import numpy as np


def area(boxes: np.ndarray) -> np.ndarray:
    """Areas of boxes. [N, 4] -> [N]."""
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def intersection(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise intersection areas. [N, 4] x [M, 4] -> [N, M]."""
    ymin1, xmin1, ymax1, xmax1 = np.split(boxes1, 4, axis=1)
    ymin2, xmin2, ymax2, xmax2 = np.split(boxes2, 4, axis=1)
    all_pairs_min_ymax = np.minimum(ymax1, ymax2.T)
    all_pairs_max_ymin = np.maximum(ymin1, ymin2.T)
    ih = np.maximum(0.0, all_pairs_min_ymax - all_pairs_max_ymin)
    all_pairs_min_xmax = np.minimum(xmax1, xmax2.T)
    all_pairs_max_xmin = np.maximum(xmin1, xmin2.T)
    iw = np.maximum(0.0, all_pairs_min_xmax - all_pairs_max_xmin)
    return ih * iw


def iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise intersection-over-union. [N, 4] x [M, 4] -> [N, M]."""
    inter = intersection(boxes1, boxes2)
    a1 = area(boxes1)
    a2 = area(boxes2)
    union = a1[:, None] + a2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-30), 0.0)


def ioa(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise intersection-over-area of boxes2. [N, 4] x [M, 4] -> [N, M].

    ioa(box1, box2) = |box1 ∩ box2| / |box2|  (matches reference np_box_ops).
    """
    inter = intersection(boxes1, boxes2)
    a2 = area(boxes2)
    return np.where(a2[None, :] > 0, inter / np.maximum(a2[None, :], 1e-30), 0.0)


def clip_to_window(boxes: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Clip boxes to a window [ymin, xmin, ymax, xmax]."""
    wy0, wx0, wy1, wx1 = window
    ymin = np.clip(boxes[:, 0], wy0, wy1)
    xmin = np.clip(boxes[:, 1], wx0, wx1)
    ymax = np.clip(boxes[:, 2], wy0, wy1)
    xmax = np.clip(boxes[:, 3], wx0, wx1)
    return np.stack([ymin, xmin, ymax, xmax], axis=1)


def change_coordinate_frame(boxes: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Re-express boxes relative to `window` (normalized by its size)."""
    wy0, wx0, wy1, wx1 = window
    h = wy1 - wy0
    w = wx1 - wx0
    return np.stack(
        [
            (boxes[:, 0] - wy0) / h,
            (boxes[:, 1] - wx0) / w,
            (boxes[:, 2] - wy0) / h,
            (boxes[:, 3] - wx0) / w,
        ],
        axis=1,
    )


def center_coordinates_and_sizes(boxes: np.ndarray):
    """[N, 4] -> (ycenter, xcenter, h, w) each [N]."""
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    ycenter = boxes[:, 0] + 0.5 * h
    xcenter = boxes[:, 1] + 0.5 * w
    return ycenter, xcenter, h, w


def faster_rcnn_encode(
    boxes: np.ndarray, anchors: np.ndarray, scale_factors=(10.0, 10.0, 5.0, 5.0)
) -> np.ndarray:
    """FasterRCNN box coder encode (numpy oracle).

    [ty, tx, th, tw] with the reference's EPSILON = 1e-8 added to widths and
    heights for numerical safety (SURVEY.md §3.2 faster_rcnn_box_coder).
    """
    eps = 1e-8
    ycenter_a, xcenter_a, ha, wa = center_coordinates_and_sizes(anchors)
    ycenter, xcenter, h, w = center_coordinates_and_sizes(boxes)
    ha = ha + eps
    wa = wa + eps
    h = h + eps
    w = w + eps
    ty = (ycenter - ycenter_a) / ha * scale_factors[0]
    tx = (xcenter - xcenter_a) / wa * scale_factors[1]
    th = np.log(h / ha) * scale_factors[2]
    tw = np.log(w / wa) * scale_factors[3]
    return np.stack([ty, tx, th, tw], axis=1)


def faster_rcnn_decode(
    codes: np.ndarray, anchors: np.ndarray, scale_factors=(10.0, 10.0, 5.0, 5.0)
) -> np.ndarray:
    """FasterRCNN box coder decode (numpy oracle)."""
    ycenter_a, xcenter_a, ha, wa = center_coordinates_and_sizes(anchors)
    ty = codes[:, 0] / scale_factors[0]
    tx = codes[:, 1] / scale_factors[1]
    th = codes[:, 2] / scale_factors[2]
    tw = codes[:, 3] / scale_factors[3]
    w = np.exp(tw) * wa
    h = np.exp(th) * ha
    ycenter = ty * ha + ycenter_a
    xcenter = tx * wa + xcenter_a
    return np.stack(
        [
            ycenter - 0.5 * h,
            xcenter - 0.5 * w,
            ycenter + 0.5 * h,
            xcenter + 0.5 * w,
        ],
        axis=1,
    )
