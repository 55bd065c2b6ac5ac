"""Numpy operations on [N, H, W] binary instance masks (reference
utils/np_mask_ops.py, SURVEY.md §3.7 np_box_* family).

Masks are uint8/bool arrays; all pairwise ops return float64 like their
box counterparts in np_box_ops. These serve as the matching geometry for
the instance-segmentation evaluators the same way np_box_ops serves the
box evaluators.
"""

from __future__ import annotations

import numpy as np

EPSILON = 1e-7


def area(masks: np.ndarray) -> np.ndarray:
    """[N, H, W] -> [N] pixel counts."""
    if masks.ndim != 3:
        raise ValueError("masks must be [N, H, W]")
    return masks.astype(bool).sum(axis=(1, 2)).astype(np.float64)


def intersection(masks1: np.ndarray, masks2: np.ndarray) -> np.ndarray:
    """Pairwise intersection areas: [N, H, W] x [M, H, W] -> [N, M].

    The gemm runs in float32 — exact for counts below 2^24 pixels (a
    16M-pixel mask, far above eval resolutions) at half/quarter the
    transient memory of float64 operands (e.g. 100 detections on a
    600x1000 image: 240 MB vs 480 MB); only the [N, M] result is f64.
    """
    n, m = len(masks1), len(masks2)
    if n == 0 or m == 0:
        return np.zeros((n, m), np.float64)
    # binarize like area() does — 0/255-coded uint8 masks would otherwise
    # contribute 255^2 per overlapping pixel
    a = masks1.astype(bool).reshape(n, -1).astype(np.float32)
    b = masks2.astype(bool).reshape(m, -1).astype(np.float32)
    return (a @ b.T).astype(np.float64)


def iou(masks1: np.ndarray, masks2: np.ndarray) -> np.ndarray:
    """Pairwise mask IoU: [N, M]."""
    inter = intersection(masks1, masks2)
    union = area(masks1)[:, None] + area(masks2)[None, :] - inter
    return inter / np.maximum(union, EPSILON)


def ioa(masks1: np.ndarray, masks2: np.ndarray) -> np.ndarray:
    """Pairwise intersection-over-area of masks2: ioa[i, j] =
    |m1_i & m2_j| / |m2_j| (matches np_box_ops.ioa convention)."""
    inter = intersection(masks1, masks2)
    return inter / np.maximum(area(masks2)[None, :], EPSILON)
