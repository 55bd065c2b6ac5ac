"""Annotation recycling — on-device pseudo-label generators.

The MTL-SSL extension layer's label generation (SURVEY.md §3.11 [F][P]):
three self-supervised targets derived for free from groundtruth boxes. The
reference computes these in the host data path (py_func-era TF); here they
are pure jitted functions of (gt_boxes, gt_classes, gt_mask) that run
inside the train step on device — zero extra host work, fully fused by XLA.

All functions are static-shape: groundtruth is padded to [G] with a mask.

Exact reference formulas could not be read (empty mount — SURVEY.md
banner); the definitions below implement the paper's descriptions and are
the behavioral contract for this build, locked in by golden tests:

  * multi-object window labels: soft distribution over classes present in
    a window, weighted by how much of each object lies inside the window
  * closeness labels: per object, distribution over the classes of OTHER
    objects weighted by a decreasing function of center distance
  * foreground mask: union of groundtruth boxes rasterized at feature-map
    resolution
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from mtlx.geometry import box_ops

EPS = 1e-8


def multiobject_labels(
    windows: Array,
    gt_boxes: Array,
    gt_classes: Array,
    gt_mask: Array,
    num_classes: int,
) -> Array:
    """Soft multi-label distribution per window.

    For window w and class c:
        p(c | w) ∝ Σ_{j : class_j = c} coverage_j(w)
    where coverage_j(w) = |box_j ∩ w| / |box_j| (fraction of object j
    inside the window). Rows with zero total coverage are all-zeros
    (callers weight those windows out).

    Args:
      windows: [W, 4]; gt_boxes: [G, 4]; gt_classes: [G] int (0-based);
      gt_mask: [G] bool.

    Returns: [W, num_classes] rows summing to 1 (or 0).
    """
    coverage = box_ops.ioa(windows, gt_boxes)  # [W, G]: |w ∩ box_j| / |box_j|
    coverage = coverage * gt_mask[None, :]
    onehot = jax.nn.one_hot(gt_classes, num_classes)  # [G, K]
    mass = coverage @ onehot  # [W, K]
    total = jnp.sum(mass, axis=-1, keepdims=True)
    return jnp.where(total > EPS, mass / jnp.maximum(total, EPS), 0.0)


def closeness_labels(
    gt_boxes: Array,
    gt_classes: Array,
    gt_mask: Array,
    num_classes: int,
    sigma: float = 0.5,
) -> Array:
    """Per-object soft distribution over the classes of nearby objects.

    w_ij = exp(-d_ij^2 / (2 sigma^2)) for j != i, where d_ij is the
    distance between box centers normalized by the mean box diagonal;
    label_i ∝ Σ_j w_ij one_hot(class_j). Objects with no valid neighbor
    get a zero row.

    Returns: [G, num_classes].
    """
    g = gt_boxes.shape[0]
    yc, xc, h, w = box_ops.center_coordinates_and_sizes(gt_boxes)
    centers = jnp.stack([yc, xc], axis=-1)  # [G, 2]
    diag = jnp.sqrt(h * h + w * w)  # [G]
    scale = 0.5 * (diag[:, None] + diag[None, :]) + EPS
    d = jnp.linalg.norm(centers[:, None, :] - centers[None, :, :], axis=-1) / scale
    wgt = jnp.exp(-jnp.square(d) / (2.0 * sigma * sigma))  # [G, G]
    valid_pair = gt_mask[:, None] & gt_mask[None, :] & (~jnp.eye(g, dtype=bool))
    wgt = jnp.where(valid_pair, wgt, 0.0)
    onehot = jax.nn.one_hot(gt_classes, num_classes)
    mass = wgt @ onehot  # [G, K]
    total = jnp.sum(mass, axis=-1, keepdims=True)
    return jnp.where(total > EPS, mass / jnp.maximum(total, EPS), 0.0)


def foreground_mask(
    gt_boxes: Array, gt_mask: Array, shape: Tuple[int, int]
) -> Array:
    """Rasterize the union of groundtruth boxes at resolution `shape`.

    gt_boxes are in NORMALIZED [0,1] coordinates of the canvas the mask
    spans. A pixel is foreground iff its center falls inside any valid box.

    Returns: [H, W] float32 in {0, 1}.
    """
    h, w = shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h  # pixel centers
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    inside_y = (ys[None, :] >= gt_boxes[:, 0:1]) & (ys[None, :] < gt_boxes[:, 2:3])
    inside_x = (xs[None, :] >= gt_boxes[:, 1:2]) & (xs[None, :] < gt_boxes[:, 3:4])
    # [G, H, W]
    inside = inside_y[:, :, None] & inside_x[:, None, :] & gt_mask[:, None, None]
    return jnp.any(inside, axis=0).astype(jnp.float32)


def enlarged_windows(gt_boxes: Array, factor: float = 2.0) -> Array:
    """Windows for the multi-object task: each groundtruth box enlarged
    about its center by `factor` (the paper samples windows covering and
    around objects; an enlarged GT box is the deterministic variant —
    see `sampled_windows` for the stochastic one)."""
    yc, xc, h, w = box_ops.center_coordinates_and_sizes(gt_boxes)
    return box_ops.from_center_coordinates(yc, xc, h * factor, w * factor)


def sampled_windows(
    rng: Array, gt_boxes: Array, factor: float = 2.0
) -> Array:
    """Stochastic windows for the multi-object task ("windows covering
    and around objects", per the paper's description; MTL proto knob
    `window_sampling` — `enlarged_windows` stays the default).

    Per groundtruth box, each axis independently draws a scale
    s ~ U[1, factor] and a center offset d ~ U[-1, 1] * (s - 1)/2 * size,
    so the window always CONTAINS the GT box (|d| <= (s*size - size)/2)
    but covers a randomly-placed surrounding region — the enlarged
    deterministic window is the s = factor, d = 0 special case. Padding
    rows produce degenerate windows exactly like enlarged_windows does;
    callers mask them via gt_mask as usual.

    Args:
      rng: PRNG key; gt_boxes: [G, 4]; factor: max per-axis enlargement.

    Returns: [G, 4] windows (same coordinate frame as gt_boxes).
    """
    g = gt_boxes.shape[0]
    yc, xc, h, w = box_ops.center_coordinates_and_sizes(gt_boxes)
    k_scale, k_off = jax.random.split(rng)
    scale = jax.random.uniform(
        k_scale, (g, 2), minval=1.0, maxval=factor
    )  # [G, (sy, sx)]
    off = jax.random.uniform(k_off, (g, 2), minval=-1.0, maxval=1.0)
    sy, sx = scale[:, 0], scale[:, 1]
    dy = off[:, 0] * (sy - 1.0) * 0.5 * h
    dx = off[:, 1] * (sx - 1.0) * 0.5 * w
    return box_ops.from_center_coordinates(yc + dy, xc + dx, h * sy, w * sx)
