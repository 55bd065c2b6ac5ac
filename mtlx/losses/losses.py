"""Detection losses (reference core/losses.py, SURVEY.md §3.1).

Pure functions: every loss takes predictions, targets and per-anchor
weights, returns the per-anchor (or per-anchor-per-class) loss; callers do
the normalization (the reference normalizes by the sampled count — see the
meta-arch). Shapes: [batch, num_anchors, ...] throughout.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from mtlx.geometry import box_ops


def weighted_l2_loss(pred: Array, target: Array, weights: Array) -> Array:
    """0.5 * ||pred - target||^2 per anchor, weighted. -> [..., A]."""
    sq = 0.5 * jnp.square(pred - target)
    return jnp.sum(sq, axis=-1) * weights


def weighted_smooth_l1_loss(
    pred: Array, target: Array, weights: Array, delta: float = 1.0
) -> Array:
    """Huber/smooth-L1 per anchor, weighted (reference WeightedSmoothL1,
    delta=1). -> [..., A]."""
    diff = pred - target
    abs_diff = jnp.abs(diff)
    loss = jnp.where(
        abs_diff < delta, 0.5 * jnp.square(diff), delta * (abs_diff - 0.5 * delta)
    )
    return jnp.sum(loss, axis=-1) * weights


def weighted_iou_loss(pred_boxes: Array, target_boxes: Array, weights: Array) -> Array:
    """-log(matched IoU) per anchor (reference WeightedIOULocalizationLoss)."""
    iou = box_ops.matched_iou(pred_boxes, target_boxes)
    return -jnp.log(jnp.maximum(iou, 1e-8)) * weights


def sigmoid_cross_entropy(logits: Array, labels: Array) -> Array:
    """Elementwise stable sigmoid CE (tf.nn.sigmoid_cross_entropy_with_logits)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def weighted_sigmoid_classification_loss(
    logits: Array, targets: Array, weights: Array, class_indices: Optional[Array] = None
) -> Array:
    """Per-anchor-per-class sigmoid CE, weighted per anchor.
    -> [..., A, K]."""
    loss = sigmoid_cross_entropy(logits, targets)
    if class_indices is not None:
        keep = jnp.zeros((logits.shape[-1],)).at[class_indices].set(1.0)
        loss = loss * keep
    return loss * weights[..., None]


def softmax_cross_entropy(logits: Array, labels: Array) -> Array:
    """Rowwise softmax CE against a (possibly soft) distribution. -> [...]."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels * log_probs, axis=-1)


def weighted_softmax_classification_loss(
    logits: Array, targets: Array, weights: Array, logit_scale: float = 1.0
) -> Array:
    """Per-anchor softmax CE, weighted. -> [..., A]."""
    return softmax_cross_entropy(logits / logit_scale, targets) * weights


def bootstrapped_sigmoid_classification_loss(
    logits: Array,
    targets: Array,
    weights: Array,
    alpha: float = 0.5,
    bootstrap_type: str = "soft",
) -> Array:
    """Bootstrapped sigmoid CE (reference BootstrappedSigmoidClassificationLoss)."""
    p = jax.nn.sigmoid(logits)
    if bootstrap_type == "soft":
        boot = alpha * targets + (1.0 - alpha) * p
    elif bootstrap_type == "hard":
        boot = alpha * targets + (1.0 - alpha) * (p > 0.5).astype(logits.dtype)
    else:
        raise ValueError(f"unknown bootstrap_type {bootstrap_type}")
    return sigmoid_cross_entropy(logits, boot) * weights[..., None]


class HardExampleMinerConfig(NamedTuple):
    num_hard_examples: int = 64
    iou_threshold: float = 0.7
    loss_type: str = "both"  # 'cls' | 'loc' | 'both'
    cls_loss_weight: float = 0.05
    loc_loss_weight: float = 0.06
    max_negatives_per_positive: float = 0.0  # 0 = unlimited
    min_negatives_per_image: int = 0


def hard_example_mining_mask(
    cls_losses: Array,
    loc_losses: Array,
    decoded_boxes: Array,
    match: Array,
    config: HardExampleMinerConfig,
) -> Array:
    """Select the hardest examples per image (reference HardExampleMiner),
    statically shaped.

    Ranks anchors by the combined loss, walks them in hardness order with an
    NMS-style suppression (IoU > threshold against already-kept anchors) and
    an optional negatives-per-positive cap, and returns a [A] keep mask with
    at most `num_hard_examples` True.
    """
    if config.loss_type == "cls":
        image_loss = cls_losses * config.cls_loss_weight
    elif config.loss_type == "loc":
        image_loss = loc_losses * config.loc_loss_weight
    else:
        image_loss = (
            cls_losses * config.cls_loss_weight + loc_losses * config.loc_loss_weight
        )
    num_anchors = image_loss.shape[0]
    order = jnp.argsort(-image_loss)  # hardest first
    boxes_sorted = jnp.take(decoded_boxes, order, axis=0)
    is_pos_sorted = jnp.take(match >= 0, order, axis=0)

    max_neg_per_pos = config.max_negatives_per_positive

    def body(i, state):
        keep, num_kept, num_pos, num_neg = state
        box = boxes_sorted[i]
        ious = box_ops.iou(box[None, :], boxes_sorted)[0]  # [A]
        overlaps = jnp.any(keep & (ious > config.iou_threshold))
        is_pos = is_pos_sorted[i]
        neg_ok = True
        if max_neg_per_pos > 0:
            # reference bound: max(min_negatives_per_image, ratio * num_pos)
            # — NOT the sum, which would admit extra negatives whenever both
            # terms are nonzero
            allowed = jnp.maximum(
                config.min_negatives_per_image, max_neg_per_pos * num_pos
            )
            neg_ok = is_pos | (num_neg < allowed)
        take = (
            (num_kept < config.num_hard_examples)
            & (~overlaps)
            & neg_ok
        )
        keep = keep.at[i].set(take)
        num_kept = num_kept + take.astype(jnp.int32)
        num_pos = num_pos + (take & is_pos).astype(jnp.int32)
        num_neg = num_neg + (take & (~is_pos)).astype(jnp.int32)
        return keep, num_kept, num_pos, num_neg

    keep_sorted = jnp.zeros((num_anchors,), dtype=bool)
    keep_sorted, _, _, _ = jax.lax.fori_loop(
        0,
        num_anchors,
        body,
        (keep_sorted, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
    )
    # un-sort
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep
