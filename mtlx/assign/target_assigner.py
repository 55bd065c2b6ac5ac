"""Target assignment — the heart of label assignment (reference
core/target_assigner.py, SURVEY.md §3.1).

`assign` produces per-anchor classification/regression targets and weights
from padded groundtruth. Everything is static-shape: groundtruth arrives as
[max_gt, ...] plus a validity mask, and batching is `vmap` (the reference's
`batch_assign_targets` loop becomes one vectorized call).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from mtlx.assign import matcher as matcher_lib
from mtlx.assign import similarity as sim_lib
from mtlx.coders import box_coders


class AssignResult(NamedTuple):
    cls_targets: Array  # [A, ...] classification target per anchor
    cls_weights: Array  # [A]
    reg_targets: Array  # [A, code_size]
    reg_weights: Array  # [A]
    match: Array  # [A] int32 match vector


class TargetAssigner(NamedTuple):
    similarity_fn: Callable[[Array, Array], Array]
    matcher_fn: Callable[..., Array]
    box_coder: box_coders.BoxCoder
    negative_class_weight: float = 1.0

    def assign(
        self,
        anchors: Array,
        gt_boxes: Array,
        gt_labels: Optional[Array] = None,
        gt_mask: Optional[Array] = None,
        unmatched_cls_target: Optional[Array] = None,
        gt_weights: Optional[Array] = None,
    ) -> AssignResult:
        """Assign targets for one image.

        Args:
          anchors: [A, 4].
          gt_boxes: [G, 4] padded groundtruth boxes.
          gt_labels: [G, ...] per-box class targets. If None, binary
            objectness targets of 1.0 are used (RPN convention).
          gt_mask: [G] bool validity of groundtruth rows.
          unmatched_cls_target: target for unmatched anchors (defaults to
            zeros_like of one label row — the reference default).
          gt_weights: [G] optional per-groundtruth weights.
        """
        num_gt = gt_boxes.shape[0]
        if gt_mask is None:
            gt_mask = jnp.ones((num_gt,), dtype=bool)
        if gt_labels is None:
            gt_labels = jnp.ones((num_gt, 1), dtype=jnp.float32)
        if unmatched_cls_target is None:
            unmatched_cls_target = jnp.zeros(gt_labels.shape[1:], gt_labels.dtype)
        if gt_weights is None:
            gt_weights = jnp.ones((num_gt,), dtype=jnp.float32)

        similarity = self.similarity_fn(gt_boxes, anchors)  # [G, A]
        match = self.matcher_fn(similarity, row_mask=gt_mask)  # [A]

        matched = match >= 0
        safe = jnp.clip(match, 0, num_gt - 1)

        # Regression targets: encode matched gt box against its anchor;
        # unmatched/ignored anchors regress to the anchor itself (zero code),
        # the reference's default_regression_target.
        matched_gt_boxes = jnp.where(
            matched[:, None], jnp.take(gt_boxes, safe, axis=0), anchors
        )
        reg_targets = self.box_coder.encode(matched_gt_boxes, anchors)
        reg_targets = jnp.where(
            matched[:, None], reg_targets, jnp.zeros_like(reg_targets)
        )

        cls_targets = matcher_lib.gather_based_on_match(
            match, gt_labels, unmatched_value=unmatched_cls_target
        )

        matched_w = jnp.take(gt_weights, safe, axis=0)
        reg_weights = jnp.where(matched, matched_w, 0.0)
        cls_weights = jnp.where(
            matched,
            matched_w,
            jnp.where(match == matcher_lib.UNMATCHED, self.negative_class_weight, 0.0),
        )
        return AssignResult(cls_targets, cls_weights, reg_targets, reg_weights, match)


def batch_assign(assigner: TargetAssigner, anchors: Array, **batched_kwargs):
    """vmap `assign` over a leading batch dim of the groundtruth arrays;
    anchors are shared. Replaces the reference's batch_assign_targets loop."""
    def one(kw):
        return assigner.assign(anchors, **kw)

    return jax.vmap(one)(batched_kwargs)


def create_target_assigner(
    reference: str, stage: Optional[str] = None, negative_class_weight: float = 1.0
) -> TargetAssigner:
    """Presets mirroring the reference's create_target_assigner:

      ('FasterRCNN', 'proposal')       — RPN: IoU argmax 0.7/0.3, force-match
      ('FasterRCNN', 'detection')      — 2nd stage: IoU argmax 0.5/0.5
      ('FastRCNN', None)               — IoU 0.5, no force-match
      ('Multibox', None)               — SSD: neg-sq-dist greedy bipartite
    """
    coder = box_coders.make_faster_rcnn_coder()
    if reference == "Multibox":
        return TargetAssigner(
            similarity_fn=sim_lib.neg_sq_dist_similarity,
            matcher_fn=lambda s, row_mask=None: matcher_lib.greedy_bipartite_match(
                s, row_mask=row_mask
            ),
            box_coder=box_coders.make_mean_stddev_coder(),
            negative_class_weight=negative_class_weight,
        )
    if reference == "FasterRCNN" and stage == "proposal":
        matcher_fn = matcher_lib.make_argmax_matcher(
            matched_threshold=0.7,
            unmatched_threshold=0.3,
            force_match_for_each_row=True,
        )
    elif reference == "FasterRCNN" and stage == "detection":
        # equal thresholds: no ignored band, below 0.5 is negative
        matcher_fn = matcher_lib.make_argmax_matcher(
            matched_threshold=0.5,
            unmatched_threshold=0.5,
        )
    elif reference == "FastRCNN":
        matcher_fn = matcher_lib.make_argmax_matcher(
            matched_threshold=0.5,
            unmatched_threshold=0.1,
            force_match_for_each_row=False,
        )
    else:
        raise ValueError(f"unknown target assigner preset {reference}/{stage}")
    return TargetAssigner(
        similarity_fn=sim_lib.iou_similarity,
        matcher_fn=matcher_fn,
        box_coder=coder,
        negative_class_weight=negative_class_weight,
    )
