"""Per-image detection/groundtruth matching (reference
utils/per_image_evaluation.py, SURVEY.md §3.7).

Greedy matching of score-ranked detections to groundtruth at IoU >= 0.5,
per class, with the reference's difficult-box protocol: detections whose
best match is a difficult groundtruth box are REMOVED from scoring
(neither tp nor fp); each non-difficult groundtruth can be claimed once.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from mtlx.geometry import np_box_ops


class PerImageEvaluation:
    def __init__(self, num_classes: int, matching_iou_threshold: float = 0.5):
        self.num_classes = num_classes
        self.iou_threshold = matching_iou_threshold

    def compute_object_detection_metrics(
        self,
        detected_boxes: np.ndarray,
        detected_scores: np.ndarray,
        detected_class_labels: np.ndarray,
        groundtruth_boxes: np.ndarray,
        groundtruth_class_labels: np.ndarray,
        groundtruth_is_difficult: np.ndarray,
    ):
        """Returns (scores, tp_fp_labels, is_class_correctly_detected) each a
        per-class list/array — the reference's contract."""
        scores, tp_fp = self._label_tp_fp(
            detected_boxes,
            detected_scores,
            detected_class_labels,
            groundtruth_boxes,
            groundtruth_class_labels,
            groundtruth_is_difficult,
        )
        correctly_detected = self._corloc_flags(
            detected_boxes,
            detected_scores,
            detected_class_labels,
            groundtruth_boxes,
            groundtruth_class_labels,
        )
        return scores, tp_fp, correctly_detected

    def _per_class(
        self, boxes, scores, labels, cls
    ) -> Tuple[np.ndarray, np.ndarray]:
        sel = labels == cls
        b, s = boxes[sel], scores[sel]
        order = np.argsort(-s, kind="stable")
        return b[order], s[order]

    def _label_tp_fp(
        self, det_boxes, det_scores, det_labels, gt_boxes, gt_labels, gt_difficult
    ):
        all_scores, all_tp_fp = [], []
        for cls in range(self.num_classes):
            b, s = self._per_class(det_boxes, det_scores, det_labels, cls)
            gsel = gt_labels == cls
            gboxes = gt_boxes[gsel]
            gdiff = (
                gt_difficult[gsel]
                if len(gt_difficult) == len(gt_labels)
                else np.zeros(gsel.sum(), bool)
            ).astype(bool)
            if len(b) == 0:
                all_scores.append(np.zeros(0, np.float32))
                all_tp_fp.append(np.zeros(0, bool))
                continue
            if len(gboxes) == 0:
                all_scores.append(s)
                all_tp_fp.append(np.zeros(len(b), bool))
                continue
            iou = np_box_ops.iou(b, gboxes)
            claimed = np.zeros(len(gboxes), bool)
            tp_fp = np.zeros(len(b), bool)
            drop = np.zeros(len(b), bool)
            for i in range(len(b)):
                j = int(np.argmax(iou[i]))
                if iou[i, j] >= self.iou_threshold:
                    if gdiff[j]:
                        drop[i] = True  # matched a difficult box: unscored
                    elif not claimed[j]:
                        claimed[j] = True
                        tp_fp[i] = True
            keep = ~drop
            all_scores.append(s[keep])
            all_tp_fp.append(tp_fp[keep])
        return all_scores, all_tp_fp

    def _corloc_flags(self, det_boxes, det_scores, det_labels, gt_boxes, gt_labels):
        flags = np.zeros(self.num_classes, np.int32)
        for cls in range(self.num_classes):
            gsel = gt_labels == cls
            if not gsel.any():
                continue
            b, s = self._per_class(det_boxes, det_scores, det_labels, cls)
            if len(b) == 0:
                continue
            iou = np_box_ops.iou(b[:1], gt_boxes[gsel])
            if iou.max() >= self.iou_threshold:
                flags[cls] = 1
        return flags
