"""COCO-style evaluation: hand-computed tiny cases (the reference test
pattern for metrics, SURVEY.md §5) + metrics_set dispatch."""

import numpy as np
import pytest

from mtlx.eval.coco_evaluation import CocoDetectionEvaluator

CATS = [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}]


def _ev():
    return CocoDetectionEvaluator(CATS, include_metrics_per_category=True)


def test_perfect_detection_scores_one():
    ev = _ev()
    ev.add_single_ground_truth_image_info(
        "im0",
        {"groundtruth_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
         "groundtruth_classes": np.asarray([1])},
    )
    ev.add_single_detected_image_info(
        "im0",
        {"detection_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
         "detection_scores": np.asarray([0.9]),
         "detection_classes": np.asarray([1])},
    )
    m = ev.evaluate()
    assert m["DetectionBoxes_Precision/mAP"] == pytest.approx(1.0)
    assert m["DetectionBoxes_Precision/mAP@.50IOU"] == pytest.approx(1.0)
    assert m["DetectionBoxes_Precision/mAP@.75IOU"] == pytest.approx(1.0)
    assert m["DetectionBoxes_Recall/AR@100"] == pytest.approx(1.0)
    # a 10x10 box is "small"; no medium/large gt -> -1 sentinel (pycocotools)
    assert m["DetectionBoxes_Precision/mAP (small)"] == pytest.approx(1.0)
    assert m["DetectionBoxes_Precision/mAP (medium)"] == -1.0
    assert m["DetectionBoxes_Precision/mAP (large)"] == -1.0
    assert m["DetectionBoxes_PerformanceByCategory/mAP/cat"] == pytest.approx(1.0)


def test_partial_iou_counts_only_lower_thresholds():
    # det [0,0,10,8] vs gt [0,0,10,10]: IoU = 0.8 -> TP for thresholds
    # 0.50..0.80 (7 of 10) -> mAP = 0.7
    ev = _ev()
    ev.add_single_ground_truth_image_info(
        "im0",
        {"groundtruth_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
         "groundtruth_classes": np.asarray([1])},
    )
    ev.add_single_detected_image_info(
        "im0",
        {"detection_boxes": np.asarray([[0.0, 0.0, 10.0, 8.0]]),
         "detection_scores": np.asarray([0.9]),
         "detection_classes": np.asarray([1])},
    )
    m = ev.evaluate()
    assert m["DetectionBoxes_Precision/mAP"] == pytest.approx(0.7, abs=1e-6)
    assert m["DetectionBoxes_Precision/mAP@.50IOU"] == pytest.approx(1.0)
    assert m["DetectionBoxes_Precision/mAP@.75IOU"] == pytest.approx(1.0)
    assert m["DetectionBoxes_Recall/AR@100"] == pytest.approx(0.7, abs=1e-6)


def test_false_positive_halves_precision_at_higher_rank():
    # one gt, matching det at score 0.9 plus an FP at 0.95: at the 101-point
    # interpolation precision is max-enveloped, so AP@.5 = 0.5 (TP arrives
    # at rank 2: precision 1/2 at recall 1)
    ev = _ev()
    ev.add_single_ground_truth_image_info(
        "im0",
        {"groundtruth_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
         "groundtruth_classes": np.asarray([1])},
    )
    ev.add_single_detected_image_info(
        "im0",
        {"detection_boxes": np.asarray([[50.0, 50.0, 60.0, 60.0],
                                        [0.0, 0.0, 10.0, 10.0]]),
         "detection_scores": np.asarray([0.95, 0.9]),
         "detection_classes": np.asarray([1, 1])},
    )
    m = ev.evaluate()
    assert m["DetectionBoxes_Precision/mAP@.50IOU"] == pytest.approx(0.5)


def test_crowd_gt_neither_rewards_nor_penalizes():
    ev = _ev()
    ev.add_single_ground_truth_image_info(
        "im0",
        {"groundtruth_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0],
                                          [20.0, 20.0, 40.0, 40.0]]),
         "groundtruth_classes": np.asarray([1, 1]),
         "groundtruth_is_crowd": np.asarray([False, True])},
    )
    # det 1 matches the real gt; det 2 falls on the crowd region
    ev.add_single_detected_image_info(
        "im0",
        {"detection_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0],
                                        [20.0, 20.0, 40.0, 40.0]]),
         "detection_scores": np.asarray([0.9, 0.8]),
         "detection_classes": np.asarray([1, 1])},
    )
    m = ev.evaluate()
    # crowd gt is not counted; crowd-matched det is ignored -> perfect score
    assert m["DetectionBoxes_Precision/mAP"] == pytest.approx(1.0)


def test_ar_at_1_limits_detections():
    # two gts, two matching dets; AR@1 sees only the top-scoring det
    ev = _ev()
    ev.add_single_ground_truth_image_info(
        "im0",
        {"groundtruth_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0],
                                          [20.0, 20.0, 30.0, 30.0]]),
         "groundtruth_classes": np.asarray([1, 1])},
    )
    ev.add_single_detected_image_info(
        "im0",
        {"detection_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0],
                                        [20.0, 20.0, 30.0, 30.0]]),
         "detection_scores": np.asarray([0.9, 0.8]),
         "detection_classes": np.asarray([1, 1])},
    )
    m = ev.evaluate()
    assert m["DetectionBoxes_Recall/AR@1"] == pytest.approx(0.5)
    assert m["DetectionBoxes_Recall/AR@100"] == pytest.approx(1.0)


def test_class_with_no_gt_excluded_from_mean():
    ev = _ev()
    ev.add_single_ground_truth_image_info(
        "im0",
        {"groundtruth_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
         "groundtruth_classes": np.asarray([1])},
    )
    # detection for class 2 (no gt anywhere) must not drag the mean down
    ev.add_single_detected_image_info(
        "im0",
        {"detection_boxes": np.asarray([[0.0, 0.0, 10.0, 10.0],
                                        [0.0, 0.0, 10.0, 10.0]]),
         "detection_scores": np.asarray([0.9, 0.9]),
         "detection_classes": np.asarray([1, 2])},
    )
    m = ev.evaluate()
    assert m["DetectionBoxes_Precision/mAP"] == pytest.approx(1.0)


def test_metrics_set_dispatch():
    from mtlx.config.protos import pipeline_pb2
    from mtlx.eval.eval import build_evaluators
    from mtlx.eval.coco_evaluation import CocoDetectionEvaluator as Coco
    from mtlx.eval.object_detection_evaluation import (
        PascalDetectionEvaluator,
        WeightedPascalDetectionEvaluator,
    )

    cfg = pipeline_pb2.EvalConfig()
    # default -> pascal
    (ev,) = build_evaluators(cfg, CATS)
    assert isinstance(ev, PascalDetectionEvaluator)
    cfg.metrics_set.extend(
        ["coco_detection_metrics", "pascal_voc_detection_metrics",
         "weighted_pascal_voc_detection_metrics"]
    )
    evs = build_evaluators(cfg, CATS)
    assert isinstance(evs[0], Coco)
    assert isinstance(evs[1], PascalDetectionEvaluator)
    assert isinstance(evs[2], WeightedPascalDetectionEvaluator)
    cfg2 = pipeline_pb2.EvalConfig()
    cfg2.metrics_set.append("nope_metrics")
    with pytest.raises(ValueError, match="nope_metrics"):
        build_evaluators(cfg2, CATS)


def test_weighted_pascal_pools_classes():
    from mtlx.eval.object_detection_evaluation import (
        WeightedPascalDetectionEvaluator,
    )

    ev = WeightedPascalDetectionEvaluator(CATS)
    # class 1: 3 gts all found; class 2: 1 gt missed. Plain mAP would be
    # (1.0 + 0.0)/2 = 0.5; weighted pools to recall 3/4 with precision 1
    gt_boxes = np.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50], [60, 60, 70, 70]],
        np.float32,
    )
    ev.add_single_ground_truth_image_info(
        "im0",
        {"groundtruth_boxes": gt_boxes,
         "groundtruth_classes": np.asarray([1, 1, 1, 2])},
    )
    ev.add_single_detected_image_info(
        "im0",
        {"detection_boxes": gt_boxes[:3],
         "detection_scores": np.asarray([0.9, 0.8, 0.7]),
         "detection_classes": np.asarray([1, 1, 1])},
    )
    m = ev.evaluate()
    assert m["WeightedPascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.75)


# ---------------- instance-mask (segm) protocol ----------------


def _disk_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def test_mask_evaluator_perfect_predictions():
    from mtlx.eval.coco_evaluation import CocoMaskEvaluator

    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    ev = CocoMaskEvaluator(cats)
    m1 = _disk_mask(64, 64, 20, 20, 36)  # large-range area (> 96^2? no
    # — area ranges use pixel counts; a r=36 disk ~ 4000 px => "medium")
    m2 = _disk_mask(64, 64, 45, 45, 10)
    ev.add_single_ground_truth_image_info("im0", {
        "groundtruth_boxes": np.asarray(
            [[0, 0, 40, 40], [35, 35, 55, 55]], np.float32),
        "groundtruth_classes": np.asarray([1, 2]),
        "groundtruth_instance_masks": np.stack([m1, m2]),
    })
    ev.add_single_detected_image_info("im0", {
        "detection_boxes": np.asarray(
            [[0, 0, 40, 40], [35, 35, 55, 55]], np.float32),
        "detection_scores": np.asarray([0.9, 0.8]),
        "detection_classes": np.asarray([1, 2]),
        "detection_masks": np.stack([m1, m2]),
    })
    out = ev.evaluate()
    assert out["DetectionMasks_Precision/mAP"] == pytest.approx(1.0)
    assert out["DetectionMasks_Precision/mAP@.50IOU"] == pytest.approx(1.0)


def test_mask_evaluator_mask_iou_not_box_iou():
    """Same boxes, disjoint masks: box IoU is 1 but mask IoU is 0 — the
    segm protocol must score 0."""
    from mtlx.eval.coco_evaluation import CocoMaskEvaluator

    cats = [{"id": 1, "name": "a"}]
    ev = CocoMaskEvaluator(cats)
    left = np.zeros((32, 32), bool); left[:, :8] = True
    right = np.zeros((32, 32), bool); right[:, 24:] = True
    ev.add_single_ground_truth_image_info("im0", {
        "groundtruth_boxes": np.asarray([[0, 0, 32, 32]], np.float32),
        "groundtruth_classes": np.asarray([1]),
        "groundtruth_instance_masks": left[None],
    })
    ev.add_single_detected_image_info("im0", {
        "detection_boxes": np.asarray([[0, 0, 32, 32]], np.float32),
        "detection_scores": np.asarray([0.9]),
        "detection_classes": np.asarray([1]),
        "detection_masks": right[None],
    })
    out = ev.evaluate()
    assert out["DetectionMasks_Precision/mAP"] == pytest.approx(0.0)


def test_mask_iou_crowd_semantics():
    from mtlx.eval.coco_evaluation import _mask_iou

    dt = np.zeros((1, 10, 10), bool); dt[0, :5] = True  # 50 px
    gt = np.ones((1, 10, 10), bool)  # 100 px, fully contains dt
    plain = _mask_iou(dt, gt, np.asarray([False]))
    crowd = _mask_iou(dt, gt, np.asarray([True]))
    assert plain[0, 0] == pytest.approx(0.5)  # 50 / 100
    assert crowd[0, 0] == pytest.approx(1.0)  # 50 / 50 (dt area)


def test_mask_evaluator_partial_overlap_thresholds():
    """IoU ~0.6 overlap: counts at 0.5 threshold, not at 0.75 — the mAP
    averages over the 10 thresholds accordingly."""
    from mtlx.eval.coco_evaluation import CocoMaskEvaluator

    cats = [{"id": 1, "name": "a"}]
    ev = CocoMaskEvaluator(cats)
    gt = np.zeros((32, 32), bool); gt[:, :20] = True        # 640 px
    dt = np.zeros((32, 32), bool); dt[:, 5:25] = True       # 640 px
    # inter 15 cols = 480; union 25 cols = 800 -> IoU 0.6
    ev.add_single_ground_truth_image_info("im0", {
        "groundtruth_boxes": np.asarray([[0, 0, 32, 20]], np.float32),
        "groundtruth_classes": np.asarray([1]),
        "groundtruth_instance_masks": gt[None],
    })
    ev.add_single_detected_image_info("im0", {
        "detection_boxes": np.asarray([[0, 5, 32, 25]], np.float32),
        "detection_scores": np.asarray([0.9]),
        "detection_classes": np.asarray([1]),
        "detection_masks": dt[None],
    })
    out = ev.evaluate()
    # thresholds 0.50, 0.55, 0.60 pass (3 of 10)
    assert out["DetectionMasks_Precision/mAP"] == pytest.approx(0.3)
    assert out["DetectionMasks_Precision/mAP@.50IOU"] == pytest.approx(1.0)
    assert out["DetectionMasks_Precision/mAP@.75IOU"] == pytest.approx(0.0)
