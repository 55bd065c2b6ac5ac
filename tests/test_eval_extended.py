"""OpenImages (group-of) and instance-segmentation evaluators + mask
geometry oracles (reference utils/np_mask_ops.py and the
open_images_V2 / pascal_voc_instance_segmentation metrics_set entries)."""

import numpy as np

from mtlx.eval.object_detection_evaluation import (
    OpenImagesDetectionEvaluator,
    PascalDetectionEvaluator,
    PascalInstanceSegmentationEvaluator,
    WeightedPascalInstanceSegmentationEvaluator,
)
from mtlx.geometry import np_mask_ops

CATS = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]


def _mask(h, w, y0, x0, y1, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


# ---------- np_mask_ops oracle ----------


def test_np_mask_ops_hand_computed():
    a = _mask(10, 10, 0, 0, 4, 4)  # 16 px
    b = _mask(10, 10, 2, 2, 6, 6)  # 16 px, overlap 2x2=4
    c = _mask(10, 10, 8, 8, 10, 10)  # disjoint
    masks1 = np.stack([a])
    masks2 = np.stack([b, c])
    np.testing.assert_allclose(np_mask_ops.area(masks2), [16.0, 4.0])
    np.testing.assert_allclose(
        np_mask_ops.intersection(masks1, masks2), [[4.0, 0.0]]
    )
    np.testing.assert_allclose(
        np_mask_ops.iou(masks1, masks2), [[4.0 / 28.0, 0.0]]
    )
    # ioa normalizes by the SECOND set's areas (np_box_ops convention)
    np.testing.assert_allclose(
        np_mask_ops.ioa(masks1, masks2), [[4.0 / 16.0, 0.0]]
    )


# ---------- OpenImages group-of protocol ----------


def _gt(boxes, classes, group_of=None):
    d = {
        "groundtruth_boxes": np.asarray(boxes, np.float32),
        "groundtruth_classes": np.asarray(classes, np.int64),
    }
    if group_of is not None:
        d["groundtruth_group_of"] = np.asarray(group_of, bool)
    return d


def _det(boxes, scores, classes):
    return {
        "detection_boxes": np.asarray(boxes, np.float32),
        "detection_scores": np.asarray(scores, np.float32),
        "detection_classes": np.asarray(classes, np.int64),
    }


def test_open_images_group_of_detection_not_fp():
    """A detection inside a group-of box (IoA >= 0.5) is unscored — the
    same detections under the Pascal protocol yield a false positive."""
    gt = _gt([[0, 0, 10, 10], [50, 50, 100, 100]], [1, 1], [False, True])
    # det0 matches the normal box; det1 falls inside the group-of box
    det = _det(
        [[0, 0, 10, 10], [60, 60, 80, 80]], [0.8, 0.9], [1, 1]
    )
    oi = OpenImagesDetectionEvaluator(CATS)
    oi.add_single_ground_truth_image_info("im0", gt)
    oi.add_single_detected_image_info("im0", det)
    m = oi.evaluate()
    assert m["OpenImagesV2_PerformanceByCategory/AP@0.5IOU/a"] == 1.0

    pv = PascalDetectionEvaluator(CATS)
    pv.add_single_ground_truth_image_info("im0", _gt(gt["groundtruth_boxes"], [1, 1]))
    pv.add_single_detected_image_info("im0", det)
    # Pascal: det1 (higher score, IoU vs 50x50 box = 400/2500 < 0.5) is a
    # plain fp ranked first -> AP drops below 1 for two-box recall
    pm = pv.evaluate()
    assert pm["PerformanceByCategory/AP@0.5IOU/a"] < 1.0


def test_open_images_group_of_excluded_from_recall():
    """Group-of boxes don't count as missed groundtruth."""
    gt = _gt([[0, 0, 10, 10], [50, 50, 100, 100]], [1, 1], [False, True])
    det = _det([[0, 0, 10, 10]], [0.9], [1])  # only the normal box found
    oi = OpenImagesDetectionEvaluator(CATS)
    oi.add_single_ground_truth_image_info("im0", gt)
    oi.add_single_detected_image_info("im0", det)
    m = oi.evaluate()
    assert m["OpenImagesV2_Precision/mAP@0.5IOU"] == 1.0


def test_open_images_far_detection_still_fp():
    gt = _gt([[50, 50, 100, 100]], [1], [True])
    det = _det([[200, 200, 210, 210]], [0.9], [1])  # nowhere near group-of
    oi = OpenImagesDetectionEvaluator(CATS)
    oi.add_single_ground_truth_image_info("im0", gt)
    oi.add_single_detected_image_info("im0", det)
    m = oi.evaluate()
    # class has zero countable gt and one fp -> AP is nan, excluded
    assert np.isnan(m["OpenImagesV2_PerformanceByCategory/AP@0.5IOU/a"])


# ---------- instance segmentation (mask IoU matching) ----------


def test_instance_segmentation_mask_iou_decides_match():
    """Boxes identical, masks disjoint: the box evaluator scores a tp, the
    mask evaluator scores a fp."""
    h = w = 20
    gt_box = np.asarray([[0, 0, 20, 20]], np.float32)
    gt_mask = np.stack([_mask(h, w, 0, 0, 20, 10)])  # left half
    det_mask = np.stack([_mask(h, w, 0, 10, 20, 20)])  # right half

    gt = {
        "groundtruth_boxes": gt_box,
        "groundtruth_classes": np.asarray([1]),
        "groundtruth_instance_masks": gt_mask,
    }
    det = {
        "detection_boxes": gt_box,
        "detection_scores": np.asarray([0.9], np.float32),
        "detection_classes": np.asarray([1]),
        "detection_masks": det_mask,
    }
    seg = PascalInstanceSegmentationEvaluator(CATS)
    seg.add_single_ground_truth_image_info("im0", gt)
    seg.add_single_detected_image_info("im0", det)
    m = seg.evaluate()
    assert m["PascalMasks_PerformanceByCategory/AP@0.5IOU/a"] == 0.0

    # same masks on both sides -> perfect
    seg2 = PascalInstanceSegmentationEvaluator(CATS)
    seg2.add_single_ground_truth_image_info("im0", gt)
    det2 = dict(det, detection_masks=gt_mask)
    seg2.add_single_detected_image_info("im0", det2)
    m2 = seg2.evaluate()
    assert m2["PascalMasks_PerformanceByCategory/AP@0.5IOU/a"] == 1.0
    assert "PascalMasks_Precision/mAP@0.5IOU" in m2


def test_weighted_instance_segmentation_pools_classes():
    h = w = 16
    gt = {
        "groundtruth_boxes": np.asarray(
            [[0, 0, 8, 8], [8, 8, 16, 16]], np.float32
        ),
        "groundtruth_classes": np.asarray([1, 2]),
        "groundtruth_instance_masks": np.stack(
            [_mask(h, w, 0, 0, 8, 8), _mask(h, w, 8, 8, 16, 16)]
        ),
    }
    det = {
        "detection_boxes": gt["groundtruth_boxes"],
        "detection_scores": np.asarray([0.9, 0.8], np.float32),
        "detection_classes": np.asarray([1, 2]),
        "detection_masks": gt["groundtruth_instance_masks"],
    }
    ev = WeightedPascalInstanceSegmentationEvaluator(CATS)
    ev.add_single_ground_truth_image_info("im0", gt)
    ev.add_single_detected_image_info("im0", det)
    m = ev.evaluate()
    assert m["WeightedPascalMasks_Precision/mAP@0.5IOU"] == 1.0


# ---------- dispatch ----------


def test_metrics_set_dispatch_new_names():
    from mtlx.config.protos import pipeline_pb2
    from mtlx.eval.eval import build_evaluators

    ec = pipeline_pb2.EvalConfig()
    ec.metrics_set.extend(
        [
            "open_images_V2_detection_metrics",
            "pascal_voc_instance_segmentation_metrics",
            "weighted_pascal_voc_instance_segmentation_metrics",
        ]
    )
    evs = build_evaluators(ec, CATS)
    names = [type(e).__name__ for e in evs]
    assert names == [
        "OpenImagesDetectionEvaluator",
        "PascalInstanceSegmentationEvaluator",
        "WeightedPascalInstanceSegmentationEvaluator",
    ]


def test_group_of_flows_from_example_to_loader():
    import io

    from PIL import Image

    from mtlx.data.example_decoder import build_example, decode_example

    buf = io.BytesIO()
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(buf, format="JPEG")
    ex = build_example(
        buf.getvalue(), b"jpeg", 40, 60, "im0.jpg",
        np.asarray([[0.1, 0.1, 0.5, 0.5], [0.2, 0.2, 0.9, 0.9]], np.float32),
        [1, 2], ["a", "b"], group_of=[0, 1],
    )
    out = decode_example(ex.SerializeToString(), decode_image=False)
    np.testing.assert_array_equal(out["groundtruth_group_of"], [0, 1])


def test_mask_metrics_without_masks_fail_fast():
    """A config requesting instance-seg metrics it can never feed must
    raise a config error up front, not KeyError mid-eval-loop: the Pascal
    mask evaluators hard-require mask arrays on every image."""
    import pytest

    from mtlx.config.protos import pipeline_pb2
    from mtlx.eval.eval import evaluate_checkpoint

    cats = [{"id": 1, "name": "a"}]

    class _DS:
        load_instance_masks = False

        def __len__(self):
            return 0

    class _Model:
        class cfg:
            predict_instance_masks = False

    ec = pipeline_pb2.EvalConfig()
    ec.metrics_set.append("pascal_voc_instance_segmentation_metrics")
    with pytest.raises(ValueError, match="eval_instance_masks"):
        evaluate_checkpoint(_Model(), None, _DS(), ec, cats)
    ec.eval_instance_masks = True
    with pytest.raises(ValueError, match="load_instance_masks"):
        evaluate_checkpoint(_Model(), None, _DS(), ec, cats)

    class _DSWithMasks(_DS):
        load_instance_masks = True

    with pytest.raises(ValueError, match="predict_instance_masks"):
        evaluate_checkpoint(_Model(), None, _DSWithMasks(), ec, cats)
