"""VOC evaluator stack: hand-computed AP/precision/recall/CorLoc
(reference utils/object_detection_evaluation_test.py pattern)."""

import numpy as np

from mtlx.eval import metrics
from mtlx.eval.object_detection_evaluation import (
    ObjectDetectionEvaluation,
    PascalDetectionEvaluator,
)


def test_precision_recall_simple():
    scores = np.asarray([0.9, 0.8, 0.7])
    labels = np.asarray([1.0, 0.0, 1.0])
    p, r = metrics.compute_precision_recall(scores, labels, num_gt=3)
    np.testing.assert_allclose(p, [1.0, 0.5, 2 / 3])
    np.testing.assert_allclose(r, [1 / 3, 1 / 3, 2 / 3])


def test_average_precision_hand_computed():
    p = np.asarray([1.0, 0.5, 2 / 3])
    r = np.asarray([1 / 3, 1 / 3, 2 / 3])
    ap = metrics.compute_average_precision(p, r)
    # monotonic envelope: p=1 up to r=1/3, then 2/3 up to r=2/3
    want = 1 / 3 * 1.0 + (2 / 3 - 1 / 3) * (2 / 3)
    np.testing.assert_allclose(ap, want, rtol=1e-6)


def test_perfect_detection_ap_one():
    ev = ObjectDetectionEvaluation(num_classes=2)
    gt_boxes = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    ev.add_single_ground_truth_image_info("im0", gt_boxes, np.asarray([0, 1]))
    ev.add_single_detected_image_info(
        "im0", gt_boxes, np.asarray([0.9, 0.8], np.float32), np.asarray([0, 1])
    )
    aps, mean_ap, _, _, corloc, mean_corloc = ev.evaluate()
    np.testing.assert_allclose(aps, [1.0, 1.0])
    assert mean_ap == 1.0 and mean_corloc == 1.0


def test_false_positive_lowers_precision():
    ev = ObjectDetectionEvaluation(num_classes=1)
    ev.add_single_ground_truth_image_info(
        "im0", np.asarray([[0, 0, 10, 10]], np.float32), np.asarray([0])
    )
    dets = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    ev.add_single_detected_image_info(
        "im0", dets, np.asarray([0.9, 0.95], np.float32), np.asarray([0, 0])
    )
    aps, mean_ap, *_ = ev.evaluate()
    # fp ranked first: precision at the tp is 1/2, recall 1 -> AP 0.5
    np.testing.assert_allclose(aps, [0.5])


def test_duplicate_detection_is_fp():
    ev = ObjectDetectionEvaluation(num_classes=1)
    ev.add_single_ground_truth_image_info(
        "im0", np.asarray([[0, 0, 10, 10]], np.float32), np.asarray([0])
    )
    dets = np.asarray([[0, 0, 10, 10], [0.5, 0.5, 10, 10]], np.float32)
    ev.add_single_detected_image_info(
        "im0", dets, np.asarray([0.9, 0.8], np.float32), np.asarray([0, 0])
    )
    aps, *_ = ev.evaluate()
    np.testing.assert_allclose(aps, [1.0])  # second match doesn't count as tp
    # and doesn't hurt AP since it ranks after the tp at full recall


def test_difficult_gt_excluded():
    ev = ObjectDetectionEvaluation(num_classes=1)
    ev.add_single_ground_truth_image_info(
        "im0",
        np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32),
        np.asarray([0, 0]),
        groundtruth_is_difficult=np.asarray([False, True]),
    )
    assert ev.num_gt_per_class[0] == 1  # difficult box not counted
    # detection matching the difficult box is dropped entirely
    ev.add_single_detected_image_info(
        "im0",
        np.asarray([[20, 20, 30, 30]], np.float32),
        np.asarray([0.9], np.float32),
        np.asarray([0]),
    )
    aps, *_ = ev.evaluate()
    np.testing.assert_allclose(aps, [0.0])  # no tp, but also no fp recorded
    assert len(ev.scores_per_class[0][0]) == 0


def test_pascal_evaluator_metric_names():
    cats = [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}]
    ev = PascalDetectionEvaluator(cats)
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    ev.add_single_ground_truth_image_info(
        "im0", {"groundtruth_boxes": gt, "groundtruth_classes": np.asarray([1])}
    )
    ev.add_single_detected_image_info(
        "im0",
        {
            "detection_boxes": gt,
            "detection_scores": np.asarray([0.9], np.float32),
            "detection_classes": np.asarray([1]),
        },
    )
    m = ev.evaluate()
    assert m["Precision/mAP@0.5IOU"] == 1.0
    assert m["PerformanceByCategory/AP@0.5IOU/cat"] == 1.0
    assert np.isnan(m["PerformanceByCategory/AP@0.5IOU/dog"])
    assert "CorLoc/CorLoc@0.5IOU" in m


def test_iou_threshold_boundary():
    ev = ObjectDetectionEvaluation(num_classes=1, matching_iou_threshold=0.5)
    ev.add_single_ground_truth_image_info(
        "im0", np.asarray([[0, 0, 10, 10]], np.float32), np.asarray([0])
    )
    # box with IoU exactly 1/3 < 0.5 -> fp
    ev.add_single_detected_image_info(
        "im0",
        np.asarray([[0, 5, 10, 15]], np.float32),
        np.asarray([0.9], np.float32),
        np.asarray([0]),
    )
    aps, *_ = ev.evaluate()
    np.testing.assert_allclose(aps, [0.0])


def test_eval_instance_masks_gates_mask_visualization(monkeypatch, tmp_path):
    """eval_config.eval_instance_masks controls whether detection_masks
    participate in evaluation output (reference eval.proto field 12)."""
    import jax

    from mtlx.config.protos import pipeline_pb2
    from mtlx.eval import eval as eval_cli

    class StubModel:
        def preprocess(self, images):
            return images

        def predict(self, variables, images, true_shape, training=False):
            return {}

        def postprocess(self, pred, true_shape):
            b = true_shape.shape[0]
            return {
                "detection_boxes": np.tile(
                    np.asarray([[[0.1, 0.1, 0.5, 0.5]]], np.float32),
                    (b, 1, 1)),
                "detection_scores": np.full((b, 1), 0.9, np.float32),
                "detection_classes": np.zeros((b, 1), np.int32),
                "num_detections": np.ones((b,), np.int32),
                "detection_masks": np.ones((b, 1, 8, 8), np.float32),
            }

    class StubState:
        params = {}
        batch_stats = {}

    class StubDataset:
        def __len__(self):
            return 1

        def get(self, i):
            return {
                "image": np.zeros((16, 16, 3), np.uint8),
                "true_shape": np.asarray([16, 16]),
                "gt_boxes": np.asarray([[1.0, 1.0, 8.0, 8.0]], np.float32),
                "gt_classes": np.asarray([0]),
                "gt_mask": np.asarray([True]),
                "gt_difficult": np.asarray([0]),
                "source_id": f"im{i}",
            }

    # make_eval_step jits through the stub; run on CPU arrays directly
    def fake_jit(f=None, **kw):
        return f if f is not None else (lambda g: g)

    monkeypatch.setattr(jax, "jit", fake_jit)
    calls = []
    from mtlx.utils import visualization_utils as viz

    monkeypatch.setattr(
        viz, "paste_instance_masks",
        lambda masks, boxes, h, w: calls.append(1)
        or np.zeros((len(boxes), h, w), np.uint8),
    )
    cats = [{"id": 1, "name": "cat"}]
    for flag, expected in ((False, 0), (True, 1)):
        ec = pipeline_pb2.EvalConfig()
        ec.num_examples = 1
        ec.num_visualizations = 1
        ec.visualization_export_dir = str(tmp_path / f"viz{int(flag)}")
        ec.eval_instance_masks = flag
        calls.clear()
        m = eval_cli.evaluate_checkpoint(
            StubModel(), StubState(), StubDataset(), ec, cats
        )
        assert len(calls) == expected, flag
        assert "Precision/mAP@0.5IOU" in m


def test_eval_batches_are_bucket_grouped(monkeypatch, tmp_path):
    """evaluate_checkpoint orders records bucket-major so a batch never
    mixes portrait and landscape (a mixed batch computes at the full
    canvas bucket); metrics are per-image so the reorder is free."""
    import jax

    from mtlx.config.protos import pipeline_pb2
    from mtlx.eval import eval as eval_cli

    shapes_seen = []

    class StubModel:
        supports_bucketed_compute = True

        class cfg:
            canvas_size = (512, 512)

        def preprocess(self, images):
            return images

        def predict(self, variables, images, true_shape, training=False):
            shapes_seen.append(tuple(images.shape[1:3]))
            return {}

        def postprocess(self, pred, true_shape):
            b = true_shape.shape[0]
            return {
                "detection_boxes": np.zeros((b, 1, 4), np.float32),
                "detection_scores": np.zeros((b, 1), np.float32),
                "detection_classes": np.zeros((b, 1), np.int32),
                "num_detections": np.zeros((b,), np.int32),
            }

    class StubState:
        params = {}
        batch_stats = {}

    class StubDataset:
        # alternating landscape (300x500 -> 384x512) / portrait
        # (500x300 -> 512x384)
        canvas_size = (512, 512)
        _t = [(300, 500), (500, 300)] * 2

        def __len__(self):
            return 4

        def peek_target_shape(self, i):
            return self._t[i]

        def get(self, i):
            th, tw = self._t[i]
            img = np.zeros((512, 512, 3), np.uint8)
            return {
                "image": img,
                "true_shape": np.asarray([th, tw]),
                "gt_boxes": np.asarray([[1.0, 1.0, 8.0, 8.0]], np.float32),
                "gt_classes": np.asarray([0]),
                "gt_mask": np.asarray([True]),
                "gt_difficult": np.asarray([0]),
                "source_id": f"im{i}",
            }

    monkeypatch.setattr(jax, "jit", lambda f=None, **kw: f)
    ec = pipeline_pb2.EvalConfig()
    ec.num_examples = 4
    cats = [{"id": 1, "name": "cat"}]
    eval_cli.evaluate_checkpoint(
        StubModel(), StubState(), StubDataset(), ec, cats, batch_size=2
    )
    # bucket-major order -> one pure landscape batch + one pure portrait
    assert sorted(shapes_seen) == [(384, 512), (512, 384)], shapes_seen


def test_eval_step_is_jitted_once_per_model(monkeypatch):
    """The polling eval loop calls evaluate_checkpoint per checkpoint; a
    fresh jax.jit closure each call would retrace and recompile every
    poll (minutes per checkpoint on TPU). The jitted step is cached on
    the model object."""
    import jax

    from mtlx.config.protos import pipeline_pb2
    from mtlx.eval import eval as eval_cli

    class StubModel:
        def preprocess(self, images):
            return images

        def predict(self, variables, images, true_shape, training=False):
            return {}

        def postprocess(self, pred, true_shape):
            b = true_shape.shape[0]
            return {
                "detection_boxes": np.zeros((b, 1, 4), np.float32),
                "detection_scores": np.zeros((b, 1), np.float32),
                "detection_classes": np.zeros((b, 1), np.int32),
                "num_detections": np.zeros((b,), np.int32),
            }

    class StubState:
        params = {}
        batch_stats = {}

    class StubDataset:
        def __len__(self):
            return 1

        def get(self, i):
            return {
                "image": np.zeros((16, 16, 3), np.uint8),
                "true_shape": np.asarray([16, 16]),
                "gt_boxes": np.asarray([[1.0, 1.0, 8.0, 8.0]], np.float32),
                "gt_classes": np.asarray([0]),
                "gt_mask": np.asarray([True]),
                "gt_difficult": np.asarray([0]),
                "source_id": f"im{i}",
            }

    jit_calls = []

    def counting_jit(f=None, **kw):
        jit_calls.append(1)
        return f

    monkeypatch.setattr(jax, "jit", counting_jit)
    ec = pipeline_pb2.EvalConfig()
    ec.num_examples = 1
    cats = [{"id": 1, "name": "cat"}]
    model, state, ds = StubModel(), StubState(), StubDataset()
    for _ in range(3):
        eval_cli.evaluate_checkpoint(model, state, ds, ec, cats)
    assert sum(jit_calls) == 1, jit_calls


import pytest


@pytest.mark.parametrize("eval_batch", [1, 2])
def test_eval_max_bucket_variants_bounds_shapes(monkeypatch, eval_batch):
    """--max_bucket_variants in eval: rare buckets pad up to kept
    supersets, so the eval-step variant set is bounded (here N=1 ->
    everything computes at the canvas). Applies at the default
    batch_size 1 too — per-image buckets fan out variants the same way."""
    import jax

    from mtlx.config.protos import pipeline_pb2
    from mtlx.eval import eval as eval_cli

    shapes_seen = []

    class StubModel:
        supports_bucketed_compute = True

        class cfg:
            canvas_size = (512, 512)

        def preprocess(self, images):
            return images

        def predict(self, variables, images, true_shape, training=False):
            shapes_seen.append(tuple(images.shape[1:3]))
            return {}

        def postprocess(self, pred, true_shape):
            b = true_shape.shape[0]
            return {
                "detection_boxes": np.zeros((b, 1, 4), np.float32),
                "detection_scores": np.zeros((b, 1), np.float32),
                "detection_classes": np.zeros((b, 1), np.int32),
                "num_detections": np.zeros((b,), np.int32),
            }

    class StubState:
        params = {}
        batch_stats = {}

    class StubDataset:
        canvas_size = (512, 512)
        _t = [(300, 500), (500, 300)] * 2

        def __len__(self):
            return 4

        def peek_target_shape(self, i):
            return self._t[i]

        def get(self, i):
            th, tw = self._t[i]
            return {
                "image": np.zeros((512, 512, 3), np.uint8),
                "true_shape": np.asarray([th, tw]),
                "gt_boxes": np.asarray([[1.0, 1.0, 8.0, 8.0]], np.float32),
                "gt_classes": np.asarray([0]),
                "gt_mask": np.asarray([True]),
                "gt_difficult": np.asarray([0]),
                "source_id": f"im{i}",
            }

    monkeypatch.setattr(jax, "jit", lambda f=None, **kw: f)
    ec = pipeline_pb2.EvalConfig()
    ec.num_examples = 4
    cats = [{"id": 1, "name": "cat"}]
    eval_cli.evaluate_checkpoint(
        StubModel(), StubState(), StubDataset(), ec, cats,
        batch_size=eval_batch, max_bucket_variants=1,
    )
    expected = [(512, 512)] * (4 // eval_batch)
    assert shapes_seen == expected, shapes_seen
