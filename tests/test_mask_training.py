"""Instance-mask training path: wire decode -> loader -> flip -> loss
(reference MaskRCNN mask branch, SURVEY.md §3.1 box_predictor row; round-1
gap: prediction existed with no training loss or data plumbing)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.data.example_decoder import (
    InputDataFields,
    build_example,
    decode_example,
)


def _png(image_array):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(image_array).save(buf, format="PNG")
    return buf.getvalue()


def _example_with_masks(h=32, w=48):
    img = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    boxes = np.asarray([[0.25, 0.25, 0.75, 0.5], [0.0, 0.5, 0.5, 1.0]], np.float32)
    masks = []
    for y1, x1, y2, x2 in boxes:
        m = np.zeros((h, w), np.uint8)
        m[int(y1 * h):int(y2 * h), int(x1 * w):int(x2 * w)] = 1
        masks.append(m)
    return build_example(
        _png(img), b"png", h, w, "im0", boxes, [1, 2], ["a", "b"],
        instance_masks=masks,
    ), masks


def test_mask_wire_roundtrip():
    ex, masks = _example_with_masks()
    out = decode_example(ex.SerializeToString(), load_instance_masks=True)
    got = out[InputDataFields.groundtruth_instance_masks]
    assert got.shape == (2, 32, 48)
    np.testing.assert_array_equal(got, np.stack(masks).astype(np.float32))
    # masks not decoded unless requested
    out2 = decode_example(ex.SerializeToString())
    assert InputDataFields.groundtruth_instance_masks not in out2


def test_loader_carries_reduced_masks(tmp_path):
    from mtlx.data import tfrecord
    from mtlx.data.loader import DetectionDataset

    ex, _ = _example_with_masks(h=64, w=64)
    path = str(tmp_path / "m.record")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    ds = DetectionDataset(
        [path], canvas_size=(64, 64), resizer=("fixed", {"height": 64, "width": 64}),
        max_boxes=4, load_instance_masks=True, mask_stride=4,
    )
    s = ds.get(0)
    gm = s["gt_instance_masks"]
    assert gm.shape == (4, 16, 16)
    # first instance covers rows [8,24), cols [12,24) at stride 4 ->
    # roughly rows [2,6), cols [3,6)
    assert gm[0].sum() > 0 and gm[1].sum() > 0 and gm[2].sum() == 0
    # the mask's active region matches the box region (IoU-ish check)
    ys, xs = np.nonzero(gm[0])
    box = s["gt_boxes"][0] / 4.0
    assert ys.min() >= int(box[0]) - 1 and ys.max() <= int(box[2]) + 1
    assert xs.min() >= int(box[1]) - 1 and xs.max() <= int(box[3]) + 1


def test_flip_transforms_instance_masks():
    from mtlx.data import preprocessor as prep

    g, gh, gw = 2, 8, 8
    masks = np.zeros((g, gh, gw), np.float32)
    masks[0, :, 0] = 1.0  # left column of the true region
    sample = {
        "image": jnp.zeros((32, 32, 3)),
        "boxes": jnp.asarray([[0.0, 0.0, 32.0, 4.0], [0, 0, 0, 0]], jnp.float32),
        "classes": jnp.zeros((g,), jnp.int32),
        "mask": jnp.asarray([True, False]),
        "true_shape": jnp.asarray([32, 32], jnp.int32),
        "instance_masks": jnp.asarray(masks),
    }
    out = prep.random_horizontal_flip(jax.random.PRNGKey(0), sample,
                                      probability=1.0)
    got = np.asarray(out["instance_masks"])
    assert got[0, :, -1].all() and got[0, :, 0].sum() == 0
    # boxes flipped consistently: x in [28, 32]
    assert float(out["boxes"][0, 1]) == pytest.approx(28.0)


def test_mask_loss_wired_and_decreasing():
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=(64, 64), anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=16, first_stage_pre_nms_top_k=32,
        first_stage_max_proposals=16,
        first_stage_minibatch_size=16, second_stage_batch_size=16,
        max_gt_boxes=4, dtype=jnp.float32,
        predict_instance_masks=True, mask_prediction_conv_depth=16,
    )
    model = FasterRCNN(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), make_optimizer(learning_rate=0.02)
    )
    step = jax.jit(make_train_step(model))
    # GT box coincides with a grid anchor (stride-16 grid, 32x32 anchor at
    # center (32, 32)) so an IoU>=0.5 proposal exists from step 0
    gm = np.zeros((1, 4, 16, 16), np.uint8)  # canvas/4 resolution
    gm[0, 0, 4:12, 4:12] = 1
    batch = {
        "image": jnp.full((1, 64, 64, 3), 96.0),
        "true_shape": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray([[[16, 16, 48, 48], [0, 0, 0, 0],
                                  [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        "gt_classes": jnp.zeros((1, 4), jnp.int32),
        "gt_mask": jnp.asarray([[True, False, False, False]]),
        "gt_instance_masks": jnp.asarray(gm),
    }
    # full train step: the mask loss is wired into metrics/total (it can be
    # 0 early — an untrained RPN yields no IoU>=0.5 proposals, as in the
    # reference)
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert "Loss/BoxClassifierLoss/mask_loss" in metrics
    assert np.isfinite(float(metrics["Loss/BoxClassifierLoss/mask_loss"]))

    # drive the mask branch directly with on-target proposals: loss starts
    # near ln(2) (zero-ish logits) and decreases under SGD on its params
    gt = {
        "boxes": batch["gt_boxes"],
        "classes": batch["gt_classes"],
        "mask": batch["gt_mask"],
        "instance_masks": batch["gt_instance_masks"],
    }
    proposals = jnp.tile(jnp.asarray([[[16.0, 16.0, 48.0, 48.0]]]), (1, 16, 1))
    pmask = jnp.ones((1, 16), bool)
    images = model.preprocess(batch["image"])

    def mask_loss(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        feats = model.modules.apply(
            variables, images, method=type(model.modules).features
        )
        _, _, masks, _ = model._predict_second_stage(
            variables, feats, proposals, False, None
        )
        pred = {
            "proposal_boxes": proposals,
            "proposal_mask": pmask,
            "mask_predictions": masks,
        }
        return model._mask_loss(pred, gt)["Loss/BoxClassifierLoss/mask_loss"]

    params = state.params
    losses = []
    grad_fn = jax.jit(jax.value_and_grad(mask_loss))
    first_grads = None
    for _ in range(5):
        val, grads = grad_fn(params)
        if first_grads is None:
            first_grads = grads
        losses.append(float(val))
        params = jax.tree_util.tree_map(lambda p, g: p - 0.05 * g, params, grads)
    # gradient flows into the mask head
    g_mask = jax.tree_util.tree_leaves(first_grads["mask_head"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_mask)
    assert 0.1 < losses[0] < 2.0
    assert losses[-1] < losses[0]

    # inference emits detection_masks (already present round 1; keep green)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred = model.predict(
        variables, model.preprocess(batch["image"]), batch["true_shape"],
        training=False,
    )
    det = model.postprocess(pred, batch["true_shape"])
    assert "detection_masks" in det


def test_augment_rejects_mask_unsafe_ops():
    from mtlx.train.train import make_augmented_batch_fn

    aug = make_augmented_batch_fn([("random_crop_image", {})])
    batch = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "gt_boxes": jnp.zeros((1, 2, 4)),
        "gt_classes": jnp.zeros((1, 2), jnp.int32),
        "gt_mask": jnp.zeros((1, 2), bool),
        "true_shape": jnp.asarray([[32, 32]], jnp.int32),
        "gt_instance_masks": jnp.zeros((1, 2, 8, 8)),
    }
    with pytest.raises(ValueError, match="instance masks"):
        aug(jax.random.PRNGKey(0), jnp.int32(0), batch)


def test_mask_metrics_through_eval_loop(tmp_path):
    """metrics_set 'coco_mask_metrics' end to end: masked records ->
    loader (reduced masks) -> eval step (mask predictions) -> pasted
    masks + upscaled gt masks -> segm mAP keys in the metrics dict."""
    from mtlx.config.protos import pipeline_pb2
    from mtlx.data import tfrecord
    from mtlx.data.loader import DetectionDataset
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.eval.eval import evaluate_checkpoint
    from mtlx.train.train_step import create_train_state, make_optimizer

    path = str(tmp_path / "me.record")
    with tfrecord.TFRecordWriter(path) as w:
        for _ in range(2):
            ex, _ = _example_with_masks(h=64, w=64)
            w.write(ex.SerializeToString())
    ds = DetectionDataset(
        [path], (64, 64), resizer=("fixed", {"height": 64, "width": 64}),
        max_boxes=4, load_instance_masks=True, mask_stride=8,
    )
    model = FasterRCNN(FasterRCNNConfig(
        num_classes=2, canvas_size=(64, 64),
        anchor_scales=(0.5, 1.0), anchor_aspect_ratios=(1.0,),
        anchor_base_size=(32.0, 32.0), rpn_depth=16,
        first_stage_pre_nms_top_k=16, first_stage_max_proposals=8,
        second_stage_max_total_detections=8,
        predict_instance_masks=True, mask_prediction_conv_depth=8,
        max_gt_boxes=4, dtype=jnp.float32,
    ))
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer())
    eval_config = pipeline_pb2.EvalConfig()
    eval_config.num_examples = 2
    eval_config.metrics_set.append("coco_mask_metrics")
    eval_config.metrics_set.append("pascal_voc_detection_metrics")
    eval_config.eval_instance_masks = True
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    metrics = evaluate_checkpoint(model, state, ds, eval_config, cats)
    assert "DetectionMasks_Precision/mAP" in metrics
    assert "Precision/mAP@0.5IOU" in metrics  # box metrics coexist
    assert np.isfinite(metrics["DetectionMasks_Precision/mAP"])
