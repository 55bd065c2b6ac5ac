"""Faster R-CNN meta-arch: shape/finiteness contracts in train + eval modes
(reference test pattern: meta_architectures/faster_rcnn_meta_arch_test.py
uses fake extractors; here a tiny canvas keeps the real backbone cheap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.detector.faster_rcnn import (
    FasterRCNN,
    FasterRCNNConfig,
    MTLConfig,
)


def tiny_config(**kw):
    defaults = dict(
        num_classes=3,
        canvas_size=(64, 64),
        anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,),
        anchor_base_size=(32.0, 32.0),
        rpn_depth=32,
        first_stage_pre_nms_top_k=24,
        first_stage_max_proposals=12,
        first_stage_minibatch_size=16,
        second_stage_batch_size=8,
        max_gt_boxes=4,
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return FasterRCNNConfig(**defaults)


def make_gt(b=2, g=4):
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[:, 0] = [8, 8, 40, 40]
    boxes[:, 1] = [20, 28, 56, 60]
    classes = np.zeros((b, g), np.int32)
    classes[:, 1] = 2
    mask = np.zeros((b, g), bool)
    mask[:, :2] = True
    return {
        "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(classes),
        "mask": jnp.asarray(mask),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config(mtl=MTLConfig(multiobject=True, closeness=True, foreground=True))
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def test_anchor_count(model_and_vars):
    model, _ = model_and_vars
    # 64/16 = 4x4 grid, 2 anchors per loc
    assert model.anchors.shape == (4 * 4 * 2, 4)


def test_eval_predict_and_postprocess(model_and_vars):
    model, variables = model_and_vars
    images = model.preprocess(jnp.full((2, 64, 64, 3), 128.0))
    true_shapes = jnp.asarray([[64, 64], [48, 64]])
    pred = jax.jit(lambda v, im, ts: model.predict(v, im, ts, training=False))(
        variables, images, true_shapes
    )
    assert pred["rpn_objectness_logits"].shape == (2, 32, 2)
    assert pred["proposal_boxes"].shape == (2, 12, 4)
    det = jax.jit(model.postprocess)(pred, true_shapes)
    assert det["detection_boxes"].shape[0] == 2
    db = np.asarray(det["detection_boxes"])
    assert np.isfinite(db).all()
    assert (db >= -1e-5).all() and (db <= 1.0 + 1e-5).all()  # normalized to true image
    assert det["num_detections"].shape == (2,)


def test_train_predict_loss_all_tasks(model_and_vars):
    model, variables = model_and_vars
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 128.0))
    true_shapes = jnp.asarray([[64, 64], [64, 64]])
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def run(v, im):
        pred = model.predict(v, im, true_shapes, training=True, rng=rng, groundtruth=gt)
        return pred, model.loss(pred, gt, rng)

    pred, loss = run(variables, images)
    assert pred["proposal_boxes"].shape == (2, 8, 4)  # second_stage_batch_size
    expected = {
        "Loss/RPNLoss/objectness_loss",
        "Loss/RPNLoss/localization_loss",
        "Loss/BoxClassifierLoss/classification_loss",
        "Loss/BoxClassifierLoss/localization_loss",
        "Loss/MTL/foreground_loss",
        "Loss/MTL/multiobject_loss",
        "Loss/MTL/closeness_loss",
        "total_loss",
    }
    assert expected == set(loss.keys())
    for k, v in loss.items():
        assert np.isfinite(float(v)), k
    assert float(loss["total_loss"]) > 0


def test_train_predict_sampled_windows():
    """window_sampling: stochastic multi-object windows flow through the
    train predict — windows cover GT, differ per step rng, and the loss
    stays finite (MTL proto knob window_sampling; SURVEY.md §3.11)."""
    cfg = tiny_config(
        mtl=MTLConfig(multiobject=True, window_sampling=True)
    )
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 128.0))
    true_shapes = jnp.asarray([[64, 64], [64, 64]])

    @jax.jit
    def run(v, im, rng):
        pred = model.predict(
            v, im, true_shapes, training=True, rng=rng, groundtruth=gt
        )
        return pred, model.loss(pred, gt, rng)

    pred1, loss1 = run(variables, images, jax.random.PRNGKey(1))
    pred2, _ = run(variables, images, jax.random.PRNGKey(2))
    w1 = np.asarray(pred1["multiobject_windows"])
    w2 = np.asarray(pred2["multiobject_windows"])
    assert not np.allclose(w1, w2)  # stochastic across step rngs
    gtb = np.asarray(gt["boxes"])
    gtm = np.asarray(gt["mask"])
    assert (w1[gtm][:, 0] <= gtb[gtm][:, 0] + 1e-4).all()
    assert (w1[gtm][:, 2] >= gtb[gtm][:, 2] - 1e-4).all()
    assert np.isfinite(float(loss1["Loss/MTL/multiobject_loss"]))


def test_gradients_flow_everywhere(model_and_vars):
    model, variables = model_and_vars
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 100.0))
    true_shapes = jnp.asarray([[64, 64], [64, 64]])
    rng = jax.random.PRNGKey(2)

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        pred = model.predict(v, images, true_shapes, training=True, rng=rng, groundtruth=gt)
        return model.loss(pred, gt, rng)["total_loss"]

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every head receives gradient signal
    gnorms = {
        k: float(
            sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(v))
        )
        for k, v in grads.items()
    }
    for head in ["rpn", "box_predictor", "fg_head", "mo_head", "cl_head", "backbone"]:
        assert gnorms[head] > 0, f"no gradient into {head}: {gnorms}"


def test_no_groundtruth_image_trains(model_and_vars):
    """Zero valid GT must not produce NaNs (SURVEY.md §8 hard part 2)."""
    model, variables = model_and_vars
    gt = {
        "boxes": jnp.zeros((1, 4, 4)),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "mask": jnp.zeros((1, 4), bool),
    }
    images = model.preprocess(jnp.full((1, 64, 64, 3), 90.0))
    ts = jnp.asarray([[64, 64]])
    rng = jax.random.PRNGKey(3)
    pred = model.predict(variables, images, ts, training=True, rng=rng, groundtruth=gt)
    loss = model.loss(pred, gt, rng)
    for k, v in loss.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_refine_path_train_and_eval():
    """MTL refine: aux hidden features fused into stage-2 (SURVEY.md §3.11
    feature-refinement row); heads participate at eval too."""
    cfg = tiny_config(
        mtl=MTLConfig(multiobject=True, closeness=True, foreground=True, refine=True)
    )
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    # box predictor consumes 2048 + 1024 + 1024 features
    kernel = variables["params"]["box_predictor"]["class_logits"]["kernel"]
    assert kernel.shape[0] == 2048 + 1024 + 1024
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 128.0))
    ts = jnp.asarray([[64, 64], [64, 64]])
    rng = jax.random.PRNGKey(1)
    pred = model.predict(variables, images, ts, training=True, rng=rng, groundtruth=gt)
    loss = model.loss(pred, gt, rng)
    assert np.isfinite(float(loss["total_loss"]))
    # eval predict also runs the refine path (heads active at inference)
    det = model.postprocess(
        model.predict(variables, images, ts, training=False), ts
    )
    assert np.isfinite(np.asarray(det["detection_boxes"])).all()


def test_refine_gradients_into_aux_heads_from_detection_loss():
    cfg = tiny_config(
        mtl=MTLConfig(multiobject=True, closeness=False, foreground=False, refine=True)
    )
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 90.0))
    ts = jnp.asarray([[64, 64], [64, 64]])
    rng = jax.random.PRNGKey(2)

    def det_only_loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        pred = model.predict(v, images, ts, training=True, rng=rng, groundtruth=gt)
        l = model._second_stage_loss(pred, gt)
        return sum(l.values())

    grads = jax.grad(det_only_loss)(variables["params"])
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(grads["mo_head"])))
    assert gn > 0  # detection loss reaches the aux head through refine


def test_number_of_stages_one_rpn_only():
    """RPN-only mode (reference number_of_stages=1): proposals are the
    detections, loss has only stage-1 terms."""
    cfg = tiny_config(number_of_stages=1)
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    images = model.preprocess(jnp.full((1, 64, 64, 3), 128.0))
    ts = jnp.asarray([[64, 64]])
    gt = {
        "boxes": jnp.asarray([[[8.0, 8.0, 40.0, 40.0]] + [[0.0] * 4] * 3]),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "mask": jnp.asarray([[True, False, False, False]]),
    }
    rng = jax.random.PRNGKey(1)
    pred = model.predict(variables, images, ts, training=True, rng=rng, groundtruth=gt)
    assert "class_predictions" not in pred
    loss = model.loss(pred, gt, rng)
    assert set(loss) == {
        "Loss/RPNLoss/objectness_loss",
        "Loss/RPNLoss/localization_loss",
        "total_loss",
    }
    eval_pred = model.predict(variables, images, ts, training=False)
    det = model.postprocess(eval_pred, ts)
    assert det["detection_boxes"].shape == (1, cfg.first_stage_max_proposals, 4)
    assert (np.asarray(det["detection_classes"]) == 0).all()


def test_batch_norm_trainable_updates_stats():
    """batch_norm_trainable: true BatchNorm — moving stats update during
    training and the train step threads them into the new state."""
    cfg = tiny_config(batch_norm_trainable=True)
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 77.0))
    ts = jnp.asarray([[64, 64], [64, 64]])
    rng = jax.random.PRNGKey(1)
    pred = model.predict(variables, images, ts, training=True, rng=rng, groundtruth=gt)
    assert "updated_batch_stats" in pred
    old = variables["batch_stats"]["backbone"]["bn1"]["mean"]
    new = pred["updated_batch_stats"]["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    # full train step threads stats into state
    import optax

    from mtlx.train.train_step import create_train_state, make_train_step

    state = create_train_state(model, jax.random.PRNGKey(0), optax.sgd(1e-3))
    batch = {
        "image": jnp.full((2, 64, 64, 3), 77.0),
        "true_shape": ts,
        "gt_boxes": gt["boxes"],
        "gt_classes": gt["classes"],
        "gt_mask": gt["mask"],
    }
    new_state, metrics = jax.jit(make_train_step(model))(state, batch, rng)
    assert np.isfinite(float(metrics["total_loss"]))
    s_old = state.batch_stats["backbone"]["bn1"]["mean"]
    s_new = new_state.batch_stats["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(s_old), np.asarray(s_new))
    # eval predict uses running averages (no mutation, no crash)
    det = model.postprocess(
        model.predict(
            {"params": new_state.params, "batch_stats": new_state.batch_stats},
            images, ts, training=False,
        ),
        ts,
    )
    assert np.isfinite(np.asarray(det["detection_boxes"])).all()


def test_instance_mask_branch():
    """predict_instance_masks: mask logits per proposal, per-detection
    sigmoid masks in postprocess (reference MaskRCNNBoxPredictor optional
    mask output)."""
    cfg = tiny_config(predict_instance_masks=True, mask_prediction_conv_depth=32)
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    images = model.preprocess(jnp.full((1, 64, 64, 3), 100.0))
    ts = jnp.asarray([[64, 64]])
    pred = jax.jit(lambda v, im: model.predict(v, im, ts, training=False))(
        variables, images
    )
    # crop 14 -> maxpool 7 -> mask upsample 2x -> 14x14
    assert pred["mask_predictions"].shape == (1, 12, 14, 14, 3)
    det = jax.jit(model.postprocess)(pred, ts)
    assert det["detection_masks"].shape[0] == 1
    assert det["detection_masks"].shape[2:] == (14, 14)
    m = np.asarray(det["detection_masks"])
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()


def test_second_stage_hard_example_miner():
    from mtlx.losses.losses import HardExampleMinerConfig

    cfg = tiny_config(
        hard_example_miner=HardExampleMinerConfig(
            num_hard_examples=4, iou_threshold=0.7, loss_type="both",
            cls_loss_weight=1.0, loc_loss_weight=1.0,
        )
    )
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 100.0))
    ts = jnp.asarray([[64, 64], [64, 64]])
    rng = jax.random.PRNGKey(1)
    pred = model.predict(variables, images, ts, training=True, rng=rng, groundtruth=gt)
    loss = model.loss(pred, gt, rng)
    assert np.isfinite(float(loss["total_loss"]))
    # mined loss differs from the unmined config on identical inputs
    plain = FasterRCNN(tiny_config())
    loss2 = plain.loss(pred, gt, rng)
    assert not np.isclose(
        float(loss["Loss/BoxClassifierLoss/classification_loss"]),
        float(loss2["Loss/BoxClassifierLoss/classification_loss"]),
    )


def test_rpn_only_trainable_bn_still_updates_stats():
    """number_of_stages=1 + batch_norm_trainable: the backbone's mutated
    batch_stats must flow out of predict (regression: the RPN-only early
    return skipped the updated_batch_stats attach, so moving averages
    stayed at init for the whole run and eval normalized with them)."""
    cfg = tiny_config(number_of_stages=1, batch_norm_trainable=True)
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    images = model.preprocess(jnp.full((2, 64, 64, 3), 150.0))
    ts = jnp.asarray([[64, 64], [64, 64]])
    gt = {
        "boxes": jnp.asarray(
            [[[8.0, 8.0, 40.0, 40.0]] + [[0.0] * 4] * 3] * 2
        ),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.asarray([[True, False, False, False]] * 2),
    }
    pred = model.predict(variables, images, ts, training=True,
                         rng=jax.random.PRNGKey(1), groundtruth=gt)
    assert "updated_batch_stats" in pred
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(pred["updated_batch_stats"])
    moved = sum(
        float(jnp.sum(jnp.abs(a - b))) for a, b in zip(after, before)
    )
    assert moved > 0.0


def test_rpn_padding_anchors_do_not_consume_top_k():
    """Anchors entirely outside the true image (canvas/bucket padding)
    clip to zero area and must not occupy pre-NMS top-k slots — with an
    undertrained RPN scoring the padding high, proposals from the real
    image would otherwise be starved (the reference prunes empty boxes at
    clip time, before selection)."""
    cfg = tiny_config(first_stage_pre_nms_top_k=8,
                      first_stage_max_proposals=8)
    model = FasterRCNN(cfg)
    anchors = model.anchors_for((64, 64))
    n = anchors.shape[0]
    # true image occupies the top-left 32x32 of the 64x64 canvas
    ts = jnp.asarray([[32, 32]])
    inside = np.asarray(
        (anchors[:, 0] < 32) & (anchors[:, 1] < 32)
    )
    assert inside.sum() >= 4 and (~inside).sum() >= 8
    # padding anchors score HIGHER than every true-image anchor
    obj = np.zeros((1, n, 2), np.float32)
    obj[0, ~inside, 1] = 5.0
    obj[0, inside, 1] = 1.0
    enc = np.zeros((1, n, 4), np.float32)  # decode = the anchors themselves
    boxes, scores, keep = model._postprocess_rpn(
        jnp.asarray(obj), jnp.asarray(enc), ts, anchors
    )
    kept = np.asarray(keep[0])
    assert kept.any()
    kb = np.asarray(boxes[0])[kept]
    # every surviving proposal intersects the true image (nonzero area)
    areas = (kb[:, 2] - kb[:, 0]) * (kb[:, 3] - kb[:, 1])
    assert (areas > 0).all(), kb
    assert (kb[:, 0] < 32).all() and (kb[:, 1] < 32).all()


def test_miner_sums_over_proposal_normalizer():
    """Reference hard mining: per-ROI losses are divided by the proposal
    count, then the miner SUMS the mined subset — so the mined loss can
    never exceed the unmined loss (sum over a subset of nonnegative
    terms). Regression: dividing by the mined count instead yields the
    mean of the hardest subset, which is >= the unmined mean."""
    from mtlx.losses.losses import HardExampleMinerConfig

    cfg = tiny_config(
        hard_example_miner=HardExampleMinerConfig(
            num_hard_examples=2, iou_threshold=0.99, loss_type="both",
            cls_loss_weight=1.0, loc_loss_weight=1.0,
        )
    )
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 64, 64, 3), 100.0))
    ts = jnp.asarray([[64, 64], [64, 64]])
    rng = jax.random.PRNGKey(1)
    pred = model.predict(variables, images, ts, training=True, rng=rng,
                         groundtruth=gt)
    mined = model.loss(pred, gt, rng)
    plain = FasterRCNN(tiny_config()).loss(pred, gt, rng)
    for key in ("Loss/BoxClassifierLoss/classification_loss",
                "Loss/BoxClassifierLoss/localization_loss"):
        assert float(mined[key]) <= float(plain[key]) + 1e-6, key
