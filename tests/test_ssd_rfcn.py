"""SSD + R-FCN meta-arch contracts (reference ssd_meta_arch_test pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.detector.ssd import SSD, SSDConfig


@pytest.fixture(scope="module")
def ssd_model():
    cfg = SSDConfig(
        num_classes=3,
        canvas_size=(128, 128),
        depth_multiplier=0.25,
        num_layers=6,
        max_gt_boxes=4,
        max_detections_per_class=8,
        max_total_detections=10,
        dtype=jnp.float32,
    )
    model = SSD(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def make_gt(b=2):
    # absolute canvas pixels (the loader contract; SSD normalizes internally)
    return {
        "boxes": jnp.tile(
            jnp.asarray([[[0.1, 0.1, 0.5, 0.5], [0.4, 0.5, 0.9, 0.95],
                          [0, 0, 0, 0], [0, 0, 0, 0]]]) * 128.0,
            (b, 1, 1),
        ),
        "classes": jnp.tile(jnp.asarray([[0, 2, 0, 0]]), (b, 1)),
        "mask": jnp.tile(jnp.asarray([[True, True, False, False]]), (b, 1)),
    }


def test_ssd_predict_shapes(ssd_model):
    model, variables = ssd_model
    images = model.preprocess(jnp.full((2, 128, 128, 3), 128.0))
    pred = jax.jit(lambda v, im: model.predict(v, im))(variables, images)
    a = pred["anchors"].shape[0]
    assert pred["class_predictions_with_background"].shape == (2, a, 4)
    assert pred["box_encodings"].shape == (2, a, 4)
    # 6 layers: 8x8(3 anchors reduced lowest) + 4x4,2x2,1x1,1x1?... just
    # sanity: anchors in normalized coords
    anchors = np.asarray(pred["anchors"])
    assert anchors.min() > -1.5 and anchors.max() < 2.5


def test_ssd_anchor_count_matches_predictor(ssd_model):
    model, variables = ssd_model
    images = model.preprocess(jnp.zeros((1, 128, 128, 3)))
    pred = model.predict(variables, images)
    assert pred["anchors"].shape[0] == pred["box_encodings"].shape[1]


def test_ssd_loss_finite_and_learns(ssd_model):
    model, variables = ssd_model
    gt = make_gt()
    images = model.preprocess(jnp.full((2, 128, 128, 3), 100.0))

    @jax.jit
    def loss_fn(params):
        v = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        pred = model.predict(v, images)
        return model.loss(pred, gt)["total_loss"]

    l0 = float(loss_fn(variables["params"]))
    assert np.isfinite(l0) and l0 > 0
    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    gn = float(
        sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))
    )
    assert np.isfinite(gn) and gn > 0
    # one SGD step reduces the loss
    import optax

    tx = optax.sgd(1e-3, momentum=0.9)
    params = variables["params"]
    state = tx.init(params)
    for _ in range(5):
        g = jax.jit(jax.grad(loss_fn))(params)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params))
    assert l1 < l0


def test_ssd_zero_gt_no_nan(ssd_model):
    model, variables = ssd_model
    gt = {
        "boxes": jnp.zeros((1, 4, 4)),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "mask": jnp.zeros((1, 4), bool),
    }
    images = model.preprocess(jnp.zeros((1, 128, 128, 3)))
    pred = model.predict(variables, images)
    loss = model.loss(pred, gt)
    for k, v in loss.items():
        assert np.isfinite(float(v)), k


def test_ssd_postprocess(ssd_model):
    model, variables = ssd_model
    images = model.preprocess(jnp.full((2, 128, 128, 3), 50.0))
    pred = model.predict(variables, images)
    det = jax.jit(model.postprocess)(pred)
    assert det["detection_boxes"].shape == (2, 10, 4)
    b = np.asarray(det["detection_boxes"])
    assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()


def test_rfcn_predict_loss_postprocess():
    from mtlx.detector.rfcn import RFCN, RFCNConfig

    cfg = RFCNConfig(
        num_classes=3,
        canvas_size=(64, 64),
        anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,),
        anchor_base_size=(32.0, 32.0),
        rpn_depth=32,
        rfcn_depth=32,
        first_stage_pre_nms_top_k=24,
        first_stage_max_proposals=12,
        first_stage_minibatch_size=16,
        second_stage_batch_size=8,
        max_gt_boxes=4,
        dtype=jnp.float32,
    )
    model = RFCN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    images = model.preprocess(jnp.full((2, 64, 64, 3), 128.0))
    ts = jnp.asarray([[64, 64], [64, 64]])
    gt = {
        "boxes": jnp.tile(jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [0] * 4, [0] * 4, [0] * 4]]), (2, 1, 1)),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.tile(jnp.asarray([[True, False, False, False]]), (2, 1)),
    }
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def run(v):
        pred = model.predict(v, images, ts, training=True, rng=rng, groundtruth=gt)
        return pred, model.loss(pred, gt, rng)

    pred, loss = run(variables)
    assert pred["class_predictions"].shape == (2, 8, 4)
    assert pred["refined_box_encodings"].shape == (2, 8, 3, 4)
    for k, v in loss.items():
        assert np.isfinite(float(v)), k

    eval_pred = model.predict(variables, images, ts, training=False)
    det = model.postprocess(eval_pred, ts)
    assert det["detection_boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(det["detection_boxes"])).all()


def test_ssd_bn_epsilon_threads_from_conv_hyperparams():
    """conv_hyperparams.batch_norm.epsilon reaches the extractor's BN
    (previously a fixed 1e-5 regardless of config)."""
    import numpy as np
    from google.protobuf import text_format

    from mtlx.builders import ssd_builder
    from mtlx.config.protos import pipeline_pb2

    proto = pipeline_pb2.Ssd()
    text_format.Parse(
        """num_classes: 2
           image_resizer { fixed_shape_resizer { height: 64 width: 64 } }
           feature_extractor {
             type: 'ssd_mobilenet_v1' depth_multiplier: 0.25 min_depth: 8
             conv_hyperparams {
               batch_norm { epsilon: 0.25 }
             }
           }
           anchor_generator { ssd_anchor_generator { num_layers: 4 } }
           box_predictor { convolutional_box_predictor { } }
        """, proto)
    model = ssd_builder.build(proto, is_training=False, max_gt_boxes=4,
                              dtype=jnp.float32)
    assert model.cfg.bn_epsilon == pytest.approx(0.25)

    proto.feature_extractor.ClearField("conv_hyperparams")
    model_default = ssd_builder.build(proto, is_training=False,
                                      max_gt_boxes=4, dtype=jnp.float32)
    # bare default = slim mobilenet/inception arg_scope epsilon
    assert model_default.cfg.bn_epsilon == pytest.approx(1e-3)

    # the knob changes the forward numerics (epsilon enters the BN affine)
    import jax

    x = jnp.full((1, 64, 64, 3), 17.0)
    v = model.init_variables(jax.random.PRNGKey(0))
    a = model.predict(v, model.preprocess(x))
    v2 = model_default.init_variables(jax.random.PRNGKey(0))
    b = model_default.predict(v2, model_default.preprocess(x))
    assert not np.allclose(
        np.asarray(a["class_predictions_with_background"]),
        np.asarray(b["class_predictions_with_background"]),
    )


def test_rfcn_runs_classifier_features_image_wide():
    """The reference rfcn_meta_arch runs extract_box_classifier_features
    (resnet block4) image-wide before the position-sensitive predictor
    (regression: the predictor consumed stride-16 conv4 directly, so
    SecondStageFeatureExtractor weights had no home and the reduce conv
    saw 1024 channels instead of block4's 2048)."""
    import jax
    from mtlx.detector.rfcn import RFCN, RFCNConfig

    cfg = RFCNConfig(
        num_classes=3, canvas_size=(64, 64), anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=32, rfcn_depth=32, first_stage_pre_nms_top_k=24,
        first_stage_max_proposals=12, first_stage_minibatch_size=16,
        second_stage_batch_size=8, max_gt_boxes=4, dtype=jnp.float32,
    )
    model = RFCN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    params = variables["params"]
    # block4 params exist in the R-FCN tree (converted TF checkpoints'
    # SecondStageFeatureExtractor lands here)
    assert "classifier_backbone" in params, sorted(params)
    # and the predictor's reduce conv consumes block4's output width
    reduce_in = params["rfcn_predictor"]["reduce"]["kernel"].shape[2]
    assert reduce_in == 2048, reduce_in


def test_rfcn_rejects_mtl_refine():
    import pytest
    from mtlx.detector.faster_rcnn import MTLConfig
    from mtlx.detector.rfcn import RFCN, RFCNConfig

    cfg = RFCNConfig(
        num_classes=3, canvas_size=(64, 64),
        mtl=MTLConfig(multiobject=True, refine=True),
    )
    with pytest.raises(ValueError, match="refine"):
        RFCN(cfg)
