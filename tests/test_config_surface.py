"""Config-surface contract tests: every parsed knob must change behavior
(round-1 gap: hyperparams/score_converter/kernel_size/EMA were parsed but
silently ignored). Reference: the text-proto pipeline config is the public
API (SURVEY.md §3.10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from google.protobuf import text_format

from mtlx.builders import model_builder, optimizer_builder
from mtlx.config.protos import pipeline_pb2
from mtlx.train.train_step import make_regularization_fn

FRCNN_TEMPLATE = """
faster_rcnn {
  num_classes: 3
  image_resizer { fixed_shape_resizer { height: 64 width: 64 } }
  feature_extractor { type: 'faster_rcnn_resnet50' first_stage_features_stride: 16 }
  first_stage_anchor_generator {
    grid_anchor_generator {
      scales: [0.5, 1.0] aspect_ratios: [1.0]
      height: 32 width: 32 height_stride: 16 width_stride: 16
    }
  }
  %(extra)s
  second_stage_box_predictor {
    mask_rcnn_box_predictor {
      %(predictor)s
    }
  }
  second_stage_post_processing {
    batch_non_max_suppression {
      score_threshold: 0.01 iou_threshold: 0.6
      max_detections_per_class: 10 max_total_detections: 20
    }
    score_converter: %(converter)s
  }
}
"""


def _model_proto(extra="", predictor="", converter="SOFTMAX"):
    proto = pipeline_pb2.DetectionModel()
    text_format.Parse(
        FRCNN_TEMPLATE % {"extra": extra, "predictor": predictor,
                          "converter": converter},
        proto,
    )
    return proto


# ---------------- score converter ----------------


def test_score_converter_threads_to_config():
    for name, expected in (("SOFTMAX", "softmax"), ("SIGMOID", "sigmoid"),
                           ("IDENTITY", "identity")):
        model = model_builder.build(_model_proto(converter=name), is_training=False)
        assert model.cfg.score_converter == expected


def test_score_converter_changes_scores():
    logits = jnp.asarray([[2.0, -1.0, 0.5, 1.0]])
    model_soft = model_builder.build(_model_proto(converter="SOFTMAX"), False)
    model_sig = model_builder.build(_model_proto(converter="SIGMOID"), False)
    model_id = model_builder.build(_model_proto(converter="IDENTITY"), False)
    soft = np.asarray(model_soft._convert_scores(logits))
    sig = np.asarray(model_sig._convert_scores(logits))
    ident = np.asarray(model_id._convert_scores(logits))
    np.testing.assert_allclose(soft, jax.nn.softmax(logits, -1), rtol=1e-6)
    np.testing.assert_allclose(sig, jax.nn.sigmoid(logits), rtol=1e-6)
    np.testing.assert_array_equal(ident, np.asarray(logits))


# ---------------- weight decay ----------------


def test_regularization_scopes_from_config():
    extra = """
    first_stage_box_predictor_conv_hyperparams {
      regularizer { l2_regularizer { weight: 0.0002 } }
    }
    """
    predictor = """
      fc_hyperparams { regularizer { l1_regularizer { weight: 0.001 } } }
    """
    scopes = model_builder.regularization_scopes(
        _model_proto(extra=extra, predictor=predictor)
    )
    assert ("rpn", "l2_regularizer", pytest.approx(0.0002)) in [
        (s, k, w) for s, k, w in scopes
    ]
    assert ("box_predictor", "l1_regularizer", pytest.approx(0.001)) in [
        (s, k, w) for s, k, w in scopes
    ]
    # zero/absent regularizers produce no scopes
    assert model_builder.regularization_scopes(_model_proto()) == []


def test_regularization_fn_values():
    params = {
        "rpn": {"conv": {"kernel": jnp.full((2, 3), 2.0), "bias": jnp.ones(3)}},
        "box_predictor": {"fc": {"kernel": jnp.full((4,), -1.0)}},
        "backbone": {"conv": {"kernel": jnp.full((5,), 10.0)}},
    }
    fn = make_regularization_fn(
        [("rpn", "l2_regularizer", 0.1), ("box_predictor", "l1_regularizer", 0.5)]
    )
    # l2: 0.1 * 0.5 * (6 * 2^2) = 1.2 (kernel only, bias excluded)
    # l1: 0.5 * 4 = 2.0; backbone not in any scope
    assert float(fn(params)) == pytest.approx(1.2 + 2.0)
    assert make_regularization_fn([]) is None
    assert make_regularization_fn([("rpn", "l2_regularizer", 0.0)]) is None


def test_regularization_loss_in_train_metrics():
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=(64, 64), anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=16, first_stage_pre_nms_top_k=16, first_stage_max_proposals=8,
        first_stage_minibatch_size=16, second_stage_batch_size=8,
        max_gt_boxes=4, dtype=jnp.float32,
    )
    model = FasterRCNN(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer())
    reg_fn = make_regularization_fn([("rpn", "l2_regularizer", 1e-3)])
    step = jax.jit(make_train_step(model, regularization_fn=reg_fn))
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "true_shape": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0],
                                  [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        "gt_classes": jnp.zeros((1, 4), jnp.int32),
        "gt_mask": jnp.asarray([[True, False, False, False]]),
    }
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    reg = float(metrics["Loss/regularization_loss"])
    assert reg > 0
    # the reg term is inside total_loss
    parts = sum(float(v) for k, v in metrics.items() if k.startswith("Loss/"))
    assert float(metrics["total_loss"]) == pytest.approx(parts, rel=1e-5)


# ---------------- EMA (use_moving_average) ----------------


def test_optimizer_builder_returns_ema_decay():
    opt = pipeline_pb2.Optimizer()
    text_format.Parse(
        "momentum_optimizer { learning_rate { constant_learning_rate "
        "{ learning_rate: 0.01 } } } use_moving_average: true "
        "moving_average_decay: 0.99",
        opt,
    )
    _, _, decay = optimizer_builder.build(opt)
    assert decay == pytest.approx(0.99)
    opt.use_moving_average = False
    _, _, decay = optimizer_builder.build(opt)
    assert decay is None


def test_freeze_variables_zeroes_matching_updates():
    """train_config.freeze_variables regexes pin matching params
    (reference variables_helper.freeze_gradients_matching_regex)."""
    opt = pipeline_pb2.Optimizer()
    text_format.Parse(
        "momentum_optimizer { learning_rate { constant_learning_rate "
        "{ learning_rate: 0.1 } } momentum_optimizer_value: 0.0 }",
        opt,
    )
    tc = pipeline_pb2.TrainConfig()
    tc.freeze_variables.append("backbone/conv1")
    tx, _, _ = optimizer_builder.build(opt, tc)
    params = {
        "backbone": {"conv1": {"kernel": jnp.ones(3)},
                     "conv2": {"kernel": jnp.ones(3)}},
        "rpn": {"bias": jnp.ones(2)},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["backbone"]["conv1"]["kernel"]) == 0.0)
    assert np.all(np.asarray(updates["backbone"]["conv2"]["kernel"]) != 0.0)
    assert np.all(np.asarray(updates["rpn"]["bias"]) != 0.0)

    # no patterns -> no masking wrapper, everything moves
    tx2, _, _ = optimizer_builder.build(opt, pipeline_pb2.TrainConfig())
    u2, _ = tx2.update(grads, tx2.init(params), params)
    assert np.all(np.asarray(u2["backbone"]["conv1"]["kernel"]) != 0.0)

    # adam path honors the same patterns
    opt2 = pipeline_pb2.Optimizer()
    text_format.Parse(
        "adam_optimizer { learning_rate { constant_learning_rate "
        "{ learning_rate: 0.1 } } }", opt2)
    tx3, _, _ = optimizer_builder.build(opt2, tc)
    u3, _ = tx3.update(grads, tx3.init(params), params)
    assert np.all(np.asarray(u3["backbone"]["conv1"]["kernel"]) == 0.0)
    assert np.all(np.asarray(u3["rpn"]["bias"]) != 0.0)


def test_ema_updates_in_train_step():
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=(64, 64), anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=16, first_stage_pre_nms_top_k=16, first_stage_max_proposals=8,
        first_stage_minibatch_size=16, second_stage_batch_size=8,
        max_gt_boxes=4, dtype=jnp.float32,
    )
    model = FasterRCNN(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), make_optimizer(learning_rate=0.05),
        keep_ema=True,
    )
    old_params = jax.device_get(state.params)
    step = jax.jit(make_train_step(model, ema_decay=0.5))
    batch = {
        "image": jnp.full((1, 64, 64, 3), 128.0),
        "true_shape": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0],
                                  [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        "gt_classes": jnp.zeros((1, 4), jnp.int32),
        "gt_mask": jnp.asarray([[True, False, False, False]]),
    }
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    # ema = 0.5*old + 0.5*new, elementwise, on a leaf that moved
    leaf_old = old_params["rpn"]["conv"]["kernel"]
    leaf_new = np.asarray(new_state.params["rpn"]["conv"]["kernel"])
    leaf_ema = np.asarray(new_state.ema_params["rpn"]["conv"]["kernel"])
    np.testing.assert_allclose(leaf_ema, 0.5 * leaf_old + 0.5 * leaf_new,
                               rtol=1e-5, atol=1e-7)
    assert not np.allclose(leaf_ema, leaf_new)


# ---------------- RPN kernel size + initializer ----------------


def test_rpn_kernel_size_and_initializer_reach_head():
    extra = """
    first_stage_box_predictor_kernel_size: 5
    first_stage_box_predictor_depth: 16
    first_stage_box_predictor_conv_hyperparams {
      initializer { truncated_normal_initializer { stddev: 0.01 } }
    }
    """
    model = model_builder.build(_model_proto(extra=extra), is_training=True)
    assert model.cfg.rpn_kernel_size == 5
    variables = model.init_variables(jax.random.PRNGKey(0))
    kernel = np.asarray(variables["params"]["rpn"]["conv"]["kernel"])
    assert kernel.shape[:2] == (5, 5)
    # truncated_normal(0.01) -> tiny std; flax default lecun_normal would be
    # ~sqrt(1/fan_in) >> 0.02
    assert 0.001 < kernel.std() < 0.02


def test_first_stage_atrous_rate_reaches_rpn():
    """first_stage_atrous_rate dilates the RPN trunk conv: same param
    shapes, different receptive field -> different outputs."""
    from mtlx.heads.box_predictors import RPNHead

    model = model_builder.build(
        _model_proto(extra="first_stage_atrous_rate: 2"), is_training=True
    )
    assert model.cfg.rpn_atrous_rate == 2
    assert model_builder.build(
        _model_proto(), is_training=True
    ).cfg.rpn_atrous_rate == 1

    feats = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    h1 = RPNHead(num_anchors_per_location=2, depth=8, atrous_rate=1,
                 dtype=jnp.float32)
    h2 = RPNHead(num_anchors_per_location=2, depth=8, atrous_rate=2,
                 dtype=jnp.float32)
    v1 = h1.init(jax.random.PRNGKey(1), feats)
    obj1, _ = h1.apply(v1, feats)
    obj2, _ = h2.apply(v1, feats)  # same params: dilation changes output
    assert jax.tree.map(lambda a: a.shape, v1) == \
        jax.tree.map(lambda a: a.shape, h2.init(jax.random.PRNGKey(1), feats))
    assert not np.allclose(np.asarray(obj1), np.asarray(obj2))


def test_fc_initializer_reaches_box_predictor():
    predictor = """
      fc_hyperparams {
        initializer { truncated_normal_initializer { stddev: 0.001 } }
      }
    """
    model = model_builder.build(_model_proto(predictor=predictor), True)
    variables = model.init_variables(jax.random.PRNGKey(0))
    kernel = np.asarray(
        variables["params"]["box_predictor"]["class_logits"]["kernel"]
    )
    assert kernel.std() < 0.002


def test_compatibility_notes_for_queue_era_knobs():
    """TF1 queue/PS knobs are reported as ignored, not silently dropped."""
    from mtlx.config import config_util

    pipeline = pipeline_pb2.TrainEvalPipelineConfig()
    text_format.Parse(
        """train_config { batch_queue_capacity: 150 sync_replicas: true }
           train_input_reader { num_readers: 4 }
           eval_config { eval_master: 'grpc://x' }""",
        pipeline,
    )
    configs = {
        "train_config": pipeline.train_config,
        "train_input_config": pipeline.train_input_reader,
        "eval_config": pipeline.eval_config,
    }
    notes = "\n".join(config_util.compatibility_notes(configs))
    assert "batch_queue_capacity=150" in notes
    assert "num_readers=4" in notes
    assert "always synchronous" in notes
    assert "eval_master" in notes
    # nothing explicitly set -> no notes
    assert config_util.compatibility_notes(
        {"train_config": pipeline_pb2.TrainConfig()}
    ) == []


def test_predict_keypoints_raises_like_reference():
    with pytest.raises(ValueError, match="predict_keypoints"):
        model_builder.build(
            _model_proto(predictor="predict_keypoints: true"),
            is_training=True,
        )


# ---------------- feature_extractor.batch_norm sub-knobs ----------------


def _bn_model(fe_extra=""):
    proto = pipeline_pb2.DetectionModel()
    text_format.Parse(
        FRCNN_TEMPLATE % {
            "extra": "", "predictor": "", "converter": "SOFTMAX",
        },
        proto,
    )
    if fe_extra:
        text_format.Merge(fe_extra, proto.faster_rcnn.feature_extractor)
    return model_builder.build(proto, is_training=False, max_gt_boxes=4,
                               dtype=jnp.float32)


def test_backbone_batch_norm_epsilon_changes_outputs():
    """feature_extractor.batch_norm.epsilon reaches every backbone BN
    (previously a fixed 1e-5 silent divergence — ROADMAP 5b)."""
    m_default = _bn_model()
    m_eps = _bn_model("batch_norm { epsilon: 0.5 scale: true }")
    assert m_default.cfg.batch_norm_params is None
    assert m_eps.cfg.batch_norm_params[1] == pytest.approx(0.5)

    x = jnp.full((1, 64, 64, 3), 50.0)
    ts = np.asarray([[64, 64]], np.int32)
    v1 = m_default.init_variables(jax.random.PRNGKey(0))
    v2 = m_eps.init_variables(jax.random.PRNGKey(0))
    f1 = m_default.predict(v1, m_default.preprocess(x), ts, training=False)
    f2 = m_eps.predict(v2, m_eps.preprocess(x), ts, training=False)
    assert not np.allclose(
        np.asarray(f1["rpn_objectness_logits"]),
        np.asarray(f2["rpn_objectness_logits"]),
    )


def test_backbone_batch_norm_scale_center_gate_params():
    """batch_norm.{scale,center} control gamma/beta presence (slim
    BatchNorm proto defaults: scale false, center true)."""
    m = _bn_model("batch_norm { }")  # slim defaults -> scale-less BN
    v = m.init_variables(jax.random.PRNGKey(0))
    bn1 = v["params"]["backbone"]["bn1"]
    assert sorted(bn1.keys()) == ["bias"]

    m2 = _bn_model("batch_norm { scale: true center: false }")
    v2 = m2.init_variables(jax.random.PRNGKey(0))
    bn1 = v2["params"]["backbone"]["bn1"]
    assert sorted(bn1.keys()) == ["scale"]

    # default (no batch_norm block): full affine, unchanged param tree
    v3 = _bn_model().init_variables(jax.random.PRNGKey(0))
    assert sorted(v3["params"]["backbone"]["bn1"].keys()) == ["bias", "scale"]


def test_backbone_batch_norm_decay_reaches_trainable_bn():
    """batch_norm.decay drives the moving-stat momentum when BN is
    trainable: decay 0 keeps no history (stats jump to the batch stats),
    decay 0.999 keeps almost all of it."""
    from mtlx.detector.faster_rcnn import FasterRCNNModules

    def run(decay):
        m = _bn_model(
            "batch_norm_trainable: true batch_norm "
            "{ decay: %s epsilon: 0.001 scale: true }" % decay
        )
        assert m.cfg.batch_norm_params[0] == pytest.approx(decay)
        v = m.init_variables(jax.random.PRNGKey(0))
        x = m.preprocess(
            jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 7 + 3
        )
        _, mutated = m.modules.apply(
            v, x, True, method=FasterRCNNModules.features,
            mutable=["batch_stats"],
        )
        return np.asarray(mutated["batch_stats"]["backbone"]["bn1"]["mean"])

    fast, slow = run(0.0), run(0.999)
    # decay 0 => moving mean == batch mean (far from the zero init);
    # decay 0.999 => barely moved
    assert np.abs(fast).max() > 0.1
    assert np.abs(slow).max() < np.abs(fast).max() * 0.01


# ---------------- ssd conv_hyperparams.batch_norm.train ----------------


SSD_BN_TEMPLATE = """
ssd {
  num_classes: 2
  image_resizer { fixed_shape_resizer { height: 64 width: 64 } }
  feature_extractor {
    type: '%s'
    depth_multiplier: 0.25
    min_depth: 8
    conv_hyperparams {
      op: CONV
      regularizer { l2_regularizer { weight: 0.0 } }
      initializer { truncated_normal_initializer { stddev: 0.03 } }
      %s
    }
  }
  anchor_generator {
    ssd_anchor_generator { num_layers: 4 min_scale: 0.2 max_scale: 0.9
                           aspect_ratios: 1.0 }
  }
  box_predictor { convolutional_box_predictor { kernel_size: 3 } }
  loss {
    classification_loss { weighted_sigmoid { } }
    localization_loss { weighted_smooth_l1 { } }
  }
  post_processing {
    batch_non_max_suppression { score_threshold: 0.0 iou_threshold: 0.6
      max_detections_per_class: 5 max_total_detections: 5 }
    score_converter: SIGMOID
  }
}
"""


def _ssd_bn_model(bn_block, is_training=True, extractor="ssd_mobilenet_v1"):
    proto = pipeline_pb2.DetectionModel()
    text_format.Parse(SSD_BN_TEMPLATE % (extractor, bn_block), proto)
    return model_builder.build(proto, is_training=is_training,
                               max_gt_boxes=4, dtype=jnp.float32)


def test_ssd_batch_norm_train_wires_live_bn():
    """conv_hyperparams.batch_norm.train: the reference trains
    base-network BN during training (slim batch_norm is_training =
    train and is_training); frozen otherwise. Trained-from-scratch SSD
    cannot learn without this (synthetic gate: mAP 0.04 frozen vs 1.0
    live)."""
    m = _ssd_bn_model("batch_norm { train: true decay: 0.9 }")
    assert m.cfg.batch_norm_trainable
    assert m.cfg.bn_momentum == pytest.approx(0.9)
    # eval build: never trainable
    m_eval = _ssd_bn_model("batch_norm { train: true }", is_training=False)
    assert not m_eval.cfg.batch_norm_trainable
    # no batch_norm block (or train absent/false): frozen
    assert not _ssd_bn_model("").cfg.batch_norm_trainable
    assert not _ssd_bn_model("batch_norm { }").cfg.batch_norm_trainable


@pytest.mark.parametrize("extractor", ["ssd_mobilenet_v1", "ssd_inception_v2"])
def test_ssd_live_bn_updates_stats_frozen_does_not(extractor):
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    batch = {
        "image": jnp.full((2, 64, 64, 3), 99.0),
        "true_shape": jnp.asarray([[64, 64]] * 2),
        "gt_boxes": jnp.asarray(
            [[[4, 4, 40, 40]] + [[0, 0, 0, 0]] * 3] * 2, jnp.float32
        ),
        "gt_classes": jnp.asarray([[1, 0, 0, 0]] * 2, jnp.int32),
        "gt_mask": jnp.asarray([[True, False, False, False]] * 2),
    }

    def stats_after_step(bn_block):
        m = _ssd_bn_model(bn_block, extractor=extractor)
        state = create_train_state(m, jax.random.PRNGKey(0), make_optimizer())
        before = np.asarray(jax.tree.leaves(state.batch_stats)[0])
        state, _ = jax.jit(make_train_step(m))(
            state, batch, jax.random.PRNGKey(1)
        )
        after = np.asarray(jax.tree.leaves(state.batch_stats)[0])
        return before, after

    b, a = stats_after_step("batch_norm { train: true decay: 0.5 }")
    assert np.any(b != a), "live BN must update moving stats"
    b, a = stats_after_step("")
    assert np.all(b == a), "frozen BN must not update stats"


def test_frcnn_miner_gets_second_stage_loss_weights():
    """Reference model_builder passes second_stage_{classification,
    localization}_loss_weight into losses_builder.build_hard_example_miner
    so mining ranks ROIs by the same weighted loss training minimizes
    (regression: the FRCNN path hardcoded 1.0/1.0)."""
    extra = """
  second_stage_classification_loss_weight: 3.0
  second_stage_localization_loss_weight: 0.25
  hard_example_miner { num_hard_examples: 12 iou_threshold: 0.8 }
"""
    model = model_builder.build(_model_proto(extra=extra), is_training=True)
    miner = model.cfg.hard_example_miner
    assert miner is not None
    assert miner.num_hard_examples == 12
    assert miner.cls_loss_weight == 3.0
    assert miner.loc_loss_weight == 0.25
