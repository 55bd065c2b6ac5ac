"""Checkpoint-conversion parity harness (SURVEY.md §8 hard-part 3): write
a synthetic slim-style TF checkpoint with the real TensorFlow, convert it
with tools/convert_checkpoint.py, and assert layer-wise numeric equality
into the mtlx model, full backbone coverage, and a working forward."""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_checkpoint  # noqa: E402

BLOCK_SIZES = (3, 4, 6, 3)
DEPTHS = (256, 512, 1024, 2048)


_RESNET_BLOCK_SIZES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                       152: (3, 8, 36, 3)}


def _slim_resnet50_vars(rng, num_classes=3, num_anchors=2, rpn_depth=16,
                        with_heads=False, depth=50):
    """Variable name -> value for a slim resnet_v1_{depth} (classification)
    or a TF-OD-API Faster R-CNN (detection) checkpoint."""
    out = {}
    prefix = f"resnet_v1_{depth}"
    block_sizes = _RESNET_BLOCK_SIZES[depth]

    def bn(prefix, c):
        out[f"{prefix}/BatchNorm/gamma"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/beta"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_variance"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)

    out[f"{prefix}/conv1/weights"] = rng.normal(0, 0.01, (7, 7, 3, 64)).astype(np.float32)
    bn(f"{prefix}/conv1", 64)
    in_depth = 64
    for b, (n, d) in enumerate(zip(block_sizes, DEPTHS), start=1):
        for u in range(1, n + 1):
            base = f"{prefix}/block{b}/unit_{u}/bottleneck_v1"
            db = d // 4
            unit_in = in_depth if u == 1 else d
            out[f"{base}/conv1/weights"] = rng.normal(0, 0.01, (1, 1, unit_in, db)).astype(np.float32)
            bn(f"{base}/conv1", db)
            out[f"{base}/conv2/weights"] = rng.normal(0, 0.01, (3, 3, db, db)).astype(np.float32)
            bn(f"{base}/conv2", db)
            out[f"{base}/conv3/weights"] = rng.normal(0, 0.01, (1, 1, db, d)).astype(np.float32)
            bn(f"{base}/conv3", d)
            if u == 1:  # slim: conv shortcut only where the depth changes
                out[f"{base}/shortcut/weights"] = rng.normal(0, 0.01, (1, 1, unit_in, d)).astype(np.float32)
                bn(f"{base}/shortcut", d)
        in_depth = d
    if with_heads:
        a, k = num_anchors, num_classes
        out["Conv/weights"] = rng.normal(0, 0.01, (3, 3, 1024, rpn_depth)).astype(np.float32)
        out["Conv/biases"] = np.zeros((rpn_depth,), np.float32)
        out["FirstStageBoxPredictor/ClassPredictor/weights"] = rng.normal(
            0, 0.01, (1, 1, rpn_depth, 2 * a)).astype(np.float32)
        out["FirstStageBoxPredictor/ClassPredictor/biases"] = np.zeros((2 * a,), np.float32)
        out["FirstStageBoxPredictor/BoxEncodingPredictor/weights"] = rng.normal(
            0, 0.01, (1, 1, rpn_depth, 4 * a)).astype(np.float32)
        out["FirstStageBoxPredictor/BoxEncodingPredictor/biases"] = np.zeros((4 * a,), np.float32)
        out["SecondStageBoxPredictor/ClassPredictor/weights"] = rng.normal(
            0, 0.01, (2048, k + 1)).astype(np.float32)
        out["SecondStageBoxPredictor/ClassPredictor/biases"] = np.zeros((k + 1,), np.float32)
        out["SecondStageBoxPredictor/BoxEncodingPredictor/weights"] = rng.normal(
            0, 0.01, (2048, 4 * k)).astype(np.float32)
        out["SecondStageBoxPredictor/BoxEncodingPredictor/biases"] = np.zeros((4 * k,), np.float32)
    return out


def _write_tf_checkpoint(var_values, path):
    with tf.Graph().as_default():
        tvars = {}
        for name, val in var_values.items():
            tvars[name] = tf.compat.v1.get_variable(
                name, initializer=tf.constant(val)
            )
        saver = tf.compat.v1.train.Saver(var_list=tvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, path, write_meta_graph=False)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _tiny_model(slim=True):
    import jax.numpy as jnp

    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig

    return FasterRCNN(FasterRCNNConfig(
        num_classes=3, canvas_size=(64, 64), backbone="resnet50",
        anchor_scales=(0.5, 1.0), anchor_aspect_ratios=(1.0,),
        anchor_base_size=(32.0, 32.0), rpn_depth=16,
        first_stage_pre_nms_top_k=16, first_stage_max_proposals=8,
        max_gt_boxes=4, dtype=jnp.float32, slim_stride_order=slim,
    ))


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    rng = np.random.RandomState(0)
    values = _slim_resnet50_vars(rng, with_heads=True)
    ckpt = str(tmp_path_factory.mktemp("tfckpt") / "model.ckpt")
    _write_tf_checkpoint(values, ckpt)
    variables, n_conv, n_skip = convert_checkpoint.convert(ckpt, "detection", 50)
    return values, variables, n_conv, n_skip


def test_every_tf_tensor_lands_exactly(converted):
    values, variables, n_conv, n_skip = converted
    assert n_skip == 0  # every synthetic tensor is mappable
    assert n_conv == len(values)
    flat = {**_flatten(variables["params"]), **_flatten(variables["batch_stats"])}
    # spot-check exact numeric equality on representative leaves
    np.testing.assert_array_equal(
        flat[("backbone", "block2", "unit4", "conv2", "kernel")],
        values["resnet_v1_50/block2/unit_4/bottleneck_v1/conv2/weights"],
    )
    np.testing.assert_array_equal(
        flat[("classifier_backbone", "block4", "unit1", "conv_shortcut", "kernel")],
        values["resnet_v1_50/block4/unit_1/bottleneck_v1/shortcut/weights"],
    )
    np.testing.assert_array_equal(
        flat[("backbone", "bn1", "mean")],
        values["resnet_v1_50/conv1/BatchNorm/moving_mean"],
    )
    np.testing.assert_array_equal(
        flat[("rpn", "objectness", "kernel")],
        values["FirstStageBoxPredictor/ClassPredictor/weights"],
    )
    np.testing.assert_array_equal(
        flat[("box_predictor", "class_logits", "kernel")],
        values["SecondStageBoxPredictor/ClassPredictor/weights"],
    )


def test_converted_covers_model_and_forward_runs(converted, tmp_path):
    import jax
    import jax.numpy as jnp

    from mtlx.train import checkpoints as ckpt_lib

    _, variables, _, _ = converted
    model = _tiny_model(slim=True)
    init_vars = model.init_variables(jax.random.PRNGKey(0))

    # layer-wise: every model backbone/head leaf is present in the
    # conversion with the same shape (full coverage, nothing orphaned)
    flat_model = {
        ("params",) + k: v for k, v in _flatten(init_vars["params"]).items()
    }
    flat_model.update({
        ("batch_stats",) + k: v
        for k, v in _flatten(dict(init_vars.get("batch_stats", {}))).items()
    }.items())
    flat_conv = {
        ("params",) + k: v for k, v in _flatten(variables["params"]).items()
    }
    flat_conv.update({
        ("batch_stats",) + k: v
        for k, v in _flatten(variables["batch_stats"]).items()
    }.items())
    missing = [
        k for k in flat_model
        if k not in flat_conv or flat_conv[k].shape != np.shape(flat_model[k])
    ]
    assert missing == [], f"unconverted model leaves: {missing[:10]}"

    # round-trip through the warm-start path
    path = str(tmp_path / "mtlx_ckpt")
    ckpt_lib.save_variables(path, variables)
    new_vars, restored, skipped = ckpt_lib.restore_warm_start(
        {"params": init_vars["params"],
         "batch_stats": init_vars.get("batch_stats", {})},
        path, from_detection_checkpoint=True,
    )
    assert restored == len(flat_model)

    # forward runs and differs from random init (weights actually loaded)
    images = model.preprocess(jnp.full((1, 64, 64, 3), 64.0))
    shapes = jnp.asarray([[64, 64]], jnp.int32)
    out_conv = model.predict(new_vars, images, shapes, training=False)
    out_init = model.predict(init_vars, images, shapes, training=False)
    feats_c = np.asarray(out_conv["rpn_features"])
    feats_i = np.asarray(out_init["rpn_features"])
    assert np.isfinite(feats_c).all()
    assert not np.allclose(feats_c, feats_i)


def test_slim_stride_order_reaches_model_from_config():
    from google.protobuf import text_format

    from mtlx.builders import model_builder
    from mtlx.config.protos import pipeline_pb2

    proto = pipeline_pb2.DetectionModel()
    text_format.Parse(
        """
        faster_rcnn {
          num_classes: 3
          image_resizer { fixed_shape_resizer { height: 64 width: 64 } }
          feature_extractor {
            type: 'faster_rcnn_resnet50'
            slim_stride_order: true
          }
          first_stage_anchor_generator {
            grid_anchor_generator {
              scales: [0.5, 1.0] aspect_ratios: [1.0]
              height: 32 width: 32 height_stride: 16 width_stride: 16
            }
          }
          second_stage_post_processing {
            batch_non_max_suppression {
              score_threshold: 0.0 iou_threshold: 0.6
              max_detections_per_class: 10 max_total_detections: 10
            }
            score_converter: SOFTMAX
          }
        }
        """,
        proto,
    )
    model = model_builder.build(proto, is_training=False)
    assert model.cfg.slim_stride_order is True


def test_slim_and_default_stride_orders_share_feature_shape():
    import jax
    import jax.numpy as jnp

    for slim in (True, False):
        model = _tiny_model(slim=slim)
        variables = model.init_variables(jax.random.PRNGKey(0))
        feats = model.modules.apply(
            variables, jnp.zeros((1, 64, 64, 3)),
            method=type(model.modules).features,
        )
        assert feats.shape == (1, 4, 4, 1024), (slim, feats.shape)


# ---------------- slim MobilenetV1 -> SSD backbone ----------------

_MOBILENET_DEFS = [  # (stride, out) matching mtlx/backbones/mobilenet.py
    (1, 64), (2, 128), (1, 128), (2, 256), (1, 256),
    (2, 512), (1, 512), (1, 512), (1, 512), (1, 512), (1, 512),
    (2, 1024), (1, 1024),
]


def _slim_mobilenet_vars(rng, depth_multiplier=1.0):
    out = {}

    def bn(prefix, c):
        out[f"{prefix}/BatchNorm/gamma"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/beta"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_variance"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)

    c_in = int(32 * depth_multiplier)
    out["MobilenetV1/Conv2d_0/weights"] = rng.normal(
        0, 0.01, (3, 3, 3, c_in)).astype(np.float32)
    bn("MobilenetV1/Conv2d_0", c_in)
    for i, (_, c) in enumerate(_MOBILENET_DEFS, start=1):
        c = int(c * depth_multiplier)
        out[f"MobilenetV1/Conv2d_{i}_depthwise/depthwise_weights"] = rng.normal(
            0, 0.01, (3, 3, c_in, 1)).astype(np.float32)
        bn(f"MobilenetV1/Conv2d_{i}_depthwise", c_in)
        out[f"MobilenetV1/Conv2d_{i}_pointwise/weights"] = rng.normal(
            0, 0.01, (1, 1, c_in, c)).astype(np.float32)
        bn(f"MobilenetV1/Conv2d_{i}_pointwise", c)
        c_in = c
    # classifier head: must be skipped by the mapper
    out["MobilenetV1/Logits/Conv2d_1c_1x1/weights"] = rng.normal(
        0, 0.01, (1, 1, 1024, 10)).astype(np.float32)
    out["MobilenetV1/Logits/Conv2d_1c_1x1/biases"] = np.zeros((10,), np.float32)
    return out


def test_mobilenet_conversion_covers_ssd_backbone(tmp_path):
    import jax
    import jax.numpy as jnp

    from mtlx.backbones.mobilenet import MobileNetV1

    rng = np.random.RandomState(0)
    values = _slim_mobilenet_vars(rng)
    ckpt = str(tmp_path / "mnet.ckpt")
    _write_tf_checkpoint(values, ckpt)
    variables, n_conv, n_skip = convert_checkpoint.convert(
        ckpt, "classification", 0, arch="mobilenet_v1"
    )
    assert n_skip == 2  # only the Logits head is unmapped
    assert n_conv == len(values) - 2

    # depthwise transpose: [3,3,C,1] slim -> [3,3,1,C] flax
    dw = variables["params"]["backbone"]["conv1_dw"]["kernel"]
    assert dw.shape == (3, 3, 1, 32)
    np.testing.assert_array_equal(
        dw[..., 0, :],
        values["MobilenetV1/Conv2d_1_depthwise/depthwise_weights"][..., 0],
    )

    # full coverage of the model tree, and the forward runs
    model = MobileNetV1(dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    flat_model = _flatten(init["params"])
    flat_conv = _flatten(variables["params"]["backbone"])
    missing = [k for k in flat_model if k not in flat_conv
               or flat_conv[k].shape != flat_model[k].shape]
    assert missing == [], missing[:5]
    feats = model.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.ones((1, 64, 64, 3)),
    )
    assert np.isfinite(np.asarray(feats[0])).all()
    assert np.isfinite(np.asarray(feats[1])).all()


# slim inception_v2 block channel spec: (Mixed name, in, b0, b1, b2, pool)
# — b0/pool None marks the stride-2 reduction blocks (Mixed_4a/5a)
_IV2_BLOCKS = [
    ("3b", 192, 64, (64, 64), (64, 96), 32),
    ("3c", 256, 64, (64, 96), (64, 96), 64),
    ("4a", 320, None, (128, 160), (64, 96), None),
    ("4b", 576, 224, (64, 96), (96, 128), 128),
    ("4c", 576, 192, (96, 128), (96, 128), 128),
    ("4d", 576, 160, (128, 160), (128, 160), 96),
    ("4e", 576, 96, (128, 192), (160, 192), 96),
    ("5a", 576, None, (128, 192), (192, 256), None),
    ("5b", 1024, 352, (192, 320), (160, 224), 128),
    ("5c", 1024, 352, (192, 320), (192, 224), 128),
]


def _slim_inception_v2_vars(rng):
    out = {}

    def conv_bn(prefix, shape):
        c = shape[-1]
        out[f"{prefix}/weights"] = rng.normal(0, 0.01, shape).astype(np.float32)
        out[f"{prefix}/BatchNorm/gamma"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/beta"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_variance"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)

    # separable stem: depthwise [7,7,3,8] + pointwise [1,1,24,64], one BN
    out["InceptionV2/Conv2d_1a_7x7/depthwise_weights"] = rng.normal(
        0, 0.01, (7, 7, 3, 8)).astype(np.float32)
    out["InceptionV2/Conv2d_1a_7x7/pointwise_weights"] = rng.normal(
        0, 0.01, (1, 1, 24, 64)).astype(np.float32)
    for leaf, lo, hi in (("gamma", 0.5, 1.5), ("beta", -0.1, 0.1),
                         ("moving_mean", -0.1, 0.1), ("moving_variance", 0.5, 1.5)):
        out[f"InceptionV2/Conv2d_1a_7x7/BatchNorm/{leaf}"] = rng.uniform(
            lo, hi, (64,)).astype(np.float32)
    conv_bn("InceptionV2/Conv2d_2b_1x1", (1, 1, 64, 64))
    conv_bn("InceptionV2/Conv2d_2c_3x3", (3, 3, 64, 192))
    for blk, cin, b0, b1, b2, pool in _IV2_BLOCKS:
        base = f"InceptionV2/Mixed_{blk}"
        if b0 is None:  # reduction block scopes
            conv_bn(f"{base}/Branch_0/Conv2d_0a_1x1", (1, 1, cin, b1[0]))
            conv_bn(f"{base}/Branch_0/Conv2d_1a_3x3", (3, 3, b1[0], b1[1]))
            conv_bn(f"{base}/Branch_1/Conv2d_0a_1x1", (1, 1, cin, b2[0]))
            conv_bn(f"{base}/Branch_1/Conv2d_0b_3x3", (3, 3, b2[0], b2[1]))
            conv_bn(f"{base}/Branch_1/Conv2d_1a_3x3", (3, 3, b2[1], b2[1]))
        else:
            conv_bn(f"{base}/Branch_0/Conv2d_0a_1x1", (1, 1, cin, b0))
            conv_bn(f"{base}/Branch_1/Conv2d_0a_1x1", (1, 1, cin, b1[0]))
            conv_bn(f"{base}/Branch_1/Conv2d_0b_3x3", (3, 3, b1[0], b1[1]))
            conv_bn(f"{base}/Branch_2/Conv2d_0a_1x1", (1, 1, cin, b2[0]))
            conv_bn(f"{base}/Branch_2/Conv2d_0b_3x3", (3, 3, b2[0], b2[1]))
            conv_bn(f"{base}/Branch_2/Conv2d_0c_3x3", (3, 3, b2[1], b2[1]))
            conv_bn(f"{base}/Branch_3/Conv2d_0b_1x1", (1, 1, cin, pool))
    # classifier head: must be skipped by the mapper
    out["InceptionV2/Logits/Conv2d_1c_1x1/weights"] = rng.normal(
        0, 0.01, (1, 1, 1024, 10)).astype(np.float32)
    out["InceptionV2/Logits/Conv2d_1c_1x1/biases"] = np.zeros((10,), np.float32)
    return out


def test_inception_v2_conversion_covers_ssd_backbone(tmp_path):
    import jax
    import jax.numpy as jnp

    from mtlx.backbones.inception_v2 import InceptionV2

    rng = np.random.RandomState(0)
    values = _slim_inception_v2_vars(rng)
    ckpt = str(tmp_path / "iv2.ckpt")
    _write_tf_checkpoint(values, ckpt)
    variables, n_conv, n_skip = convert_checkpoint.convert(
        ckpt, "classification", 0, arch="inception_v2"
    )
    assert n_skip == 2  # only the Logits head is unmapped
    assert n_conv == len(values) - 2

    # separable-stem depthwise reshape: [7,7,3,8] slim (channel-major
    # depthwise output) -> [7,7,1,24] flax grouped-conv kernel
    dw = variables["params"]["backbone"]["conv1"]["depthwise"]["kernel"]
    assert dw.shape == (7, 7, 1, 24)
    src = values["InceptionV2/Conv2d_1a_7x7/depthwise_weights"]
    np.testing.assert_array_equal(
        dw[..., 0, :], src.reshape(7, 7, 24)
    )

    model = InceptionV2(dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    flat_model = _flatten(init["params"])
    flat_conv = _flatten(variables["params"]["backbone"])
    missing = [k for k in flat_model if k not in flat_conv
               or flat_conv[k].shape != flat_model[k].shape]
    assert missing == [], missing[:5]
    extra = [k for k in flat_conv if k not in flat_model]
    assert extra == [], extra[:5]
    feats = model.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.ones((1, 64, 64, 3)),
    )
    assert np.isfinite(np.asarray(feats[0])).all()
    assert np.isfinite(np.asarray(feats[1])).all()


def test_inception_v2_frcnn_target_layout(tmp_path):
    import jax
    import jax.numpy as jnp

    from mtlx.backbones.inception_v2 import (
        InceptionV2BoxClassifierFeatures,
        InceptionV2ProposalFeatures,
    )

    rng = np.random.RandomState(1)
    values = _slim_inception_v2_vars(rng)
    ckpt = str(tmp_path / "iv2f.ckpt")
    _write_tf_checkpoint(values, ckpt)
    variables, _, _ = convert_checkpoint.convert(
        ckpt, "classification", 0, arch="inception_v2", target="frcnn"
    )

    # full net under backbone/body, Mixed_5a..5c copied to the
    # second-stage branch (its own params, like the reference's
    # SecondStageFeatureExtractor)
    prop = InceptionV2ProposalFeatures(dtype=jnp.float32)
    pinit = prop.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    flat_model = _flatten(pinit["params"])
    flat_conv = _flatten(variables["params"]["backbone"])
    missing = [k for k in flat_model if k not in flat_conv
               or flat_conv[k].shape != flat_model[k].shape]
    assert missing == [], missing[:5]

    cls = InceptionV2BoxClassifierFeatures(dtype=jnp.float32)
    cinit = cls.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 576)))
    flat_cmodel = _flatten(cinit["params"])
    flat_cconv = _flatten(variables["params"]["classifier_backbone"])
    missing = [k for k in flat_cmodel if k not in flat_cconv
               or flat_cconv[k].shape != flat_cmodel[k].shape]
    assert missing == [], missing[:5]
    roi = cls.apply(
        {"params": variables["params"]["classifier_backbone"],
         "batch_stats": variables["batch_stats"]["classifier_backbone"]},
        jnp.ones((2, 4, 4, 576)),
    )
    assert roi.shape[-1] == 1024
    assert np.isfinite(np.asarray(roi)).all()


def _slim_inception_resnet_v2_vars(rng):
    out = {}

    def conv_bn(prefix, shape):
        c = shape[-1]
        out[f"{prefix}/weights"] = rng.normal(0, 0.01, shape).astype(np.float32)
        out[f"{prefix}/BatchNorm/gamma"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/beta"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        out[f"{prefix}/BatchNorm/moving_variance"] = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)

    P = "InceptionResnetV2"
    conv_bn(f"{P}/Conv2d_1a_3x3", (3, 3, 3, 32))
    conv_bn(f"{P}/Conv2d_2a_3x3", (3, 3, 32, 32))
    conv_bn(f"{P}/Conv2d_2b_3x3", (3, 3, 32, 64))
    conv_bn(f"{P}/Conv2d_3b_1x1", (1, 1, 64, 80))
    conv_bn(f"{P}/Conv2d_4a_3x3", (3, 3, 80, 192))
    conv_bn(f"{P}/Mixed_5b/Branch_0/Conv2d_1x1", (1, 1, 192, 96))
    conv_bn(f"{P}/Mixed_5b/Branch_1/Conv2d_0a_1x1", (1, 1, 192, 48))
    conv_bn(f"{P}/Mixed_5b/Branch_1/Conv2d_0b_5x5", (5, 5, 48, 64))
    conv_bn(f"{P}/Mixed_5b/Branch_2/Conv2d_0a_1x1", (1, 1, 192, 64))
    conv_bn(f"{P}/Mixed_5b/Branch_2/Conv2d_0b_3x3", (3, 3, 64, 96))
    conv_bn(f"{P}/Mixed_5b/Branch_2/Conv2d_0c_3x3", (3, 3, 96, 96))
    conv_bn(f"{P}/Mixed_5b/Branch_3/Conv2d_0b_1x1", (1, 1, 192, 64))
    for i in range(1, 11):  # block35 x10 (in 320)
        b = f"{P}/Repeat/block35_{i}"
        conv_bn(f"{b}/Branch_0/Conv2d_1x1", (1, 1, 320, 32))
        conv_bn(f"{b}/Branch_1/Conv2d_0a_1x1", (1, 1, 320, 32))
        conv_bn(f"{b}/Branch_1/Conv2d_0b_3x3", (3, 3, 32, 32))
        conv_bn(f"{b}/Branch_2/Conv2d_0a_1x1", (1, 1, 320, 32))
        conv_bn(f"{b}/Branch_2/Conv2d_0b_3x3", (3, 3, 32, 48))
        conv_bn(f"{b}/Branch_2/Conv2d_0c_3x3", (3, 3, 48, 64))
        out[f"{b}/Conv2d_1x1/weights"] = rng.normal(0, 0.01, (1, 1, 128, 320)).astype(np.float32)
        out[f"{b}/Conv2d_1x1/biases"] = np.zeros((320,), np.float32)
    conv_bn(f"{P}/Mixed_6a/Branch_0/Conv2d_1a_3x3", (3, 3, 320, 384))
    conv_bn(f"{P}/Mixed_6a/Branch_1/Conv2d_0a_1x1", (1, 1, 320, 256))
    conv_bn(f"{P}/Mixed_6a/Branch_1/Conv2d_0b_3x3", (3, 3, 256, 256))
    conv_bn(f"{P}/Mixed_6a/Branch_1/Conv2d_1a_3x3", (3, 3, 256, 384))
    for i in range(1, 21):  # block17 x20 (in 1088)
        b = f"{P}/Repeat_1/block17_{i}"
        conv_bn(f"{b}/Branch_0/Conv2d_1x1", (1, 1, 1088, 192))
        conv_bn(f"{b}/Branch_1/Conv2d_0a_1x1", (1, 1, 1088, 128))
        conv_bn(f"{b}/Branch_1/Conv2d_0b_1x7", (1, 7, 128, 160))
        conv_bn(f"{b}/Branch_1/Conv2d_0c_7x1", (7, 1, 160, 192))
        out[f"{b}/Conv2d_1x1/weights"] = rng.normal(0, 0.01, (1, 1, 384, 1088)).astype(np.float32)
        out[f"{b}/Conv2d_1x1/biases"] = np.zeros((1088,), np.float32)
    conv_bn(f"{P}/Mixed_7a/Branch_0/Conv2d_0a_1x1", (1, 1, 1088, 256))
    conv_bn(f"{P}/Mixed_7a/Branch_0/Conv2d_1a_3x3", (3, 3, 256, 384))
    conv_bn(f"{P}/Mixed_7a/Branch_1/Conv2d_0a_1x1", (1, 1, 1088, 256))
    conv_bn(f"{P}/Mixed_7a/Branch_1/Conv2d_1a_3x3", (3, 3, 256, 288))
    conv_bn(f"{P}/Mixed_7a/Branch_2/Conv2d_0a_1x1", (1, 1, 1088, 256))
    conv_bn(f"{P}/Mixed_7a/Branch_2/Conv2d_0b_3x3", (3, 3, 256, 288))
    conv_bn(f"{P}/Mixed_7a/Branch_2/Conv2d_1a_3x3", (3, 3, 288, 320))
    def block8(scope):
        conv_bn(f"{scope}/Branch_0/Conv2d_1x1", (1, 1, 2080, 192))
        conv_bn(f"{scope}/Branch_1/Conv2d_0a_1x1", (1, 1, 2080, 192))
        conv_bn(f"{scope}/Branch_1/Conv2d_0b_1x3", (1, 3, 192, 224))
        conv_bn(f"{scope}/Branch_1/Conv2d_0c_3x1", (3, 1, 224, 256))
        out[f"{scope}/Conv2d_1x1/weights"] = rng.normal(0, 0.01, (1, 1, 448, 2080)).astype(np.float32)
        out[f"{scope}/Conv2d_1x1/biases"] = np.zeros((2080,), np.float32)
    for i in range(1, 10):  # block8 x9 + the standalone relu-less Block8
        block8(f"{P}/Repeat_2/block8_{i}")
    block8(f"{P}/Block8")
    conv_bn(f"{P}/Conv2d_7b_1x1", (1, 1, 2080, 1536))
    # classifier heads: must be skipped
    out[f"{P}/Logits/Logits/weights"] = rng.normal(0, 0.01, (1536, 10)).astype(np.float32)
    out[f"{P}/Logits/Logits/biases"] = np.zeros((10,), np.float32)
    return out


def test_inception_resnet_v2_conversion_covers_frcnn_split(tmp_path):
    import jax
    import jax.numpy as jnp

    from mtlx.backbones.inception_resnet_v2 import (
        InceptionResnetV2BoxClassifierFeatures,
        InceptionResnetV2ProposalFeatures,
    )

    rng = np.random.RandomState(2)
    values = _slim_inception_resnet_v2_vars(rng)
    ckpt = str(tmp_path / "irv2.ckpt")
    _write_tf_checkpoint(values, ckpt)
    variables, n_conv, n_skip = convert_checkpoint.convert(
        ckpt, "classification", 0, arch="inception_resnet_v2"
    )
    assert n_skip == 2  # only the Logits head is unmapped
    assert n_conv == len(values) - 2

    prop = InceptionResnetV2ProposalFeatures(dtype=jnp.float32)
    pinit = prop.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    flat_model = _flatten(pinit["params"])
    flat_conv = _flatten(variables["params"]["backbone"])
    missing = [k for k in flat_model if k not in flat_conv
               or flat_conv[k].shape != flat_model[k].shape]
    assert missing == [], missing[:5]
    extra = [k for k in flat_conv if k not in flat_model]
    assert extra == [], extra[:5]

    cls = InceptionResnetV2BoxClassifierFeatures(dtype=jnp.float32)
    cinit = cls.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 1088)))
    flat_cmodel = _flatten(cinit["params"])
    flat_cconv = _flatten(variables["params"]["classifier_backbone"])
    missing = [k for k in flat_cmodel if k not in flat_cconv
               or flat_cconv[k].shape != flat_cmodel[k].shape]
    assert missing == [], missing[:5]
    extra = [k for k in flat_cconv if k not in flat_cmodel]
    assert extra == [], extra[:5]

    roi = cls.apply(
        {"params": variables["params"]["classifier_backbone"],
         "batch_stats": variables["batch_stats"]["classifier_backbone"]},
        jnp.ones((1, 4, 4, 1088)),
    )
    assert roi.shape[-1] == 1536
    assert np.isfinite(np.asarray(roi)).all()
