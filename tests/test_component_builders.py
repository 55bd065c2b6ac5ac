"""Per-proto component builders: config-string -> component contract tests
(the reference builders/*_test.py pattern, SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from google.protobuf import text_format

from mtlx.builders import component_builders as cb
from mtlx.config.protos import components_pb2, pipeline_pb2


def _parse(msg_cls, text):
    msg = msg_cls()
    text_format.Parse(text, msg)
    return msg


def test_build_grid_anchor_generator():
    proto = _parse(
        components_pb2.AnchorGenerator,
        "grid_anchor_generator { scales: [0.5, 1.0] aspect_ratios: [1.0] "
        "height: 128 width: 128 height_stride: 8 width_stride: 8 }",
    )
    gen = cb.build_anchor_generator(proto)
    anchors = gen.generate((2, 2))
    assert anchors.shape == (8, 4)
    heights = np.asarray(anchors[:, 2] - anchors[:, 0])
    np.testing.assert_allclose(sorted(set(np.round(heights, 3))), [64.0, 128.0])


def test_build_ssd_anchor_generator():
    proto = _parse(
        components_pb2.AnchorGenerator,
        "ssd_anchor_generator { num_layers: 2 min_scale: 0.3 max_scale: 0.6 "
        "aspect_ratios: [1.0, 2.0] }",
    )
    gen = cb.build_anchor_generator(proto)
    anchors = gen.generate([(2, 2), (1, 1)])
    assert anchors.shape[1] == 4


@pytest.mark.smoke
def test_build_box_coders():
    proto = _parse(
        components_pb2.BoxCoder,
        "faster_rcnn_box_coder { y_scale: 5.0 x_scale: 5.0 height_scale: 2.5 width_scale: 2.5 }",
    )
    coder = cb.build_box_coder(proto)
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    anchors = jnp.asarray([[0.0, 0.0, 8.0, 8.0]])
    dec = coder.decode(coder.encode(boxes, anchors), anchors)
    np.testing.assert_allclose(dec, boxes, atol=1e-3)
    for text in (
        "mean_stddev_box_coder { stddev: 0.1 }",
        "square_box_coder { scale_factor: 2.0 }",
        "keypoint_box_coder { num_keypoints: 2 }",
    ):
        assert cb.build_box_coder(_parse(components_pb2.BoxCoder, text)) is not None


def test_build_matchers():
    proto = _parse(
        components_pb2.Matcher,
        "argmax_matcher { matched_threshold: 0.6 unmatched_threshold: 0.4 "
        "force_match_for_each_row: true }",
    )
    m = cb.build_matcher(proto)
    sim = jnp.asarray([[0.7, 0.5, 0.1]])
    assert m(sim).tolist() == [0, -2, -1]
    bm = cb.build_matcher(_parse(components_pb2.Matcher, "bipartite_matcher {}"))
    assert bm(sim).tolist()[0] == 0


def test_build_similarity():
    for name in ("iou_similarity", "ioa_similarity", "neg_sq_dist_similarity"):
        fn = cb.build_region_similarity_calculator(
            _parse(components_pb2.RegionSimilarityCalculator, f"{name} {{}}")
        )
        out = fn(jnp.zeros((2, 4)), jnp.zeros((3, 4)))
        assert out.shape == (2, 3)


def test_build_post_processing():
    proto = _parse(
        components_pb2.PostProcessing,
        "batch_non_max_suppression { score_threshold: 0.1 iou_threshold: 0.5 "
        "max_detections_per_class: 7 max_total_detections: 9 } score_converter: SOFTMAX",
    )
    kwargs, conv = cb.build_post_processing(proto)
    assert kwargs["max_total_size"] == 9 and conv == "softmax"


def test_build_losses():
    proto = _parse(
        components_pb2.Loss,
        "classification_loss { weighted_softmax { logit_scale: 2.0 } } "
        "localization_loss { weighted_l2 {} } "
        "hard_example_miner { num_hard_examples: 10 loss_type: LOCALIZATION } "
        "classification_weight: 1.5 localization_weight: 0.5",
    )
    cls_fn, loc_fn, cw, lw, miner = cb.build_losses(proto)
    assert cw == 1.5 and lw == 0.5
    assert miner.num_hard_examples == 10 and miner.loss_type == "loc"
    out = loc_fn(jnp.ones((1, 4)), jnp.zeros((1, 4)), jnp.ones((1,)))
    np.testing.assert_allclose(out, [2.0])


def test_build_hyperparams():
    proto = _parse(
        components_pb2.Hyperparams,
        "op: FC regularizer { l2_regularizer { weight: 0.004 } } "
        "initializer { variance_scaling_initializer { factor: 1.0 uniform: true mode: FAN_AVG } } "
        "activation: RELU_6",
    )
    hp = cb.build_hyperparams(proto)
    assert hp["op"] == "fc" and hp["activation"] == "relu6"
    assert hp["regularizer_weight"] == pytest.approx(0.004)
    w = hp["initializer"](jax.random.PRNGKey(0), (4, 4), jnp.float32)
    assert np.isfinite(np.asarray(w)).all()


def test_build_input_reader(tmp_path):
    from mtlx.data import tfrecord

    path = tmp_path / "x.record"
    with tfrecord.TFRecordWriter(str(path)) as w:
        from mtlx.data.example_decoder import build_example
        import io
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, format="JPEG")
        w.write(
            build_example(
                buf.getvalue(), b"jpeg", 8, 8, "a.jpg",
                np.zeros((0, 4), np.float32), [], [],
            ).SerializeToString()
        )
    proto = _parse(
        pipeline_pb2.InputReader,
        f'tf_record_input_reader {{ input_path: "{path}" }}',
    )
    ds = cb.build_input_reader(
        proto, canvas_size=(32, 32), resizer=("fixed", {"height": 32, "width": 32})
    )
    assert len(ds) == 1
    assert ds.get(0)["image"].shape == (32, 32, 3)


def test_ssd_random_crop_transform():
    from mtlx.data import preprocessor

    s = {
        "image": jnp.ones((32, 32, 3)) * 100.0,
        "boxes": jnp.asarray([[4.0, 4.0, 20.0, 20.0]]),
        "classes": jnp.asarray([1]),
        "mask": jnp.asarray([True]),
        "true_shape": jnp.asarray([32, 32], jnp.int32),
    }
    out = preprocessor.ssd_random_crop(jax.random.PRNGKey(3), s)
    assert out["image"].shape == (32, 32, 3)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_miner_uses_configured_loss_weights():
    """build_losses threads the Loss proto's classification/localization
    weights into the miner (regression: the miner ranked by the
    HardExampleMiner class defaults 0.05/0.06 regardless of config)."""
    from google.protobuf import text_format

    from mtlx.builders.component_builders import build_losses
    from mtlx.config.protos import components_pb2

    proto = text_format.Parse(
        """
        classification_loss { weighted_sigmoid {} }
        localization_loss { weighted_smooth_l1 {} }
        classification_weight: 2.0
        localization_weight: 0.5
        hard_example_miner { num_hard_examples: 32 iou_threshold: 0.7 }
        """,
        components_pb2.Loss(),
    )
    _, _, cw, lw, miner = build_losses(proto)
    assert (cw, lw) == (2.0, 0.5)
    assert miner.cls_loss_weight == 2.0
    assert miner.loc_loss_weight == 0.5


def test_ignore_thresholds_matches_every_anchor():
    """argmax_matcher { ignore_thresholds: true } disables BOTH
    thresholds: every anchor matches its argmax groundtruth row, no
    negatives or ignores (reference ArgMaxMatcher(matched_threshold=None)
    semantics — not a collapsed ignore band)."""
    import jax.numpy as jnp
    from google.protobuf import text_format

    from mtlx.builders.component_builders import build_matcher
    from mtlx.config.protos import components_pb2

    proto = text_format.Parse(
        "argmax_matcher { ignore_thresholds: true }",
        components_pb2.Matcher(),
    )
    match_fn = build_matcher(proto)
    sim = jnp.asarray([[0.05, 0.3], [0.2, 0.01], [0.0, 0.0]])  # [rows, cols]
    match = np.asarray(match_fn(sim))
    # all columns matched, to the row with the highest (even tiny) IoU
    np.testing.assert_array_equal(match, [1, 0])


def test_optimizer_bias_multiplier_applies_to_all_optimizers():
    """train_config.bias_grad_multiplier scales bias grads under rms_prop
    and adam too (regression: only the momentum path applied it)."""
    import jax.numpy as jnp
    from google.protobuf import text_format

    from mtlx.builders import optimizer_builder
    from mtlx.config.protos import pipeline_pb2

    tc = pipeline_pb2.TrainConfig()
    tc.bias_grad_multiplier = 3.0
    params = {"d": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}}
    # adaptive optimizers normalize update magnitude by the gradient's
    # own scale, so probe in the epsilon-dominated regime (tiny grads,
    # large epsilon) where the update is linear in the pre-scaled grad
    for text, g in (
        ("rms_prop_optimizer { epsilon: 1.0 learning_rate { "
         "constant_learning_rate { learning_rate: 1.0 } } }", 1e-6),
        # adam's eps is 1e-8: grads far below it keep sqrt(v) << eps
        ("adam_optimizer { learning_rate { constant_learning_rate "
         "{ learning_rate: 1.0 } } }", 1e-12),
    ):
        grads = {"d": {"kernel": jnp.full((2, 2), g),
                       "bias": jnp.full((2,), g)}}
        proto = text_format.Parse(text, pipeline_pb2.Optimizer())
        tx, _, _ = optimizer_builder.build(proto, tc)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        ratio = float(jnp.abs(updates["d"]["bias"]).mean()) / float(
            jnp.abs(updates["d"]["kernel"]).mean()
        )
        assert 2.0 < ratio < 4.0, (text, ratio)


def test_ssd_builder_miner_absent_means_no_mining():
    """No hard_example_miner block = train on all negatives; an explicit
    max_negatives_per_positive: 0 = no cap (regression: `or 3` coerced
    both into 3:1 mining)."""
    from google.protobuf import text_format

    from mtlx.builders import ssd_builder
    from mtlx.config.protos import pipeline_pb2

    base = """
      num_classes: 2
      image_resizer { fixed_shape_resizer { height: 64 width: 64 } }
      feature_extractor { type: "ssd_mobilenet_v1" }
      anchor_generator { ssd_anchor_generator { num_layers: 2 } }
      box_predictor { convolutional_box_predictor {} }
      loss { classification_loss { weighted_sigmoid {} }
             localization_loss { weighted_smooth_l1 {} } %s }
    """
    no_miner = text_format.Parse(base % "", pipeline_pb2.Ssd())
    cfg = ssd_builder.build(no_miner, is_training=True).cfg
    assert cfg.negatives_per_positive == 0.0
    uncapped = text_format.Parse(
        base % ("hard_example_miner { max_negatives_per_positive: 0 "
                "min_negatives_per_image: 0 }"),
        pipeline_pb2.Ssd(),
    )
    cfg = ssd_builder.build(uncapped, is_training=True).cfg
    assert cfg.negatives_per_positive == 0.0
    capped = text_format.Parse(
        base % "hard_example_miner { max_negatives_per_positive: 5 }",
        pipeline_pb2.Ssd(),
    )
    cfg = ssd_builder.build(capped, is_training=True).cfg
    assert cfg.negatives_per_positive == 5.0
