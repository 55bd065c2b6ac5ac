"""TF SavedModel export (reference exporter.py SavedModel contract):
jax2tf-converted, frozen-weight artifact loadable by plain TF with both
reference input-type signatures, numerically identical to the mtlx
InferenceModel."""

import io
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

CONFIG = """
model {
  faster_rcnn {
    num_classes: 3
    image_resizer { fixed_shape_resizer { height: 64 width: 64 } }
    feature_extractor { type: 'faster_rcnn_resnet50' }
    first_stage_anchor_generator {
      grid_anchor_generator {
        scales: [0.5, 1.0] aspect_ratios: [1.0] height: 32 width: 32
      }
    }
    first_stage_box_predictor_depth: 16
    first_stage_max_proposals: 8
    first_stage_minibatch_size: 16
    second_stage_batch_size: 4
    second_stage_post_processing {
      batch_non_max_suppression {
        score_threshold: 0.0 iou_threshold: 0.6
        max_detections_per_class: 5 max_total_detections: 10
      }
      score_converter: SOFTMAX
    }
  }
}
train_config {
  batch_size: 1
  optimizer {
    momentum_optimizer {
      learning_rate { constant_learning_rate { learning_rate: 0.001 } }
    }
  }
}
eval_config { num_examples: 1 }
"""


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    import jax

    from mtlx.builders import model_builder
    from mtlx.config import config_util
    from mtlx.export.exporter import export_saved_model
    from mtlx.train.checkpoints import CheckpointManager
    from mtlx.train.train_step import create_train_state, make_optimizer

    tmp = tmp_path_factory.mktemp("saved_model")
    cfg_path = str(tmp / "pipeline.config")
    open(cfg_path, "w").write(CONFIG)

    configs = config_util.get_configs_from_pipeline_file(cfg_path)
    model = model_builder.build(configs["model"], is_training=False)
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer())
    train_dir = str(tmp / "train")
    mgr = CheckpointManager(train_dir)
    mgr.save(1, state)
    mgr.wait()

    out_dir = export_saved_model(cfg_path, train_dir, str(tmp / "sm"))
    return {"tmp": tmp, "config": cfg_path, "train_dir": train_dir,
            "saved_model": out_dir}


def test_saved_model_loads_and_serves_image_tensor(exported):
    loaded = tf.saved_model.load(exported["saved_model"])
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    shapes = np.asarray([[64, 64], [60, 52]], np.int32)
    out = loaded.signatures["serving_default"](
        image_tensor=tf.constant(images), true_shape=tf.constant(shapes)
    )
    assert out["detection_boxes"].shape == (2, 10, 4)
    assert out["detection_scores"].shape == (2, 10)
    boxes = out["detection_boxes"].numpy()
    n = out["num_detections"].numpy().astype(int)
    assert np.isfinite(boxes).all()
    assert (out["detection_classes"].numpy()[0, : n[0]] >= 1).all()

    # numerically identical to the mtlx-native export path
    from mtlx.export.exporter import InferenceModel, export_inference_graph

    native_dir = str(exported["tmp"] / "native")
    export_inference_graph(
        exported["config"], exported["train_dir"], native_dir
    )
    native = InferenceModel.load(native_dir)
    ref = native.predict_image_tensor(images)
    # the native path assumes full-canvas true shapes; compare row 0 only
    np.testing.assert_allclose(
        boxes[0], ref["detection_boxes"][0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        out["detection_scores"].numpy()[0], ref["detection_scores"][0],
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_array_equal(
        out["detection_classes"].numpy()[0].astype(np.int64),
        ref["detection_classes"][0],
    )


def test_saved_model_encoded_image_signature(exported):
    from PIL import Image

    loaded = tf.saved_model.load(exported["saved_model"])
    rs = np.random.RandomState(1)
    blobs = []
    for h, w in ((64, 64), (48, 60)):
        buf = io.BytesIO()
        Image.fromarray(
            rs.randint(0, 255, (h, w, 3)).astype(np.uint8)
        ).save(buf, format="JPEG")
        blobs.append(buf.getvalue())
    out = loaded.signatures["encoded_image_string"](
        encoded_image=tf.constant(blobs)
    )
    assert out["detection_boxes"].shape == (2, 10, 4)
    assert np.isfinite(out["detection_boxes"].numpy()).all()
    # normalized output boxes stay in [0, 1] for every valid detection
    n = out["num_detections"].numpy().astype(int)
    for i in range(2):
        b = out["detection_boxes"].numpy()[i, : n[i]]
        assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()


def test_saved_model_tf_example_signature(exported):
    from PIL import Image

    loaded = tf.saved_model.load(exported["saved_model"])
    rs = np.random.RandomState(2)
    buf = io.BytesIO()
    Image.fromarray(rs.randint(0, 255, (64, 64, 3)).astype(np.uint8)).save(
        buf, format="JPEG"
    )
    ex = tf.train.Example(features=tf.train.Features(feature={
        "image/encoded": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[buf.getvalue()])
        ),
    }))
    out = loaded.signatures["tf_example"](
        tf_example=tf.constant([ex.SerializeToString()])
    )
    assert out["detection_boxes"].shape == (1, 10, 4)
    assert np.isfinite(out["detection_boxes"].numpy()).all()


def test_saved_model_dir_is_self_contained(exported):
    names = os.listdir(exported["saved_model"])
    assert "saved_model.pb" in names
    assert "frozen_inference_graph.pb" in names
    assert "pipeline.config" in names  # provenance travels with the model


def test_frozen_inference_graph_runs_in_v1_session(exported):
    """frozen_inference_graph.pb (reference exporter.py frozen-graph
    artifact): import_graph_def + Session.run by the canonical tensor
    names must reproduce the SavedModel signature outputs."""
    gd = tf.compat.v1.GraphDef()
    with open(
        os.path.join(exported["saved_model"], "frozen_inference_graph.pb"),
        "rb",
    ) as f:
        gd.ParseFromString(f.read())
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    shapes = np.asarray([[64, 64], [60, 52]], np.int32)

    g = tf.Graph()
    with g.as_default():
        tf.graph_util.import_graph_def(gd, name="")
        with tf.compat.v1.Session(graph=g) as sess:
            boxes, scores, classes, n = sess.run(
                ["detection_boxes:0", "detection_scores:0",
                 "detection_classes:0", "num_detections:0"],
                feed_dict={"image_tensor:0": images,
                           "true_shape:0": shapes},
            )
    assert boxes.shape == (2, 10, 4) and np.isfinite(boxes).all()

    loaded = tf.saved_model.load(exported["saved_model"])
    ref = loaded.signatures["serving_default"](
        image_tensor=tf.constant(images), true_shape=tf.constant(shapes)
    )
    np.testing.assert_allclose(boxes, ref["detection_boxes"].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(scores, ref["detection_scores"].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(classes, ref["detection_classes"].numpy())
    np.testing.assert_array_equal(n, ref["num_detections"].numpy())


def test_saved_model_keep_aspect_encoded_path(tmp_path):
    """keep_aspect_ratio_resizer config: the in-graph TF decode+resize
    must reproduce the loader's keep-aspect target math (scale to min
    side, cap the max side) before padding to canvas."""
    import jax

    from mtlx.builders import model_builder
    from mtlx.config import config_util
    from mtlx.export.exporter import export_saved_model
    from mtlx.train.checkpoints import CheckpointManager
    from mtlx.train.train_step import create_train_state, make_optimizer
    from PIL import Image

    cfg_text = CONFIG.replace(
        "image_resizer { fixed_shape_resizer { height: 64 width: 64 } }",
        "image_resizer { keep_aspect_ratio_resizer "
        "{ min_dimension: 48 max_dimension: 64 } }",
    )
    cfg_path = str(tmp_path / "ka.config")
    open(cfg_path, "w").write(cfg_text)
    configs = config_util.get_configs_from_pipeline_file(cfg_path)
    model = model_builder.build(configs["model"], is_training=False)
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer())
    train_dir = str(tmp_path / "train")
    mgr = CheckpointManager(train_dir)
    mgr.save(1, state)
    mgr.wait()
    out_dir = export_saved_model(cfg_path, train_dir, str(tmp_path / "sm"))

    loaded = tf.saved_model.load(out_dir)
    rs = np.random.RandomState(0)
    buf = io.BytesIO()
    # 40x90 source: scale = min(48/40, 64/90) = 64/90 -> 28x64 resized
    Image.fromarray(rs.randint(0, 255, (40, 90, 3)).astype(np.uint8)).save(
        buf, format="JPEG"
    )
    out = loaded.signatures["encoded_image_string"](
        encoded_image=tf.constant([buf.getvalue()])
    )
    n = int(out["num_detections"].numpy()[0])
    boxes = out["detection_boxes"].numpy()[0, :n]
    assert np.isfinite(out["detection_boxes"].numpy()).all()
    # normalized to the 28x64 true image: all within [0, 1]
    if n:
        assert (boxes >= -1e-5).all() and (boxes <= 1 + 1e-5).all()
