"""Data layer + config API round-trips: TFRecord container, Example
encode/decode, VOC XML, pipeline config parse -> builders (the reference's
config-string -> builder contract-test pattern, SURVEY.md §5)."""

import os

import numpy as np
import pytest
from google.protobuf import text_format

from mtlx.config import config_util
from mtlx.config.protos import pipeline_pb2
from mtlx.data import tfrecord, voc
from mtlx.data.example_decoder import build_example, decode_example
from mtlx.utils import label_map_util

MINI_CONFIG = """
model {
  faster_rcnn {
    num_classes: 3
    image_resizer { keep_aspect_ratio_resizer { min_dimension: 600 max_dimension: 1024 } }
    feature_extractor { type: 'faster_rcnn_resnet50' first_stage_features_stride: 16 }
    first_stage_anchor_generator {
      grid_anchor_generator {
        scales: [0.25, 0.5, 1.0, 2.0] aspect_ratios: [0.5, 1.0, 2.0]
        height_stride: 16 width_stride: 16
      }
    }
    first_stage_localization_loss_weight: 2.0
    initial_crop_size: 14
    maxpool_kernel_size: 2
    maxpool_stride: 2
    second_stage_post_processing {
      batch_non_max_suppression {
        score_threshold: 0.01 iou_threshold: 0.6
        max_detections_per_class: 100 max_total_detections: 300
      }
      score_converter: SOFTMAX
    }
    second_stage_localization_loss_weight: 2.0
    mtl { window: true closeness: true edgemask: true window_loss_weight: 0.25 window_sampling: true }
  }
}
train_config {
  batch_size: 2
  optimizer {
    momentum_optimizer {
      learning_rate {
        manual_step_learning_rate {
          initial_learning_rate: 0.001
          schedule { step: 100 learning_rate: 0.0001 }
        }
      }
      momentum_optimizer_value: 0.9
    }
    use_moving_average: false
  }
  gradient_clipping_by_norm: 10.0
  data_augmentation_options { random_horizontal_flip {} }
  data_augmentation_options { random_adjust_brightness { max_delta: 0.1 } }
  num_steps: 10
}
train_input_reader {
  tf_record_input_reader { input_path: "train.record" }
  label_map_path: "label_map.pbtxt"
}
eval_config { num_examples: 5 }
eval_input_reader {
  tf_record_input_reader { input_path: "val.record" }
  shuffle: false
}
"""


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "t.record")
    payloads = [b"hello", b"", b"x" * 10000]
    with tfrecord.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert list(tfrecord.read_records(path, verify_crc=True)) == payloads
    offs = tfrecord.record_index(path)
    assert len(offs) == 3
    with open(path, "rb") as f:
        assert tfrecord.read_record_at(f, offs[2]) == payloads[2]


def test_crc32c_known_vector():
    # standard check value for "123456789"
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_example_roundtrip(tmp_path):
    import io
    from PIL import Image

    img = Image.fromarray(np.full((20, 30, 3), 77, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    boxes = np.asarray([[0.1, 0.2, 0.5, 0.6]], np.float32)
    ex = build_example(
        buf.getvalue(), b"jpeg", 20, 30, "img0.jpg", boxes, [3], ["cat"],
        difficult=[1],
    )
    out = decode_example(ex.SerializeToString())
    np.testing.assert_allclose(out["groundtruth_boxes"], boxes, rtol=1e-6)
    assert out["groundtruth_classes"].tolist() == [3]
    assert out["groundtruth_difficult"].tolist() == [1]
    assert out["image"].shape == (20, 30, 3)
    assert out["source_id"] == "img0.jpg"


def test_voc_xml_parsing(tmp_path):
    xml = """<annotation>
      <filename>000001.jpg</filename>
      <size><width>353</width><height>500</height><depth>3</depth></size>
      <object><name>dog</name><pose>Left</pose><truncated>1</truncated>
        <difficult>0</difficult>
        <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox>
      </object>
      <object><name>person</name><difficult>1</difficult>
        <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>498</ymax></bndbox>
      </object>
    </annotation>"""
    p = tmp_path / "a.xml"
    p.write_text(xml)
    data = voc.parse_annotation(str(p))
    assert data["filename"] == "000001.jpg"
    assert len(data["object"]) == 2
    label_map = {name: i + 1 for i, name in enumerate(voc.VOC_CLASSES)}
    ex = annotation = voc.annotation_to_example(data, b"fakejpeg", label_map)
    dec = decode_example(ex.SerializeToString(), decode_image=False)
    assert dec["groundtruth_classes"].tolist() == [
        label_map["dog"], label_map["person"],
    ]
    np.testing.assert_allclose(
        dec["groundtruth_boxes"][0], [240 / 500, 48 / 353, 371 / 500, 195 / 353],
        rtol=1e-5,
    )


def test_label_map(tmp_path):
    p = tmp_path / "lm.pbtxt"
    voc.write_voc_label_map(str(p))
    d = label_map_util.get_label_map_dict(str(p))
    assert d["aeroplane"] == 1 and d["tvmonitor"] == 20
    idx = label_map_util.create_category_index_from_labelmap(str(p))
    assert idx[15]["name"] == "person"


def test_pipeline_config_to_model(tmp_path):
    path = tmp_path / "pipeline.config"
    path.write_text(MINI_CONFIG)
    configs = config_util.get_configs_from_pipeline_file(str(path))
    assert configs["train_config"].batch_size == 2

    from mtlx.builders import model_builder

    model = model_builder.build(configs["model"], is_training=True)
    cfg = model.cfg
    assert cfg.num_classes == 3
    assert cfg.backbone == "resnet50"
    assert cfg.canvas_size == (1024, 1024)
    assert cfg.first_stage_localization_loss_weight == 2.0
    assert cfg.second_stage_nms_score_threshold == pytest.approx(0.01)
    assert cfg.mtl.multiobject and cfg.mtl.closeness and cfg.mtl.foreground
    assert cfg.mtl.multiobject_weight == pytest.approx(0.25)
    assert cfg.mtl.window_sampling
    # eval build drops MTL heads
    eval_model = model_builder.build(configs["model"], is_training=False)
    assert not eval_model.cfg.mtl.any


def test_optimizer_builder():
    from mtlx.builders import optimizer_builder

    configs = _parse(MINI_CONFIG)
    tx, lr, _ = optimizer_builder.build(
        configs["train_config"].optimizer, configs["train_config"]
    )
    assert callable(lr)
    assert lr(0) == pytest.approx(0.001)
    assert lr(101) == pytest.approx(0.0001, rel=1e-4)
    # transformation is usable
    import jax.numpy as jnp

    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_preprocessor_builder():
    from mtlx.builders import preprocessor_builder

    configs = _parse(MINI_CONFIG)
    steps = preprocessor_builder.build(
        configs["train_config"].data_augmentation_options
    )
    assert steps[0] == ("random_horizontal_flip", {})
    assert steps[1][0] == "random_adjust_brightness"
    assert steps[1][1]["max_delta"] == pytest.approx(0.1)


def test_preprocessor_builder_threads_crop_pad_knobs():
    """Per-branch SSD crop operations, pad knobs, and resize_image reach
    the transform kwargs (previously parsed-but-dropped config surface)."""
    from mtlx.builders import preprocessor_builder
    from mtlx.config.protos import preprocessor_pb2

    step = preprocessor_pb2.PreprocessingStep()
    text_format.Parse(
        """ssd_random_crop {
             operations { min_object_covered: 0.25 min_aspect_ratio: 0.6
                          max_aspect_ratio: 1.4 min_area: 0.2 max_area: 0.8
                          overlap_thresh: 0.25 random_coef: 0.15 }
             operations { min_object_covered: 0.75 min_aspect_ratio: 1.0
                          max_aspect_ratio: 1.0 min_area: 0.5 max_area: 1.0
                          overlap_thresh: 0.75 random_coef: 0.0 }
           }""", step)
    name, kwargs = preprocessor_builder.build_step(step)
    assert name == "ssd_random_crop" and len(kwargs["operations"]) == 2
    assert kwargs["operations"][0]["min_object_covered"] == pytest.approx(0.25)
    assert kwargs["operations"][1]["overlap_thresh"] == pytest.approx(0.75)

    step = preprocessor_pb2.PreprocessingStep()
    text_format.Parse(
        """ssd_random_crop_pad {
             operations { min_object_covered: 0.5 min_aspect_ratio: 0.5
                          max_aspect_ratio: 2.0 min_area: 0.3 max_area: 1.0
                          overlap_thresh: 0.5 random_coef: 0.1
                          min_padded_size_ratio: 1.0 min_padded_size_ratio: 1.0
                          max_padded_size_ratio: 2.0 max_padded_size_ratio: 2.0
                          pad_color_r: 0.3 pad_color_g: 0.6 pad_color_b: 0.9 }
           }""", step)
    _, kwargs = preprocessor_builder.build_step(step)
    op = kwargs["operations"][0]
    assert op["max_padded_size_ratio"] == (2.0, 2.0)
    assert op["pad_color"] == pytest.approx((0.3, 0.6, 0.9))

    step = preprocessor_pb2.PreprocessingStep()
    text_format.Parse(
        """random_pad_image { min_image_height: 20 min_image_width: 10
                              max_image_height: 40 max_image_width: 30
                              pad_color: 1.0 pad_color: 2.0 pad_color: 3.0 }""",
        step)
    _, kwargs = preprocessor_builder.build_step(step)
    assert kwargs["min_image_height"] == 20
    assert kwargs["pad_color"] == (1.0, 2.0, 3.0)

    step = preprocessor_pb2.PreprocessingStep()
    text_format.Parse(
        """random_crop_pad_image { min_padded_size_ratio: 1.5
                                   min_padded_size_ratio: 1.5 }""", step)
    _, kwargs = preprocessor_builder.build_step(step)
    assert kwargs["min_padded_size_ratio"] == (1.5, 1.5)

    step = preprocessor_pb2.PreprocessingStep()
    text_format.Parse(
        "resize_image { new_height: 64 new_width: 48 method: NEAREST_NEIGHBOR }",
        step)
    name, kwargs = preprocessor_builder.build_step(step)
    assert name == "resize_image"
    assert kwargs == {"new_height": 64, "new_width": 48, "method": 4}


def test_config_save_roundtrip(tmp_path):
    configs = _parse(MINI_CONFIG)
    pipeline = config_util.create_pipeline_proto_from_configs(configs)
    out = config_util.save_pipeline_config(pipeline, str(tmp_path))
    configs2 = config_util.get_configs_from_pipeline_file(out)
    assert configs2["model"] == configs["model"]


def test_merge_external_params():
    configs = _parse(MINI_CONFIG)
    config_util.merge_external_params_with_configs(
        configs, learning_rate=0.5, batch_size=7
    )
    assert configs["train_config"].batch_size == 7
    lr = configs["train_config"].optimizer.momentum_optimizer.learning_rate
    assert lr.manual_step_learning_rate.initial_learning_rate == pytest.approx(0.5)


def _parse(s):
    pipeline = pipeline_pb2.TrainEvalPipelineConfig()
    text_format.Parse(s, pipeline)
    return {
        "model": pipeline.model,
        "train_config": pipeline.train_config,
        "train_input_config": pipeline.train_input_reader,
        "eval_config": pipeline.eval_config,
        "eval_input_config": pipeline.eval_input_reader,
    }
