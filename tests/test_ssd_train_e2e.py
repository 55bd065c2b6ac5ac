"""SSD end-to-end through the config API: dataset -> train CLI ->
checkpoint -> eval CLI -> export/inference. Proves the SSD meta-arch
satisfies the same DetectionModel driver contract as Faster R-CNN
(reference trains any meta-arch through the same trainer, SURVEY.md §4.1).
"""

import io
import json
import os

import numpy as np
import pytest

CONFIG = """
model {{
  ssd {{
    num_classes: 3
    image_resizer {{ fixed_shape_resizer {{ height: 64 width: 64 }} }}
    feature_extractor {{
      type: 'ssd_mobilenet_v1'
      depth_multiplier: 0.25
      min_depth: 8
      conv_hyperparams {{
        op: CONV
        regularizer {{ l2_regularizer {{ weight: 0.00004 }} }}
        initializer {{ truncated_normal_initializer {{ stddev: 0.03 }} }}
      }}
    }}
    matcher {{
      argmax_matcher {{ matched_threshold: 0.5 unmatched_threshold: 0.5
                        force_match_for_each_row: true }}
    }}
    anchor_generator {{
      ssd_anchor_generator {{
        num_layers: 4 min_scale: 0.2 max_scale: 0.9
        aspect_ratios: 1.0 aspect_ratios: 2.0 aspect_ratios: 0.5
      }}
    }}
    box_predictor {{
      convolutional_box_predictor {{
        min_depth: 16 max_depth: 16 num_layers_before_predictor: 1
        use_dropout: false kernel_size: 3
      }}
    }}
    loss {{
      classification_loss {{ weighted_sigmoid {{ }} }}
      localization_loss {{ weighted_smooth_l1 {{ }} }}
      hard_example_miner {{ max_negatives_per_positive: 3
                            min_negatives_per_image: 3 }}
    }}
    post_processing {{
      batch_non_max_suppression {{
        score_threshold: 0.0 iou_threshold: 0.6
        max_detections_per_class: 5 max_total_detections: 10
      }}
      score_converter: SIGMOID
    }}
    normalize_loss_by_num_matches: true
  }}
}}
train_config {{
  batch_size: 2
  optimizer {{
    momentum_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.001 }} }}
      momentum_optimizer_value: 0.9
    }}
  }}
  data_augmentation_options {{ random_horizontal_flip {{}} }}
  num_steps: 3
  save_checkpoints_steps: 3
  max_number_of_boxes: 8
}}
train_input_reader {{
  tf_record_input_reader {{ input_path: "{record}" }}
  label_map_path: "{label_map}"
}}
eval_config {{ num_examples: 4 }}
eval_input_reader {{
  tf_record_input_reader {{ input_path: "{record}" }}
  label_map_path: "{label_map}"
  shuffle: false
}}
"""


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example

    tmp = tmp_path_factory.mktemp("ssd_e2e")
    record = str(tmp / "train.record")
    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(4):
            arr = rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            arr[8:32, 8:40] = [250, 30, 30]
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            boxes = np.asarray([[8 / 64, 8 / 64, 32 / 64, 40 / 64]], np.float32)
            ex = build_example(
                buf.getvalue(), b"jpeg", 64, 64, f"im{i}.jpg", boxes, [1], ["a"]
            )
            w.write(ex.SerializeToString())
    label_map = str(tmp / "label_map.pbtxt")
    with open(label_map, "w") as f:
        for i, name in enumerate(["a", "b", "c"]):
            f.write(f"item {{ id: {i + 1} name: '{name}' }}\n")
    cfg_path = str(tmp / "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(record=record, label_map=label_map))
    return {"tmp": tmp, "config": cfg_path, "record": record}


def test_ssd_train_eval_export(workdir, capsys):
    from mtlx.train import train as train_cli

    train_dir = str(workdir["tmp"] / "train")
    train_cli.main(
        ["--pipeline_config_path", workdir["config"],
         "--train_dir", train_dir, "--log_every", "1"]
    )
    out = capsys.readouterr().out
    assert "[train] done at step 3" in out
    # loss logged and finite every step
    losses = [
        json.loads(line.split("[train] ", 1)[1])
        for line in out.splitlines()
        if line.startswith("[train] {")
    ]
    assert len(losses) == 3
    assert all(np.isfinite(l["total_loss"]) for l in losses)
    assert all("Loss/regularization_loss" in l for l in losses)

    from mtlx.eval import eval as eval_cli

    eval_dir = str(workdir["tmp"] / "eval")
    eval_cli.main(
        ["--pipeline_config_path", workdir["config"],
         "--checkpoint_dir", train_dir, "--eval_dir", eval_dir, "--run_once"]
    )
    out = capsys.readouterr().out
    assert "Precision/mAP@0.5IOU" in out
    metrics = json.loads(out.split("[eval] step 3: ")[1].splitlines()[0])
    assert np.isfinite(metrics["Precision/mAP@0.5IOU"])

    from mtlx.export.exporter import InferenceModel, export_inference_graph

    export_dir = str(workdir["tmp"] / "export")
    export_inference_graph(workdir["config"], train_dir, export_dir)
    infer = InferenceModel.load(export_dir)
    det = infer.predict_image_tensor(np.zeros((1, 64, 64, 3), np.uint8))
    assert det["detection_boxes"].shape == (1, 10, 4)
    b = det["detection_boxes"]
    assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()


def test_eval_export_knobs(workdir, capsys):
    """eval_config.visualization_export_dir / export_path /
    ignore_groundtruth are honored (reference eval_util behavior), using
    the checkpoint trained above."""
    import os

    from mtlx.eval import eval as eval_cli

    base = open(workdir["config"]).read()
    viz_dir = str(workdir["tmp"] / "vizout")
    export_path = str(workdir["tmp"] / "detections.json")
    cfg2 = base.replace(
        "eval_config { num_examples: 4 }",
        'eval_config { num_examples: 2 num_visualizations: 2\n'
        f'  visualization_export_dir: "{viz_dir}"\n'
        f'  export_path: "{export_path}" }}',
    )
    assert cfg2 != base
    cfg2_path = str(workdir["tmp"] / "pipeline_export.config")
    open(cfg2_path, "w").write(cfg2)
    eval_cli.main(
        ["--pipeline_config_path", cfg2_path,
         "--checkpoint_dir", str(workdir["tmp"] / "train"),
         "--eval_dir", str(workdir["tmp"] / "eval2"), "--run_once"]
    )
    out = capsys.readouterr().out
    assert "Precision/mAP@0.5IOU" in out
    pngs = os.listdir(viz_dir)
    assert len(pngs) == 2 and all(p.endswith(".png") for p in pngs)
    dets = json.load(open(export_path))
    assert len(dets) == 2
    assert {"source_id", "detection_boxes", "detection_scores",
            "detection_classes"} <= set(dets[0])

    # ignore_groundtruth: detections/visualizations without metrics
    cfg3 = base.replace(
        "eval_config { num_examples: 4 }",
        "eval_config { num_examples: 2 ignore_groundtruth: true }",
    )
    cfg3_path = str(workdir["tmp"] / "pipeline_nogt.config")
    open(cfg3_path, "w").write(cfg3)
    eval_cli.main(
        ["--pipeline_config_path", cfg3_path,
         "--checkpoint_dir", str(workdir["tmp"] / "train"),
         "--eval_dir", str(workdir["tmp"] / "eval3"), "--run_once"]
    )
    out = capsys.readouterr().out
    assert "Precision/mAP@0.5IOU" not in out
    assert "eval/images_per_sec" in out


def test_num_epochs_bounds_training(workdir, capsys):
    """train_input_reader.num_epochs: 1 ends the run when the dataset is
    exhausted (4 examples / batch 2 = 2 steps), before num_steps: 3."""
    from mtlx.train import train as train_cli

    base = open(workdir["config"]).read()
    # first label_map_path occurrence = the train input reader
    needle = 'label_map_path: "%s"' % str(workdir["tmp"] / "label_map.pbtxt")
    cfg = base.replace(needle, needle + "\n  num_epochs: 1", 1)
    assert "num_epochs" in cfg
    cfg_path = str(workdir["tmp"] / "pipeline_epochs.config")
    open(cfg_path, "w").write(cfg)
    train_cli.main(
        ["--pipeline_config_path", cfg_path,
         "--train_dir", str(workdir["tmp"] / "train_epochs"),
         "--log_every", "1"]
    )
    out = capsys.readouterr().out
    assert "[train] done at step 2" in out


def test_ssd_predictor_depth_knobs_change_params(workdir):
    """num_layers_before_predictor/min_depth create the intermediate conv
    (builder-knob-changes-behavior test, VERDICT round-1 item 3)."""
    import jax

    from mtlx.builders import model_builder
    from mtlx.config import config_util

    configs = config_util.get_configs_from_pipeline_file(workdir["config"])
    model = model_builder.build(configs["model"], is_training=True, max_gt_boxes=8)
    variables = model.init_variables(jax.random.PRNGKey(0))
    p0 = variables["params"]["box_predictor_0"]
    assert "conv_0_1x1_16" in p0, sorted(p0)
    assert p0["conv_0_1x1_16"]["kernel"].shape[-1] == 16


def test_ssd_box_coder_and_similarity_knobs():
    """ssd.box_coder scales and similarity_calculator reach the model."""
    from google.protobuf import text_format

    from mtlx.builders import ssd_builder
    from mtlx.config.protos import pipeline_pb2

    proto = pipeline_pb2.Ssd()
    text_format.Parse(
        """
        num_classes: 2
        image_resizer { fixed_shape_resizer { height: 64 width: 64 } }
        feature_extractor { type: 'ssd_mobilenet_v1' depth_multiplier: 0.25 }
        anchor_generator { ssd_anchor_generator { num_layers: 4 aspect_ratios: 1.0 } }
        box_coder {
          faster_rcnn_box_coder { y_scale: 7.0 x_scale: 7.0
                                  height_scale: 3.0 width_scale: 3.0 }
        }
        similarity_calculator { ioa_similarity { } }
        post_processing {
          batch_non_max_suppression { iou_threshold: 0.6 max_total_detections: 5 }
          score_converter: SIGMOID
        }
        loss { classification_loss { weighted_sigmoid { } } }
        """,
        proto,
    )
    model = ssd_builder.build(proto, is_training=True, max_gt_boxes=4)
    assert model.cfg.box_coder_scales == (7.0, 7.0, 3.0, 3.0)
    assert model.cfg.similarity == "ioa"
    # the scales actually change encode output
    import jax.numpy as jnp

    anchors = jnp.asarray([[0.2, 0.2, 0.6, 0.6]])
    boxes = jnp.asarray([[0.25, 0.25, 0.65, 0.65]])
    enc = model.box_coder.encode(boxes, anchors)
    from mtlx.coders.box_coders import make_faster_rcnn_coder

    default_enc = make_faster_rcnn_coder().encode(boxes, anchors)
    assert not jnp.allclose(enc, default_enc)
