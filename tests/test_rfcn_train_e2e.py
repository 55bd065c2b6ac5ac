"""R-FCN end-to-end through the config API: train CLI -> checkpoint ->
eval CLI. With SSD and Faster R-CNN this completes driver-level coverage
of all three reference meta-architectures (SURVEY.md §3.3)."""

import io
import json

import numpy as np
import pytest

CONFIG = """
model {{
  faster_rcnn {{
    num_classes: 3
    image_resizer {{ fixed_shape_resizer {{ height: 96 width: 96 }} }}
    feature_extractor {{ type: 'faster_rcnn_resnet50' }}
    first_stage_anchor_generator {{
      grid_anchor_generator {{ scales: [0.5, 1.0] aspect_ratios: [1.0]
                               height: 64 width: 64 }}
    }}
    first_stage_box_predictor_depth: 32
    first_stage_max_proposals: 8
    first_stage_minibatch_size: 16
    second_stage_batch_size: 4
    second_stage_box_predictor {{
      rfcn_box_predictor {{
        num_spatial_bins_height: 3
        num_spatial_bins_width: 3
        depth: 64
        crop_height: 6
        crop_width: 6
      }}
    }}
    second_stage_post_processing {{
      batch_non_max_suppression {{ score_threshold: 0.0 iou_threshold: 0.6
                                   max_detections_per_class: 5
                                   max_total_detections: 10 }}
      score_converter: SOFTMAX
    }}
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
  num_steps: 2
  save_checkpoints_steps: 2
  max_number_of_boxes: 8
}}
train_input_reader {{
  tf_record_input_reader {{ input_path: "{record}" }}
  label_map_path: "{label_map}"
}}
eval_config {{ num_examples: 2 }}
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

    tmp = tmp_path_factory.mktemp("rfcn_e2e")
    record = str(tmp / "train.record")
    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(2):
            arr = rs.randint(0, 255, (96, 96, 3), dtype=np.uint8)
            arr[10:50, 10:60] = [250, 30, 30]
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            boxes = np.asarray([[10 / 96, 10 / 96, 50 / 96, 60 / 96]], np.float32)
            ex = build_example(
                buf.getvalue(), b"jpeg", 96, 96, f"im{i}.jpg", boxes, [1], ["a"]
            )
            w.write(ex.SerializeToString())
    label_map = str(tmp / "label_map.pbtxt")
    with open(label_map, "w") as f:
        for i, name in enumerate(["a", "b", "c"]):
            f.write(f"item {{ id: {i + 1} name: '{name}' }}\n")
    cfg_path = str(tmp / "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(record=record, label_map=label_map))
    return {"tmp": tmp, "config": cfg_path}


def test_rfcn_builds_as_rfcn(workdir):
    from mtlx.builders import model_builder
    from mtlx.config import config_util
    from mtlx.detector.rfcn import RFCN

    configs = config_util.get_configs_from_pipeline_file(workdir["config"])
    model = model_builder.build(configs["model"], is_training=True, max_gt_boxes=8)
    assert isinstance(model, RFCN)
    assert model.cfg.num_spatial_bins == (3, 3)
    assert model.cfg.rfcn_depth == 64


def test_rfcn_train_and_eval(workdir, capsys):
    from mtlx.train import train as train_cli

    train_dir = str(workdir["tmp"] / "train")
    train_cli.main(
        ["--pipeline_config_path", workdir["config"],
         "--train_dir", train_dir, "--log_every", "1"]
    )
    out = capsys.readouterr().out
    assert "[train] done at step 2" in out
    losses = [
        json.loads(line.split("[train] ", 1)[1])
        for line in out.splitlines()
        if line.startswith("[train] {")
    ]
    assert losses and all(np.isfinite(l["total_loss"]) for l in losses)

    from mtlx.eval import eval as eval_cli

    eval_dir = str(workdir["tmp"] / "eval")
    eval_cli.main(
        ["--pipeline_config_path", workdir["config"],
         "--checkpoint_dir", train_dir, "--eval_dir", eval_dir, "--run_once"]
    )
    out = capsys.readouterr().out
    assert "Precision/mAP@0.5IOU" in out
