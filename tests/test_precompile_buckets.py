"""train.py --precompile_buckets: header-scan the dataset, AOT-compile
every achievable compute-bucket variant of the train step before step 1
(no mid-run XLA stall when a rare bucket first appears)."""

import io

import numpy as np

CONFIG = """
model {{
  faster_rcnn {{
    num_classes: 2
    image_resizer {{
      keep_aspect_ratio_resizer {{ min_dimension: 120 max_dimension: 256 }}
    }}
    feature_extractor {{ type: 'faster_rcnn_resnet50' }}
    first_stage_anchor_generator {{
      grid_anchor_generator {{ scales: [1.0] aspect_ratios: [1.0] height: 64 width: 64 }}
    }}
    first_stage_box_predictor_depth: 16
    first_stage_max_proposals: 8
    first_stage_minibatch_size: 16
    second_stage_batch_size: 4
    initial_crop_size: 14
    maxpool_kernel_size: 2
    maxpool_stride: 2
    second_stage_post_processing {{
      batch_non_max_suppression {{ score_threshold: 0.0 iou_threshold: 0.6 max_detections_per_class: 5 max_total_detections: 10 }}
      score_converter: SOFTMAX
    }}
  }}
}}
train_config {{
  batch_size: 1
  optimizer {{
    momentum_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.001 }} }}
      momentum_optimizer_value: 0.9
    }}
    use_moving_average: false
  }}
  num_steps: 2
  max_number_of_boxes: 4
}}
train_input_reader {{
  tf_record_input_reader {{ input_path: "{record}" }}
  label_map_path: "{label_map}"
  shuffle: false
}}
"""


def test_train_cli_precompiles_all_bucket_variants(tmp_path, capsys):
    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.train import train as train_cli

    record = str(tmp_path / "train.record")
    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(record) as w:
        # one landscape (-> 128x256 bucket), one portrait (-> 256x128)
        for h, w0 in [(100, 200), (200, 100)]:
            arr = rs.randint(0, 255, (h, w0, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            boxes = np.asarray([[0.1, 0.1, 0.6, 0.6]], np.float32)
            ex = build_example(
                buf.getvalue(), b"jpeg", h, w0, "x.jpg", boxes, [1], ["a"])
            w.write(ex.SerializeToString())
    label_map = str(tmp_path / "label_map.pbtxt")
    with open(label_map, "w") as f:
        f.write("item { id: 1 name: 'a' }\nitem { id: 2 name: 'b' }\n")
    cfg = str(tmp_path / "pipeline.config")
    with open(cfg, "w") as f:
        f.write(CONFIG.format(record=record, label_map=label_map))

    train_cli.main([
        "--pipeline_config_path", cfg,
        "--train_dir", str(tmp_path / "train"),
        "--precompile_buckets",
        "--log_every", "1",
    ])
    out = capsys.readouterr().out
    # batch 1: exactly the two per-record buckets, no pairwise closure
    assert "precompiled 2 bucket variants" in out
    assert "(128, 256)" in out and "(256, 128)" in out
    assert "[train] done at step 2" in out
