"""End-to-end integration: dataset creation -> train CLI -> checkpoint ->
eval CLI -> export -> standalone inference (the deterministic tiny-train
test the reference lacks, SURVEY.md §5 'implication for the rebuild')."""

import io
import json
import os

import numpy as np
import pytest

CONFIG = """
model {{
  faster_rcnn {{
    num_classes: 3
    image_resizer {{ fixed_shape_resizer {{ height: 96 width: 96 }} }}
    feature_extractor {{ type: 'faster_rcnn_resnet50' }}
    first_stage_anchor_generator {{
      grid_anchor_generator {{ scales: [0.5, 1.0] aspect_ratios: [1.0] height: 64 width: 64 }}
    }}
    first_stage_box_predictor_depth: 32
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
    mtl {{ window: true closeness: true edgemask: true }}
  }}
}}
train_config {{
  batch_size: 2
  optimizer {{
    momentum_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.001 }} }}
      momentum_optimizer_value: 0.9
    }}
    use_moving_average: false
  }}
  gradient_clipping_by_norm: 10.0
  data_augmentation_options {{ random_horizontal_flip {{}} }}
  num_steps: 4
  save_checkpoints_steps: 2
  max_number_of_boxes: 8
}}
train_input_reader {{
  tf_record_input_reader {{ input_path: "{record}" }}
  label_map_path: "{label_map}"
}}
eval_config {{
  num_examples: 4
  metrics_set: "pascal_voc_detection_metrics"
  metrics_set: "coco_detection_metrics"
}}
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

    tmp = tmp_path_factory.mktemp("e2e")
    record = str(tmp / "train.record")
    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(4):
            arr = rs.randint(0, 255, (72, 96, 3), dtype=np.uint8)
            arr[10:40, 10:50] = [250, 30, 30]  # a "red object"
            img = Image.fromarray(arr)
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            boxes = np.asarray([[10 / 72, 10 / 96, 40 / 72, 50 / 96]], np.float32)
            ex = build_example(
                buf.getvalue(), b"jpeg", 72, 96, f"im{i}.jpg", boxes, [1], ["a"]
            )
            w.write(ex.SerializeToString())
    label_map = str(tmp / "label_map.pbtxt")
    with open(label_map, "w") as f:
        for i, name in enumerate(["a", "b", "c"]):
            f.write(f"item {{ id: {i + 1} name: '{name}' }}\n")
    cfg_path = str(tmp / "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(record=record, label_map=label_map))
    return {"tmp": tmp, "config": cfg_path, "record": record, "label_map": label_map}


@pytest.mark.smoke
def test_train_checkpoint_eval_export(workdir, capsys):
    from mtlx.train import train as train_cli

    train_dir = str(workdir["tmp"] / "train")
    train_cli.main(
        [
            "--pipeline_config_path", workdir["config"],
            "--train_dir", train_dir,
            "--log_every", "2",
        ]
    )
    out = capsys.readouterr().out
    assert "[train] done at step 4" in out
    assert os.path.exists(os.path.join(train_dir, "pipeline.config"))
    # checkpoints written
    from mtlx.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(train_dir)
    assert mgr.latest_step() == 4

    # event file exists and contains scalars
    events = [f for f in os.listdir(train_dir) if f.startswith("events.out.tfevents")]
    assert events

    # ---- resume: running again continues from step 4 and stops ----
    train_cli.main(
        ["--pipeline_config_path", workdir["config"], "--train_dir", train_dir]
    )
    out = capsys.readouterr().out
    assert "resumed from step 4" in out

    # ---- eval CLI ----
    from mtlx.eval import eval as eval_cli

    eval_dir = str(workdir["tmp"] / "eval")
    eval_cli.main(
        [
            "--pipeline_config_path", workdir["config"],
            "--checkpoint_dir", train_dir,
            "--eval_dir", eval_dir,
            "--run_once",
        ]
    )
    out = capsys.readouterr().out
    assert "Precision/mAP@0.5IOU" in out
    metrics = json.loads(out.split("[eval] step 4: ")[1].splitlines()[0])
    assert np.isfinite(metrics["Precision/mAP@0.5IOU"])

    # --eval_training_data (reference eval.py flag) reads the TRAIN input;
    # both readers point at the same record here, so metrics must match
    m_train = eval_cli.main(
        [
            "--pipeline_config_path", workdir["config"],
            "--checkpoint_dir", train_dir,
            "--eval_dir", str(workdir["tmp"] / "eval_td"),
            "--run_once", "--eval_training_data",
        ]
    )
    capsys.readouterr()
    assert m_train["Precision/mAP@0.5IOU"] == pytest.approx(
        metrics["Precision/mAP@0.5IOU"]
    )

    # ---- export + standalone inference on all three input types ----
    from mtlx.export.exporter import InferenceModel, export_inference_graph

    export_dir = str(workdir["tmp"] / "export")
    export_inference_graph(workdir["config"], train_dir, export_dir)
    infer = InferenceModel.load(export_dir)

    det = infer.predict_image_tensor(np.zeros((1, 96, 96, 3), np.uint8))
    assert det["detection_boxes"].shape == (1, 10, 4)
    assert (det["detection_classes"] >= 1).all()

    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(np.zeros((50, 60, 3), np.uint8)).save(buf, format="JPEG")
    det2 = infer.predict_encoded_images([buf.getvalue()])
    assert det2["num_detections"].shape == (1,)

    from mtlx.data import tfrecord

    first = next(tfrecord.read_records(workdir["record"]))
    det3 = infer.predict_tf_examples([first])
    assert det3["detection_scores"].shape == (1, 10)


def test_warm_start_from_detection_checkpoint(workdir):
    """fine_tune_checkpoint restore: both modes restore without error and
    report counts (reference §6.4 two-mode warm start)."""
    import jax

    from mtlx.builders import model_builder
    from mtlx.config import config_util
    from mtlx.train.checkpoints import restore_warm_start, save_variables

    configs = config_util.get_configs_from_pipeline_file(workdir["config"])
    model = model_builder.build(configs["model"], is_training=True, max_gt_boxes=8)
    variables = model.init_variables(jax.random.PRNGKey(0))
    ckpt_path = str(workdir["tmp"] / "warm_ckpt")
    save_variables(
        ckpt_path,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )
    new_vars, restored, skipped = restore_warm_start(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        ckpt_path,
        from_detection_checkpoint=True,
    )
    assert restored > 100 and skipped == 0

    _, restored_bb, skipped_bb = restore_warm_start(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        ckpt_path,
        from_detection_checkpoint=False,
    )
    assert 0 < restored_bb < restored  # backbone-only subset


def test_restore_params_only_across_optimizers(workdir):
    """Eval/export restore must work when the checkpoint was written with a
    different optimizer structure (e.g. schedule vs constant lr)."""
    import jax
    import optax

    from mtlx.builders import model_builder
    from mtlx.config import config_util
    from mtlx.train.checkpoints import CheckpointManager
    from mtlx.train.train_step import create_train_state, make_optimizer

    configs = config_util.get_configs_from_pipeline_file(workdir["config"])
    model = model_builder.build(configs["model"], is_training=True, max_gt_boxes=8)
    # save with a schedule-based optimizer
    sched_tx = make_optimizer(optax.cosine_decay_schedule(0.01, 100))
    state = create_train_state(model, jax.random.PRNGKey(0), sched_tx)
    d = str(workdir["tmp"] / "xopt")
    mgr = CheckpointManager(d)
    mgr.save(1, state)
    mgr.wait()
    # restore into a constant-lr state: full restore fails, params_only works
    eval_model = model_builder.build(configs["model"], is_training=False, max_gt_boxes=8)
    eval_state = create_train_state(eval_model, jax.random.PRNGKey(1), make_optimizer())
    mgr2 = CheckpointManager(d)
    restored = mgr2.restore(eval_state, params_only=True)
    assert mgr2.latest_step() == 1
    assert int(restored.step) == int(state.step)
    bb = jax.tree_util.tree_leaves(restored.params["backbone"])[0]
    bb0 = jax.tree_util.tree_leaves(state.params["backbone"])[0]
    np.testing.assert_array_equal(np.asarray(bb), np.asarray(bb0))


def test_packed_transfer_through_train_cli(workdir, capsys):
    """--pack_transfer (default on) with a keep-aspect canvas: the loader
    ships 128-bucketed [B,128,128,3] images for a 160x160 canvas and the
    jitted step pads them back on device (regression for the transfer
    packing path, which fixed-shape test configs never exercise)."""
    from mtlx.data.loader import batches as loader_batches
    from mtlx.builders.model_builder import resizer_params
    from mtlx.config.protos import components_pb2
    from mtlx.data.loader import DetectionDataset
    from mtlx.train import train as train_cli

    base = open(workdir["config"]).read()
    cfg = base.replace(
        "image_resizer {{ fixed_shape_resizer {{ height: 96 width: 96 }} }}"
        .format(),
        "image_resizer { keep_aspect_ratio_resizer "
        "{ min_dimension: 72 max_dimension: 160 } }",
    ).replace("num_steps: 4", "num_steps: 2")
    assert "keep_aspect_ratio_resizer" in cfg
    cfg_path = str(workdir["tmp"] / "pipeline_packed.config")
    open(cfg_path, "w").write(cfg)

    # precondition: this config really produces packed (non-canvas) batches
    rz = components_pb2.ImageResizer()
    rz.keep_aspect_ratio_resizer.min_dimension = 72
    rz.keep_aspect_ratio_resizer.max_dimension = 160
    ds = DetectionDataset([workdir["record"]], canvas_size=(160, 160),
                          resizer=resizer_params(rz), max_boxes=8)
    b = next(iter(loader_batches(ds, 2, shuffle=False, pack_images=True)))
    assert b["image"].shape == (2, 128, 128, 3)

    train_dir = str(workdir["tmp"] / "train_packed")
    train_cli.main(
        ["--pipeline_config_path", cfg_path,
         "--train_dir", train_dir, "--log_every", "1"]
    )
    out = capsys.readouterr().out
    assert "[train] done at step 2" in out
    losses = [json.loads(line.split("[train] ", 1)[1])
              for line in out.splitlines() if line.startswith("[train] {")]
    assert losses and all(np.isfinite(l["total_loss"]) for l in losses)
