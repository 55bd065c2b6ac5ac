"""Classifier pretraining CLI (slim train_image_classifier parity): the
path that produces detector warm-start checkpoints — train a few steps on
synthetic data, export the backbone, and restore it into the detector."""

import io
import json

import numpy as np


def _write_cls_records(path, n=8, size=32, num_classes=3):
    from PIL import Image

    from mtlx.config.protos import example_pb2
    from mtlx.data import tfrecord

    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(path) as w:
        for i in range(n):
            buf = io.BytesIO()
            Image.fromarray(
                rs.randint(0, 255, (size, size, 3)).astype(np.uint8)
            ).save(buf, format="JPEG")
            ex = example_pb2.Example()
            f = ex.features.feature
            f["image/encoded"].bytes_list.value.append(buf.getvalue())
            f["image/class/label"].int64_list.value.append(i % num_classes)
            w.write(ex.SerializeToString())


def test_classifier_train_and_backbone_warm_start(tmp_path, capsys):
    import jax

    from mtlx.train import train_classifier

    record = str(tmp_path / "cls.record")
    _write_cls_records(record)
    export = str(tmp_path / "warm_backbone")
    train_classifier.main([
        "--model", "resnet50", "--train_record", record,
        "--train_dir", str(tmp_path / "cls_train"),
        "--num_classes", "3", "--image_size", "32",
        "--batch_size", "4", "--num_steps", "2", "--log_every", "1",
        "--export_backbone", export,
    ])
    out = capsys.readouterr().out
    lines = [json.loads(l.split("[cls] ", 1)[1])
             for l in out.splitlines() if l.startswith("[cls] {")]
    assert lines and np.isfinite(lines[-1]["loss"])
    assert "exported backbone warm-start checkpoint" in out

    # the exported subtree restores into the detector (classification
    # warm-start mode: backbone only)
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.train.checkpoints import restore_warm_start
    import jax.numpy as jnp

    model = FasterRCNN(FasterRCNNConfig(
        num_classes=3, canvas_size=(64, 64), anchor_scales=(1.0,),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=16, first_stage_pre_nms_top_k=16,
        first_stage_max_proposals=8, max_gt_boxes=4, dtype=jnp.float32,
    ))
    variables = model.init_variables(jax.random.PRNGKey(0))
    new_vars, restored, skipped = restore_warm_start(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        export, from_detection_checkpoint=False,
    )
    assert restored > 50  # the full resnet backbone subtree landed
    # restored weights actually differ from the random detector init
    old = np.asarray(variables["params"]["backbone"]["conv1"]["kernel"])
    new = np.asarray(new_vars["params"]["backbone"]["conv1"]["kernel"])
    assert not np.allclose(old, new)
    # block4 (the detector's second-stage classifier_backbone) must warm
    # start too (regression: --export_backbone dropped it, leaving ~15M
    # second-stage params at random init)
    old4 = np.asarray(jax.tree_util.tree_leaves(
        variables["params"]["classifier_backbone"])[0])
    new4 = np.asarray(jax.tree_util.tree_leaves(
        new_vars["params"]["classifier_backbone"])[0])
    assert not np.allclose(old4, new4)
