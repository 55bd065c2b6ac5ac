"""The configurable bucket granularity (mtlx/utils/bucketing.py,
train.py/eval.py/exporter --bucket_multiple): one knob shared by the
loader's transfer packing, the train/eval compute bucket, and serving.
Measured on TPU v5e: multiple=32 is +12.9% train img/s at the R101 COCO
operating point (tools/bucket_sweep.py); these tests pin the semantics
so the knob stays safe to flip."""

import numpy as np
import pytest

from mtlx.utils import bucketing


@pytest.fixture(autouse=True)
def _restore_default():
    yield
    bucketing.set_bucket_multiple(bucketing.DEFAULT_BUCKET_MULTIPLE)


def test_set_validation():
    for bad in (0, -32, 48, 20, 127):
        with pytest.raises(ValueError):
            bucketing.set_bucket_multiple(bad)
    bucketing.set_bucket_multiple(32)
    assert bucketing.bucket_multiple() == 32
    bucketing.set_bucket_multiple(256)
    assert bucketing.bucket_multiple() == 256


def test_bucket_extent():
    assert bucketing.bucket_extent(600, 1024, 128) == 640
    assert bucketing.bucket_extent(600, 1024, 32) == 608
    assert bucketing.bucket_extent(1000, 1024, 32) == 1024  # capped
    bucketing.set_bucket_multiple(64)
    assert bucketing.bucket_extent(600, 1024) == 640
    assert bucketing.bucket_extent(800, 1024) == 832


def test_pad_batch_to_bucket_follows_knob():
    import jax.numpy as jnp

    from mtlx.train.train_step import pad_batch_to_bucket

    batch = {"image": jnp.zeros((2, 600, 800, 3), jnp.float32)}
    assert pad_batch_to_bucket(batch, (1024, 1024))["image"].shape == (
        2, 640, 896, 3)
    bucketing.set_bucket_multiple(32)
    assert pad_batch_to_bucket(batch, (1024, 1024))["image"].shape == (
        2, 608, 800, 3)
    # explicit multiple overrides the knob
    assert pad_batch_to_bucket(batch, (1024, 1024), multiple=64)[
        "image"].shape == (2, 640, 832, 3)


def test_pad_batch_to_bucket_masks_follow_knob():
    """gt instance masks (canvas/mask_stride frame) crop to the same
    bucket at any granularity."""
    import jax.numpy as jnp

    from mtlx.train.train_step import pad_batch_to_bucket

    bucketing.set_bucket_multiple(32)
    batch = {
        "image": jnp.zeros((2, 120, 200, 3), jnp.float32),
        "gt_instance_masks": jnp.ones((2, 4, 64, 64), jnp.float32),
    }
    out = pad_batch_to_bucket(batch, (512, 512))  # mask stride 8
    assert out["image"].shape == (2, 128, 224, 3)
    assert out["gt_instance_masks"].shape == (2, 4, 128 // 8, 224 // 8)


def test_loader_pack_follows_knob():
    from mtlx.data.loader import pack_batch_images

    images = np.zeros((2, 1024, 1024, 3), np.uint8)
    ts = np.asarray([[600, 800], [500, 700]], np.int32)
    assert pack_batch_images(images, ts).shape == (2, 640, 896, 3)
    bucketing.set_bucket_multiple(32)
    assert pack_batch_images(images, ts).shape == (2, 608, 800, 3)


def test_record_bucket_keys_cache_invalidates_on_knob_change():
    from mtlx.data.loader import record_bucket_keys

    class Ds:
        canvas_size = (1024, 1024)

        def __len__(self):
            return 2

        def peek_target_shape(self, i):
            return [(600, 1000), (1000, 600)][i]

    ds = Ds()
    assert record_bucket_keys(ds) == [(640, 1024), (1024, 640)]
    bucketing.set_bucket_multiple(32)
    assert record_bucket_keys(ds) == [(608, 1024), (1024, 608)]


def test_eval_cli_flag_resolves_knob(tmp_path):
    """parse_args validates but no longer mutates the global as a side
    effect; main() resolves flag > pipeline `bucketing {}` > default."""
    from mtlx.eval.eval import parse_args

    args = parse_args([
        "--pipeline_config_path", "x.config",
        "--checkpoint_dir", str(tmp_path),
        "--eval_dir", str(tmp_path),
        "--bucket_multiple", "64",
    ])
    assert bucketing.resolve_bucketing(None, args.bucket_multiple,
                                       args.max_bucket_variants) == 0
    assert bucketing.bucket_multiple() == 64
    # invalid values are a usage error at parse time, not a traceback
    with pytest.raises(SystemExit):
        parse_args([
            "--pipeline_config_path", "x.config",
            "--checkpoint_dir", str(tmp_path),
            "--eval_dir", str(tmp_path),
            "--bucket_multiple", "48",
        ])


def test_resolve_bucketing_precedence():
    """Flag > pipeline bucketing block > default, and the variant bound
    resolves the same way."""
    from mtlx.config.protos import pipeline_pb2

    pipeline = pipeline_pb2.TrainEvalPipelineConfig()
    pipeline.bucketing.bucket_multiple = 64
    pipeline.bucketing.max_bucket_variants = 3
    try:
        # config only
        variants = bucketing.resolve_bucketing(pipeline.bucketing)
        assert bucketing.bucket_multiple() == 64 and variants == 3
        # flag overrides config
        variants = bucketing.resolve_bucketing(pipeline.bucketing, 32, 5)
        assert bucketing.bucket_multiple() == 32 and variants == 5
        # no config, no flag -> default
        variants = bucketing.resolve_bucketing(None)
        assert (bucketing.bucket_multiple()
                == bucketing.DEFAULT_BUCKET_MULTIPLE)
        assert variants == 0
    finally:
        bucketing.set_bucket_multiple(bucketing.DEFAULT_BUCKET_MULTIPLE)


def test_pipeline_config_roundtrips_bucketing(tmp_path):
    """The bucketing block survives read -> dict -> proto -> save, so a
    train_dir/export pipeline.config carries the operating point."""
    from mtlx.config import config_util

    path = tmp_path / "p.config"
    path.write_text(
        "model { faster_rcnn { num_classes: 3 } }\n"
        "bucketing { bucket_multiple: 32 max_bucket_variants: 4 }\n"
    )
    configs = config_util.get_configs_from_pipeline_file(str(path))
    assert configs["bucketing"].bucket_multiple == 32
    assert configs["bucketing"].max_bucket_variants == 4
    out = config_util.create_pipeline_proto_from_configs(configs)
    saved = config_util.save_pipeline_config(out, str(tmp_path / "out"))
    reread = config_util.get_configs_from_pipeline_file(saved)
    assert reread["bucketing"].bucket_multiple == 32
    assert reread["bucketing"].max_bucket_variants == 4


def test_eval_step_fine_bucket_same_detections_frame():
    """At granularity 32 the eval step still normalizes detections to the
    true-image frame (the bucket only changes how much padding the
    backbone sees)."""
    import jax
    import jax.numpy as jnp

    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_eval_step,
        make_optimizer,
    )

    bucketing.set_bucket_multiple(32)
    model = FasterRCNN(FasterRCNNConfig(
        num_classes=3, canvas_size=(256, 256),
        anchor_scales=(0.5, 1.0), anchor_aspect_ratios=(1.0,),
        anchor_base_size=(32.0, 32.0), rpn_depth=16,
        first_stage_pre_nms_top_k=32, first_stage_max_proposals=8,
        first_stage_minibatch_size=16, second_stage_batch_size=8,
        max_gt_boxes=4, dtype=jnp.float32,
    ))
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer())
    # make_eval_step pads to the knob's bucket internally (pad_for_model)
    ev = jax.jit(make_eval_step(model))
    rs = np.random.RandomState(3)
    batch = {
        "image": jnp.asarray(
            rs.uniform(0, 255, (1, 100, 140, 3)), jnp.float32
        ),
        "true_shape": jnp.asarray([[100, 140]], jnp.int32),
    }
    det = jax.device_get(ev(state, batch))
    n = int(det["num_detections"][0])
    if n:
        b = det["detection_boxes"][0][:n]
        assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()
