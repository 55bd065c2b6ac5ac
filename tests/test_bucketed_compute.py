"""Bucketed compute: the detector runs on the 128-bucketed true-image
region instead of the padded max canvas (train_step.pad_batch_to_bucket +
FasterRCNN.anchors_for). The production perf lever (+45% device
throughput at the VOC operating point) — these tests pin its semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig, MTLConfig
from mtlx.train.train_step import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    pad_batch_to_bucket,
    pad_for_model,
)


def tiny_model(canvas=(256, 256), **kw):
    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=canvas,
        anchor_scales=(0.5, 1.0), anchor_aspect_ratios=(1.0,),
        anchor_base_size=(32.0, 32.0), rpn_depth=16,
        first_stage_pre_nms_top_k=32, first_stage_max_proposals=8,
        first_stage_minibatch_size=16, second_stage_batch_size=8,
        max_gt_boxes=4, dtype=jnp.float32, **kw,
    )
    return FasterRCNN(cfg)


def make_batch(rs, ih, iw, th, tw, b=2, mask_canvas=None, mask_stride=8):
    batch = {
        "image": rs.uniform(0, 255, (b, ih, iw, 3)).astype(np.float32),
        "true_shape": np.tile([[th, tw]], (b, 1)).astype(np.int32),
        "gt_boxes": np.tile(np.asarray(
            [[[10, 10, 100, 80], [40, 60, 110, 150],
              [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32), (b, 1, 1)),
        "gt_classes": np.zeros((b, 4), np.int32),
        "gt_mask": np.tile([[True, True, False, False]], (b, 1)),
    }
    if mask_canvas is not None:
        mh, mw = mask_canvas[0] // mask_stride, mask_canvas[1] // mask_stride
        batch["gt_instance_masks"] = rs.randint(
            0, 2, (b, 4, mh, mw)
        ).astype(np.uint8)
    return batch


def test_pad_batch_to_bucket_shapes():
    rs = np.random.RandomState(0)
    out = pad_batch_to_bucket(make_batch(rs, 120, 200, 120, 200), (512, 512))
    assert out["image"].shape == (2, 128, 256, 3)
    # already at a bucket boundary: no-op
    same = pad_batch_to_bucket(make_batch(rs, 128, 256, 120, 200), (512, 512))
    assert same["image"].shape == (2, 128, 256, 3)
    # capped at the canvas
    cap = pad_batch_to_bucket(make_batch(rs, 200, 200, 200, 200), (224, 224))
    assert cap["image"].shape == (2, 224, 224, 3)
    with pytest.raises(ValueError):
        pad_batch_to_bucket(make_batch(rs, 300, 300, 300, 300), (256, 256))


def test_pad_batch_to_bucket_crops_instance_masks():
    """gt instance masks (canvas/mask_stride frame) follow the bucket."""
    rs = np.random.RandomState(0)
    batch = make_batch(rs, 120, 200, 120, 200, mask_canvas=(512, 512))
    assert batch["gt_instance_masks"].shape == (2, 4, 64, 64)
    out = pad_batch_to_bucket(batch, (512, 512))
    assert out["gt_instance_masks"].shape == (2, 4, 128 // 8, 256 // 8)
    np.testing.assert_array_equal(
        out["gt_instance_masks"], batch["gt_instance_masks"][:, :, :16, :32]
    )


def test_anchors_follow_compute_canvas():
    model = tiny_model()
    full = model.anchors_for((256, 256))
    half = model.anchors_for((128, 256))
    assert full.shape[0] == 16 * 16 * 2
    assert half.shape[0] == 8 * 16 * 2
    # cache: same object back, no tracers leak out of jit traces
    assert model.anchors_for((128, 256)) is half
    assert isinstance(np.asarray(half), np.ndarray)
    # anchors clipped to their own canvas
    assert float(jnp.max(half[:, 2])) <= 128.0
    assert float(jnp.max(full[:, 2])) <= 256.0
    # default .anchors is the full-canvas set (back-compat)
    np.testing.assert_array_equal(np.asarray(model.anchors), np.asarray(full))


def test_train_step_runs_on_bucket_and_uses_bucket_anchors():
    model = tiny_model(
        mtl=MTLConfig(multiobject=True, closeness=True, foreground=True)
    )
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer(0.01))
    step = jax.jit(make_train_step(model))
    rs = np.random.RandomState(0)
    nb = pad_for_model(model, make_batch(rs, 120, 200, 120, 200))
    assert nb["image"].shape == (2, 128, 256, 3)
    _, metrics = step(state, nb, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # predict on the bucket exposes the bucket's anchor set
    images = model.preprocess(jnp.asarray(nb["image"]))
    gt = {"boxes": jnp.asarray(nb["gt_boxes"]),
          "classes": jnp.asarray(nb["gt_classes"]),
          "mask": jnp.asarray(nb["gt_mask"])}
    pred = model.predict(
        images=images, true_shapes=jnp.asarray(nb["true_shape"]),
        variables=model.init_variables(jax.random.PRNGKey(0)),
        training=True, rng=jax.random.PRNGKey(2), groundtruth=gt,
    )
    assert pred["anchors"].shape[0] == 8 * 16 * 2
    assert pred["rpn_features"].shape[1:3] == (128 // 16, 256 // 16)


def test_train_steps_across_buckets_share_state():
    """Real keep-aspect data produces DIFFERENT buckets across batches
    (landscape vs portrait): consecutive steps jit-specialize per bucket
    but thread one optimizer state through."""
    model = tiny_model()
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer(0.01))
    step = jax.jit(make_train_step(model))
    rs = np.random.RandomState(0)
    b1 = pad_for_model(model, make_batch(rs, 120, 200, 120, 200))  # 128x256
    b2 = pad_for_model(model, make_batch(rs, 200, 120, 200, 120))  # 256x128
    assert b1["image"].shape[1:3] == (128, 256)
    assert b2["image"].shape[1:3] == (256, 128)
    state, m1 = step(state, b1, jax.random.PRNGKey(1))
    state, m2 = step(state, b2, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    assert np.isfinite(float(m1["total_loss"]))
    assert np.isfinite(float(m2["total_loss"]))


def test_eval_step_bucket_vs_full_canvas_same_frame():
    """Detections from the bucketed eval are normalized to the SAME
    true-image frame as full-canvas eval (postprocess divides by
    true_shape, not the compute canvas)."""
    model = tiny_model()
    state = create_train_state(model, jax.random.PRNGKey(0), make_optimizer())
    ev = jax.jit(make_eval_step(model))
    rs = np.random.RandomState(3)
    content = rs.uniform(0, 255, (1, 120, 200, 3)).astype(np.float32)

    packed = np.zeros((1, 128, 256, 3), np.float32)
    packed[:, :120, :200] = content
    full = np.zeros((1, 256, 256, 3), np.float32)
    full[:, :120, :200] = content
    ts = np.asarray([[120, 200]], np.int32)

    det_b = jax.device_get(ev(state, {"image": packed, "true_shape": ts}))
    det_f = jax.device_get(ev(state, {"image": full, "true_shape": ts}))
    # both produce boxes in the normalized true-image frame: all within
    # [0, 1] for valid detections
    for det in (det_b, det_f):
        n = int(det["num_detections"][0])
        if n:
            b = det["detection_boxes"][0][:n]
            assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()


def test_ssd_keeps_full_canvas():
    """SSD anchors are canvas-fixed: pad_for_model must restore the full
    canvas for it."""
    from mtlx.detector.ssd import SSD, SSDConfig

    model = SSD(SSDConfig(num_classes=2, canvas_size=(256, 256),
                          depth_multiplier=0.25))
    rs = np.random.RandomState(0)
    out = pad_for_model(model, make_batch(rs, 120, 200, 120, 200))
    assert out["image"].shape == (2, 256, 256, 3)


def test_bucket_multiple_matches_loader_pack():
    # ONE knob: the loader's transfer granularity and the step's compute
    # granularity are the same mtlx.utils.bucketing setting
    from mtlx.data.loader import _pack_multiple
    from mtlx.utils.bucketing import bucket_multiple

    assert _pack_multiple is bucket_multiple
    assert bucket_multiple() in (32, 64, 128)


# ---- bucket precompilation (train.py --precompile_buckets) ----------------


class _FakeDs:
    """Duck-typed DetectionDataset: canvas + per-record target shapes."""

    def __init__(self, targets, canvas=(1024, 1024)):
        self.canvas_size = canvas
        self._t = list(targets)

    def __len__(self):
        return len(self._t)

    def peek_target_shape(self, i):
        return self._t[i]


def test_achievable_bucket_shapes_closure():
    from mtlx.data.loader import achievable_bucket_shapes

    ds = _FakeDs([(600, 1000), (1000, 600), (600, 1000)])
    # batch > 1: pairwise max-closure (a mixed batch hits (1024, 1024))
    assert achievable_bucket_shapes(ds, batch_size=2) == [
        (640, 1024), (1024, 640), (1024, 1024)]
    # batch == 1: only the per-record buckets
    assert achievable_bucket_shapes(ds, batch_size=1) == [
        (640, 1024), (1024, 640)]
    # capped at the canvas
    ds2 = _FakeDs([(2000, 100)], canvas=(1024, 1024))
    assert achievable_bucket_shapes(ds2, batch_size=4) == [(1024, 128)]
    # max_records bounds the header scan
    ds3 = _FakeDs([(100, 100), (1000, 1000)])
    assert achievable_bucket_shapes(ds3, batch_size=2, max_records=1) == [
        (128, 128)]


def test_peek_target_shape_matches_decode(tmp_path):
    """Header-only peek agrees with the full decode's true_shape for both
    keep_aspect and fixed resizers (native codec or PIL fallback)."""
    import io

    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.data.loader import DetectionDataset

    record = str(tmp_path / "t.record")
    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(record) as w:
        for h, w0 in [(100, 200), (200, 100), (130, 130)]:
            arr = rs.randint(0, 255, (h, w0, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            ex = build_example(
                buf.getvalue(), b"jpeg", h, w0, "x.jpg",
                np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32), [1], ["a"])
            w.write(ex.SerializeToString())

    ds = DetectionDataset(
        [record], canvas_size=(256, 256),
        resizer=("keep_aspect", {"min_dimension": 120, "max_dimension": 256}),
        max_boxes=4)
    for i in range(len(ds)):
        peek = ds.peek_target_shape(i)
        got = tuple(int(v) for v in ds.get(i)["true_shape"])
        assert peek == got, (i, peek, got)

    ds_fixed = DetectionDataset(
        [record], canvas_size=(96, 128),
        resizer=("fixed", {"height": 96, "width": 128}), max_boxes=4)
    for i in range(len(ds_fixed)):
        assert ds_fixed.peek_target_shape(i) == (96, 128)


# ---- aspect-grouped batching (loader.batches / grain _bucket_batched) -----


class _FakeImgDs:
    """Duck-typed dataset for batches(): canvas-shaped zero images with
    per-record true shapes."""

    def __init__(self, targets, canvas=(512, 512)):
        self.canvas_size = canvas
        self._t = list(targets)

    def __len__(self):
        return len(self._t)

    def peek_target_shape(self, i):
        return self._t[i]

    def get(self, i):
        th, tw = self._t[i]
        return {
            "image": np.zeros(self.canvas_size + (3,), np.uint8),
            "true_shape": np.asarray([th, tw], np.int32),
            "idx": np.asarray(i, np.int32),
        }


def test_batches_aspect_grouping_single_bucket_batches():
    from mtlx.data.loader import batches

    # 6 landscape + 6 portrait: grouping must never mix them
    ds = _FakeImgDs([(300, 500)] * 6 + [(500, 300)] * 6)
    seen = []
    for b in batches(ds, 2, shuffle=True, seed=3, epochs=1,
                     pack_images=True):
        ts = b["true_shape"]
        assert (ts[:, 0] == ts[0, 0]).all() and (ts[:, 1] == ts[0, 1]).all()
        # the packed image is at the batch's own bucket
        assert b["image"].shape[1:3] == (
            -(-int(ts[0, 0]) // 128) * 128, -(-int(ts[0, 1]) // 128) * 128)
        seen += list(b["idx"])
    assert sorted(seen) == list(range(12))  # every record once per epoch


def test_batches_aspect_grouping_leftovers_and_determinism():
    from mtlx.data.loader import batches

    # 5 landscape + 3 portrait, batch 4: one full landscape batch, then a
    # mixed leftover batch (1 landscape + 3 portrait)
    ds = _FakeImgDs([(300, 500)] * 5 + [(500, 300)] * 3)
    run1 = [list(b["idx"]) for b in batches(ds, 4, seed=7, epochs=1,
                                            pack_images=True)]
    run2 = [list(b["idx"]) for b in batches(ds, 4, seed=7, epochs=1,
                                            pack_images=True)]
    assert run1 == run2  # deterministic under a fixed seed
    flat = sorted(i for b in run1 for i in b)
    assert flat == list(range(8))
    n_pure = sum(
        1 for b in run1
        if len({tuple(ds._t[i]) for i in b}) == 1
    )
    assert n_pure >= 1  # the full landscape batch is pure


def test_grain_bucket_batched_stream():
    from mtlx.data.grain_loader import _bucket_batched

    def sample(i, th, tw):
        return {
            "image": np.zeros((512, 512, 3), np.uint8),
            "true_shape": np.asarray([th, tw], np.int32),
            "idx": np.asarray(i, np.int32),
        }

    # alternating stream: grouping must separate the two buckets
    stream = [sample(i, *((300, 500) if i % 2 == 0 else (500, 300)))
              for i in range(16)]
    out = list(_bucket_batched(iter(stream), (512, 512), 4))
    assert len(out) == 4
    for b in out:
        ts = b["true_shape"]
        assert (ts == ts[0]).all()
        assert b["image"].shape[1:3] in [(384, 512), (512, 384)]
    # reservoir overflow: 9 all-distinct buckets, batch 4, reservoir 2
    # batches -> must flush a mixed batch instead of deadlocking, and the
    # tail that never fills a batch is dropped (drop_remainder semantics)
    stream2 = [sample(i, 128 * (i + 1), 64) for i in range(9)]
    out2 = list(_bucket_batched(iter(stream2), (2048, 2048), 4,
                                max_buffered_batches=2))
    # one overflow flush + one drain batch; the 1-sample tail is dropped
    assert len(out2) == 2
    assert all(b["image"].shape[0] == 4 for b in out2)
    emitted = sorted(int(i) for b in out2 for i in b["idx"])
    assert len(emitted) == 8 and len(set(emitted)) == 8


def test_record_bucket_keys_cached_on_dataset():
    from mtlx.data.loader import record_bucket_keys

    calls = []

    class Ds(_FakeDs):
        def peek_target_shape(self, i):
            calls.append(i)
            return super().peek_target_shape(i)

    ds = Ds([(600, 1000), (1000, 600)])
    k1 = record_bucket_keys(ds)
    k2 = record_bucket_keys(ds)  # served from the cache, no re-scan
    assert k1 == k2 == [(640, 1024), (1024, 640)]
    assert len(calls) == 2
    assert record_bucket_keys(ds, max_records=1) == [(640, 1024)]
    assert len(calls) == 2  # prefix also from the cache
