"""BucketCoalescer (--max_bucket_variants): bounds the compute-bucket
variant count under fine --bucket_multiple granularity. Kept set = the
N-1 most frequent per-record buckets + the full canvas; everything else
pads up to its minimum-area kept superset."""

import numpy as np
import pytest

from mtlx.data.loader import (
    BucketCoalescer,
    achievable_bucket_shapes,
    batches,
    pack_batch_images,
)
from mtlx.utils import bucketing


@pytest.fixture(autouse=True)
def _restore_default():
    yield
    bucketing.set_bucket_multiple(bucketing.DEFAULT_BUCKET_MULTIPLE)


CANVAS = (1024, 1024)


def test_identity_for_seen_keys_when_few_buckets():
    keys = [(608, 800)] * 5 + [(640, 1024)] * 3
    co = BucketCoalescer(keys, 4, CANVAS)
    assert not co.active
    assert co.map((608, 800)) == (608, 800)
    # unseen keys NEVER pass through (they would mint jit variants beyond
    # the bound — host-geometry post-crop buckets, mixed tail-batch
    # maxes): they map to their min-area kept superset even when inactive
    assert co.map((320, 480)) == (608, 800)
    assert set(co.kept) == {(608, 800), (640, 1024), CANVAS}


def test_bound_includes_canvas_slot():
    """kept <= max_variants ALWAYS: when the distinct ranking buckets fill
    the bound and the canvas is not among them, the least frequent key is
    evicted to make room for the canvas (unseen keys need a superset)."""
    keys = [(608, 800)] * 5 + [(640, 1024)] * 3 + (
        [(320, 480)] * 2
    )
    co = BucketCoalescer(keys, 3, CANVAS)
    assert co.active
    assert len(co.kept) == 3
    assert CANVAS in co.kept
    assert set(co.kept) == {(608, 800), (640, 1024), CANVAS}
    assert co.map((320, 480)) == (608, 800)


def test_map_clamps_oversized_keys_to_canvas():
    co = BucketCoalescer([(608, 800)] * 3, 2, CANVAS)
    # a key exceeding the canvas in either dim clamps instead of raising
    assert co.map((2048, 800)) == CANVAS
    assert co.map((2048, 2048)) == CANVAS


def test_runtime_stats_and_misranked_warning(caplog):
    import logging

    co = BucketCoalescer([(608, 800)] * 10 + [(640, 896)] * 5, 2, CANVAS)
    co.runtime_stats.clear()
    for _ in range(70):
        co.map((700, 900))  # only the canvas covers it
    assert co.runtime_stats["canvas"] == 70
    with caplog.at_level(logging.WARNING):
        assert co.maybe_warn_misranked()
    assert "mapped to the full canvas" in caplog.text
    # warns once
    assert not co.maybe_warn_misranked()


def test_no_warning_when_mostly_exact():
    co = BucketCoalescer([(608, 800)] * 10, 2, CANVAS)
    co.runtime_stats.clear()
    for _ in range(100):
        co.map((608, 800))
    co.map((900, 900))
    assert not co.maybe_warn_misranked()


def test_keeps_most_frequent_plus_canvas():
    keys = ([(608, 800)] * 10 + [(800, 608)] * 8 + [(640, 1024)] * 2
            + [(1024, 640)] * 1)
    co = BucketCoalescer(keys, 3, CANVAS)
    assert co.active
    assert set(co.kept) == {(608, 800), (800, 608), CANVAS}
    # dropped buckets map to their min-area kept superset: nothing but
    # the canvas covers (640, 1024)
    assert co.map((640, 1024)) == CANVAS
    assert co.map((1024, 640)) == CANVAS
    # kept buckets map to themselves
    assert co.map((608, 800)) == (608, 800)


def test_canvas_among_most_frequent_spends_no_extra_slot():
    """When the full canvas is itself a frequent record bucket it must
    not consume one of the max_variants-1 frequency slots — the kept set
    always has exactly max_variants shapes (regression: datasets with
    many max-size images kept one variant fewer than allowed)."""
    keys = ([CANVAS] * 10 + [(608, 800)] * 8 + [(800, 608)] * 6
            + [(640, 896)] * 2)
    co = BucketCoalescer(keys, 3, CANVAS)
    assert co.active
    assert set(co.kept) == {CANVAS, (608, 800), (800, 608)}
    assert len(co.kept) == 3


def test_min_area_superset_choice():
    keys = ([(608, 800)] * 10 + [(640, 896)] * 8 + [(608, 832)] * 1
            + [(992, 992)] * 1)
    co = BucketCoalescer(keys, 3, CANVAS)
    assert set(co.kept) == {(608, 800), (640, 896), CANVAS}
    # (608, 832) fits inside (640, 896) (area 573k) — not the canvas
    assert co.map((608, 832)) == (640, 896)


def test_batch_max_stability():
    """map(componentwise max of two keys with the same mapped bucket)
    equals that bucket — mixed members of one group never create a new
    variant."""
    rs = np.random.RandomState(0)
    keys = [(32 * rs.randint(10, 33), 32 * rs.randint(10, 33))
            for _ in range(200)]
    co = BucketCoalescer(keys, 5, CANVAS)
    assert co.active
    for a in keys[:40]:
        for b in keys[:40]:
            if co.map(a) == co.map(b):
                m = (max(a[0], b[0]), max(a[1], b[1]))
                assert co.map(m) == co.map(a)


def test_pack_batch_images_pads_to_mapped_bucket():
    bucketing.set_bucket_multiple(32)
    co = BucketCoalescer(
        [(608, 800)] * 10 + [(608, 832)] * 1 + [(640, 896)] * 5
        + [(992, 992)] * 1,
        3, CANVAS,
    )
    images = np.zeros((2, 1024, 1024, 3), np.uint8)
    ts = np.asarray([[600, 830], [500, 700]], np.int32)  # fine (608, 832)
    assert pack_batch_images(images, ts, co).shape == (2, 640, 896, 3)
    # without the coalescer: the fine bucket
    assert pack_batch_images(images, ts).shape == (2, 608, 832, 3)


class _SynthDs:
    """Duck-typed DetectionDataset: canvas-shaped images whose true
    regions cycle through three shapes."""

    canvas_size = (512, 512)

    def __init__(self, shapes, n):
        self._shapes = [shapes[i % len(shapes)] for i in range(n)]

    def __len__(self):
        return len(self._shapes)

    def peek_target_shape(self, i):
        return self._shapes[i]

    def get(self, i):
        th, tw = self._shapes[i]
        img = np.zeros(self.canvas_size + (3,), np.uint8)
        img[:th, :tw] = 1
        return {
            "image": img,
            "true_shape": np.asarray([th, tw], np.int32),
            "gt_boxes": np.zeros((4, 4), np.float32),
            "gt_classes": np.zeros((4,), np.int32),
            "gt_mask": np.zeros((4,), bool),
            "source_id": str(i),
        }


def test_batches_bounded_variant_set():
    bucketing.set_bucket_multiple(32)
    # fine buckets: (224, 320) x12, (256, 352) x6, (320, 224) x2
    ds = _SynthDs([(220, 300)] * 6 + [(250, 340)] * 3 + [(310, 200)] * 1,
                  n=20)
    shapes = set()
    for b in batches(ds, batch_size=2, shuffle=True, epochs=2,
                     pack_images=True, max_bucket_variants=2):
        shapes.add(b["image"].shape[1:3])
    kept = set(
        achievable_bucket_shapes(ds, 2, max_bucket_variants=2)
    )
    assert kept == {(224, 320), (512, 512)}
    assert shapes <= kept
    # the dominant bucket actually occurs (the win is preserved)
    assert (224, 320) in shapes


def test_batches_unbounded_matches_fine_buckets():
    bucketing.set_bucket_multiple(32)
    ds = _SynthDs([(220, 300)] * 6 + [(250, 340)] * 3, n=18)
    shapes = set()
    for b in batches(ds, batch_size=2, shuffle=False, epochs=1,
                     pack_images=True):
        shapes.add(b["image"].shape[1:3])
    assert shapes == {(224, 320), (256, 352)}


def test_batches_batch1_still_bounded():
    """batch_size 1 forces aspect grouping off, but the variant bound
    must still hold — per-record buckets fan out jit variants exactly
    the same way (this was a silent-ignore hole)."""
    bucketing.set_bucket_multiple(32)
    ds = _SynthDs([(220, 300)] * 6 + [(250, 340)] * 3 + [(310, 200)] * 1,
                  n=20)
    shapes = set()
    for b in batches(ds, batch_size=1, shuffle=False, epochs=1,
                     pack_images=True, max_bucket_variants=2):
        shapes.add(b["image"].shape[1:3])
    kept = set(achievable_bucket_shapes(ds, 1, max_bucket_variants=2))
    assert shapes <= kept
    assert (224, 320) in shapes
    assert len(shapes) <= 2


def test_grain_loader_batch1_and_ungrouped_bounded():
    """make_grain_loader honors the bound at batch_size 1 (grouping off)
    and with aspect_grouping explicitly disabled at batch > 1."""
    pytest.importorskip("grain")
    from mtlx.data.grain_loader import make_grain_loader

    bucketing.set_bucket_multiple(32)
    ds = _SynthDs([(220, 300)] * 10 + [(250, 340)] * 4 + [(310, 200)] * 2,
                  n=16)
    for bs, grouping in ((1, None), (2, False)):
        shapes = set()
        for b in make_grain_loader(
            ds, batch_size=bs, shuffle=False, num_epochs=1, worker_count=0,
            pack_images=True, aspect_grouping=grouping,
            max_bucket_variants=2,
        ):
            shapes.add(b["image"].shape[1:3])
        kept = set(achievable_bucket_shapes(ds, bs, max_bucket_variants=2))
        assert shapes <= kept, (bs, grouping, shapes, kept)
        assert (224, 320) in shapes or bs > 1, (bs, grouping, shapes)


class _SynthBoxDs(_SynthDs):
    """_SynthDs with real groundtruth boxes so crop geometry can fire."""

    def get(self, i):
        s = super().get(i)
        th, tw = self._shapes[i]
        s["gt_boxes"] = np.zeros((4, 4), np.float32)
        s["gt_boxes"][0] = [th * 0.3, tw * 0.3, th * 0.6, tw * 0.6]
        s["gt_mask"] = np.asarray([True, False, False, False])
        return s


def _crop_hg(canvas):
    from mtlx.data.host_geometry import HostGeometry

    return HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.3,
                                "min_area": 0.2, "max_area": 0.5,
                                "overlap_thresh": 0.3})],
        300, 500, canvas,
    )


def test_host_geometry_ranking_uses_post_shapes():
    """With host geometry, the kept set ranks from sampled post-geometry
    pack buckets, not pre-augmentation record buckets: a dataset whose
    record bucket IS the canvas must still keep the dominant post-crop
    shapes (otherwise every batch pads to the canvas and the
    fine-granularity win is lost — ADVICE r4)."""
    from mtlx.data.loader import build_bucket_coalescer

    bucketing.set_bucket_multiple(32)
    ds = _SynthBoxDs([(512, 512)], n=24)
    hg = _crop_hg(ds.canvas_size)
    co = build_bucket_coalescer(ds, 4, host_geometry=hg)
    non_canvas = [k for k in co.kept if k != ds.canvas_size]
    assert non_canvas, co.kept
    # deterministic: a second build yields the identical kept set
    co2 = build_bucket_coalescer(ds, 4, host_geometry=hg)
    assert co.kept == co2.kept


def test_batches_host_geometry_bounded_and_consistent():
    """batches() with host geometry: every emitted shape is in the kept
    set achievable_bucket_shapes reports for the same arguments (the
    precompile set covers the runtime variants)."""
    bucketing.set_bucket_multiple(32)
    ds = _SynthBoxDs([(512, 512)], n=24)
    hg = _crop_hg(ds.canvas_size)
    kept = set(achievable_bucket_shapes(
        ds, 2, host_geometry=hg, max_bucket_variants=3
    ))
    assert len(kept) <= 3
    shapes = set()
    for b in batches(ds, batch_size=2, shuffle=False, epochs=2,
                     pack_images=True, host_geometry=hg,
                     max_bucket_variants=3):
        shapes.add(b["image"].shape[1:3])
    assert shapes <= kept, (shapes, kept)


def test_grain_bucket_batched_with_coalescer():
    from mtlx.data.grain_loader import _bucket_batched

    bucketing.set_bucket_multiple(32)
    ds = _SynthDs([(220, 300)] * 10 + [(250, 340)] * 4 + [(310, 200)] * 2,
                  n=16)
    co = BucketCoalescer(
        [tuple(
            bucketing.bucket_extent(e, c)
            for e, c in zip(ds.peek_target_shape(i), ds.canvas_size)
        ) for i in range(len(ds))],
        2, ds.canvas_size,
    )
    stream = (ds.get(i) for i in range(len(ds)))
    shapes = set()
    for b in _bucket_batched(stream, ds.canvas_size, 2, coalescer=co):
        shapes.add(b["image"].shape[1:3])
    assert shapes <= set(co.kept)
    assert (224, 320) in shapes
