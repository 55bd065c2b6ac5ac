"""Summary writer event-file round-trip (via our own TFRecord reader) and
the grain loader path."""

import os

import numpy as np

from mtlx.config.protos import event_pb2
from mtlx.data.tfrecord import read_records
from mtlx.utils.summary_writer import SummaryWriter
import pytest


def test_summary_writer_roundtrip(tmp_path):
    d = str(tmp_path)
    w = SummaryWriter(d)
    w.scalar("loss", 2.5, step=3)
    w.image("im", np.zeros((5, 6, 3), np.uint8), step=3)
    w.close()
    files = [f for f in os.listdir(d) if f.startswith("events.out.tfevents")]
    assert len(files) == 1
    events = []
    for rec in read_records(os.path.join(d, files[0]), verify_crc=True):
        ev = event_pb2.Event()
        ev.ParseFromString(rec)
        events.append(ev)
    assert events[0].file_version == "brain.Event:2"
    scalar = events[1].summary.value[0]
    assert scalar.tag == "loss" and abs(scalar.simple_value - 2.5) < 1e-6
    assert events[1].step == 3
    image = events[2].summary.value[0]
    assert image.image.height == 5 and image.image.width == 6
    assert image.image.encoded_image_string.startswith(b"\x89PNG")


@pytest.mark.smoke
def test_grain_loader_batches(tmp_path):
    import io

    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.data.grain_loader import make_grain_loader
    from mtlx.data.loader import DetectionDataset

    record = str(tmp_path / "g.record")
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(5):
            buf = io.BytesIO()
            Image.fromarray(np.full((20, 20, 3), i * 40, np.uint8)).save(
                buf, format="JPEG"
            )
            w.write(
                build_example(
                    buf.getvalue(), b"jpeg", 20, 20, f"g{i}.jpg",
                    np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32), [1], ["a"],
                ).SerializeToString()
            )
    ds = DetectionDataset(
        [record], canvas_size=(32, 32),
        resizer=("fixed", {"height": 32, "width": 32}), max_boxes=3,
    )
    batches = list(make_grain_loader(ds, batch_size=2, num_epochs=1, seed=1))
    assert len(batches) == 2  # 5 // 2, remainder dropped
    assert batches[0]["image"].shape == (2, 32, 32, 3)
    assert batches[0]["gt_boxes"].shape == (2, 3, 4)
    assert batches[0]["gt_mask"].dtype == bool


def test_device_prefetch_stops_abandoned_producer(tmp_path):
    """An early-stopped consumer must shut the producer thread down —
    an abandoned producer kept pulling from the source iterator and raced
    later readers of the same dataset's file handles (seek corruption)."""
    import time

    from mtlx.data.loader import device_prefetch

    produced = []

    def src():
        i = 0
        while True:
            produced.append(i)
            i += 1
            yield {"image": np.zeros((1, 4, 4, 3), np.uint8),
                   "source_id": ["x"]}

    it = device_prefetch(src())
    for j, (batch, ids) in enumerate(it):
        assert batch["image"].shape == (1, 4, 4, 3)
        if j >= 2:
            break
    it.close()
    n_at_close = len(produced)
    time.sleep(0.5)
    # at most one in-flight item after close; a leaky producer would have
    # produced dozens more in 0.5s
    assert len(produced) <= n_at_close + 2


def test_device_prefetch_sequential_iterators_share_dataset(tmp_path):
    """Two prefetch iterators over the same dataset in sequence decode
    cleanly (regression: the first iterator's leaked producer corrupted
    the second's record reads)."""
    import io

    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.data.loader import DetectionDataset, batches, device_prefetch

    record = str(tmp_path / "p.record")
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(6):
            buf = io.BytesIO()
            Image.fromarray(np.full((20, 20, 3), i * 30, np.uint8)).save(
                buf, format="JPEG"
            )
            w.write(
                build_example(
                    buf.getvalue(), b"jpeg", 20, 20, f"p{i}.jpg",
                    np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32), [1], ["a"],
                ).SerializeToString()
            )
    ds = DetectionDataset(
        [record], canvas_size=(32, 32),
        resizer=("fixed", {"height": 32, "width": 32}), max_boxes=3,
    )
    for trial in range(3):
        it = device_prefetch(batches(ds, 2, shuffle=True, seed=trial))
        for j, (batch, ids) in enumerate(it):
            assert batch["image"].shape == (2, 32, 32, 3)
            if j >= 1:
                break  # abandon mid-epoch on purpose
        it.close()


def test_device_prefetch_stats_decomposition():
    """PrefetchStats records one (host, put) sample per produced batch
    and one stall sample per consumer pull, and the summary carries the
    per-phase means the bench's e2e overlap report is built from."""
    from mtlx.data.loader import PrefetchStats, device_prefetch

    def src():
        for _ in range(4):
            yield {"image": np.zeros((1, 4, 4, 3), np.uint8),
                   "source_id": ["x"]}

    stats = PrefetchStats()
    it = device_prefetch(src(), stats=stats)
    n = sum(1 for _ in it)
    assert n == 4
    assert len(stats.host) == 4 and len(stats.put) == 4
    assert len(stats.stall) == 5  # 4 batches + the END pull
    s = stats.summary()
    assert s["batches"] == 5
    assert s["host_s_per_batch"] >= 0 and s["put_s_per_batch"] >= 0
    assert all(v >= 0 for v in stats.stall)


def test_tf1_resize_mode(tmp_path):
    """DetectionDataset(tf1_resize=True) decodes with the TF1
    resize_images convention (cross-checked against real TF in
    tools/tf_compat_check.py); the two conventions differ measurably."""
    import io

    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.data.loader import DetectionDataset, legacy_resize_bilinear

    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, (40, 60, 3), np.uint8)
    record = str(tmp_path / "t.record")
    with tfrecord.TFRecordWriter(record) as w:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=100)
        w.write(build_example(
            buf.getvalue(), b"jpeg", 40, 60, "t.jpg",
            np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32), [1], ["a"],
        ).SerializeToString())
    kw = dict(canvas_size=(32, 32),
              resizer=("fixed", {"height": 20, "width": 30}), max_boxes=2)
    a = DetectionDataset([record], **kw).get(0)["image"][:20, :30]
    b = DetectionDataset([record], tf1_resize=True, **kw).get(0)["image"][:20, :30]
    assert not np.array_equal(a, b)  # conventions differ on real content
    # the tf1 path agrees with the numpy legacy reference on the decoded px
    decoded = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    want = legacy_resize_bilinear(decoded, 20, 30)
    assert np.abs(b.astype(int) - want.astype(int)).max() <= 1
    # get_batch (native pool) honors the flag too
    ds_tf1 = DetectionDataset([record], tf1_resize=True, **kw)
    bb = ds_tf1.get_batch([0], decode_threads=2)[0]["image"][:20, :30]
    np.testing.assert_array_equal(bb, b)


def test_grain_loader_multiprocess_workers(tmp_path):
    """worker_count > 0 pickles the data source into worker processes —
    regression for DetectionDataset holding an unpicklable threading.Lock
    (each worker now recreates its lock/file handles on unpickle)."""
    import io
    import pickle

    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.data.grain_loader import make_grain_loader
    from mtlx.data.loader import DetectionDataset

    record = str(tmp_path / "gw.record")
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(6):
            buf = io.BytesIO()
            Image.fromarray(np.full((20, 20, 3), i * 30, np.uint8)).save(
                buf, format="JPEG"
            )
            w.write(
                build_example(
                    buf.getvalue(), b"jpeg", 20, 20, f"w{i}.jpg",
                    np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32), [1], ["a"],
                ).SerializeToString()
            )
    ds = DetectionDataset(
        [record], canvas_size=(32, 32),
        resizer=("fixed", {"height": 32, "width": 32}), max_boxes=3,
    )
    # the property the worker path depends on
    clone = pickle.loads(pickle.dumps(ds))
    assert clone._read_lock is not None and clone._handles == {}
    np.testing.assert_array_equal(clone.get(0)["image"], ds.get(0)["image"])

    batches = list(make_grain_loader(
        ds, batch_size=2, num_epochs=1, seed=1, worker_count=1
    ))
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 32, 32, 3)


def test_grain_workers_with_host_geometry(tmp_path):
    """The production keep-aspect composition: multiprocess workers x
    host-drawn crop geometry x packed transfer. HostGeometry must pickle
    into the worker, run per-visit deterministically, and emit the aug_*
    fields the device window-resample consumes."""
    import io

    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.data.grain_loader import make_grain_loader
    from mtlx.data.host_geometry import HostGeometry
    from mtlx.data.loader import DetectionDataset

    record = str(tmp_path / "hgw.record")
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(6):
            buf = io.BytesIO()
            Image.fromarray(
                np.full((40, 60, 3), 20 + i * 30, np.uint8)
            ).save(buf, format="JPEG")
            w.write(
                build_example(
                    buf.getvalue(), b"jpeg", 40, 60, f"h{i}.jpg",
                    np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32), [1], ["a"],
                ).SerializeToString()
            )
    ds = DetectionDataset(
        [record], canvas_size=(64, 64),
        resizer=("keep_aspect", {"min_dimension": 48, "max_dimension": 64}),
        max_boxes=3,
    )
    hg = HostGeometry(
        [("random_crop_image",
          dict(min_object_covered=0.5, min_area=0.5, max_area=1.0))],
        48, 64, (64, 64),
    )

    def collect():
        return list(make_grain_loader(
            ds, batch_size=2, num_epochs=1, seed=3, worker_count=1,
            pack_images=True, host_geometry=hg,
        ))

    batches = collect()
    assert len(batches) == 3
    for b in batches:
        for f in ("aug_window", "aug_src_shape", "aug_pad_color"):
            assert f in b, sorted(b)
        assert "pack_shape" not in b  # host-only field must not ship
        assert b["image"].shape[1] <= 64 and b["image"].shape[2] <= 64
        # post-crop keep-aspect shapes stay within the canvas
        assert (b["true_shape"] <= 64).all()
        assert np.isfinite(b["aug_window"]).all()
    # at least one visit actually cropped (window != full source frame)
    windows = np.concatenate([b["aug_window"] for b in batches])
    srcs = np.concatenate([b["aug_src_shape"] for b in batches])
    full = (
        (windows[:, 0] == 0) & (windows[:, 1] == 0)
        & (windows[:, 2] == srcs[:, 0]) & (windows[:, 3] == srcs[:, 1])
    )
    assert not full.all()
    # per-visit rng is seeded by the sampler: same seed -> same stream
    again = collect()
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(a["aug_window"], b["aug_window"])
        np.testing.assert_array_equal(a["true_shape"], b["true_shape"])


def test_grain_aspect_grouping_honors_pack_images_false(tmp_path):
    """--pack_transfer 0 means full-canvas transfer even when aspect
    grouping batches by bucket (regression: the grouped collate packed
    unconditionally, silently overriding the flag)."""
    import io

    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from mtlx.data.grain_loader import make_grain_loader
    from mtlx.data.loader import DetectionDataset

    record = str(tmp_path / "pf.record")
    with tfrecord.TFRecordWriter(record) as w:
        for i, (h0, w0) in enumerate([(30, 60), (60, 30)] * 2):
            buf = io.BytesIO()
            Image.fromarray(np.full((h0, w0, 3), 50, np.uint8)).save(
                buf, format="JPEG"
            )
            w.write(build_example(
                buf.getvalue(), b"jpeg", h0, w0, f"p{i}.jpg",
                np.asarray([[0.1, 0.1, 0.9, 0.9]], np.float32), [1], ["a"],
            ).SerializeToString())
    ds = DetectionDataset(
        [record], canvas_size=(256, 256),
        resizer=("keep_aspect", {"min_dimension": 100, "max_dimension": 200}),
        max_boxes=3,
    )
    full = list(make_grain_loader(
        ds, batch_size=2, num_epochs=1, seed=0,
        pack_images=False, aspect_grouping=True,
    ))
    assert full and all(b["image"].shape[1:3] == (256, 256) for b in full)
    assert all("pack_shape" not in b for b in full)
    packed = list(make_grain_loader(
        ds, batch_size=2, num_epochs=1, seed=0,
        pack_images=True, aspect_grouping=True,
    ))
    assert any(b["image"].shape[1:3] != (256, 256) for b in packed)
