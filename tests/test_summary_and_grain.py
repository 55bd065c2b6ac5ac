"""Summary writer event-file round-trip (via our own TFRecord reader) and
the grain loader path."""

import os

import numpy as np

from mtlx.config.protos import event_pb2
from mtlx.data.tfrecord import read_records
from mtlx.utils.summary_writer import SummaryWriter


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
