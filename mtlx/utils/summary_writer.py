"""TensorBoard-compatible summary writer (reference §6.5: train scalars,
eval per-class AP, detection images all land in TensorBoard).

Writes real event files (TFRecord-framed Event protos with the standard
`events.out.tfevents.*` naming and `brain.Event:2` version record) using
our dependency-free TFRecord writer — no TensorFlow required, readable by
stock TensorBoard.
"""

from __future__ import annotations

import io
import os
import socket
import time
from typing import Optional

from mtlx.config.protos import event_pb2
from mtlx.data.tfrecord import TFRecordWriter


class SummaryWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._writer = TFRecordWriter(os.path.join(logdir, fname))
        first = event_pb2.Event(wall_time=time.time(), file_version="brain.Event:2")
        self._writer.write(first.SerializeToString())

    def scalar(self, tag: str, value: float, step: int) -> None:
        ev = event_pb2.Event(wall_time=time.time(), step=int(step))
        v = ev.summary.value.add()
        v.tag = tag
        v.simple_value = float(value)
        self._writer.write(ev.SerializeToString())

    def image(self, tag: str, image_uint8, step: int) -> None:
        """image_uint8: [H, W, 3] numpy uint8 (PNG-encoded into the event)."""
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(image_uint8).save(buf, format="PNG")
        ev = event_pb2.Event(wall_time=time.time(), step=int(step))
        v = ev.summary.value.add()
        v.tag = tag
        v.image.height = int(image_uint8.shape[0])
        v.image.width = int(image_uint8.shape[1])
        v.image.colorspace = 3
        v.image.encoded_image_string = buf.getvalue()
        self._writer.write(ev.SerializeToString())

    def flush(self) -> None:
        self._writer._f.flush()

    def close(self) -> None:
        self._writer.close()
