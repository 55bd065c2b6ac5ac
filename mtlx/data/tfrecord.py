"""TFRecord container I/O — dependency-free reader/writer.

The reference stores datasets as TFRecord files of serialized
`tf.train.Example` protos (SURVEY.md §3.5). This module implements the
container format directly (no TensorFlow):

    each record = | uint64 length | uint32 masked_crc32c(length_bytes) |
                  | data bytes    | uint32 masked_crc32c(data)         |

so datasets produced for the reference load here unchanged, and records
written here load in TF tooling. CRC32C (Castagnoli) is implemented with a
256-entry table; `mtlx/data/_crc32c.c` provides an optional C fast path
(see build_ext in tools/build_native.py) — the Python fallback is fine for
reading, the C path matters when writing COCO-scale datasets.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, Optional

# ---------------------------------------------------------------------------
# CRC32C
# ---------------------------------------------------------------------------

_POLY = 0x82F63B78


def _make_table():
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _POLY if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _make_table()

_native_crc = None
try:  # optional C extension, lazily compiled when missing
    from mtlx.data.native_build import ensure_native as _ensure_native

    _ext = _ensure_native("_crc32c_ext")
    if _ext is not None:
        _native_crc = _ext.crc32c
except Exception:  # pragma: no cover - extension genuinely optional
    pass


def crc32c(data: bytes, value: int = 0) -> int:
    if _native_crc is not None:
        return _native_crc(data, value)
    crc = value ^ 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Reader / writer
# ---------------------------------------------------------------------------


class TFRecordWriter:
    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        length = struct.pack("<Q", len(record))
        self._f.write(length)
        self._f.write(struct.pack("<I", _masked_crc(length)))
        self._f.write(record)
        self._f.write(struct.pack("<I", _masked_crc(record)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Yield raw record payloads from one TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            if verify_crc:
                (crc,) = struct.unpack("<I", header[8:12])
                if _masked_crc(header[:8]) != crc:
                    raise IOError(f"corrupt length crc in {path}")
            data = f.read(length)
            footer = f.read(4)
            if len(data) < length or len(footer) < 4:
                raise IOError(f"truncated record in {path}")
            if verify_crc:
                (crc,) = struct.unpack("<I", footer)
                if _masked_crc(data) != crc:
                    raise IOError(f"corrupt data crc in {path}")
            yield data


def record_index(path: str) -> List[int]:
    """Byte offsets of every record — enables O(1) random access for
    shuffling without loading the file (grain-style index)."""
    offsets = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos < size:
            offsets.append(pos)
            f.seek(pos)
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            pos += 12 + length + 4
    return offsets


def read_record_at(f, offset: int) -> bytes:
    f.seek(offset)
    (length,) = struct.unpack("<Q", f.read(8))
    f.seek(offset + 12)
    return f.read(length)
