"""Native fused JPEG decode+resize (mtlx/data/_imgcodec.cc) vs the PIL
reference path: decode parity, resize agreement, batch/thread
determinism, loader integration + fallback."""

import io

import numpy as np
import pytest

from mtlx.data import loader as loader_lib
from mtlx.data.native_build import ensure_native

# lazily compiled on import (native_build.py); skip only when the build
# itself is impossible on this box (no toolchain / no libjpeg)
imgcodec = ensure_native("_imgcodec_ext")
if imgcodec is None:  # pragma: no cover - depends on toolchain
    pytest.skip(
        "native imgcodec unavailable and could not be built",
        allow_module_level=True,
    )


def _jpeg(arr, quality=92):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _smooth(h, w, seed=0):
    from PIL import Image

    rs = np.random.RandomState(seed)
    small = rs.uniform(0, 255, (max(2, h // 8), max(2, w // 8), 3))
    return np.asarray(
        Image.fromarray(small.astype(np.uint8)).resize((w, h), Image.BILINEAR)
    )


def test_dims_and_full_decode_match_pil():
    from PIL import Image

    arr = _smooth(48, 64)
    blob = _jpeg(arr)
    assert imgcodec.dims(blob) == (48, 64)
    pixels, sh, sw, oh, ow = imgcodec.decode(blob)
    assert (sh, sw, oh, ow) == (48, 64, 48, 64)
    dec = np.frombuffer(pixels, np.uint8).reshape(48, 64, 3)
    ref = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    assert float(np.abs(dec.astype(int) - ref.astype(int)).mean()) < 2.0


def test_grayscale_jpeg_decodes_rgb():
    from PIL import Image

    g = (np.arange(32 * 40) % 200).astype(np.uint8).reshape(32, 40)
    buf = io.BytesIO()
    Image.fromarray(g, "L").save(buf, format="JPEG")
    pixels, sh, sw, oh, ow = imgcodec.decode(buf.getvalue())
    dec = np.frombuffer(pixels, np.uint8).reshape(32, 40, 3)
    # replicated channels
    assert float(np.abs(dec[..., 0].astype(int) - dec[..., 1].astype(int)).mean()) < 1.0


def test_fused_upscale_matches_pil_bilinear():
    from PIL import Image

    arr = _smooth(40, 50, seed=1)
    blob = _jpeg(arr)
    pixels, _, _, oh, ow = imgcodec.decode(blob, 80, 100)
    dec = np.frombuffer(pixels, np.uint8).reshape(80, 100, 3)
    full = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    ref = np.asarray(Image.fromarray(full).resize((100, 80), Image.BILINEAR))
    assert float(np.abs(dec.astype(int) - ref.astype(int)).mean()) < 3.0


def test_fused_downscale_reasonable():
    # PIL downscale area-filters while the native path is pure bilinear on
    # a DCT-scaled decode, so compare statistics rather than pixels
    from PIL import Image

    arr = _smooth(256, 320, seed=2)
    blob = _jpeg(arr)
    pixels, sh, sw, oh, ow = imgcodec.decode(blob, 64, 80)
    assert (sh, sw, oh, ow) == (256, 320, 64, 80)
    dec = np.frombuffer(pixels, np.uint8).reshape(64, 80, 3).astype(np.float64)
    full = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    ref = np.asarray(
        Image.fromarray(full).resize((80, 64), Image.BILINEAR)
    ).astype(np.float64)
    assert abs(dec.mean() - ref.mean()) < 4.0
    assert float(np.abs(dec - ref).mean()) < 12.0


def test_decode_batch_threads_deterministic():
    blobs = [_jpeg(_smooth(60 + 8 * i, 80, seed=i)) for i in range(6)]
    ths = [32] * 6
    tws = [40] * 6
    seq = imgcodec.decode_batch(blobs, ths, tws, 1)
    par = imgcodec.decode_batch(blobs, ths, tws, 4)
    for a, b in zip(seq, par):
        assert a == b
    single = [imgcodec.decode(blob, 32, 40) for blob in blobs]
    for a, b in zip(seq, single):
        assert a == b


def test_corrupt_jpeg_raises():
    with pytest.raises(ValueError):
        imgcodec.decode(b"\xff\xd8 this is not a jpeg")


def test_loader_native_path_matches_pil_path(tmp_path, monkeypatch):
    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example

    record = str(tmp_path / "t.record")
    arr = _smooth(120, 160, seed=3)
    with tfrecord.TFRecordWriter(record) as w:
        boxes = np.asarray([[0.1, 0.2, 0.7, 0.9]], np.float32)
        ex = build_example(_jpeg(arr), b"jpeg", 120, 160, "a.jpg", boxes, [1], ["a"])
        w.write(ex.SerializeToString())

    def make():
        return loader_lib.DetectionDataset(
            [record], canvas_size=(96, 96),
            resizer=("keep_aspect", {"min_dimension": 64, "max_dimension": 96}),
            max_boxes=4,
        ).get(0)

    native = make()
    monkeypatch.setattr(loader_lib, "_imgcodec", None)
    pil = make()
    assert native["image"].shape == pil["image"].shape
    np.testing.assert_array_equal(native["true_shape"], pil["true_shape"])
    np.testing.assert_array_equal(native["original_shape"], pil["original_shape"])
    np.testing.assert_allclose(native["gt_boxes"], pil["gt_boxes"], atol=1e-5)
    diff = np.abs(
        native["image"].astype(int) - pil["image"].astype(int)
    ).mean()
    assert diff < 4.0, diff


def test_get_batch_matches_get(tmp_path):
    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example

    record = str(tmp_path / "b.record")
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(5):
            arr = _smooth(100 + 10 * i, 140, seed=i)
            boxes = np.asarray([[0.1, 0.1, 0.8, 0.8]], np.float32)
            ex = build_example(
                _jpeg(arr), b"jpeg", arr.shape[0], 140, f"{i}.jpg",
                boxes, [1], ["a"],
            )
            w.write(ex.SerializeToString())
    ds = loader_lib.DetectionDataset(
        [record], canvas_size=(96, 96),
        resizer=("keep_aspect", {"min_dimension": 64, "max_dimension": 96}),
        max_boxes=4,
    )
    singles = [ds.get(i) for i in range(5)]
    batched = ds.get_batch(list(range(5)), decode_threads=3)
    for a, b in zip(singles, batched):
        assert set(a) == set(b)
        for k in a:
            if k == "source_id":
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_batches_with_decode_threads(tmp_path):
    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example

    record = str(tmp_path / "c.record")
    with tfrecord.TFRecordWriter(record) as w:
        for i in range(4):
            arr = _smooth(80, 80, seed=i)
            ex = build_example(
                _jpeg(arr), b"jpeg", 80, 80, f"{i}.jpg",
                np.asarray([[0.2, 0.2, 0.6, 0.6]], np.float32), [1], ["a"],
            )
            w.write(ex.SerializeToString())
    ds = loader_lib.DetectionDataset(
        [record], canvas_size=(64, 64),
        resizer=("fixed", {"height": 64, "width": 64}), max_boxes=4,
    )
    b0 = next(loader_lib.batches(ds, 4, shuffle=False, decode_threads=2))
    b1 = next(loader_lib.batches(ds, 4, shuffle=False, decode_threads=0))
    np.testing.assert_array_equal(b0["image"], b1["image"])
    np.testing.assert_array_equal(b0["gt_boxes"], b1["gt_boxes"])


def test_corrupt_extension_rebuilds():
    """A corrupt installed .so (interrupted build, bad copy) must not
    permanently disable the native path: _build probes an existing
    artifact and rebuilds it when it fails to load (regression: an
    existing file was trusted unconditionally -> silent PIL fallback
    forever)."""
    import importlib
    import os
    import sys
    import sysconfig

    from mtlx.data import native_build

    name = "_crc32c_ext"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(os.path.dirname(native_build.__file__),
                       f"{name}{suffix}")
    assert native_build._build(name) and os.path.exists(out)
    # simulate a fresh process hitting a corrupt artifact: the already-
    # loaded module would make the probe vacuous (and ensure_native would
    # never reach _build in that process anyway)
    saved = sys.modules.pop(f"mtlx.data.{name}", None)
    try:
        # corrupt via a NEW inode (os.replace), like a real interrupted
        # copy would: truncating the mapped .so in place would SIGBUS the
        # running process, which is exactly why installs use os.replace
        garbage = out + ".garbage"
        with open(garbage, "wb") as f:
            f.write(b"not a shared object")
        os.replace(garbage, out)
        native_build._failed.discard(name)
        assert native_build._build(name)
        importlib.invalidate_caches()
        mod = importlib.import_module(f"mtlx.data.{name}")
        assert mod.crc32c(b"123456789") is not None
    finally:
        if saved is not None:
            sys.modules[f"mtlx.data.{name}"] = saved
