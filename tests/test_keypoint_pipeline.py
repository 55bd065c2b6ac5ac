"""Keypoint data path end to end: wire decode -> loader -> flip -> coder
(reference core/keypoint_ops.py + decoder keypoint fields; round-1 gap:
keypoint ops/coder existed but were unreachable from the pipeline)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.data.example_decoder import (
    InputDataFields,
    build_example,
    decode_example,
)


def _png(image_array):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(image_array).save(buf, format="PNG")
    return buf.getvalue()


def _example_with_keypoints(h=64, w=64):
    img = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    boxes = np.asarray([[0.125, 0.125, 0.625, 0.625],
                        [0.5, 0.5, 1.0, 1.0]], np.float32)
    # 3 keypoints per box, normalized (y, x)
    kps = np.asarray(
        [[[0.2, 0.2], [0.3, 0.5], [0.5, 0.3]],
         [[0.6, 0.6], [0.7, 0.9], [0.9, 0.7]]], np.float32
    )
    return build_example(
        _png(img), b"png", h, w, "im0", boxes, [1, 2], ["a", "b"],
        keypoints=kps,
    ), kps


def test_keypoint_wire_roundtrip():
    ex, kps = _example_with_keypoints()
    out = decode_example(ex.SerializeToString())
    got = out[InputDataFields.groundtruth_keypoints]
    assert got.shape == (2, 3, 2)
    np.testing.assert_allclose(got, kps, rtol=1e-6)


def test_loader_carries_absolute_keypoints(tmp_path):
    from mtlx.data import tfrecord
    from mtlx.data.loader import DetectionDataset

    ex, kps = _example_with_keypoints(h=64, w=64)
    path = str(tmp_path / "k.record")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    ds = DetectionDataset(
        [path], canvas_size=(64, 64), resizer=("fixed", {"height": 64, "width": 64}),
        max_boxes=4, num_keypoints=3,
    )
    s = ds.get(0)
    gk = s["gt_keypoints"]
    assert gk.shape == (4, 3, 2)
    # absolute canvas px = normalized * 64, same frame as the boxes
    np.testing.assert_allclose(gk[:2], kps * 64.0, rtol=1e-5)
    assert gk[2:].sum() == 0  # padding


def test_flip_transforms_keypoints_with_boxes():
    from mtlx.data import preprocessor as prep

    kp = jnp.asarray([[[10.0, 8.0], [20.0, 24.0]]])  # [G=1, P=2, 2]
    sample = {
        "image": jnp.zeros((32, 32, 3)),
        "boxes": jnp.asarray([[8.0, 4.0, 24.0, 28.0]]),
        "classes": jnp.zeros((1,), jnp.int32),
        "mask": jnp.asarray([True]),
        "true_shape": jnp.asarray([32, 32], jnp.int32),
        "keypoints": kp,
    }
    out = prep.random_horizontal_flip(jax.random.PRNGKey(0), sample,
                                      probability=1.0)
    got = np.asarray(out["keypoints"])[0]
    # x' = w - x; y unchanged
    np.testing.assert_allclose(got, [[10.0, 24.0], [20.0, 8.0]])
    # the keypoints stay inside the flipped box
    b = np.asarray(out["boxes"])[0]
    assert (got[:, 1] >= b[1]).all() and (got[:, 1] <= b[3]).all()

    out_v = prep.random_vertical_flip(jax.random.PRNGKey(0), sample,
                                      probability=1.0)
    got_v = np.asarray(out_v["keypoints"])[0]
    np.testing.assert_allclose(got_v, [[22.0, 8.0], [12.0, 24.0]])


def test_keypoint_coder_through_pipeline(tmp_path):
    """Loader output -> keypoint box coder encode/decode round trip via the
    config-built coder (the component is reachable end to end)."""
    from google.protobuf import text_format

    from mtlx.builders.component_builders import build_box_coder
    from mtlx.config.protos import components_pb2
    from mtlx.data import tfrecord
    from mtlx.data.loader import DetectionDataset

    ex, _ = _example_with_keypoints()
    path = str(tmp_path / "k.record")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    ds = DetectionDataset(
        [path], canvas_size=(64, 64), resizer=("fixed", {"height": 64, "width": 64}),
        max_boxes=2, num_keypoints=3,
    )
    s = ds.get(0)

    proto = components_pb2.BoxCoder()
    text_format.Parse("keypoint_box_coder { num_keypoints: 3 }", proto)
    coder = build_box_coder(proto)
    assert coder.code_size == 4 + 6

    anchors = jnp.asarray([[6.0, 6.0, 42.0, 42.0], [30.0, 30.0, 64.0, 64.0]])
    boxes = jnp.asarray(s["gt_boxes"][:2])
    kps = jnp.asarray(s["gt_keypoints"][:2])
    codes = coder.encode(boxes, kps, anchors)
    assert codes.shape == (2, 10)
    dec_boxes, dec_kps = coder.decode(codes, anchors)
    np.testing.assert_allclose(np.asarray(dec_boxes), np.asarray(boxes),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dec_kps), np.asarray(kps),
                               rtol=1e-4, atol=1e-3)


def test_input_reader_num_keypoints_threads(tmp_path):
    from google.protobuf import text_format

    from mtlx.builders.component_builders import build_input_reader
    from mtlx.config.protos import pipeline_pb2
    from mtlx.data import tfrecord

    ex, _ = _example_with_keypoints()
    path = str(tmp_path / "k.record")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    proto = pipeline_pb2.InputReader()
    text_format.Parse(
        f'tf_record_input_reader {{ input_path: "{path}" }} num_keypoints: 3',
        proto,
    )
    ds = build_input_reader(
        proto, canvas_size=(64, 64),
        resizer=("fixed", {"height": 64, "width": 64}), max_boxes=4,
    )
    assert ds.get(0)["gt_keypoints"].shape == (4, 3, 2)
