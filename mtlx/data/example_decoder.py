"""tf.train.Example encode/decode for detection records.

Capability match for the reference's
`data_decoders/tf_example_decoder.py` (SURVEY.md §3.5): same feature keys
(`image/encoded`, `image/object/bbox/{ymin,xmin,ymax,xmax}`,
`image/object/class/label`, difficult/truncated flags), producing the
InputDataFields dict — as host-side numpy, feeding the device pipeline.
"""

from __future__ import annotations

import io
from typing import Dict, Optional

import numpy as np

from mtlx.config.protos import example_pb2


# canonical dict keys (reference core/standard_fields.InputDataFields)
class InputDataFields:
    image = "image"
    image_encoded = "image_encoded"
    image_format = "image_format"
    source_id = "source_id"
    groundtruth_boxes = "groundtruth_boxes"
    groundtruth_classes = "groundtruth_classes"
    groundtruth_difficult = "groundtruth_difficult"
    groundtruth_truncated = "groundtruth_truncated"
    groundtruth_group_of = "groundtruth_group_of"
    groundtruth_instance_masks = "groundtruth_instance_masks"
    groundtruth_keypoints = "groundtruth_keypoints"
    original_shape = "original_shape"


def bytes_feature(value: bytes):
    f = example_pb2.Feature()
    f.bytes_list.value.append(value)
    return f


def bytes_list_feature(values):
    f = example_pb2.Feature()
    f.bytes_list.value.extend(values)
    return f


def float_list_feature(values):
    f = example_pb2.Feature()
    f.float_list.value.extend(values)
    return f


def int64_list_feature(values):
    f = example_pb2.Feature()
    f.int64_list.value.extend(int(v) for v in values)
    return f


def build_example(
    encoded_image: bytes,
    image_format: bytes,
    height: int,
    width: int,
    filename: str,
    boxes_norm: np.ndarray,  # [N, 4] ymin,xmin,ymax,xmax normalized
    class_labels,  # [N] 1-based ids
    class_texts,  # [N] names
    difficult=None,
    truncated=None,
    group_of=None,
    poses=None,
    instance_masks=None,  # optional [N] list of [h, w] 0/1 arrays
    keypoints=None,  # optional [N, P, 2] normalized (y, x)
) -> example_pb2.Example:
    """Serialize one image + annotations with the reference's feature keys
    (SURVEY.md §4.5 create_pascal_tf_record schema). Instance masks are
    stored as per-instance PNG bytes under `image/object/mask` (the OD-API
    PNG-masks wire format)."""
    n = len(class_labels)
    difficult = difficult if difficult is not None else [0] * n
    truncated = truncated if truncated is not None else [0] * n
    poses = poses if poses is not None else [b"Unspecified"] * n
    ex = example_pb2.Example()
    fmap = ex.features.feature
    fmap["image/height"].CopyFrom(int64_list_feature([height]))
    fmap["image/width"].CopyFrom(int64_list_feature([width]))
    fmap["image/filename"].CopyFrom(bytes_feature(filename.encode()))
    fmap["image/source_id"].CopyFrom(bytes_feature(filename.encode()))
    fmap["image/encoded"].CopyFrom(bytes_feature(encoded_image))
    fmap["image/format"].CopyFrom(bytes_feature(image_format))
    if n:
        fmap["image/object/bbox/ymin"].CopyFrom(float_list_feature(boxes_norm[:, 0]))
        fmap["image/object/bbox/xmin"].CopyFrom(float_list_feature(boxes_norm[:, 1]))
        fmap["image/object/bbox/ymax"].CopyFrom(float_list_feature(boxes_norm[:, 2]))
        fmap["image/object/bbox/xmax"].CopyFrom(float_list_feature(boxes_norm[:, 3]))
        fmap["image/object/class/text"].CopyFrom(
            bytes_list_feature([t.encode() if isinstance(t, str) else t for t in class_texts])
        )
        fmap["image/object/class/label"].CopyFrom(int64_list_feature(class_labels))
        fmap["image/object/difficult"].CopyFrom(int64_list_feature(difficult))
        fmap["image/object/truncated"].CopyFrom(int64_list_feature(truncated))
        if group_of is not None:
            fmap["image/object/group_of"].CopyFrom(int64_list_feature(group_of))
        fmap["image/object/view"].CopyFrom(bytes_list_feature(poses))
        if instance_masks is not None:
            from PIL import Image

            blobs = []
            for m in instance_masks:
                buf = io.BytesIO()
                arr = (np.asarray(m) > 0).astype(np.uint8) * 255
                Image.fromarray(arr, mode="L").save(buf, format="PNG")
                blobs.append(buf.getvalue())
            fmap["image/object/mask"].CopyFrom(bytes_list_feature(blobs))
        if keypoints is not None:
            kp = np.asarray(keypoints, np.float32)
            fmap["image/object/keypoint/y"].CopyFrom(
                float_list_feature(kp[..., 0].reshape(-1))
            )
            fmap["image/object/keypoint/x"].CopyFrom(
                float_list_feature(kp[..., 1].reshape(-1))
            )
    return ex


def _floats(fmap, key):
    return np.asarray(fmap[key].float_list.value, np.float32) if key in fmap else np.zeros((0,), np.float32)


def _ints(fmap, key):
    return np.asarray(fmap[key].int64_list.value, np.int64) if key in fmap else np.zeros((0,), np.int64)


def decode_example(serialized: bytes, decode_image: bool = True,
                   load_instance_masks: bool = False,
                   return_encoded: bool = False) -> Dict:
    """Parse one serialized Example -> InputDataFields dict (numpy).

    groundtruth_classes are returned 1-based as stored (the loader shifts
    to 0-based); the image is decoded with PIL when decode_image=True.
    load_instance_masks decodes `image/object/mask` PNGs into a
    [N, h, w] float32 0/1 array (reference input_reader
    load_instance_masks).
    """
    ex = example_pb2.Example()
    ex.ParseFromString(serialized)
    fmap = ex.features.feature

    out: Dict = {}
    ymin = _floats(fmap, "image/object/bbox/ymin")
    xmin = _floats(fmap, "image/object/bbox/xmin")
    ymax = _floats(fmap, "image/object/bbox/ymax")
    xmax = _floats(fmap, "image/object/bbox/xmax")
    out[InputDataFields.groundtruth_boxes] = np.stack(
        [ymin, xmin, ymax, xmax], axis=1
    ) if len(ymin) else np.zeros((0, 4), np.float32)
    out[InputDataFields.groundtruth_classes] = _ints(fmap, "image/object/class/label")
    out[InputDataFields.groundtruth_difficult] = _ints(fmap, "image/object/difficult")
    out[InputDataFields.groundtruth_truncated] = _ints(fmap, "image/object/truncated")
    out[InputDataFields.groundtruth_group_of] = _ints(fmap, "image/object/group_of")
    if "image/source_id" in fmap:
        out[InputDataFields.source_id] = fmap["image/source_id"].bytes_list.value[0].decode()
    h = _ints(fmap, "image/height")
    w = _ints(fmap, "image/width")
    out[InputDataFields.original_shape] = (
        int(h[0]) if len(h) else -1,
        int(w[0]) if len(w) else -1,
    )
    if decode_image and "image/encoded" in fmap:
        from PIL import Image

        raw = fmap["image/encoded"].bytes_list.value[0]
        img = Image.open(io.BytesIO(raw))
        out[InputDataFields.image] = np.asarray(img.convert("RGB"), np.uint8)
    if return_encoded and "image/encoded" in fmap:
        out[InputDataFields.image_encoded] = fmap["image/encoded"].bytes_list.value[0]
        if "image/format" in fmap:
            out[InputDataFields.image_format] = fmap["image/format"].bytes_list.value[0]
    ky = _floats(fmap, "image/object/keypoint/y")
    if len(ky):
        kx = _floats(fmap, "image/object/keypoint/x")
        n = len(out[InputDataFields.groundtruth_classes])
        p = len(ky) // max(n, 1)
        out[InputDataFields.groundtruth_keypoints] = np.stack(
            [ky, kx], axis=-1
        ).reshape(n, p, 2)
    if load_instance_masks and "image/object/mask" in fmap:
        from PIL import Image

        masks = [
            (np.asarray(Image.open(io.BytesIO(b)).convert("L")) > 0).astype(
                np.float32
            )
            for b in fmap["image/object/mask"].bytes_list.value
        ]
        out[InputDataFields.groundtruth_instance_masks] = (
            np.stack(masks) if masks else np.zeros((0, 1, 1), np.float32)
        )
    return out
