"""Box coders — anchor-relative box parameterizations.

Functional equivalents of the reference's `object_detection/box_coders/*`
(SURVEY.md §3.2): FasterRCNN [ty,tx,th,tw] with scale factors, mean/stddev,
square, and keypoint coders. Each coder is a pair of pure functions
`encode(boxes, anchors) -> codes` / `decode(codes, anchors) -> boxes`
operating on [..., N, 4] (keypoint coder: plus [..., N, K, 2] keypoints).
Batched use is plain broadcasting or `vmap`; there is no class hierarchy —
builders select a coder by returning the function pair.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from jax import Array

from mtlx.geometry import box_ops

EPSILON = 1e-8


class BoxCoder(NamedTuple):
    """A coder as a (encode, decode, code_size) triple."""

    encode: callable
    decode: callable
    code_size: int


def faster_rcnn_encode(
    boxes: Array, anchors: Array, scale_factors: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
) -> Array:
    """Encode boxes w.r.t. anchors as [ty, tx, th, tw].

    Matches the reference faster_rcnn_box_coder: EPSILON added to all widths
    and heights before the ratio/log, then each component multiplied by its
    scale factor ([10, 10, 5, 5] in the standard configs).
    """
    ycenter_a, xcenter_a, ha, wa = box_ops.center_coordinates_and_sizes(anchors)
    ycenter, xcenter, h, w = box_ops.center_coordinates_and_sizes(boxes)
    ha = ha + EPSILON
    wa = wa + EPSILON
    h = h + EPSILON
    w = w + EPSILON
    ty = (ycenter - ycenter_a) / ha * scale_factors[0]
    tx = (xcenter - xcenter_a) / wa * scale_factors[1]
    th = jnp.log(h / ha) * scale_factors[2]
    tw = jnp.log(w / wa) * scale_factors[3]
    return jnp.stack([ty, tx, th, tw], axis=-1)


def faster_rcnn_decode(
    codes: Array, anchors: Array, scale_factors: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
) -> Array:
    """Decode [ty, tx, th, tw] codes against anchors back to corner boxes."""
    ycenter_a, xcenter_a, ha, wa = box_ops.center_coordinates_and_sizes(anchors)
    ty = codes[..., 0] / scale_factors[0]
    tx = codes[..., 1] / scale_factors[1]
    th = codes[..., 2] / scale_factors[2]
    tw = codes[..., 3] / scale_factors[3]
    w = jnp.exp(tw) * wa
    h = jnp.exp(th) * ha
    ycenter = ty * ha + ycenter_a
    xcenter = tx * wa + xcenter_a
    return box_ops.from_center_coordinates(ycenter, xcenter, h, w)


def make_faster_rcnn_coder(scale_factors=(10.0, 10.0, 5.0, 5.0)) -> BoxCoder:
    return BoxCoder(
        encode=lambda b, a: faster_rcnn_encode(b, a, scale_factors),
        decode=lambda c, a: faster_rcnn_decode(c, a, scale_factors),
        code_size=4,
    )


def mean_stddev_encode(boxes: Array, anchors: Array, stddev: float = 0.01) -> Array:
    """(box - anchor) / stddev, per corner coordinate."""
    return (boxes - anchors) / stddev


def mean_stddev_decode(codes: Array, anchors: Array, stddev: float = 0.01) -> Array:
    return codes * stddev + anchors


def make_mean_stddev_coder(stddev: float = 0.01) -> BoxCoder:
    return BoxCoder(
        encode=lambda b, a: mean_stddev_encode(b, a, stddev),
        decode=lambda c, a: mean_stddev_decode(c, a, stddev),
        code_size=4,
    )


def square_encode(
    boxes: Array, anchors: Array, scale_factors: Sequence[float] = (1.0, 1.0, 1.0)
) -> Array:
    """Square coder: [ty, tx, tl] with l = sqrt(h * w) of the anchor."""
    ycenter_a, xcenter_a, ha, wa = box_ops.center_coordinates_and_sizes(anchors)
    la = jnp.sqrt((ha + EPSILON) * (wa + EPSILON))
    ycenter, xcenter, h, w = box_ops.center_coordinates_and_sizes(boxes)
    l = jnp.sqrt((h + EPSILON) * (w + EPSILON))
    ty = (ycenter - ycenter_a) / la * scale_factors[0]
    tx = (xcenter - xcenter_a) / la * scale_factors[1]
    tl = jnp.log(l / la) * scale_factors[2]
    return jnp.stack([ty, tx, tl], axis=-1)


def square_decode(
    codes: Array, anchors: Array, scale_factors: Sequence[float] = (1.0, 1.0, 1.0)
) -> Array:
    ycenter_a, xcenter_a, ha, wa = box_ops.center_coordinates_and_sizes(anchors)
    la = jnp.sqrt((ha + EPSILON) * (wa + EPSILON))
    ty = codes[..., 0] / scale_factors[0]
    tx = codes[..., 1] / scale_factors[1]
    tl = codes[..., 2] / scale_factors[2]
    l = jnp.exp(tl) * la
    ycenter = ty * la + ycenter_a
    xcenter = tx * la + xcenter_a
    return box_ops.from_center_coordinates(ycenter, xcenter, l, l)


def make_square_coder(scale_factors=(1.0, 1.0, 1.0)) -> BoxCoder:
    return BoxCoder(
        encode=lambda b, a: square_encode(b, a, scale_factors),
        decode=lambda c, a: square_decode(c, a, scale_factors),
        code_size=3,
    )


def keypoint_encode(
    boxes: Array,
    keypoints: Array,
    anchors: Array,
    scale_factors: Sequence[float] = (10.0, 10.0, 5.0, 5.0),
) -> Array:
    """Encode boxes + K keypoints: [ty, tx, th, tw, tky0, tkx0, ...].

    Keypoints are encoded relative to the anchor center, normalized by anchor
    size, and scaled by the y/x scale factors (reference keypoint_box_coder).
    """
    ycenter_a, xcenter_a, ha, wa = box_ops.center_coordinates_and_sizes(anchors)
    box_codes = faster_rcnn_encode(boxes, anchors, scale_factors)
    ha_e = (ha + EPSILON)[..., None]
    wa_e = (wa + EPSILON)[..., None]
    tky = (keypoints[..., 0] - ycenter_a[..., None]) / ha_e * scale_factors[0]
    tkx = (keypoints[..., 1] - xcenter_a[..., None]) / wa_e * scale_factors[1]
    kp_codes = jnp.stack([tky, tkx], axis=-1).reshape(*boxes.shape[:-1], -1)
    return jnp.concatenate([box_codes, kp_codes], axis=-1)


def keypoint_decode(
    codes: Array,
    anchors: Array,
    num_keypoints: int,
    scale_factors: Sequence[float] = (10.0, 10.0, 5.0, 5.0),
):
    """Decode box + keypoint codes. Returns (boxes, keypoints[..., K, 2])."""
    ycenter_a, xcenter_a, ha, wa = box_ops.center_coordinates_and_sizes(anchors)
    boxes = faster_rcnn_decode(codes[..., :4], anchors, scale_factors)
    kp = codes[..., 4:].reshape(*codes.shape[:-1], num_keypoints, 2)
    ky = kp[..., 0] / scale_factors[0] * (ha + EPSILON)[..., None] + ycenter_a[..., None]
    kx = kp[..., 1] / scale_factors[1] * (wa + EPSILON)[..., None] + xcenter_a[..., None]
    return boxes, jnp.stack([ky, kx], axis=-1)


def batch_decode(decode_fn, batch_codes: Array, anchors: Array) -> Array:
    """Decode [B, N, code_size] against shared [N, 4] anchors."""
    return decode_fn(batch_codes, jnp.broadcast_to(anchors, batch_codes.shape[:-1] + (4,)))
