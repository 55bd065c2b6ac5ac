"""Geometry core vs numpy oracles (reference test pattern: np mirrors are
ground truth, SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp

from mtlx.geometry import box_ops, np_box_ops
from mtlx.coders import box_coders
import pytest

RNG = np.random.RandomState(0)


def random_boxes(n, scale=100.0):
    ymin = RNG.uniform(0, scale, n)
    xmin = RNG.uniform(0, scale, n)
    h = RNG.uniform(1, scale / 2, n)
    w = RNG.uniform(1, scale / 2, n)
    return np.stack([ymin, xmin, ymin + h, xmin + w], axis=1).astype(np.float32)


def test_area():
    b = random_boxes(17)
    np.testing.assert_allclose(box_ops.area(jnp.asarray(b)), np_box_ops.area(b), rtol=1e-5)


@pytest.mark.smoke
def test_intersection_iou_ioa():
    b1, b2 = random_boxes(13), random_boxes(7)
    np.testing.assert_allclose(
        box_ops.intersection(jnp.asarray(b1), jnp.asarray(b2)),
        np_box_ops.intersection(b1, b2),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        box_ops.iou(jnp.asarray(b1), jnp.asarray(b2)), np_box_ops.iou(b1, b2),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        box_ops.ioa(jnp.asarray(b1), jnp.asarray(b2)), np_box_ops.ioa(b1, b2),
        rtol=1e-4, atol=1e-5,
    )


def test_iou_hand_computed():
    b1 = np.array([[0, 0, 10, 10]], np.float32)
    b2 = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    got = np.asarray(box_ops.iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, [[1.0, 25.0 / 175.0, 0.0]], rtol=1e-6)


def test_zero_area_iou_is_zero():
    b1 = np.zeros((3, 4), np.float32)  # degenerate padding rows
    b2 = random_boxes(5)
    got = np.asarray(box_ops.iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert (got == 0).all()


def test_clip_and_change_frame():
    b = random_boxes(9)
    win = np.array([10.0, 10.0, 80.0, 90.0], np.float32)
    np.testing.assert_allclose(
        box_ops.clip_to_window(jnp.asarray(b), jnp.asarray(win)),
        np_box_ops.clip_to_window(b, win),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        box_ops.change_coordinate_frame(jnp.asarray(b), jnp.asarray(win)),
        np_box_ops.change_coordinate_frame(b, win),
        rtol=1e-4, atol=1e-5,
    )


def test_matched_iou():
    b1, b2 = random_boxes(11), random_boxes(11)
    full = np_box_ops.iou(b1, b2)
    np.testing.assert_allclose(
        box_ops.matched_iou(jnp.asarray(b1), jnp.asarray(b2)),
        np.diagonal(full),
        rtol=1e-4, atol=1e-5,
    )


def test_outside_window_masks():
    boxes = np.array(
        [[0, 0, 10, 10], [-5, 0, 10, 10], [50, 50, 60, 60], [100, 100, 110, 110]],
        np.float32,
    )
    win = jnp.asarray([0.0, 0.0, 99.0, 99.0])
    partly = np.asarray(box_ops.outside_window_mask(jnp.asarray(boxes), win))
    fully = np.asarray(box_ops.completely_outside_window_mask(jnp.asarray(boxes), win))
    assert partly.tolist() == [False, True, False, True]
    assert fully.tolist() == [False, False, False, True]


def test_normalized_absolute_roundtrip():
    b = random_boxes(8)
    norm = box_ops.to_normalized_coordinates(jnp.asarray(b), 120.0, 160.0)
    back = box_ops.to_absolute_coordinates(norm, 120.0, 160.0)
    np.testing.assert_allclose(back, b, rtol=1e-4, atol=1e-3)


def test_faster_rcnn_coder_roundtrip_and_oracle():
    boxes, anchors = random_boxes(21), random_boxes(21)
    codes = box_coders.faster_rcnn_encode(jnp.asarray(boxes), jnp.asarray(anchors))
    np.testing.assert_allclose(
        codes, np_box_ops.faster_rcnn_encode(boxes, anchors), rtol=1e-4, atol=1e-4
    )
    decoded = box_coders.faster_rcnn_decode(codes, jnp.asarray(anchors))
    np.testing.assert_allclose(decoded, boxes, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(
        np_box_ops.faster_rcnn_decode(np.asarray(codes), anchors),
        np.asarray(decoded),
        rtol=1e-4, atol=1e-3,
    )


def test_faster_rcnn_coder_hand_computed():
    # anchor 10x10 at center (5,5); box 20x20 at center (10,10)
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    boxes = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
    codes = np.asarray(box_coders.faster_rcnn_encode(boxes, anchors))
    np.testing.assert_allclose(
        codes, [[5.0, 5.0, 5.0 * np.log(2.0), 5.0 * np.log(2.0)]], rtol=1e-5
    )


def test_mean_stddev_and_square_coders_roundtrip():
    boxes, anchors = random_boxes(6), random_boxes(6)
    c = box_coders.make_mean_stddev_coder(0.01)
    codes = c.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    np.testing.assert_allclose(c.decode(codes, jnp.asarray(anchors)), boxes, rtol=1e-3, atol=1e-2)
    sq = box_coders.make_square_coder()
    codes = sq.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(sq.decode(codes, jnp.asarray(anchors)))
    # square coder decodes to squares with matched center and sqrt(hw) side
    yc, xc, h, w = np_box_ops.center_coordinates_and_sizes(boxes)
    np.testing.assert_allclose(dec[:, 2] - dec[:, 0], np.sqrt(h * w), rtol=1e-3)


def test_keypoint_coder_roundtrip():
    boxes, anchors = random_boxes(5), random_boxes(5)
    kp = RNG.uniform(0, 100, (5, 3, 2)).astype(np.float32)
    codes = box_coders.keypoint_encode(jnp.asarray(boxes), jnp.asarray(kp), jnp.asarray(anchors))
    assert codes.shape == (5, 4 + 6)
    dec_boxes, dec_kp = box_coders.keypoint_decode(codes, jnp.asarray(anchors), num_keypoints=3)
    np.testing.assert_allclose(dec_boxes, boxes, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(dec_kp, kp, rtol=1e-3, atol=1e-2)


def test_iou_tiny_boxes_match_numpy_oracle():
    """Divisor guard must not floor tiny-but-real unions (normalized
    SSD-coordinate boxes have unions ~1e-9): identical boxes IoU == 1."""
    import jax.numpy as jnp

    from mtlx.geometry import box_ops, np_box_ops

    b = np.asarray([[0.1, 0.1, 0.1 + 3e-5, 0.1 + 3e-5]], np.float32)
    got = np.asarray(box_ops.iou(jnp.asarray(b), jnp.asarray(b)))
    want = np_box_ops.iou(b, b)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got, [[1.0]], atol=1e-5)


def test_np_mask_intersection_binarizes():
    """0/255-coded uint8 masks must behave like booleans."""
    from mtlx.geometry import np_mask_ops

    m = np.zeros((1, 4, 4), np.uint8)
    m[0, :2, :2] = 255
    np.testing.assert_allclose(np_mask_ops.iou(m, m), [[1.0]])
    np.testing.assert_allclose(np_mask_ops.intersection(m, m), [[4.0]])


def test_np_boxlist_nms_zero_output_size():
    from mtlx.geometry import np_box_list

    bl = np_box_list.BoxList(
        np.asarray([[0, 0, 1, 1], [2, 2, 3, 3]], np.float32)
    )
    bl.add_field("scores", np.asarray([0.9, 0.8], np.float32))
    out = np_box_list.non_max_suppression(bl, max_output_size=0)
    assert out.num_boxes() == 0


def test_keypoint_ops_batched_windows():
    """Windowed keypoint ops accept [B, 4] windows alongside [B, K, 2]
    keypoints (box_ops parallel), clipping per batch row."""
    import jax.numpy as jnp

    from mtlx.geometry import keypoint_ops

    kp = jnp.asarray([[[0.5, 0.5], [5.0, 5.0], [9.0, 9.0]],
                      [[0.5, 0.5], [5.0, 5.0], [9.0, 9.0]]])
    win = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 6.0, 6.0]])
    clipped = np.asarray(keypoint_ops.clip_to_window(kp, win))
    np.testing.assert_allclose(clipped[0], np.asarray(kp[0]))
    np.testing.assert_allclose(clipped[1], [[1, 1], [5, 5], [6, 6]])
    pruned = np.asarray(keypoint_ops.prune_outside_window(kp, win))
    assert not np.isnan(pruned[0]).any()
    assert np.isnan(pruned[1, 0]).all() and np.isnan(pruned[1, 2]).all()
    assert not np.isnan(pruned[1, 1]).any()
    frame = np.asarray(keypoint_ops.change_coordinate_frame(kp, win))
    np.testing.assert_allclose(frame[1, 1], [0.8, 0.8])
