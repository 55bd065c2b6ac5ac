"""Visualization drawing (reference utils/visualization_utils.py §3.7):
boxes, instance masks (with box->image reframing), keypoints."""

import numpy as np

from mtlx.utils import visualization_utils as viz


def test_draw_boxes_changes_pixels():
    image = np.zeros((40, 60, 3), np.uint8)
    out = viz.visualize_boxes_and_labels_on_image_array(
        image,
        boxes=np.asarray([[0.1, 0.1, 0.8, 0.9]]),
        classes=np.asarray([1]),
        scores=np.asarray([0.9]),
        category_index={1: {"id": 1, "name": "a"}},
    )
    assert out is image and image.sum() > 0


def test_paste_instance_masks_reframes_to_box():
    # full-on 4x4 crop mask pasted into the box region only
    masks = np.ones((1, 4, 4), np.float32)
    boxes = np.asarray([[0.25, 0.25, 0.75, 0.75]])
    full = viz.paste_instance_masks(masks, boxes, 40, 40)
    assert full.shape == (1, 40, 40)
    assert full[0, 20, 20]  # inside the box
    assert not full[0, 2, 2] and not full[0, 38, 38]  # outside stays empty
    ys, xs = np.where(full[0])
    assert ys.min() >= 9 and ys.max() <= 31 and xs.min() >= 9 and xs.max() <= 31


def test_draw_mask_blends_color():
    image = np.zeros((20, 20, 3), np.uint8)
    mask = np.zeros((20, 20), np.uint8)
    mask[5:10, 5:10] = 1
    viz.draw_mask_on_image_array(image, mask, color="red", alpha=0.5)
    assert image[7, 7, 0] > 0  # red channel blended in
    assert image[0, 0].sum() == 0  # untouched outside


def test_draw_mask_resizes_low_res_mask():
    image = np.zeros((32, 32, 3), np.uint8)
    mask = np.zeros((8, 8), np.uint8)
    mask[2:6, 2:6] = 1
    viz.draw_mask_on_image_array(image, mask, color="Lime")
    assert image[16, 16, 1] > 0


def test_draw_keypoints():
    image = np.zeros((30, 30, 3), np.uint8)
    viz.draw_keypoints_on_image_array(
        image, np.asarray([[0.5, 0.5], [0.2, 0.8]]), color="Yellow"
    )
    assert image[15, 15].sum() > 0 and image[6, 24].sum() > 0
