"""Golden tests for the annotation-recycling pseudo-label generators
(SURVEY.md §5: label generators most need golden tests)."""

import jax.numpy as jnp
import numpy as np

from mtlx.labels import recycle
import pytest


@pytest.mark.smoke
def test_multiobject_labels_hand_computed():
    # window fully contains box0 (class 0) and half of box1 (class 2)
    windows = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.asarray([[2.0, 2.0, 4.0, 4.0], [5.0, 5.0, 15.0, 10.0]])
    classes = jnp.asarray([0, 2])
    mask = jnp.asarray([True, True])
    labels = np.asarray(recycle.multiobject_labels(windows, gt, classes, mask, 3))
    # coverage: box0 = 1.0, box1 = (5*5)/(10*5) = 0.5 -> p = [1/1.5, 0, .5/1.5]
    np.testing.assert_allclose(labels[0], [2 / 3, 0.0, 1 / 3], rtol=1e-5)


def test_multiobject_labels_padding_ignored():
    windows = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.asarray([[2.0, 2.0, 4.0, 4.0], [0.0, 0.0, 10.0, 10.0]])
    classes = jnp.asarray([1, 2])
    mask = jnp.asarray([True, False])  # second box is padding
    labels = np.asarray(recycle.multiobject_labels(windows, gt, classes, mask, 3))
    np.testing.assert_allclose(labels[0], [0.0, 1.0, 0.0], rtol=1e-6)


def test_multiobject_labels_empty_window_zero_row():
    windows = jnp.asarray([[90.0, 90.0, 99.0, 99.0]])
    gt = jnp.asarray([[2.0, 2.0, 4.0, 4.0]])
    labels = np.asarray(
        recycle.multiobject_labels(windows, gt, jnp.asarray([0]), jnp.asarray([True]), 3)
    )
    np.testing.assert_allclose(labels[0], [0.0, 0.0, 0.0])


def test_closeness_labels_symmetric_pair():
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 20.0, 10.0, 30.0]])
    classes = jnp.asarray([0, 1])
    mask = jnp.asarray([True, True])
    labels = np.asarray(recycle.closeness_labels(gt, classes, mask, 3, sigma=0.5))
    # each object's only neighbor is the other -> one-hot of the other class
    np.testing.assert_allclose(labels[0], [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(labels[1], [1.0, 0.0, 0.0], atol=1e-6)


def test_closeness_labels_distance_weighting():
    # box1 is near box0, box2 is far: label0 should weight class(box1) higher
    gt = jnp.asarray(
        [[0.0, 0.0, 10.0, 10.0], [0.0, 12.0, 10.0, 22.0], [0.0, 300.0, 10.0, 310.0]]
    )
    classes = jnp.asarray([0, 1, 2])
    mask = jnp.asarray([True, True, True])
    labels = np.asarray(recycle.closeness_labels(gt, classes, mask, 3, sigma=0.5))
    assert labels[0, 1] > labels[0, 2]
    # near objects give normalized rows; the isolated box2's weights
    # underflow to a zero row (no nearby objects), by design
    np.testing.assert_allclose(labels[:2].sum(1), 1.0, rtol=1e-5)


def test_closeness_no_neighbors_zero_row():
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 0.0, 0.0]])
    labels = np.asarray(
        recycle.closeness_labels(
            gt, jnp.asarray([0, 0]), jnp.asarray([True, False]), 3
        )
    )
    np.testing.assert_allclose(labels[0], 0.0)


def test_foreground_mask_rasterization():
    gt = jnp.asarray([[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]])
    mask = jnp.asarray([True, True])
    m = np.asarray(recycle.foreground_mask(gt, mask, (4, 4)))
    want = np.array(
        [
            [1, 1, 0, 0],
            [1, 1, 0, 0],
            [0, 0, 1, 1],
            [0, 0, 1, 1],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(m, want)


def test_foreground_mask_empty():
    m = np.asarray(
        recycle.foreground_mask(
            jnp.zeros((2, 4)), jnp.asarray([False, False]), (4, 4)
        )
    )
    assert (m == 0).all()


def test_enlarged_windows():
    gt = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    w = np.asarray(recycle.enlarged_windows(gt, 2.0))
    np.testing.assert_allclose(w, [[5.0, 5.0, 25.0, 25.0]])


def test_sampled_windows_cover_gt_within_factor():
    import jax

    rng = np.random.RandomState(3)
    gt = np.stack(
        [
            np.asarray([10.0, 20.0, 10.0 + 5 * i + 4.0, 20.0 + 3 * i + 6.0])
            for i in range(8)
        ]
    ).astype(np.float32)
    for seed in range(4):
        w = np.asarray(
            recycle.sampled_windows(jax.random.PRNGKey(seed), jnp.asarray(gt), 2.0)
        )
        # every window fully covers its GT box ("covering and around")
        assert (w[:, 0] <= gt[:, 0] + 1e-4).all()
        assert (w[:, 1] <= gt[:, 1] + 1e-4).all()
        assert (w[:, 2] >= gt[:, 2] - 1e-4).all()
        assert (w[:, 3] >= gt[:, 3] - 1e-4).all()
        # per-axis size within [1, factor] x GT size
        gh, gw = gt[:, 2] - gt[:, 0], gt[:, 3] - gt[:, 1]
        wh, ww = w[:, 2] - w[:, 0], w[:, 3] - w[:, 1]
        assert (wh >= gh - 1e-4).all() and (wh <= 2.0 * gh + 1e-4).all()
        assert (ww >= gw - 1e-4).all() and (ww <= 2.0 * gw + 1e-4).all()
    # deterministic per key; varies across keys (not the enlarged window)
    a = np.asarray(recycle.sampled_windows(jax.random.PRNGKey(0), jnp.asarray(gt), 2.0))
    b = np.asarray(recycle.sampled_windows(jax.random.PRNGKey(0), jnp.asarray(gt), 2.0))
    c = np.asarray(recycle.sampled_windows(jax.random.PRNGKey(1), jnp.asarray(gt), 2.0))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    det = np.asarray(recycle.enlarged_windows(jnp.asarray(gt), 2.0))
    assert not np.allclose(a, det)
    del rng


def test_sampled_windows_labels_still_sum_to_one():
    import jax

    gt = jnp.asarray(
        [[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 40.0, 44.0], [0.0, 0.0, 0.0, 0.0]]
    )
    mask = jnp.asarray([True, True, False])
    classes = jnp.asarray([1, 3, 0])
    w = recycle.sampled_windows(jax.random.PRNGKey(7), gt, 2.0)
    labels = np.asarray(recycle.multiobject_labels(w, gt, classes, mask, 5))
    # each sampled window covers its own GT box -> nonzero row summing to 1
    np.testing.assert_allclose(labels[:2].sum(-1), 1.0, rtol=1e-5)
