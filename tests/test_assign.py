"""Matchers, samplers, target assigner — tiny hand-computed cases
(reference test pattern, SURVEY.md §5 target_assigner_test)."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlx.assign import matcher, samplers, target_assigner
from mtlx.anchors.grid import GridAnchorGenerator, tile_anchors


def test_argmax_matcher_thresholds():
    sim = jnp.asarray(
        [
            [0.8, 0.2, 0.45, 0.1],
            [0.1, 0.6, 0.05, 0.2],
        ]
    )
    m = matcher.argmax_match(
        sim, matched_threshold=0.5, unmatched_threshold=0.3,
        force_match_for_each_row=False,
    )
    # col0: 0.8 -> row0; col1: 0.6 -> row1; col2: 0.45 between -> ignored;
    # col3: 0.2 below -> unmatched
    assert m.tolist() == [0, 1, -2, -1]


def test_argmax_matcher_force_match():
    sim = jnp.asarray(
        [
            [0.8, 0.0, 0.0],
            [0.0, 0.25, 0.1],  # best col for row1 is col1 with low sim
        ]
    )
    m = matcher.argmax_match(
        sim, matched_threshold=0.5, unmatched_threshold=0.3,
        force_match_for_each_row=True,
    )
    assert m.tolist() == [0, 1, -1]


def test_argmax_matcher_force_match_tiebreak_lowest_row():
    # both rows' best column is col 0 -> tf.argmax over the one-hot claims
    # returns the FIRST (lowest) row
    sim = jnp.asarray(
        [
            [0.25, 0.1],
            [0.25, 0.1],
        ]
    )
    m = matcher.argmax_match(
        sim, matched_threshold=0.5, unmatched_threshold=0.3,
        force_match_for_each_row=True,
    )
    assert m.tolist()[0] == 0


def test_argmax_matcher_padded_rows_never_match():
    sim = jnp.asarray([[0.9, 0.9], [0.95, 0.95]])
    mask = jnp.asarray([True, False])
    m = matcher.argmax_match(
        sim, row_mask=mask, matched_threshold=0.5, unmatched_threshold=0.5,
        force_match_for_each_row=True,
    )
    assert m.tolist() == [0, 0]


def test_argmax_matcher_no_gt():
    sim = jnp.zeros((3, 5))
    m = matcher.argmax_match(
        sim, row_mask=jnp.zeros(3, bool), matched_threshold=0.5,
        unmatched_threshold=0.5, force_match_for_each_row=True,
    )
    assert m.tolist() == [-1] * 5


def test_greedy_bipartite_match():
    sim = jnp.asarray(
        [
            [0.9, 0.8, 0.1],
            [0.85, 0.7, 0.2],
        ]
    )
    m = matcher.greedy_bipartite_match(sim)
    # global best 0.9 -> (row0, col0); then best remaining 0.7 -> (row1, col1)
    assert m.tolist() == [0, 1, -1]


def test_balanced_sampler_counts():
    rng = jax.random.PRNGKey(0)
    n = 1000
    labels = jnp.arange(n) < 20  # 20 positives
    indicator = jnp.ones(n, bool)
    sel = samplers.balanced_subsample(rng, indicator, labels, batch_size=256, positive_fraction=0.5)
    sel = np.asarray(sel)
    lab = np.asarray(labels)
    assert sel.sum() == 256
    assert (sel & lab).sum() == 20  # all positives kept (fewer than 128)
    assert (sel & ~lab).sum() == 236


def test_balanced_sampler_respects_indicator_and_fraction():
    rng = jax.random.PRNGKey(1)
    n = 400
    labels = jnp.arange(n) < 300
    indicator = jnp.arange(n) % 2 == 0
    sel = np.asarray(
        samplers.balanced_subsample(rng, indicator, labels, 64, 0.25)
    )
    assert sel.sum() == 64
    assert (sel & ~np.asarray(indicator)).sum() == 0
    assert (sel & np.asarray(labels)).sum() == 16  # exactly the positive cap


def test_grid_anchors_hand_computed():
    anchors = np.asarray(
        tile_anchors(
            2, 2, scales=[1.0], aspect_ratios=[1.0],
            base_anchor_size=(10.0, 10.0), anchor_stride=(16.0, 16.0),
        )
    )
    assert anchors.shape == (4, 4)
    np.testing.assert_allclose(anchors[0], [-5, -5, 5, 5])
    np.testing.assert_allclose(anchors[1], [-5, 11, 5, 21])  # x fastest after anchor dim
    np.testing.assert_allclose(anchors[2], [11, -5, 21, 5])


def test_grid_anchors_aspect_ordering():
    g = GridAnchorGenerator(
        scales=[1.0, 2.0], aspect_ratios=[0.5, 1.0],
        base_anchor_size=(16.0, 16.0), anchor_stride=(16.0, 16.0),
    )
    a = np.asarray(g.generate((1, 1)))
    assert g.num_anchors_per_location == 4
    heights = a[:, 2] - a[:, 0]
    widths = a[:, 3] - a[:, 1]
    # aspect outer, scale inner: [a=.5 s=1, a=.5 s=2, a=1 s=1, a=1 s=2]
    np.testing.assert_allclose(heights, [16 / np.sqrt(0.5), 32 / np.sqrt(0.5), 16, 32], rtol=1e-5)
    np.testing.assert_allclose(widths, [16 * np.sqrt(0.5), 32 * np.sqrt(0.5), 16, 32], rtol=1e-5)


def test_target_assigner_rpn_tiny():
    # 3 anchors, 2 gt (one padded row)
    anchors = jnp.asarray(
        [[0.0, 0.0, 10.0, 10.0], [0.0, 20.0, 10.0, 30.0], [50.0, 50.0, 60.0, 60.0]]
    )
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 0.0, 0.0]])
    mask = jnp.asarray([True, False])
    ta = target_assigner.create_target_assigner("FasterRCNN", "proposal")
    res = ta.assign(anchors, gt, gt_mask=mask)
    assert res.match.tolist() == [0, -1, -1]
    np.testing.assert_allclose(res.cls_targets[:, 0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(res.cls_weights, [1.0, 1.0, 1.0])
    np.testing.assert_allclose(res.reg_weights, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(res.reg_targets[0], [0, 0, 0, 0], atol=1e-5)


def test_target_assigner_detection_one_hot():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 9.0, 9.0], [40.0, 40.0, 60.0, 60.0]])
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    labels = jnp.asarray([[0.0, 0.0, 1.0]])  # one-hot with background col 0
    ta = target_assigner.create_target_assigner("FasterRCNN", "detection")
    res = ta.assign(
        anchors, gt, gt_labels=labels,
        unmatched_cls_target=jnp.asarray([1.0, 0.0, 0.0]),
    )
    np.testing.assert_allclose(res.cls_targets[0], [0, 0, 1])
    np.testing.assert_allclose(res.cls_targets[2], [1, 0, 0])
    assert res.match[0] == 0 and res.match[2] == -1


def test_batch_assign_vmap():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 40.0, 40.0]])
    gt = jnp.stack(
        [
            jnp.asarray([[0.0, 0.0, 10.0, 10.0]]),
            jnp.asarray([[20.0, 20.0, 40.0, 40.0]]),
        ]
    )
    mask = jnp.ones((2, 1), bool)
    ta = target_assigner.create_target_assigner("FasterRCNN", "proposal")
    res = target_assigner.batch_assign(ta, anchors, gt_boxes=gt, gt_mask=mask)
    assert res.match.shape == (2, 2)
    assert res.match[0].tolist() == [0, -1]
    assert res.match[1].tolist() == [-1, 0]
