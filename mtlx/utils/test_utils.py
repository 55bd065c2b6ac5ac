"""Test fixtures and mocks (reference utils/test_utils.py, SURVEY.md §5):
mock pluggable components + deterministic images for meta-arch tests."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mtlx.coders.box_coders import BoxCoder


def mock_box_coder() -> BoxCoder:
    """Encode = box - anchor (identity-ish), matching the reference
    MockBoxCoder used to make expected values trivial to hand-compute."""
    return BoxCoder(
        encode=lambda boxes, anchors: boxes - anchors,
        decode=lambda codes, anchors: codes + anchors,
        code_size=4,
    )


class MockAnchorGenerator:
    """Fixed tiny anchor set regardless of feature map shape."""

    def __init__(self, anchors=None):
        self._anchors = (
            jnp.asarray(anchors)
            if anchors is not None
            else jnp.asarray(
                [[0.0, 0.0, 10.0, 10.0], [0.0, 10.0, 10.0, 20.0]]
            )
        )

    num_anchors_per_location = 1

    def generate(self, feature_map_shape):
        return self._anchors


def mock_matcher(match_results):
    """Matcher returning a fixed match vector."""
    fixed = jnp.asarray(match_results, jnp.int32)

    def match(similarity, row_mask=None, **kw):
        return fixed

    return match


def create_diagonal_gradient_image(height, width, depth):
    """Deterministic image whose value increases along the anti-diagonal
    (reference create_diagonal_gradient_image)."""
    row = np.arange(width, 0, -1, dtype=np.float32)
    col = np.arange(height, 0, -1, dtype=np.float32)[:, None]
    base = (row + col) / (width + height)
    return np.stack([base * (d + 1) for d in range(depth)], axis=-1)


def create_random_boxes(num_boxes, max_height, max_width, seed=0):
    rs = np.random.RandomState(seed)
    ymin = rs.uniform(0, max_height, num_boxes)
    xmin = rs.uniform(0, max_width, num_boxes)
    h = rs.uniform(1, max_height / 2, num_boxes)
    w = rs.uniform(1, max_width / 2, num_boxes)
    return np.stack(
        [ymin, xmin, np.minimum(ymin + h, max_height), np.minimum(xmin + w, max_width)],
        axis=1,
    ).astype(np.float32)
