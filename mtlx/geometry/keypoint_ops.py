"""Keypoint geometry (reference core/keypoint_ops.py, SURVEY.md §3.1):
flip/scale/clip/coordinate-frame parallels of box_ops for [..., N, K, 2]
keypoints in (y, x) order."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def scale(keypoints: Array, y_scale, x_scale) -> Array:
    s = jnp.stack([jnp.asarray(y_scale), jnp.asarray(x_scale)])
    return keypoints * s


def clip_to_window(keypoints: Array, window: Array) -> Array:
    # window [..., 4] broadcasts over the keypoint axis via the 0:1
    # slices, exactly like box_ops' windowed ops — keypoints [B, K, 2]
    # with windows [B, 4] clip per batch row, not per keypoint
    y = jnp.clip(keypoints[..., 0], window[..., 0:1], window[..., 2:3])
    x = jnp.clip(keypoints[..., 1], window[..., 1:2], window[..., 3:4])
    return jnp.stack([y, x], axis=-1)


def prune_outside_window(keypoints: Array, window: Array) -> Array:
    """Replace keypoints outside the window with NaN (the reference's
    convention for 'absent')."""
    y, x = keypoints[..., 0], keypoints[..., 1]
    inside = (
        (y >= window[..., 0:1]) & (y <= window[..., 2:3])
        & (x >= window[..., 1:2]) & (x <= window[..., 3:4])
    )
    return jnp.where(inside[..., None], keypoints, jnp.nan)


def change_coordinate_frame(keypoints: Array, window: Array) -> Array:
    win_h = window[..., 2:3] - window[..., 0:1]
    win_w = window[..., 3:4] - window[..., 1:2]
    y = (keypoints[..., 0] - window[..., 0:1]) / win_h
    x = (keypoints[..., 1] - window[..., 1:2]) / win_w
    return jnp.stack([y, x], axis=-1)


def to_normalized_coordinates(keypoints: Array, height, width) -> Array:
    return scale(keypoints, 1.0 / jnp.asarray(height), 1.0 / jnp.asarray(width))


def to_absolute_coordinates(keypoints: Array, height, width) -> Array:
    return scale(keypoints, jnp.asarray(height), jnp.asarray(width))


def flip_horizontal(keypoints: Array, flip_point, flip_permutation=None) -> Array:
    """Mirror x about flip_point; optionally permute keypoint identities
    (left-eye <-> right-eye etc.), reference semantics."""
    if flip_permutation is not None:
        keypoints = keypoints[..., jnp.asarray(flip_permutation), :]
    y, x = keypoints[..., 0], keypoints[..., 1]
    return jnp.stack([y, 2.0 * jnp.asarray(flip_point) - x], axis=-1)


def flip_vertical(keypoints: Array, flip_point, flip_permutation=None) -> Array:
    if flip_permutation is not None:
        keypoints = keypoints[..., jnp.asarray(flip_permutation), :]
    y, x = keypoints[..., 0], keypoints[..., 1]
    return jnp.stack([2.0 * jnp.asarray(flip_point) - y, x], axis=-1)


def rot90(keypoints: Array) -> Array:
    """Rotate normalized keypoints 90 degrees counter-clockwise."""
    y, x = keypoints[..., 0], keypoints[..., 1]
    return jnp.stack([1.0 - x, y], axis=-1)
