"""Static-shape helpers (reference utils/shape_utils.py + utils/ops.py picks).

In this framework every variable-length set is padded to a static maximum
with a validity mask — these helpers implement that discipline (the
reference's `pad_or_clip_tensor` and friends, plus the BatchQueue
`_runtime_shapes` idea replaced by explicit masks, SURVEY.md §3.1 batcher).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array


def pad_or_clip_along_axis(x, size: int, axis: int = 0, pad_value=0):
    """Pad with pad_value or clip `x` to `size` along `axis` (host or jnp)."""
    n = x.shape[axis]
    if n == size:
        return x
    if n > size:
        slicer = [slice(None)] * x.ndim
        slicer[axis] = slice(0, size)
        return x[tuple(slicer)]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - n)
    if isinstance(x, np.ndarray):
        return np.pad(x, pads, constant_values=pad_value)
    return jnp.pad(x, pads, constant_values=pad_value)


def indices_to_dense_vector(
    indices: Array, size: int, indices_value: float = 1.0, default_value: float = 0.0
) -> Array:
    """Dense [size] vector with indices_value at `indices` (reference
    utils/ops.indices_to_dense_vector)."""
    return jnp.full((size,), default_value).at[indices].set(indices_value)


def padded_one_hot_encoding(indices: Array, depth: int, left_pad: int = 1) -> Array:
    """One-hot with `left_pad` zero columns prepended (reference
    utils/ops.padded_one_hot_encoding — used to add the background column)."""
    import jax

    oh = jax.nn.one_hot(indices, depth)
    return jnp.pad(oh, ((0, 0),) * (oh.ndim - 1) + ((left_pad, 0),))


def mask_count(mask: Array) -> Array:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


def nearest_neighbor_upsampling(x: Array, scale: int) -> Array:
    """[..., H, W, C] -> [..., H*s, W*s, C] (reference utils/ops version)."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = jnp.repeat(x, scale, axis=h_axis)
    return jnp.repeat(x, scale, axis=w_axis)
