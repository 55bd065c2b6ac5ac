"""ROI feature cropping — TF `crop_and_resize` semantics in pure jnp.

Replaces the native `tf.image.crop_and_resize` kernel the reference's
second stage depends on (faster_rcnn_meta_arch `initial_crop_size`,
SURVEY.md §3.12 / §8 hard-part 4). TF's corner convention differs from
ROI-align: normalized box corners map to PIXEL CENTERS of the source image
(y1 * (H-1) .. y2 * (H-1)), sampling is bilinear on a uniform grid of
crop_size points INCLUSIVE of both corners, and out-of-range samples take
`extrapolation_value` (0). mAP parity with TF checkpoints depends on
matching this exactly, so this is the contract the Pallas kernel
(mtlx.kernels.roi_pallas) is tested against.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array


def _sample_coords(c0: Array, c1: Array, size: int, limit: int):
    """Per-box 1-D sample coordinates, TF crop_and_resize convention."""
    if size > 1:
        step = (c1 - c0) * (limit - 1) / (size - 1)  # [N]
        coords = c0[:, None] * (limit - 1) + step[:, None] * jnp.arange(
            size, dtype=c0.dtype
        )
    else:
        coords = 0.5 * (c0 + c1)[:, None] * (limit - 1)
    return coords  # [N, size]


def crop_and_resize(
    image: Array,
    boxes: Array,
    crop_size: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> Array:
    """Crop + bilinearly resize regions from one image.

    Args:
      image: [H, W, C].
      boxes: [N, 4] normalized [y1, x1, y2, x2] (may exceed [0, 1]).
      crop_size: (crop_h, crop_w).

    Returns: [N, crop_h, crop_w, C].
    """
    h, w, _ = image.shape
    ch, cw = crop_size
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))
    ys = _sample_coords(y1, y2, ch, h)  # [N, ch]
    xs = _sample_coords(x1, x2, cw, w)  # [N, cw]

    def sample_axis(coords, limit):
        lo = jnp.floor(coords)
        frac = coords - lo
        lo_i = jnp.clip(lo.astype(jnp.int32), 0, limit - 1)
        hi_i = jnp.clip(lo_i + 1, 0, limit - 1)
        in_range = (coords >= 0.0) & (coords <= limit - 1)
        return lo_i, hi_i, frac, in_range

    y_lo, y_hi, y_frac, y_in = sample_axis(ys, h)
    x_lo, x_hi, x_frac, x_in = sample_axis(xs, w)

    def gather2d(yi, xi):
        # yi: [N, ch], xi: [N, cw] -> [N, ch, cw, C]
        rows = image[yi]  # [N, ch, W, C]
        return jnp.take_along_axis(rows, xi[:, None, :, None], axis=2)

    tl = gather2d(y_lo, x_lo)
    tr = gather2d(y_lo, x_hi)
    bl = gather2d(y_hi, x_lo)
    br = gather2d(y_hi, x_hi)

    yf = y_frac[:, :, None, None]
    xf = x_frac[:, None, :, None]
    top = tl + (tr - tl) * xf
    bottom = bl + (br - bl) * xf
    out = top + (bottom - top) * yf

    valid = (y_in[:, :, None] & x_in[:, None, :])[..., None]
    return jnp.where(valid, out, extrapolation_value)


def _interp_matrix(c0: Array, c1: Array, size: int, limit: int) -> Array:
    """Per-box 1-D bilinear interpolation matrix [N, size, limit].

    Row i holds the two bilinear taps for output coordinate i (TF
    crop_and_resize convention, zeros when the sample falls outside).
    """
    coords = _sample_coords(c0, c1, size, limit)  # [N, size]
    lo = jnp.floor(coords)
    frac = coords - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, limit - 1)
    hi_i = jnp.clip(lo_i + 1, 0, limit - 1)
    in_range = ((coords >= 0.0) & (coords <= limit - 1)).astype(coords.dtype)
    eye = jnp.eye(limit, dtype=coords.dtype)
    w_lo = jnp.take(eye, lo_i, axis=0) * ((1.0 - frac) * in_range)[..., None]
    w_hi = jnp.take(eye, hi_i, axis=0) * (frac * in_range)[..., None]
    return w_lo + w_hi  # [N, size, limit]


def crop_and_resize_mxu(
    image: Array,
    boxes: Array,
    crop_size: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> Array:
    """MXU-native crop_and_resize: bilinear resampling is separable, so the
    crop is two matmuls per box — Wy [ch, H] contracting the image rows,
    then Wx [cw, W] contracting the columns. On TPU this runs on the
    systolic array instead of the (slow, HBM-bound) gather path; exact
    same TF contract as `crop_and_resize` (tested to ~1e-5).
    """
    h, w, _ = image.shape
    ch, cw = crop_size
    dt = image.dtype
    y1, x1, y2, x2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    wy = _interp_matrix(y1, y2, ch, h).astype(dt)  # [N, ch, H]
    wx = _interp_matrix(x1, x2, cw, w).astype(dt)  # [N, cw, W]
    # Keep the [N, ch, W, C] intermediate in the input dtype: in bf16 it is
    # the dominant HBM traffic of the whole second stage (fp32 doubled it;
    # the MXU accumulates in fp32 internally either way).
    tmp = jnp.einsum("nyh,hwc->nywc", wy, image, preferred_element_type=dt)
    # [N, cw, W] x [N, ch, W, C] -> [N, ch, cw, C]
    out = jnp.einsum("nxw,nywc->nyxc", wx, tmp, preferred_element_type=dt)
    if extrapolation_value != 0.0:
        # matmul path zero-fills out-of-range taps; offset if caller wants
        # a different extrapolation value
        mask_y = jnp.sum(wy, axis=-1) > 0  # [N, ch]
        mask_x = jnp.sum(wx, axis=-1) > 0  # [N, cw]
        valid = (mask_y[:, :, None] & mask_x[:, None, :])[..., None]
        out = jnp.where(valid, out, extrapolation_value)
    return out


def mean_pooled_crop(
    image: Array, boxes: Array, crop_size: Tuple[int, int] = (7, 7)
) -> Array:
    """Exactly `crop_and_resize(image, boxes, crop_size).mean(axis=(1,2))`
    WITHOUT materializing the crop. Average-pooling a bilinear resample is
    a linear functional of the source, so the whole thing collapses to two
    vector contractions with the per-box mean interpolation weights:

        pooled[n, c] = (mean_y Wy[n])·X·(mean_x Wx[n])

    This removes the [N, crop_h, W, C] intermediate — the dominant HBM
    traffic of the MTL aux/refine pooled-window paths (bench.py phase
    decomposition) — while keeping the contraction on the MXU.
    Returns [N, C].
    """
    h, w, _ = image.shape
    ch, cw = crop_size
    dt = image.dtype
    y1, x1, y2, x2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    ry = jnp.mean(_interp_matrix(y1, y2, ch, h), axis=1).astype(dt)  # [N, H]
    rx = jnp.mean(_interp_matrix(x1, x2, cw, w), axis=1).astype(dt)  # [N, W]
    tmp = jnp.einsum("nh,hwc->nwc", ry, image, preferred_element_type=dt)
    return jnp.einsum("nw,nwc->nc", rx, tmp, preferred_element_type=dt)


def batch_crop_and_resize(
    images: Array, boxes: Array, crop_size: Tuple[int, int], use_mxu: bool = True, **kw
) -> Array:
    """[B, H, W, C] x [B, N, 4] -> [B, N, ch, cw, C] (per-image boxes)."""
    fn = crop_and_resize_mxu if use_mxu else crop_and_resize
    return jax.vmap(lambda img, b: fn(img, b, crop_size, **kw))(images, boxes)


def position_sensitive_crop_regions(
    image: Array,
    boxes: Array,
    crop_size: Tuple[int, int],
    num_spatial_bins: Tuple[int, int],
    global_pool: bool = True,
) -> Array:
    """Position-sensitive crop for R-FCN (reference utils/ops.py
    position_sensitive_crop_regions).

    The C = bins_y * bins_x * depth channels are split into one depth-group
    per spatial bin; each bin crops ONLY its own channel group over its own
    sub-window of the box, then bins are reassembled (or average-pooled when
    global_pool=True).

    Returns [N, depth] if global_pool else [N, crop_h, crop_w, depth] with
    crop_size the per-bin crop size times bins.
    """
    bins_y, bins_x = num_spatial_bins
    total_bins = bins_y * bins_x
    if image.shape[-1] % total_bins:
        # the reference raises too: a silent floor division would
        # mis-group the per-bin channel assignment and train with
        # scrambled bins
        raise ValueError(
            f"channel count {image.shape[-1]} is not divisible by "
            f"num_spatial_bins {bins_y}x{bins_x}={total_bins}"
        )
    depth = image.shape[-1] // total_bins
    ch, cw = crop_size
    if ch % bins_y or cw % bins_x:
        raise ValueError("crop_size must be divisible by num_spatial_bins")
    bin_ch, bin_cw = ch // bins_y, cw // bins_x

    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))
    step_y = (y2 - y1) / bins_y
    step_x = (x2 - x1) / bins_x

    outputs = []
    for by in range(bins_y):
        row = []
        for bx in range(bins_x):
            bin_idx = by * bins_x + bx
            sub_boxes = jnp.stack(
                [
                    y1 + by * step_y,
                    x1 + bx * step_x,
                    y1 + (by + 1) * step_y,
                    x1 + (bx + 1) * step_x,
                ],
                axis=1,
            )
            group = image[..., bin_idx * depth : (bin_idx + 1) * depth]
            crop = crop_and_resize(group, sub_boxes, (bin_ch, bin_cw))
            if global_pool:
                crop = jnp.mean(crop, axis=(1, 2))  # [N, depth]
            row.append(crop)
        outputs.append(row)
    if global_pool:
        return jnp.mean(jnp.stack([c for r in outputs for c in r]), axis=0)
    return jnp.concatenate(
        [jnp.concatenate(r, axis=2) for r in outputs], axis=1
    )
