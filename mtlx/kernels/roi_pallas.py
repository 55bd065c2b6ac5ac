"""Pallas TPU kernel: fused separable ROI crop (crop_and_resize).

The MXU formulation in mtlx.ops.roi materializes a [N, ch, W, C]
intermediate in HBM (the dominant second-stage traffic — ~73 MB per image
at 640^2/64 ROIs). This kernel keeps that intermediate in VMEM: per-ROI
grid step, the feature map stays resident, tmp = Wy @ img lives in
scratch, and only the [ch, cw, C] crop is written out.

Gradients: boxes are stop-gradient everywhere this kernel is used
(proposals / GT windows), so the custom VJP returns a zero cotangent for
the interpolation matrices and computes only d(image) — accumulated over
the ROI grid in the kernel's output block.

Validated against crop_and_resize_mxu (which is validated against the TF
gather contract and the numpy transcription).

MEASURED VERDICT (v5e, 40x40x1024 map, 64 ROIs, batch 16 fwd+bwd): this
kernel is exact (fwd bit-equal, bwd ~1% bf16 rounding) but 2x SLOWER than
the XLA einsum form (10.3 ms vs 5.4 ms): the per-ROI grid makes M=14
matmuls that waste the 128-row MXU, while XLA batches every ROI into one
[N*ch, H] x [H, W*C] GEMM and pipelines the HBM intermediate well. The
einsum formulation in mtlx.ops.roi remains the production path; this
kernel is kept as validated infrastructure + the record of why (same
story as iou_pallas: measure before replacing XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlx.ops.roi import _interp_matrix


def _fwd_kernel(img_ref, wy_ref, wx_ref, out_ref, tmp_ref):
    # img: [H, W, C]; wy: [1, ch, H]; wx: [1, cw, W]; out: [1, ch, cw, C]
    h, w, c = img_ref.shape
    ch = wy_ref.shape[1]
    cw = wx_ref.shape[1]
    # tmp[y, w, c] = sum_h wy[y, h] img[h, w, c]
    tmp_ref[:] = jax.lax.dot_general(
        wy_ref[0],
        img_ref[:].reshape(h, w * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ch, w, c).astype(tmp_ref.dtype)
    # out[y, x, c] = sum_w wx[x, w] tmp[y, w, c]
    for y in range(ch):  # static unroll (ch is small, e.g. 14)
        out_ref[0, y] = jax.lax.dot_general(
            wx_ref[0],
            tmp_ref[y],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _bwd_kernel(dout_ref, wy_ref, wx_ref, dimg_ref, tmp_ref):
    # dtmp[y, w, c] = sum_x wx[x, w] dout[y, x, c]
    n = pl.program_id(0)
    h, w, c = dimg_ref.shape
    ch = dout_ref.shape[1]

    @pl.when(n == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    for y in range(ch):
        tmp_ref[y] = jax.lax.dot_general(
            wx_ref[0],
            dout_ref[0, y],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(tmp_ref.dtype)
    # dimg[h, w, c] += sum_y wy[y, h] dtmp[y, w, c]
    upd = jax.lax.dot_general(
        wy_ref[0],
        tmp_ref[:].reshape(ch, w * c),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(h, w, c)
    dimg_ref[:] = dimg_ref[:] + upd.astype(dimg_ref.dtype)


def _crop_fwd(image: Array, wy: Array, wx: Array) -> Array:
    h, w, c = image.shape
    n, ch, _ = wy.shape
    cw = wx.shape[1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cw, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ch, cw, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, ch, cw, c), image.dtype),
        scratch_shapes=[pltpu.VMEM((ch, w, c), image.dtype)],
    )(image, wy, wx)


def _crop_bwd_image(dout: Array, wy: Array, wx: Array, h: int, w: int) -> Array:
    n, ch, cw, c = dout.shape
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ch, cw, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cw, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (h, w, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w, c), dout.dtype),
        scratch_shapes=[pltpu.VMEM((ch, w, c), dout.dtype)],
    )(dout, wy, wx)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _crop_core(image, wy, wx):
    return _crop_fwd(image, wy, wx)


def _crop_core_fwd(image, wy, wx):
    return _crop_fwd(image, wy, wx), (wy, wx, image.shape)


def _crop_core_bwd(res, g):
    wy, wx, (h, w, c) = res
    dimg = _crop_bwd_image(g, wy, wx, h, w)
    # boxes are stop-gradient at every call site; interpolation-matrix
    # cotangents are structurally zero here
    return dimg, jnp.zeros_like(wy), jnp.zeros_like(wx)


_crop_core.defvjp(_crop_core_fwd, _crop_core_bwd)


def crop_and_resize_fused(image: Array, boxes: Array, crop_size,
                          extrapolation_value: float = 0.0) -> Array:
    """Drop-in for mtlx.ops.roi.crop_and_resize_mxu on TPU (one image)
    for the default extrapolation_value=0.0 (out-of-range samples read
    zero, which the interp-matrix form produces implicitly); other fill
    values are not implemented in this kernel."""
    if extrapolation_value != 0.0:
        raise NotImplementedError(
            "crop_and_resize_fused supports extrapolation_value=0.0 only; "
            "use mtlx.ops.roi.crop_and_resize_mxu for other fills"
        )
    h, w, _ = image.shape
    ch, cw = crop_size
    y1, x1, y2, x2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    wy = _interp_matrix(y1, y2, ch, h).astype(image.dtype)
    wx = _interp_matrix(x1, x2, cw, w).astype(image.dtype)
    return _crop_core(image, wy, wx)
