"""Pallas kernels vs jnp reference vs numpy oracle (pallas == jnp == numpy,
SURVEY.md §5). On CPU these run in interpreter mode; the same assertions
run compiled on real TPU via tools/tpu_kernel_check.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.geometry import box_ops, np_box_ops
from mtlx.kernels import iou_pallas, nms_pallas
from mtlx.ops import nms as nms_ref

RNG = np.random.RandomState(42)


def random_boxes(n, scale=100.0):
    ymin = RNG.uniform(0, scale, n)
    xmin = RNG.uniform(0, scale, n)
    h = RNG.uniform(1, scale / 2, n)
    w = RNG.uniform(1, scale / 2, n)
    return np.stack([ymin, xmin, ymin + h, xmin + w], axis=1).astype(np.float32)


def test_iou_pallas_matches_oracle():
    b1, b2 = random_boxes(37), random_boxes(211)
    got = np.asarray(
        iou_pallas.iou_matrix(jnp.asarray(b1), jnp.asarray(b2), interpret=True)
    )
    want = np_box_ops.iou(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_iou_pallas_matches_jnp_large():
    b1, b2 = random_boxes(512), random_boxes(384)
    got = np.asarray(
        iou_pallas.iou_matrix(jnp.asarray(b1), jnp.asarray(b2), interpret=True)
    )
    want = np.asarray(box_ops.iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_iou_pallas_degenerate_boxes():
    b1 = np.zeros((3, 4), np.float32)
    b2 = random_boxes(5)
    got = np.asarray(
        iou_pallas.iou_matrix(jnp.asarray(b1), jnp.asarray(b2), interpret=True)
    )
    assert (got == 0).all()


@pytest.mark.parametrize("n,max_out,thr", [(40, 10, 0.5), (200, 32, 0.7), (64, 64, 0.3)])
@pytest.mark.smoke
def test_nms_pallas_matches_reference(n, max_out, thr):
    boxes = random_boxes(n)
    scores = RNG.uniform(0, 1, n).astype(np.float32)
    ref_idx, ref_keep = nms_ref.non_max_suppression_padded(
        jnp.asarray(boxes), jnp.asarray(scores), max_out, iou_threshold=thr
    )
    got_idx, got_keep = nms_pallas.non_max_suppression_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), max_out, iou_threshold=thr,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_keep), np.asarray(ref_keep))
    np.testing.assert_array_equal(
        np.asarray(got_idx)[np.asarray(got_keep)],
        np.asarray(ref_idx)[np.asarray(ref_keep)],
    )


def test_nms_pallas_score_threshold_and_mask():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.1])
    idx, keep = nms_pallas.non_max_suppression_pallas(
        boxes, scores, 3, iou_threshold=0.5, score_threshold=0.5,
        valid_mask=jnp.asarray([True, False, True]), interpret=True,
    )
    assert np.asarray(idx)[np.asarray(keep)].tolist() == [0]


def test_fused_roi_crop_matches_mxu_interpret():
    """roi_pallas fused crop == crop_and_resize_mxu (interpret mode; the
    compiled-on-TPU check + timing lives in tools/tpu_kernel_check.py)."""
    from mtlx.kernels import roi_pallas
    from mtlx.ops.roi import crop_and_resize_mxu, _interp_matrix

    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.normal(0, 1, (16, 16, 8)), jnp.float32)
    y0 = rs.uniform(0, 0.5, 4)
    x0 = rs.uniform(0, 0.5, 4)
    boxes = jnp.asarray(
        np.stack([y0, x0, y0 + 0.4, x0 + 0.4], 1), jnp.float32
    )
    wy = _interp_matrix(boxes[:, 0], boxes[:, 2], 6, 16)
    wx = _interp_matrix(boxes[:, 1], boxes[:, 3], 6, 16)
    # run the pallas kernels in interpret mode directly
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    got = pl.pallas_call(
        roi_pallas._fwd_kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((16, 16, 8), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 6, 6, 8), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 6, 6, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, 16, 8), jnp.float32)],
        interpret=True,
    )(img, wy, wx)
    want = crop_and_resize_mxu(img, boxes, (6, 6))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
