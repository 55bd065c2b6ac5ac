"""Pallas TPU kernel: greedy non-max suppression.

NMS is the sequential hotspot of both detector stages (SURVEY.md §3.12,
§8 hard-part 1). The XLA reference (mtlx.ops.nms) runs the greedy loop as
a lax.fori_loop whose carry bounces through HBM every iteration; this
kernel keeps scores and the coordinate planes resident in VMEM for the
whole loop — each iteration is one VPU argmax + one vectorized suppression
over the lane dimension.

TPU lowering constraints shape the code: scalar reads go through ref
indexing (no dynamic_slice on values) and outputs are written as full-
vector masked stores (no scalar stores to VMEM) — selections accumulate
into [1, max_out] rows via `where(out_col == i, ...)`.

Exactness: identical selection order to the jnp reference and the numpy
greedy oracle (ties broken by first index), so mAP is bit-identical
whichever implementation runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e10


def _nms_kernel(
    boxes_ref,  # [4, N] VMEM (ymin, xmin, ymax, xmax planes)
    scores_ref,  # [1, N] VMEM
    idx_ref,  # [1, MAXOUT] int32 out
    keep_ref,  # [1, MAXOUT] int32 out
    live_ref,  # [1, N] f32 scratch
    *,
    iou_threshold: float,
    max_out: int,
):
    n = scores_ref.shape[1]
    live_ref[:] = scores_ref[:]
    idx_ref[:] = jnp.zeros_like(idx_ref)
    keep_ref[:] = jnp.zeros_like(keep_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, idx_ref.shape[1]), 1)

    ymin = boxes_ref[0:1, :]
    xmin = boxes_ref[1:2, :]
    ymax = boxes_ref[2:3, :]
    xmax = boxes_ref[3:4, :]
    area = (ymax - ymin) * (xmax - xmin)

    def body(i, _):
        live = live_ref[:]
        # scalar extraction via reductions only — Mosaic cannot lower a
        # dynamic lane-indexed load, so the winner and its coordinates are
        # obtained with max / masked-sum reductions
        best_score = jnp.max(live)
        valid = best_score > _NEG / 2
        best = jnp.min(jnp.where(live == best_score, col, n)).astype(jnp.int32)
        onehot = (col == best).astype(jnp.float32)

        by0 = jnp.sum(ymin * onehot)
        bx0 = jnp.sum(xmin * onehot)
        by1 = jnp.sum(ymax * onehot)
        bx1 = jnp.sum(xmax * onehot)
        barea = (by1 - by0) * (bx1 - bx0)

        ih = jnp.maximum(0.0, jnp.minimum(ymax, by1) - jnp.maximum(ymin, by0))
        iw = jnp.maximum(0.0, jnp.minimum(xmax, bx1) - jnp.maximum(xmin, bx0))
        inter = ih * iw
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-30), 0.0)

        suppress = (iou > iou_threshold) | (col == best)
        live_ref[:] = jnp.where(valid & suppress, _NEG, live)

        # full-vector masked stores (no scalar stores to VMEM on TPU)
        slot = out_col == i
        idx_ref[:] = jnp.where(slot & valid, best, idx_ref[:])
        keep_ref[:] = jnp.where(slot & valid, 1, keep_ref[:])
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@functools.partial(
    jax.jit, static_argnames=("max_output_size", "iou_threshold", "interpret")
)
def non_max_suppression_pallas(
    boxes: Array,
    scores: Array,
    max_output_size: int,
    iou_threshold: float = 0.5,
    score_threshold: float = float("-inf"),
    valid_mask: Array | None = None,
    interpret: bool = False,
):
    """Drop-in for mtlx.ops.nms.non_max_suppression_padded on TPU.

    Returns (indices [max_output_size] int32, keep [max_output_size] bool).
    """
    n = boxes.shape[0]
    npad = max(-(-n // 128) * 128, 128)
    kpad = max(-(-max_output_size // 128) * 128, 128)
    live = scores.astype(jnp.float32)
    if valid_mask is not None:
        live = jnp.where(valid_mask, live, _NEG)
    live = jnp.where(live > score_threshold, live, _NEG)
    planes = jnp.zeros((4, npad), jnp.float32).at[:, :n].set(
        boxes.astype(jnp.float32).T
    )
    scores_p = jnp.full((1, npad), _NEG, jnp.float32).at[0, :n].set(live)

    idx, keep = pl.pallas_call(
        functools.partial(
            _nms_kernel, iou_threshold=iou_threshold, max_out=max_output_size
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, kpad), jnp.int32),
            jax.ShapeDtypeStruct((1, kpad), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, npad), jnp.float32)],
        interpret=interpret,
    )(planes, scores_p)
    return (
        idx[0, :max_output_size],
        keep[0, :max_output_size].astype(bool),
    )
