"""Non-max suppression — static-shape jnp reference implementations.

Replaces the reference's use of the native `tf.image.non_max_suppression`
kernel inside `core/post_processing.py` (SURVEY.md §3.1, §3.12). TPU-first
design: greedy NMS as a `lax.fori_loop` over output slots with vectorized
IoU suppression — fixed shapes, no data-dependent control flow, jit/vmap
safe. The Pallas kernel in `mtlx.kernels.nms_pallas` is validated against
these functions.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from mtlx.geometry import box_ops

_NEG = -1e10

# None = auto (Pallas kernel on TPU backends, jnp elsewhere);
# True/False force it for benchmarking and debugging.
USE_PALLAS: Optional[bool] = None


_warned_fallback = False


def _pallas_enabled() -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    backend = jax.default_backend()
    enabled = backend in ("tpu", "axon")
    # warn once if a TPU-ish backend name we don't recognize falls back to
    # the slow jnp path — this is the production dispatch for the hottest
    # kernel and a silent fallback is a silent 2x NMS slowdown
    global _warned_fallback
    if not enabled and not _warned_fallback and "tpu" in backend.lower():
        import warnings

        warnings.warn(
            f"backend {backend!r} looks like a TPU but is not in the Pallas "
            "dispatch allowlist; using the slower jnp NMS. Set "
            "mtlx.ops.nms.USE_PALLAS = True to force the Pallas kernel.",
            stacklevel=3,
        )
        _warned_fallback = True
    return enabled


def non_max_suppression_padded(
    boxes: Array,
    scores: Array,
    max_output_size: int,
    iou_threshold: float = 0.5,
    score_threshold: float = float("-inf"),
    valid_mask: Optional[Array] = None,
    batched: bool = True,
):
    """Greedy single-class NMS with padded output.

    Dispatches to the Pallas TPU kernel (mtlx.kernels.nms_pallas — same
    selection order, VMEM-resident loop) on TPU backends; the jnp
    implementation below is the reference and the CPU path.

    Args:
      boxes: [N, 4]; scores: [N]; valid_mask: [N] bool (padding rows False).
      batched: trace-time hint from the caller — True when this call is
        vmapped over a batch (vmap hides the batch from this function).
        The r5 crossover sweep splits the RPN shape by batch: chunked
        1.19 ms vs Pallas 3.58 at 6000->300 b16, but Pallas 0.22 vs
        chunked 0.42 at b1, so single-image serving keeps the kernel.

    Returns:
      indices: [max_output_size] int32 indices into boxes (0-padded),
      keep_mask: [max_output_size] bool validity of each output slot.
    """
    n = boxes.shape[0]
    use_chunked = USE_CHUNKED
    if use_chunked is None:
        use_chunked = batched and n >= _CHUNKED_MIN_N
    if use_chunked:
        live = scores
        if valid_mask is not None:
            live = jnp.where(valid_mask, live, _NEG)
        live = jnp.where(live > score_threshold, live, _NEG)
        return _nms_priority_chunked(
            boxes, live, max_output_size, iou_threshold
        )
    if _pallas_enabled():
        from mtlx.kernels import nms_pallas

        return nms_pallas.non_max_suppression_pallas(
            boxes,
            scores,
            max_output_size,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
            valid_mask=valid_mask,
        )
    live = scores
    if valid_mask is not None:
        live = jnp.where(valid_mask, live, _NEG)
    live = jnp.where(live > score_threshold, live, _NEG)

    def body(i, state):
        live_scores, indices, keep = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > _NEG / 2
        best_box = boxes[best]
        ious = box_ops.iou(best_box[None, :], boxes)[0]  # [N]
        suppress = ious > iou_threshold
        live_scores = jnp.where(
            valid & (suppress | (jnp.arange(n) == best)), _NEG, live_scores
        )
        indices = indices.at[i].set(jnp.where(valid, best, 0).astype(jnp.int32))
        keep = keep.at[i].set(valid)
        return live_scores, indices, keep

    indices = jnp.zeros((max_output_size,), dtype=jnp.int32)
    keep = jnp.zeros((max_output_size,), dtype=bool)
    _, indices, keep = jax.lax.fori_loop(0, max_output_size, body, (live, indices, keep))
    return indices, keep


# Fixed-point NMS (exact greedy survivors via suppression-chain iteration)
# is used inside multiclass NMS when the per-class candidate count is small
# enough that the [K, N, N] suppression matrix is cheap. Greedy NMS runs
# max_output sequential steps (100 for the FRCNN second stage); the fixed
# point converges in O(longest suppression chain) steps — typically <16 —
# because box i is suppressed iff some higher-priority SURVIVOR overlaps
# it, and survivor-hood propagates one chain level per sweep. The
# resulting survivor set is exactly greedy's (proof: induction over the
# priority order; the while_loop iterates to convergence, never a fixed
# sweep count). None = auto (on when the suppression matrix is cheap),
# True/False force.
USE_FIXED_POINT: Optional[bool] = None
_FIXED_POINT_MAX_ELEMS = 4_000_000  # live bool-matrix budget per chunk
# COCO-scale class counts chunk the [K, N, N] matrix over class blocks
# (lax.map — sequential); auto mode only accepts a few blocks, because
# past that the serialization loses to the vmapped greedy loop (SSD's
# N=1917 x 90 classes would be 90 sequential solves).
_FIXED_POINT_MAX_BLOCKS = 8


def _greedy_survivors_fixed_point(
    boxes: Array,  # [K, N, 4]
    scores: Array,  # [K, N]
    live0: Array,  # [K, N] bool — valid & above score threshold
    iou_threshold: float,
    shared_boxes: bool = False,
    iou: Optional[Array] = None,
) -> Array:
    """Exact greedy-NMS survivor mask [K, N] for all K classes at once.

    Priority = (score desc, index asc), matching jnp.argmax/TF tie order.
    j suppresses i iff priority(j) > priority(i), IoU > threshold, and j
    itself survives — iterated to a fixed point, which is the unique
    greedy solution (selection order never matters for the surviving SET).

    shared_boxes: every class row of `boxes` is the same box set (Q==1
    multiclass NMS) — compute the IoU matrix once and broadcast instead
    of K identical [N, N] matrices.

    iou: optional precomputed pairwise-IoU matrix ([K, N, N], or
    [1, N, N] when shared) — the class-chunked driver below computes the
    shared matrix once and reuses it for every chunk.
    """
    n = boxes.shape[-2]
    if iou is None:
        if shared_boxes:
            iou = box_ops.iou(boxes[0], boxes[0])[None]  # [1,N,N] broadcasts
        else:
            iou = jax.vmap(lambda b: box_ops.iou(b, b))(boxes)  # [K, N, N]
    s_j = scores[:, :, None]
    s_i = scores[:, None, :]
    idx = jnp.arange(n)
    higher = (s_j > s_i) | ((s_j == s_i) & (idx[:, None] < idx[None, :]))
    # S[k, j, i]: candidate j can suppress i (if j survives)
    suppressor = (iou > iou_threshold) & higher & live0[:, :, None]

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        alive, _ = state
        suppressed = jnp.any(suppressor & alive[:, :, None], axis=1)
        new_alive = live0 & ~suppressed
        return new_alive, jnp.any(new_alive != alive)

    alive, _ = jax.lax.while_loop(cond, body, (live0, jnp.asarray(True)))
    return alive


def _greedy_survivors_class_chunked(
    boxes: Array,  # [K, N, 4]
    scores: Array,  # [K, N]
    live0: Array,  # [K, N] bool
    iou_threshold: float,
    shared_boxes: bool,
) -> Array:
    """Fixed-point survivors with the [K, N, N] suppression matrix
    bounded to _FIXED_POINT_MAX_ELEMS by chunking classes through
    `lax.map` — COCO-scale K (90 classes x N=300 -> 8.1M bools) keeps the
    fixed-point postprocess instead of silently falling back to the
    3.2x-slower sequential greedy loop. Classes are independent in
    per-class NMS, so block results concatenate exactly.
    """
    num_classes, n = scores.shape
    chunk = max(1, min(num_classes, _FIXED_POINT_MAX_ELEMS // max(n * n, 1)))
    if chunk >= num_classes:
        return _greedy_survivors_fixed_point(
            boxes, scores, live0, iou_threshold, shared_boxes=shared_boxes
        )
    blocks = -(-num_classes // chunk)
    pad = blocks * chunk - num_classes  # padded rows: live0 False => alive False
    scores_b = jnp.pad(scores, ((0, pad), (0, 0))).reshape(blocks, chunk, n)
    live_b = jnp.pad(live0, ((0, pad), (0, 0))).reshape(blocks, chunk, n)
    if shared_boxes:
        iou = box_ops.iou(boxes[0], boxes[0])[None]  # once, reused per chunk
        alive_b = jax.lax.map(
            lambda sl: _greedy_survivors_fixed_point(
                boxes[:1], sl[0], sl[1], iou_threshold,
                shared_boxes=True, iou=iou,
            ),
            (scores_b, live_b),
        )
    else:
        boxes_b = jnp.pad(boxes, ((0, pad), (0, 0), (0, 0))).reshape(
            blocks, chunk, n, 4
        )
        alive_b = jax.lax.map(
            lambda xs: _greedy_survivors_fixed_point(
                xs[0], xs[1], xs[2], iou_threshold
            ),
            (boxes_b, scores_b, live_b),
        )
    return alive_b.reshape(blocks * chunk, n)[:num_classes]


# Priority-chunked fixed point for LARGE single-class candidate sets
# (the RPN's 6000-candidate NMS): process candidates in score-descending
# chunks; each chunk solves one [C, C] fixed point after masking out
# candidates suppressed by already-selected survivors, and the loop
# exits as soon as max_output survivors exist. Exact greedy semantics:
# chunks are priority prefixes, so a candidate's fate depends only on
# candidates in its own or earlier chunks, and greedy never looks past
# its max_output-th pick. None = auto (chunked when N >= _CHUNKED_MIN_N),
# True/False force.
#
# Constants set from the r5 on-chip crossover sweep (ROADMAP round-5
# table): chunked wins every batched N >= 2048 row (6000->300 b16:
# 1.19 ms vs Pallas 3.58, greedy 12.13; 2048->300 b16: 0.90 vs 2.84 /
# 3.51). Below 2048 the Pallas kernel / greedy loop hold the batched
# mid-window (1024: greedy 0.76*; 1917: Pallas 0.96*) and Pallas wins
# the b1 RPN-serving shape (6000->300 b1: 0.22 vs chunked 0.42) — but
# dispatch is per-sample (batch invisible under vmap), so the threshold
# favors the train/batched case where the milliseconds actually are.
USE_CHUNKED: Optional[bool] = None
_CHUNKED_MIN_N = 2048
_CHUNK_SIZE = 1024


def _nms_priority_chunked(
    boxes: Array,  # [N, 4]
    scores: Array,  # [N] — already _NEG-masked for invalid/thresholded
    max_output_size: int,
    iou_threshold: float,
):
    """Exact greedy NMS via score-ordered chunks of fixed-point solves.

    Returns (indices [max_output_size] int32 0-padded, keep mask) with
    the same contract as non_max_suppression_padded. Replaces the
    max_output_size-step sequential greedy loop with ~1 (rarely 2+)
    [C, C] matrix fixed points: the RPN's 6000->300 selection typically
    finds all 300 survivors in the first 1024-candidate chunk
    (SURVEY.md §3.1 first_stage NMS; [U] core/post_processing.py).
    """
    n = boxes.shape[0]
    p = max_output_size
    chunk = min(_CHUNK_SIZE, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    # full priority sort (scores desc, index asc — lax.top_k tie order);
    # the padding rows sort last with _NEG scores. Boxes are gathered
    # per chunk in the body, not upfront: the whole-array gather is the
    # dominant cost of the sorted layout (measured on the multiclass
    # variant: 11.5 of 14.1 ms at N=1917), and early exit usually
    # visits a single chunk.
    order_scores, order = jax.lax.top_k(scores, n)
    sscores = jnp.pad(order_scores, (0, pad), constant_values=_NEG)
    sidx = jnp.pad(order.astype(jnp.int32), (0, pad))

    def cond(state):
        ci, _, buf_scores, _, count = state
        return (ci < n_chunks) & (count < p)

    def body(state):
        ci, buf_boxes, buf_scores, buf_idx, _ = state
        start = ci * chunk
        cs = jax.lax.dynamic_slice(sscores, (start,), (chunk,))
        cidx = jax.lax.dynamic_slice(sidx, (start,), (chunk,))
        cb = jnp.take(boxes, cidx, axis=0)
        live0 = cs > _NEG / 2
        # suppression by survivors carried from earlier (higher-priority)
        # chunks — all of them, since the loop only runs while count < p
        carried = buf_scores > _NEG / 2
        iou_carry = box_ops.iou(buf_boxes, cb)  # [P, C]
        live0 &= ~jnp.any((iou_carry > iou_threshold) & carried[:, None],
                          axis=0)
        alive = _greedy_survivors_fixed_point(
            cb[None], cs[None], live0[None], iou_threshold
        )[0]
        surv_scores = jnp.where(alive, cs, _NEG)
        # merge: chunk candidates all rank below every carried survivor
        # (score-sorted chunks; concat order keeps buf first so top_k's
        # lower-index tie rule preserves cross-chunk priority)
        all_scores = jnp.concatenate([buf_scores, surv_scores])
        top_scores, sel = jax.lax.top_k(all_scores, p)
        buf_boxes = jnp.take(
            jnp.concatenate([buf_boxes, cb], axis=0), sel, axis=0
        )
        buf_idx = jnp.take(jnp.concatenate([buf_idx, cidx]), sel)
        count = jnp.sum(top_scores > _NEG / 2).astype(jnp.int32)
        return ci + 1, buf_boxes, top_scores, buf_idx, count

    state = (
        jnp.asarray(0, jnp.int32),
        jnp.zeros((p, 4), boxes.dtype),
        jnp.full((p,), _NEG, scores.dtype),
        jnp.zeros((p,), jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    _, _, buf_scores, buf_idx, _ = jax.lax.while_loop(cond, body, state)
    keep = buf_scores > _NEG / 2
    return jnp.where(keep, buf_idx, 0), keep


# Class-parallel priority chunking for LARGE multiclass candidate sets
# (SSD's N=1917 x K=20 serving postprocess): every class marches through
# score-descending candidate chunks TOGETHER — one [K, C, C] fixed-point
# solve per chunk instead of K sequential class blocks (class-chunked fp)
# or K vmapped max_out-step greedy loops. The loop exits as soon as every
# class holds max_size_per_class survivors, which at detection operating
# points is typically after the first chunk. Exactness: chunks are
# per-class priority prefixes (full per-class sort first), carried
# survivors are complete while any class is below its quota, and the
# score-ordered merge drops any late survivor that greedy would never
# have reached — the same argument as `_nms_priority_chunked`, applied
# per class. None = auto (on when N >= _MC_CHUNKED_MIN_N, where the
# class-chunked fixed point's lax.map serializes); True/False force.
USE_MC_CHUNKED: Optional[bool] = None
_MC_CHUNKED_MIN_N = 1536
# chunk 128 measured best on-chip at the SSD serving point (r5 sweep,
# ROADMAP crossover table: b32 mcc64 15.0 / mcc128 14.1 / mcc256 15.4 /
# mcc512 21.8 ms)
_MC_CHUNK_SIZE = 128
# Retired XLA codegen fence (ROADMAP r5 #2/#3): with the OLD loop body
# (upfront [K, N, 4] sorted-box gather + dynamic_slice per chunk),
# chunk 128 at K=90 b>=8 reliably killed the v5e TPU worker (3/3
# isolated repros, tools/mcc_crash_probe.py), so K >= 46 was fenced up
# to the measured-safe chunk 256. The per-chunk gather body (r5 #3)
# removed the faulting dynamic-slice-of-gathered-boxes pattern and runs
# clean at the exact crash shape (b8 6x, b32 3x isolated repeats, same
# checksums) at HALF the fenced cost (4.40 vs 8.53 ms) — the fence is
# gone. If a Mosaic/XLA update re-faults, re-fence here and re-run the
# probe matrix in tools/mcc_crash_probe.py.


def _multiclass_priority_chunked(
    boxes: Array,  # [K, N, 4] per-class candidate boxes
    scores: Array,  # [K, N]
    live0: Array,  # [K, N] bool — valid & area>0 & above score threshold
    iou_threshold: float,
    k: int,  # max survivors per class
):
    """Exact per-class greedy NMS, all classes chunk-stepping in lockstep.

    Returns (cls_boxes [K, k, 4], cls_scores [K, k] (_NEG on empty slots),
    cls_keep [K, k] bool, cls_idx [K, k] int32 indices into N) — the same
    per-class contract the fixed-point branch of multiclass NMS produces.
    """
    kc, n = scores.shape
    p = k
    chunk = min(_MC_CHUNK_SIZE, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    # full per-class priority sort (score desc, index asc — lax.top_k's
    # tie order matches the greedy argmax order); dead rows sort last.
    # Boxes are NOT gathered here: the upfront [K, N, 4] take_along_axis
    # measured 11.5 ms of the 14.1 ms call at the SSD serving point (the
    # top_k itself is 0.55 ms) — each loop iteration gathers only its
    # [K, C, 4] chunk below, and the early exit usually visits one chunk.
    masked = jnp.where(live0, scores, _NEG)
    order_scores, order = jax.lax.top_k(masked, n)  # [K, N]
    sscores = jnp.pad(order_scores, ((0, 0), (0, pad)), constant_values=_NEG)
    sidx = jnp.pad(order.astype(jnp.int32), ((0, 0), (0, pad)))

    def cond(state):
        ci, _, buf_scores, _, counts = state
        return (ci < n_chunks) & jnp.any(counts < p)

    def body(state):
        ci, buf_boxes, buf_scores, buf_idx, _ = state
        start = ci * chunk
        cs = jax.lax.dynamic_slice(sscores, (0, start), (kc, chunk))
        cidx = jax.lax.dynamic_slice(sidx, (0, start), (kc, chunk))
        cb = jnp.take_along_axis(boxes, cidx[..., None], axis=1)
        live = cs > _NEG / 2
        # suppression by survivors carried from higher-priority chunks —
        # complete per class while that class's count < p, and harmless
        # otherwise (late survivors rank below every carried one and the
        # top_k merge drops them)
        carried = buf_scores > _NEG / 2  # [K, p]
        iou_carry = jax.vmap(box_ops.iou)(buf_boxes, cb)  # [K, p, C]
        live &= ~jnp.any(
            (iou_carry > iou_threshold) & carried[..., None], axis=1
        )
        alive = _greedy_survivors_fixed_point(cb, cs, live, iou_threshold)
        surv_scores = jnp.where(alive, cs, _NEG)
        all_scores = jnp.concatenate([buf_scores, surv_scores], axis=1)
        top_scores, sel = jax.lax.top_k(all_scores, p)  # [K, p]
        buf_boxes = jnp.take_along_axis(
            jnp.concatenate([buf_boxes, cb], axis=1), sel[..., None], axis=1
        )
        buf_idx = jnp.take_along_axis(
            jnp.concatenate([buf_idx, cidx], axis=1), sel, axis=1
        )
        counts = jnp.sum(top_scores > _NEG / 2, axis=1).astype(jnp.int32)
        return ci + 1, buf_boxes, top_scores, buf_idx, counts

    state = (
        jnp.asarray(0, jnp.int32),
        jnp.zeros((kc, p, 4), boxes.dtype),
        jnp.full((kc, p), _NEG, scores.dtype),
        jnp.zeros((kc, p), jnp.int32),
        jnp.zeros((kc,), jnp.int32),
    )
    _, buf_boxes, buf_scores, buf_idx, _ = jax.lax.while_loop(
        cond, body, state
    )
    keep = buf_scores > _NEG / 2
    return (
        jnp.where(keep[..., None], buf_boxes, 0.0),
        buf_scores,
        keep,
        jnp.where(keep, buf_idx, 0),
    )


class NMSResult(NamedTuple):
    boxes: Array  # [max_total, 4]
    scores: Array  # [max_total]
    classes: Array  # [max_total] int32 (0-based class ids, background removed)
    valid_mask: Array  # [max_total] bool
    num_valid: Array  # [] int32
    extra_fields: dict  # gathered additional per-box fields


def multiclass_non_max_suppression(
    boxes: Array,
    scores: Array,
    score_threshold: float,
    iou_threshold: float,
    max_size_per_class: int,
    max_total_size: int,
    clip_window: Optional[Array] = None,
    change_coordinate_frame: bool = False,
    valid_mask: Optional[Array] = None,
    extra_fields: Optional[dict] = None,
) -> NMSResult:
    """Per-class score threshold + NMS + total cap (reference
    core/post_processing.multiclass_non_max_suppression).

    Args:
      boxes: [N, Q, 4] with Q == num_classes or Q == 1 (shared boxes).
      scores: [N, K] per-class scores WITHOUT background column.
      clip_window: optional [4]; boxes are clipped to it and zero-area
        clipped boxes dropped, as in the reference.
      change_coordinate_frame: re-express outputs relative to clip_window.
      valid_mask: [N] validity of input rows.
      extra_fields: optional dict of [N, ...] arrays gathered alongside.

    Returns NMSResult with static [max_total_size] shapes.
    """
    n, num_classes = scores.shape
    q = boxes.shape[1]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    extra_fields = extra_fields or {}

    per_class_boxes = jnp.broadcast_to(boxes, (n, num_classes, 4)) if q == 1 else boxes

    if clip_window is not None:
        per_class_boxes = box_ops.clip_to_window(per_class_boxes, clip_window)

    k = min(max_size_per_class, n)

    use_fp = USE_FIXED_POINT
    if use_fp is None:
        # classes chunk through lax.map, so the per-class [N, N] matrix
        # must fit the budget and the chunk serialization must stay
        # shallow (COCO K=90 x N=300 -> 3 blocks: in; SSD N=1917: out)
        # the actual lax.map depth: classes per chunk is bounded by the
        # per-chunk element budget, so the block count is ceil(K/chunk)
        # — bounding K*N*N alone under-counts blocks when N is large
        # relative to the budget (e.g. K=26, N=1100 -> 9 blocks)
        chunk = max(1, _FIXED_POINT_MAX_ELEMS // max(n * n, 1))
        blocks = -(-num_classes // chunk)
        use_fp = (
            n * n <= _FIXED_POINT_MAX_ELEMS
            and blocks <= _FIXED_POINT_MAX_BLOCKS
        )

    use_mcc = USE_MC_CHUNKED
    if use_mcc is None:
        # auto: the class-parallel chunked path wins once N is large
        # enough that the class-chunked fixed point would serialize deep
        # lax.map blocks (r5 on-chip sweep, ROADMAP crossover table);
        # a forced USE_FIXED_POINT keeps precedence
        use_mcc = (
            USE_FIXED_POINT is None and not use_fp and n >= _MC_CHUNKED_MIN_N
        )

    if use_mcc or use_fp:
        # all classes at once: survivors via fixed point, then per-class
        # top-k by score == greedy's capped, score-ordered output
        boxes_kn = jnp.swapaxes(per_class_boxes, 0, 1)  # [K, N, 4]
        scores_kn = jnp.swapaxes(scores, 0, 1)  # [K, N]
        area_ok = box_ops.area(boxes_kn) > 0
        live0 = valid_mask[None, :] & area_ok & (scores_kn > score_threshold)

    if use_mcc:
        cls_boxes, cls_scores, cls_keep, cls_idx = (
            _multiclass_priority_chunked(
                boxes_kn, scores_kn, live0, iou_threshold, k
            )
        )
    elif use_fp:
        alive = _greedy_survivors_class_chunked(
            boxes_kn, scores_kn, live0, iou_threshold,
            # q == 1: one box set broadcast to all classes (clipping
            # applies identically per class, so rows stay shared)
            shared_boxes=(q == 1),
        )
        masked = jnp.where(alive, scores_kn, _NEG)
        top_vals, top_idx = jax.lax.top_k(masked, k)  # [K, k]
        cls_keep = top_vals > _NEG / 2
        cls_idx = jnp.where(cls_keep, top_idx, 0).astype(jnp.int32)
        cls_boxes = jnp.take_along_axis(boxes_kn, cls_idx[..., None], axis=1)
        cls_scores = jnp.where(cls_keep, top_vals, _NEG)
    else:
        def per_class(c_boxes, c_scores):
            area_ok = box_ops.area(c_boxes) > 0
            mask = valid_mask & area_ok
            idx, keep = non_max_suppression_padded(
                c_boxes,
                c_scores,
                max_output_size=k,
                iou_threshold=iou_threshold,
                score_threshold=score_threshold,
                valid_mask=mask,
            )
            return (
                jnp.take(c_boxes, idx, axis=0),
                jnp.where(keep, jnp.take(c_scores, idx), _NEG),
                keep,
                idx,
            )

        # [K, k, ...]
        cls_boxes, cls_scores, cls_keep, cls_idx = jax.vmap(
            per_class, in_axes=(1, 1), out_axes=0
        )(per_class_boxes, scores)

    class_ids = jnp.broadcast_to(
        jnp.arange(num_classes, dtype=jnp.int32)[:, None], (num_classes, k)
    )

    flat_boxes = cls_boxes.reshape(-1, 4)
    flat_scores = cls_scores.reshape(-1)
    flat_keep = cls_keep.reshape(-1)
    flat_classes = class_ids.reshape(-1)
    flat_src = cls_idx.reshape(-1)

    total = min(max_total_size, flat_scores.shape[0])
    top_scores, top_i = jax.lax.top_k(flat_scores, total)
    out_boxes = jnp.take(flat_boxes, top_i, axis=0)
    out_classes = jnp.take(flat_classes, top_i)
    out_keep = jnp.take(flat_keep, top_i)
    out_src = jnp.take(flat_src, top_i)

    if max_total_size > total:  # pad up if fewer candidates than requested
        pad = max_total_size - total
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=_NEG)
        out_classes = jnp.pad(out_classes, (0, pad))
        out_keep = jnp.pad(out_keep, (0, pad))
        out_src = jnp.pad(out_src, (0, pad))

    if change_coordinate_frame and clip_window is not None:
        out_boxes = box_ops.change_coordinate_frame(out_boxes, clip_window)

    out_scores = jnp.where(out_keep, top_scores, 0.0)
    out_boxes = jnp.where(out_keep[:, None], out_boxes, 0.0)
    gathered_extras = {
        key: jnp.where(
            out_keep.reshape((-1,) + (1,) * (val.ndim - 1)),
            jnp.take(val, out_src, axis=0),
            0,
        )
        for key, val in extra_fields.items()
    }
    return NMSResult(
        boxes=out_boxes,
        scores=out_scores,
        classes=out_classes,
        valid_mask=out_keep,
        num_valid=jnp.sum(out_keep).astype(jnp.int32),
        extra_fields=gathered_extras,
    )


def batch_multiclass_non_max_suppression(
    boxes: Array, scores: Array, valid_mask: Optional[Array] = None,
    clip_window: Optional[Array] = None, extra_fields: Optional[dict] = None,
    **kwargs,
) -> NMSResult:
    """vmap of multiclass NMS over a leading batch dim.

    Per-image arguments are mapped, not closed over: clip_window may be
    [4] (shared) or [B, 4] (per image); extra_fields values must carry
    the batch dim ([B, N, ...]). Remaining kwargs are batch-shared
    scalars (thresholds/sizes)."""
    if valid_mask is None:
        valid_mask = jnp.ones(boxes.shape[:2], dtype=bool)
    cw_axis = None
    if clip_window is not None:
        clip_window = jnp.asarray(clip_window)
        if clip_window.ndim == 2:
            if clip_window.shape[0] != boxes.shape[0]:
                raise ValueError(
                    f"clip_window batch {clip_window.shape[0]} != "
                    f"boxes batch {boxes.shape[0]}"
                )
            cw_axis = 0
    ef_axis = None
    if extra_fields:
        for key, val in extra_fields.items():
            if val.shape[:2] != boxes.shape[:2]:
                raise ValueError(
                    f"extra_fields[{key!r}] must be [B, N, ...]; got "
                    f"{val.shape} for boxes {boxes.shape}"
                )
        ef_axis = 0

    def one(b, s, m, cw, ef):
        return multiclass_non_max_suppression(
            b, s, valid_mask=m, clip_window=cw, extra_fields=ef, **kwargs
        )

    return jax.vmap(one, in_axes=(0, 0, 0, cw_axis, ef_axis))(
        boxes, scores, valid_mask, clip_window, extra_fields
    )
