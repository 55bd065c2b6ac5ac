"""NMS / crop_and_resize / losses vs oracles and hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlx.geometry import np_box_ops
from mtlx.losses import losses
from mtlx.ops import nms, roi
import pytest


def np_greedy_nms(boxes, scores, iou_thr, max_out, score_thr=-1e30):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= score_thr:
            continue
        keep.append(i)
        if len(keep) == max_out:
            break
        ious = np_box_ops.iou(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > iou_thr
    return keep


def test_nms_padded_matches_numpy():
    rng = np.random.RandomState(3)
    for _ in range(5):
        n = 40
        ymin = rng.uniform(0, 80, n)
        xmin = rng.uniform(0, 80, n)
        boxes = np.stack(
            [ymin, xmin, ymin + rng.uniform(5, 40, n), xmin + rng.uniform(5, 40, n)], 1
        ).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        idx, keep = nms.non_max_suppression_padded(
            jnp.asarray(boxes), jnp.asarray(scores), max_output_size=10, iou_threshold=0.5
        )
        got = np.asarray(idx)[np.asarray(keep)]
        want = np_greedy_nms(boxes, scores, 0.5, 10)
        assert got.tolist() == want


def test_nms_respects_valid_mask_and_score_threshold():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.1])
    idx, keep = nms.non_max_suppression_padded(
        boxes, scores, 3, iou_threshold=0.5, score_threshold=0.5,
        valid_mask=jnp.asarray([True, False, True]),
    )
    assert np.asarray(idx)[np.asarray(keep)].tolist() == [0]


def test_multiclass_nms_shapes_and_classes():
    n, k = 20, 3
    rng = np.random.RandomState(0)
    ymin = rng.uniform(0, 50, n)
    xmin = rng.uniform(0, 50, n)
    boxes = np.stack([ymin, xmin, ymin + 10, xmin + 10], 1).astype(np.float32)[:, None, :]
    scores = rng.uniform(0, 1, (n, k)).astype(np.float32)
    res = nms.multiclass_non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_threshold=0.3, iou_threshold=0.5,
        max_size_per_class=5, max_total_size=8,
    )
    assert res.boxes.shape == (8, 4)
    assert res.scores.shape == (8,)
    assert res.classes.shape == (8,)
    v = np.asarray(res.valid_mask)
    s = np.asarray(res.scores)
    assert (s[v] >= 0.3).all()
    # scores sorted descending among valid
    assert (np.diff(s[v]) <= 1e-6).all()
    # per-class cap respected
    cls = np.asarray(res.classes)[v]
    for c in range(k):
        assert (cls == c).sum() <= 5


def test_batch_multiclass_nms():
    b, n, k = 2, 12, 2
    rng = np.random.RandomState(1)
    ymin = rng.uniform(0, 50, (b, n))
    xmin = rng.uniform(0, 50, (b, n))
    boxes = np.stack([ymin, xmin, ymin + 8, xmin + 8], -1).astype(np.float32)[:, :, None, :]
    scores = rng.uniform(0, 1, (b, n, k)).astype(np.float32)
    res = nms.batch_multiclass_non_max_suppression(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_threshold=0.0, iou_threshold=0.6,
        max_size_per_class=4, max_total_size=6,
    )
    assert res.boxes.shape == (b, 6, 4)
    assert res.num_valid.shape == (b,)


def _np_crop_and_resize(image, boxes, crop_size):
    """Literal numpy transcription of the TF crop_and_resize contract."""
    h, w, c = image.shape
    ch, cw = crop_size
    out = np.zeros((len(boxes), ch, cw, c), np.float32)
    for n, (y1, x1, y2, x2) in enumerate(boxes):
        for i in range(ch):
            in_y = (y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (ch - 1)) if ch > 1 else 0.5 * (y1 + y2) * (h - 1)
            if in_y < 0 or in_y > h - 1:
                continue
            ty = int(np.floor(in_y)); by = min(ty + 1, h - 1); fy = in_y - ty
            for j in range(cw):
                in_x = (x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (cw - 1)) if cw > 1 else 0.5 * (x1 + x2) * (w - 1)
                if in_x < 0 or in_x > w - 1:
                    continue
                tx = int(np.floor(in_x)); bx = min(tx + 1, w - 1); fx = in_x - tx
                top = image[ty, tx] + (image[ty, bx] - image[ty, tx]) * fx
                bot = image[by, tx] + (image[by, bx] - image[by, tx]) * fx
                out[n, i, j] = top + (bot - top) * fy
    return out


def test_crop_and_resize_matches_tf_contract():
    rng = np.random.RandomState(7)
    image = rng.uniform(0, 1, (9, 11, 3)).astype(np.float32)
    boxes = np.asarray(
        [
            [0.0, 0.0, 1.0, 1.0],
            [0.2, 0.3, 0.7, 0.9],
            [-0.1, 0.1, 0.5, 1.2],  # exercises extrapolation
        ],
        np.float32,
    )
    got = np.asarray(roi.crop_and_resize(jnp.asarray(image), jnp.asarray(boxes), (5, 4)))
    want = _np_crop_and_resize(image, boxes, (5, 4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_crop_and_resize_identity():
    image = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    got = np.asarray(
        roi.crop_and_resize(jnp.asarray(image), jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (4, 4))
    )
    np.testing.assert_allclose(got[0], image, atol=1e-5)


def test_position_sensitive_crop_shapes():
    image = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (8, 8, 2 * 2 * 5)).astype(np.float32))
    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.1, 0.1, 0.6, 0.6]])
    pooled = roi.position_sensitive_crop_regions(image, boxes, (4, 4), (2, 2), global_pool=True)
    assert pooled.shape == (2, 5)
    full = roi.position_sensitive_crop_regions(image, boxes, (4, 4), (2, 2), global_pool=False)
    assert full.shape == (2, 4, 4, 5)


def test_smooth_l1_hand_computed():
    pred = jnp.asarray([[0.0, 0.0, 0.5, 2.0]])[None]
    target = jnp.zeros((1, 1, 4))
    w = jnp.ones((1, 1))
    got = float(losses.weighted_smooth_l1_loss(pred, target, w)[0, 0])
    # 0 + 0 + 0.5*0.25 + (2 - 0.5) = 1.625
    np.testing.assert_allclose(got, 1.625, rtol=1e-6)


def test_softmax_ce_matches_log():
    logits = jnp.asarray([[2.0, 0.0]])
    labels = jnp.asarray([[1.0, 0.0]])
    got = float(losses.softmax_cross_entropy(logits, labels)[0])
    np.testing.assert_allclose(got, np.log(1 + np.exp(-2.0)), rtol=1e-6)


def test_sigmoid_ce_stable_and_correct():
    logits = jnp.asarray([-100.0, 0.0, 100.0])
    labels = jnp.asarray([0.0, 1.0, 1.0])
    got = np.asarray(losses.sigmoid_cross_entropy(logits, labels))
    np.testing.assert_allclose(got, [0.0, np.log(2.0), 0.0], atol=1e-6)
    assert np.isfinite(got).all()


def test_hard_example_miner_selects_hardest():
    cls_losses = jnp.asarray([0.1, 5.0, 0.2, 4.0])
    loc_losses = jnp.zeros(4)
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50], [20, 20, 30, 31]],
        jnp.float32,
    )
    match = jnp.asarray([-1, 0, -1, -1])
    cfg = losses.HardExampleMinerConfig(num_hard_examples=2, iou_threshold=0.5, loss_type="cls", cls_loss_weight=1.0)
    keep = np.asarray(losses.hard_example_mining_mask(cls_losses, loc_losses, boxes, match, cfg))
    # hardest is idx1 (5.0); idx3 overlaps idx1 heavily -> suppressed; next is idx2 (0.2)
    assert keep.tolist() == [False, True, True, False]


def test_crop_and_resize_mxu_matches_gather():
    rng = np.random.RandomState(11)
    image = rng.uniform(0, 1, (13, 17, 5)).astype(np.float32)
    boxes = np.asarray(
        [
            [0.0, 0.0, 1.0, 1.0],
            [0.25, 0.1, 0.8, 0.7],
            [-0.2, 0.4, 0.6, 1.3],  # out-of-range taps
            [0.5, 0.5, 0.5, 0.5],   # degenerate
        ],
        np.float32,
    )
    ref = np.asarray(roi.crop_and_resize(jnp.asarray(image), jnp.asarray(boxes), (7, 9)))
    mxu = np.asarray(
        roi.crop_and_resize_mxu(jnp.asarray(image), jnp.asarray(boxes), (7, 9))
    )
    np.testing.assert_allclose(mxu, ref, rtol=1e-4, atol=1e-5)


def test_crop_and_resize_mxu_gradients():
    image = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (8, 8, 2)).astype(np.float32))
    boxes = jnp.asarray([[0.1, 0.1, 0.9, 0.9]])

    def f(img):
        return jnp.sum(roi.crop_and_resize_mxu(img, boxes, (4, 4)))

    g = jax.grad(f)(image)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_mean_pooled_crop_matches_crop_then_mean():
    """mean_pooled_crop == crop_and_resize().mean(axis=(1,2)) exactly (the
    pooled bilinear crop is a linear functional — no crop materialized)."""
    rng = np.random.RandomState(3)
    image = rng.uniform(-1, 1, (13, 17, 5)).astype(np.float32)
    boxes = np.asarray(
        [
            [0.0, 0.0, 1.0, 1.0],
            [0.25, 0.1, 0.8, 0.7],
            [-0.2, 0.4, 0.6, 1.3],  # out-of-range taps -> zero weights
            [0.5, 0.5, 0.5, 0.5],   # degenerate
        ],
        np.float32,
    )
    ref = np.asarray(
        roi.crop_and_resize(jnp.asarray(image), jnp.asarray(boxes), (7, 7))
    ).mean(axis=(1, 2))
    fused = np.asarray(
        roi.mean_pooled_crop(jnp.asarray(image), jnp.asarray(boxes), (7, 7))
    )
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-6)


def test_mean_pooled_crop_gradients():
    image = jnp.asarray(
        np.random.RandomState(0).uniform(0, 1, (8, 8, 2)).astype(np.float32)
    )
    boxes = jnp.asarray([[0.1, 0.1, 0.9, 0.9]])
    g = jax.grad(lambda img: jnp.sum(roi.mean_pooled_crop(img, boxes)))(image)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_fixed_point_multiclass_equals_greedy():
    """The fixed-point survivor formulation must match the sequential
    greedy path bit-for-bit (it is the production second-stage postprocess
    on TPU) — including score ties, duplicate boxes, clip windows and
    validity masks."""
    rs = np.random.RandomState(3)
    prev = nms.USE_FIXED_POINT
    try:
        for trial in range(8):
            n = int(rs.choice([8, 60, 300]))
            k = int(rs.choice([2, 10]))
            raw = rs.uniform(0, 100, (n, 1, 4)).astype(np.float32)
            boxes = np.concatenate(
                [np.minimum(raw[..., :2], raw[..., 2:]),
                 np.maximum(raw[..., :2], raw[..., 2:])], -1)
            scores = rs.uniform(0, 1, (n, k)).astype(np.float32)
            if trial % 2 == 0:  # ties + duplicates exercise the priority order
                half = n // 2
                scores[:half] = scores[half : 2 * half]
                boxes[: n // 4] = boxes[n // 4 : 2 * (n // 4)]
            vm = jnp.asarray(rs.uniform(0, 1, n) > 0.2)
            kw = dict(score_threshold=0.05, iou_threshold=0.5,
                      max_size_per_class=10, max_total_size=20,
                      clip_window=jnp.asarray([0.0, 0.0, 90.0, 90.0]),
                      change_coordinate_frame=True, valid_mask=vm)
            nms.USE_FIXED_POINT = False
            a = nms.multiclass_non_max_suppression(
                jnp.asarray(boxes), jnp.asarray(scores), **kw)
            nms.USE_FIXED_POINT = True
            b = nms.multiclass_non_max_suppression(
                jnp.asarray(boxes), jnp.asarray(scores), **kw)
            for name in ("boxes", "scores", "classes", "valid_mask", "num_valid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                    err_msg=f"trial {trial} field {name}")
    finally:
        nms.USE_FIXED_POINT = prev


def test_fixed_point_auto_dispatch_bound():
    """Auto mode uses the fixed point when the per-class [N, N] matrix
    fits the budget AND class chunking stays shallow — FRCNN stage 2 is
    in at both VOC (K=20) and COCO (K=90) scale; SSD300's N=1917 stays
    on the vmapped greedy path (90 sequential chunk solves would lose)."""
    budget = nms._FIXED_POINT_MAX_ELEMS
    blocks = nms._FIXED_POINT_MAX_BLOCKS

    def num_blocks(k, n):
        # mirrors the dispatch: the real lax.map depth is ceil(K/chunk)
        chunk = max(1, budget // (n * n))
        return -(-k // chunk)

    assert 300 * 300 <= budget  # FRCNN stage 2 per-class matrix
    assert num_blocks(20, 300) == 1  # VOC: no chunking needed
    assert num_blocks(90, 300) <= blocks  # COCO: chunked, still fp
    # SSD300 COCO: the per-class matrix fits but only one class per
    # chunk does, so 90 sequential solves lose to the vmapped greedy
    assert num_blocks(90, 1917) > blocks
    # regression: a K*N*N product bound admitted K=26/N=1100 even though
    # it serializes 9 blocks (> the depth where fp loses to greedy)
    assert 26 * 1100 * 1100 <= blocks * budget
    assert num_blocks(26, 1100) > blocks


def test_priority_chunked_single_class_equals_greedy():
    """The RPN-scale priority-chunked NMS (score-ordered chunks of
    fixed-point solves with carried-survivor suppression) must equal the
    sequential greedy path exactly — including when survivors span
    several chunks, when a chunk is exhausted by carried suppression,
    with score ties, thresholds and validity masks."""
    rs = np.random.RandomState(7)
    prev_chunk, prev_min = nms._CHUNK_SIZE, nms._CHUNKED_MIN_N
    prev = nms.USE_CHUNKED
    try:
        nms._CHUNK_SIZE = 16  # force many chunks at test sizes
        for trial in range(6):
            n = int(rs.choice([30, 64, 100]))
            # clustered boxes -> heavy cross-chunk suppression chains
            centers = rs.uniform(10, 90, (max(4, n // 8), 2))
            pick = centers[rs.randint(0, len(centers), n)]
            jitter = rs.uniform(-6, 6, (n, 2))
            y0x0 = pick + jitter - 10
            y1x1 = pick + jitter + 10 + rs.uniform(0, 8, (n, 2))
            boxes = np.concatenate([y0x0, y1x1], 1).astype(np.float32)
            scores = rs.uniform(0, 1, n).astype(np.float32)
            if trial % 2 == 0:
                scores[: n // 2] = scores[n // 2:]  # ties
            vm = jnp.asarray(rs.uniform(0, 1, n) > 0.15)
            kw = dict(max_output_size=20, iou_threshold=0.4,
                      score_threshold=0.1, valid_mask=vm)
            nms.USE_CHUNKED = False
            ia, ka = nms.non_max_suppression_padded(
                jnp.asarray(boxes), jnp.asarray(scores), **kw)
            nms.USE_CHUNKED = True
            ib, kb = nms.non_max_suppression_padded(
                jnp.asarray(boxes), jnp.asarray(scores), **kw)
            np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb),
                                          err_msg=f"trial {trial} keep")
            np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib),
                                          err_msg=f"trial {trial} idx")
    finally:
        nms._CHUNK_SIZE, nms._CHUNKED_MIN_N = prev_chunk, prev_min
        nms.USE_CHUNKED = prev


def test_fixed_point_class_chunked_equals_greedy():
    """COCO-scale class counts chunk the suppression matrix over class
    blocks; the chunked survivors must equal the sequential greedy path
    exactly, for both shared (Q==1) and per-class boxes, including the
    ragged final block."""
    rs = np.random.RandomState(11)
    n = 40
    prev_budget = nms._FIXED_POINT_MAX_ELEMS
    prev_fp = nms.USE_FIXED_POINT
    try:
        # force chunking at tiny sizes: budget of 3 class-rows per block
        # over K=7 classes -> blocks of 3/3/1 (ragged tail)
        nms._FIXED_POINT_MAX_ELEMS = 3 * n * n
        for q in (1, 7):
            raw = rs.uniform(0, 100, (n, q, 4)).astype(np.float32)
            boxes = np.concatenate(
                [np.minimum(raw[..., :2], raw[..., 2:]),
                 np.maximum(raw[..., :2], raw[..., 2:])], -1)
            scores = rs.uniform(0, 1, (n, 7)).astype(np.float32)
            scores[: n // 2] = scores[n // 2:]  # ties exercise priority
            vm = jnp.asarray(rs.uniform(0, 1, n) > 0.2)
            kw = dict(score_threshold=0.05, iou_threshold=0.5,
                      max_size_per_class=10, max_total_size=25,
                      valid_mask=vm)
            nms.USE_FIXED_POINT = False
            a = nms.multiclass_non_max_suppression(
                jnp.asarray(boxes), jnp.asarray(scores), **kw)
            nms.USE_FIXED_POINT = True
            b = nms.multiclass_non_max_suppression(
                jnp.asarray(boxes), jnp.asarray(scores), **kw)
            for name in ("boxes", "scores", "classes", "valid_mask",
                         "num_valid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, name)),
                    np.asarray(getattr(b, name)),
                    err_msg=f"q {q} field {name}")
    finally:
        nms._FIXED_POINT_MAX_ELEMS = prev_budget
        nms.USE_FIXED_POINT = prev_fp


@pytest.mark.smoke
def test_multiclass_priority_chunked_equals_greedy():
    """The class-parallel priority-chunked path (SSD-scale postprocess:
    every class solves score-ordered chunks in lockstep with carried
    survivors) must equal the sequential greedy path exactly — for shared
    (Q==1) and per-class boxes, across ragged chunk tails, score ties,
    duplicate boxes, clip windows, validity masks and classes whose
    survivors span several chunks."""
    rs = np.random.RandomState(13)
    prev_mcc, prev_chunk = nms.USE_MC_CHUNKED, nms._MC_CHUNK_SIZE
    try:
        nms._MC_CHUNK_SIZE = 16  # force many chunks at test sizes
        for trial in range(6):
            n = int(rs.choice([16, 50, 130]))
            k = int(rs.choice([3, 9]))
            for q in (1, k):
                # clustered boxes -> heavy cross-chunk suppression chains
                centers = rs.uniform(10, 90, (max(4, n // 8), 2))
                pick = centers[rs.randint(0, len(centers), (n, q))]
                jit = rs.uniform(-6, 6, (n, q, 2))
                y0x0 = pick + jit - 10
                y1x1 = pick + jit + 10 + rs.uniform(0, 8, (n, q, 2))
                boxes = np.concatenate([y0x0, y1x1], -1).astype(np.float32)
                scores = rs.uniform(0, 1, (n, k)).astype(np.float32)
                if trial % 2 == 0:  # ties + duplicates exercise priority
                    half = n // 2
                    scores[:half] = scores[half : 2 * half]
                    boxes[: n // 4] = boxes[n // 4 : 2 * (n // 4)]
                vm = jnp.asarray(rs.uniform(0, 1, n) > 0.2)
                kw = dict(score_threshold=0.05, iou_threshold=0.5,
                          max_size_per_class=10, max_total_size=20,
                          clip_window=jnp.asarray([0.0, 0.0, 90.0, 90.0]),
                          change_coordinate_frame=bool(trial % 2),
                          valid_mask=vm)
                nms.USE_MC_CHUNKED = False
                nms.USE_FIXED_POINT = False
                a = nms.multiclass_non_max_suppression(
                    jnp.asarray(boxes), jnp.asarray(scores), **kw)
                nms.USE_FIXED_POINT = None
                nms.USE_MC_CHUNKED = True
                b = nms.multiclass_non_max_suppression(
                    jnp.asarray(boxes), jnp.asarray(scores), **kw)
                for name in ("boxes", "scores", "classes", "valid_mask",
                             "num_valid"):
                    np.testing.assert_array_equal(
                        np.asarray(getattr(a, name)),
                        np.asarray(getattr(b, name)),
                        err_msg=f"trial {trial} q {q} field {name}")
    finally:
        nms.USE_MC_CHUNKED, nms._MC_CHUNK_SIZE = prev_mcc, prev_chunk
        nms.USE_FIXED_POINT = None


def test_mc_chunked_auto_dispatch_bound():
    """Auto mode routes SSD-scale candidate sets (N=1917, any K) onto the
    class-parallel chunked path — previously they fell through every fast
    path onto K vmapped 100-step greedy loops, putting SSD serving at 51%
    of SSD train throughput (BENCH_r04) — while FRCNN stage 2 (N=300)
    stays on the class-chunked fixed point."""
    assert 1917 >= nms._MC_CHUNKED_MIN_N  # SSD300: in
    assert 300 < nms._MC_CHUNKED_MIN_N  # FRCNN stage 2: fp still wins
    # the fp auto bound must not overlap: any N the fp path accepts with
    # shallow chunking stays fp (mcc requires `not use_fp`)
    chunk = max(1, nms._FIXED_POINT_MAX_ELEMS // (1917 * 1917))
    assert -(-20 // chunk) > nms._FIXED_POINT_MAX_BLOCKS


def test_mc_chunked_large_k_crash_shape_exact():
    """COCO-scale K through mcc at the retired codegen-fence point: the
    OLD loop body faulted the v5e TPU worker at (K=90, chunk 128,
    batch >= 8) and large K was fenced to chunk 256; the per-chunk
    gather body (ROADMAP r5 #3) runs the shape clean at half the fenced
    cost, so the fence is gone. Pin exactness at K=90 with deep
    chunking — the shape that exercised the fence — vs the greedy
    reference."""
    rs = np.random.RandomState(7)
    n, k = 80, 90
    boxes = np.zeros((n, 1, 4), np.float32)
    y0x0 = rs.uniform(0, 80, (n, 1, 2))
    boxes[..., :2] = y0x0
    boxes[..., 2:] = y0x0 + rs.uniform(5, 30, (n, 1, 2))
    scores = rs.uniform(0, 1, (n, k)).astype(np.float32)
    kw = dict(score_threshold=0.05, iou_threshold=0.5,
              max_size_per_class=8, max_total_size=16)
    prev = nms.USE_MC_CHUNKED, nms.USE_FIXED_POINT, nms._MC_CHUNK_SIZE
    try:
        nms.USE_MC_CHUNKED = False
        nms.USE_FIXED_POINT = False
        a = nms.multiclass_non_max_suppression(
            jnp.asarray(boxes), jnp.asarray(scores), **kw)
        nms.USE_FIXED_POINT = None
        nms.USE_MC_CHUNKED = True
        nms._MC_CHUNK_SIZE = 16  # many chunks at test N, as 128 at 1917
        b = nms.multiclass_non_max_suppression(
            jnp.asarray(boxes), jnp.asarray(scores), **kw)
    finally:
        nms.USE_MC_CHUNKED, nms.USE_FIXED_POINT, nms._MC_CHUNK_SIZE = prev
    for name in ("boxes", "scores", "classes", "valid_mask", "num_valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=f"field {name}")
