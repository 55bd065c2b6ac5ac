"""Device-side data augmentation — jitted, PRNG-keyed, static-shape.

Capability match for the reference's `core/preprocessor.py` (SURVEY.md
§3.1: ~30 augmentations keyed by config). TPU-first redesign: every
transform is a pure function of (rng, sample) on the FIXED canvas —
augmentation runs on device inside the input pipeline's jitted prefix,
not in CPU queue threads.

A `sample` dict: image [H, W, 3] float (0-255), boxes [G, 4] in absolute
canvas pixels, classes [G], mask [G], true_shape [2] (h, w of the real
image within the canvas).

Geometric ops respect the true image region (e.g. horizontal flip mirrors
only the first true_w columns). Crop-family ops produce fixed shapes by
resampling the cropped window back onto the same canvas geometry (the
reference emits variable-size crops and pads later; a static-shape op
cannot, so crop == crop+resize here). With a keep_aspect_ratio_resizer
the training pipeline instead routes crop-family ops through
mtlx/data/host_geometry.py, which reproduces the reference's
variable-final-shape crop-then-resize semantics (host-drawn geometry,
one device window-resample — apply_host_window below); the device ops
here remain the fixed_shape_resizer path and the standalone API.
Photometric ops act on the whole canvas; the padding region stays ~black
and is masked out of every loss by true_shape anyway.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

from mtlx.geometry import box_ops, keypoint_ops
from mtlx.ops import roi as roi_lib


def _split(rng, n=2):
    return jax.random.split(rng, n)


# ---------------------------------------------------------------------------
# geometric
# ---------------------------------------------------------------------------


def random_horizontal_flip(rng, sample, probability: float = 0.5):
    """Mirror the true-image region, its boxes (and instance masks, when
    present) with prob 0.5."""
    do = jax.random.bernoulli(rng, probability)
    img = sample["image"]
    w = sample["true_shape"][1]
    width = img.shape[1]
    cols = jnp.arange(width)
    src = jnp.where(cols < w, w - 1 - cols, cols)
    flipped = jnp.take(img, src, axis=1)
    boxes = sample["boxes"]
    wf = w.astype(boxes.dtype)
    fboxes = jnp.stack(
        [boxes[:, 0], wf - boxes[:, 3], boxes[:, 2], wf - boxes[:, 1]], axis=1
    )
    out = dict(sample)
    out["image"] = jnp.where(do, flipped, img)
    out["boxes"] = jnp.where(do, fboxes, boxes)
    if "instance_masks" in sample:
        m = sample["instance_masks"]  # [G, gh, gw] at canvas/stride res
        stride = width // m.shape[2]
        wm = jnp.round(w / stride).astype(jnp.int32)
        mcols = jnp.arange(m.shape[2])
        msrc = jnp.where(mcols < wm, wm - 1 - mcols, mcols)
        out["instance_masks"] = jnp.where(do, jnp.take(m, msrc, axis=2), m)
    if "keypoints" in sample:
        kp = sample["keypoints"]  # [G, P, 2] absolute canvas px
        flipped_kp = keypoint_ops.flip_horizontal(kp, wf / 2.0)
        out["keypoints"] = jnp.where(do, flipped_kp, kp)
    return out


def random_vertical_flip(rng, sample, probability: float = 0.5):
    do = jax.random.bernoulli(rng, probability)
    img = sample["image"]
    h = sample["true_shape"][0]
    rows = jnp.arange(img.shape[0])
    src = jnp.where(rows < h, h - 1 - rows, rows)
    flipped = jnp.take(img, src, axis=0)
    boxes = sample["boxes"]
    hf = h.astype(boxes.dtype)
    fboxes = jnp.stack(
        [hf - boxes[:, 2], boxes[:, 1], hf - boxes[:, 0], boxes[:, 3]], axis=1
    )
    out = dict(sample)
    out["image"] = jnp.where(do, flipped, img)
    out["boxes"] = jnp.where(do, fboxes, boxes)
    if "instance_masks" in sample:
        m = sample["instance_masks"]
        stride = img.shape[0] // m.shape[1]
        hm = jnp.round(h / stride).astype(jnp.int32)
        mrows = jnp.arange(m.shape[1])
        msrc = jnp.where(mrows < hm, hm - 1 - mrows, mrows)
        out["instance_masks"] = jnp.where(do, jnp.take(m, msrc, axis=1), m)
    if "keypoints" in sample:
        kp = sample["keypoints"]
        flipped_kp = keypoint_ops.flip_vertical(kp, hf / 2.0)
        out["keypoints"] = jnp.where(do, flipped_kp, kp)
    return out


def random_jitter_boxes(rng, sample, ratio: float = 0.05):
    boxes = sample["boxes"]
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    noise = jax.random.uniform(rng, boxes.shape, minval=-ratio, maxval=ratio)
    delta = noise * jnp.stack([h, w, h, w], axis=1)
    out = dict(sample)
    out["boxes"] = boxes + delta
    return out


def random_crop_image(
    rng,
    sample,
    min_object_covered: float = 1.0,
    min_aspect_ratio: float = 0.75,
    max_aspect_ratio: float = 1.33,
    min_area: float = 0.1,
    max_area: float = 1.0,
    overlap_thresh: float = 0.3,
    random_coef: float = 0.0,
    num_attempts: int = 8,
):
    """Sample a crop window inside the true image; resample it onto the
    full canvas (static shape). Boxes are clipped to the window; boxes
    whose IoA with the window falls below overlap_thresh are masked out.
    With prob `random_coef` the image is kept unchanged.

    min_object_covered follows tf.image.sample_distorted_bounding_box: the
    window must contain at least that fraction of SOME groundtruth box.
    `num_attempts` candidate windows are drawn and the first satisfying one
    is used; if none qualifies the image is kept unchanged (TF's
    max_attempts fallback)."""
    rng_keep, rng_windows = jax.random.split(rng)
    keep_original = jax.random.bernoulli(rng_keep, random_coef)

    th = sample["true_shape"][0].astype(jnp.float32)
    tw = sample["true_shape"][1].astype(jnp.float32)

    def sample_window(key):
        rng_area, rng_aspect, rng_y, rng_x = jax.random.split(key, 4)
        area_frac = jax.random.uniform(rng_area, minval=min_area, maxval=max_area)
        aspect = jax.random.uniform(
            rng_aspect, minval=min_aspect_ratio, maxval=max_aspect_ratio
        )
        # window h*w = area_frac * th * tw, w/h = aspect * (tw/th)-neutral
        h = jnp.sqrt(area_frac * th * tw / aspect)
        w = h * aspect
        h = jnp.minimum(h, th)
        w = jnp.minimum(w, tw)
        y = jax.random.uniform(rng_y) * (th - h)
        x = jax.random.uniform(rng_x) * (tw - w)
        return jnp.stack([y, x, y + h, x + w])

    windows = jax.vmap(sample_window)(
        jax.random.split(rng_windows, num_attempts)
    )  # [K, 4]
    gt_mask = sample["mask"]
    if min_object_covered > 0.0:
        cover = jax.vmap(
            lambda w: box_ops.ioa(w[None, :], sample["boxes"])[0]
        )(windows)  # [K, G] fraction of each box inside each window
        satisfied = jnp.any(
            (cover >= min_object_covered) & gt_mask[None, :], axis=1
        )
        # vacuous when there is no groundtruth (TF uses the whole image as
        # the implicit box)
        satisfied = satisfied | ~jnp.any(gt_mask)
    else:
        satisfied = jnp.ones((num_attempts,), bool)
    first = jnp.argmax(satisfied)
    keep_original = keep_original | ~jnp.any(satisfied)
    window = windows[first]
    y0, x0 = window[0], window[1]
    ch, cw = window[2] - window[0], window[3] - window[1]

    img = sample["image"]
    canvas_h, canvas_w = img.shape[0], img.shape[1]
    norm = jnp.asarray(
        [canvas_h, canvas_w, canvas_h, canvas_w], jnp.float32
    )
    crop = roi_lib.crop_and_resize(
        img, (window / norm)[None, :], (canvas_h, canvas_w)
    )[0]

    boxes = sample["boxes"]
    ioa = box_ops.ioa(window[None, :], boxes)[0]  # coverage of each box by window
    keep_box = ioa >= overlap_thresh
    clipped = box_ops.clip_to_window(boxes, window)
    # re-express in the resampled canvas: window -> full canvas
    scale_y = canvas_h / ch
    scale_x = canvas_w / cw
    moved = jnp.stack(
        [
            (clipped[:, 0] - y0) * scale_y,
            (clipped[:, 1] - x0) * scale_x,
            (clipped[:, 2] - y0) * scale_y,
            (clipped[:, 3] - x0) * scale_x,
        ],
        axis=1,
    )
    out = dict(sample)
    out["image"] = jnp.where(keep_original, img, crop)
    out["boxes"] = jnp.where(keep_original, boxes, moved)
    out["mask"] = jnp.where(keep_original, sample["mask"], sample["mask"] & keep_box)
    out["true_shape"] = jnp.where(
        keep_original,
        sample["true_shape"],
        jnp.asarray([canvas_h, canvas_w], sample["true_shape"].dtype),
    )
    return out


def random_rotation90(rng, sample, probability: float = 0.5):
    """Rotate the true region 90° counter-clockwise with prob 0.5.

    Requires a square canvas (all shipped configs use one); on non-square
    canvases the op is an identity (documented static-shape constraint).
    """
    img = sample["image"]
    H, W = img.shape[0], img.shape[1]
    if H != W:
        return sample
    do = jax.random.bernoulli(rng, probability)
    th = sample["true_shape"][0]
    tw = sample["true_shape"][1]
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    # CCW within the true region: out[i, j] = in[j, tw - 1 - i]
    src_r = jnp.clip(cols, 0, H - 1)
    src_c = jnp.clip(tw - 1 - rows, 0, W - 1)
    inside = (rows < tw) & (cols < th)
    rotated = jnp.where(inside[..., None], img[src_r, src_c], 0.0)
    boxes = sample["boxes"]
    twf = tw.astype(boxes.dtype)
    rboxes = jnp.stack(
        [twf - boxes[:, 3], boxes[:, 0], twf - boxes[:, 1], boxes[:, 2]], axis=1
    )
    out = dict(sample)
    out["image"] = jnp.where(do, rotated, img)
    out["boxes"] = jnp.where(do, rboxes, boxes)
    out["true_shape"] = jnp.where(
        do, sample["true_shape"][::-1], sample["true_shape"]
    )
    return out


def _resample_scaled(img, sy, sx, method: str = "bilinear"):
    """out[i, j] = interp(in, i / sy, j / sx) on the fixed canvas."""
    H, W = img.shape[0], img.shape[1]
    ys = jnp.arange(H, dtype=jnp.float32) / sy
    xs = jnp.arange(W, dtype=jnp.float32) / sx
    if method == "nearest":
        yn = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, H - 1)
        xn = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, W - 1)
        return img[yn][:, xn]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    fy = (ys - y0.astype(jnp.float32))[:, None, None]
    fx = (xs - x0.astype(jnp.float32))[None, :, None]
    tl = img[y0][:, x0]
    tr = img[y0][:, x1]
    bl = img[y1][:, x0]
    br = img[y1][:, x1]
    top = tl + (tr - tl) * fx
    bot = bl + (br - bl) * fx
    return top + (bot - top) * fy


def random_image_scale(rng, sample, min_scale_ratio: float = 0.5,
                       max_scale_ratio: float = 2.0):
    """Rescale the true-image content by a random factor (capped so it
    stays on the canvas); boxes and true_shape scale with it."""
    img = sample["image"]
    H, W = img.shape[0], img.shape[1]
    th = sample["true_shape"][0].astype(jnp.float32)
    tw = sample["true_shape"][1].astype(jnp.float32)
    s = jax.random.uniform(rng, minval=min_scale_ratio, maxval=max_scale_ratio)
    s = jnp.minimum(s, jnp.minimum(H / th, W / tw))  # keep content on canvas
    scaled = _resample_scaled(img, s, s)
    new_h = jnp.floor(th * s).astype(jnp.int32)
    new_w = jnp.floor(tw * s).astype(jnp.int32)
    rows = jnp.arange(H)[:, None, None]
    cols = jnp.arange(W)[None, :, None]
    inside = (rows < new_h) & (cols < new_w)
    out = dict(sample)
    out["image"] = jnp.where(inside, scaled, 0.0)
    out["boxes"] = sample["boxes"] * s
    out["true_shape"] = jnp.stack([new_h, new_w])
    return out


def random_pad_image(rng, sample, min_image_height=0, min_image_width=0,
                     max_image_height=0, max_image_width=0, pad_color=(),
                     min_size_ratio=(), max_size_ratio=()):
    """Grow the true region by padding above/left of the content (the
    reference pads to a random larger size; on the fixed canvas the true
    region expands toward the canvas bounds).

    min/max_image_height/width bound the padded size absolutely;
    min/max_size_ratio (the reference's *_padded_size_ratio, [h, w]) bound
    it as multiples of the current true size. All bounds are clamped to
    the static canvas."""
    img = sample["image"]
    H, W = img.shape[0], img.shape[1]
    th = sample["true_shape"][0]
    tw = sample["true_shape"][1]
    min_h = jnp.maximum(th, jnp.asarray(min_image_height, jnp.int32))
    min_w = jnp.maximum(tw, jnp.asarray(min_image_width, jnp.int32))
    max_h = jnp.asarray(max_image_height or H, jnp.int32)
    max_w = jnp.asarray(max_image_width or W, jnp.int32)
    if len(min_size_ratio) == 2:
        min_h = jnp.maximum(
            min_h, jnp.ceil(min_size_ratio[0] * th).astype(jnp.int32)
        )
        min_w = jnp.maximum(
            min_w, jnp.ceil(min_size_ratio[1] * tw).astype(jnp.int32)
        )
    if len(max_size_ratio) == 2:
        max_h = jnp.minimum(
            max_h, jnp.floor(max_size_ratio[0] * th).astype(jnp.int32)
        )
        max_w = jnp.minimum(
            max_w, jnp.floor(max_size_ratio[1] * tw).astype(jnp.int32)
        )
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    new_h = jnp.clip(
        jax.random.randint(r1, (), 0, H + 1),
        jnp.minimum(min_h, H), jnp.maximum(jnp.minimum(max_h, H), min_h),
    )
    new_h = jnp.minimum(new_h, H)
    new_w = jnp.clip(
        jax.random.randint(r2, (), 0, W + 1),
        jnp.minimum(min_w, W), jnp.maximum(jnp.minimum(max_w, W), min_w),
    )
    new_w = jnp.minimum(new_w, W)
    top = jax.random.randint(r3, (), 0, H) % jnp.maximum(new_h - th, 1)
    left = jax.random.randint(r4, (), 0, W) % jnp.maximum(new_w - tw, 1)
    fill = jnp.asarray(pad_color if len(pad_color) == 3 else (0.0, 0.0, 0.0),
                       img.dtype)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    src_r = jnp.clip(rows - top, 0, H - 1)
    src_c = jnp.clip(cols - left, 0, W - 1)
    content = (rows >= top) & (rows < top + th) & (cols >= left) & (cols < left + tw)
    shifted = jnp.where(content[..., None], img[src_r, src_c], fill)
    offset = jnp.stack([top, left, top, left]).astype(sample["boxes"].dtype)
    out = dict(sample)
    out["image"] = shifted
    out["boxes"] = sample["boxes"] + offset
    out["true_shape"] = jnp.stack([new_h, new_w]).astype(sample["true_shape"].dtype)
    return out


def random_crop_to_aspect_ratio(rng, sample, aspect_ratio: float = 1.0,
                                overlap_thresh: float = 0.3):
    """Crop the true region to the target aspect ratio (max area crop).
    No coverage constraint — the reference center-crops unconditionally."""
    return random_crop_image(
        rng, sample,
        min_object_covered=0.0,
        min_aspect_ratio=aspect_ratio, max_aspect_ratio=aspect_ratio,
        min_area=0.95, max_area=1.0, overlap_thresh=overlap_thresh,
    )


def random_crop_pad_image(rng, sample, min_object_covered=1.0,
                          min_aspect_ratio=0.75, max_aspect_ratio=1.33,
                          min_area=0.1, max_area=1.0, overlap_thresh=0.3,
                          random_coef=0.0, min_padded_size_ratio=(),
                          max_padded_size_ratio=(), pad_color=()):
    r1, r2 = jax.random.split(rng)
    s = random_crop_image(
        r1, sample, min_object_covered, min_aspect_ratio, max_aspect_ratio,
        min_area, max_area, overlap_thresh, random_coef,
    )
    return random_pad_image(
        r2, s, pad_color=tuple(pad_color),
        min_size_ratio=tuple(min_padded_size_ratio),
        max_size_ratio=tuple(max_padded_size_ratio),
    )


# The reference's 7-branch SSD patch-sampling schedule: keep the image, or
# crop requiring min-IoU with some groundtruth box in {.1,.3,.5,.7,.9,any}.
_SSD_DEFAULT_OPERATIONS = tuple(
    dict(min_object_covered=t, min_aspect_ratio=0.5, max_aspect_ratio=2.0,
         min_area=0.1, max_area=1.0, overlap_thresh=t, random_coef=0.0)
    for t in (0.1, 0.3, 0.5, 0.7, 0.9, 0.0)
)

_CROP_KEYS = ("min_object_covered", "min_aspect_ratio", "max_aspect_ratio",
              "min_area", "max_area", "overlap_thresh", "random_coef")


def _ssd_branches(rng, operations, keep_branch, make_branch):
    """Uniform lax.switch over per-operation crop branches (+ an implicit
    keep-the-image branch when using the default schedule, matching the
    reference's 1-in-7 identity arm)."""
    branches = [make_branch(op) for op in operations]
    if keep_branch:
        branches = [lambda s: s] + branches
    rng_pick, rng_crop = jax.random.split(rng)
    idx = jax.random.randint(rng_pick, (), 0, len(branches))
    return branches, idx, rng_crop


def ssd_random_crop(rng, sample, operations=()):
    """Classic SSD patch sampling (reference ssd_random_crop): uniformly
    pick one of the configured operations (default: the standard 7-way
    schedule). Implemented as a lax.switch over jitted random_crop_image
    branches (static shapes)."""
    keep = not operations
    ops = tuple(operations) or _SSD_DEFAULT_OPERATIONS

    def make_branch(op):
        kw = {k: op[k] for k in _CROP_KEYS if k in op}

        def fn(s):
            return random_crop_image(rng_crop, s, **kw)
        return fn

    branches, idx, rng_crop = _ssd_branches(rng, ops, keep, make_branch)
    return jax.lax.switch(idx, branches, sample)


def ssd_random_crop_pad(rng, sample, operations=()):
    """Crop-then-pad per the configured operations; each operation carries
    its own pad-size ratios and pad color (reference ssd_random_crop_pad)."""
    keep = not operations
    ops = tuple(operations) or _SSD_DEFAULT_OPERATIONS

    def make_branch(op):
        kw = {k: op[k] for k in _CROP_KEYS if k in op}
        pad_kw = dict(
            pad_color=tuple(op.get("pad_color", ())),
            min_size_ratio=tuple(op.get("min_padded_size_ratio", ())),
            max_size_ratio=tuple(op.get("max_padded_size_ratio", ())),
        )

        def fn(s):
            r1, r2 = jax.random.split(rng_crop)
            return random_pad_image(r2, random_crop_image(r1, s, **kw),
                                    **pad_kw)
        return fn

    branches, idx, rng_crop = _ssd_branches(rng, ops, keep, make_branch)
    return jax.lax.switch(idx, branches, sample)


def ssd_random_crop_fixed_aspect_ratio(rng, sample, operations=(),
                                       aspect_ratio: float = 1.0):
    """ssd_random_crop with every branch's aspect ratio forced to the
    configured value (reference ssd_random_crop_fixed_aspect_ratio)."""
    keep = not operations
    ops = tuple(operations) or _SSD_DEFAULT_OPERATIONS

    def make_branch(op):
        kw = {k: op[k] for k in _CROP_KEYS if k in op}
        kw["min_aspect_ratio"] = aspect_ratio
        kw["max_aspect_ratio"] = aspect_ratio

        def fn(s):
            return random_crop_image(rng_crop, s, **kw)
        return fn

    branches, idx, rng_crop = _ssd_branches(rng, ops, keep, make_branch)
    return jax.lax.switch(idx, branches, sample)


def random_resize_method(rng, sample, target_height: int, target_width: int):
    """Resize the true region to a fixed target (bilinear resample on the
    static canvas; the reference's random interpolation-method choice is
    approximated with bilinear — documented)."""
    th = sample["true_shape"][0].astype(jnp.float32)
    tw = sample["true_shape"][1].astype(jnp.float32)
    img = sample["image"]
    H, W = img.shape[0], img.shape[1]
    sy = jnp.minimum(target_height / th, H / th)
    sx = jnp.minimum(target_width / tw, W / tw)
    scaled = _resample_scaled(img, sy, sx)
    new_h = jnp.minimum(target_height, H)
    new_w = jnp.minimum(target_width, W)
    rows = jnp.arange(H)[:, None, None]
    cols = jnp.arange(W)[None, :, None]
    inside = (rows < new_h) & (cols < new_w)
    out = dict(sample)
    out["image"] = jnp.where(inside, scaled, 0.0)
    out["boxes"] = sample["boxes"] * jnp.stack([sy, sx, sy, sx])
    out["true_shape"] = jnp.asarray([new_h, new_w], sample["true_shape"].dtype)
    return out


def resize_image(rng, sample, new_height: int = 0, new_width: int = 0,
                 method: int = 3):
    """Deterministic resize of the true region to (new_height, new_width)
    on the static canvas (reference preprocessor.resize_image). `method`
    follows the ResizeImage proto enum: 1 AREA, 2 BICUBIC, 3 BILINEAR,
    4 NEAREST_NEIGHBOR. AREA/BICUBIC are computed as bilinear (documented
    approximation on the fixed canvas); NEAREST is exact."""
    del rng
    if not new_height or not new_width:
        raise ValueError("resize_image requires new_height and new_width")
    th = sample["true_shape"][0].astype(jnp.float32)
    tw = sample["true_shape"][1].astype(jnp.float32)
    img = sample["image"]
    H, W = img.shape[0], img.shape[1]
    sy = jnp.minimum(new_height / th, H / th)
    sx = jnp.minimum(new_width / tw, W / tw)
    kind = "nearest" if method == 4 else "bilinear"
    scaled = _resample_scaled(img, sy, sx, method=kind)
    new_h = min(new_height, H)
    new_w = min(new_width, W)
    rows = jnp.arange(H)[:, None, None]
    cols = jnp.arange(W)[None, :, None]
    inside = (rows < new_h) & (cols < new_w)
    out = dict(sample)
    out["image"] = jnp.where(inside, scaled, 0.0)
    out["boxes"] = sample["boxes"] * jnp.stack([sy, sx, sy, sx])
    out["true_shape"] = jnp.asarray([new_h, new_w], sample["true_shape"].dtype)
    return out


def scale_boxes_to_pixel_coordinates(rng, sample):
    """Normalized [0,1] boxes -> absolute pixel coordinates of the true
    region (reference op; mtlx samples normally carry absolute boxes
    already — this supports pipelines that feed normalized boxes)."""
    th = sample["true_shape"][0].astype(sample["boxes"].dtype)
    tw = sample["true_shape"][1].astype(sample["boxes"].dtype)
    out = dict(sample)
    out["boxes"] = sample["boxes"] * jnp.stack([th, tw, th, tw])
    return out


# ---------------------------------------------------------------------------
# photometric (image in 0-255 float)
# ---------------------------------------------------------------------------


def normalize_image(rng, sample, original_minval=0.0, original_maxval=255.0,
                    target_minval=0.0, target_maxval=1.0):
    img = sample["image"]
    img = (img - original_minval) / (original_maxval - original_minval)
    out = dict(sample)
    out["image"] = img * (target_maxval - target_minval) + target_minval
    return out


def random_pixel_value_scale(rng, sample, minval=0.9, maxval=1.1):
    scale = jax.random.uniform(rng, sample["image"].shape, minval=minval, maxval=maxval)
    out = dict(sample)
    out["image"] = jnp.clip(sample["image"] * scale, 0.0, 255.0)
    return out


def random_adjust_brightness(rng, sample, max_delta=0.2):
    delta = jax.random.uniform(rng, minval=-max_delta, maxval=max_delta) * 255.0
    out = dict(sample)
    out["image"] = jnp.clip(sample["image"] + delta, 0.0, 255.0)
    return out


def random_adjust_contrast(rng, sample, min_delta=0.8, max_delta=1.25):
    factor = jax.random.uniform(rng, minval=min_delta, maxval=max_delta)
    mean = jnp.mean(sample["image"], axis=(0, 1), keepdims=True)
    out = dict(sample)
    out["image"] = jnp.clip((sample["image"] - mean) * factor + mean, 0.0, 255.0)
    return out


def _rgb_to_hsv(img):
    return jnp.stack(jax.vmap(jax.vmap(_px_rgb_to_hsv))(img / 255.0), axis=-1) \
        if False else _hsv_vec(img / 255.0)


def _hsv_vec(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / diff % 6.0,
        jnp.where(mx == g, (b - r) / diff + 2.0, (r - g) / diff + 4.0),
    ) / 6.0
    s = jnp.where(mx > 0, diff / (mx + 1e-12), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb_vec(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    c = v * s
    x = c * (1.0 - jnp.abs(h % 2.0 - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    idx = jnp.floor(h).astype(jnp.int32) % 6
    r = jnp.choose(idx, [c, x, z, z, x, c], mode="clip")
    g = jnp.choose(idx, [x, c, c, x, z, z], mode="clip")
    b = jnp.choose(idx, [z, z, x, c, c, x], mode="clip")
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def random_adjust_hue(rng, sample, max_delta=0.02):
    delta = jax.random.uniform(rng, minval=-max_delta, maxval=max_delta)
    hsv = _hsv_vec(sample["image"] / 255.0)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    out = dict(sample)
    out["image"] = jnp.clip(_hsv_to_rgb_vec(hsv) * 255.0, 0.0, 255.0)
    return out


def random_adjust_saturation(rng, sample, min_delta=0.8, max_delta=1.25):
    factor = jax.random.uniform(rng, minval=min_delta, maxval=max_delta)
    hsv = _hsv_vec(sample["image"] / 255.0)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * factor, 0.0, 1.0))
    out = dict(sample)
    out["image"] = jnp.clip(_hsv_to_rgb_vec(hsv) * 255.0, 0.0, 255.0)
    return out


def random_rgb_to_gray(rng, sample, probability=0.1):
    do = jax.random.bernoulli(rng, probability)
    img = sample["image"]
    gray = jnp.sum(
        img * jnp.asarray([0.2989, 0.587, 0.114]), axis=-1, keepdims=True
    )
    out = dict(sample)
    out["image"] = jnp.where(do, jnp.broadcast_to(gray, img.shape), img)
    return out


def random_distort_color(rng, sample, color_ordering=0):
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    s = random_adjust_brightness(r1, sample, 32.0 / 255.0)
    if color_ordering == 0:
        s = random_adjust_saturation(r2, s, 0.5, 1.5)
        s = random_adjust_hue(r3, s, 0.2)
        s = random_adjust_contrast(r4, s, 0.5, 1.5)
    else:
        s = random_adjust_contrast(r2, s, 0.5, 1.5)
        s = random_adjust_saturation(r3, s, 0.5, 1.5)
        s = random_adjust_hue(r4, s, 0.2)
    return s


def random_black_patches(rng, sample, max_black_patches=10, probability=0.5,
                         size_to_image_ratio=0.1):
    img = sample["image"]
    h, w = img.shape[0], img.shape[1]
    size = int(size_to_image_ratio * max(h, w))
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]

    def one_patch(i, img):
        r = jax.random.fold_in(rng, i)
        r1, r2, r3 = jax.random.split(r, 3)
        do = jax.random.bernoulli(r1, probability)
        y0 = jax.random.randint(r2, (), 0, max(h - size, 1))
        x0 = jax.random.randint(r3, (), 0, max(w - size, 1))
        inside = (
            (rows >= y0) & (rows < y0 + size) & (cols >= x0) & (cols < x0 + size)
        )
        return jnp.where(do & inside[..., None], 0.0, img)

    out = dict(sample)
    out["image"] = jax.lax.fori_loop(0, max_black_patches, one_patch, img)
    return out


def subtract_channel_mean(rng, sample, means=(0.0, 0.0, 0.0)):
    out = dict(sample)
    out["image"] = sample["image"] - jnp.asarray(means)
    return out


# ---------------------------------------------------------------------------
# host-geometry materialization (mtlx/data/host_geometry.py)
# ---------------------------------------------------------------------------


def apply_host_window(image, true_shape, window, src_shape, pad_color,
                      content=None):
    """Materialize a host-drawn variable-geometry augmentation: one
    bilinear resample of `window` (source-canvas coords; the composed
    crop/pad chain) onto the [0, true_shape) region of the same canvas.

    Bilinear taps outside `content` — the rect of source pixels still
    visible after the op chain (HostGeometry tracks it; default: the true
    source region [0, src_shape)) — read pad_color (the reference's pad
    fill); a crop-then-pad chain must fill cropped-away territory with
    pad, not resurrect the source pixels there. Output pixels beyond
    true_shape are zeroed like every other true-region op here. Boxes
    were already transformed host-side (HostGeometry), so only pixels
    move.

    image [H, W, 3] float; window / content [4] float (y0, x0, y1, x1);
    true_shape / src_shape [2] int32; pad_color [3] float.
    """
    H, W = image.shape[0], image.shape[1]
    fh = true_shape[0].astype(jnp.float32)
    fw = true_shape[1].astype(jnp.float32)
    wh = window[2] - window[0]
    ww = window[3] - window[1]
    sh = src_shape[0].astype(jnp.float32)
    sw = src_shape[1].astype(jnp.float32)
    if content is None:
        content = jnp.stack(
            [jnp.float32(0.0), jnp.float32(0.0), sh, sw]
        )
    content = content.astype(jnp.float32)
    # half-pixel-center bilinear, clamped at the window edge (a
    # materialized crop would clamp there too); integer-source taps that
    # land outside the true source region read the pad fill — that part of
    # the window IS pad content (random_pad_image), not edge extension
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * (wh / fh) - 0.5 + window[0]
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * (ww / fw) - 0.5 + window[1]
    ys = jnp.clip(ys, window[0], jnp.maximum(window[2] - 1.0, window[0]))
    xs = jnp.clip(xs, window[1], jnp.maximum(window[3] - 1.0, window[1]))
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    wy = (ys - y0f)[:, None, None]
    wx = (xs - x0f)[None, :, None]
    pad = pad_color.astype(image.dtype)

    def tap(yt, xt):
        yv = (yt >= jnp.maximum(content[0], 0.0)) & (
            yt < jnp.minimum(content[2], sh)
        )
        xv = (xt >= jnp.maximum(content[1], 0.0)) & (
            xt < jnp.minimum(content[3], sw)
        )
        yi = jnp.clip(yt.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xt.astype(jnp.int32), 0, W - 1)
        vals = image[yi][:, xi]
        ok = (yv[:, None] & xv[None, :])[..., None]
        return jnp.where(ok, vals, pad)

    out = (
        tap(y0f, x0f) * (1 - wy) * (1 - wx)
        + tap(y0f, x0f + 1) * (1 - wy) * wx
        + tap(y0f + 1, x0f) * wy * (1 - wx)
        + tap(y0f + 1, x0f + 1) * wy * wx
    )
    rows = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    cols = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    return jnp.where((rows < fh) & (cols < fw), out, 0.0)


def batch_apply_host_window(images, true_shapes, windows, src_shapes,
                            pad_colors, contents=None):
    if contents is None:
        contents = jnp.concatenate(
            [jnp.zeros_like(src_shapes, jnp.float32),
             src_shapes.astype(jnp.float32)], axis=-1,
        )
    return jax.vmap(apply_host_window)(
        images, true_shapes, windows, src_shapes, pad_colors, contents
    )


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

TRANSFORMS: Dict[str, Callable] = {
    "normalize_image": normalize_image,
    "random_horizontal_flip": random_horizontal_flip,
    "random_vertical_flip": random_vertical_flip,
    "random_pixel_value_scale": random_pixel_value_scale,
    "random_rgb_to_gray": random_rgb_to_gray,
    "random_adjust_brightness": random_adjust_brightness,
    "random_adjust_contrast": random_adjust_contrast,
    "random_adjust_hue": random_adjust_hue,
    "random_adjust_saturation": random_adjust_saturation,
    "random_distort_color": random_distort_color,
    "random_jitter_boxes": random_jitter_boxes,
    "random_crop_image": random_crop_image,
    "ssd_random_crop": ssd_random_crop,
    "ssd_random_crop_pad": ssd_random_crop_pad,
    "ssd_random_crop_fixed_aspect_ratio": ssd_random_crop_fixed_aspect_ratio,
    "random_rotation90": random_rotation90,
    "random_image_scale": random_image_scale,
    "random_pad_image": random_pad_image,
    "random_crop_pad_image": random_crop_pad_image,
    "random_crop_to_aspect_ratio": random_crop_to_aspect_ratio,
    "random_resize_method": random_resize_method,
    "resize_image": resize_image,
    "scale_boxes_to_pixel_coordinates": scale_boxes_to_pixel_coordinates,
    "random_black_patches": random_black_patches,
    "subtract_channel_mean": subtract_channel_mean,
}


# Transforms that correctly handle `instance_masks` / `keypoints` in the
# sample: geometric ops that mirror them alongside the image, plus all
# photometric / box-only ops (which leave them untouched by design).
# Crop/scale/rotate-family ops do NOT transform them yet — the augment
# wrapper refuses them when these annotations are loaded rather than
# silently corrupting targets.
MASK_SAFE_TRANSFORMS = frozenset({
    "normalize_image",
    "random_horizontal_flip",
    "random_vertical_flip",
    "random_pixel_value_scale",
    "random_rgb_to_gray",
    "random_adjust_brightness",
    "random_adjust_contrast",
    "random_adjust_hue",
    "random_adjust_saturation",
    "random_distort_color",
    "random_jitter_boxes",
    "scale_boxes_to_pixel_coordinates",
    "subtract_channel_mean",
})


def preprocess(rng, sample, options: List[Tuple[str, dict]]):
    """Apply a list of (transform_name, kwargs) steps (the reference's
    preprocessor.preprocess dispatcher)."""
    for i, (name, kwargs) in enumerate(options):
        fn = TRANSFORMS.get(name)
        if fn is None:
            raise ValueError(f"unimplemented preprocessing step {name!r}")
        sample = fn(jax.random.fold_in(rng, i), sample, **kwargs)
    return sample


def batch_preprocess(rng, batch, options: List[Tuple[str, dict]]):
    """vmap preprocess over the batch with per-sample keys."""
    b = batch["image"].shape[0]
    rngs = jax.random.split(rng, b)
    return jax.vmap(lambda r, s: preprocess(r, s, options))(rngs, batch)
