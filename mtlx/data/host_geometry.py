"""Host-side variable-size geometry augmentation (crop/pad family).

With a keep_aspect_ratio_resizer the reference's crop/pad augmentations
change the image's FINAL size and aspect ratio: it crops/pads the raw
decoded image and only then applies the resizer, so a tall crop of a
landscape photo trains at a tall ~600x1024 shape (reference
`core/preprocessor.py` crop ops feeding the `keep_aspect_ratio_resizer`,
SURVEY.md §3.1/§4.1). The device-side preprocessor cannot reproduce that
under jit — its shapes are static — so its crop ops resample back onto
the incoming geometry (documented deviation in mtlx/data/preprocessor.py).

This module closes that gap the TPU-native way, by splitting geometry
from pixels:

  * The HOST draws the crop/pad GEOMETRY in numpy (it needs only the
    groundtruth boxes and the image dims — no pixels), composes the whole
    op chain into ONE affine source-window -> output mapping, applies the
    keep-aspect rule to the post-augmentation dims, and rewrites
    true_shape/boxes accordingly. The existing 128-bucket machinery then
    batches, ships and computes at the REAL post-crop shape — exactly the
    variable-size semantics the reference's dynamic graph had, at a
    bounded number of jit specializations.
  * The DEVICE materializes the pixels with a single jitted bilinear
    window-resample (preprocessor.apply_host_window), inside the train
    step where the rest of the augmentation pipeline already runs.

Scope: engaged only for keep_aspect resizers — with a fixed_shape_resizer
(SSD) the final shape is constant, so the device crop+resample path is
already geometrically exact and stays in charge. Pixel values differ from
the reference by one extra resample (the window is cut from the
already-resized image rather than the raw decode); geometry — the final
size, aspect, box layout, and coverage/rejection sampling — matches.

Ordering note: geometry ops are hoisted in front of the device-side
(photometric/flip) ops regardless of their position in the config list.
Photometric ops commute with geometry exactly; flips/rotations commute in
distribution (the crop window's position law is symmetric), matching the
reference's sampling distribution if not its per-record RNG draws.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from mtlx.data.loader import keep_aspect_target
from mtlx.geometry import np_box_ops

# ops whose geometry (not pixels) this module reproduces; everything else
# stays in the device preprocessor
CROP_FAMILY = frozenset({
    "random_crop_image",
    "random_pad_image",
    "random_crop_pad_image",
    "random_crop_to_aspect_ratio",
    "ssd_random_crop",
    "ssd_random_crop_pad",
    "ssd_random_crop_fixed_aspect_ratio",
})

AUG_FIELDS = ("aug_window", "aug_src_shape", "aug_pad_color", "aug_content")

# mirrors preprocessor._SSD_DEFAULT_OPERATIONS (the reference's 7-branch
# SSD patch-sampling schedule; the implicit first branch keeps the image)
_SSD_DEFAULT_OPERATIONS = tuple(
    dict(min_object_covered=t, min_aspect_ratio=0.5, max_aspect_ratio=2.0,
         min_area=0.1, max_area=1.0, overlap_thresh=t, random_coef=0.0)
    for t in (0.1, 0.3, 0.5, 0.7, 0.9, 0.0)
)

_CROP_KEYS = ("min_object_covered", "min_aspect_ratio", "max_aspect_ratio",
              "min_area", "max_area", "overlap_thresh", "random_coef")


def split_host_geometry(aug_options, resizer):
    """Partition builder aug options into (host geometry ops, device ops).

    Crop/pad-family ops run host-side only when the resizer is
    keep_aspect (their whole point there is a variable final shape); with
    a fixed resizer the device path is exact and everything stays there.
    """
    kind = resizer[0] if isinstance(resizer, tuple) else resizer
    if kind != "keep_aspect":
        return [], list(aug_options)
    host = [(n, kw) for n, kw in aug_options if n in CROP_FAMILY]
    device = [(n, kw) for n, kw in aug_options if n not in CROP_FAMILY]
    return host, device


class _Frame:
    """Geometry state threaded through the op chain: the current frame's
    dims, its origin in source-canvas coords (all frames share the source
    scale — crops/pads only translate), the groundtruth in current-frame
    coords, and the pad fill color."""

    def __init__(self, h: float, w: float, boxes: np.ndarray,
                 valid: np.ndarray):
        self.h = float(h)
        self.w = float(w)
        self.oy = 0.0
        self.ox = 0.0
        self.boxes = boxes.astype(np.float64).copy()
        self.valid = valid.copy()
        self.pad_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
        self.pad_color_set = False
        # source pixels still visible after the op chain (source-canvas
        # coords). A crop DISCARDS content outside its window: a later pad
        # must fill that area with pad color, not resurrect it — the
        # composed window alone cannot distinguish cropped-away source
        # territory from pad territory.
        self.content = np.asarray([0.0, 0.0, float(h), float(w)])


def _crop(frame: _Frame, rng, min_object_covered=1.0, min_aspect_ratio=0.75,
          max_aspect_ratio=1.33, min_area=0.1, max_area=1.0,
          overlap_thresh=0.3, random_coef=0.0, num_attempts=8) -> None:
    """Mirror of preprocessor.random_crop_image's sampler (itself modeled
    on tf.image.sample_distorted_bounding_box): draw num_attempts windows,
    take the first satisfying min_object_covered, keep the image when none
    does (or with prob random_coef)."""
    if random_coef > 0.0 and rng.random() < random_coef:
        return
    th, tw = frame.h, frame.w
    window = None
    vboxes = frame.boxes[frame.valid]
    for _ in range(num_attempts):
        area_frac = rng.uniform(min_area, max_area)
        aspect = rng.uniform(min_aspect_ratio, max_aspect_ratio)
        h = math.sqrt(area_frac * th * tw / aspect)
        w = h * aspect
        h, w = min(h, th), min(w, tw)
        y = rng.random() * (th - h)
        x = rng.random() * (tw - w)
        cand = np.asarray([y, x, y + h, x + w])
        if min_object_covered > 0.0 and len(vboxes):
            cover = np_box_ops.ioa(cand[None, :], vboxes)[0]
            if not np.any(cover >= min_object_covered):
                continue
        window = cand
        break
    if window is None:
        return  # TF max_attempts fallback: keep the image unchanged
    y0, x0, y1, x1 = window
    ioa = np_box_ops.ioa(window[None, :], frame.boxes)[0]
    keep = ioa >= overlap_thresh
    clipped = np_box_ops.clip_to_window(frame.boxes, window)
    frame.boxes = clipped - np.asarray([y0, x0, y0, x0])
    frame.valid = frame.valid & keep
    # content visibility shrinks to the crop window (in source coords):
    # source pixels outside it are gone for good, even if a later pad
    # re-covers that territory
    c = frame.content
    frame.content = np.asarray([
        max(c[0], frame.oy + y0), max(c[1], frame.ox + x0),
        min(c[2], frame.oy + y1), min(c[3], frame.ox + x1),
    ])
    frame.content[2] = max(frame.content[2], frame.content[0])
    frame.content[3] = max(frame.content[3], frame.content[1])
    frame.oy += y0
    frame.ox += x0
    frame.h, frame.w = y1 - y0, x1 - x0


def _pad(frame: _Frame, rng, src_scale: float, min_image_height=0,
         min_image_width=0, max_image_height=0, max_image_width=0,
         pad_color=(), min_size_ratio=(), max_size_ratio=()) -> None:
    """Grow the frame by padding (reference random_pad_image): target dims
    uniform in [min, max], content at a uniform offset. Absolute
    min/max_image_* bounds are in ORIGINAL pixel units — src_scale
    converts them to source-canvas units. Unlike the device op the padded
    frame is NOT clamped to the canvas: the keep-aspect rule rescales it
    afterwards, exactly like the reference's pad-then-resize."""
    th, tw = frame.h, frame.w
    min_h = max(th, float(min_image_height) * src_scale)
    min_w = max(tw, float(min_image_width) * src_scale)
    # reference default: pad up to 2x the current size
    max_h = float(max_image_height) * src_scale if max_image_height else 2 * th
    max_w = float(max_image_width) * src_scale if max_image_width else 2 * tw
    if len(min_size_ratio) == 2:
        min_h = max(min_h, min_size_ratio[0] * th)
        min_w = max(min_w, min_size_ratio[1] * tw)
    if len(max_size_ratio) == 2:
        max_h = min(max_h, max_size_ratio[0] * th)
        max_w = min(max_w, max_size_ratio[1] * tw)
    new_h = rng.uniform(min_h, max(max_h, min_h))
    new_w = rng.uniform(min_w, max(max_w, min_w))
    top = rng.random() * (new_h - th)
    left = rng.random() * (new_w - tw)
    frame.boxes = frame.boxes + np.asarray([top, left, top, left])
    frame.oy -= top
    frame.ox -= left
    frame.h, frame.w = new_h, new_w
    if len(pad_color) == 3 and not frame.pad_color_set:
        frame.pad_color = tuple(float(c) for c in pad_color)
        frame.pad_color_set = True


def _crop_pad(frame, rng, src_scale, min_padded_size_ratio=(),
              max_padded_size_ratio=(), pad_color=(), **crop_kw) -> None:
    _crop(frame, rng, **{k: crop_kw[k] for k in _CROP_KEYS if k in crop_kw})
    _pad(frame, rng, src_scale, pad_color=tuple(pad_color),
         min_size_ratio=tuple(min_padded_size_ratio),
         max_size_ratio=tuple(max_padded_size_ratio))


def _crop_to_aspect_ratio(frame, rng, aspect_ratio=1.0,
                          overlap_thresh=0.3) -> None:
    _crop(frame, rng, min_object_covered=0.0,
          min_aspect_ratio=aspect_ratio, max_aspect_ratio=aspect_ratio,
          min_area=0.95, max_area=1.0, overlap_thresh=overlap_thresh)


def _ssd_branch(frame, rng, src_scale, operations, fixed_aspect=None,
                with_pad=False) -> None:
    keep = not operations
    ops = tuple(operations) or _SSD_DEFAULT_OPERATIONS
    n = len(ops) + (1 if keep else 0)
    idx = int(rng.integers(n))
    if keep and idx == 0:
        return
    op = dict(ops[idx - 1 if keep else idx])
    if fixed_aspect is not None:
        op["min_aspect_ratio"] = fixed_aspect
        op["max_aspect_ratio"] = fixed_aspect
    if with_pad:
        _crop_pad(frame, rng, src_scale, **op)
    else:
        _crop(frame, rng, **{k: op[k] for k in _CROP_KEYS if k in op})


class HostGeometry:
    """Applies a configured chain of crop/pad-family geometry ops to one
    loader sample (numpy, pixels untouched), rewriting true_shape/boxes
    to the post-augmentation keep-aspect shape and attaching the affine
    window the device resample materializes
    (preprocessor.apply_host_window)."""

    def __init__(self, ops: Sequence[Tuple[str, dict]],
                 min_dimension: int, max_dimension: int,
                 canvas_size: Tuple[int, int]):
        unknown = [n for n, _ in ops if n not in CROP_FAMILY]
        if unknown:
            raise ValueError(f"not host-geometry ops: {unknown}")
        self.ops = list(ops)
        self.min_dimension = int(min_dimension)
        self.max_dimension = int(max_dimension)
        self.canvas_size = tuple(canvas_size)

    def __call__(self, sample: Dict[str, np.ndarray],
                 rng: np.random.Generator) -> Dict[str, np.ndarray]:
        pre_h, pre_w = (int(sample["true_shape"][0]),
                        int(sample["true_shape"][1]))
        orig = sample.get("original_shape")
        src_scale = pre_h / float(orig[0]) if orig is not None else 1.0
        frame = _Frame(pre_h, pre_w, sample["gt_boxes"], sample["gt_mask"])
        for name, kw in self.ops:
            r = rng  # ops consume the shared stream in configured order
            if name == "random_crop_image":
                _crop(frame, r, **kw)
            elif name == "random_pad_image":
                _pad(frame, r, src_scale, **kw)
            elif name == "random_crop_pad_image":
                _crop_pad(frame, r, src_scale, **kw)
            elif name == "random_crop_to_aspect_ratio":
                _crop_to_aspect_ratio(frame, r, **kw)
            elif name == "ssd_random_crop":
                _ssd_branch(frame, r, src_scale,
                            kw.get("operations", ()))
            elif name == "ssd_random_crop_pad":
                _ssd_branch(frame, r, src_scale,
                            kw.get("operations", ()), with_pad=True)
            elif name == "ssd_random_crop_fixed_aspect_ratio":
                _ssd_branch(frame, r, src_scale, kw.get("operations", ()),
                            fixed_aspect=kw.get("aspect_ratio", 1.0))
            else:  # pragma: no cover - guarded in __init__
                raise ValueError(name)

        fh, fw = keep_aspect_target(
            frame.h, frame.w, self.min_dimension, self.max_dimension
        )
        ch, cw = self.canvas_size
        fh, fw = min(fh, ch), min(fw, cw)
        sy, sx = fh / frame.h, fw / frame.w
        out = dict(sample)
        out["true_shape"] = np.asarray([fh, fw], np.int32)
        out["gt_boxes"] = (
            frame.boxes * np.asarray([sy, sx, sy, sx])
        ).astype(np.float32)
        out["gt_mask"] = frame.valid
        if "gt_keypoints" in sample:
            # crops/pads only translate the frame, so the accumulated
            # origin transforms keypoints directly; outside-window points
            # become NaN (reference keypoint_ops.prune_outside_window
            # after change_coordinate_frame in _strict_random_crop_image).
            # A point must also survive every crop along the chain: its
            # SOURCE position must sit inside the accumulated content rect
            # (a crop-then-pad chain can place cropped-away territory back
            # inside the final frame).
            src_kp = sample["gt_keypoints"].astype(np.float64)
            kp = (src_kp - np.asarray([frame.oy, frame.ox])) * np.asarray([sy, sx])
            c = frame.content
            inside = (
                (kp[..., 0] >= 0) & (kp[..., 0] <= fh)
                & (kp[..., 1] >= 0) & (kp[..., 1] <= fw)
                & (src_kp[..., 0] >= c[0]) & (src_kp[..., 0] <= c[2])
                & (src_kp[..., 1] >= c[1]) & (src_kp[..., 1] <= c[3])
            )
            out["gt_keypoints"] = np.where(
                inside[..., None], kp, np.nan
            ).astype(np.float32)
        # gt_instance_masks pass through untouched: they stay aligned to
        # the SOURCE canvas (at mask_stride resolution) and the train step
        # window-resamples them with the same aug_window the image uses
        # (train.make_augmented_batch_fn).
        out["aug_window"] = np.asarray(
            [frame.oy, frame.ox, frame.oy + frame.h, frame.ox + frame.w],
            np.float32,
        )
        out["aug_src_shape"] = np.asarray([pre_h, pre_w], np.int32)
        out["aug_pad_color"] = np.asarray(frame.pad_color, np.float32)
        out["aug_content"] = frame.content.astype(np.float32)
        # shipped-pixels extent: reads stop at window∩content (taps outside
        # the content rect render pad fill, never image pixels), writes at
        # the output true region — pack_batch_images buckets over the max
        read_h = max(0.0, min(frame.oy + frame.h, frame.content[2]))
        read_w = max(0.0, min(frame.ox + frame.w, frame.content[3]))
        out["pack_shape"] = np.asarray(
            [min(ch, max(fh, math.ceil(read_h))),
             min(cw, max(fw, math.ceil(read_w)))],
            np.int32,
        )
        return out

    def achievable_post_buckets(self, multiple: int = 0) -> List[Tuple[int, int]]:
        """All bucket shapes the post-augmentation keep-aspect rule can
        produce (for train.py --precompile_buckets): the final shape is a
        pure function of the augmented aspect ratio, so sweeping aspects
        densely enumerates the finite bucket set."""
        if not multiple:
            from mtlx.utils.bucketing import bucket_multiple
            multiple = bucket_multiple()
        ch, cw = self.canvas_size
        shapes = set()
        for a in np.geomspace(0.05, 20.0, 4096):
            fh, fw = keep_aspect_target(
                1000.0, 1000.0 * a, self.min_dimension, self.max_dimension
            )
            shapes.add((
                min(ch, -(-min(fh, ch) // multiple) * multiple),
                min(cw, -(-min(fw, cw) // multiple) * multiple),
            ))
        return sorted(shapes)
