"""Host input pipeline: TFRecord -> decoded, canvas-shaped batches.

Replaces the reference's CPU queue-runner stack (SURVEY.md §3.1 batcher/
prefetcher + input_reader_builder): here the host does only what it must —
JPEG decode (PIL) and keep-aspect resize onto the static canvas — and
everything else (augmentation, pseudo-labels, target assignment) runs
on-device inside the jitted step. Batches are padded to static shapes
([B, H, W, 3] canvas, [B, G, 4] groundtruth + masks) and prefetched to
device with double buffering.

Multi-host: each process reads records where `index % process_count ==
process_index` (per-host sharding, SURVEY.md §6.8).
"""

from __future__ import annotations

import threading
import time
import queue as queue_lib
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mtlx.data import tfrecord
from mtlx.data.example_decoder import InputDataFields, decode_example
from mtlx.ops.shape_utils import pad_or_clip_along_axis


# native fused JPEG decode + resize, lazily compiled on first import
# when missing (native_build.py); optional — the PIL path below is the
# fallback and the semantic reference
from mtlx.data.native_build import ensure_native as _ensure_native

_imgcodec = _ensure_native("_imgcodec_ext")

_JPEG_FORMATS = (b"jpeg", b"jpg", b"JPEG", b"JPG")


def keep_aspect_target(h: int, w: int, min_dimension: int,
                       max_dimension: int) -> Tuple[int, int]:
    """Target (th, tw) of the reference keep_aspect_ratio_resizer."""
    scale = min(min_dimension / min(h, w), max_dimension / max(h, w))
    return int(round(h * scale)), int(round(w * scale))


def native_decode_resize(encoded: bytes, kind: str, params,
                         tf1_resize: bool = False) -> "np.ndarray":
    """Fused libjpeg decode (+DCT-scaled) + bilinear resize onto the
    resizer target. Raises ValueError on undecodable input.

    tf1_resize selects the reference's resize convention — TF1
    resize_images align_corners=False (src = dst * scale, full-resolution
    decode) — for bit-faithful mAP-parity evals; default is half-pixel
    centers (TF2/jax convention)."""
    h0, w0 = _imgcodec.dims(encoded)
    if kind == "fixed":
        th, tw = params["height"], params["width"]
    else:
        th, tw = keep_aspect_target(h0, w0, **params)
    pixels, _, _, oh, ow = _imgcodec.decode(encoded, th, tw, int(tf1_resize))
    return np.frombuffer(pixels, np.uint8).reshape(oh, ow, 3)


def legacy_resize_bilinear(image: "np.ndarray", th: int, tw: int) -> "np.ndarray":
    """Numpy TF1 resize_images (align_corners=False) bilinear — the
    fallback for the native codec's legacy mode (non-JPEG inputs)."""
    h, w = image.shape[:2]
    fy = np.minimum(np.arange(th, dtype=np.float64) * (h / th), h - 1)
    fx = np.minimum(np.arange(tw, dtype=np.float64) * (w / tw), w - 1)
    y0 = fy.astype(np.int32)
    x0 = fx.astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    img = image.astype(np.float32)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(image.dtype, np.integer):
        # floor(v + 0.5) matches the native codec's truncate(v + 0.5)
        # rounding so both tf1_resize paths are bit-identical
        out = np.floor(out + 0.5)
    return out.astype(image.dtype)


def resize_keep_aspect(
    image: np.ndarray, min_dimension: int, max_dimension: int
) -> Tuple[np.ndarray, float]:
    """Reference keep_aspect_ratio_resizer semantics: scale so the short
    side reaches min_dimension unless the long side would exceed
    max_dimension. Returns (resized image, scale)."""
    from PIL import Image

    h, w = image.shape[:2]
    scale = min(min_dimension / min(h, w), max_dimension / max(h, w))
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = np.asarray(
        Image.fromarray(image).resize((nw, nh), Image.BILINEAR), dtype=image.dtype
    )
    return resized, scale


def resize_fixed(image: np.ndarray, height: int, width: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(image).resize((width, height), Image.BILINEAR),
        dtype=image.dtype,
    )


class DetectionDataset:
    """Random-access TFRecord detection dataset with canvas shaping."""

    def __init__(
        self,
        input_paths: Sequence[str],
        canvas_size: Tuple[int, int],
        resizer: Tuple[str, dict] = ("keep_aspect", {"min_dimension": 600, "max_dimension": 1024}),
        max_boxes: int = 100,
        process_index: int = 0,
        process_count: int = 1,
        keep_difficult: bool = True,
        load_instance_masks: bool = False,
        mask_stride: int = 8,
        num_keypoints: int = 0,
        tf1_resize: bool = False,
    ):
        self.canvas_size = canvas_size
        self.resizer = resizer
        # TF1 resize_images align_corners=False convention for the
        # initial keep-aspect resize (mAP-parity evals vs the reference)
        self.tf1_resize = tf1_resize
        self.max_boxes = max_boxes
        self.keep_difficult = keep_difficult
        # instance masks are carried at canvas/mask_stride resolution —
        # dense full-canvas masks per instance would dominate host->device
        # traffic; the mask loss crops+resizes to the prediction resolution
        # anyway (deviation from the reference's full-resolution masks,
        # documented in detector/faster_rcnn.py mask loss)
        self.load_instance_masks = load_instance_masks
        self.mask_stride = mask_stride
        self.num_keypoints = num_keypoints
        self._files: List[Tuple[str, int]] = []
        for path in input_paths:
            for off in tfrecord.record_index(path):
                self._files.append((path, off))
        # per-host shard
        self._files = self._files[process_index::process_count]
        self._handles: Dict[str, object] = {}
        # seek+read on a shared handle must not interleave across threads
        # (device_prefetch producer vs. direct get() callers)
        self._read_lock = threading.Lock()

    # The grain multiprocess loader pickles the data source; locks and
    # open file handles can't cross process boundaries — each worker
    # recreates its own on unpickle.
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_handles"] = {}
        state["_read_lock"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._handles = {}
        self._read_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._files)

    def _read(self, i: int) -> bytes:
        path, off = self._files[i]
        with self._read_lock:
            f = self._handles.get(path)
            if f is None:
                f = open(path, "rb")
                self._handles[path] = f
            return tfrecord.read_record_at(f, off)

    def _parse(self, i: int) -> Dict:
        """Proto parse only — no image decode."""
        return decode_example(
            self._read(i), decode_image=False,
            load_instance_masks=self.load_instance_masks,
            return_encoded=True,
        )

    def _decode_one(self, enc: bytes, fmt: bytes):
        """(resized image, source h, source w) — native fast path with PIL
        fallback (corrupt input, non-JPEG, unbuilt extension)."""
        kind, params = self.resizer
        if _imgcodec is not None and fmt in _JPEG_FORMATS:
            try:  # native fused decode+resize (GIL-free)
                h0, w0 = _imgcodec.dims(enc)
                return native_decode_resize(
                    enc, kind, params, self.tf1_resize
                ), h0, w0
            except ValueError:
                pass  # corrupt/unsupported -> PIL fallback
        import io

        from PIL import Image as _PILImage

        full = np.asarray(
            _PILImage.open(io.BytesIO(enc)).convert("RGB"), np.uint8
        )
        h0, w0 = full.shape[:2]
        if self.tf1_resize:
            if kind == "fixed":
                th, tw = params["height"], params["width"]
            else:
                th, tw = keep_aspect_target(h0, w0, **params)
            image = legacy_resize_bilinear(full, th, tw)
        elif kind == "keep_aspect":
            image, _ = resize_keep_aspect(full, **params)
        else:
            image = resize_fixed(full, **params)
        return image, h0, w0

    def peek_target_shape(self, i: int) -> Tuple[int, int]:
        """(th, tw) the resizer will produce for record i WITHOUT decoding
        pixels (JPEG header via the native codec, lazy PIL open otherwise).
        Powers train-time bucket precompilation (train.py
        --precompile_buckets)."""
        ex = self._parse(i)
        enc = ex[InputDataFields.image_encoded]
        fmt = ex.get(InputDataFields.image_format, b"jpeg")
        kind, params = self.resizer
        if kind == "fixed":
            return params["height"], params["width"]
        if _imgcodec is not None and fmt in _JPEG_FORMATS:
            try:
                h0, w0 = _imgcodec.dims(enc)
                return keep_aspect_target(h0, w0, **params)
            except ValueError:
                pass
        import io

        from PIL import Image as _PILImage

        w0, h0 = _PILImage.open(io.BytesIO(enc)).size  # header only
        return keep_aspect_target(h0, w0, **params)

    def peek_geometry_sample(self, i: int) -> Dict[str, np.ndarray]:
        """Metadata-only sample (no pixel decode) sufficient for
        host_geometry.HostGeometry: the geometry ops read shapes and
        boxes, never pixels — powers post-geometry bucket ranking
        (sampled_post_geometry_keys) at proto-parse + JPEG-header cost."""
        ex = self._parse(i)
        enc = ex[InputDataFields.image_encoded]
        fmt = ex.get(InputDataFields.image_format, b"jpeg")
        kind, params = self.resizer
        h0 = w0 = None
        if _imgcodec is not None and fmt in _JPEG_FORMATS:
            try:
                h0, w0 = _imgcodec.dims(enc)
            except ValueError:
                pass
        if h0 is None:
            import io

            from PIL import Image as _PILImage

            w0, h0 = _PILImage.open(io.BytesIO(enc)).size  # header only
        if kind == "fixed":
            th, tw = params["height"], params["width"]
        else:
            th, tw = keep_aspect_target(h0, w0, **params)
        ch, cw = self.canvas_size
        th, tw = min(th, ch), min(tw, cw)
        boxes_norm = ex[InputDataFields.groundtruth_boxes]
        difficult = ex[InputDataFields.groundtruth_difficult]
        if not self.keep_difficult and len(difficult) == len(boxes_norm):
            boxes_norm = boxes_norm[difficult == 0]
        boxes_abs = boxes_norm * np.asarray([th, tw, th, tw], np.float32)
        n = len(boxes_abs)
        mask = np.zeros((self.max_boxes,), bool)
        mask[: min(n, self.max_boxes)] = True
        return {
            "true_shape": np.asarray([th, tw], np.int32),
            "original_shape": np.asarray([h0, w0], np.int32),
            "gt_boxes": pad_or_clip_along_axis(
                boxes_abs.astype(np.float32), self.max_boxes
            ),
            "gt_mask": mask,
        }

    def get(self, i: int) -> Dict[str, np.ndarray]:
        """One canvas-shaped sample (numpy)."""
        ex = self._parse(i)
        image, h0, w0 = self._decode_one(
            ex[InputDataFields.image_encoded],
            ex.get(InputDataFields.image_format, b"jpeg"),
        )
        return self._assemble(ex, image, h0, w0, i)

    def get_batch(
        self, indices: Sequence[int], decode_threads: int = 4
    ) -> List[Dict[str, np.ndarray]]:
        """Batch of samples with the images decoded by the native thread
        pool (GIL released — scales across host cores). Falls back to
        per-sample get() when the extension is unavailable or any image
        is not a plain JPEG."""
        exs = [self._parse(i) for i in indices]
        blobs = [ex[InputDataFields.image_encoded] for ex in exs]
        fmts = [ex.get(InputDataFields.image_format, b"jpeg") for ex in exs]
        if _imgcodec is None or any(f not in _JPEG_FORMATS for f in fmts):
            return [self.get(int(i)) for i in indices]
        kind, params = self.resizer
        try:
            targets = []
            for blob in blobs:
                h0, w0 = _imgcodec.dims(blob)
                if kind == "fixed":
                    targets.append((params["height"], params["width"], h0, w0))
                else:
                    th, tw = keep_aspect_target(h0, w0, **params)
                    targets.append((th, tw, h0, w0))
            decoded = _imgcodec.decode_batch(
                blobs, [t[0] for t in targets], [t[1] for t in targets],
                decode_threads, int(self.tf1_resize),
            )
        except ValueError:
            return [self.get(int(i)) for i in indices]
        out = []
        for ex, i, (pixels, _, _, oh, ow), (_, _, h0, w0) in zip(
            exs, indices, decoded, targets
        ):
            image = np.frombuffer(pixels, np.uint8).reshape(oh, ow, 3)
            out.append(self._assemble(ex, image, h0, w0, int(i)))
        return out

    def _assemble(self, ex: Dict, image: np.ndarray, h0: int, w0: int,
                  i: int) -> Dict[str, np.ndarray]:
        boxes_norm = ex[InputDataFields.groundtruth_boxes]
        classes = ex[InputDataFields.groundtruth_classes].astype(np.int32) - 1
        difficult = ex[InputDataFields.groundtruth_difficult]
        group_of = ex.get(InputDataFields.groundtruth_group_of)
        if group_of is None or len(group_of) != len(classes):
            group_of = np.zeros(len(classes), np.int64)
        inst_masks = ex.get(InputDataFields.groundtruth_instance_masks)
        keypoints_norm = ex.get(InputDataFields.groundtruth_keypoints)
        if not self.keep_difficult and len(difficult) == len(classes):
            keep = difficult == 0
            boxes_norm, classes = boxes_norm[keep], classes[keep]
            difficult, group_of = difficult[keep], group_of[keep]
            if inst_masks is not None and len(inst_masks):
                inst_masks = inst_masks[keep]
            if keypoints_norm is not None and len(keypoints_norm):
                keypoints_norm = keypoints_norm[keep]

        th, tw = image.shape[:2]
        ch, cw = self.canvas_size
        if th > ch or tw > cw:  # canvas chosen from resizer, shouldn't happen
            image = image[:ch, :cw]
            th, tw = image.shape[:2]
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:th, :tw] = image

        # normalized boxes -> absolute canvas pixels of the resized image
        boxes_abs = boxes_norm * np.asarray([th, tw, th, tw], np.float32)
        n = len(boxes_abs)
        mask = np.zeros((self.max_boxes,), bool)
        mask[: min(n, self.max_boxes)] = True
        gt_kp = None
        if self.num_keypoints > 0:
            p = self.num_keypoints
            gt_kp = np.zeros((self.max_boxes, p, 2), np.float32)
            if keypoints_norm is not None and keypoints_norm.size:
                k = keypoints_norm[: self.max_boxes, :p]
                # normalized -> absolute canvas pixels (same frame as boxes)
                gt_kp[: k.shape[0], : k.shape[1]] = k * np.asarray(
                    [th, tw], np.float32
                )
        gt_inst = None
        if self.load_instance_masks:
            from PIL import Image

            ms = self.mask_stride
            mch, mcw = ch // ms, cw // ms
            gt_inst = np.zeros((self.max_boxes, mch, mcw), np.uint8)
            if inst_masks is not None:
                # resize each instance mask with the image, paste on the
                # canvas, downsample to the reduced mask canvas
                mth, mtw = max(1, round(th / ms)), max(1, round(tw / ms))
                for k in range(min(len(inst_masks), self.max_boxes)):
                    small = np.asarray(
                        Image.fromarray(
                            (inst_masks[k] > 0.5).astype(np.uint8) * 255, "L"
                        ).resize((min(mtw, mcw), min(mth, mch)), Image.BILINEAR)
                    )
                    gt_inst[k, : small.shape[0], : small.shape[1]] = small > 127
        return {
            "image": canvas,
            "true_shape": np.asarray([th, tw], np.int32),
            "original_shape": np.asarray([h0, w0], np.int32),
            "gt_boxes": pad_or_clip_along_axis(
                boxes_abs.astype(np.float32), self.max_boxes
            ),
            "gt_classes": pad_or_clip_along_axis(classes, self.max_boxes),
            "gt_difficult": pad_or_clip_along_axis(
                difficult.astype(np.int32), self.max_boxes
            ),
            "gt_group_of": pad_or_clip_along_axis(
                group_of.astype(np.int32), self.max_boxes
            ),
            "gt_mask": mask,
            "source_id": ex.get(InputDataFields.source_id, str(i)),
            **({"gt_instance_masks": gt_inst} if gt_inst is not None else {}),
            **({"gt_keypoints": gt_kp} if gt_kp is not None else {}),
        }


# Transfer-bucket granularity lives in mtlx.utils.bucketing (ONE knob
# shared with the compute bucket in train_step.pad_batch_to_bucket —
# the loader must ship at the same granularity the step computes at).
from mtlx.utils.bucketing import bucket_extent
from mtlx.utils.bucketing import bucket_multiple as _pack_multiple


def achievable_bucket_shapes(
    dataset: "DetectionDataset",
    batch_size: int,
    max_records: Optional[int] = None,
    host_geometry=None,
    max_bucket_variants: int = 0,
) -> List[Tuple[int, int]]:
    """All (h, w) compute-bucket shapes batches of this dataset can
    produce, from JPEG headers only (peek_target_shape — no pixel
    decodes). Powers train.py --precompile_buckets: compiling every
    variant up front keeps the first occurrence of a rare bucket from
    stalling training for a full XLA compile mid-run.

    A batch's bucket is the componentwise max of its records' buckets, so
    with batch_size > 1 and epoch shuffling the achievable set is the
    pairwise max-closure of the distinct per-record buckets (the max over
    any subset is attained by the record maximizing h and the one
    maximizing w).

    With host_geometry (variable-size crop/pad), a sample ships at
    pack_shape = max(post-crop keep-aspect shape, crop-window read
    extent), so its bucket can land on ANY multiple between the smallest
    post-crop bucket and the per-axis max of the record/post buckets —
    not just in the two endpoint sets. The achievable set is the full
    bucket grid over that per-axis range (which is also max-closed, so
    batch combination adds nothing)."""
    mult = _pack_multiple()
    record_keys = record_bucket_keys(dataset, max_records)
    per_record = set(record_keys)
    if max_bucket_variants:
        # every batch packs through the coalescer (batches() builds the
        # same one via build_bucket_coalescer from the same scan), so the
        # achievable set is bounded by the kept set: map() always lands in
        # kept — seen keys identity (when kept), unseen keys (host-geometry
        # post-crop buckets, mixed tail-batch maxes) at their min-area
        # kept superset. Returned even when no seen key was dropped: the
        # canvas slot can still be visited by unseen keys.
        co = build_bucket_coalescer(
            dataset, max_bucket_variants, host_geometry=host_geometry
        )
        return list(co.kept)
    if host_geometry is not None:
        post = set(host_geometry.achievable_post_buckets(mult))
        both = per_record | post
        lo_h = min(h for h, _ in both)
        lo_w = min(w for _, w in both)
        hi_h = max(h for h, _ in both)
        hi_w = max(w for _, w in both)
        return [
            (h, w)
            for h in range(lo_h, hi_h + 1, mult)
            for w in range(lo_w, hi_w + 1, mult)
        ]
    shapes = set(per_record)
    if batch_size > 1:
        for h1, w1 in per_record:
            for h2, w2 in per_record:
                shapes.add((max(h1, h2), max(w1, w2)))
    return sorted(shapes)


class BucketCoalescer:
    """Bounds the compute-bucket variant count (train.py
    --max_bucket_variants): keeps the full canvas (a superset of every
    bucket, so a mapping always exists) plus the `max_variants - 1`
    most frequent other ranking buckets — at most `max_variants` jit
    variants — and maps every other bucket (seen or unseen) to its
    minimum-area kept superset. Rare shapes pay a little extra padding;
    the dominant shapes keep the exact fine bucket, and the jit-variant
    set is bounded by the kept set. This is what makes fine granularity
    (--bucket_multiple 32, measured +12.9% at the R101 COCO point)
    production-viable on varied-aspect datasets without an unbounded
    compile count.

    The canvas is ALWAYS in the kept set and counts toward the bound:
    unseen keys (host-geometry post-crop buckets, mixed tail-batch
    maxes, grain reservoir flushes) can appear at runtime even when the
    ranking keys had <= max_variants distinct buckets, and identity
    pass-through for them would mint unbounded jit variants — exactly
    what the flag exists to prevent. When the distinct ranking buckets
    plus the canvas already fit the bound, seen keys map to themselves.

    `runtime_stats` counts post-construction map() calls by outcome
    (exact / padded-up / canvas) so callers can detect a mis-ranked kept
    set (e.g. pre-augmentation ranking with host geometry shipping
    mostly post-crop shapes — see build_bucket_coalescer)."""

    def __init__(self, keys: List[Tuple[int, int]], max_variants: int,
                 canvas: Tuple[int, int]):
        from collections import Counter

        if max_variants < 1:
            raise ValueError(f"max_variants must be >= 1, got {max_variants}")
        self.canvas = (int(canvas[0]), int(canvas[1]))
        counts = Counter(tuple(int(a) for a in k) for k in keys)
        # active == some ranking key was dropped from the kept set (its
        # batches pad up); the canvas slot alone does not make it active
        self.active = len(set(counts) | {self.canvas}) > max_variants
        if not self.active:
            kept = set(counts) | {self.canvas}
        else:
            # deterministic keep order: frequency desc, then shape. One
            # slot is reserved for the canvas (the universal superset);
            # N=1 therefore computes everything at the canvas. The canvas
            # is excluded from the frequency ranking so its slot is never
            # double-spent.
            by_freq = sorted(counts, key=lambda k: (-counts[k], k))
            non_canvas = [k for k in by_freq if k != self.canvas]
            kept = set(non_canvas[: max_variants - 1])
            kept.add(self.canvas)
        self.kept = sorted(kept)
        self._map = {}
        for k in counts:
            self.map(k)
        self.runtime_stats = Counter()

    def map(self, key: Tuple[int, int]) -> Tuple[int, int]:
        """The kept bucket this (possibly unseen) bucket computes at.

        Keys exceeding the canvas in either dimension clamp to it first
        (a dataset whose real image extent disagrees with the declared
        canvas_size must degrade to canvas-bucket compute, not crash on
        an empty superset set)."""
        key = (min(int(key[0]), self.canvas[0]),
               min(int(key[1]), self.canvas[1]))
        hit = self._map.get(key)
        if hit is None:
            supers = [s for s in self.kept
                      if s[0] >= key[0] and s[1] >= key[1]]
            # canvas is kept and is a superset of every (clamped) bucket
            hit = min(supers, key=lambda s: (s[0] * s[1], s))
            self._map[key] = hit
        stats = getattr(self, "runtime_stats", None)
        if stats is not None:
            if hit == key:
                stats["exact"] += 1
            elif hit == self.canvas:
                stats["canvas"] += 1
            else:
                stats["padded"] += 1
        return hit

    def maybe_warn_misranked(self, min_calls: int = 64,
                             canvas_fraction: float = 0.5) -> bool:
        """Warn (once) when most runtime mappings fall through to the
        full canvas: the kept set's ranking keys did not match the
        shapes that actually ship, so the fine-granularity throughput
        win the bound exists to preserve is being quietly lost."""
        stats = self.runtime_stats
        total = sum(stats.values())
        if getattr(self, "_warned", False) or total < min_calls:
            return False
        if stats["canvas"] / total <= canvas_fraction:
            return False
        self._warned = True
        import logging

        logging.getLogger(__name__).warning(
            "max_bucket_variants: %d/%d runtime buckets mapped to the "
            "full canvas %s — the kept set %s does not match the shapes "
            "actually shipping (likely pre-augmentation ranking vs "
            "post-geometry shapes); throughput degrades to canvas-bucket "
            "compute.", stats["canvas"], total, self.canvas, self.kept,
        )
        return True


# Deterministic seed for Monte Carlo post-geometry bucket ranking —
# batches() and achievable_bucket_shapes() must build identical kept
# sets (precompile must cover exactly the runtime variants), so the
# draws are independent of the training seed.
_GEOMETRY_RANK_SEED = 0x6B75
_GEOMETRY_RANK_RECORDS = 512


def sampled_post_geometry_keys(
    dataset, host_geometry, max_records: int = _GEOMETRY_RANK_RECORDS
) -> List[Tuple[int, int]]:
    """Per-record post-geometry pack-shape buckets from a deterministic
    Monte Carlo pass (one geometry draw per sampled record, fixed seed,
    metadata only — HostGeometry never touches pixels, and
    peek_geometry_sample avoids the JPEG decode entirely).

    With host geometry, runtime batches pack at post-geometry pack_shape
    buckets, not the pre-augmentation record buckets — ranking the kept
    set from record buckets would keep shapes that rarely ship and pad
    most batches up to the canvas (the bound would hold but the
    fine-granularity win would be lost)."""
    mult = _pack_multiple()
    ch, cw = dataset.canvas_size
    n = len(dataset)
    take = min(n, max_records)
    idx = sorted(set(np.linspace(0, n - 1, take).astype(int).tolist()))
    peek = getattr(dataset, "peek_geometry_sample", dataset.get)
    out = []
    for i in idx:
        sample = peek(int(i))
        rng = np.random.default_rng([_GEOMETRY_RANK_SEED, int(i)])
        post = host_geometry(sample, rng)
        ph, pw = post["pack_shape"]
        out.append((bucket_extent(int(ph), ch, mult),
                    bucket_extent(int(pw), cw, mult)))
    return out


def build_bucket_coalescer(
    dataset, max_variants: int, host_geometry=None,
    record_keys: Optional[List[Tuple[int, int]]] = None,
) -> BucketCoalescer:
    """The one construction path for the --max_bucket_variants coalescer
    (batches(), make_grain_loader, achievable_bucket_shapes/precompile,
    eval) so every consumer agrees on the kept set. Ranks from the
    shapes that actually ship: sampled post-geometry pack buckets when
    host geometry is in play, per-record buckets otherwise."""
    if host_geometry is not None:
        keys = sampled_post_geometry_keys(dataset, host_geometry)
    else:
        keys = record_keys if record_keys is not None \
            else record_bucket_keys(dataset)
    return BucketCoalescer(keys, max_variants, dataset.canvas_size)


def pack_batch_images(images: np.ndarray,
                      true_shapes: np.ndarray,
                      coalescer: Optional[BucketCoalescer] = None,
                      ) -> np.ndarray:
    """Crop a canvas-shaped image batch to its bucketed true region:
    host->device transfer is the e2e bottleneck on thin links (PCIe
    shared across chips; 62 MB/s on this dev tunnel) and the canvas
    padding is all zeros anyway. The device side pads back to the static
    canvas (train_step.pad_batch_to_canvas); each distinct bucket shape
    is one extra jit specialization."""
    ch, cw = images.shape[1:3]
    hb = bucket_extent(true_shapes[:, 0].max(), ch)
    wb = bucket_extent(true_shapes[:, 1].max(), cw)
    if coalescer is not None:
        hb, wb = coalescer.map((hb, wb))
        hb, wb = min(ch, hb), min(cw, wb)
    return np.ascontiguousarray(images[:, :hb, :wb])


def _collate(samples: List[Dict],
             pack_images: bool = False,
             coalescer: Optional[BucketCoalescer] = None,
             ) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        if key == "source_id":
            out[key] = [s[key] for s in samples]
        else:
            out[key] = np.stack([s[key] for s in samples])
    if pack_images and "true_shape" in out:
        # with host geometry (variable-size crops/pads) the shipped pixels
        # must cover both the resample's reads and its output true region
        # — pack_shape is that extent (host_geometry.HostGeometry)
        extents = out.get("pack_shape", out["true_shape"])
        out["image"] = pack_batch_images(out["image"], extents, coalescer)
    out.pop("pack_shape", None)
    return out


def record_bucket_keys(
    dataset: DetectionDataset, max_records: Optional[int] = None
) -> List[Tuple[int, int]]:
    """Per-record compute-bucket shape from image headers only (no pixel
    decodes) — the grouping key for aspect-grouped batching. The scan
    reads every record once (proto parse + image header), so the result
    is cached on the dataset: aspect grouping and --precompile_buckets
    both need it."""
    mult = _pack_multiple()
    ch, cw = dataset.canvas_size
    n = len(dataset)
    if max_records is not None:
        n = min(n, max_records)
    # cache is keyed by the bucket granularity in force when it was built
    cache_mult, cached = getattr(dataset, "_bucket_key_cache", (None, []))
    if cache_mult != mult:
        cached = []
    if len(cached) >= n:
        return cached[:n]
    # extend the cached prefix instead of rescanning it: eval polls call
    # this with max_records=num_examples every checkpoint, and the scan is
    # O(n) proto parses + JPEG header reads
    out = list(cached)
    for i in range(len(out), n):
        th, tw = dataset.peek_target_shape(i)
        out.append((bucket_extent(th, ch, mult), bucket_extent(tw, cw, mult)))
    try:
        dataset._bucket_key_cache = (mult, out)
    except (AttributeError, TypeError):
        pass
    return out


def _grouped_epoch_order(keys: List[Tuple[int, int]], batch_size: int,
                         rng, shuffle: bool) -> List[np.ndarray]:
    """One epoch's batches with aspect grouping: records sharing a
    compute bucket batch together (a mixed portrait/landscape batch
    forces the full-canvas bucket, erasing the bucketed-compute win —
    +45% device throughput at the VOC operating point). Per-group
    leftovers form mixed tail batches so every record is still visited
    exactly once per epoch."""
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i, k in enumerate(keys):
        groups.setdefault(k, []).append(i)
    out, leftover = [], []
    for k in sorted(groups):
        idxs = np.asarray(groups[k])
        if shuffle:
            rng.shuffle(idxs)
        full = len(idxs) // batch_size * batch_size
        out += [idxs[s : s + batch_size] for s in range(0, full, batch_size)]
        leftover += list(idxs[full:])
    leftover = np.asarray(leftover, dtype=np.int64)
    if shuffle and len(leftover):
        rng.shuffle(leftover)
    out += [leftover[s : s + batch_size]
            for s in range(0, len(leftover), batch_size)]
    if shuffle:
        rng.shuffle(out)
    return out


def batches(
    dataset: DetectionDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    drop_remainder: bool = True,
    decode_threads: int = 0,
    pack_images: bool = False,
    aspect_grouping: Optional[bool] = None,
    host_geometry=None,
    max_bucket_variants: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Host batch iterator (shuffled each epoch with a fixed seed —
    deterministic data order, SURVEY.md §6.2). decode_threads > 0 decodes
    each batch's JPEGs through the native GIL-free thread pool.
    pack_images ships bucketed true-shape images (see _collate).
    aspect_grouping (default: on when pack_images is) batches records by
    shared compute bucket (_grouped_epoch_order). host_geometry (a
    host_geometry.HostGeometry) applies variable-size crop/pad geometry
    per record visit, seeded by (seed, epoch, record) — deterministic,
    different every epoch. max_bucket_variants > 0 bounds the
    compute-bucket set (BucketCoalescer): rare buckets pad up to their
    nearest kept superset, so fine --bucket_multiple granularity keeps
    its throughput win without an unbounded jit-variant count."""
    if aspect_grouping is None:
        aspect_grouping = pack_images
    aspect_grouping = aspect_grouping and batch_size > 1
    rng = np.random.RandomState(seed)
    epoch = 0
    n = len(dataset)
    keys = record_bucket_keys(dataset) if aspect_grouping else None
    coalescer = None
    # the variant bound applies whenever images pack (pack_batch_images
    # is where the jit-variant shapes are born) — including batch_size 1,
    # where aspect grouping is moot but per-record buckets still fan out
    if max_bucket_variants and pack_images:
        coalescer = build_bucket_coalescer(
            dataset, max_bucket_variants,
            host_geometry=host_geometry, record_keys=keys,
        )
        # grouping keys coalesce too (records sharing a kept bucket batch
        # together) — except under host geometry, where the kept set is
        # ranked from post-geometry shapes and record buckets are only a
        # grouping heuristic, not the buckets that ship
        if keys is not None and host_geometry is None:
            keys = [coalescer.map(k) for k in keys]
    while epochs is None or epoch < epochs:
        if aspect_grouping:
            epoch_batches = _grouped_epoch_order(keys, batch_size, rng, shuffle)
            order = np.concatenate(epoch_batches) if epoch_batches else np.arange(n)
        else:
            order = rng.permutation(n) if shuffle else np.arange(n)
            epoch_batches = [order[s : s + batch_size]
                             for s in range(0, n, batch_size)]
        for idx in epoch_batches:
            if len(idx) < batch_size:
                if drop_remainder:
                    continue
                idx = np.concatenate([idx, order[: batch_size - len(idx)]])
            if decode_threads > 0:
                samples = dataset.get_batch(idx, decode_threads)
            else:
                samples = [dataset.get(int(i)) for i in idx]
            if host_geometry is not None:
                samples = [
                    host_geometry(
                        s, np.random.default_rng([seed, epoch, int(i)])
                    )
                    for s, i in zip(samples, idx)
                ]
            yield _collate(samples, pack_images, coalescer)
            if coalescer is not None:
                coalescer.maybe_warn_misranked()
        epoch += 1


class PrefetchStats:
    """Per-batch timing of the prefetch pipeline, to locate the e2e
    serialization point (is the host producer, the host->device transfer,
    or the device step the bottleneck?). All lists are seconds per batch:

      host:  iterator pull (decode+collate) on the producer thread
      put:   device_put dispatch + readiness of the shipped tree (the
             transfer itself, bounded by block_until_ready — a LOWER
             bound on the remote axon tunnel, which can under-wait)
      stall: consumer time blocked in q.get() (0 == perfectly overlapped:
             the producer kept the buffer ahead of the step loop)
    """

    def __init__(self):
        self.host = []
        self.put = []
        self.stall = []

    def summary(self):
        import numpy as _np

        def _m(xs):
            return float(_np.mean(xs)) if xs else 0.0

        wall = sum(self.stall) + 0.0  # stall is the non-overlapped part
        return {
            "host_s_per_batch": round(_m(self.host), 4),
            "put_s_per_batch": round(_m(self.put), 4),
            "consumer_stall_s_per_batch": round(_m(self.stall), 4),
            "batches": len(self.stall),
            "total_stall_s": round(wall, 3),
        }


def device_prefetch(iterator, size: int = 2, sharding=None, stats=None):
    """Background-thread prefetch + device_put (double buffering) —
    replaces the reference's prefetch queue (SURVEY.md §3.1 prefetcher).

    The producer thread shuts down when the consumer stops iterating
    (generator close / GC) — an abandoned producer must not keep pulling
    from `iterator` (it would race later readers of the same dataset).

    stats: optional PrefetchStats; recording adds a block_until_ready
    per batch on the producer thread (honest transfer accounting), so
    only pass one when measuring."""
    import jax

    q: queue_lib.Queue = queue_lib.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_lib.Full:
                continue
        return False

    def producer():
        import time as time_lib

        try:
            while True:
                t0 = time_lib.perf_counter()
                try:
                    batch = next(iterator)
                except StopIteration:
                    break
                if stop.is_set():
                    return
                t1 = time_lib.perf_counter()
                ids = batch.pop("source_id", None)
                # one device_put over the whole tree: fewer dispatch
                # round-trips than a per-leaf tree_map
                batch = jax.device_put(
                    batch, sharding if sharding is not None else None
                )
                if stats is not None:
                    jax.block_until_ready(batch)
                    stats.host.append(t1 - t0)
                    stats.put.append(time_lib.perf_counter() - t1)
                if not _put((batch, ids)):
                    return
            _put(_END)
        except BaseException as e:  # surface errors to the consumer
            _put(e)

    iterator = iter(iterator)
    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            t0 = time.perf_counter() if stats is not None else 0.0
            item = q.get()
            if stats is not None:
                stats.stall.append(time.perf_counter() - t0)
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # unblock a producer stuck in q.put
        try:
            q.get_nowait()
        except queue_lib.Empty:
            pass
