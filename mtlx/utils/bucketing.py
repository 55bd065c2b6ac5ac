"""Compute/transfer bucket granularity — ONE knob shared by the loader
(transfer packing: ship the rounded true-image region, not the canvas),
the train/eval steps (compute bucket: the detector computes on the
rounded region), and the exporter (serving bucket).

The reference's TF1 graph ran dynamic shapes and never computed on
padding; under XLA every distinct shape is one compiled specialization,
so we round true-image extents up to a multiple and trade padding FLOPs
against jit-variant count. 128 (the historical default) keeps the
variant set tiny; finer granularity computes and ships fewer padding
rows/cols wherever the true region does not land near a 128 boundary.

Measured on TPU v5e (tools/bucket_sweep.py, 2026-08-19, batch 16 bf16
train step, XLA cost analysis bytes):

  R101 3-task MTL COCO point (600x800 true region):
    multiple=128 -> 640x896: 94.5 img/s   (91.2% HBM roofline)
    multiple= 64 -> 640x832: 99.2 img/s   (+5.1%)
    multiple= 32 -> 608x800: 106.6 img/s  (+12.9%, 96.4% roofline)
  R50 3-task MTL VOC point (600x1000 true region): see bucket_sweep —
    at 32 the bucket drops 640x1024 -> 608x1024 (5% fewer rows).

The cost is bucket-set size: per-record buckets quantize 4x finer per
axis at 32, so a varied-aspect dataset compiles more step variants
(--precompile_buckets covers them up front; aspect grouping keeps
batches on their own bucket either way). Default stays 128; production
training on datasets with a handful of dominant shapes should run
`--bucket_multiple 32`.

The floor is 32: it exceeds every backbone stride in the zoo (FRCNN
feature stride 16, mask-carry strides <= 32 divide it) and bounds the
variant count; TPU MXU tiling does not constrain H/W here (channels are
the lane dimension).
"""

DEFAULT_BUCKET_MULTIPLE = 128

_multiple = DEFAULT_BUCKET_MULTIPLE


def bucket_multiple() -> int:
    """The current transfer/compute bucket granularity in pixels."""
    return _multiple


def set_bucket_multiple(multiple: int) -> None:
    """Set the global bucket granularity (train.py/eval.py
    --bucket_multiple). Must be a positive multiple of 32 so every
    backbone stride and mask-carry stride in the zoo divides it."""
    global _multiple
    multiple = int(multiple)
    if multiple <= 0 or multiple % 32:
        raise ValueError(
            f"bucket_multiple must be a positive multiple of 32, got "
            f"{multiple}"
        )
    _multiple = multiple


def bucket_extent(extent: int, cap: int, multiple: int = 0) -> int:
    """`extent` rounded up to the bucket granularity, capped at the
    canvas extent."""
    m = multiple or _multiple
    return min(int(cap), -(-int(extent) // m) * m)


def bucket_multiple_arg(value: str):
    """argparse `type=` validator for the CLIs' --bucket_multiple flag
    (0 = unset, defer to the pipeline's `bucketing {}` block): invalid
    values become a usage error instead of a mid-run traceback."""
    import argparse

    v = int(value)
    if v and (v < 0 or v % 32):
        raise argparse.ArgumentTypeError(
            f"must be a positive multiple of 32, got {value}"
        )
    return v


def resolve_bucketing(bucketing_config=None, bucket_multiple_flag: int = 0,
                      max_bucket_variants_flag: int = 0) -> int:
    """Resolve the bucket knobs for one CLI invocation and install the
    granularity: explicit CLI flag > the pipeline's `bucketing {}` block
    (pipeline.proto BucketingConfig — the persistent source of truth, so
    a model trained at a granularity evals/serves at it too) > default.
    Returns the resolved max_bucket_variants bound."""
    cfg_mult = cfg_variants = 0
    if bucketing_config is not None:
        cfg_mult = int(bucketing_config.bucket_multiple)
        cfg_variants = int(bucketing_config.max_bucket_variants)
    set_bucket_multiple(
        int(bucket_multiple_flag) or cfg_mult or DEFAULT_BUCKET_MULTIPLE
    )
    return int(max_bucket_variants_flag) or cfg_variants
