"""grain-backed input pipeline (the production host loader).

The plain loader (mtlx/data/loader.py) runs decode/resize on the calling
thread; this wraps the same DetectionDataset random-access source in
`grain` for multiprocess prefetching — the TPU-native replacement for the
reference's queue-runner thread pool (SURVEY.md §3.9 input parallelism:
"grain multiprocess host loader + device_put double-buffered prefetch").

Usage:
    loader = make_grain_loader(dataset, batch_size=16, seed=0,
                               worker_count=8)
    for batch in loader:  # numpy dicts, canvas-shaped, batched
        ...

Falls back transparently to zero workers (in-process) where multiprocess
start is unavailable (e.g. 1-core CI).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from mtlx.data.loader import DetectionDataset


try:  # grain is optional at import time (plain loader needs none of this)
    import grain.python as _grain
except ImportError:  # pragma: no cover - depends on environment
    _grain = None

if _grain is not None:
    class _GeometryTransform(_grain.RandomMapTransform):
        """Host-side variable-size crop/pad geometry as a grain transform:
        grain hands each record visit its own np.random.Generator (seeded
        from the sampler seed + visit), exactly the per-visit determinism
        host_geometry.HostGeometry needs. Module-level so worker processes
        can unpickle it."""

        def __init__(self, host_geometry):
            self._hg = host_geometry

        def random_map(self, element, rng: np.random.Generator):
            return self._hg(element, rng)


class _Source:
    """grain RandomAccessDataSource over DetectionDataset."""

    def __init__(self, dataset: DetectionDataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, index: int):
        sample = self._dataset.get(int(index))
        sample.pop("source_id", None)  # keep leaves numeric for batching
        return sample


def make_grain_loader(
    dataset: DetectionDataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    worker_count: int = 0,
    num_epochs: Optional[int] = None,
    pack_images: bool = False,
    aspect_grouping: Optional[bool] = None,
    host_geometry=None,
    max_bucket_variants: int = 0,
) -> Iterator[dict]:
    """Returns an iterator of batched numpy dicts via grain. pack_images
    ships bucketed true-shape images (see loader.pack_batch_images;
    granularity = mtlx.utils.bucketing, bounded by max_bucket_variants
    via loader.BucketCoalescer).
    aspect_grouping (default: on when pack_images is) regroups the
    worker-decoded sample stream so each batch shares one compute bucket
    (grain's sampler shuffles globally, so unlike loader.batches the
    grouping here is a bounded-reservoir stream batcher). host_geometry
    (host_geometry.HostGeometry) runs as a grain RandomMapTransform with
    grain's per-record-visit rng — variable-size crop/pad geometry in the
    worker processes."""
    import grain.python as grain

    if aspect_grouping is None:
        aspect_grouping = pack_images
    aspect_grouping = aspect_grouping and batch_size > 1

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.NoSharding(),  # per-host sharding happens in
        # DetectionDataset (process_index), matching the plain loader
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    operations = []
    if host_geometry is not None:
        operations.append(_GeometryTransform(host_geometry))
    if not aspect_grouping:
        operations.append(grain.Batch(batch_size=batch_size,
                                      drop_remainder=True))
    loader = grain.DataLoader(
        data_source=_Source(dataset),
        sampler=sampler,
        operations=operations,
        worker_count=worker_count,
    )
    # the variant bound applies whenever images pack (pack_batch_images
    # is where the jit-variant shapes are born) — including batch_size 1
    # and explicitly ungrouped runs, where batches still fan out shapes
    coalescer = None
    if max_bucket_variants and pack_images:
        from mtlx.data.loader import build_bucket_coalescer

        coalescer = build_bucket_coalescer(
            dataset, max_bucket_variants, host_geometry=host_geometry
        )
    if aspect_grouping:
        return _bucket_batched(iter(loader), dataset.canvas_size, batch_size,
                               pack_images=pack_images, coalescer=coalescer)
    if not pack_images:
        if host_geometry is None:
            return iter(loader)

        def unpacked():
            for batch in loader:
                b = dict(batch)
                b.pop("pack_shape", None)  # host-only field
                yield b

        return unpacked()

    from mtlx.data.loader import pack_batch_images

    def packed():
        for batch in loader:
            b = dict(batch)
            if "true_shape" in b:
                extents = b.pop("pack_shape", None)
                b["image"] = pack_batch_images(
                    b["image"],
                    extents if extents is not None else b["true_shape"],
                    coalescer,
                )
            yield b

    return packed()


def _bucket_batched(samples: Iterator[dict], canvas, batch_size: int,
                    max_buffered_batches: int = 8,
                    pack_images: bool = True,
                    coalescer=None) -> Iterator[dict]:
    """Group a decoded per-sample stream into same-compute-bucket batches
    (mixed portrait/landscape batches force the full-canvas bucket and
    erase the bucketed-compute win). A bounded reservoir keeps memory and
    latency in check: when it fills before any bucket completes a batch,
    the largest group is flushed as a (partially mixed) batch. Tail
    samples that never fill a batch are dropped, matching grain.Batch
    drop_remainder=True."""
    from mtlx.data.loader import pack_batch_images
    from mtlx.utils.bucketing import bucket_extent

    ch, cw = canvas

    def key(ts):
        k = (bucket_extent(ts[0], ch), bucket_extent(ts[1], cw))
        return coalescer.map(k) if coalescer is not None else k

    def collate(group):
        b = {k: np.stack([s[k] for s in group]) for k in group[0]}
        extents = b.pop("pack_shape", None)
        # grouping is useful without packing too (e.g. deterministic A/B
        # runs), so honor pack_images=False: ship the full canvas
        if pack_images and "true_shape" in b:
            b["image"] = pack_batch_images(
                b["image"],
                extents if extents is not None else b["true_shape"],
                coalescer,
            )
        return b

    groups: dict = {}
    buffered = 0
    for s in samples:
        k = (key(s.get("pack_shape", s["true_shape"]))
             if "true_shape" in s else None)
        groups.setdefault(k, []).append(s)
        buffered += 1
        if len(groups[k]) == batch_size:
            yield collate(groups.pop(k))
            buffered -= batch_size
        elif buffered >= max_buffered_batches * batch_size:
            # no bucket is filling: flush the biggest group, topped up
            # from the others (a mixed batch, but the reservoir stays
            # bounded and the stream keeps moving)
            big = max(groups, key=lambda g: len(groups[g]))
            batch = groups.pop(big)
            while len(batch) < batch_size:
                other = max(groups, key=lambda g: len(groups[g]))
                batch.append(groups[other].pop())
                if not groups[other]:
                    groups.pop(other)
            yield collate(batch)
            buffered -= batch_size
    # drain: pure per-bucket batches first, then mixed batches from the
    # rest — only the final < batch_size tail is dropped, matching
    # grain.Batch drop_remainder=True epoch coverage
    rest = []
    for k in sorted(groups, key=lambda g: -len(groups[g])):
        while len(groups[k]) >= batch_size:
            yield collate([groups[k].pop() for _ in range(batch_size)])
        rest += groups[k]
    for s in range(0, len(rest) - batch_size + 1, batch_size):
        yield collate(rest[s : s + batch_size])
