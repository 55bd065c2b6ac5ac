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
) -> Iterator[dict]:
    """Returns an iterator of batched numpy dicts via grain. pack_images
    ships 128-bucketed true-shape images (see loader.pack_batch_images)."""
    import grain.python as grain

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.NoSharding(),  # per-host sharding happens in
        # DetectionDataset (process_index), matching the plain loader
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=_Source(dataset),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
    if not pack_images:
        return iter(loader)

    from mtlx.data.loader import pack_batch_images

    def packed():
        for batch in loader:
            b = dict(batch)
            if "true_shape" in b:
                b["image"] = pack_batch_images(b["image"], b["true_shape"])
            yield b

    return packed()
