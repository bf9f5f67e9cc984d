"""Decode pipeline: manifest -> streaming per-partition decode tasks.

The Ray Data analogue of the reference's coroutine scan generator
(src/reader.cpp:146-195): a Dataset over manifest rows, each task
decodes one partition file back to Arrow (optionally a projection) and
the streaming executor pipelines/backpressures the blocks downstream.
"""

from __future__ import annotations

import pyarrow as pa

from ..format import decode_partition
from .encode import load_manifest


def decode_dataset(out_dir: str, columns: list[str] | None = None,
                   concurrency: int | None = None,
                   generation: str | None = None):
    """-> ray.data.Dataset of decoded rows (streaming, one task per
    partition file). ``generation`` restricts the scan to one append
    generation's partitions ("" = the base generation, i.e. partitions
    written without a generation namespace)."""
    import ray.data as rd

    manifest = load_manifest(out_dir)
    items = manifest.select(["path", "part_key"]).to_pylist()
    if generation is not None:
        if generation == "":
            items = [r for r in items
                     if "@" not in r["part_key"].split("#", 1)[0]]
        else:
            items = [r for r in items if r["part_key"]
                     .split("#", 1)[0].endswith(f"@{generation}")]
    items = [{"path": r["path"]} for r in items]
    if not items:
        raise FileNotFoundError(
            f"no committed partitions under {out_dir}"
            + (f" for generation {generation!r}" if generation is not None
               else ""))
    paths_ds = rd.from_items(items)

    def decode_batch(batch: pa.Table) -> pa.Table:
        tables = [
            decode_partition(p.as_py(), columns=columns) for p in batch["path"]
        ]
        return pa.concat_tables(tables)

    # batch_size=1: one partition per task call; a partition is already
    # a full Ray-block-sized unit of work.
    return paths_ds.map_batches(
        decode_batch, batch_format="pyarrow", batch_size=1,
        concurrency=concurrency,
    )
