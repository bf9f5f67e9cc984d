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

    from .encode import generation_of_row

    manifest = load_manifest(out_dir)
    cols = [c for c in ("path", "part_key", "generation")
            if c in manifest.column_names]
    items = manifest.select(cols).to_pylist()
    if generation is not None:
        # explicit manifest field ("" = base); legacy rows fall back to
        # key parsing inside generation_of_row
        items = [r for r in items if generation_of_row(r) == generation]
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
