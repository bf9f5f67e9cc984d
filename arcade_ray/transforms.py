"""Generic vectorized Dataset transforms (relational operators that
are one zero-copy Arrow kernel per batch — no shuffle, no state).

Reference parity: the reference engine has no UNNEST; this extends
the relational surface the way its roadmap extends filters/joins
(/root/reference/README.md Features list)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def explode_list(ds, list_col: str, keep: list[str] | None = None,
                 pos_col: str = "pos", val_col: str = "val"):
    """UNNEST a list column: one output row per element, with the
    element's 0-based position. ``keep`` columns replicate via one
    vectorized take (np.repeat of row indices) — no per-row Python.
    Row multiplication happens inside each batch, so the stage streams
    and the executor's backpressure bounds the fan-out's memory."""
    keep = list(keep or [])

    def ex(batch: pa.Table) -> pa.Table:
        arr = batch[list_col].combine_chunks()
        if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
            raise TypeError(f"{list_col!r} is not a list column: {arr.type}")
        larr = arr.cast(pa.large_list(arr.type.value_type)) \
            if not pa.types.is_large_list(arr.type) else arr
        offsets = np.frombuffer(larr.buffers()[1], dtype=np.int64,
                                count=len(larr) + 1,
                                offset=larr.offset * 8)
        lengths = np.diff(offsets)
        if larr.null_count:
            valid = larr.is_valid().to_numpy(zero_copy_only=False)
            lengths = np.where(valid, lengths, 0)  # null lists emit no rows
        row_rep = np.repeat(np.arange(len(larr), dtype=np.int64), lengths)
        pos = (np.arange(len(row_rep), dtype=np.int64)
               - np.repeat(np.concatenate([[0], np.cumsum(lengths[:-1])]),
                           lengths))
        take = pa.array(row_rep, type=pa.int64())
        cols = {c: batch[c].combine_chunks().take(take) for c in keep}
        cols[pos_col] = pa.array(pos)
        if larr.null_count:
            flat_idx = np.repeat(offsets[:-1], lengths) + pos
            cols[val_col] = larr.values.take(
                pa.array(flat_idx, type=pa.int64()))
        else:
            cols[val_col] = larr.values.slice(offsets[0],
                                              offsets[-1] - offsets[0])
        return pa.table(cols)

    return ds.map_batches(ex, batch_format="pyarrow")
