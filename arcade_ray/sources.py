"""Extra sources: CSV/JSONL ingestion of tokenized corpora.

The reference ingests ','-delimited CSV (src/writer.cpp:411,442-457);
a reference user switching to this engine can keep CSV inputs: token
arrays travel as space-separated strings in a CSV column and a
vectorized map_batches parser rebuilds ``list<int32>`` — the
per-record parser stage of SURVEY.md §2.3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def parse_tokens_batch(batch: pa.Table, tokens_col: str = "tokens",
                       delimiter: str = " ") -> pa.Table:
    """Vectorized ' '-joined token string -> list<int32> (+ n_tok)."""
    s = batch[tokens_col]
    if not (pa.types.is_string(s.type) or pa.types.is_large_string(s.type)):
        return batch  # already parsed
    split = pc.split_pattern(s.combine_chunks(), delimiter)
    # empty string -> [''] -> drop to []
    flat = split.flatten()
    keep = pc.not_equal(flat, "")
    lengths = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    # recompute lengths after dropping empties: count empties per row
    empt = pc.invert(keep).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    drop_per_row = np.add.reduceat(
        np.append(empt, False).astype(np.int64), offsets[:-1]
    ) if len(lengths) else np.zeros(0, np.int64)
    drop_per_row[lengths == 0] = 0
    new_lengths = lengths - drop_per_row
    vals = pc.cast(flat.filter(keep), pa.int32())
    new_offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(new_lengths, out=new_offsets[1:])
    tokens = pa.LargeListArray.from_arrays(
        pa.array(new_offsets, type=pa.int64()), vals
    ).cast(pa.list_(pa.int32()))
    out = batch.set_column(
        batch.schema.get_field_index(tokens_col), tokens_col, tokens
    )
    if "n_tok" not in out.column_names:
        out = out.append_column(
            "n_tok", pa.array(new_lengths.astype(np.int32), type=pa.int32())
        )
    return out


def read_tokenized_csv(paths, tokens_col: str = "tokens",
                       delimiter: str = " "):
    """ray.data.read_csv + the token parser stage -> corpus-shaped
    Dataset ready for encode_dataset."""
    import ray.data as rd

    ds = rd.read_csv(paths)
    return ds.map_batches(
        lambda b: parse_tokens_batch(b, tokens_col, delimiter),
        batch_format="pyarrow",
    )


def read_tokenized_jsonl(paths, tokens_col: str = "tokens"):
    """JSONL with native list-typed token arrays. Appends the derived
    ``n_tok`` weight column when absent (the CSV path gets it from the
    token parser; without this, the encode default weight_col="n_tok"
    errors on a bare doc_id/source/tokens JSONL)."""
    import pyarrow.compute as _pc
    import ray.data as rd

    ds = rd.read_json(paths)

    def add_n_tok(b: pa.Table) -> pa.Table:
        if "n_tok" in b.column_names or tokens_col not in b.column_names:
            return b
        n = _pc.fill_null(_pc.list_value_length(b[tokens_col]), 0)
        return b.append_column("n_tok", n.cast(pa.int32()))

    return ds.map_batches(add_n_tok, batch_format="pyarrow")


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _first_parquet_file(paths) -> str | None:
    import glob
    import os

    p = paths[0] if isinstance(paths, (list, tuple)) and paths else paths
    if not isinstance(p, str):
        return None
    if os.path.isdir(p):
        fs = sorted(glob.glob(os.path.join(p, "*.parquet")))
        return fs[0] if fs else None
    return p


def read_parquet_clean(paths, *, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` + schema-metadata strip.

    Pandas-written parquet carries schema-level ``b'pandas'`` metadata;
    a pa.Schema with metadata is UNHASHABLE, which defeats Ray Data's
    schema deduplication in every block-metadata unify — inside the
    read operator itself and in every downstream shuffle (one "Failed
    to hash the schemas" warning per task, un-deduplicated schema
    objects at scale). Passing an explicit metadata-free schema makes
    the read produce clean blocks from the start; the fused map strip
    stays as a belt-and-braces fallback (no-op on clean blocks)."""
    import ray.data as rd

    if "schema" not in kwargs:
        first = _first_parquet_file(paths)
        if first is not None:
            try:
                import pyarrow.parquet as pq

                sch = pq.read_schema(first).remove_metadata()
                if columns is not None:
                    # the read projects to `columns`; the schema must
                    # match the projected batches or block-unify raises
                    sch = pa.schema([sch.field(c) for c in columns])
                kwargs["schema"] = sch
            except Exception:
                pass  # unreadable/remote path: the map strip still covers us
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")
