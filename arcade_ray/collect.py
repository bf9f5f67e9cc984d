"""Materialize small result Datasets to a single Arrow table.

Only for small results (aggregates, pair lists, top-k partials) — never
call this on a full-corpus Dataset; big outputs stream via
``write_parquet`` / ``iter_batches``.
"""

from __future__ import annotations

import pyarrow as pa


def collect_arrow(ds) -> pa.Table:
    """Concat a Dataset's blocks, tolerating Ray's schemaless empties.

    groupby/map_groups (and some map_batches paths) emit zero-row
    blocks with an EMPTY schema (0 columns); pa.concat_tables raises
    ArrowInvalid on the schema mismatch. Drop the schemaless empties;
    if no block carries a schema, return the first (empty) block."""
    import ray

    tables = ray.get(ds.to_arrow_refs())
    typed = [t for t in tables if t.num_columns > 0]
    if not typed:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables(typed)
