"""Materialize small result Datasets to a single Arrow table.

Only for small results (aggregates, pair lists, top-k partials) — never
call this on a full-corpus Dataset; big outputs stream via
``write_parquet`` / ``iter_batches``.
"""

from __future__ import annotations

import pyarrow as pa


def fetch_by_ids(ds, id_col: str, ids, columns: list[str] | None = None) -> pa.Table:
    """Map-side semi-join: stream the dataset, keep rows whose id is in
    ``ids`` (a small candidate set), collect the survivors. The id set
    ships once per task in the closure; the big payload columns only
    move for matching rows — the second-keyed-fetch pattern used after
    a payload-free candidate shuffle."""
    value_set = pa.array(sorted(set(ids)))

    def keep(batch: pa.Table) -> pa.Table:
        m = pa.compute.is_in(batch[id_col],
                             value_set=value_set.cast(batch[id_col].type))
        out = batch.filter(m)
        return out.select(columns) if columns else out

    return collect_arrow(ds.map_batches(keep, batch_format="pyarrow"))


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
