"""Materialize small result Datasets to a single Arrow table.

Only for small results (aggregates, pair lists, top-k partials) — never
call this on a full-corpus Dataset; big outputs stream via
``write_parquet`` / ``iter_batches``.
"""

from __future__ import annotations

import pyarrow as pa


SMALL_SIG_ROWS = 2_000_000  # below this, skip the Ray aggregate entirely


def hot_bucket_rows(sig_ds, key_col: str) -> pa.Table:
    """Signature rows living in buckets with >= 2 members, without a
    per-group map_groups pass (one Python call per bucket is ruinous
    when almost every bucket is a singleton).

    Size-adaptive: small signature sets (< SMALL_SIG_ROWS fixed-width
    rows) are collected whole — the Ray aggregate's all-to-all fixed
    cost dwarfs the work (the broadcast-vs-shuffle tradeoff joins
    make); the caller's run-boundary scan ignores the singleton rows.
    Large sets go through a vectorized groupby(key).count() and a
    map-side hot-key semi-join, so only hot rows ever collect.
    ``sig_ds`` must already be materialized (it is read twice)."""
    n = sig_ds.count()
    if n <= SMALL_SIG_ROWS:
        return collect_arrow(sig_ds)
    counts = sig_ds.groupby(key_col).count()

    def hot_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.greater_equal(batch["count()"], 2))

    hot = collect_arrow(counts.map_batches(hot_only, batch_format="pyarrow"))
    if hot.num_rows == 0:
        return sig_ds.schema().base_schema.empty_table()
    hot_keys = hot[key_col].combine_chunks()

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pa.compute.is_in(batch[key_col], value_set=hot_keys))

    return collect_arrow(sig_ds.map_batches(pick, batch_format="pyarrow"))


def bucket_candidate_pairs(sig_ds, id_col: str, key_col: str = "bk",
                           max_bucket: int = 4096,
                           attr_cols: list[str] | None = None):
    """Candidate (id_a, id_b) pairs from LSH bucket co-occurrence,
    without a per-group map_groups pass (which costs a Python call per
    bucket — ruinous when almost every bucket has one member).

    1. ``groupby(key).count()`` — a vectorized hash aggregate — finds
       the HOT buckets (>= 2 rows); almost all buckets are cold and
       never touch Python.
    2. hot keys semi-join (map-side ``is_in``) back onto the signature
       rows; only hot rows are collected (small by the LSH design).
    3. run-boundary scan over the sorted hot rows emits in-bucket
       pairs; buckets above ``max_bucket`` are degenerate collisions
       and are dropped rather than exploding O(m^2).

    Returns (pairs table with id_a < id_b deduped, dict of id ->
    attr value for each ``attr_cols`` taken from the hot rows)."""
    import numpy as np

    sig_ds = sig_ds.materialize()
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    rows = hot_bucket_rows(sig_ds, key_col)
    if rows.num_rows == 0:
        return empty, {c: {} for c in (attr_cols or [])}
    bk = rows[key_col].to_numpy(zero_copy_only=False)
    ids = rows[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bk))
    bk_s, ids_s = bk[order], ids[order]
    bounds = np.flatnonzero(np.diff(bk_s)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(bk_s)]])
    a_out, b_out = [], []
    for s, e in zip(starts.tolist(), ends.tolist()):
        u = np.unique(ids_s[s:e])
        m = len(u)
        if m < 2 or m > max_bucket:
            continue
        iu, ju = np.triu_indices(m, k=1)
        a_out.append(u[iu])
        b_out.append(u[ju])
    if not a_out:
        pairs = empty
    else:
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        pairs = pa.table({"id_a": pa.array(uniq[:, 0], type=pa.int64()),
                          "id_b": pa.array(uniq[:, 1], type=pa.int64())})
    attrs = {}
    for c in (attr_cols or []):
        vals = rows[c].to_numpy(zero_copy_only=False)
        attrs[c] = dict(zip(ids.tolist(), vals.tolist()))
    return pairs, attrs


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
    # empty pandas group outputs arrive null-typed (object dtype);
    # permissive promotion folds them into the real column types
    return pa.concat_tables(typed, promote_options="permissive")
