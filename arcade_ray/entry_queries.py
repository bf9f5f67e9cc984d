"""Driver-contract query surface (SURVEY.md §5.2 item 5, FIXTURES.md §C).

Each query encodes the needed /root/testdata table into a /tmp cache
(resumable — committed partitions are skipped on re-entry), runs the
engine operator over the ENCODED data, and returns a result whose
column names match the DuckDB oracle SQL exactly.

No ray.init()/ray.shutdown() here — sessions are owned by the caller.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

from .constants import FORMAT_VERSION
from .pipeline import encode_dataset
from .pipeline.query import equi_filter, lookup, scan

CACHE_ROOT = os.environ.get("ARCADE_RAY_CACHE", "/tmp/arcade_ray_cache")
_CACHE_SALT = f"v{FORMAT_VERSION}.3"

# table -> (key_col, id_col, weight_col)
TABLE_KEYS = {
    "documents": ("source", "doc_id", "n_chars"),
    "lineitem": ("l_returnflag", "l_orderkey", None),
    "events": ("event_type", "event_id", None),
    "embeddings": ("label", "vec_id", None),
    "orders": ("o_orderpriority", "o_orderkey", None),
}

# documents.n_chars is ~characters not tokens; cap chosen so sf0.01
# yields a handful of partitions per source
WEIGHT_CAPS = {"documents": 2_000_000}


def encoded_dir(sf_dir: str, table: str) -> str:
    """Encode (once, cached) a testdata table; returns the output dir."""
    key_col, id_col, weight_col = TABLE_KEYS[table]
    tag = hashlib.md5(f"{sf_dir}|{table}|{_CACHE_SALT}".encode()).hexdigest()[:10]
    out = os.path.join(CACHE_ROOT, f"{table}-{tag}")
    if not os.path.exists(os.path.join(out, "manifest.parquet")):
        from .pipeline.encode import encode_parquet

        encode_parquet(
            os.path.join(sf_dir, f"{table}.parquet"), out,
            key_col=key_col, id_col=id_col, weight_col=weight_col,
            weight_cap=WEIGHT_CAPS.get(table),
        )
    return out


def _collect(ds) -> pa.Table:
    import ray

    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


# --- queries ----------------------------------------------------------------

def q_scan_project(sf_dir: str) -> pa.Table:
    out = encoded_dir(sf_dir, "documents")
    return _collect(scan(out, columns=["lang", "source"]))


def q_equi_filter(sf_dir: str) -> pa.Table:
    out = encoded_dir(sf_dir, "lineitem")
    return _collect(
        equi_filter(out, "l_returnflag", "R", project=["l_returnflag", "l_orderkey"])
    )


def q_equi_filter_int(sf_dir: str) -> pa.Table:
    out = encoded_dir(sf_dir, "lineitem")
    return _collect(
        equi_filter(out, "l_linenumber", 3, project=["l_orderkey", "l_linenumber"])
    )


LOOKUP_IDS = [i * 137 for i in range(100)]


def q_random_access(sf_dir: str) -> pa.Table:
    out = encoded_dir(sf_dir, "documents")
    return _collect(
        lookup(out, "doc_id", LOOKUP_IDS, columns=["doc_id", "source", "n_chars"])
    )


def q_plan_stats(sf_dir: str) -> pa.Table:
    """The skew-planning aggregate itself (north rule's
    groupby-aggregate), over raw parquet."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["source", "n_chars"])
    out = ds.groupby("source").aggregate(
        Count(alias_name="n_rows"), Sum("n_chars", alias_name="sum_chars")
    )
    return _collect(out)


def q_distinct_sources(sf_dir: str) -> pa.Table:
    out = encoded_dir(sf_dir, "documents")
    t = _collect(scan(out, columns=["source"]))
    return pa.table({"source": pc.unique(t["source"].combine_chunks())})


def _roundtrip(sf_dir: str, table: str) -> pa.Table:
    out = encoded_dir(sf_dir, table)
    return _collect(scan(out))


def q_roundtrip_documents(sf_dir: str) -> pa.Table:
    return _roundtrip(sf_dir, "documents")


def q_roundtrip_lineitem(sf_dir: str) -> pa.Table:
    return _roundtrip(sf_dir, "lineitem")


def q_roundtrip_events(sf_dir: str) -> pa.Table:
    return _roundtrip(sf_dir, "events")


def q_roundtrip_embeddings(sf_dir: str) -> pa.Table:
    return _roundtrip(sf_dir, "embeddings")


def q_filter_lang(sf_dir: str) -> pa.Table:
    out = encoded_dir(sf_dir, "documents")
    return _collect(
        equi_filter(out, "lang", "en", project=["doc_id", "lang", "source"])
    )


def q_compression_metrics(sf_dir: str) -> pa.Table:
    """Lineage/metrics surface: per-partition encoded sizes (rows-only
    check; not SQL-expressible)."""
    from .pipeline.encode import load_manifest

    out = encoded_dir(sf_dir, "documents")
    return load_manifest(out).select(
        ["part_key", "rows", "raw_bytes", "enc_bytes", "n_chunks"]
    )


QUERIES = {
    "scan_project": q_scan_project,
    "equi_filter": q_equi_filter,
    "equi_filter_int": q_equi_filter_int,
    "random_access": q_random_access,
    "plan_stats": q_plan_stats,
    "distinct_sources": q_distinct_sources,
    "roundtrip_documents": q_roundtrip_documents,
    "roundtrip_lineitem": q_roundtrip_lineitem,
    "roundtrip_events": q_roundtrip_events,
    "roundtrip_embeddings": q_roundtrip_embeddings,
    "filter_lang": q_filter_lang,
    "compression_metrics": q_compression_metrics,
}

_IDS_SQL = ", ".join(str(i) for i in LOOKUP_IDS)

ORACLE_SQL = {
    "scan_project": "SELECT lang, source FROM documents",
    "equi_filter": "SELECT l_returnflag, l_orderkey FROM lineitem WHERE l_returnflag = 'R'",
    "equi_filter_int": "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber = 3",
    "random_access": f"SELECT doc_id, source, n_chars FROM documents WHERE doc_id IN ({_IDS_SQL})",
    "plan_stats": "SELECT source, COUNT(*) AS n_rows, SUM(n_chars) AS sum_chars FROM documents GROUP BY source",
    "distinct_sources": "SELECT DISTINCT source FROM documents",
    "roundtrip_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "roundtrip_lineitem": "SELECT * FROM lineitem",
    "roundtrip_events": "SELECT * FROM events",
    "roundtrip_embeddings": "SELECT * FROM embeddings",
    "filter_lang": "SELECT doc_id, lang, source FROM documents WHERE lang = 'en'",
    # compression_metrics: intentionally no oracle (engine-internal lineage)
}
