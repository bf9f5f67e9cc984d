"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline (encode + decode round trip of the
sf0.001 documents table through the adaptive columnar compression
engine). ``queries()``/``oracle_sql()`` — per-operator surface checked
against DuckDB at sf0.01 (see arcade_ray/entry_queries.py).

Query inventory (57; SQL-oracled unless marked rows-only):

- engine core: scan_project, equi_filter, equi_filter_int, filter_lang,
  range_filter, compound_filter, compound_or_filter, negation_filter,
  expr_filter, random_access,
  distinct_sources (dict-segment DISTINCT), distinct_sketch_sources
  (KMV, no scan), plan_stats, group_count_encoded + group_agg_encoded
  (decode-free GROUP BY, exact int sums), group_agg_multi (composite keys), topk, topk_rows, group_topk, percentiles, sample,
  window_agg, sliding_window_agg, session_windows, json_extract_agg,
  vector_norms, asof_join_events (DuckDB ASOF JOIN oracle),
  range_join_sessions (events joined to session intervals),
  roundtrip_{documents,lineitem,events,embeddings,orders,customer,
  part}, roundtrip_list_strings (list<string> through the format),
  compression_metrics (rows-only lineage)
- joins: join_orders_customer (broadcast), join_lineitem_orders
  (co-partitioned exchange join, both sides large)
- dedup/text: exact_dedup, token_count, fingerprint, top_words;
  rows-only:
  lang_id, quality_scores, bpe_token_count, winnow_fingerprints,
  minhash_pairs, simhash_pairs, near_dedup, image_features
- similarity: ann_topk, embedding_near_dup, ann_lsh_recall,
  ann_ivf_recall; rows-only: ann_topk_lsh, ann_topk_ivf

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library (arcade_ray never
owns a session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: encode sf0.001 documents with the adaptive codec
    engine, then stream-decode it back; driver checks rows>=0 and a
    stable schema."""
    from arcade_ray.entry_queries import encoded_dir
    from arcade_ray.pipeline.query import scan

    out = encoded_dir("/root/testdata/sf0.001", "documents")
    return scan(out)


def queries() -> dict[str, Callable[[str], Any]]:
    from arcade_ray.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from arcade_ray.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
