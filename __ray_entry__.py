"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline (encode + decode round trip of the
sf0.001 documents table through the adaptive columnar compression
engine). ``queries()``/``oracle_sql()`` — per-operator surface checked
against DuckDB at sf0.01 (see arcade_ray/entry_queries.py).

Query inventory (153 entries, 138 DuckDB-oracled; the driver samples
the first 50, curated to cover every operator family). Families:

- engine core: scans/roundtrips (all 10 testdata tables incl.
  list<string> and the clustered range-partitioned layout), equality/
  range/compound/IN/prefix/suffix/contains/regex/isnull predicates
  with zone-map + partition-Bloom pruning, random access + pagination,
  decode-free GROUP BY aggregates (exact int sums, composite keys,
  null-aware), distinct (segment, KMV sketch, grouped approx), exact
  percentiles (int, float, grouped, PERCENTILE_CONT), top-k, sampling,
  schema evolution (read + filter), stats_meta, compression metrics
- joins: broadcast / co-partitioned exchange / composite-key / semi /
  anti / bloom semi / FULL OUTER; asof, range and interval time joins;
  q3_revenue_topk composed pipeline
- windows: tumbling/sliding/session aggregates, ranked gaps, frames
- dedup/text: exact (+keep-best, +incremental index), minhash/simhash
  pairs, near_dedup components, dup_ngram_stats + drop_dup_passages
  (substring/passage dedup), decontaminate (13-gram + trigram oracle),
  repetition/quality/lang/token counts, winnowing, chunking,
  normalization, PII redaction, heavy hitters, top-word fraction,
  distinctive terms, build_vocab + tokenize_vocab (deterministic ids)
- search/similarity: bm25_scores (bit-identical float oracle),
  ann_topk exact, LSH/IVF/persisted-index/int8 recall contracts,
  embedding_near_dup, kmeans, vector norms, explode
- corpus ops: mix/repeat/stratified-sample sources, pack_sequences
- SQL frontend (sql.py): sql_filter_topk / sql_group_having /
  sql_join_agg run the SAME SQL string compiled onto the engine's
  operators and verbatim in DuckDB — parity by construction; full
  DML lifecycle (INSERT generation append, UPDATE/DELETE partition
  rewrite, MERGE upsert, CREATE TABLE AS / DROP under a session
  workspace), windows/QUALIFY/set ops/subqueries/CTEs/UNNEST/VALUES
- token ops (tokenops.py, pre-tokenized list<int32> sequences):
  corpus unigram stats, token n-gram decontamination, repetition
  stats, vocabulary remap, token-level MinHash near-dup pairs, plus
  the persisted incremental MinHash index (textops)
- multimodal: image_features (actor-pool plumbing, sandbox kernels)

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
