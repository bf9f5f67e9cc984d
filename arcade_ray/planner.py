"""Skew-aware partition planning.

The north rule's "groupby-aggregate shuffle rebalances skewed
partitions": a cheap planning aggregation over the weight column
(``sum(n_tok)`` per source) decides, per source, how many hash buckets
to split it into, so no encode task exceeds the token cap — hot
(zipf-dominant) sources fan out, cold sources stay single-bucket.
(SURVEY.md §4.2 "Skew" row; the reference has no notion of this —
single thread, README.md:136-138.)

The plan is a small dict broadcast into the part-key assignment stage;
partition keys are deterministic (stable hash, hashing.py) so a resumed
run regenerates the identical partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .constants import DEFAULT_PART_ROW_CAP, DEFAULT_PART_TOKEN_CAP
from .hashing import hash_column


@dataclass(frozen=True)
class Plan:
    buckets_per_source: dict[str, int]
    key_col: str            # e.g. "source"
    id_col: str             # bucket-hash column, e.g. "doc_id"
    weight_cap: int

    def part_keys(self) -> list[str]:
        return [
            f"{src}#{b:04d}"
            for src, nb in sorted(self.buckets_per_source.items())
            for b in range(nb)
        ]


def build_plan(ds, key_col: str, id_col: str, weight_col: str | None = None,
               weight_cap: int | None = None) -> Plan:
    """Planning aggregate: per-source row count + weight sum (the one
    small barrier), collected to the driver.

    ``ds`` is a ray.data.Dataset. The aggregate output is tiny (one row
    per source) — safe to materialize."""
    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name="n_rows")]
    if weight_col is not None:
        aggs.append(Sum(weight_col, alias_name="weight"))
        cap = weight_cap or DEFAULT_PART_TOKEN_CAP
    else:
        cap = weight_cap or DEFAULT_PART_ROW_CAP
    stats = ds.groupby(key_col).aggregate(*aggs).to_pandas()
    buckets = {}
    for _, row in stats.iterrows():
        weight = int(row["weight"]) if weight_col is not None else int(row["n_rows"])
        buckets[str(row[key_col])] = max(1, -(-weight // cap))
    return Plan(buckets, key_col, id_col, cap)


def assign_part_keys(batch: pa.Table, plan: Plan) -> pa.Table:
    """Stateless map_batches stage: add the deterministic ``_part``
    column ``{source}#{hash(id) % n_buckets:04d}``."""
    src = batch[plan.key_col].combine_chunks()
    if not pa.types.is_string(src.type):
        src = src.cast(pa.string())
    denc = src.dictionary_encode()
    uniq = denc.dictionary.to_pylist()  # small: one entry per source in batch
    nb_map = np.array([plan.buckets_per_source.get(u, 1) for u in uniq],
                      dtype=np.uint64)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    h = hash_column(batch[plan.id_col])
    bucket = (h % nb_map[codes]).astype(np.int64)
    padded = pc.utf8_lpad(pc.cast(pa.array(bucket), pa.string()), 4, "0")
    part = pc.binary_join_element_wise(src, padded, "#")
    return batch.append_column("_part", part)
