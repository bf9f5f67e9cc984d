"""The encode pipeline — the engine's flagship Ray Data pipeline.

    read_parquet -> [plan: groupby(source).aggregate]          (tiny barrier)
                 -> map_batches(assign _part, drop done parts) (stateless)
                 -> groupby(_part).map_groups(encode+commit)   (the shuffle)
                 -> manifest rows -> manifest.parquet

Design per SURVEY.md §7.0/§7.2: partition = dictionary scope; the
groupby(_part) exchange is the ONE wide operation and doubles as the
skew rebalance (hot sources are hash-split by the plan). Each group is
encoded by one task with all dictionary state task-local
(SURVEY.md §4.1), written atomically (tmp + rename), and committed by
its manifest row — which is the checkpoint: on resume, committed
partitions are dropped *before* the shuffle, so finished work is
neither re-encoded nor re-shuffled.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ..format import encode_partition
from ..planner import Plan, assign_part_keys, build_plan

MANIFEST_DIR = "manifest"
PARTS_DIR = "parts"


def _safe(key: str) -> str:
    return urllib.parse.quote(key, safe="#-_.")


def part_path(out_dir: str, part_key: str) -> str:
    return os.path.join(out_dir, PARTS_DIR, _safe(part_key) + ".arcr")


def _manifest_row_path(out_dir: str, part_key: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, _safe(part_key) + ".json")


def committed_parts(out_dir: str) -> dict[str, dict]:
    """Scan per-partition manifest rows (the checkpoint/lineage log)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out = {}
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    row = json.load(f)
                out[row["part_key"]] = row
    return out


def commit_partition(out_dir: str, part_key: str, blob: bytes,
                     manifest_row: dict) -> dict:
    """Idempotent atomic commit: segment file first, manifest row last
    (manifest existence == committed, SURVEY.md §4.2 checkpoint row)."""
    ppath = part_path(out_dir, part_key)
    tmp = ppath + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, ppath)
    manifest_row = dict(manifest_row)
    manifest_row["path"] = ppath
    mpath = _manifest_row_path(out_dir, part_key)
    tmp = mpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest_row, f)
    os.replace(tmp, mpath)
    return manifest_row


def encode_group(group: pa.Table, out_dir: str, sort_by: str | None) -> pa.Table:
    """Encode one shuffled partition group; runs as a Ray task inside
    groupby(_part).map_groups."""
    if group.num_rows == 0:
        return _manifest_schema_table([])
    part_key = group["_part"][0].as_py()
    table = group.drop_columns(["_part"])
    if sort_by is not None and sort_by in table.column_names:
        # deterministic row order inside the partition -> stable output
        table = table.take(pc.sort_indices(table[sort_by]))
    blob, row = encode_partition(table, part_key)
    row = commit_partition(out_dir, part_key, blob, row)
    return _manifest_schema_table([row])


_MANIFEST_FIELDS = [
    ("part_key", pa.string()), ("path", pa.string()), ("rows", pa.int64()),
    ("raw_bytes", pa.int64()), ("enc_bytes", pa.int64()),
    ("header_bytes", pa.int64()), ("n_chunks", pa.int64()),
    ("encode_s", pa.float64()), ("crc32", pa.int64()),
    ("col_stats", pa.string()),
]


def _manifest_schema_table(rows: list[dict]) -> pa.Table:
    schema = pa.schema(_MANIFEST_FIELDS)
    cols = {name: [r.get(name) for r in rows] for name, _ in _MANIFEST_FIELDS}
    return pa.table(cols, schema=schema)


def encode_dataset(ds, out_dir: str, key_col: str = "source",
                   id_col: str = "doc_id", weight_col: str | None = "n_tok",
                   weight_cap: int | None = None, resume: bool = True,
                   sort_partitions_by: str | None = None) -> pa.Table:
    """Run the full encode pipeline; returns the consolidated manifest
    table (one row per partition, including previously committed ones).

    ``sort_partitions_by`` defaults to ``id_col`` for deterministic,
    resume-stable partition contents."""
    os.makedirs(os.path.join(out_dir, PARTS_DIR), exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    sort_by = id_col if sort_partitions_by is None else sort_partitions_by

    done = committed_parts(out_dir) if resume else {}
    plan = build_plan(ds, key_col, id_col, weight_col, weight_cap)
    done_keys = pa.array(sorted(done.keys()), type=pa.string())

    def assign(batch: pa.Table) -> pa.Table:
        out = assign_part_keys(batch, plan)
        if len(done_keys):
            keep = pc.invert(pc.is_in(out["_part"], value_set=done_keys))
            out = out.filter(keep)
        return out

    encoded = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: encode_group(g, out_dir, sort_by),
            batch_format="pyarrow",
        )
    )
    new_rows = encoded.to_arrow_refs()
    import ray

    tables = [t for t in ray.get(new_rows)]
    all_rows = list(done.values())
    for t in tables:
        all_rows.extend(t.to_pylist())
    manifest = _manifest_schema_table(sorted(all_rows, key=lambda r: r["part_key"]))
    _write_consolidated(out_dir, manifest)
    return manifest


def _write_consolidated(out_dir: str, manifest: pa.Table) -> None:
    import pyarrow.parquet as pq

    tmp = os.path.join(out_dir, f"manifest.parquet.tmp.{os.getpid()}")
    pq.write_table(manifest, tmp)
    os.replace(tmp, os.path.join(out_dir, "manifest.parquet"))


def load_manifest(out_dir: str) -> pa.Table:
    """Committed-partition manifest: prefers the consolidated parquet,
    falls back to scanning row files (mid-run / crashed state)."""
    import pyarrow.parquet as pq

    consolidated = os.path.join(out_dir, "manifest.parquet")
    rows = committed_parts(out_dir)
    if not rows and os.path.exists(consolidated):
        return pq.read_table(consolidated)
    return _manifest_schema_table(
        sorted(rows.values(), key=lambda r: r["part_key"])
    )
