"""Partition compaction — merge undersized partitions per source.

Long 10^12-sequence runs (and streaming-actor encodes) accumulate
small tail partitions; compaction re-encodes groups of them into
full-size partitions, improving dictionary sharing and read fan-out.

Crash safety via lineage: the replacement partition's manifest row
carries a ``replaces`` list of the part_keys it supersedes; the commit
order is (1) new segment+row committed, (2) old manifest rows deleted,
(3) old segment files deleted. ``load_manifest`` filters out any row
whose key appears in a surviving ``replaces`` list, so a crash at any
point leaves a consistent view (at worst orphan segment files, cleaned
on the next compaction)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..constants import DEFAULT_PART_TOKEN_CAP
from ..format import decode_partition, encode_partition
from .encode import (
    _manifest_schema_table,
    _pin_arrow_threads,
    _write_consolidated,
    commit_partition,
    committed_parts,
    load_manifest,
)


def _source_of(part_key: str) -> str:
    for sep in ("#", "@"):
        if sep in part_key:
            return part_key.split(sep)[0]
    return part_key


def _compact_group(rows: list[dict], out_dir: str, new_key: str,
                   sort_by: str | None) -> dict:
    _pin_arrow_threads()
    tables = [decode_partition(r["path"]) for r in rows]
    table = pa.concat_tables(tables).combine_chunks()
    if sort_by and sort_by in table.column_names:
        table = table.take(pc.sort_indices(table[sort_by]))
    blob, row = encode_partition(table, new_key)
    row["replaces"] = [r["part_key"] for r in rows]
    return commit_partition(out_dir, new_key, blob, row)


def compact(out_dir: str, weight_cap: int | None = None,
            small_fraction: float = 0.5, sort_by: str | None = "doc_id",
            run_remote: bool = True) -> pa.Table:
    """Compact partitions whose raw bytes < small_fraction x the
    largest sibling (same source), binning greedily up to the cap.
    Returns the new consolidated manifest."""
    rows = load_manifest(out_dir).to_pylist()
    by_source: dict[str, list[dict]] = {}
    for r in rows:
        by_source.setdefault(_source_of(r["part_key"]), []).append(r)

    jobs = []
    seq = 0
    for source, parts in sorted(by_source.items()):
        if len(parts) < 2:
            continue
        biggest = max(p["raw_bytes"] for p in parts)
        cap = int(weight_cap or max(biggest, 1))
        # smallness is relative to the explicit target size when given,
        # else to the largest sibling (tail-merge mode)
        threshold = small_fraction * (weight_cap if weight_cap else biggest)
        small = sorted((p for p in parts if p["raw_bytes"] < threshold),
                       key=lambda p: p["raw_bytes"])
        group: list[dict] = []
        size = 0
        for p in small:
            if group and size + p["raw_bytes"] > cap:
                if len(group) >= 2:
                    jobs.append((source, list(group)))
                group, size = [], 0
            group.append(p)
            size += p["raw_bytes"]
        if len(group) >= 2:
            jobs.append((source, group))

    if not jobs:
        return load_manifest(out_dir)

    import hashlib

    import ray

    task = ray.remote(_compact_group)
    refs = []
    for i, (source, group) in enumerate(jobs):
        # key derived from the replaced set: unique across compaction
        # generations (an index would collide with earlier '#cNNNN'
        # parts) and stable across retries of the same group
        digest = hashlib.md5(
            ",".join(sorted(p["part_key"] for p in group)).encode()
        ).hexdigest()[:8]
        new_key = f"{source}#c{digest}"
        if run_remote:
            refs.append(task.remote(group, out_dir, new_key, sort_by))
        else:
            refs.append(_compact_group(group, out_dir, new_key, sort_by))
    new_rows = ray.get(refs) if run_remote else refs

    # retire replaced partitions: manifest rows first, then files
    replaced = {k for r in new_rows for k in r.get("replaces", [])}
    from .encode import MANIFEST_DIR, _manifest_row_path

    for r in rows:
        if r["part_key"] in replaced:
            try:
                os.remove(_manifest_row_path(out_dir, r["part_key"]))
            except FileNotFoundError:
                pass
    for r in rows:
        if r["part_key"] in replaced:
            try:
                os.remove(r["path"])
            except FileNotFoundError:
                pass

    manifest = load_manifest(out_dir)
    _write_consolidated(out_dir, manifest)
    return manifest
