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
                # rebase: the partition file always lives at
                # part_path(out_dir, part_key), so encoded dirs stay
                # relocatable (copy/move/rsync) — a stored absolute
                # path from the original location must never win
                row["path"] = part_path(out_dir, row["part_key"])
                out[row["part_key"]] = row
    return _drop_replaced(out)


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
    # generation is an EXPLICIT lineage field ("" = base): part_key
    # prefixes are user data (a source value may itself contain '@'),
    # so readers must never re-parse the generation out of the key.
    manifest_row.setdefault("generation", "")
    mpath = _manifest_row_path(out_dir, part_key)
    tmp = mpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest_row, f)
    os.replace(tmp, mpath)
    return manifest_row


def encode_group(group: pa.Table, out_dir: str, sort_by: str | None,
                 pid_keys: list[str] | None = None,
                 generation: str = "") -> pa.Table:
    """Encode one shuffled partition group; runs as a Ray task inside
    groupby(_pid).map_groups."""
    if group.num_rows == 0:
        return _manifest_schema_table([])
    if "_pid" in group.column_names:
        part_key = pid_keys[group["_pid"][0].as_py()]
        table = group.drop_columns(["_pid"])
    else:  # direct string key (tests / ad-hoc callers)
        part_key = group["_part"][0].as_py()
        table = group.drop_columns(["_part"])
    if sort_by is not None and sort_by in table.column_names:
        # deterministic row order inside the partition -> stable output
        table = table.take(pc.sort_indices(table[sort_by]))
    blob, row = encode_partition(table, part_key)
    row["generation"] = generation
    row = commit_partition(out_dir, part_key, blob, row)
    return _manifest_schema_table([row])


_MANIFEST_FIELDS = [
    ("part_key", pa.string()), ("path", pa.string()), ("rows", pa.int64()),
    ("raw_bytes", pa.int64()), ("enc_bytes", pa.int64()),
    ("header_bytes", pa.int64()), ("n_chunks", pa.int64()),
    ("encode_s", pa.float64()), ("crc32", pa.int64()),
    ("col_stats", pa.string()), ("replaces", pa.list_(pa.string())),
    ("generation", pa.string()),
]


def generation_of_row(row: dict) -> str:
    """Generation of a manifest row ("" = base). Prefers the explicit
    field; legacy rows (written before the field existed) fall back to
    parsing the part_key — ambiguous if the source value contains '@',
    which is exactly why the field is now explicit."""
    gen = row.get("generation")
    if gen is not None:
        return gen
    prefix = row["part_key"].split("#", 1)[0]
    return prefix.rsplit("@", 1)[1] if "@" in prefix else ""


def _manifest_schema_table(rows: list[dict]) -> pa.Table:
    schema = pa.schema(_MANIFEST_FIELDS)
    cols = {name: [r.get(name) for r in rows] for name, _ in _MANIFEST_FIELDS}
    return pa.table(cols, schema=schema)


def _drop_replaced(rows: dict[str, dict]) -> dict[str, dict]:
    """Compaction crash-safety: a partition superseded by a surviving
    row's ``replaces`` list is not part of the dataset even if its own
    manifest row still exists (see pipeline/compact.py)."""
    replaced: set[str] = set()
    for r in rows.values():
        replaced.update(r.get("replaces") or [])
    if not replaced:
        return rows
    return {k: r for k, r in rows.items() if k not in replaced}


def _range_plan_path(out_dir: str, generation: str | None) -> str:
    gen = f"@{generation}" if generation else ""
    return os.path.join(out_dir, f"range_plan{gen}.json")


def _save_range_plan(out_dir: str, generation: str | None, plan) -> None:
    """Persist the quantile boundaries next to the data (atomic
    tmp+rename): a resumed run MUST reuse the original cut points —
    re-sampling under a different input blocking would silently remap
    rows across already-committed partitions."""
    import json

    path = _range_plan_path(out_dir, generation)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"col": plan.col, "boundaries": list(plan.boundaries),
                   "weights": list(plan.weights)}, f)
    os.replace(tmp, path)


def _load_range_plan(out_dir: str, generation: str | None,
                     range_col: str | None = None, resume: bool = True):
    """Reload the persisted plan — only when resuming, and only if it
    was built for the SAME column (a stale plan for another column
    would silently bucket rows by the wrong values while sorting by
    the requested one)."""
    import json

    from ..planner import RangePlan

    if not resume:
        return None
    path = _range_plan_path(out_dir, generation)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    if range_col is not None and d["col"] != range_col:
        raise ValueError(
            f"{path} was built for range_partition_col={d['col']!r} but "
            f"{range_col!r} was requested; use a fresh out_dir (or a new "
            f"generation) to re-cluster on a different column")
    return RangePlan(tuple(d["boundaries"]), d["col"], tuple(d["weights"]))


def _cap_for(weight_col: str | None, weight_cap: int | None) -> int:
    from ..constants import DEFAULT_PART_ROW_CAP, DEFAULT_PART_TOKEN_CAP

    return weight_cap or (DEFAULT_PART_TOKEN_CAP if weight_col is not None
                          else DEFAULT_PART_ROW_CAP)


def _range_plan_dataset(ds, out_dir: str, range_col: str,
                        weight_col: str | None, weight_cap: int | None,
                        generation: str | None, resume: bool = True):
    """Load the persisted range plan, or build one from a streaming
    sample wave over the Dataset (strided per-batch samples + weight
    partials; one tiny row per block reaches the driver)."""
    import numpy as np

    plan = _load_range_plan(out_dir, generation, range_col, resume)
    if plan is None and generation is not None:
        # generation APPEND into an existing range-clustered dir:
        # reuse the BASE plan's cut points so new rows land in range
        # partitions matching the base layout (readers prune all
        # generations with one set of boundaries); copied under the
        # generation's plan path for resume stability
        plan = _load_range_plan(out_dir, None, range_col, resume)
        if plan is not None:
            _save_range_plan(out_dir, generation, plan)
    if plan is not None:
        return plan
    from ..planner import build_range_plan, range_sample

    cols = [range_col] + ([weight_col] if weight_col
                          and weight_col != range_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        s = range_sample(batch[range_col])
        w = int(pc.sum(batch[weight_col]).as_py() or 0) if weight_col \
            else batch.num_rows
        return pa.table({"s": pa.array([s.tolist()]),
                         "w": pa.array([w], type=pa.int64())})

    parts = ds.select_columns(cols) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    samples = np.concatenate(
        [np.asarray(r["s"]) for r in parts if len(r["s"])]) \
        if any(len(r["s"]) for r in parts) else np.empty(0)
    total = sum(int(r["w"]) for r in parts)
    plan = build_range_plan(samples, total,
                            _cap_for(weight_col, weight_cap), range_col)
    _save_range_plan(out_dir, generation, plan)
    return plan


def _apply_generation(pid_keys: list[str],
                      generation: str | None) -> list[str]:
    """Namespace partition keys as {src}@{generation}#{bucket} so an
    incremental APPEND never collides with (or gets skipped by) an
    earlier generation's resume state on the same key space."""
    if generation is None:
        return pid_keys
    if any(c in generation for c in "#@/"):
        raise ValueError(
            f"generation id must not contain #, @ or /: {generation!r}")
    return [f"{k.split('#', 1)[0]}@{generation}#{k.split('#', 1)[1]}"
            for k in pid_keys]


def encode_dataset(ds, out_dir: str, key_col: str = "source",
                   id_col: str = "doc_id", weight_col: str | None = "n_tok",
                   weight_cap: int | None = None, resume: bool = True,
                   sort_partitions_by: str | None = None,
                   exchange: str = "direct",
                   generation: str | None = None,
                   range_partition_col: str | None = None,
                   zorder_cols: list[str] | None = None) -> pa.Table:
    """Run the full encode pipeline; returns the consolidated manifest
    table (one row per partition, including previously committed ones).

    ``zorder_cols`` (2-3 numeric/timestamp columns): Z-ORDERED
    clustered layout — a Morton key of the columns' quantile ranks is
    appended as an ordinary ``zorder`` int64 column (zorder.py), and
    the range-partition machinery clusters on it, so partitions cover
    small hyper-rectangles of the column space and the per-partition
    zone maps on EVERY listed column prune multi-predicate scans. The
    per-column boundaries persist in ``zorder_plan.json`` (resume
    reuses them).

    ``generation`` enables INCREMENTAL APPEND into an existing encoded
    dataset: partition keys become ``{src}@{generation}#{bucket}`` so a
    new batch of data never collides with — or gets silently skipped by
    — an earlier run's resume logic on the same key space. Each
    generation is itself resumable (re-run with the same id); readers
    see old + new through the one manifest; compaction groups within a
    generation.

    ``sort_partitions_by`` defaults to ``id_col`` for deterministic,
    resume-stable partition contents.

    ``exchange`` selects the rebalance-shuffle implementation:

    - ``"direct"`` (default): explicit partitioned hash exchange with
      raw Ray tasks — one split task per input block fans rows out to
      one object per (block, partition); one encode task per partition
      fetches exactly its fragments. No sort comparisons, one
      materialization round, encode parallelism = #partitions. This is
      the documented drop-to-Ray-core case: Dataset's groupby shuffle
      is a SORT exchange whose post-shuffle blocks coalesce many
      groups per task, serializing the encode stage.
    - ``"disk"``: the direct exchange with disk-staged fragments and
      bounded in-flight splits — peak object-store usage is
      O(in-flight split tasks) instead of O(dataset); input blocks are
      consumed as the streaming executor produces them. The scale path
      for inputs far beyond store capacity.
    - ``"groupby"``: idiomatic ``groupby(_pid).map_groups`` — same
      semantics, kept for parity/tests.
    """
    os.makedirs(os.path.join(out_dir, PARTS_DIR), exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    if zorder_cols is not None:
        if range_partition_col is not None:
            raise ValueError(
                "zorder_cols and range_partition_col are exclusive "
                "(z-order IS a range layout on the Morton key)")
        from ..zorder import (ZORDER_COL, add_zorder_column,
                              build_zorder_plan, load_zorder_plan,
                              save_zorder_plan)

        zplan = load_zorder_plan(out_dir, zorder_cols) if resume else None
        if zplan is None:
            sch = ds.schema()
            missing = [c for c in zorder_cols
                       if c not in set(sch.names)]
            if missing:
                raise ValueError(f"zorder_cols {missing} not in input")
            if isinstance(sch.base_schema, pa.Schema):
                bad = [c for c in zorder_cols if not (
                    pa.types.is_integer(sch.base_schema.field(c).type)
                    or pa.types.is_floating(sch.base_schema.field(c).type)
                    or pa.types.is_timestamp(sch.base_schema.field(c).type)
                    or pa.types.is_date(sch.base_schema.field(c).type))]
                if bad:
                    raise ValueError(
                        f"zorder_cols must be numeric/timestamp "
                        f"columns; {bad} are not")
            zplan = build_zorder_plan(ds, list(zorder_cols))
            save_zorder_plan(out_dir, zplan)
        ds = add_zorder_column(ds, zplan)
        range_partition_col = ZORDER_COL
    if range_partition_col is not None and sort_partitions_by is None:
        # clustered layout all the way down: rows inside each range
        # partition sort by the same column, so chunk zone maps nest
        # inside the partition's disjoint range
        sort_partitions_by = range_partition_col
    sort_by = id_col if sort_partitions_by is None else sort_partitions_by

    if generation:
        # appending into a relocated consolidated-only dir would
        # shadow the base rows (load_manifest prefers row files);
        # materialize them first
        ensure_row_files(out_dir)
    done = committed_parts(out_dir) if resume else {}
    in_sch = ds.schema()
    _validate_columns(set(in_sch.names),
                      range_partition_col or key_col, id_col, weight_col)
    if isinstance(in_sch.base_schema, pa.Schema):
        _write_schema_sidecar(out_dir, in_sch.base_schema.remove_metadata(),
                              replace=not generation and not done)
    _write_encode_meta(out_dir, key_col, id_col, weight_col,
                       range_partition_col, zorder_cols)
    # pandas-backed datasets have a PandasBlockSchema (no pa.Schema to
    # record); empty-table scans of such dirs keep the legacy raise
    # planning pass reads only key+weight columns (projection pushdown
    # into the parquet read — never drag the token payload through the
    # planning aggregate)
    if range_partition_col is not None:
        plan = _range_plan_dataset(ds, out_dir, range_partition_col,
                                   weight_col, weight_cap, generation,
                                   resume=resume)
    else:
        plan_cols = [key_col] + ([weight_col] if weight_col and weight_col != key_col else [])
        plan = build_plan(ds.select_columns(plan_cols), key_col, id_col,
                          weight_col, weight_cap)
    pid_keys = _apply_generation(plan.part_keys(), generation)
    done_pids = pa.array(
        [i for i, k in enumerate(pid_keys) if k in done], type=pa.int64()
    )

    from ..planner import RangePlan, assign_range_pids

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # schema-less empty blocks (Ray's union/map plumbing emits
            # them) carry no rows to route — and may not even have the
            # key column to route by
            return pa.table({"_pid": pa.array([], pa.int64())})
        out = assign_range_pids(batch, plan) if isinstance(plan, RangePlan) \
            else assign_part_keys(batch, plan)
        if len(done_pids):
            keep = pc.invert(pc.is_in(out["_pid"], value_set=done_pids))
            out = out.filter(keep)
        return out

    import ray

    gen = generation or ""
    if exchange in ("direct", "disk"):
        tables = _direct_exchange_encode(
            ds, assign, plan, pid_keys, set(done), out_dir, sort_by,
            mode="disk" if exchange == "disk" else "objects",
            generation=gen,
        )
    else:
        encoded = (
            ds.map_batches(assign, batch_format="pyarrow")
            .groupby("_pid")
            .map_groups(
                lambda g: encode_group(g, out_dir, sort_by, pid_keys, gen),
                batch_format="pyarrow",
            )
        )
        tables = list(ray.get(encoded.to_arrow_refs()))
    all_rows = list(done.values())
    for t in tables:
        all_rows.extend(t.to_pylist())
    manifest = _manifest_schema_table(sorted(all_rows, key=lambda r: r["part_key"]))
    _write_consolidated(out_dir, manifest)
    return manifest


def _pin_arrow_threads() -> None:
    """One Arrow compute thread per Ray task: each worker otherwise
    spins up a hardware-concurrency-sized pool, and N workers x N
    threads thrashes the node (measured 2-3x slowdown at 32 workers)."""
    try:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass


def _frag_codec() -> str:
    """Exchange fragment wire format. ``raw`` (default) ships plain
    Arrow objects — fastest through single-node plasma (measured: zstd
    and lz4 IPC packing both SLOWED the 2M-row exchange ~40% at 32
    cpus; shared-memory reads are cheaper than the codec pass). On a
    multi-node cluster where fragments cross the NETWORK, set
    ARCADE_FRAG_CODEC=zstd (or lz4): token payloads shrink ~3.5x and
    the codec cost rides per-node cores instead of the wire."""
    return os.environ.get("ARCADE_FRAG_CODEC", "raw")


def _frag_pack(frag: pa.Table, codec: str):
    if codec == "raw":
        return frag
    import pyarrow.ipc as ipc

    sink = pa.BufferOutputStream()
    opts = ipc.IpcWriteOptions(compression=codec)
    with ipc.new_stream(sink, frag.schema, options=opts) as w:
        w.write_table(frag)
    return sink.getvalue()


def _frag_unpack(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    import pyarrow.ipc as ipc

    return ipc.open_stream(obj).read_all()


def _split_block(table: pa.Table, bucket_of_pid):
    """Split one assigned block into per-BUCKET fragments; a bucket
    bundles several partitions destined for one encode task. Returns a
    list of ObjectRefs (None for empty buckets): fragments are
    ``ray.put`` from inside the task — measured ~16x faster than the
    task-return path for large payloads — and only the tiny ref list
    travels back. Fragments ship zstd-IPC-packed (see _frag_codec)."""
    import numpy as np
    import ray

    _pin_arrow_threads()
    codec = _frag_codec()
    n_buckets = int(max(bucket_of_pid)) + 1 if len(bucket_of_pid) else 1
    pids = table["_pid"].to_numpy(zero_copy_only=False)
    buckets = np.asarray(bucket_of_pid)[pids]
    out = [None] * n_buckets
    order = np.argsort(buckets, kind="stable")
    sorted_buckets = buckets[order]
    bounds = np.searchsorted(sorted_buckets, np.arange(n_buckets + 1))
    for b in range(n_buckets):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if hi > lo:
            # per-fragment take -> each fragment owns compact buffers
            # (a slice view would serialize its whole parent block)
            frag = table.take(pa.array(order[lo:hi], type=pa.int64()))
            out[b] = ray.put(_frag_pack(frag, codec))
    return out


def _encode_bucket_tables(tables: list[pa.Table], pid_keys: list[str],
                          out_dir: str, sort_by: str | None,
                          generation: str = "") -> list[dict]:
    """Encode+commit every partition present in the fragment tables of
    one bucket (shared by the object-store and disk exchanges)."""
    import numpy as np

    if not tables:
        return []
    table = pa.concat_tables(tables).combine_chunks()
    pids = table["_pid"].to_numpy(zero_copy_only=False)
    rows = []
    order = np.argsort(pids, kind="stable")
    sorted_pids = pids[order]
    uniq = np.unique(sorted_pids)
    bounds = np.searchsorted(sorted_pids, uniq)
    bounds = np.append(bounds, len(sorted_pids))
    for i, pid in enumerate(uniq):
        idx = order[bounds[i]: bounds[i + 1]]
        part = table.take(pa.array(idx, type=pa.int64())).drop_columns(["_pid"])
        if sort_by is not None and sort_by in part.column_names:
            part = part.take(pc.sort_indices(part[sort_by]))
        blob, row = encode_partition(part, pid_keys[int(pid)])
        row["generation"] = generation
        rows.append(commit_partition(out_dir, pid_keys[int(pid)], blob, row))
    return rows


def _encode_bucket(pid_keys: list[str], out_dir: str, sort_by: str | None,
                   frag_refs, generation: str = "") -> list[dict]:
    """Encode every partition present in this bucket\'s fragments.
    Fetches its fragments itself (refs passed as a plain list) so the
    raylet resolves one dependency per task, not #splits."""
    import ray

    _pin_arrow_threads()
    frags = ray.get(list(frag_refs))
    tables = [_frag_unpack(f) for f in frags if f is not None]
    return _encode_bucket_tables(tables, pid_keys, out_dir, sort_by,
                                 generation)


def _read_split_inputs(refs_or_paths, columns=None) -> pa.Table:
    """Resolve one split task's inputs — parquet paths, (path, lo, hi)
    row-group ranges, object refs, or in-line tables — to one Arrow
    table (shared by the object-store and disk split bodies)."""
    import ray

    tables = []
    for item in refs_or_paths:
        if isinstance(item, str):
            import pyarrow.parquet as pq

            tables.append(pq.read_table(item, columns=columns))
        elif isinstance(item, tuple):  # (path, row_group_lo, row_group_hi)
            import pyarrow.parquet as pq

            path, lo, hi = item
            pf = pq.ParquetFile(path)
            tables.append(pf.read_row_groups(list(range(lo, hi)), columns=columns))
        else:
            tables.append(ray.get(item) if isinstance(item, ray.ObjectRef) else item)
    # schema-less zero-row blocks (Ray union/map plumbing) would
    # poison the concat; rows are what gets routed, so drop them.
    # An ALL-empty group keeps one block — preferring a TYPED one, so
    # a schema-less empty never meets a typed empty in the concat
    nonempty = [t for t in tables if t.num_rows]
    if nonempty:
        tables = nonempty
    elif len(tables) > 1:
        typed = [t for t in tables if t.num_columns]
        tables = typed[:1] if typed else tables[:1]
    return pa.concat_tables(tables) if len(tables) > 1 else tables[0]


def _split_many(refs_or_paths, bucket_of_pid, assign, columns=None):
    """Split task body: fetch/read several input blocks or parquet
    files, assign partition ids, emit one compact fragment per bucket.
    Coarse inputs + bucketed outputs keep the object count at
    #split_tasks x #buckets (~O(cores^2)) — the local object store is
    the serial resource a fan-out must respect."""
    _pin_arrow_threads()
    table = assign(_read_split_inputs(refs_or_paths, columns))
    return _split_block(table, bucket_of_pid)


SHUFFLE_DIR = "_shuffle"


def _bucket_dir(shuffle_dir: str, b: int) -> str:
    return os.path.join(shuffle_dir, f"b{b:05d}")


def _split_to_disk(refs_or_paths, bucket_of_pid, assign, columns,
                   shuffle_dir: str, split_id: int) -> int:
    """Disk-staged split: like _split_many, but fragments land as
    Arrow IPC files under shuffle_dir/b{bucket}/s{split}.arrow instead
    of the object store — the Spark-shuffle-file pattern. Peak
    object-store usage stays O(in-flight splits); the exchange itself
    lives on disk (shared storage on a multi-node cluster). Returns
    rows written (tiny)."""
    import numpy as np

    _pin_arrow_threads()
    table = assign(_read_split_inputs(refs_or_paths, columns))
    n_buckets = int(max(bucket_of_pid)) + 1 if len(bucket_of_pid) else 1
    pids = table["_pid"].to_numpy(zero_copy_only=False)
    buckets = np.asarray(bucket_of_pid)[pids]
    order = np.argsort(buckets, kind="stable")
    sorted_buckets = buckets[order]
    bounds = np.searchsorted(sorted_buckets, np.arange(n_buckets + 1))
    written = 0
    for b in range(n_buckets):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if hi <= lo:
            continue
        frag = table.take(pa.array(order[lo:hi], type=pa.int64()))
        d = _bucket_dir(shuffle_dir, b)
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, f"s{split_id:05d}.arrow")
        tmp = final + f".tmp.{os.getpid()}"
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_file(sink, frag.schema) as w:
                w.write_table(frag)
        os.replace(tmp, final)
        written += frag.num_rows
    return written


def _encode_bucket_from_disk(pid_keys: list[str], out_dir: str,
                             sort_by: str | None, bucket_dir: str,
                             generation: str = "") -> list[dict]:
    _pin_arrow_threads()
    tables = []
    if os.path.isdir(bucket_dir):
        for fn in sorted(os.listdir(bucket_dir)):
            if fn.endswith(".arrow"):
                with pa.memory_map(os.path.join(bucket_dir, fn)) as src:
                    tables.append(pa.ipc.open_file(src).read_all())
    return _encode_bucket_tables(tables, pid_keys, out_dir, sort_by,
                                 generation)


def _group(items: list, n_groups: int) -> list[list]:
    n_groups = max(1, min(n_groups, len(items)))
    per = -(-len(items) // n_groups)
    return [items[i: i + per] for i in range(0, len(items), per)]


def _lpt_buckets(weights: list[int], n_buckets: int):
    """Longest-processing-time assignment of partitions to encode
    buckets -> (bucket_of_pid int64 array, n_buckets)."""
    import heapq

    import numpy as np

    n = len(weights)
    n_buckets = max(1, min(n_buckets, n))
    heap = [(0, b) for b in range(n_buckets)]
    heapq.heapify(heap)
    bucket_of = np.zeros(n, dtype=np.int64)
    for pid in sorted(range(n), key=lambda p: -weights[p]):
        load, b = heapq.heappop(heap)
        bucket_of[pid] = b
        heapq.heappush(heap, (load + weights[pid], b))
    return bucket_of, n_buckets


def _run_direct_exchange(split_inputs, pid_keys: list[str],
                         pid_weights: list[int], done: set, out_dir: str,
                         sort_by: str | None, assign,
                         columns=None, mode: str = "objects",
                         generation: str = "") -> list[pa.Table]:
    """Explicit partitioned hash exchange (see encode_dataset docstring).
    On a multi-node cluster the same code runs unchanged: fragments are
    plain object-store objects and Ray fetches them to wherever the
    encode task is scheduled.

    ``mode``:

    - ``"objects"``: fragments live in the object store between the
      split and encode phases — fastest, but the whole (assigned)
      input is live at the barrier; Ray spills past store capacity.
    - ``"disk"``: split tasks write fragments as Arrow IPC files under
      ``out_dir/_shuffle/`` (Spark-shuffle-file pattern) and in-flight
      split tasks are bounded, so peak object-store usage is
      O(in-flight splits) regardless of input size. Auto-selected by
      encode_parquet for inputs above ARCADE_DISK_EXCHANGE_BYTES.

    ``split_inputs`` may be a generator (disk mode consumes it
    incrementally — streaming inputs never all materialize)."""
    import shutil as _shutil

    import ray

    if all(k in done for k in pid_keys):
        return []
    # encode-bucket count: >= 32 for balance, scaling with the cluster.
    # Over-granular fan-out (buckets >> cores) measurably HURTS: the
    # per-object store/scheduler overhead outweighs the parallelism.
    bucket_of_pid, n_buckets = _lpt_buckets(
        pid_weights,
        int(os.environ.get("ARCADE_ENCODE_BUCKETS", 0))
        or max(32, _avail_cpus())
    )
    if mode == "disk":
        shuffle_dir = os.path.join(out_dir, SHUFFLE_DIR)
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
        os.makedirs(shuffle_dir, exist_ok=True)
        split = ray.remote(_split_to_disk)
        max_inflight = max(4, _avail_cpus())
        pending: list = []
        for si, group in enumerate(split_inputs):
            pending.append(split.remote(group, bucket_of_pid, assign,
                                        columns, shuffle_dir, si))
            if len(pending) >= max_inflight:
                ready, pending = ray.wait(pending, num_returns=1)
                ray.get(ready)  # surface split failures NOW — a
                # swallowed error would commit a manifest with the
                # failed split's rows silently missing
        ray.get(pending)  # drain: all fragments on disk
        enc = ray.remote(_encode_bucket_from_disk)
        result_refs = [
            enc.remote(pid_keys, out_dir, sort_by,
                       _bucket_dir(shuffle_dir, b), generation)
            for b in range(n_buckets)
            if os.path.isdir(_bucket_dir(shuffle_dir, b))
        ]
        rows = [r for rs in ray.get(result_refs) for r in rs]
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
        return [_manifest_schema_table(rows)]

    import time as _time

    t0 = _time.perf_counter()
    split = ray.remote(_split_many)
    split_refs = [
        split.remote(group, bucket_of_pid, assign, columns)
        for group in split_inputs
    ]
    # barrier: every bucket needs a fragment ref from every split task
    frag_lists = ray.get(split_refs)
    t1 = _time.perf_counter()
    frag_cols = [
        [fl[b] for fl in frag_lists if fl[b] is not None]
        for b in range(n_buckets)
    ]

    enc = ray.remote(_encode_bucket)
    result_refs = [
        enc.remote(pid_keys, out_dir, sort_by, frag_cols[b], generation)
        for b in range(n_buckets)
        if frag_cols[b]
    ]
    rows = [r for rs in ray.get(result_refs) for r in rs]
    if os.environ.get("ARCADE_TIMING"):
        import sys as _sys

        print(f"[arcade-timing] split_wave={t1 - t0:.3f}s "
              f"encode_wave={_time.perf_counter() - t1:.3f}s "
              f"splits={len(split_refs)} buckets={n_buckets}",
              file=_sys.stderr)
    return [_manifest_schema_table(rows)]


def _validate_columns(schema_names: set, key_col: str, id_col: str,
                      weight_col: str | None) -> None:
    missing = [c for c in (key_col, id_col, weight_col)
               if c and c not in schema_names]
    if missing:
        raise ValueError(
            f"column(s) {missing} not in input schema "
            f"(columns: {sorted(schema_names)}); pass key_col/id_col/"
            f"weight_col matching your table"
        )


def _avail_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _direct_exchange_encode(ds, assign, plan, pid_keys: list[str], done: set,
                            out_dir: str, sort_by: str | None,
                            mode: str = "objects",
                            generation: str = "") -> list[pa.Table]:
    if mode == "disk":
        # stream block refs straight off the executor in small groups —
        # the input never materializes in the object store all at once
        def bundle_groups():
            group: list = []
            for bundle in ds.iter_internal_ref_bundles():
                group.extend(bundle.block_refs)
                if len(group) >= 4:
                    yield group
                    group = []
            if group:
                yield group

        return _run_direct_exchange(bundle_groups(), pid_keys,
                                    plan.pid_weights(), done, out_dir,
                                    sort_by, assign, mode="disk",
                                    generation=generation)
    block_refs = list(ds.to_arrow_refs())
    groups = _group(block_refs, max(16, _avail_cpus()))
    return _run_direct_exchange(groups, pid_keys, plan.pid_weights(), done,
                                out_dir, sort_by, assign,
                                generation=generation)


def _write_consolidated(out_dir: str, manifest: pa.Table) -> None:
    import pyarrow.parquet as pq

    tmp = os.path.join(out_dir, f"manifest.parquet.tmp.{os.getpid()}")
    pq.write_table(manifest, tmp)
    os.replace(tmp, os.path.join(out_dir, "manifest.parquet"))


SCHEMA_SIDECAR = "_schema.arrows"


def _write_schema_sidecar(out_dir: str, schema: pa.Schema,
                          replace: bool = False) -> None:
    """Top-level input-schema record (schema-only Arrow IPC stream),
    written atomically. Lets a scan of a legitimately EMPTY encoded
    table (zero committed partitions — e.g. an empty input shard)
    answer with a TYPED empty dataset instead of raising; partition
    headers can't help because none exist.

    A generation append UNIONS with the recorded schema rather than
    replacing it: an INSERT carrying a column subset must not shrink
    the dir's visible schema, and schema evolution's added columns
    must widen it (first-seen field wins on a name collision — the
    read-time manifest merge governs actual decoding). A FRESH base
    encode passes ``replace=True`` and overwrites the sidecar outright
    — otherwise a full re-encode with a renamed/retyped column would
    keep phantom fields and stale types visible to DESCRIBE and
    typed-empty scans forever."""
    existing = None if replace else read_schema_sidecar(out_dir)
    if existing is not None:
        fields = list(existing)
        names = set(existing.names)
        for f in schema:
            if f.name not in names:
                fields.append(f)
        schema = pa.schema(fields)
    tmp = os.path.join(out_dir, f"{SCHEMA_SIDECAR}.tmp.{os.getpid()}")
    with pa.OSFile(tmp, "wb") as f:
        with pa.ipc.new_stream(f, schema):
            pass  # schema-only stream: header, no record batches
    os.replace(tmp, os.path.join(out_dir, SCHEMA_SIDECAR))


def read_schema_sidecar(out_dir: str) -> pa.Schema | None:
    """Input schema recorded at encode time, or None (pre-sidecar
    dirs)."""
    p = os.path.join(out_dir, SCHEMA_SIDECAR)
    if not os.path.exists(p):
        return None
    with pa.ipc.open_stream(p) as r:
        return r.schema


ENCODE_META = "_encode_meta.json"


def _write_encode_meta(out_dir: str, key_col: str, id_col: str,
                       weight_col: str | None,
                       range_partition_col: str | None = None,
                       zorder_cols: list[str] | None = None) -> None:
    """Layout record (partition key / id / weight columns plus any
    range/Z-order clustering), written atomically once per dir: SQL
    INSERT (generation append) and other writers re-derive the layout
    from it instead of guessing. A generation append with a DIFFERENT
    key column or clustering would silently interleave two
    partitioning schemes, so a LAYOUT mismatch raises. ``weight_col``
    is a partition-SIZING hint, not layout — appends may differ (e.g.
    an INSERT omitting the weight column) without harm, and the
    originally recorded value stands."""
    meta = {"key_col": key_col, "id_col": id_col,
            "weight_col": weight_col,
            "range_partition_col": range_partition_col,
            "zorder_cols": list(zorder_cols) if zorder_cols else None}
    layout_keys = ("key_col", "id_col", "range_partition_col",
                   "zorder_cols")
    p = os.path.join(out_dir, ENCODE_META)
    if os.path.exists(p):
        with open(p) as f:
            old = json.load(f)
        old_l = {k: old.get(k) for k in layout_keys}
        new_l = {k: meta[k] for k in layout_keys}
        if old_l != new_l:
            raise ValueError(
                f"encode layout mismatch for {out_dir}: recorded "
                f"{old_l}, requested {new_l} — appends must reuse the "
                "dir's partitioning columns")
        return
    tmp = f"{p}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, p)


def read_encode_meta(out_dir: str) -> dict | None:
    """{key_col, id_col, weight_col} recorded at encode time, or None
    (pre-meta dirs)."""
    p = os.path.join(out_dir, ENCODE_META)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def clustering_kwargs(meta: dict) -> dict:
    """encode_dataset clustering arguments re-derived from a recorded
    _encode_meta.json, for generation APPENDS into clustered dirs (SQL
    INSERT / MERGE insert): a Z-order dir passes ``zorder_cols`` only
    (the Morton key re-derives per row from the persisted
    zorder_plan.json — meta's range_partition_col is the derived
    ZORDER_COL and must not be passed alongside), a range-clustered
    dir passes ``range_partition_col`` (the generation reuses the BASE
    range plan's cut points, see _range_plan_dataset)."""
    zc = meta.get("zorder_cols")
    if zc:
        return {"zorder_cols": list(zc)}
    rpc = meta.get("range_partition_col")
    if rpc:
        return {"range_partition_col": rpc}
    return {}


def cluster_input_cols(meta: dict) -> list[str]:
    """The INPUT columns an append into this dir must supply so its
    rows can be routed into the recorded clustered layout (Z-order
    source columns, or the range partition column)."""
    zc = meta.get("zorder_cols")
    if zc:
        return list(zc)
    rpc = meta.get("range_partition_col")
    return [rpc] if rpc else []


DISK_EXCHANGE_BYTES = int(os.environ.get(
    "ARCADE_DISK_EXCHANGE_BYTES", 8 * 1024 ** 3))


def encode_parquet(paths: list[str] | str, out_dir: str,
                   key_col: str = "source", id_col: str = "doc_id",
                   weight_col: str | None = "n_tok",
                   weight_cap: int | None = None, resume: bool = True,
                   sort_partitions_by: str | None = None,
                   exchange: str | None = None,
                   generation: str | None = None,
                   range_partition_col: str | None = None,
                   zorder_cols: list[str] | None = None) -> pa.Table:
    """Parquet-source fast path of :func:`encode_dataset`: split tasks
    read the shards directly (no intermediate block materialization),
    and the planning pass reads only the key/weight columns per shard.
    One split task per file group, one encode task per partition.

    ``exchange``: None (auto) picks the object-store exchange for
    inputs under ARCADE_DISK_EXCHANGE_BYTES on-disk bytes and the
    disk-staged, bounded-in-flight exchange above it — uncompressed
    fragments of a giant input would otherwise only be survivable via
    object-store spilling.

    ``range_partition_col``: CLUSTERED layout — partitions cover
    disjoint quantile ranges of this (numeric/timestamp) column
    instead of hash buckets of ``key_col``, and rows inside each
    partition sort by it, so manifest zone maps prune range/point
    predicates on the column ACROSS partitions. Boundaries come from a
    sampled planning wave and persist in ``range_plan.json`` (resume
    reuses them; re-sampling under different input blocking would
    remap rows across committed partitions).

    ``zorder_cols``: Z-ORDERED clustered layout over 2-3 columns (see
    :func:`encode_dataset`); routed through the generic dataset path
    since the Morton key is a computed column."""
    import glob as _glob

    import ray

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(_glob.glob(os.path.join(paths, "*.parquet")))
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        raise FileNotFoundError(paths)
    if zorder_cols is not None:
        # z-order needs a computed clustering column — route through
        # the generic dataset path. range_partition_col forwards so
        # the exclusivity error still fires; the disk-exchange
        # auto-select mirrors the fast path's byte threshold.
        from ..sources import read_parquet_clean

        if exchange is None:
            on_disk = sum(os.path.getsize(f) for f in files)
            exchange = "disk" if on_disk > DISK_EXCHANGE_BYTES \
                else "direct"
        return encode_dataset(
            read_parquet_clean(files), out_dir, key_col=key_col,
            id_col=id_col, weight_col=weight_col, weight_cap=weight_cap,
            resume=resume, sort_partitions_by=sort_partitions_by,
            exchange=exchange, generation=generation,
            range_partition_col=range_partition_col,
            zorder_cols=zorder_cols)

    os.makedirs(os.path.join(out_dir, PARTS_DIR), exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    if range_partition_col is not None and sort_partitions_by is None:
        sort_partitions_by = range_partition_col
    sort_by = id_col if sort_partitions_by is None else sort_partitions_by
    if generation:
        # appending into a relocated consolidated-only dir would
        # shadow the base rows (load_manifest prefers row files);
        # materialize them first
        ensure_row_files(out_dir)
    done = committed_parts(out_dir) if resume else {}

    import pyarrow.parquet as _pq

    input_schema = _pq.read_schema(files[0])
    schema_names = set(input_schema.names)
    _validate_columns(schema_names, range_partition_col or key_col,
                      id_col, weight_col)
    _write_schema_sidecar(out_dir, input_schema.remove_metadata(),
                          replace=not generation and not done)
    _write_encode_meta(out_dir, key_col, id_col, weight_col,
                       range_partition_col, zorder_cols)

    # planning pass: per-file partial aggregates over pruned columns
    plan_cols = [key_col] + ([weight_col] if weight_col and weight_col != key_col else [])

    @ray.remote
    def file_partial(fs: list) -> dict:
        import pyarrow.parquet as pq

        _pin_arrow_threads()
        totals: dict[str, int] = {}
        for f in fs:
            if isinstance(f, tuple):
                path, lo, hi = f
                t = pq.ParquetFile(path).read_row_groups(
                    list(range(lo, hi)), columns=plan_cols)
            else:
                t = pq.read_table(f, columns=plan_cols)
            keys = t[key_col]
            if not pa.types.is_string(keys.type):
                keys = keys.cast(pa.string())
            # null keys group under "" — must agree with
            # planner.assign_part_keys or sorted(part_keys) crashes on
            # None and the exchange would drop the null-key rows
            keys = pa.compute.fill_null(keys, "")
            if weight_col is not None:
                g = pa.table({"k": keys, "w": t[weight_col].cast(pa.int64())}) \
                    .group_by("k").aggregate([("w", "sum")])
                ks, ws = g["k"].to_pylist(), g["w_sum"].to_pylist()
            else:
                g = pa.table({"k": keys}).group_by("k").aggregate([("k", "count")])
                ks, ws = g["k"].to_pylist(), g["k_count"].to_pylist()
            for k, w in zip(ks, ws):
                totals[k] = totals.get(k, 0) + int(w)
        return totals

    from ..constants import DEFAULT_PART_ROW_CAP, DEFAULT_PART_TOKEN_CAP

    cap = weight_cap or (
        DEFAULT_PART_TOKEN_CAP if weight_col is not None else DEFAULT_PART_ROW_CAP
    )
    # one split task per core: the split wave (parquet read + assign +
    # hash-partition) is the pipeline's other parallel phase — capping
    # it below the core count was the 8->32 scaling ceiling (the encode
    # bucket count already scales with _avail_cpus)
    n_splits = int(os.environ.get("ARCADE_SPLIT_TASKS", 0)) \
        or max(16, _avail_cpus())
    if len(files) < n_splits:
        # few big files: split by parquet row-group ranges so the read
        # still parallelizes (one split task per range)
        import pyarrow.parquet as pq

        items: list = []
        for f in files:
            n_rg = pq.ParquetFile(f).metadata.num_row_groups
            per_file = max(1, n_splits // len(files))
            step = max(1, -(-n_rg // per_file))
            for lo in range(0, n_rg, step):
                items.append((f, lo, min(n_rg, lo + step)))
        files = items
    groups = _group(files, n_splits)
    import time as _time

    _t_plan0 = _time.perf_counter()
    if range_partition_col is not None:
        plan = _load_range_plan(out_dir, generation, range_partition_col,
                                resume)
        if plan is None:
            import numpy as np

            from ..planner import build_range_plan, range_sample

            rcols = [range_partition_col] + (
                [weight_col] if weight_col
                and weight_col != range_partition_col else [])

            @ray.remote
            def range_partial(fs: list):
                import numpy as np
                import pyarrow.parquet as pq

                _pin_arrow_threads()
                samples, w = [], 0
                for f in fs:
                    if isinstance(f, tuple):
                        path, lo, hi = f
                        t = pq.ParquetFile(path).read_row_groups(
                            list(range(lo, hi)), columns=rcols)
                    else:
                        t = pq.read_table(f, columns=rcols)
                    samples.append(range_sample(t[range_partition_col]))
                    w += int(pc.sum(t[weight_col]).as_py() or 0) \
                        if weight_col else t.num_rows
                return (np.concatenate(samples) if samples
                        else np.empty(0), w)

            parts = ray.get([range_partial.remote(g) for g in groups])
            samples = np.concatenate([p[0] for p in parts]) if parts \
                else np.empty(0)
            plan = build_range_plan(samples, sum(p[1] for p in parts),
                                    cap, range_partition_col)
            _save_range_plan(out_dir, generation, plan)
    else:
        totals: dict[str, int] = {}
        for part in ray.get([file_partial.remote(g) for g in groups]):
            for k, w in part.items():
                totals[k] = totals.get(k, 0) + w
        plan = Plan({k: max(1, -(-w // cap)) for k, w in totals.items()},
                    key_col, id_col, cap, source_weights=totals)
    if os.environ.get("ARCADE_TIMING"):
        import sys as _sys

        print(f"[arcade-timing] plan_wave="
              f"{_time.perf_counter() - _t_plan0:.3f}s "
              f"plan_tasks={len(groups)}", file=_sys.stderr)
    pid_keys = _apply_generation(plan.part_keys(), generation)
    done_pids = pa.array(
        [i for i, k in enumerate(pid_keys) if k in done], type=pa.int64()
    )

    from ..planner import RangePlan, assign_range_pids

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # schema-less empty blocks (Ray's union/map plumbing emits
            # them) carry no rows to route — and may not even have the
            # key column to route by
            return pa.table({"_pid": pa.array([], pa.int64())})
        out = assign_range_pids(batch, plan) if isinstance(plan, RangePlan) \
            else assign_part_keys(batch, plan)
        if len(done_pids):
            keep = pc.invert(pc.is_in(out["_pid"], value_set=done_pids))
            out = out.filter(keep)
        return out

    if exchange is None:
        uniq_paths = {(f[0] if isinstance(f, tuple) else f) for f in files}
        on_disk = sum(os.path.getsize(p) for p in uniq_paths)
        exchange = "disk" if on_disk > DISK_EXCHANGE_BYTES else "direct"
    tables = _run_direct_exchange(groups, pid_keys, plan.pid_weights(),
                                  set(done), out_dir, sort_by, assign,
                                  mode="disk" if exchange == "disk" else "objects",
                                  generation=generation or "")
    all_rows = list(done.values())
    for t in tables:
        all_rows.extend(t.to_pylist())
    manifest = _manifest_schema_table(sorted(all_rows, key=lambda r: r["part_key"]))
    _write_consolidated(out_dir, manifest)
    return manifest


def ensure_row_files(out_dir: str) -> None:
    """Materialize per-partition manifest row files from the
    consolidated manifest.parquet for a relocated, CONSOLIDATED-ONLY
    dir. Appends commit new row files, and ``load_manifest`` prefers
    row files whenever any exist — so appending into a
    consolidated-only dir without this repair would silently shadow
    every base row. Idempotent; no-op when row files already exist."""
    if committed_parts(out_dir):
        return
    consolidated = os.path.join(out_dir, "manifest.parquet")
    if not os.path.exists(consolidated):
        return
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    for r in pq.read_table(consolidated).to_pylist():
        r["path"] = part_path(out_dir, r["part_key"])
        p = _manifest_row_path(out_dir, r["part_key"])
        if os.path.exists(p):
            continue
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(r, f)
        os.replace(tmp, p)


def all_generations(out_dir: str) -> set[str]:
    """Every generation name that could collide with a fresh append —
    generation-name pickers (INSERT/MERGE) must scan THIS, not the
    filtered manifest. Three sources, each closing a reuse hazard:

    - raw manifest row files, INCLUDING rows currently shadowed by a
      ``replaces`` tombstone (crash window between a compaction's
      commit and its cleanup);
    - names parsed out of live ``replaces`` lists themselves (the
      replaced ROW may already be deleted while its tombstone
      survives a crash before tombstone cleanup — reusing that name
      would mint a part_key the tombstone silently filters from every
      scan). The prefix parse can over-extract when a source value
      contains '@' — harmless: the picker just skips to the next name;
    - the consolidated manifest.parquet fallback (a relocated dir may
      carry ONLY the consolidated file, the same state load_manifest
      supports — an empty row scan there must not report 'no
      generations')."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    gens: set[str] = set()
    saw_rows = False
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if fn.endswith(".json"):
                saw_rows = True
                with open(os.path.join(mdir, fn)) as f:
                    row = json.load(f)
                gens.add(generation_of_row(row))
                for key in row.get("replaces") or []:
                    prefix = key.split("#", 1)[0]
                    if "@" in prefix:
                        gens.add(prefix.rsplit("@", 1)[1])
    if not saw_rows:
        consolidated = os.path.join(out_dir, "manifest.parquet")
        if os.path.exists(consolidated):
            import pyarrow.parquet as pq

            # full read: legacy consolidated files may lack the
            # generation column (generation_of_row falls back to the
            # part_key parse) and the manifest is rows-of-partitions
            # small either way. Tombstoned names block here too.
            for r in pq.read_table(consolidated).to_pylist():
                gens.add(generation_of_row(r))
                for key in r.get("replaces") or []:
                    prefix = key.split("#", 1)[0]
                    if "@" in prefix:
                        gens.add(prefix.rsplit("@", 1)[1])
    return gens


def load_manifest(out_dir: str) -> pa.Table:
    """Committed-partition manifest: prefers the consolidated parquet,
    falls back to scanning row files (mid-run / crashed state)."""
    import pyarrow.parquet as pq

    consolidated = os.path.join(out_dir, "manifest.parquet")
    rows = committed_parts(out_dir)
    if not rows and os.path.exists(consolidated):
        t = pq.read_table(consolidated)
        # same relocation rebase as committed_parts
        paths = pa.array([part_path(out_dir, k)
                          for k in t["part_key"].to_pylist()])
        return t.set_column(t.column_names.index("path"), "path",
                            paths)
    return _manifest_schema_table(
        sorted(rows.values(), key=lambda r: r["part_key"])
    )
