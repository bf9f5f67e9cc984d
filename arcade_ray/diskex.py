"""Disk-staged fragment exchange shared by the co-partitioned join and
the pair-verify barrier.

The objects-mode exchanges (collect.split_by_bucket) hold every
fragment in the object store between the split and consume phases —
fine until the assigned input outgrows store capacity, then it leans on
Ray spilling. This module is the bounded alternative (the
Spark-shuffle-file pattern, same as encode.py:_split_to_disk): split
tasks append Arrow IPC files under ``shuffle_dir/b{bucket}/``, in-flight
splits are bounded by a ray.wait window, and each consumer task
memory-maps exactly its bucket directory. Peak object-store usage is
O(in-flight splits) regardless of input size; on a multi-node cluster
``shuffle_dir`` must live on shared storage (same contract as encode's
disk exchange).

Auto-selection threshold: ARCADE_DISK_EXCHANGE_BYTES (default 8 GiB),
shared with encode_parquet.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

DISK_EXCHANGE_BYTES = int(os.environ.get(
    "ARCADE_DISK_EXCHANGE_BYTES", 8 * 1024 ** 3))


def make_shuffle_dir(tag: str) -> str:
    """A fresh shuffle directory under ARCADE_SHUFFLE_ROOT (default
    system tmp), cleaned at interpreter exit as a backstop — the
    consuming task removes its own bucket dir right after reading it
    (each bucket is read exactly once), so steady-state residue is
    empty directories only."""
    import atexit

    root = os.environ.get("ARCADE_SHUFFLE_ROOT") or tempfile.gettempdir()
    d = tempfile.mkdtemp(prefix=f"arcade_{tag}_shuffle_", dir=root)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def write_bucket_frags(table: pa.Table, buckets: np.ndarray,
                       n_buckets: int, shuffle_dir: str,
                       split_id: int) -> int:
    """Fan one table out into per-bucket Arrow IPC fragment files
    (atomic rename per file). Returns rows written."""
    buckets = np.ascontiguousarray(buckets)
    order = np.argsort(buckets, kind="stable")
    bounds = np.searchsorted(buckets[order], np.arange(n_buckets + 1))
    written = 0
    for b in range(n_buckets):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if hi <= lo:
            continue
        frag = table.take(pa.array(order[lo:hi], type=pa.int64()))
        d = os.path.join(shuffle_dir, f"b{b:05d}")
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, f"s{split_id:05d}.arrow")
        tmp = final + f".tmp.{os.getpid()}"
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_file(sink, frag.schema) as w:
                w.write_table(frag)
        os.replace(tmp, final)
        written += frag.num_rows
    return written


def bucket_dir(shuffle_dir: str, b: int) -> str:
    return os.path.join(shuffle_dir, f"b{b:05d}")


def read_bucket(shuffle_dir: str, b: int, *,
                remove: bool = False) -> pa.Table | None:
    """Memory-map and concat one bucket's fragment files; optionally
    remove the bucket dir afterwards (safe: each bucket has exactly
    one consumer)."""
    d = bucket_dir(shuffle_dir, b)
    if not os.path.isdir(d):
        return None
    tables = []
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".arrow"):
            with pa.memory_map(os.path.join(d, fn)) as src:
                tables.append(pa.ipc.open_file(src).read_all())
    if remove:
        shutil.rmtree(d, ignore_errors=True)
    if not tables:
        return None
    return pa.concat_tables(tables).combine_chunks()


def drain_bounded(pending: list, max_inflight: int):
    """ray.wait window helper: block until fewer than ``max_inflight``
    tasks are outstanding, surfacing failures immediately."""
    import ray

    while len(pending) >= max_inflight:
        ready, pending = ray.wait(pending, num_returns=1)
        ray.get(ready)  # surface split failures NOW
    return pending
