"""Z-order (Morton) multi-column clustering for the encoded layout.

The range-partitioned layout (encode ``range_partition_col=``) makes
ONE column's zone maps selective across partitions. Z-ordering extends
that to 2-3 columns: each column is quantile-normalized to a
``bits``-wide bucket rank (boundaries from a streaming sample wave, so
skewed distributions still spread evenly), the ranks' bits interleave
into one Morton key, and the existing range-partition machinery
clusters on that key. Partitions then cover small HYPER-RECTANGLES of
the column space, so the ordinary per-partition zone maps on EVERY
z-column prune multi-predicate scans — no new query code at all.

Scale shape: the plan is a per-column boundary list ((2^bits)-1
values) built from one strided sample per block (the range-plan wave's
pattern — one tiny row per block reaches the driver); the per-batch
key computation is two vectorized searchsorted calls plus table-lookup
bit spreading. The plan persists as ``zorder_plan.json`` next to the
manifest so resumed encodes reuse identical boundaries.

Reference parity note: the reference has no clustering layout at all
(single-file output, /root/reference/README.md roadmap item
"partitioning"); this is engine-specific scale work.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BITS = 10  # per-column rank width; 2 cols -> 20-bit Morton key

ZORDER_COL = "zorder"  # stored clustering key column name


def _spread(bits: int, stride: int) -> np.ndarray:
    """Lookup table T[v] = v with (stride-1) zero bits interleaved
    between value bits — the vectorized Morton building block."""
    v = np.arange(1 << bits, dtype=np.uint64)
    out = np.zeros_like(v)
    for b in range(bits):
        out |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * stride)
    return out


def _order_key(values: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order-preserving uint64 keys of an Arrow numeric column, nulls
    and NaNs mapped to the BOTTOM (bucket 0 — they cluster together
    and never poison boundaries)."""
    from .sketches import order_key_from_stream
    from .streams import int_stream_from_arrow

    a = values.combine_chunks() if isinstance(values, pa.ChunkedArray) \
        else values
    null_mask = None
    if a.null_count:
        null_mask = pc.is_null(a).to_numpy(zero_copy_only=False)
        a = pc.fill_null(a, pa.scalar(0, type=a.type) if not
                         pa.types.is_floating(a.type) else
                         pa.scalar(0.0, type=a.type))
    vals, tag = int_stream_from_arrow(a)
    keys = order_key_from_stream(vals, tag)
    if null_mask is not None:
        keys = keys.copy()
        keys[null_mask] = np.uint64(0)
    if tag in ("f32", "f64"):
        # NaNs sort above +inf in the total order; clamp to bottom so
        # quality-signal columns with NaN holes don't fragment the top
        f = vals.view(np.float64) if tag == "f64" else \
            vals.astype(np.uint32).view(np.float32).astype(np.float64)
        keys = keys.copy()
        keys[np.isnan(f)] = np.uint64(0)
    return keys


def build_zorder_plan(ds, cols: list[str],
                      bits: int = DEFAULT_BITS) -> dict:
    """Per-column quantile boundaries from one strided sample per
    block (planner.range_sample's shape, one wave for ALL columns).
    Returns {"cols": [...], "bits": b, "boundaries": {col: [uint64]}}.
    Numeric/temporal columns only."""
    from .planner import RANGE_SAMPLE_PER_TASK

    def partial(batch: pa.Table) -> pa.Table:
        row = {}
        for c in cols:
            keys = _order_key(batch[c])
            k = RANGE_SAMPLE_PER_TASK
            if len(keys) > k:
                keys = keys[::-(-len(keys) // k)]
            row[c] = pa.array([keys.astype(np.int64).tolist()],
                              type=pa.list_(pa.int64()))
        return pa.table(row)

    parts = ds.select_columns(list(cols)) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    boundaries = {}
    n_b = (1 << bits) - 1
    for c in cols:
        s = np.concatenate([np.asarray(r[c], dtype=np.int64)
                            for r in parts]) if parts else \
            np.empty(0, dtype=np.int64)
        s = np.sort(s.view(np.uint64))
        if len(s) == 0:
            boundaries[c] = []
            continue
        qs = np.quantile(s, [(i + 1) / (n_b + 1) for i in range(n_b)],
                         method="lower").astype(np.uint64)
        boundaries[c] = [int(x) for x in qs]
    return {"cols": list(cols), "bits": int(bits),
            "boundaries": boundaries}


def zorder_keys(batch: pa.Table, plan: dict) -> np.ndarray:
    """Vectorized Morton keys for one batch under a persisted plan:
    per column one searchsorted into its boundary list, then
    table-lookup bit spreading. Returns int64 (bits*len(cols) wide)."""
    cols, bits = plan["cols"], plan["bits"]
    stride = len(cols)
    table = _spread(bits, stride)
    z = np.zeros(batch.num_rows, dtype=np.uint64)
    for i, c in enumerate(cols):
        b = np.asarray(plan["boundaries"][c], dtype=np.uint64)
        rank = np.searchsorted(b, _order_key(batch[c]), side="right") \
            if len(b) else np.zeros(batch.num_rows, dtype=np.int64)
        z |= table[rank] << np.uint64(i)
    return z.astype(np.int64)


def add_zorder_column(ds, plan: dict):
    """Append the Morton key as an ordinary int64 column named
    ``zorder`` — the existing range-partition + in-partition sort
    machinery then clusters on it, and it round-trips like any other
    column (a few bits/row once bit-packed)."""
    def run(batch: pa.Table) -> pa.Table:
        if ZORDER_COL in batch.column_names:
            raise ValueError(f"input already has a {ZORDER_COL!r} column")
        return batch.append_column(
            ZORDER_COL, pa.array(zorder_keys(batch, plan), pa.int64()))

    return ds.map_batches(run, batch_format="pyarrow")


def zorder_plan_path(out_dir: str) -> str:
    return os.path.join(out_dir, "zorder_plan.json")


def save_zorder_plan(out_dir: str, plan: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = zorder_plan_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(plan, f)
    os.replace(tmp, zorder_plan_path(out_dir))


def load_zorder_plan(out_dir: str, cols: list[str] | None = None) -> dict | None:
    p = zorder_plan_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        plan = json.load(f)
    if cols is not None and list(cols) != plan["cols"]:
        raise ValueError(
            f"{p} was built for zorder_cols={plan['cols']!r} but this "
            f"run asked for {list(cols)!r}; use a fresh out_dir")
    return plan
