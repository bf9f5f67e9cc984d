"""Stream-shaped window operators (tumbling windows live in the
query surface; here: gap-based session windows).

Ray Data has no event-time window/watermark primitives (guide
'Streaming-shaped workloads'); windows are expressed as
groupby(key).map_groups over ts-sorted groups — the ordering
assumption is per-key, enforced by the in-group sort."""

from __future__ import annotations


def session_windows(ds, key_col: str = "user_id", ts_col: str = "ts",
                    gap_s: float = 1800.0):
    """Gap-based session windows over a stream-shaped table: partition
    by key, sort by timestamp within the group, close a session when
    the gap to the previous event exceeds ``gap_s`` (guide
    'Streaming-shaped workloads': windowing inside
    groupby(key).map_groups over the sorted group). Returns one row per
    session: (key, session_start, session_end, n_events)."""

    def sessions(group):
        import pandas as pd

        g = group.sort_values(ts_col)
        ts = pd.to_datetime(g[ts_col])
        gaps = ts.diff().dt.total_seconds().fillna(float("inf"))
        session_id = (gaps > gap_s).cumsum()
        agg = g.assign(_sid=session_id, _ts=ts).groupby("_sid").agg(
            **{key_col: (key_col, "first"),
               "session_start": ("_ts", "min"),
               "session_end": ("_ts", "max")}
        )
        agg["n_events"] = g.groupby(session_id).size().values
        return agg.reset_index(drop=True)

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")




def sliding_windows(ds, ts_col: str = "ts", width_s: float = 3600.0,
                    hop_s: float = 1800.0, keep: list[str] | None = None):
    """Assign each row to every sliding (hopping) window containing its
    timestamp: width ``width_s``, hop ``hop_s`` (width must be an
    integer multiple of the hop). Flat-map shaped: one output row per
    (row, window) — width/hop windows per row — with a ``w`` window
    start column; aggregate downstream with ``groupby([... , "w"])``.
    Stays vectorized (arrow temporal kernels + table concat)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n_hops = int(round(width_s / hop_s))
    if abs(n_hops * hop_s - width_s) > 1e-9 or n_hops < 1:
        raise ValueError("width_s must be a positive multiple of hop_s")
    hop_us = int(hop_s * 1_000_000)
    hop = pa.scalar(hop_us, type=pa.duration("us"))

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        base_cols = keep or [c for c in batch.column_names if c != ts_col]
        # floor_temporal is hour-anchored: only safe when the hop
        # divides an hour (30/20/15/... min). Other hops fall through
        # to the epoch-anchored integer floor below (the origin for
        # those is epoch 1970-01-01, documented behavior).
        if hop_s % 60 == 0 and 3600 % int(hop_s) == 0:
            w0 = pc.floor_temporal(batch[ts_col], multiple=int(hop_s // 60),
                                   unit="minute")
        else:
            # epoch-anchored floor; numpy // floors toward -inf so
            # pre-1970 (negative) timestamps land in the right window
            us = batch[ts_col].cast(pa.int64()).combine_chunks()
            us_np = us.to_numpy(zero_copy_only=False)
            w0 = pa.chunked_array(
                [pa.array((us_np // hop_us) * hop_us)]
            ).cast(batch[ts_col].type)
        base = batch.select(base_cols)
        outs = []
        w = w0
        for _ in range(n_hops):
            outs.append(base.append_column("w", w))
            w = pc.subtract(w, hop)
        return pa.concat_tables(outs)

    return ds.map_batches(assign, batch_format="pyarrow")
