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


