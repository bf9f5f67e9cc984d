"""Stream-shaped window operators (tumbling windows live in the
query surface; here: gap-based session windows).

Ray Data has no event-time window/watermark primitives (guide
'Streaming-shaped workloads'); windows are expressed as
groupby(key).map_groups over ts-sorted groups — the ordering
assumption is per-key, enforced by the in-group sort."""

from __future__ import annotations


def session_windows(ds, key_col: str = "user_id", ts_col: str = "ts",
                    gap_s: float = 1800.0, n_buckets: int | None = None):
    """Gap-based session windows over a stream-shaped table. Returns
    one row per session: (key, session_start, session_end, n_events).

    Scale shape (the round-2 review flagged one pandas call per KEY):
    rows are hash-bucketed by key into ~2x-CPU coarse buckets, so the
    groupby shuffle co-locates each key's rows while the per-group
    Python cost is O(n_buckets), not O(keys). Inside a bucket,
    everything is one vectorized pass: arrow sort by (key, ts),
    session breaks from a key-change/gap diff, per-session aggregates
    from run boundaries — no per-key pandas groups."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import hash_column

    if n_buckets is None:
        import ray

        avail = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(8, 2 * avail)

    def assign(batch: pa.Table) -> pa.Table:
        b = (hash_column(batch[key_col]) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("_sb", pa.array(b))

    def sessions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if {key_col, ts_col} <= set(t.column_names):
                return pa.table({
                    key_col: t[key_col],
                    "session_start": t[ts_col],
                    "session_end": t[ts_col],
                    "n_events": pa.array([], type=pa.int64()),
                })
            return pa.table({})
        t = t.take(pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]))
        ts = t[ts_col].combine_chunks()
        unit = ts.type.unit if pa.types.is_timestamp(ts.type) else "us"
        per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        ts_i = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = t[key_col].combine_chunks()
        n = len(ts_i)
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            key_change = pc.invert(pc.equal(
                keys.slice(1), keys.slice(0, n - 1))).to_numpy(
                    zero_copy_only=False).astype(bool)
            gap = (ts_i[1:] - ts_i[:-1]) > gap_s * per_s
            new_sess[1:] = key_change | gap
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate([starts[1:], [n]])
        take_starts = pa.array(starts, type=pa.int64())
        return pa.table({
            key_col: keys.take(take_starts),
            "session_start": ts.take(take_starts),
            "session_end": ts.take(pa.array(ends - 1, type=pa.int64())),
            "n_events": pa.array(ends - starts, type=pa.int64()),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("_sb")
            .map_groups(sessions, batch_format="pyarrow"))




def _tagged_union(left_ds, right_ds, on: str, by: str,
                  left_cols: list[str] | None, right_cols: list[str] | None,
                  suffix: str, n_buckets: int | None,
                  right_on: str | None):
    """Shared co-partitioning scaffold for the join-by-time operators
    (asof_join, interval_join): rows are tagged with a side flag,
    unified to one schema (each side fills the other's columns with
    typed nulls), and hash-bucketed by key into ~2x-CPU coarse buckets
    — ONE shuffle co-locates both sides. Returns
    (unified_ds, left_cols, right_cols, r_out, out_cols, out_empty)
    where out_empty is a typed zero-row table in the output schema."""
    import numpy as np
    import pyarrow as pa

    from .hashing import hash_column

    if n_buckets is None:
        import ray

        avail = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(8, 2 * avail)
    left_cols = list(left_cols or [])
    right_cols = list(right_cols or [])
    if by not in left_cols:
        left_cols = [by] + left_cols
    if on not in left_cols:
        left_cols = left_cols + [on]
    r_out = {c: (c + suffix if c in left_cols else c) for c in right_cols}

    l_sch, r_sch = left_ds.schema(), right_ds.schema()
    if l_sch is None or r_sch is None:
        raise ValueError("cannot join an empty dataset with no schema "
                         "(left empty: %s, right empty: %s)"
                         % (l_sch is None, r_sch is None))
    l_schema = {f.name: f.type for f in l_sch.base_schema}
    r_schema = {f.name: f.type for f in r_sch.base_schema}

    r_on = right_on or on

    def _tag(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        b = (hash_column(batch[by]) % np.uint64(n_buckets)).astype(np.int64)
        cols = {
            "_ab": pa.array(b),
            "_side": pa.array(np.full(n, side, dtype=np.int8)),
            by: batch[by],
            on: batch[on] if side == 1 else batch[r_on].cast(
                l_schema[on]),
        }
        for c in left_cols:
            if c not in (by, on):
                cols[c] = batch[c] if side == 1 else pa.nulls(n, l_schema[c])
        for c, oc in r_out.items():
            cols[oc] = batch[c] if side == 0 else pa.nulls(n, r_schema[c])
        return pa.table(cols)

    def tag_left(batch: pa.Table) -> pa.Table:
        return _tag(batch, 1)

    def tag_right(batch: pa.Table) -> pa.Table:
        return _tag(batch, 0)

    unified = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow"))
    out_cols = [c for c in left_cols] + [r_out[c] for c in right_cols]
    # typed zero-row output table: merge fns return this for the
    # schema-less empty blocks Ray's sort emits for empty key ranges —
    # a 0-column pa.table({}) there makes the executor log
    # "RefBundle with a different schema … new schema: ." per block
    out_empty = pa.table(
        {c: pa.array([], type=l_schema[c]) for c in left_cols}
        | {r_out[c]: pa.array([], type=r_schema[c]) for c in right_cols})
    return unified, left_cols, right_cols, r_out, out_cols, out_empty


def asof_join(left_ds, right_ds, on: str = "ts", by: str = "user_id",
              left_cols: list[str] | None = None,
              right_cols: list[str] | None = None,
              suffix: str = "_r", n_buckets: int | None = None,
              right_on: str | None = None,
              direction: str = "backward", strict: bool = False):
    """AS-OF join: attach to each left row the NEAREST right row
    within the same ``by`` key — ``direction="backward"`` (default)
    takes the latest right with ``right.on <= left.on``,
    ``direction="forward"`` the earliest right with ``right.on >=
    left.on``; ``strict=True`` excludes equal timestamps (< / >).
    Left rows with no match keep nulls (ASOF LEFT JOIN).

    Forward lowers onto the SAME vectorized merge by negating the
    int64 order key (nearest-following in real time = nearest-
    preceding in negated time); strict flips the tie order so an
    equal-timestamp right row sorts AFTER the left row and its carry
    is not yet visible — no second code path, no epsilon arithmetic.

    Scale shape — ONE shuffle, both sides co-located: rows are tagged
    with a side flag, unified to one schema, and hash-bucketed by key
    into ~2x-CPU coarse buckets (the same co-partitioning trick the
    exchange join uses, expressed as a single union + groupby).
    Inside a bucket everything is one vectorized pass: lexsort by
    (key, ts, side) with right-before-left at ties, then a
    segment-reset running maximum carries each key's latest right row
    index forward onto the left rows — no per-key Python.

    ``right_cols`` columns are renamed with ``suffix`` when they
    collide with left columns. ``right_on`` names the right side's
    ordering column when it differs from ``on`` (e.g. an interval's
    start). Returns a Dataset of left_cols + matched right columns."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import hash_column

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof direction {direction!r}")
    unified, left_cols, right_cols, r_out, out_cols, out_empty = \
        _tagged_union(left_ds, right_ds, on, by, left_cols, right_cols,
                      suffix, n_buckets, right_on)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # typed empty in the OUTPUT schema — returning the raw
            # group block would leak _ab/_side and diverge from
            # non-empty groups' schema
            return out_empty
        keys = t[by].combine_chunks()
        kc = keys if pa.types.is_dictionary(keys.type) \
            else pc.dictionary_encode(keys)
        key_codes = kc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[on].combine_chunks()
        ts_i = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        if direction == "forward":
            ts_i = -ts_i  # nearest-following = nearest-preceding
            # in negated time (int64 min never appears in real data)
        side = t["_side"].to_numpy(zero_copy_only=False)
        n = len(ts_i)
        # non-strict: right (0) first at equal ts (its carry is
        # visible to the tied left row); strict: left first, so the
        # equal-ts right row is NOT yet carried
        tie = (1 - side) if strict else side
        order = np.lexsort((tie, ts_i, key_codes))
        s_key = key_codes[order]
        s_side = side[order]
        # running index of the latest right row, reset per key segment
        base = s_key.astype(np.int64) * np.int64(n + 1)
        carry = np.where(s_side == 0,
                         np.arange(n, dtype=np.int64) + 1, 0)
        enc = np.maximum.accumulate(base + carry)
        match_sorted = enc - base  # 0 = no right row yet in this key
        left_pos = np.flatnonzero(s_side == 1)
        lmatch = match_sorted[left_pos] - 1  # sorted-pos of right row
        has = lmatch >= 0
        left_orig = order[left_pos]
        right_orig = np.full(len(left_pos), -1, dtype=np.int64)
        right_orig[has] = order[lmatch[has]]
        cols = {}
        take_l = pa.array(left_orig, type=pa.int64())
        for c in left_cols:
            cols[c] = t[c].combine_chunks().take(take_l)
        ridx = pa.array(np.where(has, right_orig, -1), type=pa.int64())
        ridx = pc.if_else(pa.array(has), ridx, pa.nulls(len(has), pa.int64()))
        for c in right_cols:
            cols[r_out[c]] = t[r_out[c]].combine_chunks().take(ridx)
        return pa.table({c: cols[c] for c in out_cols})

    return unified.groupby("_ab").map_groups(merge, batch_format="pyarrow")


def range_join(left_ds, right_ds, on: str = "ts",
               lo_col: str = "session_start", hi_col: str = "session_end",
               by: str = "user_id", left_cols: list[str] | None = None,
               right_cols: list[str] | None = None,
               n_buckets: int | None = None):
    """Interval-containment join: attach to each left row the right
    interval (per ``by`` key) with ``lo <= left.on <= hi``; left rows
    inside no interval are dropped (inner semantics).

    Partitioning assumption (documented per the custom-operator
    contract): intervals are NON-OVERLAPPING per key — then the
    containing interval is exactly the as-of match on the interval
    start, post-filtered by ``hi >= on``. Session/tumbling windows
    satisfy this by construction; for OVERLAPPING intervals use
    :func:`interval_join` (one row per containing interval). One
    co-partitioned shuffle, vectorized merge (see asof_join)."""
    import pyarrow.compute as pc

    rc = [lo_col, hi_col] + [c for c in (right_cols or [])
                             if c not in (lo_col, hi_col)]
    out = asof_join(left_ds, right_ds, on=on, by=by, left_cols=left_cols,
                    right_cols=rc, n_buckets=n_buckets, right_on=lo_col)

    def inside(batch: pa.Table) -> pa.Table:
        hi = batch[hi_col]
        keep = pc.and_kleene(pc.is_valid(hi),
                             pc.greater_equal(hi.cast(batch[on].type),
                                              batch[on]))
        return batch.filter(pc.fill_null(keep, False))

    return out.map_batches(inside, batch_format="pyarrow")


def interval_join(left_ds, right_ds, on: str = "ts",
                  lo_col: str = "w_start", hi_col: str = "w_end",
                  by: str = "user_id", left_cols: list[str] | None = None,
                  right_cols: list[str] | None = None, suffix: str = "_r",
                  n_buckets: int | None = None):
    """Interval join with OVERLAPPING intervals: one output row per
    (left row, containing interval) pair — ``lo <= left.on <= hi``
    within the same ``by`` key (inner semantics; the general case
    range_join's non-overlap assumption excludes).

    Scale shape: the same single co-partitioning shuffle as asof_join,
    then one fully vectorized stabbing pass per bucket — no per-key
    Python and no interval tree:

    - right rows sort by (key, lo); per key segment the max interval
      LENGTH bounds how far left of ``t`` a containing interval can
      start (the banded range-join trick);
    - candidate windows come from two ``np.searchsorted`` calls over a
      rank-composite (key * (n+1) + rank-of-value) that makes the
      per-key segments globally ordered — equal values keep equal
      ranks, so the bounds are exact;
    - candidates expand with repeat/arange and filter on ``hi >= t``.

    Cost is O(output + n log n) per bucket; a single giant interval in
    a key widens that key's candidate band (documented skew caveat).
    Returns a Dataset of left_cols + matched right columns."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    rc = [lo_col, hi_col] + [c for c in (right_cols or [])
                             if c not in (lo_col, hi_col)]
    unified, left_cols, right_cols, r_out, out_cols, out_empty = \
        _tagged_union(left_ds, right_ds, on, by, left_cols, rc, suffix,
                      n_buckets, lo_col)
    hi_out = r_out[hi_col]

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        keys = t[by].combine_chunks()
        kc = keys if pa.types.is_dictionary(keys.type) \
            else pc.dictionary_encode(keys)
        key_codes = kc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[on].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        side = t["_side"].to_numpy(zero_copy_only=False)
        hi_i = pc.fill_null(
            t[hi_out].combine_chunks().cast(pa.int64()), 0,
        ).to_numpy(zero_copy_only=False)
        n = len(v)
        empty = t.select(out_cols).slice(0, 0)

        r_idx = np.flatnonzero(side == 0)
        l_idx = np.flatnonzero(side == 1)
        if len(r_idx) == 0 or len(l_idx) == 0:
            return empty
        rk, rlo = key_codes[r_idx], v[r_idx]
        r_ord = np.lexsort((rlo, rk))
        rk_s, rlo_s = rk[r_ord], rlo[r_ord]
        rlen_s = hi_i[r_idx][r_ord] - rlo_s
        seg_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(rk_s)) + 1])
        seg_keys = rk_s[seg_starts]
        seg_maxlen = np.maximum.reduceat(rlen_s, seg_starts)

        # rank-composite: equal values share a rank, so per-key
        # searchsorted bounds are exact across the whole bucket
        sv = np.sort(v)
        B = np.int64(n + 1)
        comp_right = rk_s * B + np.searchsorted(sv, rlo_s, side="left")

        lk, lt = key_codes[l_idx], v[l_idx]
        pos = np.searchsorted(seg_keys, lk)
        valid = pos < len(seg_keys)
        pos_c = np.minimum(pos, len(seg_keys) - 1)
        valid &= seg_keys[pos_c] == lk
        # upper bound: right rows with lo <= t in this key
        j_hi = np.searchsorted(
            comp_right, lk * B + np.searchsorted(sv, lt, side="left"),
            side="right")
        # lower bound: lo >= t - maxlen(key), clamped to the segment
        tl = lt - seg_maxlen[pos_c]
        j_lo = np.searchsorted(
            comp_right, lk * B + np.searchsorted(sv, tl, side="left"),
            side="left")
        j_lo = np.maximum(j_lo, seg_starts[pos_c])
        cnt = np.where(valid, np.maximum(j_hi - j_lo, 0), 0)
        total = int(cnt.sum())
        if total == 0:
            return empty
        row_rep = np.repeat(np.arange(len(l_idx), dtype=np.int64), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt[:-1])]).astype(np.int64)
        cand_pos = (np.arange(total, dtype=np.int64)
                    - np.repeat(offs, cnt) + np.repeat(j_lo, cnt))
        cand_r = r_idx[r_ord[cand_pos]]
        lrow = l_idx[row_rep]
        keep = hi_i[cand_r] >= v[lrow]
        lrow, cand_r = lrow[keep], cand_r[keep]
        cols = {}
        take_l = pa.array(lrow, type=pa.int64())
        take_r = pa.array(cand_r, type=pa.int64())
        for c in left_cols:
            cols[c] = t[c].combine_chunks().take(take_l)
        for c in right_cols:
            cols[r_out[c]] = t[r_out[c]].combine_chunks().take(take_r)
        return pa.table({c: cols[c] for c in out_cols})

    return unified.groupby("_ab").map_groups(merge, batch_format="pyarrow")


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


def ranked_gaps(ds, key_col: str = "user_id", ts_col: str = "ts",
                tie_col: str | None = None, keep: list[str] | None = None,
                n_buckets: int | None = None):
    """Per-key window functions without per-key Python: ROW_NUMBER()
    OVER (PARTITION BY key ORDER BY ts[, tie]) and the LAG gap to the
    previous row's ts (null on each key's first row), the two
    primitives sessionization/feature pipelines reach for first.

    Scale shape (same as session_windows): one hash shuffle into
    ~2x-CPU coarse buckets co-locates each key's rows; inside a bucket
    one arrow sort + segment arithmetic computes every key's ranks and
    gaps at once — Python cost is O(buckets), not O(keys). ``tie_col``
    makes the in-key order (and thus ranks) deterministic under ts
    ties. Returns keep + rn (int64, 1-based) + gap_us (int64 epoch
    microseconds, null at key starts)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import hash_column

    if keep is None:
        keep = [key_col, ts_col]
    if n_buckets is None:
        import ray

        avail = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(8, 2 * avail)
    out_cols = list(keep) + ["rn", "gap_us"]

    def assign(batch: pa.Table) -> pa.Table:
        b = (hash_column(batch[key_col]) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("_rb", pa.array(b))

    def rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {c: t[c] for c in keep if c in t.column_names}
            cols["rn"] = pa.array([], type=pa.int64())
            cols["gap_us"] = pa.array([], type=pa.int64())
            return pa.table(cols) if len(cols) == len(out_cols) \
                else pa.table({})
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if tie_col is not None:
            sort_keys.append((tie_col, "ascending"))
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        keys = t[key_col].combine_chunks()
        kc = keys if pa.types.is_dictionary(keys.type) \
            else pc.dictionary_encode(keys)
        codes = kc.indices.to_numpy(zero_copy_only=False)
        ts = t[ts_col].combine_chunks()
        ts_i = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(codes)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.concatenate([starts, [n]]))
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, lens) + 1
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = ts_i[1:] - ts_i[:-1]
        gap[0] = 0
        cols = {c: t[c] for c in keep}
        cols["rn"] = pa.array(rn)
        # LAG over each key's first row is null
        cols["gap_us"] = pc.if_else(pa.array(~new_key), pa.array(gap),
                                    pa.scalar(None, type=pa.int64()))
        return pa.table({c: cols[c] for c in out_cols})

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("_rb")
            .map_groups(rank, batch_format="pyarrow"))


def frame_aggs(ds, key_col: str = "user_id", ts_col: str = "ts",
               val_col: str = "value", tie_col: str | None = None,
               keep: list[str] | None = None, window: int = 4,
               n_buckets: int | None = None):
    """Per-key window FRAME aggregates, vectorized: running_sum (SUM
    OVER ... ROWS UNBOUNDED PRECEDING) and moving_avg (AVG OVER the
    last ``window`` rows incl. current) for each row, ordered by
    (ts[, tie]) within the key.

    Same scale shape as ranked_gaps: one hash shuffle into coarse
    buckets, then ONE pass per bucket — key-segment cumulative sums
    with segment reset, and the moving window from cumsum differences
    clamped at segment starts. Python cost O(buckets)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import hash_column

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if keep is None:
        keep = [key_col, ts_col, val_col]
    if n_buckets is None:
        import ray

        avail = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(8, 2 * avail)
    out_cols = list(keep) + ["running_sum", "moving_avg"]

    def assign(batch: pa.Table) -> pa.Table:
        b = (hash_column(batch[key_col]) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("_fb", pa.array(b))

    def frames(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {c: t[c] for c in keep if c in t.column_names}
            cols["running_sum"] = pa.array([], type=pa.float64())
            cols["moving_avg"] = pa.array([], type=pa.float64())
            return pa.table(cols) if len(cols) == len(out_cols) \
                else pa.table({})
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if tie_col is not None:
            sort_keys.append((tie_col, "ascending"))
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        keys = t[key_col].combine_chunks()
        kc = keys if pa.types.is_dictionary(keys.type) \
            else pc.dictionary_encode(keys)
        codes = kc.indices.to_numpy(zero_copy_only=False)
        v = t[val_col].combine_chunks().cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        n = len(codes)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.concatenate([starts, [n]]))
        seg_start = np.repeat(starts, lens)  # each row's segment start
        # prefix[i] = sum of v[:i]; per-key running sum by subtracting
        # the prefix at the segment start
        prefix = np.concatenate([[0.0], np.cumsum(v)])
        running = prefix[1:] - prefix[seg_start]
        # moving window of the last `window` rows, clamped to the
        # segment start
        idx = np.arange(n, dtype=np.int64)
        w_lo = np.maximum(idx - window + 1, seg_start)
        w_n = idx - w_lo + 1
        moving = (prefix[idx + 1] - prefix[w_lo]) / w_n
        cols = {c: t[c] for c in keep}
        cols["running_sum"] = pa.array(running, type=pa.float64())
        cols["moving_avg"] = pa.array(moving, type=pa.float64())
        return pa.table({c: cols[c] for c in out_cols})

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("_fb")
            .map_groups(frames, batch_format="pyarrow"))
