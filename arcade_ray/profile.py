"""Per-stream profiling: the statistics the cost model consumes.

Mirrors the role of the reference's per-block distinct/diff counting and
min/max zone-map construction (src/writer.cpp:55-61, 91) — generalized
to run counts and value ranges so the wider codec palette (RLE, FoR,
bit-pack) can be costed (SURVEY.md §2.2, last paragraph).

Profiles cache the expensive intermediates (sorted uniques, run arrays)
so the chosen codec re-uses them instead of recomputing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class IntProfile:
    n: int
    vmin: int
    vmax: int
    n_distinct: int
    n_runs: int
    unique: np.ndarray          # sorted distinct values (int64)
    run_starts: np.ndarray      # indices where a new run begins (incl. 0)
    dmin: int | None = None     # min/max of successive diffs (None when
    dmax: int | None = None     # n < 2 or the span risks int64 overflow)

    @property
    def distinct_ratio(self) -> float:
        return self.n_distinct / self.n if self.n else 0.0


def profile_int(vals: np.ndarray) -> IntProfile:
    n = len(vals)
    if n == 0:
        return IntProfile(0, 0, 0, 0, 0, np.empty(0, np.int64), np.empty(0, np.int64))
    vmin, vmax = int(vals.min()), int(vals.max())
    span = vmax - vmin
    if span <= max(65536, 4 * n):
        # narrow range: distinct set via bincount — O(n + span), no sort
        counts = np.bincount((vals - vmin).astype(np.int64), minlength=span + 1)
        unique = (np.flatnonzero(counts) + vmin).astype(np.int64)
    else:
        unique = np.unique(vals)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(vals[1:], vals[:-1], out=change[1:])
    run_starts = np.flatnonzero(change)
    dmin = dmax = None
    if n >= 2 and span < (1 << 62):
        # diff stats for the delta codec; skipped when the span could
        # overflow int64 diffs (e.g. float64 bit patterns)
        d = np.diff(vals)
        dmin, dmax = int(d.min()), int(d.max())
    return IntProfile(
        n=n,
        vmin=vmin,
        vmax=vmax,
        n_distinct=len(unique),
        n_runs=len(run_starts),
        unique=unique,
        run_starts=run_starts,
        dmin=dmin,
        dmax=dmax,
    )


@dataclass
class StrProfile:
    n: int
    total_bytes: int
    max_len: int
    n_distinct: int
    n_runs: int
    # sorted distinct values as (lengths, data) plus, for code assignment,
    # the inverse mapping chunk value -> index in `unique` (int64).
    unique_lengths: np.ndarray
    unique_data: bytes
    codes: np.ndarray           # per-row index into the sorted distinct set
    distinct_bytes: int = field(default=0)

    @property
    def distinct_ratio(self) -> float:
        return self.n_distinct / self.n if self.n else 0.0


def profile_str(lengths: np.ndarray, data: bytes) -> StrProfile:
    """Profile a string stream. Uses Arrow's hash-based dictionary
    encoding (vectorized) to get distincts + per-row codes in one pass,
    then sorts the dictionary so it is range-prunable — mirroring the
    reference's sorted dictionaries (src/writer.cpp:57-58)."""
    import pyarrow.compute as pc

    from .streams import str_stream_to_arrow

    n = len(lengths)
    if n == 0:
        return StrProfile(0, 0, 0, 0, 0, np.empty(0, np.int64), b"",
                          np.empty(0, np.int64), 0)
    arr = str_stream_to_arrow(lengths, data, "bin")
    denc = arr.dictionary_encode()
    dict_arr = denc.dictionary
    raw_codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = pc.sort_indices(dict_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    sorted_dict = dict_arr.take(pa_array_i64(order))
    # remap: raw code -> rank in sorted dict
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    codes = rank[raw_codes]
    from .streams import str_stream_from_arrow

    u_lengths, u_data, _ = str_stream_from_arrow(sorted_dict)
    n_runs = int(np.count_nonzero(np.diff(codes)) + 1)
    return StrProfile(
        n=n,
        total_bytes=len(data),
        max_len=int(lengths.max()) if n else 0,
        n_distinct=len(order),
        n_runs=n_runs,
        unique_lengths=u_lengths,
        unique_data=u_data,
        codes=codes,
        distinct_bytes=len(u_data),
    )


def pa_array_i64(a: np.ndarray):
    import pyarrow as pa

    return pa.array(a, type=pa.int64())
