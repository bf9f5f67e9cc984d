"""Deterministic vectorized hashes for bucketing and fingerprints.

Stable across runs and processes (pure arithmetic, no PYTHONHASHSEED),
which is what makes hash-bucketed partition keys resumable
(SURVEY.md §4.2 "checkpoint/resume").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# bump when hash OUTPUTS change (v2: splitmix64-avalanched string
# hashes + empty-string fix). Persisted artifacts derived from
# hashes (manifest Bloom filters, dedup signature indexes) are
# stamped with this and refuse/skip when it does not match —
# probing a v1 Bloom with v2 hashes would silently mis-prune.
HASH_VERSION = 2

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_FNV = np.uint64(0x100000001B3)
_SEED = np.uint64(0x9E3779B97F4A7C15)


def hash_ints(vals: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over int64/uint64 values."""
    z = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64) + _SEED
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_strings(lengths: np.ndarray, data: bytes,
                 base: int = 31) -> np.ndarray:
    """Vectorized polynomial hash (mod 2^64) per string. Two calls with
    different odd ``base`` values give (near-)independent 64-bit hashes
    — combined they form the 128-bit content identity used by exact
    dedup (collision odds ~2^-64 per pair)."""
    n = len(lengths)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        sums = np.zeros(n, dtype=np.uint64)
    else:
        bytes_u = np.frombuffer(data, dtype=np.uint8,
                                count=total).astype(np.uint64)
        # local position of each byte within its string
        starts = offsets[:-1]
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
        max_len = int(lengths.max())
        pow31 = np.empty(max_len, dtype=np.uint64)
        pow31[0] = 1
        np.multiply.accumulate(np.full(max_len - 1, base, dtype=np.uint64),
                               out=pow31[1:])
        weights = pow31[local]
        terms = bytes_u * weights
        # reduceat: pad so an empty string at the end doesn't index
        # OOB; rows with start==end get a bogus terms[start] —
        # overwritten below.
        terms_p = np.append(terms, np.uint64(0))
        safe_starts = np.minimum(starts, total)
        sums = np.add.reduceat(terms_p, safe_starts)
        empty = lengths == 0
        if empty.any():
            sums = np.where(empty, np.uint64(0), sums)
    # splitmix64 avalanche over the polynomial sum: poly-31 of short
    # sequential ids ("d0001", "d0002"...) is near-linear in the
    # suffix, and a bare multiply leaves the output badly non-uniform
    # — measured 58% KMV error at 2000 distincts. The finalizer
    # restores uniform bottom-k order statistics (and balanced hash
    # buckets) without changing the collision contract. The +1 in the
    # sum term keeps an EMPTY string (sums==0, length==0) from
    # self-cancelling to 0 — and every batch shape (all-empty vs
    # mixed) goes through this ONE expression, so a value's hash never
    # depends on what else shared its batch.
    return hash_ints((sums * _FNV + np.uint64(1)).view(np.int64)) \
        ^ hash_ints(lengths)


def hash_column(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Hash any supported id column (string or integer)."""
    from .streams import int_stream_from_arrow, str_stream_from_arrow

    t = arr.type if isinstance(arr, pa.Array) else arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        lengths, data, _ = str_stream_from_arrow(arr)
        return hash_strings(lengths, data)
    vals, _ = int_stream_from_arrow(arr)
    return hash_ints(vals)
