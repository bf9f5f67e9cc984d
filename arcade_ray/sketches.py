"""Mergeable distinct-count sketches (KMV — k minimum values).

The reference's bloom-filter overlap detector (src/writer.cpp:267-284,
dead code — SURVEY.md §1.3) intended to measure cross-block value
overlap to justify shared dictionaries. Our live equivalent: every
encoded chunk records a KMV sketch of its value hashes; sketches merge
across chunks/partitions (manifest col_stats), giving distinct
estimates and overlap estimates for planning without a distinct
shuffle. (Cardinality-sketch idea per PAPERS.md Couper/ICDE'23 lineage;
KMV is the classic bottom-k estimator.)
"""

from __future__ import annotations

import numpy as np

DEFAULT_K = 256
# the k the COLUMN ENCODERS build manifest sketches with — estimates
# and merges over manifest col_stats sketches must use this k (a
# larger k treats a full 64-entry sketch as underfull and returns 64)
MANIFEST_K = 64
_MAX = float(2**64)


def kmv_from_hashes(hashes: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    """Bottom-k of uint64 hashes, sorted ascending (np.unique sorts)."""
    h = np.unique(np.asarray(hashes, dtype=np.uint64))
    return h[:k].copy() if len(h) > k else h


def kmv_merge(a: np.ndarray, b: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    return kmv_from_hashes(np.concatenate([a, b]), k)


def kmv_estimate(sketch: np.ndarray, k: int = DEFAULT_K) -> int:
    """Distinct-count estimate: (k-1) / max_normalized for a full
    sketch; exact count when fewer than k hashes were seen."""
    n = len(sketch)
    if n < k:
        return n
    kth = float(sketch[-1])
    return int(round((k - 1) / (kth / _MAX)))


def kmv_overlap(a: np.ndarray, b: np.ndarray, k: int = DEFAULT_K) -> float:
    """Jaccard estimate between two sketched sets (the reference's
    20%-overlap shared-dict test, done with mergeable sketches)."""
    if not len(a) or not len(b):
        return 0.0
    union = kmv_merge(a, b, k)
    inter = np.intersect1d(union, np.intersect1d(a, b))
    return len(inter) / max(1, len(union))


def serialize(sketch: np.ndarray) -> list[int]:
    """JSON-safe form (int64 view for manifest col_stats)."""
    return sketch.view(np.int64).tolist()


def deserialize(vals: list[int]) -> np.ndarray:
    return np.asarray(vals, dtype=np.int64).view(np.uint64)


# --- partition Bloom filters (manifest-level point-lookup pruning) ----------
# Zone maps cannot prune equality on high-cardinality columns whose
# per-partition [min, max] ranges all overlap (e.g. doc ids spread
# round-robin). A small per-partition Bloom filter over the SAME value
# hashes the KMV sketches consume gives "definitely not here" at the
# manifest, so a point lookup touches ~1 partition instead of all of
# them. Partition pruning tolerates false positives (a wasted read),
# so 6 bits/key + 3 probes (~9% FPR) is the right trade; columns whose
# distinct count exceeds BLOOM_MAX_DISTINCT store no filter (FPR would
# approach 1 anyway). Realizes the reference's dead bloom intent
# (src/writer.cpp:267-284) at the layout level where it pays.

BLOOM_MAX_DISTINCT = 32768
BLOOM_BITS_PER_KEY = 6
BLOOM_K = 3


def _bloom_positions(h: np.ndarray, m: int) -> list[np.ndarray]:
    """Double hashing (Kirsch-Mitzenmacher): k probe positions derived
    from one 64-bit hash. Identical arithmetic on build and probe."""
    h1 = (h >> np.uint64(32)).astype(np.uint64)
    h2 = ((h | np.uint64(1)) & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    return [((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            for i in range(BLOOM_K)]


def bloom_build(hashes: np.ndarray) -> dict | None:
    """Bitmap over distinct value hashes -> JSON-able manifest entry
    ``{"b": base64(zlib(bits)), "m": bits}``, or None when the column
    is too wide to filter usefully."""
    import base64
    import zlib

    u = np.unique(np.asarray(hashes, dtype=np.uint64))
    if len(u) == 0 or len(u) > BLOOM_MAX_DISTINCT:
        return None
    m = 1 << max(9, int(np.ceil(np.log2(len(u) * BLOOM_BITS_PER_KEY))))
    bits = np.zeros(m // 8, dtype=np.uint8)
    for pos in _bloom_positions(u, m):
        np.bitwise_or.at(bits, pos >> 3,
                         (np.uint8(1) << (pos & 7).astype(np.uint8)))
    return {"b": base64.b64encode(zlib.compress(bits.tobytes(), 6)).decode(),
            "m": m}


def bloom_maybe_contains(bloom: dict, h: int) -> bool:
    """False -> the value is DEFINITELY absent from the partition."""
    import base64
    import zlib

    bits = np.frombuffer(zlib.decompress(base64.b64decode(bloom["b"])),
                         dtype=np.uint8)
    m = int(bloom["m"])
    for pos in _bloom_positions(np.array([h], dtype=np.uint64), m):
        p = int(pos[0])
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True
