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
