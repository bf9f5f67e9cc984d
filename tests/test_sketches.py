"""KMV distinct sketches: estimation accuracy, merge, manifest wiring."""

import json

import numpy as np
import pytest

from arcade_ray.hashing import hash_ints
from arcade_ray.sketches import (
    deserialize,
    kmv_estimate,
    kmv_from_hashes,
    kmv_merge,
    kmv_overlap,
    serialize,
)


def test_exact_below_k():
    h = hash_ints(np.arange(100))
    sk = kmv_from_hashes(h, k=256)
    assert kmv_estimate(sk, 256) == 100


@pytest.mark.parametrize("n", [2000, 50_000, 500_000])
def test_estimate_accuracy(n):
    h = hash_ints(np.arange(n))
    sk = kmv_from_hashes(h, k=256)
    est = kmv_estimate(sk, 256)
    assert abs(est - n) / n < 0.2, (n, est)


def test_merge_equals_union():
    a = hash_ints(np.arange(0, 30_000))
    b = hash_ints(np.arange(15_000, 45_000))
    sk = kmv_merge(kmv_from_hashes(a, 256), kmv_from_hashes(b, 256), 256)
    est = kmv_estimate(sk, 256)
    assert abs(est - 45_000) / 45_000 < 0.2


def test_overlap():
    a = kmv_from_hashes(hash_ints(np.arange(0, 10_000)), 256)
    b = kmv_from_hashes(hash_ints(np.arange(5_000, 15_000)), 256)
    c = kmv_from_hashes(hash_ints(np.arange(50_000, 60_000)), 256)
    assert kmv_overlap(a, b, 256) > 0.15  # true jaccard = 1/3
    assert kmv_overlap(a, c, 256) < 0.05


def test_serialize_roundtrip():
    sk = kmv_from_hashes(hash_ints(np.arange(1000)), 64)
    assert (deserialize(serialize(sk)) == sk).all()


def test_manifest_carries_sketch(tmp_path):
    from arcade_ray.corpus import generate_corpus
    from arcade_ray.format import encode_partition

    table = generate_corpus(5000, 6, seed=2)
    _, manifest = encode_partition(table, "sk")
    stats = json.loads(manifest["col_stats"])
    assert stats["source"]["distinct_est"] == 6  # exact below k
    assert stats["doc_id"]["distinct_est"] == pytest.approx(5000, rel=0.25)
    assert len(stats["source"]["kmv"]) == 6
