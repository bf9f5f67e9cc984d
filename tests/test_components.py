"""Distributed connected components (components.py) vs a reference
union-find, plus the near_dedup driver-boundedness contract."""

import numpy as np
import pyarrow as pa
import pytest

from arcade_ray.components import distributed_components


def _ref_losers(edges) -> list[int]:
    """Reference union-by-min-id union-find (the old driver-side
    near_dedup clustering, kept here as the oracle)."""
    parent: dict[int, int] = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted(x for x in parent if find(x) != x)


def _as_refs(edges, n_frags):
    """Split an edge list into n_frags Arrow-table object refs."""
    import ray

    frags = [[] for _ in range(n_frags)]
    for i, e in enumerate(edges):
        frags[i % n_frags].append(e)
    refs = []
    for f in frags:
        a = [e[0] for e in f]
        b = [e[1] for e in f]
        refs.append(ray.put(pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "jaccard": pa.array([1.0] * len(a), pa.float64()),
        })))
    return refs


def test_components_empty(ray_session):
    assert len(distributed_components([])) == 0
    assert len(distributed_components(_as_refs([], 3))) == 0


def test_components_basic(ray_session):
    # two triangles + an isolated pair; min ids 1, 10, 100 survive
    edges = [(2, 1), (2, 3), (1, 3), (10, 11), (11, 12), (100, 101)]
    got = distributed_components(_as_refs(edges, 2), n_parts=4)
    assert got.tolist() == _ref_losers(edges) == [2, 3, 11, 12, 101]


def test_components_long_chain(ray_session):
    """A 400-node path (worst case for plain propagation: diameter =
    n). Pointer jumping must converge well inside MAX_ROUNDS."""
    ids = np.random.RandomState(3).permutation(10_000)[:400]
    edges = list(zip(ids[:-1].tolist(), ids[1:].tolist()))
    got = distributed_components(_as_refs(edges, 7), n_parts=5)
    assert got.tolist() == _ref_losers(edges)
    assert len(got) == 399  # one survivor: the min id


def test_components_fuzz_random_graphs(ray_session):
    rng = np.random.RandomState(17)
    for trial in range(6):
        n = rng.randint(2, 300)
        m = rng.randint(1, 600)
        edges = [(int(a), int(b)) for a, b in
                 rng.randint(0, 5 * n, size=(m, 2)) if a != b]
        if not edges:
            continue
        got = distributed_components(
            _as_refs(edges, rng.randint(1, 6)),
            n_parts=int(rng.randint(1, 9)))
        assert got.tolist() == _ref_losers(edges), (trial, edges[:10])


def test_components_mega_cluster(ray_session):
    """A planted 3000-node mega-cluster (star + random chords — the
    template-heavy-corpus shape that blew up the driver design)."""
    rng = np.random.RandomState(5)
    nodes = np.arange(1000, 4000)
    edges = list(zip([int(nodes.min())] * (len(nodes) - 1),
                     nodes[1:].tolist()))
    chord = rng.choice(nodes, size=(2000, 2))
    edges += [(int(a), int(b)) for a, b in chord if a != b]
    got = distributed_components(_as_refs(edges, 11), n_parts=8)
    assert got.tolist() == _ref_losers(edges)
    assert len(got) == len(nodes) - 1


def test_near_dedup_never_concatenates_pairs_on_driver(
        ray_session, monkeypatch):
    """near_dedup must get its pairs as object-store fragments end to
    end: force the scale path (SMALL_SIG_ROWS=0) and poison every
    driver-side materialization (collect_arrow AND the driver-side
    candidate generator), then assert the planted near-dup corpus
    still dedups correctly."""
    import ray.data as rd

    from arcade_ray import collect, textops

    def poisoned(*a, **k):
        raise AssertionError("pair list materialized on the driver")

    real_collect = collect.collect_arrow

    def pair_guarded(ds):
        t = real_collect(ds)
        assert not {"id_a", "id_b"} <= set(t.column_names), \
            "pair table collected on the driver"
        return t

    monkeypatch.setattr(collect, "SMALL_SIG_ROWS", 0)
    monkeypatch.setattr(collect, "collect_arrow", pair_guarded)
    monkeypatch.setattr(collect, "bucket_candidate_pairs", poisoned)

    import random
    import string

    rng = random.Random(23)
    base_a = ("the quick brown fox jumps over the lazy dog again and again "
              "while the weather stays warm and the river runs low ")
    base_b = ("import numpy as np ; def frobnicate ( xs ) : return sorted "
              "( set ( xs ) , key = lambda v : ( v % 7 , v ) ) [ : 40 ] ")
    docs = [(i, base_a + f"tail {i}") for i in range(0, 20)]
    docs += [(i, base_b + f"tail {i}") for i in range(20, 40)]
    docs += [(i, "".join(rng.choice(string.ascii_lowercase + " ")
                         for _ in range(200)))
             for i in range(40, 60)]
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": pa.array([d[1] for d in docs])})
    out = textops.near_dedup(rd.from_arrow(t), jaccard_threshold=0.7)
    kept = sorted(r["doc_id"] for r in out.take_all())
    # each template cluster collapses to its min id (0 and 20); the 20
    # random-soup docs all survive
    assert kept == [0, 20] + list(range(40, 60))
