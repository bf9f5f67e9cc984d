"""Planted-answer tests for the token-sequence operator family
(arcade_ray/tokenops.py) — pre-tokenized list<int32> columns."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from arcade_ray.collect import collect_arrow
from arcade_ray.tokenops import (batch_token_ngram_hashes,
                                 decontaminate_tokens, remap_tokens,
                                 token_contaminated_ids,
                                 token_repetition_stats,
                                 token_unigram_stats)


def _ds(rows, ids=None):
    ids = ids if ids is not None else list(range(len(rows)))
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "tokens": pa.array(rows, type=pa.list_(pa.int32()))}))


def test_ngram_hashes_boundaries(ray_session):
    col = pa.array([[1, 2, 3], [2, 3], [7], []],
                   type=pa.list_(pa.int32()))
    h, doc = batch_token_ngram_hashes(col, 2)
    # doc0 has bigrams (1,2),(2,3); doc1 has (2,3); doc2/3 none
    assert doc.tolist() == [0, 0, 1]
    # the (2,3) bigram hashes identically across documents
    assert h[1] == h[2] and h[0] != h[1]
    h3, doc3 = batch_token_ngram_hashes(col, 3)
    assert doc3.tolist() == [0]
    # n=1 is the splitmix of each token
    h1, doc1 = batch_token_ngram_hashes(col, 1)
    assert doc1.tolist() == [0, 0, 0, 1, 1, 2]


def test_unigram_stats(ray_session):
    ds = _ds([[1, 2, 2], [2, 3], [], [3, 2]])
    t = token_unigram_stats(ds)
    assert t.to_pylist() == [
        {"token": 2, "n": 4}, {"token": 3, "n": 2}, {"token": 1, "n": 1}]
    assert t["token"].type == pa.int32() and t["n"].type == pa.int64()
    top = token_unigram_stats(ds, top_k=1)
    assert top.to_pylist() == [{"token": 2, "n": 4}]
    empty = token_unigram_stats(_ds([]))
    assert empty.num_rows == 0 and empty.column_names == ["token", "n"]


def test_contamination_and_filter(ray_session):
    train = _ds([[1, 2, 3, 4], [9, 9, 9], [5, 2, 3, 4], [7, 8]],
                ids=[10, 11, 12, 13])
    ev = _ds([[2, 3, 4], [100, 101, 102]], ids=[0, 1])
    bad = collect_arrow(token_contaminated_ids(train, ev, n=3))
    assert sorted(bad["doc_id"].to_pylist()) == [10, 12]
    kept = collect_arrow(decontaminate_tokens(train, ev, n=3))
    assert sorted(kept["doc_id"].to_pylist()) == [11, 13]
    assert kept.column_names == ["doc_id", "tokens"]
    # empty eval: nothing drops
    kept_all = collect_arrow(decontaminate_tokens(train, _ds([]), n=3))
    assert kept_all.num_rows == 4


def test_repetition_stats(ray_session):
    # doc0: bigrams (1,2),(2,1),(1,2) -> 3 grams, 2 unique
    # doc1: all distinct; doc2: < n tokens -> 0 grams
    ds = _ds([[1, 2, 1, 2], [4, 5, 6], [9]])
    t = collect_arrow(token_repetition_stats(ds, n=2)) \
        .sort_by("doc_id")
    assert t["n_grams"].to_pylist() == [3, 2, 0]
    assert t["n_unique"].to_pylist() == [2, 2, 0]
    assert t["dup_frac"].to_pylist() == [0.3333, 0.0, 0.0]


def test_remap_tokens(ray_session):
    ds = _ds([[1, 2, 3], [], [3, 7]])
    mapping = pa.table({"old": pa.array([1, 3], pa.int32()),
                        "new": pa.array([11, 33], pa.int32())})
    out = collect_arrow(remap_tokens(ds, mapping, unk=0)) \
        .sort_by("doc_id")
    assert out["tokens"].to_pylist() == [[11, 0, 33], [], [33, 0]]
    assert out["tokens"].type.value_type == pa.int32()
    # duplicate old ids refuse
    dup = pa.table({"old": pa.array([1, 1], pa.int32()),
                    "new": pa.array([2, 3], pa.int32())})
    with pytest.raises(ValueError, match="duplicate"):
        remap_tokens(ds, dup)


def test_remap_empty_mapping(ray_session):
    ds = _ds([[5, 6]])
    empty = pa.table({"old": pa.array([], pa.int32()),
                      "new": pa.array([], pa.int32())})
    out = collect_arrow(remap_tokens(ds, empty, unk=-1))
    assert out["tokens"].to_pylist() == [[-1, -1]]


def test_token_minhash_pairs_planted(ray_session):
    rng = np.random.default_rng(3)
    base = rng.integers(0, 1000, 400).astype(np.int32).tolist()
    near = list(base)
    near[7] = 9999  # one token differs -> trigram jaccard ~ (n-3)/n
    far = rng.integers(0, 1000, 400).astype(np.int32).tolist()
    short = [1, 2]  # no trigrams: must not crash or pair
    ds = _ds([base, near, far, short, list(base)],
             ids=[1, 2, 3, 4, 5])
    from arcade_ray.tokenops import token_minhash_pairs

    out = token_minhash_pairs(ds, jaccard_threshold=0.7, ngram=3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in out.to_pylist()}
    assert (1, 5) in got and got[(1, 5)] == 1.0
    assert (1, 2) in got and 0.9 < got[(1, 2)] < 1.0
    assert (2, 5) in got
    assert all(3 not in k and 4 not in k for k in got)


def test_token_minhash_signature_consistency(ray_session):
    # the same sequence produces the same signature regardless of
    # batch packing (block-boundary invariance)
    from arcade_ray.tokenops import batch_token_minhash_signatures

    seq = list(range(50))
    col1 = pa.array([seq, [9, 9]], type=pa.list_(pa.int32()))
    col2 = pa.array([[5, 5, 5, 5], seq], type=pa.list_(pa.int32()))
    s1, idx1 = batch_token_minhash_signatures(col1, ngram=3)
    s2, idx2 = batch_token_minhash_signatures(col2, ngram=3)
    assert idx1.tolist() == [0] and idx2.tolist() == [0, 1]
    assert (s1[0] == s2[1]).all()


def test_token_novelty_stats(ray_session):
    from arcade_ray.tokenops import token_novelty_stats

    # corpus counts: 1 -> 3, 2 -> 2, 7 -> 1
    ds = _ds([[1, 1, 2], [2, 1], [], [7]])
    t = collect_arrow(token_novelty_stats(ds)).sort_by("doc_id")
    assert t["n_tokens"].to_pylist() == [3, 2, 0, 1]
    # doc0: 3+3+2=8, doc1: 2+3=5, doc2: 0, doc3: 1
    assert t["freq_sum"].to_pylist() == [8, 5, 0, 1]
    assert t["mean_logfreq"].to_pylist()[2] == 0.0
    assert t["mean_logfreq"].to_pylist()[3] == 0.0  # ln(1) = 0
    # precomputed counts short-circuit the extra pass
    pre = pa.table({"token": pa.array([1, 2, 7], pa.int32()),
                    "n": pa.array([3, 2, 1], pa.int64())})
    t2 = collect_arrow(token_novelty_stats(ds, counts=pre)) \
        .sort_by("doc_id")
    assert t2["freq_sum"].to_pylist() == [8, 5, 0, 1]
