"""Regressions for round-1 review findings (VERDICT.md / ADVICE.md):

- manifest-level zone-map pruning on float columns compared IEEE-754
  bit patterns against the value-domain literal and silently pruned
  every partition (ADVICE high #1);
- partition col_stats aggregated min/max over only the chunks that HAD
  zone values, so one long (>MAX_ZONE_STR) string made the manifest
  bounds wrongly tight and equi_filter pruned matching rows (ADVICE
  high #2);
- collect over groupby/map_groups output crashed on Ray's schemaless
  zero-row blocks (VERDICT "What's wrong" #1).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from arcade_ray.collect import collect_arrow
from arcade_ray.column import MAX_ZONE_STR
from arcade_ray.pipeline import encode_dataset
from arcade_ray.pipeline.query import equi_filter, lookup, range_filter


def _encode(tmp_path, table, key_col="source", id_col="doc_id",
            weight_col=None):
    import ray.data as rd

    out = str(tmp_path / "enc")
    encode_dataset(rd.from_arrow(table), out, key_col=key_col,
                   id_col=id_col, weight_col=weight_col)
    return out


@pytest.fixture(scope="module")
def float_encoded(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("floatzone")
    n = 4000
    table = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
        "score": pa.array(np.linspace(0.1, 10.0, n - 1).tolist() + [1.5],
                          type=pa.float64()),
    })
    return _encode(base, table), table


def test_float_equi_filter_not_pruned(float_encoded):
    out_dir, table = float_encoded
    got = collect_arrow(
        equi_filter(out_dir, "score", 1.5, project=["doc_id", "score"]))
    expect = table.filter(pc.equal(table["score"], 1.5))
    assert got.num_rows == expect.num_rows > 0
    assert set(got["doc_id"].to_pylist()) == set(expect["doc_id"].to_pylist())


def test_float_range_filter_not_pruned(float_encoded):
    out_dir, table = float_encoded
    got = collect_arrow(
        range_filter(out_dir, "score", 2.0, 3.0, project=["doc_id", "score"]))
    mask = pc.and_(pc.greater_equal(table["score"], 2.0),
                   pc.less_equal(table["score"], 3.0))
    expect = table.filter(mask)
    assert got.num_rows == expect.num_rows > 0


def test_float_lookup_not_pruned(float_encoded):
    out_dir, table = float_encoded
    got = collect_arrow(
        lookup(out_dir, "score", [1.5], columns=["doc_id", "score"]))
    expect = table.filter(pc.equal(table["score"], 1.5))
    assert got.num_rows == expect.num_rows > 0


def test_long_string_unbounds_partition_stats(ray_session, tmp_path,
                                              monkeypatch):
    """A chunk whose max is a >MAX_ZONE_STR string has no zone values;
    the partition's manifest bounds must become None (unbounded), not
    the bounds of the short-string chunks — otherwise equi_filter on a
    value above those bounds wrongly prunes the partition."""
    import json
    import os

    import arcade_ray.format as fmt
    from arcade_ray.pipeline.encode import (
        MANIFEST_DIR,
        PARTS_DIR,
        commit_partition,
        load_manifest,
    )

    orig = fmt.chunk_boundaries
    monkeypatch.setattr(
        fmt, "chunk_boundaries",
        lambda t, rows_per_chunk=10, values_per_chunk=fmt.DEFAULT_VALUES_PER_CHUNK:
        orig(t, 10, values_per_chunk),
    )
    long_str = "z" * (MAX_ZONE_STR + 64)  # sorts above 'zz' -> chunk max
    vals = [f"m{i:05d}" for i in range(10)] + ["zz", long_str]
    n = len(vals)
    table = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "val": pa.array(vals),
    })
    out_dir = str(tmp_path / "enc")
    os.makedirs(os.path.join(out_dir, PARTS_DIR))
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR))
    blob, row = fmt.encode_partition(table, "p0")
    commit_partition(out_dir, "p0", blob, row)

    m = load_manifest(out_dir)
    stats = json.loads(m["col_stats"][0].as_py())["val"]
    assert stats["min"] is None and stats["max"] is None

    got = collect_arrow(equi_filter(out_dir, "val", "zz",
                                    project=["doc_id", "val"]))
    assert got.num_rows == 1
    assert got["val"][0].as_py() == "zz"


def test_collect_arrow_tolerates_schemaless_empty_blocks(ray_session):
    """groupby().map_groups() emits zero-row, zero-column blocks; the
    collect helper must drop them instead of failing concat."""
    import pandas as pd
    import ray.data as rd

    ds = rd.from_items([{"k": i % 3, "v": i} for i in range(30)])
    out = ds.groupby("k").map_groups(
        lambda g: pd.DataFrame({"k": [g["k"].iloc[0]], "n": [len(g)]}),
        batch_format="pandas",
    )
    t = collect_arrow(out)
    assert t.num_rows == 3
    assert set(t.column_names) == {"k", "n"}


def test_range_fully_inside_shortcut_excludes_nulls(ray_session, tmp_path):
    """Round-2 review: null slots are zero-filled before zone stats, so
    the 'chunk fully inside the range' shortcut must not fire on
    null-bearing chunks (it returned NULL rows as matches)."""
    n = 50
    vals = [None if i % 10 == 0 else i for i in range(n)]
    table = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "source": pa.array(["s0"] * n),
        "v": pa.array(vals, type=pa.int64()),
    })
    out_dir = _encode(tmp_path, table)
    got = collect_arrow(range_filter(out_dir, "v", 0, 100,
                                     project=["doc_id", "v"]))
    expect = [i for i in range(n) if i % 10 != 0]
    assert sorted(got["doc_id"].to_pylist()) == expect
    assert got["v"].null_count == 0


def test_shuffle_join_left_alias(ray_session, tmp_path):
    """'left' must map to Ray's 'left_outer' instead of crashing."""
    import ray.data as rd

    from arcade_ray.pipeline.join import shuffle_join

    left = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                     "a": pa.array(["x", "y", "z"])})
    right = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                      "b": pa.array(["p", "q"])})
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    import ray.data as rd

    from arcade_ray.pipeline import encode_dataset

    encode_dataset(rd.from_arrow(left), l_dir, key_col="a", id_col="k",
                   weight_col=None)
    encode_dataset(rd.from_arrow(right), r_dir, key_col="b", id_col="k",
                   weight_col=None)
    out = collect_arrow(shuffle_join(l_dir, r_dir, "k", "k",
                                     ["k", "a"], ["b"], join_type="left"))
    assert out.num_rows == 3
    assert out.filter(pa.compute.is_null(out["b"])).num_rows == 1


# --- round-2 ADVICE fixes ---------------------------------------------------


def test_broadcast_join_rejects_unknown_how(ray_session, tmp_path):
    """ADVICE r2 #1: how='right' (or a typo) must error, not silently
    run left-outer semantics."""
    from arcade_ray.pipeline.join import broadcast_join

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "source": ["a", "b"],
                  "k": pa.array([1, 2], pa.int64())})
    enc = _encode(tmp_path, t)
    with pytest.raises(ValueError, match="how"):
        broadcast_join(enc, enc, "k", "k", ["doc_id"], ["source"],
                       how="right")


def test_topk_rows_duplicate_ids_raise(ray_session, tmp_path):
    """ADVICE r2 #2: non-unique id col makes the winner fetch
    unidentifiable — raise instead of returning >k misordered rows."""
    from arcade_ray.pipeline.query import topk_rows

    n = 100
    t = pa.table({
        "doc_id": pa.array([i // 2 for i in range(n)], pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(n)]),
        "score": pa.array(np.arange(n, dtype=np.int64)),
    })
    enc = _encode(tmp_path, t)
    with pytest.raises(ValueError, match="not unique"):
        topk_rows(enc, "score", k=5, id_col="doc_id",
                  columns=["doc_id", "score", "source"])


def test_sliding_windows_negative_timestamps(ray_session):
    """ADVICE r2 #3: pre-1970 timestamps must floor toward -inf in the
    sub-hour epoch-anchored path, not truncate toward zero."""
    import ray.data as rd

    from arcade_ray.windows import sliding_windows

    ts = pa.array([-10_000_000, -1, 0, 10_000_000],
                  type=pa.timestamp("us"))
    t = pa.table({"ts": ts, "v": pa.array([1, 2, 3, 4], pa.int64())})
    # 7s hop (does not divide a minute) forces the integer path
    out = collect_arrow(
        sliding_windows(rd.from_arrow(t), ts_col="ts", width_s=14.0,
                        hop_s=7.0, keep=["v"]))
    got = {(r["v"], r["w"].timestamp()) for r in out.to_pylist()}
    # row v=1 at t=-10s: windows starting at floor(-10/7)*7=-14 and -21
    assert (1, -14.0) in got and (1, -21.0) in got
    # row v=2 at t=-1us: windows at -7 and -14 (NOT 0: trunc-toward-zero bug)
    assert (2, -7.0) in got and (2, -14.0) in got
    assert (2, 0.0) not in got


def test_cli_compound_filter_bad_literal_exits_clean(ray_session, tmp_path,
                                                     capsys):
    """ADVICE r2 #4: --eq n_chars=abc exits with a message, no traceback."""
    from arcade_ray import cli

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "source": ["a", "b"],
                  "n_chars": pa.array([10, 20], pa.int64())})
    enc = _encode(tmp_path, t)
    with pytest.raises(SystemExit):
        cli.main(["compound-filter", enc, "--eq", "n_chars=abc"])


def test_exact_dedup_survives_hash_collision(ray_session, monkeypatch):
    """ADVICE r2 #5: colliding-but-different texts must all survive —
    the loser set is verified against actual text, not trusted to the
    polynomial hash pair. Forces a universal collision by stubbing the
    hash and checks only true duplicates drop."""
    import ray.data as rd

    from arcade_ray import textops

    def const_hash(lengths, data, base=31):
        return np.zeros(len(lengths), dtype=np.uint64)

    monkeypatch.setattr(textops, "hash_strings", const_hash)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["alpha", "beta", "alpha", "gamma", "beta"],
    })
    losers = textops.dedup_loser_ids(rd.from_arrow(t))
    assert losers["doc_id"].to_pylist() == [3, 5]
    kept = collect_arrow(textops.exact_dedup(rd.from_arrow(t)))
    assert sorted(kept["doc_id"].to_pylist()) == [1, 2, 4]


def test_dedup_incremental_batch_with_no_novel_rows(ray_session, tmp_path,
                                                    monkeypatch):
    """r4 dress-rehearsal find: a block whose doc_ids contain no
    multiple of 10 made ``plant``'s suffix literal ``pa.array([])``
    infer type null, killing binary_join_element_wise with
    (string, null, string). The literal is now explicitly typed; a
    3-doc corpus (ids 1..3 — no seen, no novel rows) must round-trip."""
    import importlib.util

    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha text", "beta text", "gamma text"],
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "documents.parquet")
    monkeypatch.setattr("arcade_ray.entry_queries.CACHE_ROOT",
                        str(tmp_path / "cache"))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.queries()["dedup_incremental"](str(sf))
    assert out.num_rows == 0  # no seen dupes, no novel rows planted
