"""Regressions for round-4 ADVICE.md findings (all five):

1. build_minhash_index wrote meta.json FIRST and non-atomically — a
   crashed partial build left a probe-able 'valid' index and
   query_minhash_index silently returned no duplicates.
2. _write_schema_sidecar unconditionally unioned with the existing
   sidecar, so a full re-encode with a renamed/retyped column kept
   phantom fields visible to DESCRIBE / typed-empty scans forever.
3. _parse_merge_source balanced parens without honoring quoted
   strings, so a ')' inside a string literal in MERGE USING (subquery)
   mis-split the statement.
4. CREATE TABLE encoded straight into the target dir (non-replace), so
   a failed CREATE left a partial dir that blocked retry; and the OR
   REPLACE double-rename had no crash recovery.
5. MERGE with differing ON columns where the source ALREADY has a
   column named like the target key minted a duplicate column name and
   died later with an opaque pyarrow error.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arcade_ray.collect import collect_arrow
from arcade_ray.sql import SqlUnsupported, sql_query


def _docs_table(n=120):
    return pa.table({
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(n)]),
        "n_chars": pa.array([10 + i for i in range(n)], type=pa.int64()),
        "text": pa.array([f"document body number {i} padded text"
                          for i in range(n)]),
    })


# ---------------------------------------------------------------- 1


def test_minhash_index_partial_build_refuses(ray_session, tmp_path):
    import ray.data as rd

    from arcade_ray.textops import build_minhash_index, query_minhash_index

    t = _docs_table()
    idx = str(tmp_path / "mh_idx")
    ds = rd.from_arrow(t)
    build_minhash_index(ds, idx, n_shards=4)
    assert os.path.exists(os.path.join(idx, "meta.json"))
    # a complete index answers
    probe = rd.from_arrow(t.slice(0, 5))
    out = query_minhash_index(probe, idx)
    assert out.num_rows >= 5  # each probe doc matches itself

    # simulate a crash BEFORE the commit marker: meta.json absent
    os.remove(os.path.join(idx, "meta.json"))
    with pytest.raises(FileNotFoundError):
        query_minhash_index(probe, idx)

    # a rebuild over the partial leftovers succeeds and re-commits
    build_minhash_index(rd.from_arrow(t), idx, n_shards=4)
    out2 = query_minhash_index(probe, idx)
    assert out2.num_rows >= 5


def test_minhash_index_failed_build_leaves_no_marker(ray_session,
                                                     tmp_path):
    import ray.data as rd

    from arcade_ray.textops import build_minhash_index

    idx = str(tmp_path / "mh_bad")
    bad = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                    "other": pa.array(["a", "b"])})
    with pytest.raises(Exception):
        build_minhash_index(rd.from_arrow(bad), idx)  # no text col
    assert not os.path.exists(os.path.join(idx, "meta.json"))


# ---------------------------------------------------------------- 2


def test_schema_sidecar_replaced_on_fresh_reencode(ray_session, tmp_path):
    import ray.data as rd

    from arcade_ray.pipeline.encode import (encode_dataset,
                                            read_schema_sidecar)

    out = str(tmp_path / "enc")
    t1 = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["a", "b", "a"]),
        "old_col": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
    })
    encode_dataset(rd.from_arrow(t1), out, key_col="source",
                   id_col="doc_id", weight_col=None)
    assert "old_col" in read_schema_sidecar(out).names

    # full re-encode (resume=False — the fresh-base path) with old_col
    # renamed: the phantom field must be gone from the sidecar
    t2 = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["a", "b", "a"]),
        "new_col": pa.array([1, 2, 3], type=pa.int64()),
    })
    encode_dataset(rd.from_arrow(t2), out, key_col="source",
                   id_col="doc_id", weight_col=None, resume=False)
    sch = read_schema_sidecar(out)
    assert "new_col" in sch.names and "old_col" not in sch.names

    # generation append still UNIONS (a column subset must not shrink
    # the visible schema)
    t3 = pa.table({
        "doc_id": pa.array([10], type=pa.int64()),
        "source": pa.array(["c"]),
        "extra": pa.array(["x"]),
    })
    encode_dataset(rd.from_arrow(t3), out, key_col="source",
                   id_col="doc_id", weight_col=None, generation="gen1")
    sch = read_schema_sidecar(out)
    assert {"new_col", "extra"} <= set(sch.names)


# ---------------------------------------------------------------- 3


def test_merge_using_subquery_with_paren_in_literal(ray_session,
                                                    tmp_path):
    from arcade_ray.pipeline.encode import encode_parquet

    t = _docs_table(50)
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_parquet(p, out, key_col="source", id_col="doc_id",
                   weight_col=None)
    tb = {"docs": out}
    r = sql_query(
        "MERGE INTO docs USING (SELECT doc_id, 'x)y' AS text "
        "FROM docs WHERE doc_id < 3) u ON docs.doc_id = u.doc_id "
        "WHEN MATCHED THEN UPDATE SET text = u.text", tb)
    assert r.to_pylist()[0]["rows_updated"] == 3
    got = sql_query("SELECT text FROM docs WHERE doc_id = 1", tb)
    got = got if isinstance(got, pa.Table) else collect_arrow(got)
    assert got["text"].to_pylist() == ["x)y"]


# ---------------------------------------------------------------- 4


def test_failed_plain_create_does_not_block_retry(ray_session, tmp_path):
    t = _docs_table(30)
    tb = {"docs": t}
    ws = str(tmp_path / "ws")
    os.makedirs(ws)
    # PARTITION BY a column the body doesn't produce -> encode fails
    # mid-build; the target dir must NOT exist afterwards
    with pytest.raises(Exception):
        sql_query("CREATE TABLE t2 PARTITION BY (nope) AS "
                  "SELECT * FROM docs", tb, workspace=ws)
    assert not os.path.exists(os.path.join(ws, "t2"))
    # retry WITHOUT OR REPLACE succeeds
    r = sql_query("CREATE TABLE t2 PARTITION BY (source, doc_id) AS "
                  "SELECT * FROM docs", tb, workspace=ws)
    assert r.to_pylist()[0]["rows"] == 30


def test_create_recovers_from_crashed_swap(ray_session, tmp_path):
    t = _docs_table(30)
    tb = {"docs": t}
    ws = str(tmp_path / "ws")
    os.makedirs(ws)
    sql_query("CREATE TABLE t3 PARTITION BY (source, doc_id) AS "
              "SELECT * FROM docs", tb, workspace=ws)
    out = os.path.join(ws, "t3")
    # simulate a crash between the two OR REPLACE renames: the table
    # dir is missing, only the .old survivor remains
    os.rename(out, out + ".old.999")
    # plus an orphaned half-built side dir from the crashed build
    os.makedirs(out + ".building.998")
    # recovery on entry restores the survivor, so plain CREATE sees an
    # existing table and refuses (the data was NOT lost)
    with pytest.raises(ValueError, match="already exists"):
        sql_query("CREATE TABLE t3 PARTITION BY (source, doc_id) AS "
                  "SELECT * FROM docs", tb, workspace=ws)
    assert os.path.isdir(out)
    assert not os.path.isdir(out + ".building.998")
    got = sql_query("SELECT COUNT(*) AS n FROM t3", tb, workspace=ws)
    got = got if isinstance(got, pa.Table) else collect_arrow(got)
    assert got["n"][0].as_py() == 30
    # and OR REPLACE over the recovered table still works
    r = sql_query("CREATE OR REPLACE TABLE t3 PARTITION BY "
                  "(source, doc_id) AS SELECT * FROM docs "
                  "WHERE doc_id < 10", tb, workspace=ws)
    assert r.to_pylist()[0]["rows"] == 10
    assert not any(d.startswith("t3.old") or d.startswith("t3.building")
                   for d in os.listdir(ws))


# ---------------------------------------------------------------- 5


def test_merge_key_rename_collision_refuses_clearly(ray_session,
                                                    tmp_path):
    from arcade_ray.pipeline.encode import encode_parquet

    t = _docs_table(20)
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_parquet(p, out, key_col="source", id_col="doc_id",
                   weight_col=None)
    # source has BOTH its join key (sid) and a column already named
    # like the target key (doc_id)
    src = pa.table({
        "sid": pa.array([1, 2], type=pa.int64()),
        "doc_id": pa.array([91, 92], type=pa.int64()),
        "n_chars": pa.array([1, 2], type=pa.int64()),
    })
    tb = {"docs": out, "u": src}
    with pytest.raises(SqlUnsupported, match="doc_id"):
        sql_query("MERGE INTO docs USING u ON docs.doc_id = u.sid "
                  "WHEN MATCHED THEN UPDATE SET n_chars = u.n_chars",
                  tb)
