"""SQL list-column surface (tokens payload): scalar list functions,
element extraction, UNNEST, and the list-flavoured aggregates — every
query runs through the engine over the ENCODED table and through
DuckDB over the raw arrow table, and must agree on rows + values.

The tokens table mirrors BASELINE.json's input_hint shape
(doc_id, tokens list<int32>, n_tok, source) with planted edge rows:
an empty list, a NULL list, a length-2 list. List ELEMENTS are never
null (the v1 format's documented no-validity contract for list value
streams — streams.py _no_nulls)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arcade_ray.sql import SqlUnsupported, sql_query


def _mk_tokens(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    toks = []
    for i in range(n):
        if i == 5:
            toks.append([])
        elif i == 6:
            toks.append(None)
        elif i == 7:
            toks.append([3, 9])
        else:
            toks.append(rng.integers(0, 60, rng.integers(1, 9)).tolist())
    return pa.table({
        "doc_id": pa.array([f"d{i:05d}" for i in range(n)]),
        "source": pa.array([f"s{i % 5}" for i in range(n)]),
        "n_chars": pa.array(rng.integers(0, 100, n), type=pa.int64()),
        "text": pa.array([f"w{i % 7} common w{i % 11} t{i % 3}"
                          for i in range(n)]),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
    })


@pytest.fixture(scope="module")
def listenv(ray_session, tmp_path_factory):
    import duckdb

    from arcade_ray.pipeline.encode import encode_parquet

    base = tmp_path_factory.mktemp("sql_lists")
    t = _mk_tokens()
    p = str(base / "tok.parquet")
    pq.write_table(t, p)
    out = str(base / "enc_tok")
    encode_parquet(p, out, key_col="source", id_col="doc_id",
                   weight_col=None)
    con = duckdb.connect()
    con.register("tok", t)
    yield {"tok": out}, con
    con.close()


def check(listenv, q, ordered=None):
    tables, con = listenv
    mine = sql_query(q, tables)
    if not isinstance(mine, pa.Table):
        from arcade_ray.collect import collect_arrow

        mine = collect_arrow(mine)
    oracle = con.execute(q).arrow()
    if ordered is None:
        ordered = "ORDER" in q.upper()
    assert set(mine.column_names) == set(oracle.column_names), \
        (mine.column_names, oracle.column_names)
    if not ordered:
        keys = [(c, "ascending") for c in sorted(mine.column_names)]
        mine = mine.sort_by(keys)
        oracle = oracle.sort_by(keys)
    assert mine.num_rows == oracle.num_rows, \
        (q, mine.num_rows, oracle.num_rows)
    for c in oracle.column_names:
        assert mine[c].to_pylist() == oracle[c].to_pylist(), (q, c)
    return mine


# --- scalar list functions --------------------------------------------------

def test_len_of_list(listenv):
    check(listenv, "SELECT doc_id, CAST(len(tokens) AS BIGINT) AS lt "
                   "FROM tok ORDER BY lt DESC NULLS LAST, doc_id LIMIT 9")


def test_len_dispatches_on_strings_too(listenv):
    check(listenv, "SELECT doc_id, len(doc_id) AS ls FROM tok "
                   "ORDER BY doc_id LIMIT 4")


def test_element_extraction(listenv):
    # 1-based, negative-from-end, out-of-range/empty/NULL -> NULL
    check(listenv, "SELECT doc_id, tokens[1] AS t0, tokens[-1] AS tl, "
                   "tokens[4] AS t4, tokens[0] AS tz FROM tok "
                   "ORDER BY doc_id LIMIT 10")


def test_list_extract_function_name(listenv):
    check(listenv, "SELECT doc_id, list_extract(tokens, 2) AS e2 "
                   "FROM tok ORDER BY doc_id LIMIT 8")


def test_list_contains_group(listenv):
    check(listenv, "SELECT list_contains(tokens, 7) AS c, count(*) AS n "
                   "FROM tok GROUP BY list_contains(tokens, 7) "
                   "ORDER BY c NULLS FIRST")


def test_list_sum_min_max_avg(listenv):
    check(listenv, "SELECT doc_id, CAST(list_sum(tokens) AS BIGINT) AS s, "
                   "list_min(tokens) AS mn, list_max(tokens) AS mx, "
                   "list_avg(tokens) AS av FROM tok "
                   "ORDER BY doc_id LIMIT 12")


def test_array_to_string(listenv):
    check(listenv, "SELECT doc_id, array_to_string(tokens, '-') AS j "
                   "FROM tok ORDER BY doc_id LIMIT 12")


def test_string_split_and_extract(listenv):
    check(listenv, "SELECT string_split(text, ' ')[2] AS w2, "
                   "count(*) AS n FROM tok "
                   "GROUP BY string_split(text, ' ')[2] ORDER BY w2")


def test_list_predicate_in_where(listenv):
    check(listenv, "SELECT doc_id FROM tok "
                   "WHERE list_contains(tokens, 44) AND n_chars > 50 "
                   "ORDER BY doc_id")


def test_unsupported_list_fn_refuses_on_driver(listenv):
    tables, _ = listenv
    # an unknown function must refuse at plan time (driver), even when
    # it only appears in a computed ORDER BY key
    with pytest.raises(SqlUnsupported):
        sql_query("SELECT doc_id FROM tok "
                  "ORDER BY list_definitely_not_a_fn(tokens) LIMIT 3",
                  tables)
    with pytest.raises(SqlUnsupported):
        sql_query("SELECT list_definitely_not_a_fn(tokens) AS x "
                  "FROM tok LIMIT 3", tables)


def test_list_fn_over_scalar_type_refuses(listenv):
    tables, _ = listenv
    with pytest.raises(SqlUnsupported):
        sql_query("SELECT list_sum(doc_id) AS x FROM tok LIMIT 3", tables)


# --- UNNEST -----------------------------------------------------------------

def test_unnest_basic(listenv):
    check(listenv, "SELECT doc_id, unnest(tokens) AS tk FROM tok "
                   "ORDER BY doc_id, tk LIMIT 25")


def test_unnest_expression_wrapped(listenv):
    check(listenv, "SELECT unnest(tokens) + 1 AS tp FROM tok "
                   "WHERE doc_id = 'd00007' ORDER BY tp")


def test_unnest_of_expression_grouped(listenv):
    # the word-histogram shape: explode a computed list, then GROUP BY
    check(listenv, "SELECT w, count(*) AS n FROM "
                   "(SELECT unnest(string_split(text, ' ')) AS w "
                   "FROM tok) s GROUP BY w ORDER BY n DESC, w LIMIT 12")


def test_unnest_distinct(listenv):
    check(listenv, "SELECT DISTINCT unnest(tokens) AS tk FROM tok "
                   "ORDER BY tk LIMIT 7")


def test_unnest_zip_two_lists(listenv):
    # DuckDB zip: multiplicity is the LONGEST list, shorter pads NULL;
    # the planted empty/NULL-token rows exercise zero-length sides
    check(listenv, "SELECT unnest(tokens) AS a, "
                   "unnest(string_split(text,' ')) AS b FROM tok "
                   "WHERE doc_id IN ('d00007','d00005','d00006','d00010') "
                   "ORDER BY a NULLS FIRST, b NULLS FIRST")


def test_unnest_derived_table_streams(listenv, monkeypatch):
    # the word-histogram shape must NEVER materialize the exploded
    # rows on the driver: poison the materializing fallback and run
    # the grouped-unnest query end to end
    import arcade_ray.sql as sqlmod

    def _poisoned(res):
        raise AssertionError("derived table materialized on driver")

    monkeypatch.setattr(sqlmod, "_materialize_result", _poisoned)
    check(listenv, "SELECT w, count(*) AS n FROM "
                   "(SELECT unnest(string_split(text, ' ')) AS w "
                   "FROM tok) s WHERE w <> 'common' "
                   "GROUP BY w ORDER BY n DESC, w LIMIT 10")


def test_unnest_refusals(listenv):
    tables, _ = listenv
    with pytest.raises(SqlUnsupported):
        sql_query("SELECT doc_id FROM tok WHERE unnest(tokens) > 3",
                  tables)
    with pytest.raises(SqlUnsupported):
        sql_query("SELECT sum(unnest(tokens)) AS s FROM tok", tables)


# --- full-sort null handling (regression: Ray 2.49 multi-key sort
# DUPLICATES rows when a null-bearing key feeds the range partitioner;
# every full sort now runs over (is-null companion, null-filled key)
# pairs) ----------------------------------------------------------------------

def test_full_sort_null_first_key_no_limit(listenv):
    # tokens[1] is NULL for the empty/NULL-list rows; no LIMIT forces
    # the distributed range-partitioned sort path
    check(listenv, "SELECT doc_id, tokens[1] AS t0 FROM tok "
                   "WHERE doc_id < 'd00040' ORDER BY t0, doc_id")


def test_full_sort_nulls_first_desc(listenv):
    check(listenv, "SELECT doc_id, tokens[1] AS t0 FROM tok "
                   "WHERE doc_id < 'd00040' "
                   "ORDER BY t0 DESC NULLS FIRST, doc_id DESC")
