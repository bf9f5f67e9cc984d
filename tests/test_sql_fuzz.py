"""Randomized SQL parity fuzz: generate queries from the supported
grammar (filters incl. residual expressions, computed projections,
datetime functions, GROUP BY/aggregates, ORDER/LIMIT), run each
through the engine over the ENCODED table and through DuckDB over the
raw arrow table, and require identical rows/values.

Deterministic (seeded). ARCADE_SQL_FUZZ_N overrides the query count
for longer local hunts; queries the engine refuses with SqlUnsupported
are skipped (counted, bounded) — silent wrong answers are what this
test exists to catch.
"""

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arcade_ray.sql import SqlUnsupported, sql_query

N_QUERIES = int(os.environ.get("ARCADE_SQL_FUZZ_N", "40"))


def _mk_fuzz(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "fr", "de", None, "es", "it"], dtype=object)
    src = np.array([f"s{i}" for i in range(5)])
    n_chars = rng.integers(0, 10000, n)
    n_chars[rng.random(n) < 0.05] = 0
    return pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "source": pa.array(src[rng.integers(0, 5, n)]),
        "lang": pa.array(langs[rng.integers(0, 6, n)].tolist(),
                         type=pa.string()),
        "n_chars": pa.array(n_chars, type=pa.int64()),
        "rank_i": pa.array(rng.integers(-50, 50, n), type=pa.int64()),
        "ts": pa.array(
            1704067200_000_000
            + rng.integers(0, 40_000_000, n) * np.int64(1_000_000),
            type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def fuzzenv(ray_session, tmp_path_factory):
    import duckdb

    from arcade_ray.pipeline.encode import encode_parquet

    base = tmp_path_factory.mktemp("sqlfuzz")
    t = _mk_fuzz()
    p = str(base / "fz.parquet")
    pq.write_table(t, p)
    out = str(base / "enc_fz")
    encode_parquet(p, out, key_col="source", id_col="doc_id",
                   weight_col=None)
    con = duckdb.connect()
    con.register("fz", t)
    yield {"fz": out}, con
    con.close()


# ---- grammar ---------------------------------------------------------------

STR_COLS = ["doc_id", "source", "lang"]
INT_COLS = ["n_chars", "rank_i"]


def _leaf(r: random.Random) -> str:
    kind = r.choice(["icmp", "icmp", "scmp", "like", "in", "null",
                     "between", "fn", "colcol", "dt"])
    if kind == "icmp":
        c = r.choice(INT_COLS)
        op = r.choice(["=", "<>", "<", ">", "<=", ">="])
        return f"{c} {op} {r.randint(-60, 9000)}"
    if kind == "scmp":
        return (f"lang {r.choice(['=', '<>'])} "
                f"'{r.choice(['en', 'fr', 'xx'])}'")
    if kind == "like":
        pat = r.choice(["d0001%", "%3", "%00%", "d%5"])
        return f"doc_id {r.choice(['LIKE', 'NOT LIKE'])} '{pat}'"
    if kind == "in":
        vals = ", ".join(f"'{v}'" for v in
                         r.sample(["en", "fr", "de", "es", "zz"], 2))
        return f"lang {r.choice(['IN', 'NOT IN'])} ({vals})"
    if kind == "null":
        return f"lang IS {r.choice(['NULL', 'NOT NULL'])}"
    if kind == "between":
        lo = r.randint(0, 5000)
        return f"n_chars BETWEEN {lo} AND {lo + r.randint(0, 4000)}"
    if kind == "fn":
        return r.choice([
            "length(doc_id) = 7",
            "upper(lang) = 'EN'",
            f"n_chars % {r.randint(2, 97)} = 1",
            "contains(doc_id, '42')",
            "abs(rank_i) > 25",
        ])
    if kind == "colcol":
        return r.choice(["n_chars > rank_i * 100",
                         "rank_i + 50 >= n_chars / 100"])
    return r.choice([
        "year(ts) = 2024",
        "month(ts) IN (2, 3)",
        f"hour(ts) < {r.randint(1, 23)}",
        "date_trunc('day', ts) > DATE '2024-06-01'",
    ])


def _pred(r: random.Random, depth=0) -> str:
    if depth >= 2 or r.random() < 0.4:
        leaf = _leaf(r)
        return f"NOT ({leaf})" if r.random() < 0.15 else leaf
    op = r.choice(["AND", "OR"])
    return (f"({_pred(r, depth + 1)}) {op} ({_pred(r, depth + 1)})")


def _proj(r: random.Random) -> list[str]:
    out = ["doc_id"]
    for expr in ["source", "lang", "n_chars", "rank_i",
                 "n_chars + rank_i AS x1",
                 "n_chars * 2 - 1 AS x2",
                 "lower(source) AS lsrc",
                 "substr(doc_id, 2, 4) AS mid",
                 "year(ts) AS y",
                 "strftime(ts, '%Y-%m') AS ym",
                 "CASE WHEN n_chars > 5000 THEN 'big' ELSE 'small' "
                 "END AS size",
                 "coalesce(lang, '??') AS lng"]:
        if r.random() < 0.3:
            out.append(expr)
    return out


def _agg_query(r: random.Random) -> str:
    keys = r.sample(["source", "lang", "year(ts)",
                     "date_trunc('month', ts)", "n_chars % 7"],
                    r.choice([1, 1, 2]))
    knames = [f"k{i}" for i in range(len(keys))]
    kexprs = ", ".join(f"{k} AS {n}" for k, n in zip(keys, knames))
    aggs = r.sample(["COUNT(*) AS n", "SUM(n_chars) AS s",
                     "MIN(rank_i) AS mn", "MAX(rank_i) AS mx",
                     "AVG(n_chars) AS a",
                     "COUNT(lang) AS cl",
                     # exact over ints: CONT interpolation lands on
                     # .0/.5, DISC returns elements, BOOL is 3VL min/
                     # max (var/stddev fuzz separately w/ tolerance)
                     "MEDIAN(n_chars) AS md",
                     "QUANTILE_DISC(n_chars, 0.25) AS qd",
                     "QUANTILE_CONT(rank_i, 0.75) AS qc",
                     "BOOL_OR(n_chars > 2000) AS bo",
                     "BOOL_AND(rank_i < 35) AS ba"],
                    r.choice([1, 2, 3]))
    q = (f"SELECT {kexprs}, {', '.join(aggs)} FROM fz")
    if r.random() < 0.6:
        q += f" WHERE {_pred(r)}"
    q += f" GROUP BY {', '.join(knames)}"
    if r.random() < 0.3:
        q += " HAVING COUNT(*) > 2"
    q += f" ORDER BY {', '.join(knames)}"
    return q


def _row_query(r: random.Random) -> str:
    q = f"SELECT {', '.join(_proj(r))} FROM fz"
    if r.random() < 0.85:
        q += f" WHERE {_pred(r)}"
    if r.random() < 0.4:
        q += f" ORDER BY doc_id LIMIT {r.randint(1, 200)}"
    return q


def _gen(seed: int) -> str:
    r = random.Random(seed)
    return _agg_query(r) if r.random() < 0.35 else _row_query(r)


def _norm(t: pa.Table) -> list:
    import decimal

    keys = [(c, "ascending") for c in sorted(t.column_names)]
    rows = t.sort_by(keys).to_pylist()
    # DuckDB SUM(BIGINT) surfaces as decimal128 — same value, wider
    # type; normalize exact decimals so value parity is what's tested
    return [{k: int(v) if isinstance(v, decimal.Decimal)
             and v == int(v) else v
             for k, v in r.items()} for r in rows]


def test_sql_fuzz_parity(fuzzenv):
    tables, con = fuzzenv
    skipped = 0
    ran = 0
    for seed in range(N_QUERIES):
        q = _gen(seed)
        try:
            mine = sql_query(q, tables)
        except SqlUnsupported:
            skipped += 1
            continue
        if not isinstance(mine, pa.Table):
            from arcade_ray.collect import collect_arrow

            mine = collect_arrow(mine)
        oracle = con.execute(q).arrow()
        assert sorted(mine.column_names) == \
            sorted(oracle.column_names), (seed, q)
        assert mine.num_rows == oracle.num_rows, \
            (seed, q, mine.num_rows, oracle.num_rows)
        # row LIMITs always ORDER BY the unique doc_id, so every
        # generated query has a deterministic answer set
        assert _norm(mine) == _norm(oracle), (seed, q)
        ran += 1
    # the grammar is built from supported shapes: refusals should be
    # rare (subquery-free grammar), and never the majority
    assert ran >= max(1, (ran + skipped) * 2 // 3), (ran, skipped)


def test_group_aggregate_null_multikey():
    """pyarrow 16.1 splits null-key groups under multi-key group_by
    (~every 32 rows); the collect.group_aggregate wrapper must not."""
    from arcade_ray.collect import group_aggregate

    n = 400
    langs = [None if i % 3 == 0 else ("en" if i % 2 else "de")
             for i in range(n)]
    years = [2024 + (i % 2) for i in range(n)]
    t = pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "g": pa.array(years, type=pa.int64()),
        "c": pa.array(np.ones(n, dtype=np.int64)),
    })
    m = group_aggregate(t, ["lang", "g"], [("c", "sum")])
    true = {(x, y) for x, y in zip(langs, years)}
    assert m.num_rows == len(true)
    total = sum(r["c_sum"] for r in m.to_pylist())
    assert total == n
    # empty-string values must NOT merge with genuine nulls
    t2 = pa.table({
        "a": pa.array(["", None, "", None, "x"]),
        "b": pa.array([1, 1, 1, 1, 1], type=pa.int64()),
        "c": pa.array([1, 1, 1, 1, 1], type=pa.int64()),
    })
    m2 = group_aggregate(t2, ["a", "b"], [("c", "sum")])
    got = {(r["a"], r["b"]): r["c_sum"] for r in m2.to_pylist()}
    assert got == {("", 1): 2, (None, 1): 2, ("x", 1): 1}
    # all-null key column
    t3 = pa.table({
        "a": pa.array([None, None], type=pa.float64()),
        "b": pa.array([7, 7], type=pa.int64()),
        "c": pa.array([1, 1], type=pa.int64()),
    })
    m3 = group_aggregate(t3, ["a", "b"], [("c", "sum")])
    assert m3.num_rows == 1 and m3.to_pylist()[0]["c_sum"] == 2


# ---- grammar v2: joins / windows / distinct / set ops ----------------------

@pytest.fixture(scope="module")
def fuzzenv2(ray_session, tmp_path_factory):
    import duckdb

    from arcade_ray.pipeline.encode import encode_parquet

    base = tmp_path_factory.mktemp("sqlfuzz2")
    t = _mk_fuzz()
    rng = np.random.default_rng(21)
    dim = pa.table({
        "source": pa.array([f"s{i}" for i in range(7)]),  # s5,s6 dangle
        "region": pa.array([f"r{i % 3}" if i != 4 else None
                            for i in range(7)]),
        "weight": pa.array(rng.integers(1, 50, 7), type=pa.int64()),
    })
    tables = {}
    for name, tab, key, idc in (("fz", t, "source", "doc_id"),
                                ("dim", dim, "region", "source")):
        p = str(base / f"{name}.parquet")
        pq.write_table(tab, p)
        out = str(base / f"enc_{name}")
        encode_parquet(p, out, key_col=key, id_col=idc,
                       weight_col=None)
        tables[name] = out
    con = duckdb.connect()
    con.register("fz", t)
    con.register("dim", dim)
    yield tables, con
    con.close()


def _join_query(r: random.Random) -> str:
    jt = r.choice(["JOIN", "JOIN", "LEFT JOIN", "SEMI JOIN",
                   "ANTI JOIN"])
    gated = jt in ("SEMI JOIN", "ANTI JOIN")
    proj = ["fz.doc_id", "fz.n_chars"]
    if not gated and r.random() < 0.6:
        proj += ["dim.region", "dim.weight"]
    q = (f"SELECT {', '.join(proj)} FROM fz {jt} dim "
         "ON fz.source = dim.source")
    if r.random() < 0.6:
        q += f" WHERE {_pred(r)}"
    if r.random() < 0.5:
        q += f" ORDER BY fz.doc_id LIMIT {r.randint(5, 120)}"
    return q


def _window_query(r: random.Random) -> str:
    wf = r.choice([
        "ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)",
        "RANK() OVER (PARTITION BY source ORDER BY n_chars, doc_id)",
        "LAG(n_chars) OVER (PARTITION BY source ORDER BY doc_id)",
        "CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id)"
        " AS BIGINT)",
        "MIN(rank_i) OVER (PARTITION BY lang ORDER BY doc_id)",
        "FIRST_VALUE(doc_id) OVER (PARTITION BY source "
        "ORDER BY n_chars, doc_id)",
        "LAST_VALUE(n_chars) OVER (PARTITION BY source "
        "ORDER BY n_chars, doc_id)",
        "NTH_VALUE(doc_id, 2) OVER (PARTITION BY lang "
        "ORDER BY doc_id)",
        "NTILE(5) OVER (PARTITION BY lang ORDER BY doc_id)",
        "PERCENT_RANK() OVER (PARTITION BY source "
        "ORDER BY n_chars, doc_id)",
        "CUME_DIST() OVER (PARTITION BY source "
        "ORDER BY n_chars, doc_id)",
    ])
    q = f"SELECT doc_id, source, {wf} AS w FROM fz"
    if r.random() < 0.5:
        q += f" WHERE {_pred(r)}"
    if r.random() < 0.4:
        q += " QUALIFY ROW_NUMBER() OVER (PARTITION BY source " \
             "ORDER BY doc_id) <= 7"
    q += f" ORDER BY doc_id LIMIT {r.randint(20, 300)}"
    return q


def _distinct_query(r: random.Random) -> str:
    cols = r.sample(["source", "lang", "rank_i"], r.choice([1, 2]))
    q = f"SELECT DISTINCT {', '.join(cols)} FROM fz"
    if r.random() < 0.5:
        q += f" WHERE {_pred(r)}"
    return q


def _count_distinct_query(r: random.Random) -> str:
    key = r.choice(["source", "lang"])
    q = (f"SELECT {key}, COUNT(DISTINCT lang) AS dl, "
         f"COUNT(DISTINCT rank_i) AS dr, COUNT(*) AS n "
         f"FROM fz GROUP BY {key} ORDER BY {key}")
    return q


def _setop_query(r: random.Random) -> str:
    op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    lo1, lo2 = r.randint(0, 4000), r.randint(0, 4000)
    return (f"SELECT source, lang FROM fz WHERE n_chars > {lo1} "
            f"{op} SELECT source, lang FROM fz WHERE rank_i > "
            f"{r.randint(-40, 40)} AND n_chars > {lo2}")


def _gen2(seed: int) -> str:
    r = random.Random(10_000 + seed)
    return r.choice([_join_query, _window_query, _distinct_query,
                     _count_distinct_query, _setop_query])(r)


def test_sql_fuzz_parity_v2(fuzzenv2):
    tables, con = fuzzenv2
    skipped, ran = 0, 0
    for seed in range(N_QUERIES):
        q = _gen2(seed)
        try:
            mine = sql_query(q, tables)
        except SqlUnsupported:
            skipped += 1
            continue
        if not isinstance(mine, pa.Table):
            from arcade_ray.collect import collect_arrow

            mine = collect_arrow(mine)
        oracle = con.execute(q).arrow()
        assert sorted(mine.column_names) == \
            sorted(oracle.column_names), (seed, q)
        assert mine.num_rows == oracle.num_rows, \
            (seed, q, mine.num_rows, oracle.num_rows)
        assert _norm(mine) == _norm(oracle), (seed, q)
        ran += 1
    assert ran >= max(1, (ran + skipped) * 2 // 3), (ran, skipped)


# ---- grammar v3: subqueries / CTEs / rollup --------------------------------

def _subq_query(r: random.Random) -> str:
    shape = r.choice(["in", "notin", "exists", "scalar", "cte",
                      "derived", "rollup"])
    if shape == "in":
        return ("SELECT doc_id FROM fz WHERE source IN (SELECT source "
                f"FROM dim WHERE weight > {r.randint(1, 45)})")
    if shape == "notin":
        return ("SELECT doc_id FROM fz WHERE source NOT IN (SELECT "
                f"source FROM dim WHERE weight < {r.randint(5, 45)})")
    if shape == "exists":
        return ("SELECT doc_id FROM fz d WHERE EXISTS (SELECT 1 FROM "
                "dim m WHERE m.source = d.source AND m.weight > "
                f"{r.randint(1, 45)}) AND n_chars > {r.randint(0, 8000)}")
    if shape == "scalar":
        return ("SELECT doc_id, n_chars FROM fz WHERE n_chars > "
                "(SELECT CAST(AVG(n_chars) AS BIGINT) FROM fz) "
                f"AND rank_i < {r.randint(-20, 40)}")
    if shape == "cte":
        return ("WITH hot AS (SELECT source, COUNT(*) AS n FROM fz "
                "GROUP BY source) SELECT fz.doc_id, hot.n FROM fz "
                "JOIN hot ON fz.source = hot.source WHERE "
                f"n_chars > {r.randint(6000, 9500)} "
                "ORDER BY fz.doc_id")
    if shape == "derived":
        return ("SELECT t.source, t.n FROM (SELECT source, COUNT(*) "
                "AS n FROM fz GROUP BY source) t WHERE t.n > "
                f"{r.randint(100, 600)} ORDER BY t.source")
    return ("SELECT source, lang, COUNT(*) AS n FROM fz "
            f"WHERE n_chars > {r.randint(0, 6000)} "
            "GROUP BY ROLLUP (source, lang) ORDER BY source, lang, n")


def _gen3(seed: int) -> str:
    return _subq_query(random.Random(20_000 + seed))


def test_sql_fuzz_parity_v3(fuzzenv2):
    tables, con = fuzzenv2
    skipped, ran = 0, 0
    for seed in range(N_QUERIES):
        q = _gen3(seed)
        try:
            mine = sql_query(q, tables)
        except SqlUnsupported:
            skipped += 1
            continue
        if not isinstance(mine, pa.Table):
            from arcade_ray.collect import collect_arrow

            mine = collect_arrow(mine)
        oracle = con.execute(q).arrow()
        assert sorted(mine.column_names) == \
            sorted(oracle.column_names), (seed, q)
        assert mine.num_rows == oracle.num_rows, \
            (seed, q, mine.num_rows, oracle.num_rows)
        assert _norm(mine) == _norm(oracle), (seed, q)
        ran += 1
    assert ran >= max(1, (ran + skipped) * 2 // 3), (ran, skipped)


# ---- grammar v4: list columns / ordered aggregates / VALUES ----------------

@pytest.fixture(scope="module")
def fuzzenv4(ray_session, tmp_path_factory):
    import duckdb

    from arcade_ray.pipeline.encode import encode_parquet

    base = tmp_path_factory.mktemp("sqlfuzz4")
    rng = np.random.default_rng(77)
    n = 1500
    lens = rng.integers(0, 9, n)
    toks = [rng.integers(0, 40, k).astype(np.int32).tolist()
            for k in lens]
    words = np.array(["ab", "cd", "ef", "gh", "ij"])
    tags = [words[rng.integers(0, 5, k)].tolist()
            for k in rng.integers(0, 4, n)]
    t = pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
        "lang": pa.array([None if i % 13 == 0 else
                          ["en", "fr", "de"][i % 3] for i in range(n)],
                         type=pa.string()),
        "n_chars": pa.array(rng.integers(0, 10000, n), type=pa.int64()),
        "toks": pa.array(toks, type=pa.list_(pa.int32())),
        "tags": pa.array(tags, type=pa.list_(pa.string())),
    })
    p = str(base / "lt.parquet")
    pq.write_table(t, p)
    out = str(base / "enc_lt")
    encode_parquet(p, out, key_col="source", id_col="doc_id",
                   weight_col=None)
    con = duckdb.connect()
    con.register("lt", t)
    yield {"lt": out}, con
    con.close()


def _v4_pred(r: random.Random) -> str:
    return r.choice([
        f"n_chars > {r.randint(0, 9000)}",
        f"n_chars BETWEEN {r.randint(0, 4000)} AND {r.randint(4000, 9999)}",
        "lang IS NOT NULL",
        f"source = 's{r.randint(0, 3)}'",
        f"len(toks) >= {r.randint(0, 6)}",
        f"list_contains(toks, {r.randint(0, 39)})",
    ])


def _v4_list_query(r: random.Random) -> str:
    proj = r.choice([
        "len(toks) AS a, list_contains(toks, %d) AS b" % r.randint(0, 39),
        "list_sum(toks) AS a, list_min(toks) AS b, list_max(toks) AS c",
        "list_sort(toks) AS a",
        "list_reverse_sort(toks) AS a, len(tags) AS b",
        "toks[%d] AS a" % r.randint(1, 6),
        "list_contains(tags, '%s') AS a" % r.choice(["ab", "ef", "zz"]),
        "array_to_string(tags, '-') AS a",
    ])
    q = f"SELECT doc_id, {proj} FROM lt"
    if r.random() < 0.6:
        q += f" WHERE {_v4_pred(r)}"
    q += f" ORDER BY doc_id LIMIT {r.randint(10, 200)}"
    return q


def _v4_unnest_query(r: random.Random) -> str:
    q = ("SELECT doc_id, unnest(toks) AS t FROM lt "
         f"WHERE {_v4_pred(r)} ORDER BY doc_id, t "
         f"LIMIT {r.randint(20, 300)}")
    return q


def _v4_ordered_agg_query(r: random.Random) -> str:
    agg = r.choice([
        "arg_max(n_chars, doc_id) AS a, arg_min(n_chars, doc_id) AS b",
        "string_agg(lang, '|' ORDER BY doc_id) AS a",
        "array_agg(n_chars ORDER BY doc_id) AS a",
        "arg_max(doc_id, doc_id) AS a, COUNT(*) AS n",
        "string_agg(n_chars, ',' ORDER BY doc_id) AS a",
    ])
    q = f"SELECT source, {agg} FROM lt"
    if r.random() < 0.5:
        q += f" WHERE {_v4_pred(r)}"
    q += " GROUP BY source ORDER BY source"
    return q


def _v4_values_query(r: random.Random) -> str:
    shape = r.choice(["scan", "join"])
    if shape == "scan":
        rows = ", ".join(f"({r.randint(-5, 5)}, '{c}')"
                         for c in r.sample(["a", "b", "c", "d"], 3))
        return (f"SELECT t.i, t.s FROM (VALUES {rows}) t(i, s) "
                "ORDER BY t.i, t.s")
    srcs = ", ".join(f"('s{i}')" for i in
                     r.sample(range(5), r.choice([1, 2])))
    return ("SELECT lt.doc_id, lt.n_chars FROM lt "
            f"JOIN (VALUES {srcs}) v(source) "
            "ON lt.source = v.source "
            f"ORDER BY lt.doc_id LIMIT {r.randint(10, 100)}")


def _gen4(seed: int) -> str:
    r = random.Random(40_000 + seed)
    return r.choice([_v4_list_query, _v4_list_query, _v4_unnest_query,
                     _v4_ordered_agg_query, _v4_values_query])(r)


def test_sql_fuzz_parity_v4(fuzzenv4):
    tables, con = fuzzenv4
    skipped, ran = 0, 0
    for seed in range(N_QUERIES):
        q = _gen4(seed)
        try:
            mine = sql_query(q, tables)
        except SqlUnsupported:
            skipped += 1
            continue
        if not isinstance(mine, pa.Table):
            from arcade_ray.collect import collect_arrow

            mine = collect_arrow(mine)
        oracle = con.execute(q).arrow()
        assert sorted(mine.column_names) == \
            sorted(oracle.column_names), (seed, q)
        assert mine.num_rows == oracle.num_rows, \
            (seed, q, mine.num_rows, oracle.num_rows)
        # every v4 query carries a deterministic ORDER BY; list-valued
        # columns block the _norm sort, so compare in query order
        import decimal

        def rows(t):
            return [{k: int(v) if isinstance(v, decimal.Decimal)
                     and v == int(v) else v for k, v in row.items()}
                    for row in t.select(sorted(t.column_names))
                    .to_pylist()]

        assert rows(mine) == rows(oracle), (seed, q)
        ran += 1
    assert ran >= max(1, (ran + skipped) * 2 // 3), (ran, skipped)


# ---- grammar v5: DML lifecycle (INSERT / UPDATE / DELETE / MERGE) ----------

def test_sql_fuzz_dml_lifecycle(ray_session, tmp_path):
    """Randomized DML sequences applied to BOTH the encoded table and
    a DuckDB mirror (MERGE simulated in DuckDB via the update-leg
    UNION ALL insert-leg rewrite, since duckdb 1.0 has no MERGE);
    full-table parity after every statement. Catches cross-statement
    state bugs (lineage, generation numbering, zone maps after
    rewrites) that single-statement tests can't."""
    import duckdb

    from arcade_ray.collect import collect_arrow
    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.sql import sql_query

    rng = random.Random(505)
    n = 600
    t = pa.table({
        "id": pa.array(list(range(n)), type=pa.int64()),
        "grp": pa.array([f"g{i % 5}" for i in range(n)]),
        "val": pa.array([i * 3 % 101 for i in range(n)],
                        type=pa.int64()),
        "tag": pa.array([["aa", "bb", "cc"][i % 3] for i in range(n)]),
    })
    p = str(tmp_path / "st.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "enc_st")
    encode_parquet(p, out, key_col="grp", id_col="id", weight_col=None)
    tb = {"st": out}
    con = duckdb.connect()
    con.register("_init", t)
    con.execute("CREATE TABLE st AS SELECT * FROM _init")
    next_id = n

    def check(stmt_no, stmt):
        mine = sql_query("SELECT id, grp, val, tag FROM st "
                         "ORDER BY id, grp, val, tag", tb)
        if not isinstance(mine, pa.Table):
            mine = collect_arrow(mine)
        oracle = con.execute("SELECT id, grp, val, tag FROM st "
                             "ORDER BY id, grp, val, tag").arrow()
        assert mine.num_rows == oracle.num_rows, (stmt_no, stmt)
        assert mine.to_pylist() == oracle.to_pylist(), (stmt_no, stmt)

    rounds = int(os.environ.get("ARCADE_DML_FUZZ_N", "14"))
    for i in range(rounds):
        kind = rng.choice(["insert_values", "insert_select", "update",
                           "delete", "merge", "merge", "vacuum"])
        if kind == "vacuum":
            # content no-op: partitions merge, rows must not change
            stmt = "VACUUM st"
            sql_query(stmt, tb)
        elif kind == "insert_values":
            rows = ", ".join(
                f"({next_id + j}, 'g{rng.randint(0, 6)}', "
                f"{rng.randint(0, 100)}, '{rng.choice('ab')}x')"
                for j in range(rng.randint(1, 3)))
            next_id += 3
            stmt = f"INSERT INTO st (id, grp, val, tag) VALUES {rows}"
            sql_query(stmt, tb)
            con.execute(stmt)
        elif kind == "insert_select":
            lo = rng.randint(0, 80)
            stmt = (f"INSERT INTO st (id, grp, val, tag) "
                    f"SELECT id + {next_id + 1000}, grp, val + 1, tag "
                    f"FROM st WHERE val BETWEEN {lo} AND {lo + 2}")
            next_id += 3000
            sql_query(stmt, tb)
            con.execute(stmt)
        elif kind == "update":
            v = rng.randint(0, 100)
            stmt = (f"UPDATE st SET val = {rng.randint(0, 100)}, "
                    f"tag = 'u{i}' WHERE val >= {v} AND val <= {v + 4}")
            sql_query(stmt, tb)
            con.execute(stmt)
        elif kind == "delete":
            v = rng.randint(0, 100)
            stmt = f"DELETE FROM st WHERE val = {v} AND grp = 'g{rng.randint(0, 5)}'"
            sql_query(stmt, tb)
            con.execute(stmt)
        else:
            # MERGE: some keys hit existing ids, some are fresh
            hit = rng.sample(range(0, n), 2)
            fresh = [next_id + 1, next_id + 2]
            next_id += 10
            vals = {k: rng.randint(200, 300) for k in hit + fresh}
            rowlist = ", ".join(
                f"({k}, 'g{rng.randint(0, 5)}', {v}, 'm{i}')"
                for k, v in vals.items())
            src = (f"SELECT * FROM (VALUES {rowlist}) "
                   "v(id, grp, val, tag)")
            stmt = (f"MERGE INTO st USING ({src}) m ON st.id = m.id "
                    "WHEN MATCHED THEN UPDATE SET val = m.val, "
                    "tag = m.tag WHEN NOT MATCHED THEN INSERT")
            sql_query(stmt, tb)
            con.execute(
                "CREATE OR REPLACE TABLE st AS "
                f"WITH m AS ({src}) "
                "SELECT s.id, s.grp, "
                "CASE WHEN m.id IS NOT NULL THEN m.val ELSE s.val END "
                "AS val, "
                "CASE WHEN m.id IS NOT NULL THEN m.tag ELSE s.tag END "
                "AS tag FROM st s LEFT JOIN m USING (id) "
                "UNION ALL SELECT id, grp, val, tag FROM m "
                "WHERE id NOT IN (SELECT id FROM st)")
        check(i, stmt)
    con.close()


# ---- grammar v5: scalar subqueries in SELECT, set-op-ALL under windows,
# ---- GROUPING SETS ---------------------------------------------------------

def _v5_query(r: random.Random) -> str:
    shape = r.choice(["scalar_uncorr", "scalar_corr", "scalar_corr_agg",
                      "except_all_window", "intersect_all_window",
                      "grouping_sets", "gsets_grouping_fn"])
    if shape == "scalar_uncorr":
        return ("SELECT doc_id, n_chars, (SELECT CAST(AVG(weight) AS "
                "BIGINT) FROM dim) AS aw FROM fz WHERE n_chars > "
                f"{r.randint(0, 9000)} ORDER BY doc_id")
    if shape == "scalar_corr":
        # dim.source is unique: the plain correlated lookup is legal
        return ("SELECT d.doc_id, (SELECT m.weight FROM dim m WHERE "
                "m.source = d.source) AS w FROM fz d WHERE n_chars > "
                f"{r.randint(0, 9000)} ORDER BY d.doc_id")
    if shape == "scalar_corr_agg":
        agg = r.choice(["COUNT(*)", "CAST(SUM(f2.n_chars) AS BIGINT)",
                        "CAST(MIN(f2.n_chars) AS BIGINT)",
                        "COUNT(f2.lang)"])
        return (f"SELECT d.doc_id, d.source, (SELECT {agg} FROM fz f2 "
                "WHERE f2.source = d.source AND f2.n_chars < "
                f"{r.randint(100, 9000)}) AS agg_v FROM fz d WHERE "
                f"d.n_chars > {r.randint(7000, 9800)} ORDER BY d.doc_id")
    if shape == "except_all_window":
        return ("SELECT source, ROW_NUMBER() OVER (PARTITION BY source "
                "ORDER BY source) AS rk FROM (SELECT source FROM fz "
                f"WHERE n_chars > {r.randint(3000, 9000)} EXCEPT ALL "
                "SELECT source FROM fz WHERE lang = "
                f"'{r.choice(['en', 'de', 'fr'])}') q "
                "ORDER BY source, rk")
    if shape == "intersect_all_window":
        # COUNT(*) OVER with ORDER BY on the partition key: the RANGE
        # frame includes all peers, so it equals the partition count
        return ("SELECT source, COUNT(*) OVER (PARTITION BY source "
                "ORDER BY source) AS c FROM (SELECT source FROM fz "
                f"WHERE n_chars > {r.randint(2000, 8000)} INTERSECT "
                "ALL SELECT source FROM fz WHERE rank_i > "
                f"{r.randint(-40, 40)}) q ORDER BY source, c")
    if shape == "grouping_sets":
        return ("SELECT source, lang, COUNT(*) AS n, "
                "CAST(SUM(n_chars) AS BIGINT) AS s FROM fz WHERE "
                f"n_chars > {r.randint(0, 8000)} GROUP BY GROUPING "
                "SETS ((source, lang), (source), ()) "
                "ORDER BY source, lang, n")
    return ("SELECT source, GROUPING(source) AS g, COUNT(*) AS n "
            f"FROM fz WHERE rank_i > {r.randint(-40, 40)} "
            "GROUP BY GROUPING SETS ((source), ()) ORDER BY source, g")


def _gen5(seed: int) -> str:
    return _v5_query(random.Random(50_000 + seed))


def test_sql_fuzz_parity_v5(fuzzenv2):
    """Grammar v5 (round-4 task #10): every shape is a supported
    construct — ZERO refusals tolerated, zero mismatches."""
    tables, con = fuzzenv2
    for seed in range(N_QUERIES):
        q = _gen5(seed)
        mine = sql_query(q, tables)
        if not isinstance(mine, pa.Table):
            from arcade_ray.collect import collect_arrow

            mine = collect_arrow(mine)
        oracle = con.execute(q).arrow()
        assert sorted(mine.column_names) == \
            sorted(oracle.column_names), (seed, q)
        assert mine.num_rows == oracle.num_rows, \
            (seed, q, mine.num_rows, oracle.num_rows)
        assert _norm(mine) == _norm(oracle), (seed, q)


# ---- grammar v6: ASOF shapes / partition-only windows / typed literals -----

def _v6_query(r: random.Random) -> str:
    shape = r.choice(["asof", "part_only_window", "ts_literal",
                      "ts_literal_corr"])
    if shape == "asof":
        op = r.choice([">=", ">", "<=", "<"])
        jt = r.choice(["ASOF JOIN", "ASOF LEFT JOIN"])
        cut = r.randint(1000, 9000)
        return (f"SELECT l.doc_id, r.n_chars AS rn FROM "
                f"(SELECT doc_id, source, ts FROM fz WHERE "
                f"n_chars >= {cut}) l {jt} "
                f"(SELECT source, ts, n_chars FROM fz WHERE "
                f"n_chars < {cut}) r "
                f"ON l.source = r.source AND l.ts {op} r.ts "
                "ORDER BY l.doc_id")
    if shape == "part_only_window":
        agg = r.choice(["SUM(n_chars)", "COUNT(*)", "MIN(rank_i)",
                        "MAX(rank_i)", "AVG(n_chars)"])
        return (f"SELECT doc_id, {agg} OVER (PARTITION BY source) "
                f"AS w FROM fz WHERE n_chars > {r.randint(0, 9000)} "
                "ORDER BY doc_id")
    if shape == "ts_literal":
        day = r.randint(2, 25)
        return ("SELECT doc_id FROM fz WHERE ts BETWEEN "
                f"TIMESTAMP '2024-01-{day:02d} 00:00:00' AND "
                f"TIMESTAMP '2024-06-{day:02d} 12:00:00' "
                f"AND rank_i > {r.randint(-40, 40)} ORDER BY doc_id")
    return ("SELECT d.doc_id, (SELECT CAST(COUNT(*) AS BIGINT) FROM "
            "fz f2 WHERE f2.source = d.source AND f2.ts >= "
            f"TIMESTAMP '2024-0{r.randint(1, 9)}-01 00:00:00') AS c "
            f"FROM fz d WHERE d.n_chars > {r.randint(8000, 9800)} "
            "ORDER BY d.doc_id")


def _gen6(seed: int) -> str:
    return _v6_query(random.Random(60_000 + seed))


def test_sql_fuzz_parity_v6(fuzzenv2):
    """Grammar v6: the round-5 SQL surface (all four ASOF shapes,
    partition-only window aggregates, typed TIMESTAMP literals,
    correlated scalars over timestamp residuals) — zero refusals
    tolerated, zero mismatches."""
    tables, con = fuzzenv2
    for seed in range(N_QUERIES):
        q = _gen6(seed)
        mine = sql_query(q, tables)
        if not isinstance(mine, pa.Table):
            from arcade_ray.collect import collect_arrow

            mine = collect_arrow(mine)
        oracle = con.execute(q).arrow()
        assert sorted(mine.column_names) == \
            sorted(oracle.column_names), (seed, q)
        assert mine.num_rows == oracle.num_rows, \
            (seed, q, mine.num_rows, oracle.num_rows)
        assert _norm(mine) == _norm(oracle), (seed, q)


# ---- grammar v7: ON residuals / LIKE ESCAPE / const-expr folding -----------

def _v7_query(r: random.Random) -> str:
    shape = r.choice(["on_residual", "like_escape", "const_fold",
                      "interval"])
    if shape == "on_residual":
        op = r.choice(["<", ">", "<=", ">=", "<>"])
        return ("SELECT f.doc_id, d.weight FROM fz f JOIN dim d ON "
                f"f.source = d.source AND f.rank_i {op} d.weight - "
                f"{r.randint(0, 60)} ORDER BY f.doc_id, d.weight")
    if shape == "like_escape":
        pat = r.choice(["d00!_%", "%0!_1%", "d!_%"])
        return ("SELECT doc_id FROM fz WHERE doc_id LIKE "
                f"'{pat}' ESCAPE '!' ORDER BY doc_id")
    if shape == "const_fold":
        return ("SELECT doc_id FROM fz WHERE n_chars > "
                f"{r.randint(1, 80)} * 100 + {r.randint(0, 99)} "
                "ORDER BY doc_id")
    day = r.randint(2, 20)
    unit = r.choice(["DAY", "HOUR"])
    k = r.randint(1, 48)
    return ("SELECT doc_id FROM fz WHERE ts < TIMESTAMP "
            f"'2024-02-{day:02d} 00:00:00' - INTERVAL {k} {unit} "
            f"AND rank_i > {r.randint(-40, 40)} ORDER BY doc_id")


def _gen7(seed: int) -> str:
    return _v7_query(random.Random(70_000 + seed))


def test_sql_fuzz_parity_v7(fuzzenv2):
    """Grammar v7: inner-join ON residuals, LIKE ESCAPE,
    constant-expression folding and INTERVAL arithmetic — zero
    refusals tolerated, zero mismatches."""
    tables, con = fuzzenv2
    for seed in range(N_QUERIES):
        q = _gen7(seed)
        mine = sql_query(q, tables)
        if not isinstance(mine, pa.Table):
            from arcade_ray.collect import collect_arrow

            mine = collect_arrow(mine)
        oracle = con.execute(q).arrow()
        assert sorted(mine.column_names) == \
            sorted(oracle.column_names), (seed, q)
        assert mine.num_rows == oracle.num_rows, \
            (seed, q, mine.num_rows, oracle.num_rows)
        assert _norm(mine) == _norm(oracle), (seed, q)
