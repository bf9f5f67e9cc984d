"""Mimics the driver's correctness gate at sf0.001: run every
queries() entry AND its oracle_sql() through DuckDB on the same parquet
tables; compare row count, schema (column names) and order-insensitive
values (SURVEY.md §5.2 item 5)."""

import importlib.util
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _load_entry():
    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod(ray_session, tmp_path_factory, monkeypatch_module):
    cache = tmp_path_factory.mktemp("qcache")
    monkeypatch_module.setattr(
        "arcade_ray.entry_queries.CACHE_ROOT", str(cache), raising=True
    )
    return _load_entry()


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    m = MonkeyPatch()
    yield m
    m.undo()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    # ray Dataset
    return result.to_pandas()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize list columns for sorting/compare
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, tuple)) or df[c].dtype == object and len(df) and hasattr(df[c].iloc[0], "__len__") and not isinstance(df[c].iloc[0], str):
            df[c] = df[c].map(lambda v: tuple(v) if not isinstance(v, (str, bytes)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_oracle_parity_all_queries(entry_mod, ddb):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, fn in qs.items():
        ours = normalize(to_df(fn(SF_DIR)))
        if name not in oracles:
            assert len(ours) >= 0
            continue
        theirs = normalize(ddb.execute(oracles[name]).fetchdf())
        if list(ours.columns) != list(theirs.columns):
            failures.append((name, "columns", list(ours.columns), list(theirs.columns)))
            continue
        if len(ours) != len(theirs):
            failures.append((name, "rows", len(ours), len(theirs)))
            continue
        # The driver's value-hash is dtype-sensitive: an int64 engine column
        # vs a float64 oracle column (e.g. un-cast DuckDB HUGEINT SUM)
        # hash-mismatches even when values are equal. Catch kind skew here.
        kind_skew = [
            (c, str(ours[c].dtype), str(theirs[c].dtype))
            for c in ours.columns
            if ours[c].dtype.kind != theirs[c].dtype.kind
            and {ours[c].dtype.kind, theirs[c].dtype.kind} & {"i", "u", "f"}
        ]
        if kind_skew:
            failures.append((name, "dtype-kind", kind_skew))
            continue
        try:
            pd.testing.assert_frame_equal(
                ours.reset_index(drop=True),
                theirs.reset_index(drop=True),
                check_dtype=False,
            )
        except AssertionError as e:
            failures.append((name, "values", str(e)[:400]))
    assert not failures, failures


def test_entry_smoke(entry_mod):
    result = entry_mod.entry()
    df = to_df(result)
    assert len(df) >= 0
    assert "doc_id" in df.columns
