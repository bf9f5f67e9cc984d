"""Dress rehearsal for the driver's correctness gate at sf0.01:
run every queries() entry and its oracle_sql() on /root/testdata/sf0.01,
compare rows/columns/values like tests/test_oracle_parity.py does.
Standalone (owns its Ray session).

Run from the repo root (or with PYTHONPATH=/root/repo — the script
imports arcade_ray via __ray_entry__). Convention: run at BOTH 32 and
4 CPUs (REH_CPUS) with a fresh cache each time — different block
boundaries surface different bugs:

    rm -rf /tmp/arcade_ray_cache && REH_CPUS=32 python tools/dress_rehearsal.py
    rm -rf /tmp/arcade_ray_cache && REH_CPUS=4  python tools/dress_rehearsal.py
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import importlib.util
import json
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa
import ray

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def to_df(result):
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, tuple)) or df[c].dtype == object and len(df) and hasattr(df[c].iloc[0], "__len__") and not isinstance(df[c].iloc[0], str):
            df[c] = df[c].map(lambda v: tuple(v) if not isinstance(v, (str, bytes)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    only = sys.argv[1:] or None
    ray.init(address="local", num_cpus=int(__import__("os").environ.get("REH_CPUS", "32")), include_dashboard=False,
             ignore_reinit_error=True)
    mod = _load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = normalize(to_df(fn(SF_DIR)))
        except Exception as e:
            results[name] = ("ERR", f"{type(e).__name__}: {e}"[:300])
            print(f"{name}: ERR {e}", flush=True)
            continue
        dt = time.time() - t0
        if name not in oracles:
            results[name] = ("rows_only", len(ours))
            print(f"{name}: rows_only n={len(ours)} ({dt:.1f}s)", flush=True)
            continue
        theirs = normalize(con.execute(oracles[name]).fetchdf())
        if list(ours.columns) != list(theirs.columns):
            results[name] = ("COLS", list(ours.columns), list(theirs.columns))
        elif len(ours) != len(theirs):
            results[name] = ("ROWS", len(ours), len(theirs))
        else:
            kind_skew = [
                (c, str(ours[c].dtype), str(theirs[c].dtype))
                for c in ours.columns
                if ours[c].dtype.kind != theirs[c].dtype.kind
                and {ours[c].dtype.kind, theirs[c].dtype.kind} & {"i", "u", "f"}]
            if kind_skew:
                results[name] = ("DTYPE", kind_skew)
            else:
                try:
                    pd.testing.assert_frame_equal(
                        ours.reset_index(drop=True),
                        theirs.reset_index(drop=True), check_dtype=False)
                    results[name] = ("pass", len(ours))
                except AssertionError as e:
                    results[name] = ("VALUES", str(e)[:300])
        tag = results[name][0]
        print(f"{name}: {tag} ({dt:.1f}s)", flush=True)
    bad = {k: v for k, v in results.items() if v[0] not in ("pass", "rows_only")}
    print(json.dumps({"total": len(results), "bad": bad}, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
