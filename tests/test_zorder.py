"""Z-order clustered layout: Morton key math, plan persistence,
end-to-end multi-column zone-map pruning, filter parity."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arcade_ray.zorder import (
    DEFAULT_BITS,
    _order_key,
    _spread,
    zorder_keys,
)


def test_spread_table():
    t = _spread(4, 2)
    assert t[0b0000] == 0
    assert t[0b0001] == 0b01
    assert t[0b0011] == 0b0101
    assert t[0b1111] == 0b01010101
    t3 = _spread(2, 3)
    assert t3[0b11] == 0b001001


def test_order_key_nulls_and_nans_bottom():
    a = pa.array([2.5, None, float("nan"), -1.0, 0.0], pa.float64())
    k = _order_key(a)
    assert k[1] == 0 and k[2] == 0          # null and NaN -> bottom
    assert k[3] < k[4] < k[0]               # -1.0 < 0.0 < 2.5


def test_zorder_keys_manual_plan():
    """Morton keys under a hand-built plan: rank interleaving is
    exact, and the key is monotone in each column when the other is
    fixed (the property zone-map pruning relies on)."""
    from arcade_ray.sketches import order_key_from_stream

    bvals = np.array([10, 20, 30], dtype=np.int64)
    bounds = [int(x) for x in order_key_from_stream(bvals, "i64")]
    plan = {"cols": ["a", "b"], "bits": 2,
            "boundaries": {"a": bounds, "b": bounds}}
    t = pa.table({"a": pa.array([5, 15, 25, 35], pa.int64()),
                  "b": pa.array([5, 5, 5, 5], pa.int64())})
    z = zorder_keys(t, plan)
    # b rank fixed at 0; a ranks 0..3 spread to bits (0, 2)
    assert z.tolist() == [0b0000, 0b0001, 0b0100, 0b0101]
    t2 = pa.table({"a": pa.array([5, 5], pa.int64()),
                   "b": pa.array([15, 35], pa.int64())})
    z2 = zorder_keys(t2, plan)
    assert z2.tolist() == [0b0010, 0b1010]


@pytest.fixture()
def events_tab():
    n = 6000
    rng = np.random.default_rng(17)
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 200, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()),
        "event_type": pa.array([f"t{i % 5}" for i in range(n)]),
    })


def test_zorder_encode_prunes_and_matches(ray_session, tmp_path,
                                          events_tab):
    """Encode z-ordered on (user_id, ts): a 2-D box predicate touches
    far fewer partitions than either column alone would suggest under
    hash layout, and the filter answer matches pandas exactly."""
    from arcade_ray.collect import collect_arrow
    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.pipeline.query import compound_filter

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    out = str(tmp_path / "enc")
    m = encode_parquet(src, out, key_col="event_type",
                       id_col="event_id", weight_col=None,
                       weight_cap=400, zorder_cols=["user_id", "ts"])
    assert os.path.exists(os.path.join(out, "zorder_plan.json"))
    stats = [json.loads(s) for s in m["col_stats"].to_pylist()]
    n_parts = len(stats)
    assert n_parts >= 8

    ulo, uhi = 50, 80
    tlo, thi = 10**8, 3 * 10**8

    def overlaps(st, col, a, b):
        return not (st[col]["max"] < a or st[col]["min"] > b)

    both = sum(1 for st in stats
               if overlaps(st, "user_id", ulo, uhi)
               and overlaps(st, "ts", tlo, thi))
    # a z-clustered box should hit a small minority of partitions;
    # hash layout would overlap essentially all of them
    assert both <= n_parts // 2, (both, n_parts)

    res = collect_arrow(compound_filter(
        out, ("and", [("between", "user_id", ulo, uhi),
                      ("between", "ts", tlo, thi)]),
        project=["event_id"]))
    df = events_tab.to_pandas()
    want = df[(df.user_id.between(ulo, uhi)) & (df.ts.between(tlo, thi))]
    assert sorted(res["event_id"].to_pylist()) == sorted(
        want.event_id.tolist())
    # the stored zorder column round-trips like any other
    assert "zorder" in stats[0]


def test_zorder_plan_persist_and_resume(ray_session, tmp_path,
                                        events_tab):
    """Resume reloads the persisted plan (boundaries identical),
    and a different column list on the same out_dir is refused."""
    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.zorder import load_zorder_plan

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    out = str(tmp_path / "enc")
    encode_parquet(src, out, key_col="event_type", id_col="event_id",
                   weight_col=None, weight_cap=400,
                   zorder_cols=["user_id", "ts"])
    plan1 = load_zorder_plan(out)
    m2 = encode_parquet(src, out, key_col="event_type",
                        id_col="event_id", weight_col=None,
                        weight_cap=400, zorder_cols=["user_id", "ts"])
    plan2 = load_zorder_plan(out)
    assert plan1 == plan2
    assert m2.num_rows >= 8  # resume consolidated, nothing re-encoded
    with pytest.raises(ValueError, match="zorder_plan"):
        load_zorder_plan(out, ["ts", "user_id"])


def test_zorder_validation(ray_session, tmp_path, events_tab):
    from arcade_ray.pipeline.encode import encode_parquet

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    with pytest.raises(ValueError, match="not in input"):
        encode_parquet(src, str(tmp_path / "e1"), key_col="event_type",
                       id_col="event_id", weight_col=None,
                       zorder_cols=["user_id", "nope"])
    with pytest.raises(ValueError, match="exclusive"):
        from arcade_ray.sources import read_parquet_clean

        from arcade_ray.pipeline.encode import encode_dataset

        encode_dataset(read_parquet_clean(src), str(tmp_path / "e2"),
                       key_col="event_type", id_col="event_id",
                       weight_col=None, zorder_cols=["user_id", "ts"],
                       range_partition_col="ts")


def test_zorder_three_columns(ray_session, tmp_path, events_tab):
    """3-column Morton key (stride 3): encode succeeds and a 3-D box
    predicate answer matches pandas."""
    from arcade_ray.collect import collect_arrow
    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.pipeline.query import compound_filter

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    out = str(tmp_path / "enc3")
    encode_parquet(src, out, key_col="event_type", id_col="event_id",
                   weight_col=None, weight_cap=500,
                   zorder_cols=["user_id", "ts", "event_id"])
    res = collect_arrow(compound_filter(
        out, ("and", [("between", "user_id", 0, 100),
                      ("between", "ts", 0, 5 * 10**8),
                      ("between", "event_id", 1000, 4000)]),
        project=["event_id"]))
    df = events_tab.to_pandas()
    want = df[df.user_id.between(0, 100) & df.ts.between(0, 5 * 10**8)
              & df.event_id.between(1000, 4000)]
    assert sorted(res["event_id"].to_pylist()) == sorted(
        want.event_id.tolist())


def test_cli_recluster_zorder(tmp_path, events_tab):
    """recluster: hash-layout encode -> z-ordered re-encode in a new
    dir; rows identical (sorted ids match), 2-D box pruning appears,
    and the source dir is untouched."""
    import subprocess
    import sys

    import duckdb

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    enc = str(tmp_path / "enc")
    zo = str(tmp_path / "zo")
    r1 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "compress", src, enc, "--key-col", "event_type",
         "--id-col", "event_id", "--weight-col", "", "--cap", "1500"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "recluster", enc, zo, "--zorder", "user_id,ts",
         "--key-col", "event_type", "--id-col", "event_id",
         "--cap", "400"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Reclustered 6000 rows" in r2.stdout
    out_dir = str(tmp_path / "dec")
    r3 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "scan", zo, "--columns", "event_id,user_id,ts",
         "--out", out_dir],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert r3.returncode == 0, r3.stderr[-2000:]
    got = duckdb.sql(
        f"SELECT count(*), sum(event_id), sum(user_id), sum(ts) "
        f"FROM read_parquet('{out_dir}/*.parquet')").fetchall()[0]
    df = events_tab.to_pandas()
    assert got == (6000, df.event_id.sum(), df.user_id.sum(),
                   df.ts.sum())
    # new dir is z-clustered: its manifest shows pruning structure
    from arcade_ray.pipeline.encode import load_manifest

    stats = [json.loads(s)
             for s in load_manifest(zo)["col_stats"].to_pylist()]
    assert len(stats) >= 8
    both = sum(1 for st in stats
               if not (st["user_id"]["max"] < 50
                       or st["user_id"]["min"] > 80)
               and not (st["ts"]["max"] < 10**8
                        or st["ts"]["min"] > 3 * 10**8))
    assert both <= len(stats) // 2


def test_zorder_review_fixes(ray_session, tmp_path, events_tab):
    """Review regressions: encode_parquet forwards range_partition_col
    into the exclusivity error, and a string zorder column fails fast
    with a clean ValueError instead of a remote-task traceback."""
    from arcade_ray.pipeline.encode import encode_parquet

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    with pytest.raises(ValueError, match="exclusive"):
        encode_parquet(src, str(tmp_path / "x1"), key_col="event_type",
                       id_col="event_id", weight_col=None,
                       zorder_cols=["user_id", "ts"],
                       range_partition_col="ts")
    with pytest.raises(ValueError, match="numeric/timestamp"):
        encode_parquet(src, str(tmp_path / "x2"), key_col="event_type",
                       id_col="event_id", weight_col=None,
                       zorder_cols=["event_type", "ts"])


def test_sql_insert_into_zorder_dir(ray_session, tmp_path, events_tab):
    """SQL INSERT into a Z-order-clustered dir (round-4 review gap):
    the append generation re-derives the Morton key from the persisted
    plan, rows land in range partitions matching the base layout, and
    clustered filters keep pruning across both generations. VACUUM
    then folds the generation into the base range partitions."""
    from arcade_ray.collect import collect_arrow
    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.sql import SqlUnsupported, sql_query

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    out = str(tmp_path / "enc")
    encode_parquet(src, out, key_col="event_type", id_col="event_id",
                   weight_col=None, weight_cap=400,
                   zorder_cols=["user_id", "ts"])
    tb = {"ev": out}

    r = sql_query(
        "INSERT INTO ev (event_id, user_id, ts, event_type) "
        "VALUES (900001, 55, 150000000, 'tx'), "
        "(900002, 190, 999999999, 'ty')", tb)
    assert r.to_pylist()[0]["rows_inserted"] == 2

    got = sql_query("SELECT event_id, user_id FROM ev "
                    "WHERE event_id >= 900001 ORDER BY event_id", tb)
    got = got if isinstance(got, pa.Table) else collect_arrow(got)
    assert got["event_id"].to_pylist() == [900001, 900002]

    # clustered 2-D filter still answers exactly over both generations
    res = sql_query("SELECT event_id FROM ev WHERE user_id BETWEEN 50 "
                    "AND 80 AND ts BETWEEN 100000000 AND 300000000", tb)
    res = res if isinstance(res, pa.Table) else collect_arrow(res)
    df = events_tab.to_pandas()
    want = sorted(df[(df.user_id.between(50, 80))
                     & (df.ts.between(10**8, 3 * 10**8))]
                  .event_id.tolist() + [900001])
    assert sorted(res["event_id"].to_pylist()) == want

    # a second INSERT without the zorder source columns refuses
    with pytest.raises(SqlUnsupported, match="clustering"):
        sql_query("INSERT INTO ev (event_id, event_type) "
                  "VALUES (900003, 'tz')", tb)
    # explicit zorder column in the collist refuses (derived)
    with pytest.raises(SqlUnsupported, match="derived"):
        sql_query("INSERT INTO ev (event_id, user_id, ts, event_type, "
                  "zorder) VALUES (900004, 1, 1, 'tz', 0)", tb)

    # VACUUM folds the generation; answers unchanged
    sql_query("VACUUM ev", tb)
    res2 = sql_query("SELECT count(*) AS n FROM ev", tb)
    res2 = res2 if isinstance(res2, pa.Table) else collect_arrow(res2)
    assert res2["n"][0].as_py() == events_tab.num_rows + 2


def test_sql_insert_into_range_dir(ray_session, tmp_path, events_tab):
    """SQL INSERT into a range-clustered dir reuses the BASE range
    plan's cut points for the append generation (no re-sampling), and
    range filters stay exact over both generations."""
    from arcade_ray.collect import collect_arrow
    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.sql import sql_query

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    out = str(tmp_path / "enc")
    encode_parquet(src, out, key_col="event_type", id_col="event_id",
                   weight_col=None, weight_cap=400,
                   range_partition_col="ts")
    tb = {"ev": out}
    r = sql_query(
        "INSERT INTO ev (event_id, user_id, ts, event_type) "
        "VALUES (900001, 55, 150000000, 'tx')", tb)
    assert r.to_pylist()[0]["rows_inserted"] == 1
    # the append generation reuses the base cut points
    import glob as _glob
    gen_plans = _glob.glob(os.path.join(out, "range_plan@ins0000.json"))
    assert gen_plans, "generation range plan not persisted"
    with open(gen_plans[0]) as f:
        gplan = json.load(f)
    with open(os.path.join(out, "range_plan.json")) as f:
        bplan = json.load(f)
    assert gplan["boundaries"] == bplan["boundaries"]

    res = sql_query("SELECT event_id FROM ev WHERE ts BETWEEN "
                    "100000000 AND 300000000", tb)
    res = res if isinstance(res, pa.Table) else collect_arrow(res)
    df = events_tab.to_pandas()
    want = sorted(df[df.ts.between(10**8, 3 * 10**8)]
                  .event_id.tolist() + [900001])
    assert sorted(res["event_id"].to_pylist()) == want


def test_sql_merge_into_zorder_dir(ray_session, tmp_path, events_tab):
    """MERGE upsert into a Z-order dir: matched rows rewrite in place,
    unmatched rows insert as a generation routed by the persisted
    Morton plan; a source missing the clustering columns refuses
    BEFORE any rewrite commits."""
    from arcade_ray.collect import collect_arrow
    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.sql import sql_query

    src = str(tmp_path / "ev.parquet")
    pq.write_table(events_tab, src)
    out = str(tmp_path / "enc")
    encode_parquet(src, out, key_col="event_type", id_col="event_id",
                   weight_col=None, weight_cap=400,
                   zorder_cols=["user_id", "ts"])
    upd = pa.table({
        "event_id": pa.array([0, 900010], pa.int64()),
        "user_id": pa.array([7, 120], pa.int64()),
        "ts": pa.array([123, 456789], pa.int64()),
        "event_type": pa.array(["tm", "tm"]),
    })
    tb = {"ev": out, "upd": upd}
    r = sql_query("MERGE INTO ev USING upd ON ev.event_id = "
                  "upd.event_id WHEN MATCHED THEN UPDATE SET "
                  "event_type = upd.event_type "
                  "WHEN NOT MATCHED THEN INSERT", tb)
    row = r.to_pylist()[0]
    assert row["rows_updated"] == 1 and row["rows_inserted"] == 1
    got = sql_query("SELECT event_id, event_type FROM ev WHERE "
                    "event_id IN (0, 900010) ORDER BY event_id", tb)
    got = got if isinstance(got, pa.Table) else collect_arrow(got)
    assert got["event_type"].to_pylist() == ["tm", "tm"]

    # missing clustering columns in the source: refuse upfront
    bad = pa.table({"event_id": pa.array([900020], pa.int64()),
                    "event_type": pa.array(["tq"])})
    tb["bad"] = bad
    with pytest.raises(ValueError, match="clustering"):
        sql_query("MERGE INTO ev USING bad ON ev.event_id = "
                  "bad.event_id WHEN MATCHED THEN UPDATE SET "
                  "event_type = bad.event_type "
                  "WHEN NOT MATCHED THEN INSERT", tb)
