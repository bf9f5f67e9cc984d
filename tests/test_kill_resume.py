"""Hard-kill resume: SIGKILL an encode run mid-flight (separate
process, own Ray session), then resume and verify (a) committed
partitions are not re-encoded, (b) the final output is identical to an
uninterrupted run (SURVEY.md §5.2 item 6)."""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from arcade_ray.corpus import generate_corpus

ENCODE_SCRIPT = """
import ray, sys, logging
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
from arcade_ray.pipeline.encode import encode_parquet
encode_parquet(sys.argv[1], sys.argv[2], weight_cap=40_000)
print("DONE")
"""


def test_kill9_then_resume(tmp_path):
    import pyarrow.parquet as pq

    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(generate_corpus(8000, 8, seed=77), corpus)
    out_dir = str(tmp_path / "enc")
    mdir = os.path.join(out_dir, "manifest")

    # run 1: kill -9 once >=2 partitions are committed
    proc = subprocess.Popen([sys.executable, "-c", ENCODE_SCRIPT, corpus, out_dir],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    deadline = time.time() + 180
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid (weaker) run
        if os.path.isdir(mdir) and len(glob.glob(os.path.join(mdir, "*.json"))) >= 2:
            proc.kill()
            killed = True
            break
        time.sleep(0.05)
    proc.wait()
    committed_before = sorted(glob.glob(os.path.join(mdir, "*.json")))
    if killed:
        assert committed_before, "kill landed before any commit"
        assert not os.path.exists(os.path.join(out_dir, "manifest.parquet"))
    mtimes = {p: os.path.getmtime(json.load(open(p))["path"]) for p in committed_before}

    # run 2: resume to completion
    out = subprocess.run([sys.executable, "-c", ENCODE_SCRIPT, corpus, out_dir],
                         capture_output=True, text=True, timeout=240)
    assert "DONE" in out.stdout, out.stderr[-1500:]

    # committed partitions were not rewritten
    for p, t in mtimes.items():
        assert os.path.getmtime(json.load(open(p))["path"]) == t, p

    # decoded result == input
    from arcade_ray.format import decode_partition
    from arcade_ray.pipeline.encode import load_manifest

    manifest = load_manifest(out_dir)
    tables = [decode_partition(p) for p in manifest["path"].to_pylist()]
    got = pa.concat_tables(tables)
    want = pq.read_table(corpus)
    assert got.num_rows == want.num_rows
    a = got.take(pc.sort_indices(got["doc_id"]))
    b = want.take(pc.sort_indices(want["doc_id"]))
    for name in want.schema.names:
        assert a[name].combine_chunks().equals(
            b[name].combine_chunks().cast(a[name].type)), name


ZAPPEND_SCRIPT = """
import ray, sys, logging
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
import pyarrow as pa
import ray.data as rd
import pyarrow.parquet as pq
from arcade_ray.pipeline.encode import encode_dataset
t = pq.read_table(sys.argv[1])
encode_dataset(rd.from_arrow(t), sys.argv[2], key_col="event_type",
               id_col="event_id", weight_col=None,
               zorder_cols=["user_id", "ts"], generation="g1")
print("DONE")
"""


def test_clustered_append_kill_resume(tmp_path):
    """Round-5 clustered appends are resumable like any encode: a
    Z-order generation append killed mid-flight resumes without
    re-encoding committed partitions, reuses the SAME persisted
    Morton plan, and the final table matches an uninterrupted base +
    append union."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd

    from arcade_ray.pipeline.encode import encode_dataset

    rng = np.random.default_rng(3)
    n = 30_000
    base_tab = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 500, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()),
        "event_type": pa.array([f"t{i % 4}" for i in range(n)]),
    })
    app_tab = pa.table({
        "event_id": pa.array(np.arange(n, n + 8000), pa.int64()),
        "user_id": pa.array(rng.integers(0, 500, 8000), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, 8000), pa.int64()),
        "event_type": pa.array([f"t{i % 4}" for i in range(8000)]),
    })
    out_dir = str(tmp_path / "enc")
    encode_dataset(rd.from_arrow(base_tab), out_dir,
                   key_col="event_type", id_col="event_id",
                   weight_col=None, weight_cap=2000,
                   zorder_cols=["user_id", "ts"])
    with open(os.path.join(out_dir, "zorder_plan.json")) as f:
        plan_before = f.read()

    app_path = str(tmp_path / "app.parquet")
    pq.write_table(app_tab, app_path)
    mdir = os.path.join(out_dir, "manifest")
    n_base = len(glob.glob(os.path.join(mdir, "*.json")))

    proc = subprocess.Popen(
        [sys.executable, "-c", ZAPPEND_SCRIPT, app_path, out_dir],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    deadline = time.time() + 180
    while time.time() < deadline:
        if proc.poll() is not None:
            break
        if len(glob.glob(os.path.join(mdir, "*.json"))) >= n_base + 1:
            proc.kill()
            break
        time.sleep(0.02)
    proc.wait()

    # resume in-process (the session fixture Ray is fine here)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4,
                 include_dashboard=False, logging_level="ERROR")
    encode_dataset(rd.from_arrow(app_tab), out_dir,
                   key_col="event_type", id_col="event_id",
                   weight_col=None, zorder_cols=["user_id", "ts"],
                   generation="g1")
    with open(os.path.join(out_dir, "zorder_plan.json")) as f:
        assert f.read() == plan_before  # plan stable across the kill

    from arcade_ray.collect import collect_arrow
    from arcade_ray.pipeline.decode import decode_dataset

    got = collect_arrow(decode_dataset(
        out_dir, columns=["event_id", "user_id"]))
    want = pa.concat_tables([
        base_tab.select(["event_id", "user_id"]),
        app_tab.select(["event_id", "user_id"])])
    a = sorted(got["event_id"].to_pylist())
    b = sorted(want["event_id"].to_pylist())
    assert a == b
    assert got.num_rows == want.num_rows
