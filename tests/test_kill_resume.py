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
