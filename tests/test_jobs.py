"""End-to-end subprocess tests for the `ray job submit` entrypoints
(jobs/encode_job.py, jobs/clean_job.py) — each owns its own Ray
session in a child process, exactly as a Ray Job would run it."""
import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, RAY_ADDRESS="local")
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True,
                          timeout=timeout)


def test_encode_job_and_resume(tmp_path):
    from arcade_ray.corpus import generate_corpus

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(generate_corpus(3000, 4, seed=5), p)
    out = str(tmp_path / "enc")
    r = _run(["jobs/encode_job.py", "--input", p, "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] == 3000 and res["partitions"] >= 4
    # resume probe: a re-submit must re-encode nothing
    r2 = _run(["jobs/encode_job.py", "--input", p, "--out", out])
    assert r2.returncode == 0, r2.stderr[-2000:]
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2["rows"] == 3000
    # byte identity proves nothing re-encoded (a timing assert here
    # would be flaky on a loaded host)
    assert res2["partitions"] == res["partitions"]
    assert res2["enc_bytes"] == res["enc_bytes"]


def test_clean_job(tmp_path):
    import ast

    docs = pa.table({
        "doc_id": pa.array(list(range(40)), type=pa.int64()),
        "text": pa.array(
            ["the quick brown fox jumps over a lazy dog number %d ok"
             % i for i in range(38)]
            + ["dup dup dup dup dup dup dup dup dup dup dup dup",
               "mail me at a.b@example.com now the quick brown fox"]),
    })
    p = str(tmp_path / "docs.parquet")
    pq.write_table(docs, p)
    out = str(tmp_path / "clean")
    r = _run(["jobs/clean_job.py", "--input", p, "--out", out,
              "--max-dup-frac", "0.5", "--max-len", "32"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = ast.literal_eval(r.stdout.strip().splitlines()[-1])
    assert res["input_docs"] == 40
    assert res["examples"] > 0
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    t = pa.concat_tables([pq.read_table(os.path.join(out, f))
                          for f in files])
    # packed training examples: fixed-length int32 token rows
    assert t.num_rows == res["examples"]
    # unpadded tails may be shorter; everything else is exactly max_len
    lens = [len(x) for x in t["input_ids"].to_pylist()]
    assert max(lens) == 32 and all(n <= 32 for n in lens)
