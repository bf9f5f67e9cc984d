"""End-to-end CLI drive in one subprocess (own Ray session)."""

import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from arcade_ray.corpus import generate_corpus

SCRIPT = """
import sys
from arcade_ray.cli import main
corpus, enc = sys.argv[1], sys.argv[2]
main(["--num-cpus", "4", "compress", corpus, enc])
main(["stats", enc])
main(["--num-cpus", "4", "filter", enc, "source", "src-001", "--project", "source,doc_id"])
main(["--num-cpus", "4", "random-access", enc, "0,4999", "--columns", "doc_id"])
main(["--num-cpus", "4", "verify", enc, corpus])
main(["--num-cpus", "4", "compound-filter", enc, "--eq", "source=src-001",
      "--between", "n_tok=1,100000", "--project", "doc_id,source"])
main(["--num-cpus", "4", "group-agg", enc, "source", "n_tok"])
main(["--num-cpus", "4", "join", enc, enc, "--on", "doc_id=doc_id",
      "--probe-cols", "doc_id,n_tok", "--build-cols", "source"])
main(["--num-cpus", "4", "delete", enc, "--eq", "source=src-001"])
main(["--num-cpus", "4", "delete", enc, "--eq", "source=src-001", "--force"])
main(["--num-cpus", "4", "delete", enc, "--eq", "source=src-001", "--force"])
"""


def test_cli_end_to_end(tmp_path):
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(generate_corpus(5000, 6, seed=71), corpus)
    enc = str(tmp_path / "enc")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, corpus, enc],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout
    assert "Compressed 5000 rows" in lines
    assert '"rows": 5000' in lines
    assert "MATCH: 5000 encoded rows vs 5000 input rows" in lines
    assert "Returned 2 rows" in lines  # random access
    assert "8 groups" in lines or "6 groups" in lines  # group-agg
    assert "Joined" in lines or "Returned 5000 rows" in lines  # self-join
    assert "DRY RUN:" in lines and "pass --force" in lines
    assert "Deleted 0 rows" in lines  # idempotent second --force run


def test_cli_errors(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "stats", str(tmp_path / "nope")],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    # empty manifest -> zero partitions, not a crash
    assert out.returncode == 0
    assert '"partitions": 0' in out.stdout
