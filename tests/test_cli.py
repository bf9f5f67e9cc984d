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
main(["--num-cpus", "4", "update", enc, "--set", "source=relabeled",
      "--eq", "source=src-002", "--between", "n_tok=0,150"])
main(["--num-cpus", "4", "update", enc, "--set", "source=relabeled",
      "--eq", "source=src-002", "--between", "n_tok=0,150", "--force"])
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
    assert "Updated" in lines and "partitions rewritten" in lines
    assert "Deleted 0 rows" in lines  # idempotent second --force run


def test_cli_errors(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "stats", str(tmp_path / "nope")],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    # empty manifest -> zero partitions, not a crash
    assert out.returncode == 0
    assert '"partitions": 0' in out.stdout


def test_cli_dedup_and_pack(tmp_path):
    """dedup: survivors match COUNT(DISTINCT text); pack: token count
    conserved across fixed-length examples (both checked via an
    independent duckdb read of the CLI's parquet output)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 600
    t = pa.table({
        "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
        "text": pa.array([f"text-{i % 150}" for i in range(n)]),
        "tokens": pa.array([[j % 50 for j in range(i % 37 + 1)]
                            for i in range(n)],
                           type=pa.list_(pa.int32())),
    })
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)

    ded = str(tmp_path / "ded")
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "dedup", src, ded],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "150 survivors" in out.stdout

    pk = str(tmp_path / "pk")
    out2 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "pack", src, pk, "--max-len", "64", "--shards", "2"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    total = duckdb.sql(
        f"SELECT sum(n_filled), sum(CASE WHEN n_filled < 64 THEN 1 "
        f"ELSE 0 END) FROM read_parquet('{pk}/*.parquet')").fetchall()[0]
    want = duckdb.sql(
        f"SELECT sum(len(tokens)) FROM read_parquet('{src}')").fetchall()[0][0]
    assert total[0] == want
    assert total[1] <= 2  # shards=2 -> at most two short tails


def test_cli_stats_distinct_estimates(tmp_path):
    """stats surfaces global per-column KMV distinct estimates merged
    from the manifest (k=64 -> ~12.5% stderr; exact below k)."""
    import json as _json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 5000
    t = pa.table({
        "doc_id": pa.array([f"d{i:05d}" for i in range(n)]),
        "source": pa.array([f"s{i % 6}" for i in range(n)]),
        "n_tok": pa.array((np.arange(n) % 700).astype(np.int64)),
        "tokens": pa.array([[i % 40] for i in range(n)],
                           type=pa.list_(pa.int32())),
    })
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    enc = str(tmp_path / "enc")
    r = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "compress", src, enc, "--key-col", "source",
         "--id-col", "doc_id", "--weight-col", "n_tok"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "stats", enc],
        capture_output=True, text=True, timeout=60, cwd="/root/repo")
    est = _json.loads(out.stdout)["distinct_est"]
    assert est["source"] == 6          # below k: exact
    assert abs(est["doc_id"] - n) / n < 0.45      # ~3.5 sigma at k=64
    assert abs(est["n_tok"] - 700) / 700 < 0.45


def test_cli_decontaminate(tmp_path):
    """decontaminate: docs sharing the planted 3-gram with the eval
    file are dropped (duckdb cross-check of the CLI's parquet out)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    span = " ".join(f"tok{i}" for i in range(13))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            f"padding words {span} more padding",
            "a clean document about something else",
            f"{span}",
            "another clean unrelated document body",
        ]),
    })
    src = str(tmp_path / "in.parquet")
    ev = str(tmp_path / "eval.parquet")
    pq.write_table(t, src)
    pq.write_table(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array([f"eval includes {span} verbatim"]),
    }), ev)

    out_dir = str(tmp_path / "decon")
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "decontaminate", src, ev, out_dir],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "2 survivors" in out.stdout
    kept = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{out_dir}/*.parquet') "
        "ORDER BY doc_id").fetchall()
    assert [r[0] for r in kept] == [2, 4]


def test_cli_search_vocab_passage_dedup(tmp_path):
    """search: BM25 top hit is the doc densest in the query terms;
    vocab: most frequent word gets id 0 and tokenize round-trips it;
    passage-dedup: the doc made of a corpus-duplicated 13-gram drops."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    span = " ".join(f"w{i}" for i in range(13))
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(5)]),
        "text": pa.array([
            "apple banana apple apple",
            "banana cherry banana filler filler filler",
            f"{span}",
            f"unique leading words then {span} and a long clean tail "
            "of many more original words to dilute the duplicated part "
            "well below the gate threshold for this document",
            "cherry only here",
        ]),
    })
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)

    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "search", src, "apple", "-k", "2"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "1 matching docs" in out.stdout
    assert "d0" in out.stdout

    vocab_out = str(tmp_path / "vocab.parquet")
    tok_out = str(tmp_path / "tok")
    out2 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "vocab", src, vocab_out, "--size", "16",
         "--tokens-out", tok_out],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "tokenized 5 docs" in out2.stdout
    vocab = pq.read_table(vocab_out)
    assert vocab.num_rows <= 16
    # ids start at 1 (0 = OOV); "apple" (x3) wins the freq-desc,
    # word-asc tie-break against "filler" (x3)
    top = duckdb.sql(
        f"SELECT word FROM read_parquet('{vocab_out}') "
        "WHERE id = 1").fetchall()[0][0]
    assert top == "apple"
    n_tok_d0 = duckdb.sql(
        f"SELECT len(tokens) FROM read_parquet('{tok_out}/*.parquet') "
        "WHERE doc_id = 'd0'").fetchall()[0][0]
    assert n_tok_d0 == 4

    ded_out = str(tmp_path / "pdd")
    out3 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "passage-dedup", src, ded_out, "--ngram", "13",
         "--max-frac", "0.5"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out3.returncode == 0, out3.stderr[-2000:]
    survivors = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{ded_out}/*.parquet') "
        "ORDER BY doc_id").fetchall()
    ids = [r[0] for r in survivors]
    assert "d2" not in ids          # 100% duplicated n-grams -> dropped
    assert "d3" in ids              # diluted below the gate -> kept
    assert {"d0", "d1", "d4"} <= set(ids)


def test_cli_semdedup(tmp_path):
    """semdedup: a planted exact clone is dropped, distinct vectors
    survive (duckdb cross-check of the CLI's parquet output)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((120, 12))
    mat[119] = mat[7]  # exact clone of vec 7
    t = pa.table({
        "vec_id": pa.array(np.arange(120), pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float32())),
    })
    src = str(tmp_path / "emb.parquet")
    pq.write_table(t, src)
    out_dir = str(tmp_path / "sd")
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "semdedup", src, out_dir, "--threshold", "0.999", "-k", "4"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "119 survivors" in out.stdout
    kept = {r[0] for r in duckdb.sql(
        f"SELECT vec_id FROM read_parquet('{out_dir}/*.parquet')").fetchall()}
    assert 7 in kept and 119 not in kept  # ties keep the smaller id


def test_cli_compress_csv(tmp_path):
    """compress --format csv: the delimited token column parses into
    list<int32> and round-trips through verify-by-scan (duckdb sums
    match the CSV's own token count)."""
    import csv as _csv

    import duckdb

    src = str(tmp_path / "in.csv")
    n = 400
    with open(src, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["doc_id", "source", "tokens"])
        for i in range(n):
            toks = " ".join(str((i * 7 + j) % 100)
                            for j in range(i % 9 + 1))
            w.writerow([f"d{i:04d}", f"s{i % 3}", toks])
    enc = str(tmp_path / "enc")
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "compress", src, enc, "--format", "csv", "--weight-col", ""],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"Compressed {n} rows" in out.stdout
    dec = str(tmp_path / "dec")
    out2 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "scan", enc, "--columns", "doc_id,tokens", "--out", dec],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    got = duckdb.sql(
        f"SELECT count(*), sum(len(tokens)), sum(tokens[1]) "
        f"FROM read_parquet('{dec}/*.parquet')").fetchall()[0]
    want_len = sum(i % 9 + 1 for i in range(n))
    want_first = sum((i * 7) % 100 for i in range(n))
    assert got == (n, want_len, want_first)


def test_cli_compress_jsonl(tmp_path):
    """compress --format jsonl with DEFAULT --weight-col n_tok: the
    derived token count appears so the weight-based planner works."""
    import json as _json

    import duckdb

    src = str(tmp_path / "in.jsonl")
    n = 120
    with open(src, "w") as f:
        for i in range(n):
            f.write(_json.dumps({
                "doc_id": f"d{i:03d}", "source": f"s{i % 2}",
                "tokens": [j for j in range(i % 7 + 1)]}) + "\n")
    enc = str(tmp_path / "enc")
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "compress", src, enc, "--format", "jsonl"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"Compressed {n} rows" in out.stdout
    dec = str(tmp_path / "dec")
    out2 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "scan", enc, "--columns", "doc_id,tokens,n_tok",
         "--out", dec],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    got = duckdb.sql(
        f"SELECT count(*), sum(n_tok), sum(len(tokens)) "
        f"FROM read_parquet('{dec}/*.parquet')").fetchall()[0]
    want = sum(i % 7 + 1 for i in range(n))
    assert got == (n, want, want)


def test_cli_tfidf_to_semdedup(tmp_path):
    """Model-free semantic dedup end to end through the CLI: tfidf
    vectors -> semdedup drops the doc with duplicated TEXT."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "completely different content here",
             "yet another unrelated document"]
    src = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": pa.array(texts)}), src)
    vec = str(tmp_path / "vec")
    out = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "tfidf", src, vec, "--dim", "64"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "4 dense vectors" in out.stdout
    sd = str(tmp_path / "sd")
    out2 = subprocess.run(
        [sys.executable, "-m", "arcade_ray.cli", "--num-cpus", "4",
         "semdedup", vec, sd, "--threshold", "0.999", "-k", "2",
         "--id-col", "doc_id"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "3 survivors" in out2.stdout
    kept = {r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sd}/*.parquet')").fetchall()}
    assert 10 in kept and 11 not in kept


SQL_CTAS_SCRIPT = """
import sys
from arcade_ray.cli import main
corpus, enc, enc2 = sys.argv[1], sys.argv[2], sys.argv[3]
main(["--num-cpus", "4", "compress", corpus, enc])
main(["--num-cpus", "4", "sql",
      "SELECT doc_id, source, n_tok FROM c WHERE n_tok > 40",
      "--table", "c=" + enc, "--encode-out", enc2, "--key-col", "source"])
main(["--num-cpus", "4", "sql",
      "SELECT source, COUNT(*) AS n FROM c2 GROUP BY source "
      "ORDER BY source",
      "--table", "c2=" + enc2])
"""


def test_cli_sql_ctas_roundtrip(tmp_path):
    """SQL result written back as an ENCODED dataset, then queried."""
    import duckdb

    corpus = str(tmp_path / "c.parquet")
    pq.write_table(generate_corpus(4000, 5, seed=73), corpus)
    enc, enc2 = str(tmp_path / "enc"), str(tmp_path / "enc2")
    out = subprocess.run(
        [sys.executable, "-c", SQL_CTAS_SCRIPT, corpus, enc, enc2],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Encoded" in out.stdout
    exp = duckdb.sql(
        f"SELECT source, COUNT(*) AS n FROM read_parquet('{corpus}') "
        "WHERE n_tok > 40 GROUP BY source ORDER BY source").fetchall()
    for src_name, n in exp:
        assert f"{src_name}" in out.stdout and str(n) in out.stdout


def test_cli_sql_script_mode(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from arcade_ray.cli import cmd_sql
    from arcade_ray.pipeline.encode import encode_parquet

    t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(30)]),
                  "source": pa.array([f"s{i % 3}" for i in range(30)]),
                  "n": pa.array(list(range(30)), type=pa.int64())})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "enc")
    encode_parquet(p, out, key_col="source", id_col="doc_id",
                   weight_col=None)
    script = tmp_path / "s.sql"
    script.write_text(
        "-- pipeline\n"
        "CREATE TABLE agg PARTITION BY (source) AS "
        "SELECT source, COUNT(*) AS c FROM t GROUP BY source;\n"
        "SELECT SUM(c) AS total FROM agg;\n"
        "SHOW TABLES;\n"
        "DROP TABLE agg\n")
    binding = [f"t={out}"]

    class A:
        query = None
        file = str(script)
        table = binding
        workspace = str(tmp_path / "ws")
        show = 20
        explain = False
        encode_out = None
        out = None

    cmd_sql(A())
    o = capsys.readouterr().out
    assert "total" in o and "agg" in o and "script done" in o
    import os as _os

    assert not _os.path.exists(str(tmp_path / "ws" / "agg"))
