"""Distributed round-trip verifier: matches on identical data, catches
any mutation."""

import numpy as np
import pyarrow as pa
import pytest

from arcade_ray.corpus import generate_corpus
from arcade_ray.pipeline import encode_dataset
from arcade_ray.pipeline.verify import table_fingerprint, verify_roundtrip


def test_fingerprint_order_insensitive():
    t = generate_corpus(500, 4, seed=51)
    idx = np.random.default_rng(0).permutation(500)
    shuffled = t.take(pa.array(idx, type=pa.int64()))
    assert table_fingerprint(t) == (500, table_fingerprint(shuffled)[1])


def test_fingerprint_detects_changes():
    t = generate_corpus(300, 4, seed=52)
    _, h0 = table_fingerprint(t)
    # mutate one token
    tokens = t["tokens"].to_pylist()
    tokens[5] = list(tokens[5])
    tokens[5][0] = tokens[5][0] ^ 1
    t2 = t.set_column(1, "tokens", pa.array(tokens, type=pa.list_(pa.int32())))
    assert table_fingerprint(t2)[1] != h0
    # swapping two tokens inside one row changes the row hash too
    tokens[5] = list(t["tokens"][5].as_py())
    if len(tokens[5]) >= 2 and tokens[5][0] != tokens[5][1]:
        tokens[5][0], tokens[5][1] = tokens[5][1], tokens[5][0]
        t3 = t.set_column(1, "tokens", pa.array(tokens, type=pa.list_(pa.int32())))
        assert table_fingerprint(t3)[1] != h0


def test_verify_roundtrip_pipeline(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    table = generate_corpus(5000, 6, seed=53)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(table, corpus)
    out_dir = str(tmp_path / "enc")
    encode_dataset(rd.read_parquet(corpus), out_dir, weight_cap=120_000)

    report = verify_roundtrip(out_dir, corpus)
    assert report["match"], report
    assert report["rows_encoded"] == report["rows_input"] == 5000

    # corrupt one partition -> mismatch detected
    import glob
    import json
    import os

    mrow = sorted(glob.glob(os.path.join(out_dir, "manifest", "*.json")))[0]
    victim = json.load(open(mrow))["path"]
    data = bytearray(open(victim, "rb").read())
    data[-3] ^= 0xFF  # flip bits in the last chunk payload
    open(victim, "wb").write(bytes(data))
    report2 = verify_roundtrip(out_dir, corpus)
    assert not report2["match"]
