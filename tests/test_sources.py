"""CSV ingestion with token-string parsing -> encode round trip."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from arcade_ray.corpus import generate_corpus
from arcade_ray.sources import parse_tokens_batch, read_tokenized_csv


def test_parse_tokens_batch_unit():
    batch = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"]),
        "tokens": pa.array(["1 2 3", "", "42", "0 2147483647"]),
    })
    out = parse_tokens_batch(batch)
    assert out["tokens"].to_pylist() == [[1, 2, 3], [], [42], [0, 2147483647]]
    assert out["n_tok"].to_pylist() == [3, 0, 1, 2]
    assert out["tokens"].type == pa.list_(pa.int32())


def test_csv_roundtrip(ray_session, tmp_path):
    import csv

    import ray
    import ray.data as rd

    from arcade_ray.pipeline import decode_dataset, encode_dataset

    table = generate_corpus(3000, 4, seed=41)
    csv_path = str(tmp_path / "corpus.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "tokens", "source"])
        for i in range(table.num_rows):
            w.writerow([
                table["doc_id"][i].as_py(),
                " ".join(str(t) for t in table["tokens"][i].as_py()),
                table["source"][i].as_py(),
            ])

    ds = read_tokenized_csv(csv_path)
    out_dir = str(tmp_path / "enc")
    manifest = encode_dataset(ds, out_dir, weight_cap=100_000)
    assert sum(manifest["rows"].to_pylist()) == 3000
    decoded = pa.concat_tables(ray.get(decode_dataset(out_dir).to_arrow_refs()))
    a = decoded.take(pc.sort_indices(decoded["doc_id"]))
    b = table.take(pc.sort_indices(table["doc_id"]))
    assert a["tokens"].combine_chunks().equals(
        b["tokens"].combine_chunks().cast(a["tokens"].type))
    assert a["n_tok"].to_pylist() == [int(x) for x in b["n_tok"].to_pylist()]
