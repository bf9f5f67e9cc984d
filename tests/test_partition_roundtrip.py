"""Partition-level encode -> decode bit-identical round trip (no Ray).

SURVEY.md §5.2 item 3: the per-row invariant from BASELINE.json is
token-array equality after round trip, plus doc_id/source/n_tok
equality; also exercises multi-chunk shared-dict (diff) state across
chunk boundaries (SURVEY.md §7.3 item 3).
"""

import numpy as np
import pyarrow as pa
import pytest

from arcade_ray.corpus import generate_corpus
from arcade_ray.format import chunk_boundaries, decode_partition, encode_partition


def roundtrip(table: pa.Table, tmp_path, key="p0", **_):
    blob, manifest = encode_partition(table, key)
    path = str(tmp_path / f"{key}.arcr")
    with open(path, "wb") as f:
        f.write(blob)
    out = decode_partition(path)
    assert out.schema == table.schema
    assert out.num_rows == table.num_rows
    for name in table.schema.names:
        assert out[name].combine_chunks().equals(table[name].combine_chunks()), name
    return manifest, path


def test_corpus_roundtrip_small(tmp_path):
    table = generate_corpus(2000, 8, seed=42)
    manifest, _ = roundtrip(table, tmp_path)
    assert manifest["rows"] == 2000
    assert manifest["enc_bytes"] < manifest["raw_bytes"]


def test_corpus_roundtrip_multichunk(tmp_path):
    """Force several chunks so the shared-dict diff path crosses chunk
    boundaries (reference diff-dict chain, src/writer.cpp:167-253)."""
    import arcade_ray.format as fmt

    table = generate_corpus(5000, 4, seed=7)
    bounds = chunk_boundaries(table, rows_per_chunk=512)
    assert len(bounds) > 5
    blob, manifest = encode_partition_chunked(table, rows_per_chunk=512)
    path = str(tmp_path / "mc.arcr")
    with open(path, "wb") as f:
        f.write(blob)
    out = decode_partition(path)
    for name in table.schema.names:
        assert out[name].combine_chunks().equals(table[name].combine_chunks()), name


def encode_partition_chunked(table, rows_per_chunk):
    import arcade_ray.format as fmt
    from arcade_ray.constants import BLOCK_ROWS

    orig = fmt.chunk_boundaries
    fmt_chunk = lambda t, rows_per_chunk=rows_per_chunk, values_per_chunk=fmt.DEFAULT_VALUES_PER_CHUNK: orig(
        t, rows_per_chunk, values_per_chunk
    )
    fmt.chunk_boundaries, saved = fmt_chunk, orig
    try:
        return fmt.encode_partition(table, "mc")
    finally:
        fmt.chunk_boundaries = saved


def test_empty_partition(tmp_path):
    table = generate_corpus(10, 2).slice(0, 0)
    blob, manifest = encode_partition(table, "empty")
    path = str(tmp_path / "empty.arcr")
    with open(path, "wb") as f:
        f.write(blob)
    out = decode_partition(path)
    assert out.num_rows == 0
    assert out.schema == table.schema


def test_testdata_tables_roundtrip(tmp_path):
    """Every /root/testdata table type round-trips (int64, double,
    timestamp, string, list<float>)."""
    import pyarrow.parquet as pq

    for name in ("documents", "lineitem", "events", "embeddings", "orders"):
        table = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
        roundtrip(table, tmp_path, key=name)


def test_projection_decode(tmp_path):
    table = generate_corpus(1000, 4)
    _, path = roundtrip(table, tmp_path, key="proj")
    out = decode_partition(path, columns=["source", "n_tok"])
    assert out.column_names == ["source", "n_tok"]
    assert out["source"].combine_chunks().equals(table["source"].combine_chunks())


def test_chunk_mask_decode(tmp_path):
    table = generate_corpus(3000, 4)
    blob, _ = encode_partition_chunked(table, rows_per_chunk=1000)
    path = str(tmp_path / "mask.arcr")
    with open(path, "wb") as f:
        f.write(blob)
    out = decode_partition(path, chunk_mask=[False, True, False])
    expect = table.slice(1000, 1000)
    for name in table.schema.names:
        assert out[name].combine_chunks().equals(expect[name].combine_chunks()), name


def test_zone_maps_in_manifest(tmp_path):
    import json

    table = generate_corpus(2000, 8)
    manifest, _ = roundtrip(table, tmp_path, key="zm")
    stats = json.loads(manifest["col_stats"])
    assert "source" in stats and stats["source"]["min"] == "src-000"
    assert stats["n_tok"]["min"] >= 1


def test_all_supported_type_tags(tmp_path):
    """Every declared type tag round-trips (date32, ts_ns, i16, u32
    have no testdata column — covered here)."""
    import datetime

    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(100)]),
        "d32": pa.array([datetime.date(2020, 1, 1 + i % 28) for i in range(100)],
                        type=pa.date32()),
        "tns": pa.array(np.arange(100) * 1_000_000_007, type=pa.timestamp("ns")),
        "i16": pa.array(np.arange(100, dtype=np.int16), type=pa.int16()),
        "u32": pa.array(np.arange(100, dtype=np.uint32) * 40_000_000,
                        type=pa.uint32()),
        "f32": pa.array(np.arange(100, dtype=np.float32) / 7, type=pa.float32()),
    })
    roundtrip(t, tmp_path, key="tags")


def test_row_selective_decode_matches_full_take():
    """decode(sel=idx) must equal full decode + take for every column
    kind (str dict/plain, ints, floats, lists, nulls)."""
    import numpy as np

    from arcade_ray.corpus import generate_corpus
    from arcade_ray.format import decode_partition, encode_partition
    import arcade_ray.format as fmt

    table = generate_corpus(3000, 5, seed=31)
    # add a null-bearing column; force many small chunks
    import pyarrow as pa

    mask = np.arange(3000) % 11 == 0
    vals = np.arange(3000, dtype=np.int64)
    nullable = pa.array([None if m else int(v) for m, v in zip(mask, vals)],
                        type=pa.int64())
    table = table.append_column("nullable", nullable)
    orig = fmt.chunk_boundaries
    fmt.chunk_boundaries = (
        lambda t, rows_per_chunk=500, values_per_chunk=fmt.DEFAULT_VALUES_PER_CHUNK:
        orig(t, 500, values_per_chunk))
    try:
        blob, _ = encode_partition(table, "p0")
    finally:
        fmt.chunk_boundaries = orig
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".arcr", delete=False) as f:
        f.write(blob)
        path = f.name
    header, _ = fmt.read_header(path)
    n_chunks = len(header["chunk_rows"])
    rng = np.random.default_rng(7)
    row_sel = []
    for _, nrows in header["chunk_rows"]:
        k = max(1, nrows // 7)
        row_sel.append(np.sort(rng.choice(nrows, size=k, replace=False)))
    full = decode_partition(path)
    sel_tab = decode_partition(path, row_sel=row_sel)
    offs = np.concatenate([[0], np.cumsum([r for _, r in header["chunk_rows"]])])
    take = np.concatenate([s + offs[i] for i, s in enumerate(row_sel)])
    import pyarrow as pa

    expect = full.take(pa.array(take, type=pa.int64()))  # noqa
    for name in full.column_names:
        assert sel_tab[name].combine_chunks().equals(
            expect[name].combine_chunks()), name


def test_list_string_roundtrip():
    """list<string> columns (multi-tag metadata — the round-2 typed
    hole): lengths int stream + flattened values through the adaptive
    string encoder, dict state shared across chunks."""
    import numpy as np

    from arcade_ray.format import decode_partition, encode_partition

    rng = np.random.default_rng(5)
    tags = ["news", "web", "code", "wiki", "forum", "paper"]
    n = 3000
    col = [[tags[t] for t in rng.integers(0, len(tags),
                                          rng.integers(0, 5))]
           for _ in range(n)]
    col[17] = []  # empty list
    t = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "tags": pa.array(col, type=pa.list_(pa.string())),
    })
    blob, row = encode_partition(t, "p0")
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".arcr", delete=False) as f:
        f.write(blob)
        path = f.name
    out = decode_partition(path)
    assert out["tags"].combine_chunks().equals(t["tags"].combine_chunks())
    assert out["doc_id"].combine_chunks().equals(t["doc_id"].combine_chunks())
    # projection decode of the list column alone
    only = decode_partition(path, columns=["tags"])
    assert only["tags"].combine_chunks().equals(t["tags"].combine_chunks())


def test_list_string_roundtrip_with_nulls():
    from arcade_ray.format import decode_partition, encode_partition
    import tempfile

    col = [["a", "b"], None, [], ["b", "c", "a"], None, ["z"]]
    t = pa.table({
        "id": pa.array(range(6), type=pa.int64()),
        "tags": pa.array(col, type=pa.list_(pa.string())),
    })
    blob, _ = encode_partition(t, "p0")
    with tempfile.NamedTemporaryFile(suffix=".arcr", delete=False) as f:
        f.write(blob)
        path = f.name
    out = decode_partition(path)
    assert out["tags"].combine_chunks().equals(t["tags"].combine_chunks())


def test_list_string_multichunk_shared_dict():
    """Values dict must persist across chunks exactly as the encoder
    built it (diff mode over chunk boundaries)."""
    import numpy as np

    from arcade_ray.constants import BLOCK_ROWS
    from arcade_ray.format import decode_partition, encode_partition
    import tempfile

    rng = np.random.default_rng(6)
    vocab = [f"tag{v:03d}" for v in range(50)]
    n = BLOCK_ROWS + 500  # forces at least two chunks
    col = [[vocab[t] for t in rng.integers(0, len(vocab), 3)]
           for _ in range(n)]
    t = pa.table({
        "id": pa.array(range(n), type=pa.int64()),
        "tags": pa.array(col, type=pa.list_(pa.string())),
    })
    blob, _ = encode_partition(t, "p0")
    with tempfile.NamedTemporaryFile(suffix=".arcr", delete=False) as f:
        f.write(blob)
        path = f.name
    from arcade_ray.format import read_header

    header, _ = read_header(path)
    assert len(header["columns"]["tags"]["chunks"]) >= 2
    out = decode_partition(path)
    assert out["tags"].combine_chunks().equals(t["tags"].combine_chunks())
