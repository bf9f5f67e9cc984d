"""Error paths of the segment format reader."""

import pytest

from arcade_ray.corpus import generate_corpus
from arcade_ray.format import decode_partition, encode_partition, read_header


@pytest.fixture()
def blob():
    table = generate_corpus(500, 4, seed=61)
    b, _ = encode_partition(table, "p")
    return b


def test_bad_magic(tmp_path, blob):
    p = tmp_path / "bad.arcr"
    p.write_bytes(b"NOTMAGIC" + blob[8:])
    with pytest.raises(ValueError, match="bad magic"):
        read_header(str(p))


def test_truncated_header(tmp_path, blob):
    p = tmp_path / "trunc.arcr"
    p.write_bytes(blob[:20])
    with pytest.raises(Exception):
        read_header(str(p))


def test_truncated_payload(tmp_path, blob):
    p = tmp_path / "tp.arcr"
    p.write_bytes(blob[: len(blob) - 50])
    with pytest.raises(Exception):
        decode_partition(str(p))


def test_header_roundtrip_from_bytes(blob):
    header, base = read_header(blob)
    assert header["rows"] == 500
    assert set(header["columns"]) == {"doc_id", "tokens", "n_tok", "source"}
    assert base > len(b"ARCR1\n") + 4
