"""Property-based codec round trips (hypothesis; SURVEY.md §5.2 item 1).

Every generated input must round-trip bit-identically through every
applicable codec AND through the cost-model-selected one, including the
reference's dictionary-width bug zones."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcade_ray.codecs.fsst import compress, decompress
from arcade_ray.codecs.int_codecs import INT_CODECS, choose_int_codec, decode_int
from arcade_ray.codecs.str_codecs import choose_str_codec, decode_str
from arcade_ray.profile import profile_int, profile_str
from arcade_ray.streams import (
    int_stream_from_arrow,
    int_stream_to_arrow,
    str_stream_from_arrow,
    str_stream_to_arrow,
)

SETTINGS = dict(max_examples=40, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


int_lists = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300
)
small_int_lists = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=10),
        st.integers(min_value=-5, max_value=2**31 - 1),
        st.just(42),
    ),
    max_size=500,
)


@given(vals=st.one_of(int_lists, small_int_lists))
@settings(**SETTINGS)
def test_int_cost_model_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    p = profile_int(arr)
    name, payload, meta = choose_int_codec(arr, p, "i64")
    out = decode_int(name, payload, meta, len(arr))
    np.testing.assert_array_equal(out, arr)


@given(vals=small_int_lists)
@settings(**SETTINGS)
def test_int_every_codec_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    p = profile_int(arr)
    for name, (est, enc, dec) in INT_CODECS.items():
        if len(arr) == 0 and name in ("gp", "dict"):
            continue
        if name == "bitpack" and len(arr) and arr.min() < 0:
            continue
        payload, meta = enc(arr, p, "i64")
        np.testing.assert_array_equal(dec(payload, meta, len(arr)), arr)


str_lists = st.lists(st.text(max_size=60), max_size=200)


@given(vals=str_lists)
@settings(**SETTINGS)
def test_str_cost_model_roundtrip(vals):
    arr = pa.array(vals, type=pa.string())
    lengths, data, _ = str_stream_from_arrow(arr)
    name, payload, meta = choose_str_codec(lengths, data)
    out_l, out_d = decode_str(name, payload, meta, len(lengths))
    assert str_stream_to_arrow(out_l, out_d, "str").to_pylist() == vals


@given(data=st.binary(max_size=5000))
@settings(**SETTINGS)
def test_fsst_roundtrip(data):
    tbl, enc = compress(data)
    assert decompress(tbl, enc) == data


@given(vals=st.lists(st.floats(allow_nan=True, allow_infinity=True,
                               width=64), max_size=200))
@settings(**SETTINGS)
def test_float_bitexact_roundtrip(vals):
    """Floats travel as IEEE bit patterns — NaN payloads and -0.0 must
    survive exactly."""
    arr = pa.array(np.array(vals, dtype=np.float64), type=pa.float64())
    ints, tag = int_stream_from_arrow(arr)
    p = profile_int(ints)
    name, payload, meta = choose_int_codec(ints, p, tag)
    out = int_stream_to_arrow(decode_int(name, payload, meta, len(ints)), tag)
    a = np.asarray(out, dtype=np.float64).view(np.uint64)
    b = np.asarray(arr, dtype=np.float64).view(np.uint64)
    np.testing.assert_array_equal(a, b)


@given(rows=st.lists(
    st.tuples(st.text(min_size=1, max_size=20),
              st.lists(st.integers(0, 2**31 - 1), max_size=50),
              st.sampled_from(["a", "b", "c"])),
    max_size=60,
))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_partition_roundtrip_property(rows, tmp_path_factory):
    """Whole-partition encode/decode on arbitrary corpus-shaped rows."""
    from arcade_ray.format import decode_partition, encode_partition

    doc_ids = [f"{i:04d}-{r[0]}" for i, r in enumerate(rows)]
    table = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
        "source": pa.array([r[2] for r in rows], type=pa.string()),
    })
    blob, _ = encode_partition(table, "prop")
    tmp = tmp_path_factory.mktemp("prop") / "p.arcr"
    with open(tmp, "wb") as f:
        f.write(blob)
    out = decode_partition(str(tmp))
    for name in table.schema.names:
        assert out[name].combine_chunks().equals(table[name].combine_chunks()), name
