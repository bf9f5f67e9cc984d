"""Codec plugin registry: a registered codec participates in selection
and decodes through the normal path."""

import numpy as np
import pytest

from arcade_ray.codecs.int_codecs import choose_int_codec, decode_int
from arcade_ray.codecs.registry import (
    register_int_codec,
    registered_codecs,
    unregister_int_codec,
)
from arcade_ray.profile import profile_int


@pytest.fixture()
def winning_codec():
    """A toy codec claiming 1 byte total — always wins selection."""

    def est(p, tag):
        return 1 if p.n else None

    def enc(vals, p, tag):
        return vals.astype(np.int64).tobytes(), {"toy": True}

    def dec(payload, meta, n):
        assert meta["toy"]
        return np.frombuffer(payload, dtype=np.int64, count=n)

    register_int_codec("toy", est, enc, dec)
    yield "toy"
    unregister_int_codec("toy")


def test_registered_codec_selected_and_decodes(winning_codec):
    vals = np.arange(1000, dtype=np.int64)
    p = profile_int(vals)
    name, payload, meta = choose_int_codec(vals, p, "i64", try_gp=False)
    assert name == "toy"
    np.testing.assert_array_equal(decode_int(name, payload, meta, 1000), vals)


def test_builtin_protected():
    with pytest.raises(ValueError):
        unregister_int_codec("rle")
    with pytest.raises(ValueError):
        register_int_codec("rle", None, None, None)
    assert registered_codecs()["rle"] is True


def test_unregister_restores_selection(winning_codec):
    unregister_int_codec("toy")
    vals = np.arange(1000, dtype=np.int64)
    p = profile_int(vals)
    name, _, _ = choose_int_codec(vals, p, "i64", try_gp=False)
    assert name != "toy"
    # re-register so the fixture's teardown unregister is a no-op
    register_int_codec("toy", lambda p, t: None, None, None)
