"""Bit-packing core round-trip properties (no Ray needed)."""

import numpy as np
import pytest

from arcade_ray.bitpack import bits_needed, pack_bits, packed_nbytes, unpack_bits


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 9, 13, 16, 31, 32, 33, 63, 64])
@pytest.mark.parametrize("n", [0, 1, 5, 255, 256, 1000])
def test_pack_roundtrip(width, n):
    rng = np.random.default_rng(42 + width * 1000 + n)
    if width == 0:
        vals = np.zeros(n, dtype=np.uint64)
    elif width == 64:
        vals = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * 2 + rng.integers(0, 2, size=n, dtype=np.uint64)
    else:
        vals = rng.integers(0, 1 << width, size=n, dtype=np.uint64)
    data = pack_bits(vals, width)
    assert len(data) == packed_nbytes(n, width)
    out = unpack_bits(data, width, n)
    np.testing.assert_array_equal(out, vals)


def test_bits_needed():
    assert bits_needed(0) == 0
    assert bits_needed(1) == 1
    assert bits_needed(255) == 8
    assert bits_needed(256) == 9
    assert bits_needed(65535) == 16
    assert bits_needed(65536) == 17  # the reference's ==65536 bug zone (SURVEY.md §1.3)
    assert bits_needed(2**31 - 1) == 31


def test_overflow_rejected():
    with pytest.raises(ValueError):
        pack_bits(np.array([8], dtype=np.uint64), 3)


def test_chunk_boundary():
    # cross the internal _CHUNK boundary
    n = (1 << 18) + 17
    vals = (np.arange(n, dtype=np.uint64) * 2654435761) % (1 << 13)
    out = unpack_bits(pack_bits(vals, 13), 13, n)
    np.testing.assert_array_equal(out, vals)
