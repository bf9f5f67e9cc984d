"""Bit-packing core: pack non-negative integers into ``width``-bit
little-endian codes.

This is the engine's replacement for the reference's byte-aligned
1/2/4-byte dictionary codes (src/writer.cpp:198-252): at equal
dictionary content a ``width``-bit code buffer is strictly <= the
reference's byte-aligned buffer, which underwrites the
"<= reference compressed size" criterion (SURVEY.md §7.3 item 2).

All functions are pure numpy — unit-testable without Ray.
"""

from __future__ import annotations

import numpy as np

# Chunk length for the bit-matrix expansion; must be a multiple of 8 so
# each chunk's packed bits end on a byte boundary and chunks concatenate.
_CHUNK = 1 << 18


def bits_needed(max_value: int) -> int:
    """Bits required to represent values in [0, max_value]; 0 for max 0."""
    if max_value < 0:
        raise ValueError("bits_needed requires a non-negative max")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (non-negative, < 2**width) into a little-endian
    bitstream of ``width`` bits per value. width == 0 → empty payload
    (a constant/zero run — the reference's broken "constant chunk"
    path src/process.cpp:472-478, implemented properly)."""
    if width < 0 or width > 64:
        raise ValueError(f"width out of range: {width}")
    if width == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width < 64 and len(v) and int(v.max()) >> width:
        raise ValueError("value does not fit in width")
    if width in (8, 16, 32, 64):
        # byte-aligned fast path: a narrowing cast IS the packing
        np_t = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}[width]
        return v.astype(np_t).tobytes()
    shifts = np.arange(width, dtype=np.uint64)
    parts = []
    for s in range(0, len(v), _CHUNK):
        chunk = v[s : s + _CHUNK]
        bits = ((chunk[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        parts.append(np.packbits(bits, bitorder="little").tobytes())
    return b"".join(parts)


def unpack_bits(data: bytes, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of ``count``."""
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    if width in (8, 16, 32, 64):
        np_t = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}[width]
        return np.frombuffer(data, dtype=np_t, count=count).astype(np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(count, dtype=np.uint64)
    for s in range(0, count, _CHUNK):
        n = min(_CHUNK, count - s)
        byte_lo = s * width // 8
        byte_hi = (s + n) * width + 7 >> 3
        bits = np.unpackbits(
            raw[byte_lo:byte_hi], count=n * width, bitorder="little"
        ).reshape(n, width)
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(width):
            acc |= bits[:, j].astype(np.uint64) << np.uint64(j)
        out[s : s + n] = acc
    return out


def packed_nbytes(count: int, width: int) -> int:
    return (count * width + 7) // 8
