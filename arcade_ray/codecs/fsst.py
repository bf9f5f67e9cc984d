"""FSST — Fast Static Symbol Table string compression, from scratch.

Implements the published algorithm's core (Boncz, Neumann, Leis:
"FSST: Fast Random Access String Compression", VLDB 2020; see
PAPERS.md): a static table of up to 255 symbols of 1..8 bytes, built by
a few generations of greedy gain maximization over a sample
(gain = frequency x symbol length), plus an escape code (255) for bytes
not covered. Correctness target is byte-exact round-trip, not matching
the canonical FSST bitstream (SURVEY.md §7.3 item 1).

The reference engine has no FSST — its string palette is
dict/plain/snappy (src/writer.cpp:63-187); FSST is part of the widened
palette mandated by BASELINE.json:north_star.

Pure Python/numpy; the encoder is a per-byte greedy longest-match loop
(bounded by symbol length <= 8 with a per-first-byte max-length table),
used only when the cost model says FSST wins on estimated bytes.
"""

from __future__ import annotations

from collections import Counter

from ..constants import (
    FSST_ESCAPE,
    FSST_GENERATIONS,
    FSST_MAX_SYMBOL_LEN,
    FSST_MAX_SYMBOLS,
    FSST_SAMPLE_BYTES,
)


def _encode_with(table: dict[bytes, int], maxlen_by_first: bytes, data: bytes) -> bytearray:
    """Greedy longest-match encode of ``data`` with ``table``."""
    out = bytearray()
    pos, n = 0, len(data)
    append = out.append
    while pos < n:
        first = data[pos]
        best_len = min(maxlen_by_first[first], n - pos)
        code = None
        while best_len > 0:
            code = table.get(data[pos : pos + best_len])
            if code is not None:
                break
            best_len -= 1
        if code is None:
            append(FSST_ESCAPE)
            append(first)
            pos += 1
        else:
            append(code)
            pos += best_len
    return out


def _maxlen_table(symbols: list[bytes]) -> bytes:
    m = bytearray(256)
    for s in symbols:
        if len(s) > m[s[0]]:
            m[s[0]] = len(s)
    return bytes(m)


def build_symbol_table(sample: bytes) -> list[bytes]:
    """Iterative greedy construction: start from frequent single bytes,
    then repeatedly re-encode the sample and promote high-gain symbols
    and concatenations of adjacent symbols."""
    sample = sample[:FSST_SAMPLE_BYTES]
    if not sample:
        return []
    from .fsst_vec import encode_stream

    symbols: list[bytes] = [bytes([b]) for b, _ in Counter(sample).most_common(FSST_MAX_SYMBOLS)]
    for _ in range(FSST_GENERATIONS):
        encoded = encode_stream(sample, symbols)
        # walk the encoded stream, tally symbol gains and adjacent-pair
        # concatenation gains
        gains: Counter[bytes] = Counter()
        i, prev_sym = 0, None
        while i < len(encoded):
            c = encoded[i]
            if c == FSST_ESCAPE:
                sym = bytes(encoded[i + 1 : i + 2])
                i += 2
            else:
                sym = symbols[c]
                i += 1
            gains[sym] += len(sym)
            if prev_sym is not None and len(prev_sym) + len(sym) <= FSST_MAX_SYMBOL_LEN:
                cat = prev_sym + sym
                gains[cat] += len(cat)
            prev_sym = sym
        symbols = [s for s, _ in gains.most_common(FSST_MAX_SYMBOLS)]
    return symbols


def serialize_table(symbols: list[bytes]) -> bytes:
    parts = [bytes([len(symbols)])]
    for s in symbols:
        parts.append(bytes([len(s)]))
        parts.append(s)
    return b"".join(parts)


def deserialize_table(blob: bytes) -> tuple[list[bytes], int]:
    count = blob[0]
    symbols, pos = [], 1
    for _ in range(count):
        ln = blob[pos]
        symbols.append(blob[pos + 1 : pos + 1 + ln])
        pos += 1 + ln
    return symbols, pos


def compress(data: bytes, symbols: list[bytes] | None = None) -> tuple[bytes, bytes]:
    """-> (serialized symbol table, compressed stream). The encode is
    the vectorized block-parallel greedy walk (fsst_vec.py)."""
    from .fsst_vec import encode_stream

    if symbols is None:
        symbols = build_symbol_table(data)
    return serialize_table(symbols), encode_stream(data, symbols)


def compress_scalar(data: bytes, symbols: list[bytes] | None = None) -> tuple[bytes, bytes]:
    """Reference per-byte encoder (used to cross-check fsst_vec)."""
    if symbols is None:
        symbols = build_symbol_table(data)
    table = {s: i for i, s in enumerate(symbols)}
    maxlen = _maxlen_table(symbols)
    return serialize_table(symbols), bytes(_encode_with(table, maxlen, data))


def decompress(table_blob: bytes, stream: bytes) -> bytes:
    symbols, _ = deserialize_table(table_blob)
    out = []
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == FSST_ESCAPE:
            out.append(stream[i + 1 : i + 2])
            i += 2
        else:
            out.append(symbols[c])
            i += 1
    return b"".join(out)


def estimate_ratio(data: bytes) -> tuple[float, int]:
    """Sample-compress -> (compressed/raw ratio, table bytes)."""
    sample = data[:FSST_SAMPLE_BYTES]
    if not sample:
        return 1.0, 1
    tbl, enc = compress(sample)
    return len(enc) / len(sample), len(tbl)
