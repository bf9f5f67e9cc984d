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


def _parse_codes(encoded: bytes):
    """Vectorized parse of an FSST stream into its unit sequence:
    int16 codes where symbol c -> c and an escaped literal b -> 256+b.

    The escape-swallow recurrence (a 255 consumes the NEXT byte) is
    resolved without a walk: a position is swallowed iff the count of
    contiguous 255 bytes immediately before it is ODD (the run head is
    always a unit start — its predecessor is not 255 — and escapes
    alternate escape/literal from there)."""
    import numpy as np

    s = np.frombuffer(encoded, dtype=np.uint8)
    n = len(s)
    idx = np.arange(n, dtype=np.int64)
    last_non = np.where(s != FSST_ESCAPE, idx, np.int64(-1))
    np.maximum.accumulate(last_non, out=last_non)
    prev_non = np.empty(n, dtype=np.int64)
    prev_non[0] = -1
    prev_non[1:] = last_non[:-1]
    start = ((idx - prev_non - 1) & 1) == 0
    pos = np.flatnonzero(start)
    codes = s[pos].astype(np.int16)
    esc = codes == FSST_ESCAPE
    # a trailing escape with no literal byte cannot occur in a valid
    # stream; guard the gather anyway
    lit_pos = np.minimum(pos[esc] + 1, n - 1)
    codes[esc] = 256 + s[lit_pos].astype(np.int16)
    return codes


def _tally_gains(encoded: bytes, symbols: list[bytes]) -> Counter:
    """gain(sym) = occurrences x len over the encoded sample, plus the
    same for every adjacent-unit concatenation <= FSST_MAX_SYMBOL_LEN —
    one bincount for units, one over packed pair keys for pairs."""
    import numpy as np

    codes = _parse_codes(encoded)
    sym_len = np.ones(512, dtype=np.int64)
    for c, sym in enumerate(symbols):
        sym_len[c] = len(sym)

    def unit_bytes(c: int) -> bytes:
        return symbols[c] if c < 256 else bytes([c - 256])

    gains: Counter[bytes] = Counter()
    cnt = np.bincount(codes, minlength=512)
    for c in np.flatnonzero(cnt):
        b = unit_bytes(int(c))
        gains[b] += int(cnt[c]) * len(b)
    if len(codes) > 1:
        ln = sym_len[codes]
        ok = (ln[:-1] + ln[1:]) <= FSST_MAX_SYMBOL_LEN
        pk = codes[:-1].astype(np.int64) * 512 + codes[1:]
        pcnt = np.bincount(pk[ok], minlength=0)
        for key in np.flatnonzero(pcnt):
            cat = unit_bytes(int(key) // 512) + unit_bytes(int(key) % 512)
            gains[cat] += int(pcnt[key]) * len(cat)
    return gains


def build_symbol_table(sample: bytes) -> list[bytes]:
    """Iterative greedy construction: start from frequent single bytes,
    then repeatedly re-encode the sample and promote high-gain symbols
    and concatenations of adjacent symbols (tally vectorized — the
    per-unit Python walk dominated encode_str_values once the encode
    itself went native)."""
    sample = sample[:FSST_SAMPLE_BYTES]
    if not sample:
        return []
    from .fsst_vec import encode_stream

    symbols: list[bytes] = [bytes([b]) for b, _ in Counter(sample).most_common(FSST_MAX_SYMBOLS)]
    for _ in range(FSST_GENERATIONS):
        encoded = encode_stream(sample, symbols)
        gains = _tally_gains(encoded, symbols)
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
    if len(stream) >= 4096:
        from .native import decode_native

        dec = decode_native(stream, symbols)
        if dec is not None:
            return dec
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


def estimate_plan(data: bytes) -> tuple[float, int, list[bytes]]:
    """Sample-compress -> (ratio, table bytes, symbol table). The table
    is built ONCE here and reusable for the full encode (the sample IS
    the table-build input, so rebuilding yields the same table)."""
    sample = data[:FSST_SAMPLE_BYTES]
    if not sample:
        return 1.0, 1, []
    symbols = build_symbol_table(sample)
    tbl, enc = compress(sample, symbols)
    return len(enc) / len(sample), len(tbl), symbols


