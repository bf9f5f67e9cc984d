"""Vectorized FSST encoder.

Same symbol-table semantics as fsst.py (greedy longest match, escape
byte 255) but the greedy walk is vectorized: the stream is cut into
independent blocks of ``BLOCK`` bytes, and ONE cursor per block
advances in lock-step numpy iterations (cursor count = #blocks, not
#bytes). A symbol never spans a block boundary — a negligible
compression loss (< 8 bytes per 4 KiB) that makes the walk data-parallel.
Decode is unchanged: the emitted stream is a valid FSST stream.

Match tables: the 8-byte big-endian window at every position is
compared against per-length sorted symbol-prefix integers via
searchsorted — longest length wins, all positions at once.
"""

from __future__ import annotations

import numpy as np

from ..constants import FSST_ESCAPE

BLOCK = 4096


def _window64(data: np.ndarray) -> np.ndarray:
    """Big-endian uint64 of data[pos:pos+8] for every pos (zero-padded)."""
    n = len(data)
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    w = np.zeros(n, dtype=np.uint64)
    for b in range(8):
        w |= padded[b: b + n].astype(np.uint64) << np.uint64(8 * (7 - b))
    return w


def _match_tables(data: np.ndarray, symbols: list[bytes]):
    """-> (match_len, match_code) per position (0 len = escape)."""
    n = len(data)
    match_len = np.zeros(n, dtype=np.int8)
    match_code = np.zeros(n, dtype=np.uint8)
    if not symbols or n == 0:
        return match_len, match_code
    w = _window64(data)
    by_len: dict[int, list[tuple[int, int]]] = {}
    for code, s in enumerate(symbols):
        v = int.from_bytes(s.ljust(8, b"\0"), "big") >> (8 * (8 - len(s)))
        by_len.setdefault(len(s), []).append((v, code))
    for L in sorted(by_len.keys(), reverse=True):
        vals = np.array(sorted(v for v, _ in by_len[L]), dtype=np.uint64)
        codes = np.array([c for _, c in sorted(by_len[L])], dtype=np.uint8)
        wL = w >> np.uint64(8 * (8 - L))
        idx = np.searchsorted(vals, wL)
        idx_c = np.minimum(idx, len(vals) - 1)
        hit = (vals[idx_c] == wL) & (match_len == 0)
        if L > 1:
            # a symbol of length L must not run past the data end
            hit[n - L + 1:] = False
        match_len[hit] = L
        match_code[hit] = codes[idx_c[hit]]
    return match_len, match_code


def encode_stream(data: bytes, symbols: list[bytes]) -> bytes:
    """Vectorized greedy encode (block-parallel cursors)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return b""
    match_len, match_code = _match_tables(arr, symbols)
    starts = np.arange(0, n, BLOCK, dtype=np.int64)
    ends = np.minimum(starts + BLOCK, n)
    n_blocks = len(starts)
    cur = starts.copy()
    blk = np.arange(n_blocks, dtype=np.int64)

    em_block: list[np.ndarray] = []
    em_iter: list[np.ndarray] = []
    em_code: list[np.ndarray] = []
    em_second: list[np.ndarray] = []
    em_esc: list[np.ndarray] = []
    it = 0
    alive = cur < ends
    while alive.any():
        c = cur[alive]
        ml = match_len[c].astype(np.int64)
        # clamp matches that would cross this block's end -> escape
        over = c + ml > ends[alive]
        ml = np.where(over, 0, ml)
        esc = ml == 0
        code = np.where(esc, FSST_ESCAPE, match_code[c]).astype(np.uint8)
        em_block.append(blk[alive])
        em_iter.append(np.full(int(alive.sum()), it, dtype=np.int64))
        em_code.append(code)
        em_second.append(arr[c])
        em_esc.append(esc)
        cur[alive] = c + np.where(esc, 1, ml)
        alive = cur < ends
        it += 1

    b = np.concatenate(em_block)
    i = np.concatenate(em_iter)
    codes = np.concatenate(em_code)
    seconds = np.concatenate(em_second)
    escs = np.concatenate(em_esc)
    order = np.lexsort((i, b))
    codes, seconds, escs = codes[order], seconds[order], escs[order]
    unit_len = 1 + escs.astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(unit_len)])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    out[offsets[:-1]] = codes
    esc_pos = offsets[:-1][escs] + 1
    out[esc_pos] = seconds[escs]
    return out.tobytes()
