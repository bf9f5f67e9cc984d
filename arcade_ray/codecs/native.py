"""Optional native (C) kernels for the FSST hot loops.

The FSST encode walk and decode expansion are inherently sequential
byte-cursor loops — the one shape numpy cannot express efficiently
(fsst_vec.py gets to ~25 MB/s with block-parallel cursors; the real
FSST runs GB/s in C, VLDB 2020 §6). This module compiles a ~100-line
C kernel with the system compiler ON FIRST USE, caches the shared
object under /tmp keyed by a source hash, and loads it via ctypes.

Strictly optional: any failure (no compiler, sandboxed /tmp, load
error) returns None and callers fall back to the pure-numpy path
(fsst_vec.encode_stream's lock-step walk, fsst.decompress's Python
loop). Set ARCADE_NO_NATIVE=1 to force the fallback (used by tests to
exercise both paths). The kernel reuses fsst_vec._Matcher's tables —
the fused 2-byte short-code table and the hashed 3-byte prefix groups
— so the two encoders share one greedy-match definition; the C walk
is TRUE greedy (no block clamping), so its output is never larger
than the numpy walk's and decodes through the same stream format.

ctypes releases the GIL for the call, so encoder actors overlap.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>
#include <string.h>

/* Greedy longest-match FSST encode (escape byte 255).
   Tables are fsst_vec._Matcher's: s_len/s_code fuse the best <=2-byte
   match per 2-byte window; length>=3 symbols live in hashed 3-byte
   prefix groups ordered longest-first (first hit = greedy winner).
   out must hold 2*n bytes (worst case: every byte escapes).
   Returns the emitted length. */
int64_t fsst_encode(
    const uint8_t* data, int64_t n,
    const int8_t* s_len, const int16_t* s_code,
    const int16_t* lut1,
    const uint8_t* has_long, int64_t have_long,
    uint64_t h_mul, uint64_t h_shift,
    const uint64_t* h_key, const int64_t* h_slot,
    const int64_t* g_off,
    const uint64_t* m_cmp, const uint64_t* m_shiftv,
    const int64_t* m_len, const uint8_t* m_code,
    uint8_t* out)
{
    int64_t pos = 0, opos = 0;
    while (pos < n) {
        uint64_t v8;
        if (pos + 8 <= n) {
            uint64_t w;
            memcpy(&w, data + pos, 8);
            v8 = __builtin_bswap64(w);
        } else {
            v8 = 0;
            for (int64_t i = 0; i < n - pos; i++)
                v8 |= ((uint64_t)data[pos + i]) << (56 - 8 * i);
        }
        uint32_t w2 = (uint32_t)(v8 >> 48);
        if (have_long && has_long[w2]) {
            uint64_t v3 = v8 >> 40;
            uint64_t h = (v3 * h_mul) >> h_shift;
            if (h_key[h] == v3) {
                int64_t slot = h_slot[h];
                int64_t hi = g_off[slot + 1];
                int matched = 0;
                for (int64_t mi = g_off[slot]; mi < hi; mi++) {
                    if ((v8 >> m_shiftv[mi]) == m_cmp[mi]
                            && pos + m_len[mi] <= n) {
                        out[opos++] = m_code[mi];
                        pos += m_len[mi];
                        matched = 1;
                        break;
                    }
                }
                if (matched) continue;
            }
        }
        int l = s_len[w2];
        if (l == 2 && pos + 2 <= n) {
            out[opos++] = (uint8_t)s_code[w2];
            pos += 2;
        } else {
            /* 1-byte match (also the 2-byte-at-stream-end fallback) */
            int16_t c1 = lut1[v8 >> 56];
            if (c1 >= 0) {
                out[opos++] = (uint8_t)c1;
            } else {
                out[opos++] = 255;
                out[opos++] = data[pos];
            }
            pos += 1;
        }
    }
    return opos;
}

/* FSST decode: sym_data is 256 symbols padded to 8 bytes each.
   out must hold 8*n + 8 bytes (unconditional 8-byte symbol copies). */
int64_t fsst_decode(
    const uint8_t* stream, int64_t n,
    const uint8_t* sym_data, const int64_t* sym_len,
    uint8_t* out)
{
    int64_t i = 0, o = 0;
    while (i < n) {
        uint8_t c = stream[i];
        if (c == 255) {
            if (i + 1 >= n) break;  /* truncated dangling escape */
            out[o++] = stream[i + 1];
            i += 2;
        } else {
            memcpy(out + o, sym_data + ((int64_t)c << 3), 8);
            o += sym_len[c];
            i += 1;
        }
    }
    return o;
}
"""

_lib = None
_tried = False


def _compile() -> str | None:
    """Compile the kernel into a per-user cache dir; atomic publish so
    concurrent Ray workers race safely (first rename wins)."""
    tag = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    cache = os.path.join(
        tempfile.gettempdir(), f"arcade_native-{os.getuid()}")
    so_path = os.path.join(cache, f"fsst-{tag}-{sys.implementation.name}.so")
    os.makedirs(cache, mode=0o700, exist_ok=True)
    st = os.stat(cache)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        # predictable path under world-writable /tmp: refuse to load
        # (or write) anything from a dir another user could own or
        # write to — .so planting would execute in every worker
        return None
    if os.path.exists(so_path):
        return so_path
    src = os.path.join(cache, f"fsst-{tag}.c")
    with open(src, "w") as f:
        f.write(_C_SOURCE)
    tmp = so_path + f".tmp.{os.getpid()}"
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
            return so_path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib():
    """-> ctypes CDLL with typed signatures, or None (fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("ARCADE_NO_NATIVE"):
        return None
    try:
        so_path = _compile()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        p = ctypes.POINTER
        u8, i8 = p(ctypes.c_uint8), p(ctypes.c_int8)
        i16, i64, u64 = p(ctypes.c_int16), p(ctypes.c_int64), p(ctypes.c_uint64)
        lib.fsst_encode.restype = ctypes.c_int64
        lib.fsst_encode.argtypes = [
            u8, ctypes.c_int64, i8, i16, i16, u8, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_uint64, u64, i64, i64,
            u64, u64, i64, u8, u8]
        lib.fsst_decode.restype = ctypes.c_int64
        lib.fsst_decode.argtypes = [u8, ctypes.c_int64, u8, i64, u8]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def encode_native(data: bytes, matcher) -> bytes | None:
    """True-greedy encode via the C kernel; None -> caller falls back."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    if n == 0:
        return b""
    if matcher.p3 is not None and matcher.h_bits is None:
        return None  # hash construction failed (never observed)
    arr = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(2 * n, dtype=np.uint8)
    if matcher.p3 is not None:
        args = (matcher.has_long.view(np.uint8), 1,
                int(matcher.h_mul), int(matcher.h_bits),
                matcher.h_key, matcher.h_slot, matcher.g_off,
                matcher.m_cmp, matcher.m_shift, matcher.m_len,
                matcher.m_code)
    else:
        z64 = np.zeros(1, dtype=np.uint64)
        zi = np.zeros(2, dtype=np.int64)
        zu = np.zeros(65536, dtype=np.uint8)
        args = (zu, 0, 0, 63, z64, zi, zi, z64,
                z64, zi, zu)
    (has_long, have_long, h_mul, h_shift, h_key, h_slot, g_off,
     m_cmp, m_shift, m_len, m_code) = args
    olen = lib.fsst_encode(
        _ptr(arr, ctypes.c_uint8), n,
        _ptr(matcher.s_len, ctypes.c_int8),
        _ptr(matcher.s_code, ctypes.c_int16),
        _ptr(matcher.lut1, ctypes.c_int16),
        _ptr(has_long, ctypes.c_uint8), have_long,
        h_mul, h_shift,
        _ptr(h_key, ctypes.c_uint64), _ptr(h_slot, ctypes.c_int64),
        _ptr(g_off, ctypes.c_int64),
        _ptr(m_cmp, ctypes.c_uint64), _ptr(m_shift, ctypes.c_uint64),
        _ptr(m_len, ctypes.c_int64), _ptr(m_code, ctypes.c_uint8),
        _ptr(out, ctypes.c_uint8))
    return out[:olen].tobytes()


def decode_native(stream: bytes, symbols: list[bytes]) -> bytes | None:
    """Decode via the C kernel; None -> caller falls back."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(stream)
    if n == 0:
        return b""
    sym_data = np.zeros(256 * 8, dtype=np.uint8)
    sym_len = np.zeros(256, dtype=np.int64)
    for i, s in enumerate(symbols):
        sym_data[i * 8: i * 8 + len(s)] = np.frombuffer(s, dtype=np.uint8)
        sym_len[i] = len(s)
    arr = np.frombuffer(stream, dtype=np.uint8)
    out = np.empty(8 * n + 8, dtype=np.uint8)
    olen = lib.fsst_decode(
        _ptr(arr, ctypes.c_uint8), n,
        _ptr(sym_data, ctypes.c_uint8), _ptr(sym_len, ctypes.c_int64),
        _ptr(out, ctypes.c_uint8))
    return out[:olen].tobytes()
