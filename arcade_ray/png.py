"""Minimal pure-stdlib PNG codec (zlib + struct + numpy).

Real format support for the mediaops image stages without PIL/cv2:
8-bit non-interlaced PNGs, color types 0 (grayscale), 2 (RGB),
3 (palette), 4 (gray+alpha) and 6 (RGBA), all five scanline filters
(None/Sub/Up/Average/Paeth). The decoder is correctness-first: None,
Sub and Up unfilter vectorized per row (Sub is a per-lane cumsum);
Average and Paeth fall back to a per-pixel loop (their recurrences are
inherently sequential in x). The encoder writes filter-0 rows — the
round-trip test is pixel-exact by construction.

Spec: the public PNG specification (RFC 2083 / W3C PNG). This module
implements it from scratch; nothing here derives from any image
library's source.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _unfilter(raw: np.ndarray, height: int, stride: int,
              bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering. ``raw`` is the decompressed
    stream: height rows of (1 filter byte + stride data bytes)."""
    rows = raw.reshape(height, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ft = int(ftypes[y])
        line = rows[y, 1:].astype(np.int64)
        if ft == 0:  # None
            rec = line
        elif ft == 1:  # Sub: per-lane cumsum mod 256
            lanes = line.reshape(-1, bpp) if stride % bpp == 0 \
                else None
            if lanes is not None:
                rec = (np.cumsum(lanes, axis=0) % 256).reshape(-1)
            else:  # defensive: spec guarantees stride % bpp == 0
                rec = line.copy()
                for x in range(bpp, stride):
                    rec[x] = (rec[x] + rec[x - bpp]) % 256
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 3:  # Average
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + (a + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc_:
                    pred = a
                elif pb <= pc_:
                    pred = b
                else:
                    pred = c
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """-> uint8 array, shape (h, w) for grayscale or (h, w, c) for
    multi-channel. 8-bit, non-interlaced; palette images resolve
    through their PLTE to (h, w, 3)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNGs supported (depth={depth})")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNGs not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    img = _unfilter(raw, height, stride, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[img.reshape(height, width)]
    if ch == 1:
        return img.reshape(height, width)
    return img.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3|4) -> PNG bytes (8-bit,
    filter-0 rows, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, ch = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w, ch = img.shape
        color_type = 2 if ch == 3 else 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = img.reshape(h, w * ch)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rows], axis=1).tobytes()
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """uint8 (h, w[, c]) -> (h, w) luma (integer BT.601 approximation;
    alpha ignored)."""
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.uint32)
    y = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1]
         + 114 * rgb[:, :, 2]) // 1000
    return y.astype(np.uint8)
