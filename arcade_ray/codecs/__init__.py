"""Codec registry.

Codecs are pure functions ``(values, profile) -> (payload, meta)`` /
``(payload, meta, n) -> values`` — unit-testable without Ray
(SURVEY.md §7.0). The palette implements the north-star set: plain,
dictionary (+bit-packed codes), RLE, FSST, bit-pack,
frame-of-reference, and a general-purpose snappy fallback.
"""

from .int_codecs import INT_CODECS, choose_int_codec, decode_int
from .str_codecs import STR_CODECS, decode_str

__all__ = [
    "INT_CODECS",
    "STR_CODECS",
    "choose_int_codec",
    "decode_int",
    "decode_str",
]
