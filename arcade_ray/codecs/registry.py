"""Codec plugin registry — the engine's user-extension surface
(SURVEY.md §2.3 last row; the reference has none, src/arcade.h:10-29).

A custom integer-stream codec registers three functions and
immediately participates in cost-model selection and decode:

    from arcade_ray.codecs.registry import register_int_codec

    register_int_codec(
        "xor_delta",
        estimate=lambda profile, tag: ...,   # bytes or None (inapplicable)
        encode=lambda vals, profile, tag: (payload, meta),
        decode=lambda payload, meta, n: vals,
    )

Codec ids are recorded in chunk descriptors, so a reader needs the
same plugins registered; `unregister_int_codec` removes one (builtin
codecs cannot be removed).
"""

from __future__ import annotations

from .int_codecs import INT_CODECS

_BUILTIN = frozenset(INT_CODECS)


def register_int_codec(name: str, estimate, encode, decode,
                       overwrite: bool = False) -> None:
    if name in INT_CODECS and not overwrite:
        raise ValueError(f"codec {name!r} already registered")
    INT_CODECS[name] = (estimate, encode, decode)


def unregister_int_codec(name: str) -> None:
    if name in _BUILTIN:
        raise ValueError(f"cannot unregister builtin codec {name!r}")
    INT_CODECS.pop(name, None)


def registered_codecs() -> dict[str, bool]:
    """codec id -> is_builtin."""
    return {name: name in _BUILTIN for name in INT_CODECS}
