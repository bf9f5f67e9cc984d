"""arcade_ray — a Ray-Data-native adaptive columnar compression engine.

Re-expresses the capability set of madgik/arcade (adaptive per-column
lightweight compression with cost-model codec selection, decode-free
filtering, zone-map skipping, bit-identical round trip) as streaming
``ray.data.Dataset`` pipelines over Arrow batches. See SURVEY.md for
the full blueprint and reference citations.

This package never calls ``ray.init()`` — sessions are owned by the
caller (driver contract, tests/conftest.py, bench.py).

Public API (lazy imports keep `import arcade_ray` light)::

    from arcade_ray import encode_parquet, encode_dataset, decode_dataset
    from arcade_ray import scan, equi_filter, range_filter, random_access
    from arcade_ray import lookup, compact, verify_roundtrip
"""

__version__ = "0.1.0"

_API = {
    "encode_parquet": "arcade_ray.pipeline.encode",
    "encode_dataset": "arcade_ray.pipeline.encode",
    "encode_streaming": "arcade_ray.pipeline.streaming",
    "load_manifest": "arcade_ray.pipeline.encode",
    "decode_dataset": "arcade_ray.pipeline.decode",
    "scan": "arcade_ray.pipeline.query",
    "equi_filter": "arcade_ray.pipeline.query",
    "range_filter": "arcade_ray.pipeline.query",
    "random_access": "arcade_ray.pipeline.query",
    "lookup": "arcade_ray.pipeline.query",
    "dict_value_counts": "arcade_ray.pipeline.query",
    "compact": "arcade_ray.pipeline.compact",
    "verify_roundtrip": "arcade_ray.pipeline.verify",
    "encode_partition": "arcade_ray.format",
    "decode_partition": "arcade_ray.format",
    "generate_corpus": "arcade_ray.corpus",
}


def __getattr__(name):
    if name in _API:
        import importlib

        mod = importlib.import_module(_API[name])
        return getattr(mod, name)
    raise AttributeError(name)


__all__ = sorted(_API)
