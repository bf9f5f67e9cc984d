"""arcade_ray — a Ray-Data-native adaptive columnar compression engine.

Re-expresses the capability set of madgik/arcade (adaptive per-column
lightweight compression with cost-model codec selection, decode-free
filtering, zone-map skipping, bit-identical round trip) as streaming
``ray.data.Dataset`` pipelines over Arrow batches. See SURVEY.md for
the full blueprint and reference citations.

This package never calls ``ray.init()`` — sessions are owned by the
caller (driver contract, tests/conftest.py, bench.py).
"""

__version__ = "0.1.0"
