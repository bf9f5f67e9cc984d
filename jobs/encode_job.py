#!/usr/bin/env python
"""`ray job submit`-compatible encode job (north-star launch mode).

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/encode_job.py --input s3://bucket/corpus/ \
        --out /mnt/shared/encoded --key-col source --id-col doc_id \
        --weight-col n_tok

In this sandbox the same script runs against a local session
(`RAY_ADDRESS=local`). The job connects to whatever cluster the Ray
Job runtime provides (``ray.init()`` with no address inside a job
attaches to the running cluster), runs the resumable encode pipeline,
and prints the manifest summary as its job result. Re-submitting after
a failure resumes from the last committed partition (the manifest IS
the checkpoint).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# make the repo root importable when launched as `python jobs/encode_job.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet file/dir of shards")
    p.add_argument("--out", required=True)
    p.add_argument("--key-col", default="source")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--weight-col", default="n_tok")
    p.add_argument("--cap", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--range-partition", default=None, metavar="COL")
    p.add_argument("--zorder", default=None, metavar="COL,COL[,COL]")
    p.add_argument("--generation", default=None)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` this attaches to the cluster; locally
        # RAY_ADDRESS=local starts a one-node session
        ray.init(logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from arcade_ray.pipeline.encode import encode_parquet

    t0 = time.perf_counter()
    manifest = encode_parquet(
        args.input, args.out, key_col=args.key_col, id_col=args.id_col,
        weight_col=args.weight_col or None, weight_cap=args.cap,
        resume=not args.no_resume, generation=args.generation,
        range_partition_col=args.range_partition,
        zorder_cols=args.zorder.split(",") if args.zorder else None,
    )
    result = {
        "partitions": manifest.num_rows,
        "rows": sum(manifest["rows"].to_pylist()),
        "raw_bytes": sum(manifest["raw_bytes"].to_pylist()),
        "enc_bytes": sum(manifest["enc_bytes"].to_pylist()),
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
