#!/usr/bin/env python
"""8->32 split-wave experiment (round-4 task #7): try the review's
three levers — /dev/shm-staged fragments (disk exchange on a tmpfs
out_dir), coarser split granularity (ARCADE_SPLIT_TASKS), and the
already-batched ray.get — at 8M rows with ARCADE_TIMING phase
instrumentation, interleaved fresh-process replicates, min per config.

Usage: python tools/splitwave_experiment.py        # orchestrate
       python tools/splitwave_experiment.py --child <cpus> <variant>
Variants: base | shm | coarse16 | coarse8
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, variant: str) -> dict:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    corpus_path, n_tokens = bench.ensure_corpus()

    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.sources import read_parquet_clean

    read_parquet_clean(corpus_path).count()
    kw = {}
    if variant == "shm":
        base = "/dev/shm/arcade_sw"
        kw["exchange"] = "disk"
    else:
        base = "/tmp/arcade_sw"
    if variant == "coarse16":
        os.environ["ARCADE_SPLIT_TASKS"] = "16"
    elif variant == "coarse8":
        os.environ["ARCADE_SPLIT_TASKS"] = "8"
    enc_dir = f"{base}_{cpus}_{variant}"
    shutil.rmtree(enc_dir, ignore_errors=True)
    encode_parquet(corpus_path, enc_dir, **kw)  # warm
    shutil.rmtree(enc_dir, ignore_errors=True)
    t0 = time.perf_counter()
    encode_parquet(corpus_path, enc_dir, **kw)
    wall = time.perf_counter() - t0
    shutil.rmtree(enc_dir, ignore_errors=True)
    return {"cpus": cpus, "variant": variant,
            "wall_s": round(wall, 3),
            "tokens_per_s": round(n_tokens / wall)}


def run_child(cpus: int, variant: str) -> dict:
    env = dict(os.environ, ARCADE_TIMING="1")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(cpus), variant],
        capture_output=True, text=True, cwd=REPO, check=True, env=env)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # attach the LAST (timed-run) phase instrumentation line
    phases = re.findall(r"\[arcade-timing\] (split_wave[^\n]*)",
                        r.stderr)
    out["timing"] = phases[-1] if phases else None
    return out


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        print(json.dumps(child(int(sys.argv[i + 1]), sys.argv[i + 2])))
        return
    os.environ.setdefault("ARCADE_BENCH_ROWS", "8000000")
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.CORPUS_ROWS = int(os.environ["ARCADE_BENCH_ROWS"])
    bench.ensure_corpus()

    configs = [(8, "base"), (32, "base"), (32, "shm"),
               (32, "coarse16"), (32, "coarse8")]
    reps = int(os.environ.get("ARCADE_SW_REPS", "2"))
    best: dict = {}
    for _ in range(reps):
        for c in configs:
            r = run_child(*c)
            if c not in best or r["wall_s"] < best[c]["wall_s"]:
                best[c] = r
    b8 = best[(8, "base")]["wall_s"]
    out = {"rows": bench.CORPUS_ROWS,
           "runs": list(best.values()),
           "eff_8to32": {v: round(b8 / (4 * best[(32, v)]["wall_s"]), 3)
                         for v in ("base", "shm", "coarse16",
                                   "coarse8")}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
