#!/usr/bin/env python
"""Multi-node scaling rehearsal on one host via ray.cluster_utils.Cluster.

The single-process 2->8 CPU protocol (BASELINE.md §3/§5) proxies
cluster scaling but never exercises Ray's NODE-TO-NODE object
transport — the path a real N->4N cluster pays on every exchange.
This tool stands up a simulated multi-node cluster (one raylet +
plasma store per simulated node, real gRPC object transfer between
them) and runs the headline encode pipeline across it.

Experiments (each config in a FRESH subprocess — raylet teardown must
not leak into the next measurement):

  1. transport cost: 1 node x K CPUs   vs  M nodes x K/M CPUs
     (same total CPUs — the delta IS the cross-node transport +
     multi-raylet overhead, with the host memory wall held constant)
  2. node scaling:   1 node x K CPUs   vs  4 nodes x K CPUs
     (the north rule's N->4N shape; on one host the 4x config still
     shares memory bandwidth, so this reads as a LOWER BOUND on real
     cluster efficiency — see BASELINE.md §6)

Usage:
  python tools/multinode_rehearsal.py                # orchestrate all
  python tools/multinode_rehearsal.py --child NODES CPUS_PER  # one run

Results print as one JSON line (parent) / one JSON line per child.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OSM = int(os.environ.get("ARCADE_SIM_NODE_STORE",
                         str(2 * 1024 ** 3)))  # plasma bytes per node


def child(nodes: int, cpus_per: int, reps: int) -> dict:
    import ray
    from ray.cluster_utils import Cluster

    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": cpus_per,
                        "object_store_memory": OSM})
    for _ in range(nodes - 1):
        cluster.add_node(num_cpus=cpus_per, object_store_memory=OSM)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    # wait for every simulated node to register
    deadline = time.time() + 60
    while time.time() < deadline:
        alive = [n for n in ray.nodes() if n["Alive"]]
        if len(alive) >= nodes:
            break
        time.sleep(0.5)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    corpus_path, n_tokens = bench.ensure_corpus()

    from arcade_ray.pipeline.encode import encode_parquet
    from arcade_ray.sources import read_parquet_clean

    read_parquet_clean(corpus_path).count()  # warm cache + workers
    enc_dir = f"/tmp/arcade_mn_enc_{nodes}x{cpus_per}"
    import shutil

    shutil.rmtree(enc_dir, ignore_errors=True)
    encode_parquet(corpus_path, enc_dir)  # untimed warm run

    best = None
    for _ in range(reps):
        shutil.rmtree(enc_dir, ignore_errors=True)
        t0 = time.perf_counter()
        encode_parquet(corpus_path, enc_dir)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    # how much of the routed data actually crossed nodes: compare
    # per-node object-store usage (all-local would pin everything on
    # the head's store)
    per_node = []
    for n in ray.nodes():
        if n["Alive"]:
            per_node.append({
                "node": n["NodeID"][:8],
                "cpus": n["Resources"].get("CPU", 0)})
    shutil.rmtree(enc_dir, ignore_errors=True)
    out = {"nodes": nodes, "cpus_per_node": cpus_per,
           "total_cpus": nodes * cpus_per, "wall_s": round(best, 3),
           "tokens_per_s": round(n_tokens / best),
           "n_tokens": n_tokens, "alive_nodes": len(per_node)}
    ray.shutdown()
    cluster.shutdown()
    return out


def run_child(nodes: int, cpus_per: int, reps: int) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(nodes), str(cpus_per), str(reps)],
        capture_output=True, text=True, cwd=REPO, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        nodes, cpus_per = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        reps = int(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 2
        print(json.dumps(child(nodes, cpus_per, reps)))
        return
    os.environ.setdefault("ARCADE_BENCH_ROWS", "2000000")
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.CORPUS_ROWS = int(os.environ["ARCADE_BENCH_ROWS"])
    bench.ensure_corpus()  # generate once, outside every timed child

    reps = int(os.environ.get("ARCADE_MN_REPS", "2"))
    # interleave configs so host noise hits all alike (BASELINE §5)
    configs = [(1, 8), (4, 2), (1, 32), (4, 8)]
    results = {c: None for c in configs}
    for _ in range(reps):
        for c in configs:
            r = run_child(c[0], c[1], 1)
            prev = results[c]
            if prev is None or r["wall_s"] < prev["wall_s"]:
                results[c] = r
    r18, r42, r132, r48 = (results[c] for c in configs)
    out = {
        "rows": bench.CORPUS_ROWS,
        "runs": list(results.values()),
        # same total CPUs, 1 vs 4 raylets: transport+multi-node tax
        "transport_tax_8cpu": round(
            r42["wall_s"] / r18["wall_s"], 3),
        "transport_tax_32cpu": round(
            r48["wall_s"] / r132["wall_s"], 3),
        # the north-rule shape: 1 node -> 4 nodes at 8 CPUs each
        "node_scaling_eff_1to4": round(
            r18["wall_s"] / (4 * r48["wall_s"]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
