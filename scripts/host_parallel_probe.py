#!/usr/bin/env python
"""Machine-attainable-parallelism probe for the scaling evidence.

Runs the EXACT per-shard build computation (frozen tokenize + whole-shard
posting encode) as plain multiprocessing — no Spark, no JVM, no shuffle —
at 1 and 4 single-threaded workers over identical shard inputs.  The
4-worker aggregate speedup is the ceiling ANY engine can reach on this
machine for this computation; the Spark build's measured N->4N speedup
divided by this ceiling is the normalized scaling efficiency.

Found r2: this VM advertises 32 cores but 4 parallel single-threaded
processes of the build workload reach only ~2.9x aggregate, with per-task
time inflating ~1.24x (hypervisor vCPU overcommit / shared backend) —
measured 2.94x while the spark-submit build measured 2.67x at the same
moment, i.e. the engine extracts ~0.91 of the attainable parallelism.

Usage: python scripts/host_parallel_probe.py [sf_label] [n_tasks]
"""

from __future__ import annotations

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import multiprocessing as mp
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARD = 16384


def work(args):
    label, shard_id = args
    import duckdb
    import numpy as np

    from siem_on_amazon_opensearch_service_spark.operators import segments

    d = duckdb.sql(
        f"SELECT text FROM read_parquet('/root/repo/_generated/transcripts_sf{label}.parquet/*.parquet') "
        f"LIMIT {SHARD} OFFSET {shard_id * SHARD}"
    ).df()
    docids = np.arange(len(d), dtype=np.int64)
    norms = np.random.RandomState(0).randint(1, 256, len(d)).astype(np.uint8)
    t0 = time.perf_counter()
    toks = segments.tokenize_series(d["text"])
    segments.encode_shard_postings(0, docids, norms, toks, True, 8)
    return time.perf_counter() - t0


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    n_tasks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    work((label, 0))  # warm page cache + imports
    walls = {}
    for workers in (1, 4, 1):  # re-run 1 last to bracket drift
        t0 = time.perf_counter()
        with mp.get_context("fork").Pool(workers) as p:
            times = p.map(work, [(label, i) for i in range(n_tasks)])
        wall = time.perf_counter() - t0
        walls.setdefault(workers, []).append(wall)
        print(
            f"{workers} workers: {n_tasks} shards in {wall:.1f}s wall, "
            f"per-shard mean {sum(times) / len(times):.2f}s",
            flush=True,
        )
    lo = min(walls[1])
    hi = min(walls[4])
    print(f"machine-attainable 1->4 speedup for this computation: {lo / hi:.2f}x")


if __name__ == "__main__":
    main()
