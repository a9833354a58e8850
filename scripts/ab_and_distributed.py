#!/usr/bin/env python
"""Interleaved A/B for the r4 `bm25_and_distributed` artifact regression
(1.63 -> 2.15 s; VERDICT r4 'What's wrong' #2).

Hypotheses: (A) host-scheduling noise across probe windows, (B) the
_exclude_dir liveDocs hook added in r4i slowed the cold path.  Code
audit shows the hook is a no-op under _exclude_dir=None (a None-
returning fingerprint call in the memo key, a guarded kwarg in
_plan_block_prune, one `is not None` branch in _finalize) and the
executed plan is unchanged (1 Exchange, no LeftAnti).  This script
produces the empirical side: N interleaved cold runs, each preceded by
the same single-thread-pinned capacity probe bench.py gates on, so the
timing distribution can be read against the host's instantaneous
capacity.  Output: one JSON line.
"""
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import probe_1way  # same pinned matmul probe

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(os.environ.get("AB_RUNS", "16"))


def main():
    from siem_on_amazon_opensearch_service_spark import entry as reg
    from siem_on_amazon_opensearch_service_spark.operators.build import build_index
    from siem_on_amazon_opensearch_service_spark.operators.search import search_df
    from siem_on_amazon_opensearch_service_spark.session import get_spark

    label = reg._sf_label(SF_DIR)
    spark = get_spark("ab", cores=CPUS, shuffle_partitions=CPUS,
                      extra={"spark.sql.adaptive.coalescePartitions.enabled": "false"})
    tdf = spark.read.parquet(reg.ensure_corpus(label, spark))
    idx = os.path.join(reg.GEN_ROOT, f"ab_index_sf{label}")
    if not os.path.isdir(idx):
        build_index(spark, tdf, idx, n_salts=8)

    df = search_df(spark, idx, "error AND timeout", k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan_facts = {"exchanges": plan.count("Exchange"),
                  "left_anti": "LeftAnti" in plan,
                  "pushed_in": "In(term" in plan or "in(term" in plan.lower()}
    df.collect()  # JVM/codegen warm; bench's best3 also pays this in run 1

    runs = []
    for i in range(N):
        p = probe_1way()
        t0 = time.perf_counter()
        search_df(spark, idx, "error AND timeout", k=10).collect()
        dt = time.perf_counter() - t0
        runs.append({"probe": p, "sec": round(dt, 3)})
    quiet = [r["sec"] for r in runs if r["probe"] >= 38]
    noisy = [r["sec"] for r in runs if r["probe"] < 38]
    print(json.dumps({
        "metric": "ab_bm25_and_distributed",
        "plan": plan_facts,
        "runs": runs,
        "quiet_min": round(min(quiet), 3) if quiet else None,
        "quiet_p50": round(statistics.median(quiet), 3) if quiet else None,
        "noisy_p50": round(statistics.median(noisy), 3) if noisy else None,
        "n_quiet": len(quiet), "n_noisy": len(noisy),
    }))


if __name__ == "__main__":
    main()
