#!/usr/bin/env python
"""Headline benchmark (driver contract: one JSON line on stdout).

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

- index-build throughput over the synthetic transcript corpus at the same
  scale factor (turns/sec — the BASELINE.json headline metric),
- BM25 query latency p50 per reference query class (term, AND, OR, phrase)
  on the local reader (the latency path) and one distributed run,
- a relational/dedup sample over the driver tables.

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py -> BENCH/BASELINE.md (it spawns separate JVMs via
spark-submit; a single process can't host two masters).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# --- host-capacity probe gate (VERDICT r2 item "probe-gate the driver
# bench"): this VM's host grants a fluctuating share of physical cores
# (quiet 1-way probe ~42-49 matmuls/3s, contended <15), and r2's recorded
# artifact caught a 1.9x "regression" that was pure host noise.  Same
# single-thread-pinned 800x800 matmul as scripts/scaling_bench.py.
# r4: raised 30 -> 38 after a probe-33 window recorded 2-4x-inflated
# numbers on UNCHANGED operators (BENCH/bench_r4_probe33.json); quiet
# windows on this host probe 42-48.  Still falls through (probe_gated:
# false) when the deadline passes.
PROBE_QUIET_MIN = int(os.environ.get("SPARK_GRAFT_BENCH_PROBE_MIN", "38"))
PROBE_WAIT_S = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "900"))

_PROBE_CODE = (
    "import os\n"
    "os.environ['OMP_NUM_THREADS']='1'\n"
    "os.environ['OPENBLAS_NUM_THREADS']='1'\n"
    "os.environ['MKL_NUM_THREADS']='1'\n"
    "import time, numpy as np\n"
    "a = np.random.RandomState(1).rand(800, 800)\n"
    "t0 = time.perf_counter(); n = 0\n"
    "while time.perf_counter() - t0 < 3:\n"
    "    a @ a; n += 1\n"
    "print(n)\n"
)


def probe_1way() -> int:
    """Single-thread matmuls achieved in 3s by a fresh pinned process."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True, text=True, timeout=30,
        )
        return int(out.stdout.strip() or 0)
    except Exception:
        return -1


def wait_for_quiet() -> dict:
    """Poll the probe until the host looks quiet (or the deadline passes);
    returns the gate record for the JSON artifact."""
    deadline = time.time() + PROBE_WAIT_S
    best = -1
    polls = 0
    while True:
        v = probe_1way()
        polls += 1
        best = max(best, v)
        if v >= PROBE_QUIET_MIN or time.time() >= deadline:
            return {"probe_start": v, "probe_best_seen": best,
                    "probe_polls": polls, "probe_gated": v >= PROBE_QUIET_MIN}
        time.sleep(45)

BM25_QUERIES = {
    "bm25_term": "error",
    "bm25_and": "error AND timeout",
    "bm25_or": "timeout OR refused OR denied",
    "bm25_phrase": '"connection reset"',
}


def main() -> None:
    from pyspark.sql import functions as F

    from siem_on_amazon_opensearch_service_spark import entry as reg
    from siem_on_amazon_opensearch_service_spark.operators.build import build_index
    from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex, search_df
    from siem_on_amazon_opensearch_service_spark.session import get_spark

    label = reg._sf_label(SF_DIR)
    gate = wait_for_quiet()
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS,
                  extra={"spark.sql.adaptive.coalescePartitions.enabled": "false"})
    queries: dict[str, float] = {}
    t_all = time.perf_counter()

    # corpus (cached across rounds; generation is not part of the metric)
    corpus = reg.ensure_corpus(label, spark)
    tdf = spark.read.parquet(corpus)
    n_turns = tdf.count()

    # 1) index build (fresh; best of N runs — the metric is the engine's
    # throughput, not the host's worst scheduling window)
    idx_dir = os.path.join(reg.GEN_ROOT, f"bench_index_sf{label}_c{CPUS}")
    n_build = int(os.environ.get("SPARK_GRAFT_BENCH_BUILD_RUNS", "2"))
    build_runs = []
    build_probes = []  # per-leg capacity reading: the start gate alone
    # missed a mid-run derate in one r4 recording (30s legs at probe 45)
    for _ in range(n_build):
        build_probes.append(probe_1way())
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(spark, tdf, idx_dir, n_salts=8)
        build_runs.append(time.perf_counter() - t0)
    queries["build_probes"] = build_probes
    build_sec = min(build_runs)
    queries["index_build"] = round(build_sec, 3)
    queries["index_build_runs"] = [round(x, 3) for x in build_runs]
    turns_per_sec = n_turns / build_sec

    # 2) BM25 latency p50 (local reader; first call warms segment cache)
    local = LocalIndex(idx_dir)
    for name, q in BM25_QUERIES.items():
        local.search(q, k=10)  # warm
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            local.search(q, k=10)
            times.append(time.perf_counter() - t0)
        queries[name + "_p50"] = round(statistics.median(times), 4)

    # WAND latency: classic OR path + the r2 general-tree path (AND/NOT)
    for name, q in {
        "bm25_or_wand_p50": "timeout OR refused OR denied",
        "bm25_and_wand_p50": "error AND timeout",
        "bm25_mixed_wand_p50": "(error AND NOT timeout) OR refused",
    }.items():
        local.search_wand(q, k=10)
        t0 = time.perf_counter()
        local.search_wand(q, k=10)
        queries[name] = round(time.perf_counter() - t0, 4)

    # distributed searches (scatter/gather shape): AND via the pivot path,
    # single hot term via the pruned + pivot-free path.  Best of 3 (cold
    # driver state each call; the variance is host scheduling, not the plan)
    def best3(fn):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)

    queries["bm25_and_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "error AND timeout", k=10).collect())
    queries["bm25_term_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "error", k=10).collect())
    queries["bm25_phrase_distributed"] = best3(
        lambda: search_df(spark, idx_dir, '"connection reset"', k=10).collect())
    # hot-AND-rare: the intersection-pruned conjunction (drive-by-rarest)
    queries["bm25_hot_and_rare_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "error AND w00042", k=10).collect())
    # general boolean tree (r3): per-branch structural coverage — each OR
    # branch collapses to its rare term's docids
    queries["bm25_or_of_ands_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "(error AND w00042) OR (timeout AND w00043)", k=10).collect())

    # DQL surface (r4): prefix expansion through the cold path
    queries["bm25_prefix_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "w0004*", k=10).collect())

    # fuzzy term expansion (r4b): ~35-term OR from a full-dictionary
    # levenshtein scan, then the standard multi-clause plan
    queries["bm25_fuzzy_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "w00042~1", k=10).collect())
    # wide expansions (r5): 100-term wildcard / ~500-term fuzzy ORs —
    # exercise the budgeted prune planner (early exit, no driver-side
    # rare decode) + the shard-split fused OR plan
    queries["bm25_wildcard_wide_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "w000*", k=10).collect())
    queries["bm25_fuzzy_wide_distributed"] = best3(
        lambda: search_df(spark, idx_dir, "w00042~2", k=10).collect())

    # sloppy phrase (r4c): per-doc greedy min-window sweep over positions
    # (the SloppyPhraseMatcher arithmetic) instead of exact adjacency
    queries["bm25_sloppy_distributed"] = best3(
        lambda: search_df(spark, idx_dir, '"connection reset"~2', k=10).collect())

    # match_phrase_prefix (r4c): last-word dictionary expansion (<=50),
    # union-of-positions adjacency over the expansion slot
    queries["bm25_phrase_prefix_distributed"] = best3(
        lambda: search_df(spark, idx_dir, '"connection re"*', k=10).collect())

    # span_near (r4f): unordered smallest-range sweep over raw positions
    queries["bm25_span_near_distributed"] = best3(
        lambda: search_df(
            spark, idx_dir, "span_near(slop=3 reset connection)", k=10
        ).collect())

    # intervals (r4h): minimal-interval algebra (antichain + filter)
    queries["bm25_intervals_distributed"] = best3(
        lambda: search_df(
            spark, idx_dir,
            "intervals(not_containing(unordered(connection reset) error))",
            k=10,
        ).collect())

    # function_score (r4d): full scored match set (no top-k sort) joined
    # with docs for the decay field, rewrite, TakeOrdered
    from siem_on_amazon_opensearch_service_spark.operators import relevance as _rel

    _fs_fns = [{"kind": "gauss", "field": "ts", "origin": "2025-06-15T00:00:00",
                "scale": 7 * 86400.0, "offset": 86400.0, "decay": 0.5}]
    queries["bm25_function_score_distributed"] = best3(
        lambda: _rel.function_score_df(
            spark, idx_dir, "error OR timeout", k=10, functions=_fs_fns
        ).collect())
    # dis_max (r4d): 3 clause match sets unioned, conditional-max combine
    queries["bm25_dis_max_distributed"] = best3(
        lambda: _rel.dis_max_df(
            spark, idx_dir, ["error", "timeout AND refused", '"connection reset"'],
            k=10, tie_breaker=0.3,
        ).collect())

    # msearch (r4h): 8 dashboard panels from ONE postings scan / decode /
    # aggregation — the whole batch should cost about one multi-clause
    # query, not eight (compare against the per-query *_distributed rows)
    from siem_on_amazon_opensearch_service_spark.operators.search import msearch_df

    _ms_batch = {
        "p_and": "error AND timeout",
        "p_term": "error",
        "p_phrase": '"connection reset"',
        "p_fan": "timeout OR refused OR denied",
        "p_role": "error AND role:assistant",
        "p_mixed": "(error AND NOT timeout) OR refused",
        "p_conj": "connection AND reset",
        "p_boost": "error^2 OR timeout",
    }
    queries["bm25_msearch8_distributed"] = best3(
        lambda: msearch_df(spark, idx_dir, _ms_batch, k=10).collect())

    # warm dashboard session (QuerySession): pinned postings listing;
    # single terms on the zero-exchange fused path, everything else on
    # the r4 one-Python-stage shard-local plan (phrases included)
    from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

    qs = QuerySession(spark, idx_dir)
    qs.search("error AND timeout", k=10).collect()  # session warmup
    queries["bm25_and_distributed_warm"] = best3(
        lambda: qs.search("error AND timeout", k=10).collect())
    queries["bm25_term_distributed_warm"] = best3(
        lambda: qs.search("error", k=10).collect())
    qs.search('"connection reset"', k=10).collect()
    queries["bm25_phrase_distributed_warm"] = best3(
        lambda: qs.search('"connection reset"', k=10).collect())
    qs.search("timeout OR refused OR denied", k=10).collect()
    queries["bm25_or_distributed_warm"] = best3(
        lambda: qs.search("timeout OR refused OR denied", k=10).collect())
    qs.search("w0004*", k=10).collect()
    queries["bm25_prefix_distributed_warm"] = best3(
        lambda: qs.search("w0004*", k=10).collect())
    qs.search("w00042~1", k=10).collect()
    queries["bm25_fuzzy_distributed_warm"] = best3(
        lambda: qs.search("w00042~1", k=10).collect())
    qs.search('"connection reset"~2', k=10).collect()
    queries["bm25_sloppy_distributed_warm"] = best3(
        lambda: qs.search('"connection reset"~2', k=10).collect())
    qs.search('"connection re"*', k=10).collect()
    queries["bm25_phrase_prefix_distributed_warm"] = best3(
        lambda: qs.search('"connection re"*', k=10).collect())
    qs.search("span_near(slop=3 reset connection)", k=10).collect()
    queries["bm25_span_near_distributed_warm"] = best3(
        lambda: qs.search("span_near(slop=3 reset connection)", k=10).collect())
    qs.search("intervals(ordered(max_gaps=2 connection reset))", k=10).collect()
    queries["bm25_intervals_distributed_warm"] = best3(
        lambda: qs.search(
            "intervals(ordered(max_gaps=2 connection reset))", k=10
        ).collect())
    # warm score-rewriting wrappers (r4d): session-pinned base + docs
    _rel.function_score_df(spark, idx_dir, "error OR timeout", k=10,
                           functions=_fs_fns, session=qs).collect()
    queries["bm25_function_score_distributed_warm"] = best3(
        lambda: _rel.function_score_df(
            spark, idx_dir, "error OR timeout", k=10,
            functions=_fs_fns, session=qs).collect())
    queries["bm25_dis_max_distributed_warm"] = best3(
        lambda: _rel.dis_max_df(
            spark, idx_dir, ["error", "timeout AND refused", '"connection reset"'],
            k=10, tie_breaker=0.3, session=qs).collect())
    qs.msearch(_ms_batch, k=10).collect()
    queries["bm25_msearch8_distributed_warm"] = best3(
        lambda: qs.msearch(_ms_batch, k=10).collect())
    qs.close()

    # 3) relational / dedup sample over driver tables
    qmap = reg.queries_map()
    for name in ["tpch_q1_pricing", "events_date_histogram", "events_terms_topn"]:
        t0 = time.perf_counter()
        qmap[name](spark, SF_DIR).collect()
        queries[name] = round(time.perf_counter() - t0, 3)

    # dedup over the transcript corpus.  Signature computation is the
    # scalable per-doc stage; the pair join is corpus-dependent (Zipf-heavy
    # synthetic text collides LSH buckets broadly) so it runs on a 10k
    # sample.  NOTE: .limit(N) funnels the plan into ONE partition —
    # repartition restores parallelism.
    from siem_on_amazon_opensearch_service_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    base = tdf.select(F.monotonically_increasing_id().alias("doc_id"), F.col("text")).filter(
        F.length("text") > 0
    )
    t0 = time.perf_counter()
    minhash_signatures(base.limit(100000).repartition(CPUS), k=3).count()
    queries["minhash_signatures_100k"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    exact_duplicates(base.limit(100000).repartition(CPUS)).count()
    queries["exact_dedup_100k"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    minhash_lsh_pairs(base.limit(10000).repartition(CPUS), k=3, jaccard_min=0.5).count()
    queries["minhash_lsh_pairs_10k"] = round(time.perf_counter() - t0, 3)

    from siem_on_amazon_opensearch_service_spark.operators.dedup import simhash_pairs

    t0 = time.perf_counter()
    simhash_pairs(base.limit(10000).repartition(CPUS), max_hamming=6).count()
    queries["simhash_banded_pairs_10k"] = round(time.perf_counter() - t0, 3)

    # ad-hoc (index-free) BM25 over the transcript corpus (r4f): one
    # stats scan + one scoring scan, no index artifacts — the bench
    # measures the full two-pass cost at corpus scale
    from siem_on_amazon_opensearch_service_spark.operators.adhoc import bm25_adhoc_df

    t0 = time.perf_counter()
    bm25_adhoc_df(
        base, "error AND timeout", k=10, id_col="doc_id", text_col="text"
    ).collect()
    queries["bm25_adhoc_corpus"] = round(time.perf_counter() - t0, 3)

    # sliding-window chunking (r4g): tokenize-once + posexplode over the
    # full transcript text column — the training-pipeline pre-pass cost
    from siem_on_amazon_opensearch_service_spark.operators.chunking import (
        chunk_documents,
        chunk_stats,
    )

    t0 = time.perf_counter()
    chunk_stats(
        chunk_documents(base, "doc_id", F.col("text"), window=64, stride=48),
        "doc_id",
    ).collect()
    queries["chunking_corpus"] = round(time.perf_counter() - t0, 3)

    from siem_on_amazon_opensearch_service_spark.streaming.sessionize import sessionize_batch

    t0 = time.perf_counter()
    sessionize_batch(tdf.select("conv_id", "ts"), gap_minutes=30).count()
    queries["sessionize_batch"] = round(time.perf_counter() - t0, 3)

    # phrase-suggester model build (r4d): one distributed tokenize pass
    # over the docs store, gram counts shuffled at distinct-gram volume
    from siem_on_amazon_opensearch_service_spark.operators import suggest as _sug

    shutil.rmtree(os.path.join(idx_dir, "suggest"), ignore_errors=True)
    t0 = time.perf_counter()
    _sug.build_suggest_model(spark, idx_dir)
    queries["suggest_model_build"] = round(time.perf_counter() - t0, 3)

    # soft deletes (r4i) — LAST: expunge rewrites the bench index.
    # delete = one docs scan + tombstone append; live search = unpruned
    # cold plan + anti-join (the pre-merge tax); expunge = survivor
    # rebuild (the off-ingest maintenance knob, one measured run)
    from siem_on_amazon_opensearch_service_spark.operators import deletes as _del

    t0 = time.perf_counter()
    ndel = _del.delete_by_query(spark, idx_dir, "timeout")["deleted"]
    queries["delete_by_query"] = round(time.perf_counter() - t0, 3)
    queries["delete_by_query_n"] = ndel
    queries["bm25_live_after_delete"] = best3(
        lambda: _del.search_live_df(spark, idx_dir, "error AND refused", k=10).collect())
    # warm live multi-clause (r5): the shard-local fused plan keeps its
    # one-exchange shape under tombstones — the session broadcasts the
    # sorted tombstone array and the generator drops deleted candidates
    # before its per-partition top-k (no anti-join in the plan)
    qs_live = QuerySession(spark, idx_dir)
    _del.search_live_df(
        spark, idx_dir, "error AND refused", k=10, session=qs_live
    ).collect()  # session + tombstone-broadcast warmup
    queries["bm25_live_multiclause_warm"] = best3(
        lambda: _del.search_live_df(
            spark, idx_dir, "error AND refused", k=10, session=qs_live
        ).collect())
    qs_live.close()
    t0 = time.perf_counter()
    _del.expunge_deletes(spark, idx_dir)
    queries["expunge_deletes"] = round(time.perf_counter() - t0, 3)

    total = time.perf_counter() - t_all
    print(
        json.dumps(
            {
                "metric": "index_build+bm25_query_suite",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(label),
                "n_turns": n_turns,
                "turns_per_sec": round(turns_per_sec, 1),
                "cpus": CPUS,
                **gate,
                "probe_end": probe_1way(),
            }
        )
    )


if __name__ == "__main__":
    main()
