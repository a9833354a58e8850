#!/usr/bin/env python
"""Optimization-round measurement harness (bench.py stays FROZEN).

Times individual bench bars in isolation with labeled jobs so wins can be
attributed per operator; selection by name prefix via argv.  Same data
contract as bench.py ($SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS), same query
shapes, noop-sink/collect methodology identical to the frozen bench so
numbers are comparable bar-for-bar.

    python bench_extra.py [bar-prefix ...]        # default: all bars
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py build
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_REPS", "3"))

_MS_BATCH = {
    "p_and": "error AND timeout",
    "p_term": "error",
    "p_phrase": '"connection reset"',
    "p_fan": "timeout OR refused OR denied",
    "p_role": "error AND role:assistant",
    "p_mixed": "(error AND NOT timeout) OR refused",
    "p_conj": "connection AND reset",
    "p_boost": "error^2 OR timeout",
}


def main() -> None:
    from pyspark.sql import functions as F

    from siem_on_amazon_opensearch_service_spark import entry as reg
    from siem_on_amazon_opensearch_service_spark.operators.build import build_index
    from siem_on_amazon_opensearch_service_spark.operators.search import (
        QuerySession,
        msearch_df,
        search_df,
    )
    from siem_on_amazon_opensearch_service_spark.session import get_spark

    want = sys.argv[1:]

    def pick(name: str) -> bool:
        return not want or any(name.startswith(w) for w in want)

    label = reg._sf_label(SF_DIR)
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS,
                      extra={"spark.sql.adaptive.coalescePartitions.enabled": "false"})
    sc = spark.sparkContext
    out: dict[str, object] = {}

    corpus = reg.ensure_corpus(label, spark)
    tdf = spark.read.parquet(corpus)

    idx_dir = os.path.join(reg.GEN_ROOT, f"benchx_index_sf{label}_c{CPUS}")

    def timed(name, fn, reps=REPEAT):
        if not pick(name):
            return
        ts = []
        for _ in range(reps):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"min": min(ts), "all": ts}
        print(f"  {name}: min={min(ts)} all={ts}", file=sys.stderr)

    # --- index build (fresh, with per-stage breakdown) ---------------------
    if pick("build"):
        for run in range(2):
            shutil.rmtree(idx_dir, ignore_errors=True)
            sc.setJobDescription(f"build run{run}")
            t0 = time.perf_counter()
            st = build_index(spark, tdf, idx_dir, n_salts=8)
            out[f"build_run{run}"] = {
                "sec": round(time.perf_counter() - t0, 3),
                "stages": st["stage_secs"],
            }
            print(f"  build_run{run}: {out[f'build_run{run}']}", file=sys.stderr)
        sc.setJobDescription(None)
    if not os.path.exists(os.path.join(idx_dir, "_build.json")):
        build_index(spark, tdf, idx_dir, n_salts=8)

    # --- local WAND latency (bench.py specs verbatim: one warm call, one
    # timed call per query) --------------------------------------------------
    if pick("wand"):
        from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex

        local = LocalIndex(idx_dir)
        for name, q in {
            "wand_or": "timeout OR refused OR denied",
            "wand_and": "error AND timeout",
            "wand_mixed": "(error AND NOT timeout) OR refused",
        }.items():
            local.search_wand(q, k=10)  # warm (segment cache)
            ts = []
            for _ in range(REPEAT):
                t0 = time.perf_counter()
                local.search_wand(q, k=10)
                ts.append(round(time.perf_counter() - t0, 4))
            out[name] = {"min": min(ts), "all": ts}
            print(f"  {name}: min={min(ts)} all={ts}", file=sys.stderr)

    # --- cold searches ------------------------------------------------------
    timed("cold_and", lambda: search_df(spark, idx_dir, "error AND timeout", k=10).collect())
    timed("cold_term", lambda: search_df(spark, idx_dir, "error", k=10).collect())
    timed("cold_phrase", lambda: search_df(spark, idx_dir, '"connection reset"', k=10).collect())
    timed("cold_wildcard_wide", lambda: search_df(spark, idx_dir, "w000*", k=10).collect())
    timed("cold_fuzzy_wide", lambda: search_df(spark, idx_dir, "w00042~2", k=10).collect())
    timed("cold_msearch8", lambda: msearch_df(spark, idx_dir, _MS_BATCH, k=10).collect())

    # --- relevance wrappers (bench.py specs verbatim) ----------------------
    from siem_on_amazon_opensearch_service_spark.operators import relevance as _rel

    _FS_FNS = [{"kind": "gauss", "field": "ts", "origin": "2025-06-15T00:00:00",
                "scale": 7 * 86400.0, "offset": 86400.0, "decay": 0.5}]
    _DM_QS = ["error", "timeout AND refused", '"connection reset"']
    timed("cold_function_score",
          lambda: _rel.function_score_df(
              spark, idx_dir, "error OR timeout", k=10, functions=_FS_FNS).collect())
    timed("cold_dis_max",
          lambda: _rel.dis_max_df(
              spark, idx_dir, _DM_QS, k=10, tie_breaker=0.3).collect())

    # --- warm session -------------------------------------------------------
    if pick("warm") or pick("cold_function_score") or pick("cold_dis_max"):
        qs = QuerySession(spark, idx_dir)
        _rel.function_score_df(spark, idx_dir, "error OR timeout", k=10,
                               functions=_FS_FNS, session=qs).collect()
        timed("warm_function_score",
              lambda: _rel.function_score_df(
                  spark, idx_dir, "error OR timeout", k=10,
                  functions=_FS_FNS, session=qs).collect())
        timed("warm_dis_max",
              lambda: _rel.dis_max_df(
                  spark, idx_dir, _DM_QS, k=10, tie_breaker=0.3,
                  session=qs).collect())
        qs.close()

    if pick("warm"):
        qs = QuerySession(spark, idx_dir)
        qs.search("error AND timeout", k=10).collect()
        timed("warm_and", lambda: qs.search("error AND timeout", k=10).collect())
        timed("warm_term", lambda: qs.search("error", k=10).collect())
        qs.search('"connection reset"', k=10).collect()
        timed("warm_phrase", lambda: qs.search('"connection reset"', k=10).collect())
        qs.search("w00042~1", k=10).collect()
        timed("warm_fuzzy", lambda: qs.search("w00042~1", k=10).collect())
        qs.search("w00042~2", k=10).collect()
        timed("warm_fuzzy_wide", lambda: qs.search("w00042~2", k=10).collect())
        qs.msearch(_MS_BATCH, k=10).collect()
        timed("warm_msearch8", lambda: qs.msearch(_MS_BATCH, k=10).collect())
        qs.close()

    # --- relational ---------------------------------------------------------
    qmap = reg.queries_map()
    for name in ["tpch_q1_pricing", "events_date_histogram", "events_terms_topn"]:
        timed(name, lambda n=name: qmap[n](spark, SF_DIR).collect())

    # --- dedup / pipeline samples (bench.py shapes verbatim) ---------------
    from siem_on_amazon_opensearch_service_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
        minhash_signatures,
        simhash_pairs,
    )

    base = tdf.select(F.monotonically_increasing_id().alias("doc_id"), F.col("text")).filter(
        F.length("text") > 0
    )
    timed("minhash_signatures_100k",
          lambda: minhash_signatures(base.limit(100000).repartition(CPUS), k=3).count())
    timed("exact_dedup_100k",
          lambda: exact_duplicates(base.limit(100000).repartition(CPUS)).count())
    timed("minhash_lsh_pairs_10k",
          lambda: minhash_lsh_pairs(base.limit(10000).repartition(CPUS), k=3, jaccard_min=0.5).count())
    timed("simhash_banded_pairs_10k",
          lambda: simhash_pairs(base.limit(10000).repartition(CPUS), max_hamming=6).count())

    from siem_on_amazon_opensearch_service_spark.operators.adhoc import bm25_adhoc_df

    timed("bm25_adhoc_corpus",
          lambda: bm25_adhoc_df(base, "error AND timeout", k=10, id_col="doc_id", text_col="text").collect())

    from siem_on_amazon_opensearch_service_spark.operators.chunking import (
        chunk_documents,
        chunk_stats,
    )

    timed("chunking_corpus",
          lambda: chunk_stats(
              chunk_documents(base, "doc_id", F.col("text"), window=64, stride=48),
              "doc_id").collect())

    from siem_on_amazon_opensearch_service_spark.streaming.sessionize import sessionize_batch

    timed("sessionize_batch",
          lambda: sessionize_batch(tdf.select("conv_id", "ts"), gap_minutes=30).count())

    # --- suggest model ------------------------------------------------------
    from siem_on_amazon_opensearch_service_spark.operators import suggest as _sug

    def run_suggest():
        shutil.rmtree(os.path.join(idx_dir, "suggest"), ignore_errors=True)
        _sug.build_suggest_model(spark, idx_dir)

    timed("suggest_model_build", run_suggest, reps=min(REPEAT, 2))

    # --- deletes (mutates the benchx index; LAST) --------------------------
    if pick("deletes"):
        from siem_on_amazon_opensearch_service_spark.operators import deletes as _del

        sc.setJobDescription("delete_by_query")
        t0 = time.perf_counter()
        ndel = _del.delete_by_query(spark, idx_dir, "timeout")["deleted"]
        out["delete_by_query"] = {"sec": round(time.perf_counter() - t0, 3), "n": ndel}
        timed("bm25_live_after_delete",
              lambda: _del.search_live_df(spark, idx_dir, "error AND refused", k=10).collect())
        sc.setJobDescription("expunge_deletes")
        t0 = time.perf_counter()
        _del.expunge_deletes(spark, idx_dir)
        out["expunge_deletes"] = {"sec": round(time.perf_counter() - t0, 3)}
        sc.setJobDescription(None)
        print(f"  delete/expunge: {out.get('delete_by_query')} {out.get('expunge_deletes')}",
              file=sys.stderr)

    print(json.dumps({"sf": float(label), "cpus": CPUS, "bars": out}))


if __name__ == "__main__":
    main()
