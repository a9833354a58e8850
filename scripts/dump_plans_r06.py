#!/usr/bin/env python
"""Dump .explain('formatted') for the r6-touched query paths.

    python scripts/dump_plans_r06.py <out_dir> <suffix>

Run once from the round-start tree (suffix 'before') and once from the
final tree (suffix 'after'); the index is the shared benchx sf0.1 index.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)

    from siem_on_amazon_opensearch_service_spark import entry as reg
    from siem_on_amazon_opensearch_service_spark.operators.build import build_index
    from siem_on_amazon_opensearch_service_spark.operators.search import (
        QuerySession,
        msearch_df,
        search_df,
    )
    from siem_on_amazon_opensearch_service_spark.session import get_spark

    label = reg._sf_label(SF_DIR)
    spark = get_spark("plans_r06", cores=CPUS, shuffle_partitions=CPUS,
                      extra={"spark.sql.adaptive.coalescePartitions.enabled": "false"})
    tdf = spark.read.parquet(reg.ensure_corpus(label, spark))
    idx = os.path.join(reg.GEN_ROOT, f"benchx_index_sf{label}_c{CPUS}")
    if not os.path.exists(os.path.join(idx, "_build.json")):
        build_index(spark, tdf, idx, n_salts=8)

    def dump(name: str, df) -> None:
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print("wrote", p)

    dump("msearch8_cold", msearch_df(spark, idx, _MS_BATCH, k=10))
    dump("fuzzy_wide_cold", search_df(spark, idx, "w00042~2", k=10))
    dump("wildcard_wide_cold", search_df(spark, idx, "w000*", k=10))
    dump("and_cold", search_df(spark, idx, "error AND timeout", k=10))

    from siem_on_amazon_opensearch_service_spark.operators import relevance as _rel

    _FS_FNS = [{"kind": "gauss", "field": "ts", "origin": "2025-06-15T00:00:00",
                "scale": 7 * 86400.0, "offset": 86400.0, "decay": 0.5}]
    _DM_QS = ["error", "timeout AND refused", '"connection reset"']
    dump("dis_max_cold", _rel.dis_max_df(spark, idx, _DM_QS, k=10, tie_breaker=0.3))
    dump("function_score_cold", _rel.function_score_df(
        spark, idx, "error OR timeout", k=10, functions=_FS_FNS))

    qs = QuerySession(spark, idx)
    try:
        qs.search("error AND timeout", k=10).collect()
        dump("and_warm", qs.search("error AND timeout", k=10))
        dump("fuzzy_wide_warm", qs.search("w00042~2", k=10))
        dump("msearch8_warm", qs.msearch(_MS_BATCH, k=10))
        dump("dis_max_warm", _rel.dis_max_df(
            spark, idx, _DM_QS, k=10, tie_breaker=0.3, session=qs))
        dump("function_score_warm", _rel.function_score_df(
            spark, idx, "error OR timeout", k=10, functions=_FS_FNS, session=qs))
    finally:
        qs.close()


if __name__ == "__main__":
    main()
