#!/usr/bin/env python
"""Dump .explain('formatted') for the r6 third-pass touched query paths
(dedup pair verification, suggest gram pipeline, build partials write).

    python scripts/dump_plans_r06b.py <out_dir> <suffix>

Run once from the round-start tree (suffix 'before') and once from the
final tree (suffix 'after'); the index is the shared benchx sf0.1 index.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from siem_on_amazon_opensearch_service_spark import entry as reg
    from siem_on_amazon_opensearch_service_spark.operators import suggest as _sug
    from siem_on_amazon_opensearch_service_spark.operators.build import (
        _partials_stage,
        build_index,
    )
    from siem_on_amazon_opensearch_service_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from siem_on_amazon_opensearch_service_spark.session import get_spark

    label = reg._sf_label(SF_DIR)
    spark = get_spark("plans_r06b", cores=CPUS, shuffle_partitions=CPUS,
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

    base = tdf.select(
        F.monotonically_increasing_id().alias("doc_id"), F.col("text")
    ).filter(F.length("text") > 0).limit(10000).repartition(CPUS)

    # persist_intermediates=False so the full lineage (not a checkpoint
    # scan) is visible in the plan
    dump("lsh_pairs", minhash_lsh_pairs(base, k=3, jaccard_min=0.5,
                                        persist_intermediates=False))
    dump("simhash_pairs", simhash_pairs(base, max_hamming=6,
                                        persist_intermediates=False))

    # suggest gram pipeline: the frame feeding the unigram write.  Before:
    # _count_grams groupBy exchange (+ a repartition exchange inside each
    # bucketed write, not visible here).  After: the single bucket-aligned
    # exchange feeds both writes with no further shuffle.
    docs = spark.read.parquet(os.path.join(idx, "docs"))
    nb = _sug._index_buckets(idx)
    if hasattr(_sug, "_bucketed_gram_counts"):
        grams = _sug._bucketed_gram_counts(docs, nb).filter("w2 IS NULL")
    else:
        grams = (
            _sug._count_grams(docs)
            .filter("w2 IS NULL")
            .selectExpr("w1 AS term", "cnt AS ttf")
            .withColumn(
                "bucket",
                F.pmod(F.crc32(F.encode(F.col("term"), "UTF-8")), F.lit(nb)).cast("int"),
            )
            .repartition(nb, "bucket")
        )
    dump("suggest_grams", grams)

    # build partials write input: before = repartition(term, salt) of the
    # encode output (an Exchange of every compressed partial row); after =
    # the encode output written directly
    seg = _partials_stage(tdf_docs(spark, idx), True, 8)
    import inspect

    src = inspect.getsource(sys.modules["siem_on_amazon_opensearch_service_spark.operators.build"])
    if 'seg.repartition(max(8, spark.sparkContext.defaultParallelism), "term", "salt")' in src:
        seg = seg.repartition(max(8, spark.sparkContext.defaultParallelism), "term", "salt")
    dump("build_partials", seg)


def tdf_docs(spark, idx):
    return spark.read.parquet(os.path.join(idx, "docs"))


if __name__ == "__main__":
    main()
