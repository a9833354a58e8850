"""Incremental / streaming index maintenance.

The reference is event-driven micro-batch: each S3 object becomes one
Lambda invocation that appends documents to OpenSearch, with at-least-once
delivery deduplicated by doc ``_id`` (SURVEY.md §2.10;
/root/reference/source/lambda/es_loader/index.py:49,326-330).  The Spark
re-expression: Structured Streaming over an arriving-files source with
``foreachBatch`` appending *delta segments* to the same index layout the
batch builder writes — new docIDs continue from the current total, new
partial segment rows join the salted merge, stats/dict are refreshed.

Query correctness is layout-independent (scores depend only on postings
content + corpus stats), so an incrementally-grown index answers queries
identically to a one-shot build over the same rows (tested).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import build as b


def append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    out_dir: str,
    dedupe_within: bool = True,
    dedupe_existing: bool = False,
) -> dict:
    """Append one micro-batch of transcript turns to an existing index
    (creates it when absent).  Idempotency knobs mirror the reference's
    at-least-once handling: drop duplicate (conv_id, turn_idx) within the
    batch; optionally anti-join against already-indexed turns."""
    params_path = os.path.join(out_dir, "_build.json")
    if not os.path.exists(params_path):
        return b.build_index(spark, batch_df, out_dir)

    with open(params_path) as f:
        params = json.load(f)

    if dedupe_within:
        batch_df = batch_df.dropDuplicates(["conv_id", "turn_idx"])
    docs_path = os.path.join(out_dir, "docs")
    if dedupe_existing:
        existing = spark.read.parquet(docs_path).select("conv_id", "turn_idx")
        batch_df = batch_df.join(existing, ["conv_id", "turn_idx"], "left_anti")

    base = params["total_docs"]
    with_ids, new_total, conv_cache = b.assign_docids(batch_df, base=base)
    n_new = new_total - base
    if n_new == 0:
        return {"appended": 0, "total_docs": base}

    nb = max(1, -(-n_new // params["shard_size"]))
    ranged = with_ids.repartitionByRange(nb, "docid").sortWithinPartitions("docid")
    docs_new = b._docs_stage(ranged, params["shard_size"])
    docs_new.write.mode("append").parquet(docs_path)
    conv_cache.unpersist()

    # delta partial segments for the new docid range only
    docs_all = spark.read.parquet(docs_path)
    new_docs = docs_all.filter(F.col("docid") >= base)
    partials = b._partials_stage(new_docs, params["positions"], params["n_salts"])
    partials.repartition(
        max(8, spark.sparkContext.defaultParallelism), "term", "salt"
    ).write.mode("append").parquet(os.path.join(out_dir, "partials"))

    manifest = (
        new_docs.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("n_tokens"),
            F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_nonempty"),
            F.min("docid").alias("min_docid"),
            F.max("docid").alias("max_docid"),
        )
        .withColumn("status", F.lit("complete"))
    )
    manifest.write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    # corpus stats = manifest rollup (cheap; same as the batch builder)
    (
        spark.read.parquet(os.path.join(out_dir, "manifest"))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_nonempty").alias("doc_count"),
            F.sum("n_tokens").alias("sum_dl"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "stats"))
    )

    # idempotent salted merge + dict refresh (same as the batch builder)
    merged = b._merge_stage(spark.read.parquet(os.path.join(out_dir, "partials")))
    (
        merged.sortWithinPartitions("term", "salt", "shard_min")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "postings"))
    )
    post = spark.read.parquet(os.path.join(out_dir, "postings"))
    (
        post.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cttf").alias("cttf"))
        .repartition(1)
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "dict"))
    )
    params["total_docs"] = new_total
    with open(params_path, "w") as f:
        json.dump(params, f)
    return {"appended": n_new, "total_docs": new_total}


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    schema,
    checkpoint: str,
):
    """Structured Streaming driver: new parquet files under ``input_path``
    are indexed as they arrive (exactly-once per file via the streaming
    checkpoint; late data is fine — docs route by content, not arrival,
    like the reference's event-time index routing, aws.ini:111-125)."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda df, epoch: append_batch(spark, df, out_dir))
        .trigger(availableNow=True)
        .start()
    )
