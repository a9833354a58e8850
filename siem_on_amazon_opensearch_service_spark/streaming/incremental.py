"""Incremental / streaming index maintenance.

The reference is event-driven micro-batch: each S3 object becomes one
Lambda invocation that appends documents to OpenSearch, with at-least-once
delivery deduplicated by doc ``_id`` (SURVEY.md §2.10;
/root/reference/source/lambda/es_loader/index.py:49,326-330).  The Spark
re-expression: Structured Streaming over an arriving-files source with
``foreachBatch`` appending *delta segments* to the same index layout the
batch builder writes — new docIDs continue from the current total, new
partial segment rows join the salted merge, stats/dict are refreshed.

Scale + exactly-once properties (r2, after VERDICT/ADVICE r1):

- **Affected-groups-only merge**: an append re-merges ONLY the (term, salt)
  groups present in the batch's partials; untouched postings rows are
  carried over verbatim, and the dict is an arithmetic upsert (df/cttf are
  additive over partials).  Per-batch cost is O(batch terms), not O(index).
- **Idempotent under foreachBatch at-least-once replay**: applied batch ids
  are recorded in ``_build.json`` (written atomically LAST); a replayed
  batch id is a no-op.  A crash mid-append leaves orphan docids >= the
  committed total; the next append detects and removes them (docs /
  partials / manifest) and rebuilds derived artifacts before proceeding.

Query correctness is layout-independent (scores depend only on postings
content + corpus stats), so an incrementally-grown index answers queries
identically to a one-shot build over the same rows (tested).
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import build as b
from ..operators import segments


def _write_params(params_path: str, params: dict) -> None:
    """Atomic commit point of an append: tmp + rename."""
    tmp = params_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, params_path)


def _swap_write(df: DataFrame, path: str) -> None:
    """Materialize ``df`` to a sibling tmp dir, then swap it into ``path``
    (never overwrite a directory that feeds the plan being written)."""
    tmp = path + "_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)


def _first_docid_udf():
    # built lazily: decorating at import time needs an active SparkSession
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def fd(docs_bytes: pd.Series) -> pd.Series:
        return pd.Series(segments.first_docids(docs_bytes))

    return fd


def _refresh_postings_dict_full(spark: SparkSession, out_dir: str) -> None:
    """Crash-recovery slow path: rebuild postings + dict from all partials."""
    with open(os.path.join(out_dir, "_build.json")) as f:
        _bp = json.load(f)
    nb = _bp.get("postings_buckets", 0)
    merged = b._merge_stage(
        spark.read.parquet(os.path.join(out_dir, "partials")), n_buckets=nb or None,
        max_bytes=_bp.get("max_segment_bytes"),
    )
    postings_path = os.path.join(out_dir, "postings")
    if nb:
        tmp = postings_path + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        b.write_postings_bucketed(merged, tmp, nb)
        shutil.rmtree(postings_path, ignore_errors=True)
        os.replace(tmp, postings_path)
    else:
        _swap_write(
            merged.sortWithinPartitions("term", "salt", "shard_min"), postings_path
        )
    post = spark.read.parquet(os.path.join(out_dir, "postings"))
    agg = post.groupBy("term").agg(F.sum("df").alias("df"), F.sum("cttf").alias("cttf"))
    dict_path = os.path.join(out_dir, "dict")
    if nb:
        tmp = dict_path + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        b.write_dict_bucketed(agg, tmp, nb)
        shutil.rmtree(dict_path, ignore_errors=True)
        os.replace(tmp, dict_path)
    else:
        ndp = max(1, spark.sparkContext.defaultParallelism // 4)
        _swap_write(
            agg.repartitionByRange(ndp, "term").sortWithinPartitions("term"), dict_path
        )
    open(os.path.join(out_dir, "postings", "_SUCCESS"), "a").close()
    open(os.path.join(dict_path, "_SUCCESS"), "a").close()


def _write_stats_from_manifest(spark: SparkSession, out_dir: str) -> None:
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


def recover_orphans(spark: SparkSession, out_dir: str, params: dict) -> bool:
    """Remove artifacts of a crashed (uncommitted) append.

    The commit point is the ``_build.json`` write; anything with
    docid >= params['total_docs'] is from an append that never committed.
    Docs/manifest filter directly; partial segment rows are orphans when
    their shard id is past the committed range, or — for the boundary
    shard shared between batches — when their first absolute docid is past
    the committed total.  Derived artifacts (postings/dict/stats) are then
    rebuilt from the cleaned inputs.

    Crash-safe ordering: the docs max-docid check is the ONLY detection
    trigger, so docs are filtered LAST.  Partials, manifest, and every
    derived artifact are cleaned first — all of those filters are
    idempotent (a re-run over already-clean inputs keeps everything) — so
    a crash at any point mid-recovery leaves the trigger intact and the
    next append re-runs recovery to completion.  Returns True if recovery
    ran."""
    # an interrupted EXPUNGE swap must roll forward first: recovery's
    # trigger (max docid >= total_docs) cannot see that state, and
    # _refresh_postings_dict_full over a half-swapped index would rebuild
    # postings from whichever partials generation happens to be live
    from ..operators.deletes import complete_expunge_swap

    complete_expunge_swap(out_dir)
    total = params["total_docs"]
    ssz = params["shard_size"]
    docs_path = os.path.join(out_dir, "docs")
    docs = spark.read.parquet(docs_path)
    mx = docs.agg(F.max("docid")).first()[0]
    if mx is None or mx < total:
        return False
    b0 = (total - 1) // ssz  # last committed shard id (may be shared)

    partials_path = os.path.join(out_dir, "partials")
    partials = spark.read.parquet(partials_path)
    keep = (F.col("shard_min") < b0) | (
        (F.col("shard_min") == b0) & (_first_docid_udf()(F.col("docs_bytes")) < total)
    )
    _swap_write(partials.filter(keep), partials_path)

    manifest_path = os.path.join(out_dir, "manifest")
    _swap_write(
        spark.read.parquet(manifest_path).filter(F.col("min_docid") < total),
        manifest_path,
    )
    _write_stats_from_manifest(spark, out_dir)
    _refresh_postings_dict_full(spark, out_dir)

    # a crashed append may have half-folded its gram counts into the
    # suggest model (which has no docid column to filter on): drop the
    # whole model — it is derived state, rebuilt on demand from docs
    shutil.rmtree(os.path.join(out_dir, "suggest"), ignore_errors=True)

    # trigger cleared last: only once every other artifact is clean
    _swap_write(docs.filter(F.col("docid") < total), docs_path)
    open(os.path.join(docs_path, "_SUCCESS"), "a").close()
    return True


def append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    out_dir: str,
    dedupe_within: bool = True,
    dedupe_existing: bool = False,
    batch_id: int | str | None = None,
) -> dict:
    """Append one micro-batch of transcript turns to an existing index
    (creates it when absent).  At-least-once handling mirrors the
    reference's doc-id dedup: duplicate (conv_id, turn_idx) within the
    batch dropped; ``batch_id`` (foreachBatch epoch) makes replays of an
    already-committed batch a no-op; a crashed (uncommitted) append is
    rolled back before the new one applies."""
    params_path = os.path.join(out_dir, "_build.json")
    if not os.path.exists(params_path):
        st = b.build_index(spark, batch_df, out_dir)
        if batch_id is not None:
            st["params"]["applied_batches"] = [str(batch_id)]
            _write_params(params_path, st["params"])
        return st

    with open(params_path) as f:
        params = json.load(f)

    applied = params.get("applied_batches", [])
    if batch_id is not None and str(batch_id) in applied:
        return {"appended": 0, "total_docs": params["total_docs"], "skipped_replay": True}

    recovered = recover_orphans(spark, out_dir, params)

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
        if batch_id is not None:
            params.setdefault("applied_batches", []).append(str(batch_id))
            _write_params(params_path, params)
        return {"appended": 0, "total_docs": base, "recovered": recovered}

    nb = max(1, -(-n_new // params["shard_size"]))
    ranged = with_ids.repartitionByRange(nb, "docid").sortWithinPartitions("docid")
    docs_new = b._docs_stage(ranged, params["shard_size"])
    docs_new.write.mode("append").parquet(docs_path)
    conv_cache.unpersist()

    # delta partial segments for the new docid range only
    new_docs = spark.read.parquet(docs_path).filter(F.col("docid") >= base)
    partials_path = os.path.join(out_dir, "partials")
    new_partials = b._partials_stage(new_docs, params["positions"], params["n_salts"])
    new_partials = new_partials.repartition(
        max(8, spark.sparkContext.defaultParallelism), "term", "salt"
    ).persist()
    new_partials.write.mode("append").parquet(partials_path)

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
    _write_stats_from_manifest(spark, out_dir)

    # ---- affected-groups-only merge: untouched (term, salt) postings rows
    # carry over verbatim; only groups present in this batch re-merge.
    # Postings rows ARE valid segment rows (same schema), so the re-merge
    # input is (old rows of touched groups) ∪ (new partial rows).
    postings_path = os.path.join(out_dir, "postings")
    touched = new_partials.select("term", "salt").distinct()
    nb = params.get("postings_buckets", 0)
    if nb:
        # Bucketed store: only the buckets containing touched terms are
        # read back and physically rewritten — IO per batch is
        # O(touched-bucket bytes), not O(index).  Untouched bucket
        # directories are never listed, read, or written.  Bucket swaps
        # are not atomic as a set, but the commit point is _build.json:
        # a crash mid-swap leaves docs max-docid >= committed total, so
        # the next append's recover_orphans rebuilds postings fully.
        tb = sorted(
            r["b"]
            for r in new_partials.select(b.postings_bucket_col(nb).alias("b")).distinct().collect()
        )
        old_post = spark.read.parquet(postings_path).filter(F.col("bucket").isin(tb))
        untouched = old_post.join(F.broadcast(touched), ["term", "salt"], "left_anti").drop("bucket")
        touched_old = old_post.join(F.broadcast(touched), ["term", "salt"], "left_semi").drop("bucket")
        re_merged = b._merge_stage(touched_old.unionByName(new_partials), n_buckets=nb,
                                   max_bytes=params.get("max_segment_bytes"))
        tmp = postings_path + "_tmpb"
        shutil.rmtree(tmp, ignore_errors=True)
        b.write_postings_bucketed(untouched.unionByName(re_merged), tmp, nb)
        for kbucket in tb:
            src = os.path.join(tmp, f"bucket={kbucket}")
            dst = os.path.join(postings_path, f"bucket={kbucket}")
            if os.path.exists(src):
                shutil.rmtree(dst, ignore_errors=True)
                os.replace(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        old_post = spark.read.parquet(postings_path)
        untouched = old_post.join(F.broadcast(touched), ["term", "salt"], "left_anti")
        touched_old = old_post.join(F.broadcast(touched), ["term", "salt"], "left_semi")
        re_merged = b._merge_stage(touched_old.unionByName(new_partials),
                                   max_bytes=params.get("max_segment_bytes"))
        _swap_write(
            untouched.unionByName(re_merged.sortWithinPartitions("term", "salt", "shard_min")),
            postings_path,
        )
    open(os.path.join(postings_path, "_SUCCESS"), "a").close()

    # ---- dict upsert: df/cttf are additive over partials, so the new
    # dict = old dict ⊕ per-term sums of just this batch's partials
    dict_path = os.path.join(out_dir, "dict")
    delta = new_partials.groupBy("term").agg(
        F.sum("df").alias("d_df"), F.sum("cttf").alias("d_cttf")
    )
    dict_bucketed = (
        bool(nb)
        and os.path.isdir(dict_path)
        and any(e.startswith("bucket=") for e in os.listdir(dict_path))
    )

    def _upsert(old_dict: DataFrame) -> DataFrame:
        return old_dict.join(delta, "term", "full_outer").select(
            "term",
            (F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("d_df"), F.lit(0))).alias("df"),
            (F.coalesce(F.col("cttf"), F.lit(0)) + F.coalesce(F.col("d_cttf"), F.lit(0))).alias("cttf"),
        )

    if dict_bucketed:
        # Bucketed dict (r4, VERDICT r3 item 4): the delta's terms live in
        # exactly the touched postings buckets (same crc32), so only those
        # bucket dirs are read, upserted, and swapped — IO per batch is
        # O(touched-bucket terms), not O(vocabulary).  Crash mid-swap is
        # covered by the same recover_orphans full rebuild as postings.
        old_dict = spark.read.parquet(dict_path).filter(F.col("bucket").isin(tb)).drop("bucket")
        tmpd = dict_path + "_tmpb"
        shutil.rmtree(tmpd, ignore_errors=True)
        b.write_dict_bucketed(_upsert(old_dict), tmpd, nb)
        for kbucket in tb:
            src = os.path.join(tmpd, f"bucket={kbucket}")
            dst = os.path.join(dict_path, f"bucket={kbucket}")
            if os.path.exists(src):
                shutil.rmtree(dst, ignore_errors=True)
                os.replace(src, dst)
        shutil.rmtree(tmpd, ignore_errors=True)
    else:
        ndp = max(1, spark.sparkContext.defaultParallelism // 4)
        _swap_write(
            _upsert(spark.read.parquet(dict_path))
            .repartitionByRange(ndp, "term")
            .sortWithinPartitions("term"),
            dict_path,
        )
    open(os.path.join(dict_path, "_SUCCESS"), "a").close()

    # ---- suggest model freshness: if a Stupid Backoff model was built for
    # this index, fold the batch's gram counts in (additive upsert, touched
    # buckets only) BEFORE the commit point — phrase_suggest would otherwise
    # silently score against pre-append statistics forever.  A crash here
    # leaves orphan docids, and recover_orphans drops the model entirely.
    from ..operators import suggest as sg

    sg.append_suggest_grams(spark, out_dir, new_docs)

    n_touched = touched.count()
    new_partials.unpersist()

    params["total_docs"] = new_total
    if batch_id is not None:
        params.setdefault("applied_batches", []).append(str(batch_id))
    _write_params(params_path, params)  # the commit point
    return {
        "appended": n_new,
        "total_docs": new_total,
        "merged_groups": n_touched,
        "recovered": recovered,
    }


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    schema,
    checkpoint: str,
):
    """Structured Streaming driver: new parquet files under ``input_path``
    are indexed as they arrive.  Exactly-once per batch: the streaming
    checkpoint dedups file *discovery*, and append_batch's recorded
    batch ids + orphan rollback make the foreachBatch body idempotent
    under at-least-once replay (late data is fine — docs route by
    content, not arrival, like the reference's event-time index routing,
    aws.ini:111-125)."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda df, epoch: append_batch(spark, df, out_dir, batch_id=epoch))
        .trigger(availableNow=True)
        .start()
    )
