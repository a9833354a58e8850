"""Distributed inverted-index build (the reference's delegated Lucene layer,
re-expressed Spark-first — SURVEY.md §2.12, BASELINE.json north_rule).

Pipeline (all DataFrame ops; Python only inside Arrow-batched UDFs):

1. **Stable dense docIDs** under (conv_id, turn_idx) order, independent of
   parallelism: per-conversation sizes -> range-partition by conv_id ->
   per-partition offsets from a driver-side cumulative of partition sums
   (NB rows, not data rows) -> docid = conv_base + turn_idx (turn_idx is
   validated dense).  Two cheap jobs over the *conversation* table; no
   global window over the data (SURVEY.md §4.2 item 4).

2. **Docs table**: docid, keyword/ts columns, text, dl (token count) and the
   Lucene lossy norm byte; written range-partitioned + sorted by docid so
   query-time norm/filter joins and shard pruning get parquet min/max
   skipping.  ``shard = docid // shard_size`` — content-deterministic
   (depends on data size, never on parallelism).

3. **Per-shard postings** via applyInPandas over shard groups (partial
   aggregation: one compressed segment row per (term, shard) — the map-side
   combine of the term shuffle).

4. **Salted repartition-by-term merge**: rows shuffle on (term, salt) where
   salt = shard % n_salts, so a hot term ('error' appears in ~every turn)
   is split across n_salts reducers instead of melting one task; merge is
   byte concatenation (delta chains restart per block).  Plain
   groupBy(term) would put the whole hot-term posting list in one task —
   AQE skew handling does not apply to aggregation keys (SURVEY.md §4.1).

5. **Dict + stats**: per-term global df/cttf; corpus N, docCount, sumdl.

6. **Manifest**: one lineage row per shard (counts, bytes, status) — the
   checkpoint-resume unit.  build_index() skips shards already complete and
   appends only missing ones (idempotent segment commit; analogue of the
   reference's SQS re-enqueue/DLQ redrive,
   /root/reference/source/lambda/es_loader/index.py:527-545).
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.smallfloat import encode_lengths
from . import segments

DOCS_SCHEMA = (
    "docid long, conv_id string, turn_idx int, role string, tool string, "
    "ts timestamp, text string, dl long, norm int, shard int"
)

# Postings land in term-hash bucket subdirectories (postings/bucket=K/) so an
# incremental append rewrites only the buckets containing touched terms —
# O(touched buckets / n_buckets) of the index bytes per micro-batch instead of
# O(index) — and a query's driver-side reads target only its terms' buckets.
# The bucket hash is term-only (all salt rows of a term share one bucket):
# a hot term appearing in every batch then costs ONE bucket rewrite, and a
# query term maps to exactly one subdirectory.  crc32 is used because the
# identical value is computable JVM-side (F.crc32, for the partitioned write)
# and driver-side (zlib.crc32, for bucket targeting) without a py4j round-trip.
DEFAULT_POSTINGS_BUCKETS = 64


def default_postings_buckets(total_docs: int) -> int:
    """Data-driven bucket count: ~1 bucket per 125k docs, power of two,
    clamped to [16, 4096].  Few buckets on small corpora keep the
    partitioned writer's per-file overhead negligible (measured 2x merge
    write cost at 64 buckets on a 200k-doc corpus, where 16 suffice);
    the clamp's top end keeps append granularity fine at 10^9+ docs."""
    import math

    raw = max(1, total_docs // 125_000)
    return max(16, min(4096, 1 << math.ceil(math.log2(raw)))) if raw > 1 else 16


def postings_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side bucket id for a term (must match postings_bucket_col)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def postings_bucket_col(n_buckets: int):
    """JVM-side bucket id expression over the ``term`` column."""
    return F.pmod(F.crc32(F.encode(F.col("term"), "UTF-8")), F.lit(n_buckets)).cast("int")


def write_dict_bucketed(d: DataFrame, dict_path: str, n_buckets: int) -> None:
    """Write the term dictionary partitioned by the SAME term-hash bucket
    as the postings (dict/bucket=K/), term-sorted within each file.  A
    streaming append then swaps only the touched bucket dirs — the r3
    postings fix applied to the dict (VERDICT r3 item 4: the dict was the
    last O(vocabulary)-IO-per-batch artifact).  Exact-term lookups narrow
    to their buckets; prefix scans read every bucket but keep per-file
    parquet min/max pruning from the in-bucket term sort."""
    (
        d.withColumn("bucket", postings_bucket_col(n_buckets))
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(dict_path)
    )


def write_postings_bucketed(merged: DataFrame, postings_path: str, n_buckets: int) -> None:
    """Write merged segment rows partitioned by term bucket, term-sorted
    within each file.  ``bucket`` leads the sort so the partitioned writer's
    required ordering is already satisfied (orderingMatched — no extra sort
    that would destroy the term clustering parquet min/max pruning relies
    on)."""
    (
        merged.withColumn("bucket", postings_bucket_col(n_buckets))
        .sortWithinPartitions("bucket", "term", "salt", "shard_min")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(postings_path)
    )


def assign_docids(df: DataFrame, num_buckets: int = 64, validate: bool = True, base: int = 0):
    """Add a dense int64 ``docid`` column under stable (conv_id, turn_idx)
    order; returns (df_with_docid, base + n_rows, cached_handle).
    Deterministic at any parallelism: docid is the global rank (+ ``base``
    for incremental appends), computed from per-conversation sizes +
    driver-side partition offsets (never from partition iteration order).
    ``cached_handle`` is the persisted per-conversation table backing the
    lazy join — unpersist it once the result has been materialized."""
    spark = df.sparkSession
    sizes = df.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
    )
    ranged = (
        sizes.repartitionByRange(num_buckets, "conv_id")
        .sortWithinPartitions("conv_id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    agg = ranged.groupBy("pid").agg(
        F.sum("n").alias("s"),
        F.sum(F.when((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1), 1).otherwise(0)).alias("bad"),
        F.sum(F.when(F.col("mx") - F.col("mn") + 1 != F.col("n"), 1).otherwise(0)).alias("holes"),
    ).collect()
    if validate and sum(r["bad"] for r in agg):
        raise ValueError("turn_idx is not dense 0-based within some conversation")
    if sum(r["holes"] for r in agg):
        # contiguity is load-bearing in all modes: docid = base + (turn_idx
        # - mn) is a bijection onto [base, base+n) only for gap-free ranges
        raise ValueError("turn_idx has holes within some conversation")
    psums = {r["pid"]: r["s"] for r in agg}
    bases: dict[int, int] = {}
    acc = base
    for pid in sorted(psums):
        bases[pid] = acc
        acc += psums[pid]
    total = acc
    b_bases = spark.sparkContext.broadcast(bases)

    def offsets(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("conv_id", kind="mergesort")
        base = b_bases.value[int(pdf["pid"].iloc[0])]
        csum = pdf["n"].cumsum() - pdf["n"]
        # conv_base is shifted by -mn so docid = conv_base + turn_idx stays
        # a dense rank even when a conversation's retained turn range is
        # contiguous-but-offset (time-bucket subsets under rotation)
        return pd.DataFrame(
            {"conv_id": pdf["conv_id"], "conv_base": base + csum - pdf["mn"]}
        )

    conv_base = ranged.groupBy("pid").applyInPandas(offsets, schema="conv_id string, conv_base long")
    # the per-conversation offset table has no stats (UDF output), so Spark
    # would sort-merge-join it; broadcast explicitly while it fits (at
    # 10^12 turns it won't, and the shuffle join is then the right plan)
    if total - base <= 20_000_000:
        conv_base = F.broadcast(conv_base)
    out = (
        df.join(conv_base, "conv_id")
        .withColumn("docid", F.col("conv_base") + F.col("turn_idx").cast("long"))
        .drop("conv_base")
    )
    return out, total, ranged


def _docs_stage(with_ids: DataFrame, shard_size: int) -> DataFrame:
    """Add dl / norm / shard columns (vectorized tokenize for counting)."""

    def add_len(batches):
        for pdf in batches:
            dl = segments.token_counts(pdf["text"])
            pdf = pdf.assign(
                dl=dl,
                norm=encode_lengths(dl).astype(np.int32),
                shard=(pdf["docid"].to_numpy() // shard_size).astype(np.int32),
            )
            yield pdf[[c.split()[0] for c in DOCS_SCHEMA.split(", ")]]

    cols = ["docid", "conv_id", "turn_idx", "role", "tool", "ts", "text"]
    return with_ids.select(*cols).mapInPandas(add_len, schema=DOCS_SCHEMA)


def _partials_stage(docs: DataFrame, positions: bool, n_salts: int) -> DataFrame:
    """Shard-grouped partial postings (map-side combine of the term shuffle):
    one compressed segment row per (term, shard)."""

    def per_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("docid", kind="mergesort")
        toks = segments.tokenize_series(pdf["text"])
        return segments.encode_shard_postings(
            int(key[0]),
            pdf["docid"].to_numpy(),
            pdf["norm"].to_numpy().astype(np.uint8),
            toks,
            positions,
            n_salts,
        )

    return docs.select("shard", "docid", "norm", "text").groupBy("shard").applyInPandas(
        per_shard, schema=segments.SEGMENT_SCHEMA
    )


def _merge_stage(
    partials: DataFrame,
    num_partitions: int | None = None,
    n_buckets: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Salted repartition-by-term merge: shuffle on (term, salt) so hot terms
    split across n_salts reducers; byte-concat merge (no re-encode).

    Implemented as repartition + one vectorized pandas pass per partition
    (segments.merge_partition) rather than groupBy().applyInPandas — with
    millions of (term, salt) groups the per-group Arrow round-trip dominates
    (measured 29s -> ~4s at sf0.1); the shuffle itself is identical.

    Replay-idempotent: a crash between the partials append and the manifest
    commit leaves the next resume re-running those shards, appending
    byte-identical partial rows a second time.  Same-key duplicates are
    dropped here (same (term, salt, shard_min) AND same docs_bytes — a
    legitimate cross-batch row sharing a boundary shard id has different
    absolute docids, hence different bytes), so a replayed shard can never
    double df/tf/postings."""
    np_ = num_partitions or max(8, partials.sparkSession.sparkContext.defaultParallelism)
    seg_cols = [c.split()[0] for c in segments.SEGMENT_SCHEMA.split(", ") if " " in c]

    def merge(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs, ignore_index=True)
        pdf = pdf[seg_cols].drop_duplicates(subset=["term", "salt", "shard_min", "docs_bytes"])
        if len(pdf):
            yield segments.merge_partition(pdf, max_bytes=max_bytes)

    if n_buckets:
        # Shuffle on (bucket, salt) instead of (term, salt): bucket is a
        # deterministic coarsening of term, so (term, salt) groups are still
        # co-located — same merge semantics, same hot-term salting spread —
        # but each reducer then holds whole buckets, so the partitioned
        # bucket write emits ~one file per (bucket, reducer) instead of one
        # per (bucket, reducer, interleaved-run).
        shuffled = partials.withColumn("bucket", postings_bucket_col(n_buckets)).repartition(
            np_, "bucket", "salt"
        )
    else:
        shuffled = partials.repartition(np_, "term", "salt")
    return shuffled.mapInPandas(merge, schema=segments.SEGMENT_SCHEMA)


DEFAULT_SHARD_DOCS = 32768


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_shards: int | None = None,
    n_salts: int = 8,
    positions: bool = True,
    resume: bool = True,
    write_partitions: int | None = None,
    n_buckets: int | None = None,
    validate_dense: bool = True,
    max_segment_bytes: int | None = None,
) -> dict:
    """Build (or resume) the index at ``out_dir``; returns build stats.

    ``max_segment_bytes`` caps a merged (term, salt) row's docs_bytes:
    hot terms emit one row per ~max_segment_bytes shard-run instead of
    one row concatenating the whole residue class — the row-width knob
    for corpora where a hot term's postings exceed comfortable task
    memory (SCALE.md §8).  Persisted in _build.json so incremental
    appends and expunge merges keep the same row geometry.

    ``validate_dense=False`` skips the dense-turn_idx corpus-contract
    check — required for indexes over time-bucket SUBSETS (rotation:
    a conversation crossing a bucket boundary keeps a contiguous but
    non-0-based turn range).  docid stability only needs DISTINCT
    (conv_id, turn_idx) sort keys, which any subset preserves.

    AQE partition coalescing is disabled for the duration: it sizes
    partitions by shuffle BYTES, but the shard/merge stages carry small
    bytes with huge per-row UDF cost, so coalescing collapses them to a
    handful of tasks and the build stops scaling with cores (measured:
    partials stage flat 31-35s from 8 to 32 cores before; CPU-bound after).
    """
    spark_conf = spark.conf
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev_coalesce = spark_conf.get(coalesce_key, "true")
    spark_conf.set(coalesce_key, "false")
    try:
        return _build_index_inner(
            spark, transcripts, out_dir, n_shards, n_salts, positions, resume,
            write_partitions, n_buckets, validate_dense, max_segment_bytes,
        )
    finally:
        spark_conf.set(coalesce_key, prev_coalesce)


def _build_index_inner(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_shards: int | None,
    n_salts: int,
    positions: bool,
    resume: bool,
    write_partitions: int | None,
    n_buckets: int | None,
    validate_dense: bool = True,
    max_segment_bytes: int | None = None,
) -> dict:
    import time as _time

    stage_secs: dict[str, float] = {}
    _t = _time.perf_counter

    def _mark(name: str, t0: float) -> float:
        t1 = _t()
        stage_secs[name] = round(t1 - t0, 2)
        return t1

    t0 = _t()
    os.makedirs(out_dir, exist_ok=True)
    params_path = os.path.join(out_dir, "_build.json")
    docs_path = os.path.join(out_dir, "docs")
    stats_path = os.path.join(out_dir, "stats")
    postings_path = os.path.join(out_dir, "postings")
    dict_path = os.path.join(out_dir, "dict")
    manifest_path = os.path.join(out_dir, "manifest")

    params = None
    if resume and os.path.exists(params_path):
        with open(params_path) as f:
            params = json.load(f)
        n_shards = params["n_shards"]
        n_salts = params["n_salts"]
        positions = params["positions"]
        n_buckets = params.get("postings_buckets", 0)
        max_segment_bytes = params.get("max_segment_bytes")

    done_shards: set[int] = set()
    if resume and params is not None and os.path.exists(manifest_path):
        mdf = spark.read.parquet(manifest_path).filter(F.col("status") == "complete")
        done_shards = {r["shard"] for r in mdf.select("shard").distinct().collect()}

    docs_ready = params is not None and os.path.exists(os.path.join(docs_path, "_SUCCESS"))
    if not docs_ready:
        with_ids, total, conv_cache = assign_docids(transcripts, validate=validate_dense)
        if n_shards is None:
            # data-driven shard count: ~32k docs per shard.  Fixed by DATA
            # SIZE (content-deterministic across cluster sizes); small
            # enough that a shard's Arrow group + exploded token stream
            # stays cache/memory-friendly (155k-doc groups measured 4x
            # slower per doc under 32-way concurrency than 16-32k groups)
            n_shards = max(8, -(-total // DEFAULT_SHARD_DOCS))
        shard_size = max(1, -(-total // n_shards))  # ceil
        if n_buckets is None:
            n_buckets = default_postings_buckets(total)
        # range-partition BEFORE the tokenize stage: repartitionByRange
        # samples its input, so putting it after mapInPandas would execute
        # the tokenize pipeline twice (once for the sampling job)
        ranged = with_ids.repartitionByRange(n_shards, "docid").sortWithinPartitions("docid")
        t0 = _mark("assign_docids", t0)
        docs = _docs_stage(ranged, shard_size)
        docs.write.mode("overwrite").parquet(docs_path)
        conv_cache.unpersist()
        t0 = _mark("docs_write", t0)
        docs = spark.read.parquet(docs_path)
        params = {
            "n_shards": n_shards,
            "n_salts": n_salts,
            "positions": positions,
            "shard_size": shard_size,
            "total_docs": total,
            "postings_buckets": n_buckets,
            "max_segment_bytes": max_segment_bytes,
        }
        with open(params_path, "w") as f:
            json.dump(params, f)
        done_shards = set()
    else:
        docs = spark.read.parquet(docs_path)

    partials_path = os.path.join(out_dir, "partials")
    all_shards = set(range(-(-params["total_docs"] // params["shard_size"])))
    todo = sorted(all_shards - done_shards)
    built = 0
    if todo:
        # checkpoint unit = shard: the expensive tokenize+encode stage is
        # persisted per shard; a resumed build appends only missing shards.
        subset = docs if not done_shards else docs.filter(F.col("shard").isin(todo))
        seg = _partials_stage(subset, positions, n_salts)
        # r6b: write partials STRAIGHT from the per-shard encode tasks.
        # The (term, salt) repartition that used to sit here was a full
        # exchange of every compressed partial row that bought nothing:
        # parquet re-reads lose the partitioning, so _merge_stage always
        # re-shuffles by (bucket, salt) anyway, and no partials consumer
        # (merge, append recovery, expunge decode) needs term clustering
        # — they either re-shuffle or stream row-at-a-time.  Encode tasks
        # are shard-balanced, so the direct write is balanced too.
        # r6c gate: the direct write emits ~one file per shard group, so
        # when the batch has FEWER shards than cores the partials scan
        # would under-split every later consumer (the sf0.1 expunge bar
        # measured ~+1 s from an 8-way decode on 32 cores).  Below that
        # threshold keep the old (term, salt)-keyed spread — the exchange
        # is small exactly when it fires, and at scale (shards >= cores,
        # the 100 TB shape) the direct write stands.
        par = spark.sparkContext.defaultParallelism
        if len(todo) < par:
            seg = seg.repartition(max(8, par), "term", "salt")
        seg.write.mode("append").parquet(partials_path)
        t0 = _mark("partials", t0)
        # lineage/metrics per shard — the resume unit (north_rule)
        manifest = (
            subset.groupBy("shard")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("dl").alias("n_tokens"),
                F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_nonempty"),
                F.min("docid").alias("min_docid"),
                F.max("docid").alias("max_docid"),
            )
            .withColumn("status", F.lit("complete"))
        )
        manifest.write.mode("append").parquet(manifest_path)
        built = len(todo)
        t0 = _mark("manifest", t0)

    if todo or not os.path.exists(os.path.join(stats_path, "_SUCCESS")):
        # corpus stats = manifest rollup (a few-hundred-row agg) — NOT a
        # second full docs scan.  Also recomputed when missing: a crash
        # between the manifest commit and this write leaves all shards
        # complete but no stats; the resume pass must still produce them.
        (
            spark.read.parquet(manifest_path)
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_nonempty").alias("doc_count"),
                F.sum("n_tokens").alias("sum_dl"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stats_path)
        )
        t0 = _mark("stats", t0)

    if todo or not os.path.exists(os.path.join(postings_path, "_SUCCESS")):
        # idempotent final merge over ALL partials: output is independent of
        # how many resume passes produced them (byte-identical segments,
        # SURVEY.md §5.2 item 5); cost is a shuffle of already-compressed
        # blobs, far below the tokenize stage it avoids repeating.
        wp = write_partitions or max(8, spark.sparkContext.defaultParallelism)
        merged = _merge_stage(spark.read.parquet(partials_path), wp,
                              n_buckets=n_buckets or None, max_bytes=max_segment_bytes)
        # merge output is already hash-partitioned; an in-partition sort
        # gives term-clustered files (parquet min/max row-group skipping at
        # query time) without a second shuffle
        if n_buckets:
            write_postings_bucketed(merged, postings_path, n_buckets)
        else:
            (
                merged.sortWithinPartitions("term", "salt", "shard_min")
                .write.mode("overwrite")
                .parquet(postings_path)
            )
        t0 = _mark("merge", t0)
        # term dictionary (global df/cttf) — derived from final postings
        post = spark.read.parquet(postings_path)
        agg = post.groupBy("term").agg(F.sum("df").alias("df"), F.sum("cttf").alias("cttf"))
        if n_buckets:
            write_dict_bucketed(agg, dict_path, n_buckets)
        else:
            # legacy flat layout: range-partitioned on term (NOT
            # repartition(1): a 10^8-term vocab through one writer is a
            # bottleneck); term-sorted files keep min/max pruning
            ndp = max(1, spark.sparkContext.defaultParallelism // 4)
            (
                agg.repartitionByRange(ndp, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(dict_path)
            )
        t0 = _mark("dict", t0)
    st = spark.read.parquet(stats_path).collect()[0]
    return {
        "n_docs": st["n_docs"],
        "doc_count": st["doc_count"],
        "sum_dl": st["sum_dl"],
        "shards_built": built,
        "shards_total": len(all_shards),
        "params": params,
        "stage_secs": stage_secs,
    }


def reindex(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    query: str | None = None,
    n_shards: int | None = None,
    n_salts: int | None = None,
    positions: bool | None = None,
    n_buckets: int | None = None,
    scope: str = "conversation",
) -> dict:
    """OpenSearch ``_reindex`` re-expressed: rebuild an index from its own
    docs store into ``dst_dir`` with (optionally) different settings —
    positions on/off, shard/salt/bucket counts — and/or restricted to the
    matches of a DQL ``query``.

    The query filter is the percolator's index-free column predicate, so
    selection is one scan of the docs store — no search plan, no second
    index.  ``scope`` picks the export unit:

    * ``"conversation"`` (default): any turn matches -> ALL of its
      conversation's turns are copied (the investigation-export shape:
      "every conversation containing X").  Turn ranges stay dense, so
      the full docid-assignment validation applies unchanged.
    * ``"turn"``: ONLY the matching turns are copied.  The retained
      turn_idx values are sparse, so they are compacted to a dense
      0-based rank per conversation (window rank over the original
      order — conversations are bounded, so the partition-by-conv_id
      shuffle has no skew) before docid assignment.  Original turn
      identity stays recoverable through the untouched ``ts`` column
      (and per-turn text equality, which tests assert); the original
      index remains the provenance store, exactly as OpenSearch
      ``_reindex`` keeps ``_source`` but renumbers nothing for you.

    Settings default to the source index's _build.json values.  Returns
    the new index's build stats."""
    if scope not in ("conversation", "turn"):
        raise ValueError(f"reindex scope must be 'conversation' or 'turn', got {scope!r}")
    with open(os.path.join(src_dir, "_build.json")) as f:
        src_params = json.load(f)
    docs = spark.read.parquet(os.path.join(src_dir, "docs")).select(
        "conv_id", "turn_idx", "role", "tool", "ts", "text"
    )
    if query is not None:
        from .percolate import compile_predicate, with_tokens

        pred = compile_predicate(query)
        matches = with_tokens(docs).filter(
            pred(F.col("__toks"), F.col("role"), F.col("tool"), F.col("ts"))
        ).drop("__toks")
        if scope == "turn":
            from pyspark.sql import Window

            w = Window.partitionBy("conv_id").orderBy("turn_idx")
            docs = (
                matches.withColumn("turn_idx", F.row_number().over(w) - 1)
            )
        else:
            hit_convs = matches.select("conv_id").distinct()
            docs = docs.join(hit_convs, "conv_id", "left_semi")
    return build_index(
        spark,
        docs,
        dst_dir,
        n_shards=n_shards,
        n_salts=n_salts if n_salts is not None else src_params["n_salts"],
        positions=positions if positions is not None else src_params["positions"],
        n_buckets=n_buckets,
        # a query-filtered subset keeps whole conversations, so turn ranges
        # stay dense 0-based and the full validation applies
        validate_dense=True,
    )


def force_merge(spark: SparkSession, index_dir: str) -> dict:
    """OpenSearch ``_forcemerge`` re-expressed: compact a grown index's
    postings/dict stores back to the one-shot write layout.

    Streaming appends leave multiple parquet files per bucket dir (each
    touched-bucket swap writes the bucket anew, but appends to ``docs``
    accumulate, and the per-append merge output is sized by the batch,
    not the corpus).  This rewrites every bucket term-sorted in one pass
    — restoring the in-file term clustering that parquet min/max pruning
    relies on — and swaps dirs atomically per bucket; the index answers
    queries identically before and after (content is unchanged, layout is
    not).  Returns file counts before/after.  IO is O(index) by design —
    this is the explicit read-optimize knob, run off the ingest path,
    exactly like Lucene's."""
    with open(os.path.join(index_dir, "_build.json")) as f:
        params = json.load(f)
    nb = params.get("postings_buckets", 0)

    def _count_files(sub: str) -> int:
        base = os.path.join(index_dir, sub)
        return sum(
            1
            for r, _, fs in os.walk(base)
            for f in fs
            if f.endswith(".parquet")
        )

    before = {"postings": _count_files("postings"), "dict": _count_files("dict")}
    postings_path = os.path.join(index_dir, "postings")
    dict_path = os.path.join(index_dir, "dict")
    if nb:
        merged = spark.read.parquet(postings_path).drop("bucket")
        tmp = postings_path + "_fm"
        shutil.rmtree(tmp, ignore_errors=True)
        write_postings_bucketed(merged.repartition(nb, postings_bucket_col(nb)), tmp, nb)
        shutil.rmtree(postings_path, ignore_errors=True)
        os.replace(tmp, postings_path)
        d = spark.read.parquet(dict_path)
        if "bucket" in d.columns:
            d = d.drop("bucket")
        tmpd = dict_path + "_fm"
        shutil.rmtree(tmpd, ignore_errors=True)
        write_dict_bucketed(d, tmpd, nb)
        shutil.rmtree(dict_path, ignore_errors=True)
        os.replace(tmpd, dict_path)
    else:
        for path, order in ((postings_path, ["term", "salt", "shard_min"]), (dict_path, ["term"])):
            df = spark.read.parquet(path)
            tmp = path + "_fm"
            shutil.rmtree(tmp, ignore_errors=True)
            npart = max(1, spark.sparkContext.defaultParallelism // 4)
            (
                df.repartitionByRange(npart, order[0])
                .sortWithinPartitions(*order)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            shutil.rmtree(path, ignore_errors=True)
            os.replace(tmp, path)
    open(os.path.join(postings_path, "_SUCCESS"), "a").close()
    open(os.path.join(dict_path, "_SUCCESS"), "a").close()
    after = {"postings": _count_files("postings"), "dict": _count_files("dict")}
    return {"files_before": before, "files_after": after}


def snapshot(index_dir: str, snap_dir: str) -> dict:
    """OpenSearch ``_snapshot`` re-expressed for the filesystem store:
    copy every index file under ``snap_dir`` and write a
    ``_snapshot.json`` manifest (relative path, size, md5 per file) the
    restore path verifies.  The snapshot is taken from a quiesced index
    (the streaming appender's exactly-once protocol keeps the store
    consistent between batches; snapshot between appends, like ES
    flushes before snapshotting a shard).

    On a real cluster the same manifest-of-checksummed-files shape works
    over object storage (the copy becomes a distcp-style parallel copy);
    the manifest is what makes restore verifiable, not the transport."""
    import hashlib

    if os.path.exists(snap_dir):
        raise ValueError(f"snapshot target {snap_dir!r} already exists")
    files = {}
    for root, _, fs in os.walk(index_dir):
        for fn in sorted(fs):
            src = os.path.join(root, fn)
            rel = os.path.relpath(src, index_dir)
            dst = os.path.join(snap_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
            with open(src, "rb") as f:
                digest = hashlib.md5(f.read()).hexdigest()
            files[rel] = {"bytes": os.path.getsize(src), "md5": digest}
    manifest = {"files": files, "source": os.path.abspath(index_dir)}
    with open(os.path.join(snap_dir, "_snapshot.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return {"n_files": len(files), "bytes": sum(v["bytes"] for v in files.values())}


def verify_snapshot(snap_dir: str) -> dict:
    """Integrity check: every manifest entry present with matching size
    and md5, and no unmanifested files.  Raises on any mismatch."""
    import hashlib

    with open(os.path.join(snap_dir, "_snapshot.json")) as f:
        manifest = json.load(f)
    seen = set()
    for root, _, fs in os.walk(snap_dir):
        for fn in fs:
            if fn == "_snapshot.json":
                continue
            rel = os.path.relpath(os.path.join(root, fn), snap_dir)
            seen.add(rel)
    want = set(manifest["files"])
    if seen != want:
        raise ValueError(
            f"snapshot {snap_dir!r} file set mismatch: "
            f"missing={sorted(want - seen)[:5]} extra={sorted(seen - want)[:5]}"
        )
    for rel, meta in manifest["files"].items():
        p = os.path.join(snap_dir, rel)
        if os.path.getsize(p) != meta["bytes"]:
            raise ValueError(f"snapshot file {rel!r} size mismatch")
        with open(p, "rb") as f:
            if hashlib.md5(f.read()).hexdigest() != meta["md5"]:
                raise ValueError(f"snapshot file {rel!r} checksum mismatch")
    return {"n_files": len(manifest["files"])}


def restore_snapshot(snap_dir: str, dest_dir: str) -> dict:
    """Restore a verified snapshot into ``dest_dir`` (must not exist —
    restoring over a live index is the ES error too).  Verifies BEFORE
    copying, then re-verifies the copied tree's checksums."""
    import hashlib

    verify_snapshot(snap_dir)
    if os.path.exists(dest_dir):
        raise ValueError(f"restore target {dest_dir!r} already exists")
    with open(os.path.join(snap_dir, "_snapshot.json")) as f:
        manifest = json.load(f)
    for rel, meta in manifest["files"].items():
        src = os.path.join(snap_dir, rel)
        dst = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
        with open(dst, "rb") as f:
            if hashlib.md5(f.read()).hexdigest() != meta["md5"]:
                raise ValueError(f"restored file {rel!r} checksum mismatch")
    return {"n_files": len(manifest["files"])}
