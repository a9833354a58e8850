"""OpenSearch join-field queries over the transcript parent/child model.

The corpus is naturally parent/child: a CONVERSATION (``conv_id``) parents
its TURNS (the indexed docs) — exactly the shape OpenSearch models with a
``join`` field and queries via ``has_child`` / ``has_parent``
(reference surface: the OpenSearch query DSL the repo's saved searches
run against; the reference's own index templates keep related events
flat, but conversation-scoped investigation — "show me whole
conversations containing X" — is the transcript-native form of the same
ask).

- ``has_child_df``: conversations with >= ``min_children`` turns matching
  a child DQL query, scored by ``score_mode`` over the matching
  children's BM25 scores (ES join-field modes: none/min/max/sum/avg).
- ``has_parent_df``: every turn of those conversations, with the
  conversation's aggregate score propagated (``score=True``) or constant
  0 (``score=False`` — ES's default).  In ES the parent is a real doc
  scored by its own query; our parents are implicit, so the parent score
  is DEFINED as the has_child aggregate of the same mode (documented
  divergence).

Exactness recipe: child scores are the engine's float32 BM25 scores;
sum/avg fold them in docid order as float64 (groupBy float sums have
unspecified association — the lm_score lesson), one final float32 cast.
max/min are order-free.  The DuckDB oracle replays the same ordered fold
via ``list_reduce(list_prepend(0.0, list(s ORDER BY docid)), +)``.

Scale shape: ONE exchange (the conv_id aggregation) on top of the child
query's plan; per-group state is conversation-length-bounded, so the
ordered-fold collect_list is safe at any corpus size.  has_parent's
join-back is a conv_id equi join where the aggregate side is
match-bounded (AQE broadcasts it when small)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SCORE_MODES = ("none", "min", "max", "sum", "avg")


def _child_conv_scores(
    spark: SparkSession, index_dir: str, query: str, **filters
) -> DataFrame:
    """(conv_id, docid, score float32) for the child query's full match
    set — search_df(k=None) joined to the column-pruned conv_id map."""
    from .search import search_df

    matched = search_df(spark, index_dir, query, k=None, **filters)
    convs = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "docid", "conv_id"
    )
    return matched.join(convs, "docid")


def _conv_agg(ch: DataFrame, score_mode: str) -> DataFrame:
    """(conv_id, n_children, _sd double) per conversation."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")
    if score_mode in ("sum", "avg"):
        g = ch.groupBy("conv_id").agg(
            F.count("*").alias("n_children"),
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("docid"), F.col("score").cast("double").alias("s"))
                )
            ).alias("_l"),
        )
        ssum = F.aggregate(F.col("_l"), F.lit(0.0), lambda acc, x: acc + x["s"])
        sd = ssum if score_mode == "sum" else ssum / F.col("n_children")
        return g.select("conv_id", "n_children", sd.alias("_sd"))
    if score_mode in ("min", "max"):
        fn = F.max if score_mode == "max" else F.min
        return ch.groupBy("conv_id").agg(
            F.count("*").alias("n_children"),
            fn(F.col("score").cast("double")).alias("_sd"),
        )
    return ch.groupBy("conv_id").agg(F.count("*").alias("n_children")).withColumn(
        "_sd", F.lit(0.0)
    )


def has_child_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int | None = 10,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
    **filters,
) -> DataFrame:
    """(conv_id, n_children, score float) — conversations whose turns
    match the child DQL ``query``, ES join-field semantics.  Top-k by
    (score desc, conv_id asc); ``k=None`` returns all, unordered."""
    agg = _conv_agg(
        _child_conv_scores(spark, index_dir, query, **filters), score_mode
    )
    out = agg.filter(F.col("n_children") >= int(min_children))
    if max_children is not None:
        out = out.filter(F.col("n_children") <= int(max_children))
    out = out.select(
        "conv_id", "n_children", F.col("_sd").cast("float").alias("score")
    )
    if k is None:
        return out
    return out.orderBy(F.col("score").desc(), F.col("conv_id").asc()).limit(int(k))


def has_parent_df(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int | None = 10,
    score_mode: str = "max",
    score: bool = True,
    **filters,
) -> DataFrame:
    """(docid, conv_id, score float) — EVERY turn of each conversation
    matching the child query ("show whole conversations containing X").
    ``score=True`` propagates the conversation's ``score_mode`` aggregate
    to each turn; ``score=False`` (the ES default) emits 0.  Top-k by
    (score desc, docid asc); ``k=None`` returns all, unordered."""
    agg = _conv_agg(
        _child_conv_scores(spark, index_dir, query, **filters), score_mode
    )
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "docid", "conv_id"
    )
    sd = F.col("_sd") if score else F.lit(0.0)
    out = docs.join(agg, "conv_id").select(
        "docid", "conv_id", sd.cast("float").alias("score")
    )
    if k is None:
        return out
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(int(k))
