"""Nested docs: per-element query and aggregation semantics over
``array<struct>`` columns.

The reference maps ``threat.enrichments`` as ``"type": "nested"``
(`/root/reference/source/lambda/deploy_es/data.ini:280-302`): each array
element is indexed as its own hidden sub-document, so a bool inside a
``nested`` query must match within ONE element.  That is the whole point
of the mapping type — under the default (flattened object) mapping,
``provider = 'x' AND score >= 50`` cross-matches one element's provider
with another element's score.  A SIEM user filtering
``threat.enrichments.matched.provider`` inside one enrichment element
relies on this.

Spark re-expression — all JVM-side higher-order functions, no explode in
filter context and no Python:

* ``nested`` query (filter context) -> ``F.exists(arr, pred)``: one
  whole-stage-codegen predicate per doc, zero shuffle added to whatever
  plan it joins.
* ``nested`` agg -> ONE ``explode`` then a normal partial+final
  aggregation: doc_count counts ELEMENTS (the nested context's hidden
  docs, exactly OpenSearch's nested-agg doc_count).
* ``reverse_nested`` -> count DISTINCT parent ids alongside: back in the
  parent context, how many real documents carry the bucket's elements.

Scale shape: the filter adds no exchange; the agg explodes to element
grain (bounded: enrichment arrays are small constants per doc) and
aggregates by bucket key — the same two-exchange shape as any terms agg.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nested_exists(arr: Column, pred: Callable[[Column], Column]) -> Column:
    """OpenSearch ``nested`` query in filter context: does SOME element
    satisfy ``pred`` (all conditions on the SAME element)?  ``pred``
    receives the element struct and returns a boolean Column.  NULL
    arrays match nothing (missing nested field semantics)."""
    return F.coalesce(F.exists(arr, pred), F.lit(False))


def nested_filter(df: DataFrame, arr_col: str, pred: Callable[[Column], Column]) -> DataFrame:
    """Filter parents by a nested query — ``nested_exists`` over the
    named array column."""
    return df.filter(nested_exists(F.col(arr_col), pred))


def nested_terms_agg(
    df: DataFrame,
    arr_col: str,
    key: str,
    n: int = 10,
    parent_key: str = "docid",
    pred: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """``nested`` agg -> ``terms`` on an element field, with a
    ``reverse_nested {}`` sub-agg: per element-field value, the element
    count (nested doc_count) and the distinct parent-document count.
    ``pred`` optionally filters ELEMENTS first (a filter agg inside the
    nested context).  Output: (key, doc_count, parent_docs), doc_count
    desc / key asc, top-n."""
    arr = F.col(arr_col)
    if pred is not None:
        arr = F.filter(arr, pred)
    ex = df.select(F.col(parent_key).alias("__parent"), F.explode(arr).alias("e"))
    return (
        ex.groupBy(F.col("e." + key).alias(key))
        .agg(
            F.count("*").alias("doc_count"),
            F.count_distinct("__parent").alias("parent_docs"),
        )
        .orderBy(F.col("doc_count").desc(), F.col(key).asc())
        .limit(n)
    )


def nested_search_df(
    spark,
    index_dir: str,
    query: str,
    k: int,
    with_nested: Callable[[DataFrame], DataFrame],
    arr_col: str,
    pred: Callable[[Column], Column],
) -> DataFrame:
    """Scored search with a ``nested`` filter: the full scored match set
    (``search_df(k=None)``, posting algebra — candidate-sized) joins the
    docs projection, ``with_nested`` attaches/derives the nested column,
    the per-element predicate filters, and the page is a TakeOrdered.
    Scores are untouched (the nested clause is filter context).  At
    100 TB the nested predicate runs on the match set only, never the
    corpus."""
    import os

    from .search import search_df

    scored = search_df(spark, index_dir, query, k=None)
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    joined = with_nested(scored.join(docs, "docid"))
    live = nested_filter(joined, arr_col, pred)
    return (
        live.select("docid", "score")
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )
