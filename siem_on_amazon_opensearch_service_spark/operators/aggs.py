"""Dashboard aggregation operators (SURVEY.md §2.5).

These re-express, as DataFrame transforms, every aggregation the
reference's saved dashboards run through OpenSearch (extracted from
/root/reference/source/saved_objects/**/*.ndjson ``visState.aggs``):
terms-top-N (323×), count (220×), cardinality (32×), date_histogram (34×),
sum/max/avg, top_hits (32×), percentiles, filters-agg (45×) and the
bucket pipeline aggs (max/avg/sum/min_bucket).

All are pure built-in-function compositions — no UDFs — so Catalyst gives
partial aggregation, pushdown and whole-stage codegen for free; results are
deterministically ordered (metric desc, key asc) to mirror the OpenSearch
terms-agg tie-break and keep oracle comparisons stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def terms_topn(df: DataFrame, field: str, n: int = 10, metric: Column | None = None, metric_name: str = "cnt") -> DataFrame:
    """OpenSearch ``terms`` bucket agg: top-N keys by metric (default doc
    count), OpenSearch tie-break (metric desc, key asc)."""
    metric = metric if metric is not None else F.count("*")
    return (
        df.groupBy(field)
        .agg(metric.alias(metric_name))
        .orderBy(F.col(metric_name).desc(), F.col(field).asc())
        .limit(n)
    )


def date_histogram(df: DataFrame, ts: str = "ts", interval: str = "hour", metrics: list[Column] | None = None) -> DataFrame:
    """OpenSearch ``date_histogram``: tumbling event-time buckets."""
    metrics = metrics or [F.count("*").alias("cnt")]
    return (
        df.groupBy(F.date_trunc(interval, F.col(ts)).alias("bucket"))
        .agg(*metrics)
        .orderBy("bucket")
    )


def cardinality(df: DataFrame, field: str, exact: bool = False) -> DataFrame:
    """OpenSearch ``cardinality`` (HLL approx; exact variant for oracles)."""
    agg = F.count_distinct(F.col(field)) if exact else F.approx_count_distinct(field)
    return df.agg(agg.alias("cardinality"))


def filters_agg(df: DataFrame, buckets: dict[str, Column]) -> DataFrame:
    """OpenSearch ``filters`` agg: named predicate buckets -> counts.
    One pass, conditional counts, unpivoted to (bucket, cnt) rows."""
    aggs = [F.count(F.when(cond, 1)).alias(name) for name, cond in buckets.items()]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in buckets)
    return wide.selectExpr(f"stack({len(buckets)}, {stack}) as (bucket, cnt)").orderBy("bucket")


def top_hits(df: DataFrame, bucket: str, order_by: str, desc: bool = True, n_per_bucket: int = 1) -> DataFrame:
    """OpenSearch ``top_hits``: latest/first doc per bucket
    (row_number over an in-bucket sort)."""
    oc = F.col(order_by).desc() if desc else F.col(order_by).asc()
    w = Window.partitionBy(bucket).orderBy(oc)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_bucket)
        .drop("rn")
        .orderBy(bucket)
    )


def pipeline_bucket(df: DataFrame, outer: str, inner: Column, how: str = "max", metric: Column | None = None) -> DataFrame:
    """OpenSearch pipeline aggs (``max_bucket``/``min_bucket``/``avg_bucket``
    /``sum_bucket``): aggregate over sibling buckets' results.
    Two-level groupBy: inner buckets per outer key, then ``how`` over the
    inner metric."""
    metric = metric if metric is not None else F.count("*")
    per_bucket = df.groupBy(F.col(outer), inner.alias("inner_bucket")).agg(metric.alias("m"))
    outer_agg = {
        "max": F.max("m"),
        "min": F.min("m"),
        "avg": F.avg("m"),
        "sum": F.sum("m"),
    }[how]
    return per_bucket.groupBy(outer).agg(outer_agg.alias(f"{how}_bucket")).orderBy(outer)


def percentiles(df: DataFrame, field: str, qs: list[float]) -> DataFrame:
    """OpenSearch ``percentiles`` — exact interpolated percentile (matches
    SQL quantile_cont); approx variant is percentile_approx."""
    aggs = [F.percentile(F.col(field), q).alias(f"p{int(q*100)}") for q in qs]
    return df.agg(*aggs)


def value_histogram(df: DataFrame, field: str, interval: float, metrics: list[Column] | None = None) -> DataFrame:
    """OpenSearch numeric ``histogram`` agg: fixed-width value buckets
    (bucket key = floor(value / interval) * interval)."""
    metrics = metrics or [F.count("*").alias("cnt")]
    key = (F.floor(F.col(field) / interval) * interval).alias("bucket")
    return df.groupBy(key).agg(*metrics).orderBy("bucket")


def range_agg(df: DataFrame, field: str, edges: list[float]) -> DataFrame:
    """OpenSearch ``range`` agg: half-open buckets [lo, hi) from the sorted
    edge list, plus the open tail; labeled 'lo-hi' like OpenSearch keys."""
    if not edges:
        raise ValueError("range_agg requires at least one edge")
    c = F.col(field)
    # Seed with the open tail so a single-edge list is valid; chain the
    # [lo, hi) buckets onto it.  Carry the numeric lo so ordering is by
    # bucket position, not the label string ('100-200' < '30-70' lexically).
    tail = f"{edges[-1]:g}-*"
    expr = F.when(c >= edges[-1], tail)
    lo_expr = F.when(c >= edges[-1], F.lit(float(edges[-1])))
    for lo, hi in zip(edges, edges[1:]):
        lbl = f"{lo:g}-{hi:g}"
        cond = (c >= lo) & (c < hi)
        expr = expr.when(cond, lbl)
        lo_expr = lo_expr.when(cond, F.lit(float(lo)))
    return (
        df.withColumn("range_key", expr)
        .withColumn("_range_lo", lo_expr)
        .filter(F.col("range_key").isNotNull())
        .groupBy("range_key")
        .agg(F.count("*").alias("cnt"), F.first("_range_lo").alias("_lo"))
        .orderBy("_lo")
        .drop("_lo")
    )


def moving_avg(df: DataFrame, ts: str = "ts", interval: str = "day", window_size: int = 3) -> DataFrame:
    """OpenSearch ``moving_avg``/``moving_fn`` pipeline agg over a
    date_histogram: trailing mean of the last ``window_size`` buckets
    (window frame ROWS window_size-1 PRECEDING).

    Scale shape (this and the two pipeline aggs below): the unpartitioned
    ``Window.orderBy(bucket)`` funnels ONE task — deliberately.  Its
    input is the date_histogram output, whose row count is the number of
    time buckets (dozens to a few thousand even over 10^12 events —
    bounded by time range / interval, never by data volume), arriving
    pre-aggregated from the partial+final histogram.  A partitioned
    two-stage rewrite would only matter for pathological intervals
    (e.g. per-second buckets over years), where the caller should
    coarsen the histogram instead."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket").rowsBetween(-(window_size - 1), 0)
    return per.withColumn("mov_avg", F.round(F.avg("cnt").over(w), 4)).orderBy("bucket")


def derivative(df: DataFrame, ts: str = "ts", interval: str = "day") -> DataFrame:
    """OpenSearch ``derivative`` pipeline agg: bucket-over-bucket delta of
    a date_histogram count (first bucket null, like OpenSearch)."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket")
    return per.withColumn("deriv", F.col("cnt") - F.lag("cnt").over(w)).orderBy("bucket")


def cumulative_sum(df: DataFrame, ts: str = "ts", interval: str = "day") -> DataFrame:
    """OpenSearch ``cumulative_sum`` pipeline agg over a date_histogram."""
    per = date_histogram(df, ts, interval)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per.withColumn("cum", F.sum("cnt").over(w)).orderBy("bucket")
