"""OpenSearch index-rollup jobs re-expressed: pre-aggregate raw events
into a coarse summary store and answer dashboard aggregations FROM the
rollup, never the raw index.

The reference provisions the OpenSearch ops plane that hosts rollup/ISM
jobs (`/root/reference/source/lambda/deploy_es/index.py:397` loads ISM
policies; long-horizon SIEM dashboards are the rollup use case).  A
rollup job declares (date_histogram grain, dimension terms, metrics);
the job materializes ``count/sum/min/max`` per (bucket, dims) — **avg
is never stored**: it re-derives as ``sum/count`` at query time, so
re-aggregating to a coarser grain stays exact (the OpenSearch rollup
composability rule).

Scale shape: the build is ONE partially-aggregated groupBy (map-side
combine, shuffle keyed on (bucket, dims) — cardinality ~ time-range x
dims, orders of magnitude below the raw rows), and every later dashboard
query scans the summary store instead of the 100 TB raw corpus.  A
coarser-grain query is a second tiny groupBy over the summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_rollup(
    df: DataFrame,
    ts_col: str,
    interval: str,
    dims: list[str],
    metric_col: str,
) -> DataFrame:
    """The rollup job body: (bucket, *dims) -> doc_count, sum/min/max of
    ``metric_col``.  Composable by construction — every stored metric is
    re-aggregable (sum of sums, min of mins, ...), which is why avg is
    derived, not stored."""
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    return df.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.count("*").alias("doc_count"),
        F.sum(metric_col).alias("sum_metric"),
        F.min(metric_col).alias("min_metric"),
        F.max(metric_col).alias("max_metric"),
    )


def rollup_date_histogram(
    rollup: DataFrame,
    interval: str,
    dims: list[str],
) -> DataFrame:
    """Answer a coarser-grain date_histogram (+ dimension terms) from the
    summary store: re-aggregate the composable metrics and derive avg as
    sum/count.  Exactly equal to running the same aggregation on the raw
    index (tested against the raw-scan oracle)."""
    bucket = F.date_trunc(interval, F.col("bucket")).alias("bucket_out")
    out = rollup.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.sum("doc_count").alias("doc_count"),
        F.sum("sum_metric").alias("sum_metric"),
        F.min("min_metric").alias("min_metric"),
        F.max("max_metric").alias("max_metric"),
    )
    # sums of doubles are accumulation-order-dependent at the last ulp
    # (partial-agg order differs between engines/partitionings); the
    # float32 round-trip absorbs that — double error ~1e-13 relative is
    # far below half a float32 ulp, so the cast is deterministic where a
    # fixed-decimal round has boundary flips.  min/max copy exact values.
    return out.select(
        F.col("bucket_out").alias("bucket"),
        *dims,
        "doc_count",
        F.col("sum_metric").cast("float").cast("double").alias("sum_r"),
        (F.col("sum_metric") / F.col("doc_count")).cast("float").cast("double").alias("avg_r"),
        F.col("min_metric").alias("min_r"),
        F.col("max_metric").alias("max_r"),
    )


def rollup_histogram_sql(
    source: str,
    ts_col: str,
    interval: str,
    dims: list[str],
    metric_col: str,
) -> str:
    """DuckDB oracle: the SAME aggregation computed directly on the raw
    table — what the rollup answer must equal.  ``source`` is a parquet
    path (``*.parquet``) or a relation/view name."""
    rel = f"read_parquet('{source}')" if source.endswith(".parquet") else source
    dcols = ", ".join(dims)
    sel_dims = f", {dcols}" if dims else ""
    return f"""
SELECT date_trunc('{interval}', {ts_col}) AS bucket{sel_dims},
       count(*) AS doc_count,
       CAST(CAST(sum({metric_col}) AS FLOAT) AS DOUBLE) AS sum_r,
       CAST(CAST(sum({metric_col}) / count(*) AS FLOAT) AS DOUBLE) AS avg_r,
       min({metric_col}) AS min_r,
       max({metric_col}) AS max_r
FROM {rel}
GROUP BY 1{', ' + dcols if dims else ''}
ORDER BY bucket{', ' + dcols if dims else ''}
"""
