"""Watermarked windowed aggregation — the Structured Streaming
re-expression of the reference's date_histogram dashboards over a LIVE
feed (SURVEY.md §2.10: the es-loader's continuous ingest makes every
dashboard histogram an implicitly-streaming aggregation; reference
behavior spec: source/lambda/es_loader/index.py event-driven flow +
the saved dashboards' visState date_histogram aggs).

Semantics (Spark's standard late-data contract, which mirrors what an
OpenSearch dashboard refresh sees):
- tumbling event-time windows (`window(ts, width)`), counts per window
  (+ optional keyword keys, e.g. per event_type);
- rows later than the watermark past a window's end are DROPPED and the
  window is final — append output mode emits each window exactly once,
  when the watermark passes it;
- late rows INSIDE the watermark still update their window before it is
  emitted (tested against the batch date_histogram on the same data).

Scale shape: partial aggregation per micro-batch, state = one row per
open (window, key) — bounded by watermark/width × key cardinality, not
by event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts_stream(
    stream_df: DataFrame,
    ts: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming date_histogram: (bucket[, *keys], cnt) with an
    event-time watermark; append-mode emits each bucket once, finalized."""
    return (
        stream_df.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), width).alias("win"), *[F.col(c) for c in keys])
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("bucket"), *keys, "cnt")
    )


def windowed_counts_batch(
    df: DataFrame, ts: str = "ts", width: str = "1 hour", keys: tuple[str, ...] = ()
) -> DataFrame:
    """Batch oracle for the streaming form: identical windowing on a
    static frame (what the stream must converge to for finalized
    windows)."""
    return (
        df.groupBy(F.window(F.col(ts), width).alias("win"), *[F.col(c) for c in keys])
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("bucket"), *keys, "cnt")
        .orderBy("bucket", *keys)
    )
