"""CloudWatch-style threshold alarms over event streams.

The reference's operational alerting is a CloudWatch metric alarm whose
state transitions drive es_loader_stopper (reference
source/lambda/es_loader_stopper/index.py:66-75 — 'ALARM' stops the
loader, 'OK' restarts it) and an SNS notification
(index.py:108-112); the alarm itself is a metric threshold with
consecutive-datapoints-to-alarm semantics.  Re-expressed engine-side over
any event stream:

- metric = per tumbling time bucket, the count of rows matching a
  predicate (one hash aggregation);
- breach = metric >= threshold;
- state machine (CloudWatch 'M out of M' form): ALARM after M consecutive
  breaching datapoints, back to OK on the first non-breaching one.  A
  bucket with no rows produces no datapoint (CloudWatch 'missing data:
  ignore' treatment) — evaluation runs over present buckets in order.

Because run-length >= M is equivalent to "the last M datapoints all
breach", the batch form needs NO recursion: one rolling window sum over
the bucketed frame, then a lag to detect transitions — both plain window
functions, fully SQL-oracle-able and cheap at scale (the windowed frame
is buckets, not events).

The streaming form keeps (run_length, state) per rule key in
applyInPandasWithState and consumes micro-batches of bucketed datapoints
in event-time order (the engine's sessionize operator makes the same
monotonicity assumption); equivalence with the batch form over the same
datapoints is tested.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

ALERT_SCHEMA = StructType(
    [
        StructField("rule", StringType()),
        StructField("bucket", TimestampType()),
        StructField("metric", LongType()),
        StructField("state", StringType()),
        StructField("prev_state", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("run_len", LongType()), StructField("state", StringType())]
)


def alarm_datapoints(
    df: DataFrame, ts_col: str, cond, bucket: str = "hour"
) -> DataFrame:
    """(bucket, metric) datapoints: matching-row count per tumbling
    ``date_trunc`` bucket.  ``cond`` is a boolean Column."""
    return (
        df.filter(cond)
        .groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("metric"))
    )


def threshold_alarm_batch(
    datapoints: DataFrame,
    threshold: int,
    m: int = 1,
    rule: str = "rule",
) -> DataFrame:
    """State timeline over ordered datapoints: one row per datapoint with
    the alarm state and the previous state (transitions are the rows where
    they differ).  ALARM iff the last ``m`` datapoints (including this
    one) all breached; the datapoint before the first is OK.

    Scale: the window runs over the BUCKETED frame (datapoints, not raw
    events) — a global window over date_trunc buckets is bounded by the
    retention period, not the corpus."""
    if m < 1:
        raise ValueError(f"threshold_alarm: m must be >= 1, got {m}")
    w = Window.orderBy("bucket")
    breach = (F.col("metric") >= F.lit(int(threshold))).cast("int")
    run = F.sum(breach).over(w.rowsBetween(-(m - 1), 0))
    row = F.row_number().over(w)
    st = F.when((run == m) & (row >= m), F.lit("ALARM")).otherwise(F.lit("OK"))
    out = datapoints.select(
        F.lit(rule).alias("rule"),
        "bucket",
        F.col("metric").cast("long").alias("metric"),
        st.alias("state"),
    )
    prev = F.lag("state", 1, "OK").over(w)
    return out.select(
        "rule", "bucket", "metric", "state", prev.alias("prev_state")
    ).orderBy("bucket")


def threshold_alarm_sql(
    datapoints_sql: str, threshold: int, m: int = 1, rule: str = "rule"
) -> str:
    """DuckDB replay of threshold_alarm_batch over a (bucket, metric)
    subquery — the identical rolling-sum / row_number / lag arithmetic."""
    if m < 1:
        raise ValueError(f"threshold_alarm: m must be >= 1, got {m}")
    return f"""
WITH dp AS ({datapoints_sql}),
st AS (
  SELECT bucket, CAST(metric AS BIGINT) AS metric,
         CASE WHEN sum(CASE WHEN metric >= {int(threshold)} THEN 1 ELSE 0 END)
                   OVER (ORDER BY bucket ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW) = {m}
              AND row_number() OVER (ORDER BY bucket) >= {m}
              THEN 'ALARM' ELSE 'OK' END AS state
  FROM dp)
SELECT '{rule}' AS rule, bucket, metric, state,
       coalesce(lag(state) OVER (ORDER BY bucket), 'OK') AS prev_state
FROM st ORDER BY bucket
"""


def alarm_transitions(timeline: DataFrame) -> DataFrame:
    """Just the state-change rows — what es_loader_stopper consumes
    ('ALARM' => stop, 'OK' => start)."""
    return timeline.filter(F.col("state") != F.col("prev_state"))


def _alarm_update(threshold: int, m: int):
    def update(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ):
        if state.exists:
            run_len, cur = state.get
        else:
            run_len, cur = 0, "OK"
        rows = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("bucket")
        for _, r in pdf.iterrows():
            breach = int(r["metric"]) >= threshold
            run_len = run_len + 1 if breach else 0
            nxt = "ALARM" if run_len >= m else "OK"
            rows.append((key[0], r["bucket"], int(r["metric"]), nxt, cur))
            cur = nxt
        state.update((run_len, cur))
        yield pd.DataFrame(
            rows, columns=["rule", "bucket", "metric", "state", "prev_state"]
        )

    return update


def threshold_alarm_stream(
    datapoints: DataFrame, threshold: int, m: int = 1
) -> DataFrame:
    """Streaming form over a (rule, bucket, metric) stream: keyed
    (run_length, state) in applyInPandasWithState; datapoints must arrive
    in event-time order per rule (feed from a watermarked windowed count,
    which emits finalized buckets monotonically).

    Spark refuses stateful processing chained directly after a streaming
    aggregation in append mode, so the event->alarm pipeline is TWO
    queries through storage: windowed_counts_stream writes finalized
    (rule, bucket, metric) rows to a sink, and this operator streams that
    sink — the natural production topology (tested end to end in
    tests/test_alerts.py)."""
    if m < 1:
        raise ValueError(f"threshold_alarm: m must be >= 1, got {m}")
    return datapoints.groupBy("rule").applyInPandasWithState(
        _alarm_update(int(threshold), int(m)),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
