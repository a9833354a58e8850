"""Threshold alarms (streaming/alerts): batch vs hand-computed vs DuckDB
vs the stateful streaming form."""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.streaming import alerts


@pytest.fixture(scope="module")
def dps(spark):
    """(bucket, metric): breach pattern for threshold 5:
    b b - b b b b - b   (breach = metric >= 5)."""
    rows = [
        ("2025-06-01 00:00:00", 7),
        ("2025-06-01 01:00:00", 5),
        ("2025-06-01 02:00:00", 2),
        ("2025-06-01 03:00:00", 9),
        ("2025-06-01 04:00:00", 6),
        ("2025-06-01 05:00:00", 5),
        ("2025-06-01 06:00:00", 11),
        ("2025-06-01 07:00:00", 0),
        ("2025-06-01 08:00:00", 8),
    ]
    pdf = pd.DataFrame(rows, columns=["bucket", "metric"])
    pdf["bucket"] = pd.to_datetime(pdf["bucket"])
    return spark.createDataFrame(pdf)


def states(rows):
    return [(r.bucket.hour, r.state, r.prev_state) for r in rows]


def test_batch_m1(dps):
    out = alerts.threshold_alarm_batch(dps, threshold=5, m=1).collect()
    assert [r.state for r in out] == [
        "ALARM", "ALARM", "OK", "ALARM", "ALARM", "ALARM", "ALARM", "OK", "ALARM"
    ]
    assert out[0].prev_state == "OK"
    tr = alerts.alarm_transitions(
        alerts.threshold_alarm_batch(dps, threshold=5, m=1)
    ).collect()
    assert [(r.bucket.hour, r.state) for r in tr] == [
        (0, "ALARM"), (2, "OK"), (3, "ALARM"), (7, "OK"), (8, "ALARM")
    ]


def test_batch_m3(dps):
    out = alerts.threshold_alarm_batch(dps, threshold=5, m=3).collect()
    # runs: [b b] - [b b b b] - [b]; ALARM from the 3rd consecutive breach
    assert [r.state for r in out] == [
        "OK", "OK", "OK", "OK", "OK", "ALARM", "ALARM", "OK", "OK"
    ]
    tr = alerts.alarm_transitions(
        alerts.threshold_alarm_batch(dps, threshold=5, m=3)
    ).collect()
    assert [(r.bucket.hour, r.state) for r in tr] == [(5, "ALARM"), (7, "OK")]


def test_sql_oracle_matches(dps, tmp_path):
    p = str(tmp_path / "dp.parquet")
    dps.toPandas().to_parquet(p)
    for m in (1, 2, 3):
        got = [
            (str(r.bucket), r.metric, r.state, r.prev_state)
            for r in alerts.threshold_alarm_batch(dps, threshold=5, m=m).collect()
        ]
        sql = alerts.threshold_alarm_sql(
            f"SELECT bucket, metric FROM read_parquet('{p}')", threshold=5, m=m
        )
        exp = [
            (str(b), mt, s, ps) for _, b, mt, s, ps in duckdb.sql(sql).fetchall()
        ]
        assert got == exp, m


def test_datapoints_from_events(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2025-06-01 00:10", "2025-06-01 00:20", "2025-06-01 01:05",
                 "2025-06-01 02:07", "2025-06-01 02:08"]),
            "event_type": ["error", "error", "view", "error", "error"],
        }
    )
    df = spark.createDataFrame(pdf)
    dp = alerts.alarm_datapoints(
        df, "ts", F.col("event_type") == "error", bucket="hour"
    ).orderBy("bucket").collect()
    assert [(r.bucket.hour, r.metric) for r in dp] == [(0, 2), (2, 2)]
    # hour 1 has no matching rows -> no datapoint (missing-data: ignore)


def test_stream_equals_batch(spark, dps, tmp_path):
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    pdf = dps.toPandas().sort_values("bucket").reset_index(drop=True)
    pdf["rule"] = "errors"
    # two arrival files, split mid-run to exercise state carry-over
    spark.createDataFrame(pdf.iloc[:5]).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(pdf.iloc[5:]).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "bucket timestamp, metric long, rule string"
    ).parquet(src)
    q = (
        alerts.threshold_alarm_stream(stream, threshold=5, m=3)
        .writeStream.format("memory")
        .queryName("alarm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("SELECT * FROM alarm_out")
        .orderBy("bucket")
        .collect()
    )
    exp = alerts.threshold_alarm_batch(dps, threshold=5, m=3, rule="errors").collect()
    assert [(r.bucket, r.metric, r.state, r.prev_state) for r in got] == [
        (r.bucket, r.metric, r.state, r.prev_state) for r in exp
    ]


def test_bad_m(dps):
    with pytest.raises(ValueError):
        alerts.threshold_alarm_batch(dps, threshold=5, m=0)
    with pytest.raises(ValueError):
        alerts.threshold_alarm_sql("SELECT 1", threshold=5, m=0)
    with pytest.raises(ValueError):
        alerts.threshold_alarm_stream(dps, threshold=5, m=0)


def test_end_to_end_event_stream_to_alarms(spark, tmp_path):
    """events parquet stream -> watermarked windowed counts -> (persisted
    datapoint sink) -> stateful alarm stream.  Spark refuses
    applyInPandasWithState chained directly after a streaming aggregation
    (append mode), so the production topology is two stages through
    storage — exactly what's exercised here.  Emitted state rows must
    equal the batch timeline on every finalized bucket (append mode may
    hold back the trailing window)."""
    import pandas as pd
    from siem_on_amazon_opensearch_service_spark.streaming.windowed import (
        windowed_counts_stream,
    )

    rows = []
    # hourly error counts: 7, 5, 1, 6, 6, 9 -> breaches b b - b b b ->
    # with threshold 5, m=2: OK ALARM OK OK ALARM ALARM
    for h, n in enumerate([7, 5, 1, 6, 6, 9]):
        for i in range(n):
            rows.append((pd.Timestamp(f"2025-06-01 0{h}:00:00") + pd.Timedelta(minutes=i), "error"))
        rows.append((pd.Timestamp(f"2025-06-01 0{h}:30:00"), "view"))
    pdf = pd.DataFrame(rows, columns=["ts", "event_type"])
    src = str(tmp_path / "ev")
    os.makedirs(src)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    # stage 1: events -> finalized windowed datapoints, persisted
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    dp = (
        windowed_counts_stream(
            stream.filter(F.col("event_type") == "error"),
            ts="ts", width="1 hour", watermark="1 minute",
        )
        .select(F.lit("errors").alias("rule"), "bucket", F.col("cnt").alias("metric"))
    )
    dp_dir = str(tmp_path / "datapoints")
    q1 = (
        dp.writeStream.format("parquet")
        .option("path", dp_dir)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(300)

    # stage 2: datapoint stream -> stateful alarm
    dp_stream = spark.readStream.schema(
        "rule string, bucket timestamp, metric long"
    ).parquet(dp_dir)
    q2 = (
        alerts.threshold_alarm_stream(dp_stream, threshold=5, m=2)
        .writeStream.format("memory")
        .queryName("e2e_alarms")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    got = spark.sql("SELECT * FROM e2e_alarms").orderBy("bucket").collect()
    assert len(got) >= 5  # all but possibly the trailing window finalized

    batch_dp = alerts.alarm_datapoints(
        spark.createDataFrame(pdf), "ts", F.col("event_type") == "error", "hour"
    )
    exp = {
        r.bucket: (r.metric, r.state, r.prev_state)
        for r in alerts.threshold_alarm_batch(batch_dp, threshold=5, m=2, rule="errors").collect()
    }
    for r in got:
        assert exp[r.bucket] == (r.metric, r.state, r.prev_state), r
    assert [r.state for r in got][:5] == ["OK", "ALARM", "OK", "OK", "ALARM"]
