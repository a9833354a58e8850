"""Index rollup (summary-store aggregation) and rolling z-score anomaly
detection."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import aggs, rollup

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS)


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return [tuple(r) for r in pdf.astype(str).itertuples(index=False)]


class TestRollup:
    def test_store_roundtrip_equals_raw(self, spark, events, tmp_path):
        """The two-step (build summary -> answer from the STORE) equals
        the raw-scan aggregation — the rollup composability theorem."""
        store = str(tmp_path / "rollup")
        rollup.build_rollup(events, "ts", "hour", ["event_type"], "value").write.parquet(store)
        got = rollup.rollup_date_histogram(
            spark.read.parquet(store), "day", ["event_type"]
        ).toPandas()
        exp = duckdb.sql(
            rollup.rollup_histogram_sql(EVENTS, "ts", "day", ["event_type"], "value")
        ).df()
        assert _canon(got) == _canon(exp)

    def test_no_dims(self, spark, events):
        roll = rollup.build_rollup(events, "ts", "hour", [], "value")
        got = rollup.rollup_date_histogram(roll, "day", []).toPandas()
        exp = duckdb.sql(
            rollup.rollup_histogram_sql(EVENTS, "ts", "day", [], "value")
        ).df()
        assert _canon(got) == _canon(exp)

    def test_same_grain_identity(self, spark, events):
        """Rolling up at the query grain is the degenerate one-level case."""
        roll = rollup.build_rollup(events, "ts", "day", ["event_type"], "value")
        got = rollup.rollup_date_histogram(roll, "day", ["event_type"]).toPandas()
        exp = duckdb.sql(
            rollup.rollup_histogram_sql(EVENTS, "ts", "day", ["event_type"], "value")
        ).df()
        assert _canon(got) == _canon(exp)


class TestAnomalyZscore:
    def test_known_spike_flagged(self, spark):
        """Synthetic hourly stream: constant-rate background except ONE
        hour with 20x volume — exactly that bucket flags."""
        rows = []
        eid = 0
        for h in range(72):
            n = 200 if h == 60 else 10 + (h % 3)  # mild periodic noise
            for i in range(n):
                rows.append((eid, f"2024-03-01 {0:02d}:00:00", h))
                eid += 1
        pdf = pd.DataFrame(rows, columns=["event_id", "_", "h"])
        pdf["ts"] = pd.Timestamp("2024-03-01") + pd.to_timedelta(pdf["h"], unit="h")
        df = spark.createDataFrame(pdf[["event_id", "ts"]])
        out = (
            aggs.anomaly_zscore(df, "ts", "hour", window_size=24, z_threshold=3.0)
            .toPandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        # the spike's own baseline excludes it (trailing window), so it flags
        assert out.iloc[60]["anomaly"] and out.iloc[60]["z_r"] > 3.0
        # the steady prefix never flags
        assert not out.iloc[:60]["anomaly"].any()

    def test_constant_series_no_flags(self, spark):
        pdf = pd.DataFrame(
            {"event_id": range(30 * 5),
             "ts": [pd.Timestamp("2024-03-01") + pd.Timedelta(hours=h)
                    for h in range(30) for _ in range(5)]}
        )
        df = spark.createDataFrame(pdf)
        out = aggs.anomaly_zscore(df, "ts", "hour", window_size=24).toPandas()
        assert not out["anomaly"].any()
        # std == 0 -> z undefined, never flagged
        assert out["z_r"].isna().all()

    def test_matches_oracle_on_events(self, spark, events):
        got = aggs.anomaly_zscore(events, "ts", "hour", 24, 3.0).toPandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS}')")
        import __spark_entry__ as E

        exp = con.sql(E.oracle_sql()["events_anomaly_zscore"]).df()
        assert _canon(got) == _canon(exp)

    def test_partial_window_nulls(self, spark, events):
        out = aggs.anomaly_zscore(events, "ts", "hour", 24).toPandas()
        head = out.sort_values("bucket").head(24)
        assert head["mean_r"].isna().all() and head["z_r"].isna().all()
        assert not head["anomaly"].any()
