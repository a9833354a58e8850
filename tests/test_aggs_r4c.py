"""Round-4c aggs: multi_terms, weighted_avg, percentile_ranks,
auto_date_histogram (ladder selection + NTZ-safe epoch)."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import aggs


@pytest.fixture(scope="module")
def ev(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b", "c"],
            "u": [1, 1, 2, 1, 2, 3],
            "v": [10.0, 20.0, None, 40.0, 50.0, 60.0],
            "w": [1.0, 2.0, 3.0, None, 1.0, 4.0],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:05", "2024-01-01 00:00:55",
                 "2024-01-01 00:02:00", "2024-01-01 00:03:30",
                 "2024-01-01 00:09:00", "2024-01-01 00:09:59"]
            ),
        }
    )
    return spark.createDataFrame(pdf)


class TestMultiTerms:
    def test_compound_keys_ordered(self, ev):
        rows = aggs.multi_terms(ev, ["k", "u"], n=3).collect()
        assert [(r["k"], r["u"], r["cnt"]) for r in rows] == [
            ("a", 1, 2), ("a", 2, 1), ("b", 1, 1)
        ]


class TestWeightedAvg:
    def test_null_rows_skipped(self, ev):
        got = aggs.weighted_avg(ev, F.col("v"), F.col("w")).collect()[0][0]
        # (10*1 + 20*2 + 50*1 + 60*4) / (1+2+1+4); v=None and w=None skipped
        assert got == round((10 + 40 + 50 + 240) / 8.0, 6)


class TestPercentileRanks:
    def test_exact_cdf(self, ev):
        row = aggs.percentile_ranks(ev, "v", [20.0, 100.0]).collect()[0]
        assert row["rank_0"] == round(100.0 * 2 / 5, 6)  # 10,20 of 5 non-null
        assert row["rank_1"] == 100.0


class TestAutoDateHistogram:
    def test_ladder_picks_smallest_fitting(self, ev):
        # span 0:05..9:59 -> 60s gives 10 buckets (fits 20); 30s gives 20
        # buckets which ALSO fits -> smallest fitting is 30s
        rows = aggs.auto_date_histogram(ev, "ts", target_buckets=20).collect()
        assert rows[0]["interval_sec"] == 30
        rows = aggs.auto_date_histogram(ev, "ts", target_buckets=5).collect()
        assert rows[0]["interval_sec"] == 300
        assert sum(r["cnt"] for r in rows) == 6

    def test_bucket_alignment(self, ev):
        rows = aggs.auto_date_histogram(ev, "ts", target_buckets=5).collect()
        assert rows[0]["bucket"] == datetime.datetime(2024, 1, 1, 0, 0)
        assert rows[1]["bucket"] == datetime.datetime(2024, 1, 1, 0, 5)

    def test_empty_raises(self, spark, ev):
        with pytest.raises(ValueError, match="no rows"):
            aggs.auto_date_histogram(ev.filter(F.lit(False)), "ts")
