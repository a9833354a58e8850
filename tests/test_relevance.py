"""function_score / rescore / rank_eval: engine vs DuckDB oracle identity.

Every assertion is a value-level comparison at the rounding the driver
hash uses (3 dp for scores, 6 dp for rank_eval metrics)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import relevance as rel
from siem_on_amazon_opensearch_service_spark.operators.search import search_df


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("relevance") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


ORIGIN = "2025-06-15T00:00:00"
WEEK = 7 * 86400.0


def _engine_pairs(df):
    rows = df.select(
        "docid", F.round(F.col("score").cast("double"), 3).alias("s")
    ).collect()
    return [(int(r["docid"]), float(r["s"])) for r in rows]


def _oracle_pairs(sql):
    return [(int(d), float(s)) for d, s in duckdb.sql(sql).fetchall()]


class TestFunctionScore:
    @pytest.mark.parametrize("kind", ["linear", "exp", "gauss"])
    def test_decay_matches_oracle(self, spark, tiny_index, parquet, kind):
        fns = [{"kind": kind, "field": "ts", "origin": ORIGIN,
                "scale": WEEK, "offset": 86400.0, "decay": 0.5}]
        got = _engine_pairs(
            rel.function_score_df(spark, tiny_index[0], "error", k=15, functions=fns)
        )
        exp = _oracle_pairs(
            rel.function_score_sql(parquet, "error", k=15, functions=fns)
        )
        assert got == exp, f"{kind} decay diverged"

    def test_decay_value_spec(self, spark, tiny_index):
        """At distance exactly `scale` past the offset the value is `decay`
        (the OpenSearch decay contract), checked on the linear family via
        a synthetic distance column."""
        c = rel.decay_constants("linear", WEEK, 0.5)
        assert c["pivot"] == WEEK / 0.5  # scale/(1-decay)
        v = (c["pivot"] - WEEK) / c["pivot"]
        assert abs(v - 0.5) < 1e-12

    def test_boost_and_score_modes(self, spark, tiny_index, parquet):
        fns = [
            {"kind": "linear", "field": "ts", "origin": ORIGIN,
             "scale": WEEK, "decay": 0.5, "weight": 2.0},
            {"kind": "field_value_factor", "field": "turn_idx",
             "factor": 0.5, "modifier": "sqrt", "missing": 1.0},
        ]
        for score_mode in ("multiply", "sum", "max", "avg"):
            for boost_mode in ("multiply", "sum", "replace"):
                got = _engine_pairs(rel.function_score_df(
                    spark, tiny_index[0], "error AND timeout", k=10,
                    functions=fns, score_mode=score_mode, boost_mode=boost_mode,
                ))
                exp = _oracle_pairs(rel.function_score_sql(
                    parquet, "error AND timeout", k=10,
                    functions=fns, score_mode=score_mode, boost_mode=boost_mode,
                ))
                assert got == exp, (score_mode, boost_mode)

    def test_random_score_deterministic_and_matches(self, spark, tiny_index, parquet):
        fns = [{"kind": "random", "seed": 42}]
        a = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "timeout", k=12, functions=fns,
            boost_mode="replace",
        ))
        b = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "timeout", k=12, functions=fns,
            boost_mode="replace",
        ))
        assert a == b  # seeded: stable across runs
        exp = _oracle_pairs(rel.function_score_sql(
            parquet, "timeout", k=12, functions=fns, boost_mode="replace",
        ))
        assert a == exp

    def test_filters_carry_through(self, spark, tiny_index, parquet):
        fns = [{"kind": "linear", "field": "ts", "origin": ORIGIN,
                "scale": WEEK, "decay": 0.5}]
        got = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "role:assistant AND error", k=10, functions=fns,
        ))
        exp = _oracle_pairs(rel.function_score_sql(
            parquet, "role:assistant AND error", k=10, functions=fns,
        ))
        assert got == exp

    def test_no_functions_is_plain_bm25(self, spark, tiny_index):
        got = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "error", k=10, functions=[],
        ))
        base = _engine_pairs(search_df(spark, tiny_index[0], "error", k=10))
        assert got == base


class TestScoreAll:
    def test_k_none_returns_full_match_set(self, spark, tiny_index):
        full = search_df(spark, tiny_index[0], "error", k=None)
        n = full.count()
        top = search_df(spark, tiny_index[0], "error", k=n + 10)
        assert n == top.count()
        # same (docid, score) multiset
        a = sorted(_engine_pairs(full))
        b = sorted(_engine_pairs(top))
        assert a == b


class TestRescore:
    def test_field_emission_bit_identical_to_join(self, spark, tiny_index):
        """The r6 fused base emits the function fields from the generator
        (per-shard ranged reads); scores must be BIT-identical (unrounded
        float32) to the docs-join attach, and the fused plan must carry
        no Join node."""
        from siem_on_amazon_opensearch_service_spark.operators import search as s

        cases = [
            (dict(functions=[{"kind": "gauss", "field": "ts", "origin": ORIGIN,
                              "scale": WEEK, "offset": 86400.0, "decay": 0.5}]),
             "error OR timeout"),
            (dict(functions=[{"kind": "field_value_factor", "field": "turn_idx",
                              "factor": 0.5, "modifier": "sqrt", "missing": 1.0}],
                  boost_mode="sum"),
             "error AND timeout"),
            # single-term base: emission must reroute off the zero-exchange
            # fast path onto the shard-local generator
            (dict(functions=[{"kind": "exp", "field": "ts", "origin": ORIGIN,
                              "scale": WEEK, "decay": 0.5}]),
             "timeout"),
        ]
        for kw, q in cases:
            fused = rel.function_score_df(spark, tiny_index[0], q, k=2000, **kw)
            plan = fused._jdf.queryExecution().executedPlan().toString()
            assert "Join" not in plan, (q, plan)
            fused_rows = [(int(r["docid"]), float(r["score"])) for r in fused.collect()]
            # hide the shard geometry: the emission gate falls back to
            # the docs join (and the base to its legacy plan — also
            # score-identical by the r5 path-equality tests)
            orig = s._shard_size_of
            s._shard_size_of = lambda _d: None
            try:
                joined = rel.function_score_df(spark, tiny_index[0], q, k=2000, **kw)
                assert "Join" in joined._jdf.queryExecution().executedPlan().toString()
                join_rows = [(int(r["docid"]), float(r["score"])) for r in joined.collect()]
            finally:
                s._shard_size_of = orig
            assert fused_rows == join_rows, (q, kw)

    def test_rescore_matches_oracle(self, spark, tiny_index, parquet):
        got = _engine_pairs(rel.rescore_df(
            spark, tiny_index[0], "error", '"connection reset"',
            k=10, window_size=40, query_weight=1.0, rescore_weight=2.0,
        ))
        exp = _oracle_pairs(rel.rescore_sql(
            parquet, "error", '"connection reset"',
            k=10, window_size=40, query_weight=1.0, rescore_weight=2.0,
        ))
        assert got == exp

    def test_window_restricts_candidates(self, spark, tiny_index):
        """A doc outside the base top-window can never appear, however well
        it scores on the rescore query (Lucene QueryRescorer semantics)."""
        win = _engine_pairs(search_df(spark, tiny_index[0], "error", k=5))
        win_ids = {d for d, _ in win}
        out = _engine_pairs(rel.rescore_df(
            spark, tiny_index[0], "error", "timeout", k=5, window_size=5,
            rescore_weight=100.0,
        ))
        assert {d for d, _ in out} <= win_ids

    def test_zero_rescore_weight_keeps_base_order(self, spark, tiny_index):
        base = _engine_pairs(search_df(spark, tiny_index[0], "error", k=10))
        out = _engine_pairs(rel.rescore_df(
            spark, tiny_index[0], "error", "timeout", k=10, window_size=50,
            rescore_weight=0.0,
        ))
        assert out == base


class TestRankEval:
    def _ratings(self, spark, tiny_index):
        hits = _engine_pairs(search_df(spark, tiny_index[0], "error", k=10))
        ids = [d for d, _ in hits]
        # grade a mix: 2 highly relevant, 2 partial, rest unrated; plus a
        # rated doc the query never returns (recall < 1)
        return {ids[0]: 2, ids[3]: 1, ids[7]: 2, ids[5]: 1, 10**6: 3}

    def test_metrics_match_oracle(self, spark, tiny_index, parquet):
        ratings = self._ratings(spark, tiny_index)
        got = rel.rank_eval_df(spark, tiny_index[0], "error", ratings, k=10).collect()[0]
        exp = duckdb.sql(rel.rank_eval_sql(parquet, "error", ratings, k=10)).fetchall()[0]
        for g, e in zip([got[c] for c in ("mrr", "ndcg_k", "precision_k", "recall_k")],
                        [exp[2], exp[3], exp[0], exp[1]]):
            assert float(g) == float(e)

    def test_hand_computed_values(self, spark, tiny_index):
        ratings = self._ratings(spark, tiny_index)
        row = rel.rank_eval_df(spark, tiny_index[0], "error", ratings, k=10).collect()[0]
        # ranks 1,4,6,8 are relevant out of 10 retrieved; 5 rated-relevant total
        assert float(row["precision_k"]) == round(4 / 10, 6)
        assert float(row["recall_k"]) == round(4 / 5, 6)
        assert float(row["mrr"]) == 1.0  # rank 1 is graded 2
        import math
        coefs = rel._dcg_coefs(10)
        dcg = (2**2 - 1) * coefs[0] + (2**1 - 1) * coefs[3] \
            + (2**1 - 1) * coefs[5] + (2**2 - 1) * coefs[7]
        idcg = rel.ideal_dcg(ratings, 10)
        assert abs(float(row["ndcg_k"]) - round(dcg / idcg, 6)) <= 1e-6

    def test_no_relevant_retrieved(self, spark, tiny_index):
        row = rel.rank_eval_df(
            spark, tiny_index[0], "error", {10**6: 2}, k=10
        ).collect()[0]
        assert float(row["precision_k"]) == 0.0
        assert float(row["mrr"]) == 0.0
        assert float(row["ndcg_k"]) == 0.0


class TestWarmRelevance:
    """session-injected wrappers must be score-identical to cold."""

    @pytest.fixture(scope="class")
    def session(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        s = QuerySession(spark, tiny_index[0], shuffle_partitions=None)
        yield s
        s.close()

    def test_function_score_warm_eq_cold(self, spark, tiny_index, session):
        fns = [{"kind": "gauss", "field": "ts", "origin": ORIGIN,
                "scale": WEEK, "decay": 0.5}]
        cold = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "error OR timeout", k=12, functions=fns))
        warm = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "error OR timeout", k=12, functions=fns,
            session=session))
        assert warm == cold

    def test_function_score_warm_missing_field_falls_back(self, spark, tiny_index, session):
        # turn_idx is NOT pinned in session.docs -> parquet fallback join
        fns = [{"kind": "field_value_factor", "field": "turn_idx",
                "factor": 0.5, "modifier": "sqrt", "missing": 1.0}]
        cold = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "error", k=10, functions=fns))
        warm = _engine_pairs(rel.function_score_df(
            spark, tiny_index[0], "error", k=10, functions=fns, session=session))
        assert warm == cold

    def test_dis_max_warm_eq_cold(self, spark, tiny_index, session):
        qs = ["error", "timeout AND refused", '"connection reset"']
        cold = _engine_pairs(rel.dis_max_df(spark, tiny_index[0], qs, k=12, tie_breaker=0.3))
        warm = _engine_pairs(rel.dis_max_df(
            spark, tiny_index[0], qs, k=12, tie_breaker=0.3, session=session))
        assert warm == cold

    def test_rescore_warm_eq_cold(self, spark, tiny_index, session):
        args = dict(query="error", rescore_query='"connection reset"',
                    k=10, window_size=40, rescore_weight=2.0)
        cold = _engine_pairs(rel.rescore_df(spark, tiny_index[0], **args))
        warm = _engine_pairs(rel.rescore_df(spark, tiny_index[0], session=session, **args))
        assert warm == cold

    def test_boosting_warm_eq_cold(self, spark, tiny_index, session):
        cold = _engine_pairs(rel.boosting_df(
            spark, tiny_index[0], "error OR timeout", "timeout", 0.5, k=12))
        warm = _engine_pairs(rel.boosting_df(
            spark, tiny_index[0], "error OR timeout", "timeout", 0.5, k=12,
            session=session))
        assert warm == cold

    def test_boosting_pure_negative_refused_both_paths(self, spark, tiny_index, session):
        """Pure-negative negatives need a full docs scan; both the cold
        match-set path and the warm scored path refuse identically."""
        with pytest.raises(ValueError, match="positive"):
            rel.boosting_df(spark, tiny_index[0], "error", "NOT timeout", 0.5, k=5)
        with pytest.raises(ValueError, match="positive"):
            rel.boosting_df(spark, tiny_index[0], "error", "NOT timeout", 0.5,
                            k=5, session=session)

class TestRankFeature:
    """rank_feature (r4h): score = float32(bm25 + boost * fn(feature)).
    saturation is pure rational double math; log/sigmoid round-trip the
    transcendental through float32 on both engines."""

    FNS = [
        ({"kind": "saturation", "pivot": 5.0}, "turn_idx"),
        ({"kind": "log", "scaling_factor": 1.0}, "dl"),
        ({"kind": "sigmoid", "pivot": 6.0, "exponent": 1.5}, "turn_idx"),
    ]

    @pytest.mark.parametrize("fn,field", FNS, ids=lambda f: f if isinstance(f, str) else f["kind"])
    def test_matches_oracle(self, spark, tiny_index, parquet, fn, field):
        from siem_on_amazon_opensearch_service_spark.operators.relevance import (
            rank_feature_df,
            rank_feature_sql,
        )

        idx, _ = tiny_index
        got = _engine_pairs(
            rank_feature_df(spark, idx, "error OR timeout", field, fn,
                            k=10, boost=2.5)
        )
        exp = _oracle_pairs(
            rank_feature_sql(parquet, "error OR timeout", field, fn,
                             k=10, boost=2.5)
        )
        assert got == exp, fn["kind"]

    def test_brute_force_saturation(self, spark, tiny_index):
        """Independent recomputation: join the base match set to turn_idx
        and fold the exact arithmetic in python."""
        import numpy as np

        from siem_on_amazon_opensearch_service_spark.operators.relevance import (
            rank_feature_df,
        )
        from siem_on_amazon_opensearch_service_spark.operators.search import search_df

        idx, _ = tiny_index
        base = {
            r["docid"]: float(np.float32(r["score"]))
            for r in search_df(spark, idx, "error", k=None).collect()
        }
        tix = {
            r["docid"]: r["turn_idx"]
            for r in spark.read.parquet(f"{idx}/docs").select(
                "docid", "turn_idx").collect()
        }
        pivot, boost = 5.0, 2.5
        exp = {
            d: np.float32(s + boost * (tix[d] / (tix[d] + pivot)))
            for d, s in base.items()
        }
        top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [
            (r["docid"], np.float32(r["score"]))
            for r in rank_feature_df(
                spark, idx, "error", "turn_idx",
                {"kind": "saturation", "pivot": pivot}, k=10, boost=boost,
            ).collect()
        ]
        assert got == [(d, s) for d, s in top]

    def test_warm_equals_cold(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.relevance import (
            rank_feature_df,
        )
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            QuerySession,
        )

        idx, _ = tiny_index
        fn = {"kind": "sigmoid", "pivot": 4.0, "exponent": 2.0}
        cold = _engine_pairs(
            rank_feature_df(spark, idx, "error AND timeout", "dl", fn, k=10)
        )
        sess = QuerySession(spark, idx)
        try:
            warm = _engine_pairs(
                rank_feature_df(spark, idx, "error AND timeout", "dl", fn,
                                k=10, session=sess)
            )
        finally:
            sess.close()
        assert warm == cold

    def test_rejects_bad_specs(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.relevance import (
            rank_feature_df,
        )

        idx, _ = tiny_index
        for fn in [
            {"kind": "nope"},
            {"kind": "saturation", "pivot": 0.0},
            {"kind": "log", "scaling_factor": -1.0},
            {"kind": "sigmoid", "pivot": 1.0, "exponent": 0.0},
        ]:
            with pytest.raises(ValueError):
                rank_feature_df(spark, idx, "error", "dl", fn).collect()


class TestConstantScore:
    def test_matches_oracle(self, spark, tiny_index, parquet):
        idx = tiny_index[0]
        out = rel.constant_score_df(spark, idx, "error OR timeout", k=8, boost=1.2)
        got = [(int(r["docid"]), float(r["score_r"])) for r in out.collect()]
        want = _oracle_pairs(rel.constant_score_sql(parquet, "error OR timeout",
                                                    k=8, boost=1.2))
        assert got == want

    def test_page_is_first_k_of_match_set(self, spark, tiny_index):
        idx = tiny_index[0]
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            match_docids_df,
        )
        all_ids = sorted(
            r["docid"] for r in match_docids_df(spark, idx, "error").collect()
        )
        out = rel.constant_score_df(spark, idx, "error", k=3, boost=2.0)
        rows = out.collect()
        assert [int(r["docid"]) for r in rows] == all_ids[:3]
        assert all(float(r["score_r"]) == 2.0 for r in rows)

    def test_dql_filter_carries(self, spark, tiny_index, parquet):
        idx = tiny_index[0]
        q = "error AND role:assistant"
        out = rel.constant_score_df(spark, idx, q, k=10)
        got = [(int(r["docid"]), float(r["score_r"])) for r in out.collect()]
        want = _oracle_pairs(rel.constant_score_sql(parquet, q, k=10))
        assert got == want


class TestDistanceFeature:
    def test_matches_oracle(self, spark, tiny_index, parquet):
        idx = tiny_index[0]
        out = rel.distance_feature_df(
            spark, idx, "error", k=10,
            origin=ORIGIN, pivot_seconds=WEEK, boost=2.0,
        )
        want = _oracle_pairs(rel.distance_feature_sql(
            parquet, "error", k=10,
            origin=ORIGIN, pivot_seconds=WEEK, boost=2.0,
        ))
        assert _engine_pairs(out) == want

    def test_additive_bounded_by_boost(self, spark, tiny_index):
        idx = tiny_index[0]
        base = {int(r["docid"]): float(r["score"]) for r in
                search_df(spark, idx, "error", k=None).collect()}
        out = rel.distance_feature_df(
            spark, idx, "error", k=len(base),
            origin=ORIGIN, pivot_seconds=WEEK, boost=2.0,
        )
        for r in out.collect():
            gain = float(r["score"]) - base[int(r["docid"])]
            # contribution in (0, boost]: saturation never exceeds boost
            assert 0.0 < gain <= 2.0 + 1e-6

    def test_zero_pivot_distance_gets_full_boost(self, spark, tiny_index):
        idx = tiny_index[0]
        # a doc exactly at the origin gains boost * pivot/(pivot+0) = boost
        import os
        docs = spark.read.parquet(os.path.join(idx, "docs")).select("docid", "ts")
        base = search_df(spark, idx, "error", k=None)
        row = base.join(docs, "docid").orderBy("docid").first()
        origin = row["ts"].isoformat()
        out = rel.distance_feature_df(
            spark, idx, "error", k=1000,
            origin=origin, pivot_seconds=60.0, boost=3.0,
        )
        got = {int(r["docid"]): float(r["score"]) for r in out.collect()}
        assert abs(got[int(row["docid"])] - (float(row["score"]) + 3.0)) < 1e-3

    def test_warm_eq_cold(self, spark, tiny_index):
        idx = tiny_index[0]
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            QuerySession,
        )
        sess = QuerySession(spark, idx)
        try:
            cold = rel.distance_feature_df(
                spark, idx, "error OR timeout", k=10,
                origin=ORIGIN, pivot_seconds=WEEK, boost=1.5,
            )
            warm = rel.distance_feature_df(
                spark, idx, "error OR timeout", k=10,
                origin=ORIGIN, pivot_seconds=WEEK, boost=1.5, session=sess,
            )
            assert _engine_pairs(cold) == _engine_pairs(warm)
        finally:
            sess.close()
