"""dis_max / boosting query oracle identity + Gopher quality rules."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import relevance as rel
from siem_on_amazon_opensearch_service_spark.operators import textstats
from siem_on_amazon_opensearch_service_spark.operators.search import search_df


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("dmx") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


def _pairs(df):
    rows = df.select(
        "docid", F.round(F.col("score").cast("double"), 3).alias("s")
    ).collect()
    return [(int(r["docid"]), float(r["s"])) for r in rows]


class TestDisMax:
    @pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
    def test_matches_oracle(self, spark, tiny_index, parquet, tb):
        qs = ["error", "timeout AND refused", '"connection reset"']
        got = _pairs(rel.dis_max_df(spark, tiny_index[0], qs, k=12, tie_breaker=tb))
        exp = [
            (int(d), float(s))
            for d, s in duckdb.sql(
                rel.dis_max_sql(parquet, qs, k=12, tie_breaker=tb)
            ).fetchall()
        ]
        assert got == exp, tb

    def test_tb1_equals_bool_or_semantics(self, spark, tiny_index):
        """tie_breaker=1 sums all clause scores — for single-term clauses
        that IS the flat OR query's score."""
        got = _pairs(rel.dis_max_df(
            spark, tiny_index[0], ["error", "timeout"], k=10, tie_breaker=1.0
        ))
        base = _pairs(search_df(spark, tiny_index[0], "error OR timeout", k=10))
        assert got == base

    def test_tb0_is_pure_max(self, spark, tiny_index):
        got = dict(_pairs(rel.dis_max_df(
            spark, tiny_index[0], ["error", "timeout"], k=2000, tie_breaker=0.0
        )))
        a = dict(_pairs(search_df(spark, tiny_index[0], "error", k=None)))
        b = dict(_pairs(search_df(spark, tiny_index[0], "timeout", k=None)))
        for d, s in got.items():
            assert s == round(max(a.get(d, 0.0), b.get(d, 0.0)), 3)

    def test_empty_clause_list_raises(self, spark, tiny_index):
        with pytest.raises(ValueError):
            rel.dis_max_df(spark, tiny_index[0], [], k=5)


class TestDisMaxFusedEquivalence:
    """The r6 fused shard-local dis_max plan must be BIT-identical
    (unrounded float32 scores) to the union-of-match-sets fallback —
    including the float64 fold-order hazard: a clause whose leaves sit at
    different GLOBAL clause indices than its own local order (leaf shared
    with an earlier clause) must still fold in its own `_leaves` order."""

    CASES = [
        # overlapping leaves: clause 2's local order (error, timeout,
        # refused) != global order (timeout, error, refused)
        (["timeout", "error OR timeout OR refused"], 0.3),
        # 3-leaf conjunction + flat OR + sloppy phrase
        (["error AND timeout AND refused", "connection OR reset", '"connection reset"~2'], 0.5),
        # NOT + nested boolean
        (["error AND NOT timeout", "timeout OR (refused AND error)"], 0.1),
        # keyword-filtered clause (cold mode: ranged docs fetch)
        (["error AND role:assistant", "timeout"], 0.3),
        # prefix expansion
        (["err*", "timeout"], 0.0),
        # single clause (mx == sm identity branch)
        (["error OR timeout"], 0.7),
    ]

    def _exact(self, df):
        rows = df.collect()
        return [(int(r["docid"]), float(r["score"])) for r in rows]

    @pytest.mark.parametrize("qs,tb", CASES)
    def test_fused_bit_identical_to_union(self, spark, tiny_index, qs, tb, monkeypatch):
        from siem_on_amazon_opensearch_service_spark.operators import search as s

        fused = rel.dis_max_df(spark, tiny_index[0], qs, k=2000, tie_breaker=tb)
        fused_rows = self._exact(fused)
        monkeypatch.setattr(s, "dis_max_fused", lambda *a, **k: None)
        union_rows = self._exact(
            rel.dis_max_df(spark, tiny_index[0], qs, k=2000, tie_breaker=tb)
        )
        assert fused_rows == union_rows, (qs, tb)

    def test_fused_path_taken_on_r2_index(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import dis_max_fused

        out = dis_max_fused(spark, tiny_index[0], ["error", "timeout"], k=5)
        assert out is not None
        # one Python stage, no Join/Aggregate combine in the fused plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan


class TestBoosting:
    def test_matches_oracle(self, spark, tiny_index, parquet):
        got = _pairs(rel.boosting_df(
            spark, tiny_index[0], "error OR timeout", "timeout",
            negative_boost=0.5, k=12,
        ))
        exp = [
            (int(d), float(s))
            for d, s in duckdb.sql(rel.boosting_sql(
                parquet, "error OR timeout", "timeout",
                negative_boost=0.5, k=12,
            )).fetchall()
        ]
        assert got == exp

    def test_demotes_not_drops(self, spark, tiny_index):
        """Unlike NOT, a negative match stays in the result set with a
        scaled score."""
        full = dict(_pairs(rel.boosting_df(
            spark, tiny_index[0], "error", "error AND timeout",
            negative_boost=0.1, k=3000,
        )))
        neg = {r["docid"] for r in search_df(
            spark, tiny_index[0], "error AND timeout", k=None
        ).collect()}
        assert neg & set(full), "negative-matching docs must remain"
        base = dict(_pairs(search_df(spark, tiny_index[0], "error", k=None)))
        for d in neg & set(full):
            assert full[d] < base[d]

    def test_boost_one_is_identity(self, spark, tiny_index):
        got = _pairs(rel.boosting_df(
            spark, tiny_index[0], "error", "timeout", negative_boost=1.0, k=10,
        ))
        base = _pairs(search_df(spark, tiny_index[0], "error", k=10))
        assert got == base


class TestGopher:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        texts = {
            1: " ".join(["the quick brown fox jumps over lazy dog and that be of to with have"] * 5),
            2: "short text",                      # fails wordcount
            3: " ".join(["a"] * 60),              # mean word len 1 -> fails wordlen
            4: " ".join(["the errors of"] * 20) + " " + "#" * 30,  # symbol-heavy
            5: " ".join(["12345 67890"] * 30),    # numeric -> fails alpha+stopword
            6: "- one\n- two\n- three\n" + " ".join(["the of and that"] * 15),
        }
        pdf = pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[k] for k in texts]}
        )
        return spark.createDataFrame(pdf)

    def test_rule_booleans(self, docs):
        r = {row["doc_id"]: row for row in
             textstats.gopher_rules(docs).collect()}
        assert r[1]["passes"]
        assert not r[2]["r_wordcount"]
        assert not r[3]["r_wordlen"]
        assert not r[4]["r_symbol"]
        assert not r[5]["r_alpha"] and not r[5]["r_stopword"]
        # bullet lines 3/4 <= 0.9 -> passes bullet rule but is a sanity row
        assert r[6]["r_bullet"]

    def test_dup_lines(self, spark):
        text = "\n".join(["same line"] * 9 + ["other"])
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
        row = textstats.gopher_rules(df).collect()[0]
        assert not row["r_dupline"]  # 8/10 duplicates > 0.3

    def test_summary_counts(self, docs):
        row = textstats.gopher_summary(docs).collect()[0]
        per = {r["doc_id"]: r for r in textstats.gopher_rules(docs).collect()}
        assert row["n_docs"] == 6
        assert row["n_pass"] == sum(1 for r in per.values() if r["passes"])
        assert row["fail_wordcount"] == sum(1 for r in per.values() if not r["r_wordcount"])
