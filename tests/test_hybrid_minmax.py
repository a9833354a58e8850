"""hybrid_fuse: OpenSearch min_max normalization + weighted arithmetic
mean fusion."""

import duckdb
import pytest

from siem_on_amazon_opensearch_service_spark.operators.adhoc import hybrid_fuse
from siem_on_amazon_opensearch_service_spark.operators.sqloracle import hybrid_sql


class TestHybridMinMax:
    def test_hand_computed(self, spark):
        a = spark.createDataFrame(
            [(1, 10.0), (2, 5.0), (3, 0.0)], ["doc_id", "score"]
        )
        # degenerate leg: max == min -> every hit normalizes to 1.0
        b = spark.createDataFrame([(2, 2.0), (4, 2.0)], ["doc_id", "score"])
        got = {
            r["doc_id"]: round(r["hybrid_score"], 9)
            for r in hybrid_fuse([a, b], k=10, weights=[1.0, 1.0]).collect()
        }
        # leg A norms: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0; leg B: 2 -> 1.0, 4 -> 1.0
        assert got == {1: 0.5, 2: 0.75, 3: 0.0, 4: 0.5}

    def test_weights_and_window(self, spark):
        a = spark.createDataFrame(
            [(i, float(100 - i)) for i in range(1, 8)], ["doc_id", "score"]
        )
        b = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 8)], ["doc_id", "score"]
        )
        # window 3 keeps A's top-3 (ids 1-3) and B's top-3 (ids 5-7)
        got = {
            r["doc_id"]: round(r["hybrid_score"], 9)
            for r in hybrid_fuse(
                [a, b], k=10, weights=[2.0, 1.0], rank_window=3
            ).collect()
        }
        # A norms (99,98,97): 1->1, 2->.5, 3->0; B norms (7,6,5): 7->1, 6->.5, 5->0
        assert got == {
            1: round(2.0 / 3.0, 9), 2: round(1.0 / 3.0, 9), 3: 0.0,
            7: round(1.0 / 3.0, 9), 6: round(0.5 / 3.0, 9), 5: 0.0,
        }

    def test_matches_sql_oracle(self, spark, tmp_path, tiny_corpus_pdf):
        # fuse two deterministic pseudo-legs derived from the corpus
        p = str(tmp_path / "t.parquet")
        tiny_corpus_pdf.head(500).to_parquet(p)
        # unique per-leg ids (row_number over a stable order) with
        # guaranteed overlap between the legs
        leg1 = ("SELECT row_number() OVER (ORDER BY conv_id, turn_idx) AS doc_id2, "
                "CAST(length(text) AS DOUBLE) AS s1 FROM read_parquet('{p}') "
                "WHERE conv_id LIKE '%0'").replace("{p}", p)
        leg2 = ("SELECT row_number() OVER (ORDER BY conv_id, turn_idx) AS doc_id2, "
                "CAST(length(text) % 37 AS DOUBLE) AS s2 FROM read_parquet('{p}') "
                "WHERE conv_id LIKE '%1'").replace("{p}", p)
        con = duckdb.connect()
        l1 = spark.createDataFrame(con.sql(leg1).df())
        l2 = spark.createDataFrame(con.sql(leg2).df())
        got = [
            (r["doc_id2"], round(r["hybrid_score"], 9))
            for r in hybrid_fuse(
                [l1, l2], k=15, id_col="doc_id2",
                score_cols=["s1", "s2"], weights=[0.6, 0.4], rank_window=20,
            ).collect()
        ]
        sql = hybrid_sql(
            [(leg1, "doc_id2", "s1"), (leg2, "doc_id2", "s2")],
            k=15, id_col="doc_id2", weights=[0.6, 0.4], rank_window=20,
        )
        exp = [(int(d), round(float(s), 9)) for d, s in con.sql(sql).fetchall()]
        assert got == exp and len(got) == 15

    def test_rejects_weight_mismatch(self, spark):
        a = spark.createDataFrame([(1, 1.0)], ["doc_id", "score"])
        with pytest.raises(ValueError):
            hybrid_fuse([a, a], weights=[1.0])
