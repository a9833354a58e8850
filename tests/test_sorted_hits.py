"""Field-sorted hits (OpenSearch sort — Discover's time-sorted view):
match set via posting algebra, no scoring, ordered by (field, docid)."""

import duckdb
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import sorted_hits_df
from siem_on_amazon_opensearch_service_spark.operators.sqloracle import sorted_hits_sql


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("sh") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


def _ground_truth(oracle, q, k, field="ts", ascending=False):
    match = {h.docid for h in oracle.search(q, k=10**9)}
    meta = oracle.meta.reset_index(drop=True).copy()
    meta["docid"] = meta.index
    sub = meta[meta["docid"].isin(match)]
    sub = sub.sort_values([field, "docid"], ascending=[ascending, True]).head(k)
    return list(sub["docid"])


QUERIES = [
    ("error AND timeout", "ts", False),
    ("error AND timeout", "ts", True),
    ('"connection reset" OR timeout', "ts", False),
    ("error AND NOT timeout", "turn_idx", False),
    ("error AND role:assistant", "ts", True),
    ('"connection re"* AND error', "ts", False),
]


class TestSortedHits:
    @pytest.mark.parametrize("q,field,asc", QUERIES)
    def test_spark_matches_ground_truth(self, spark, tiny_index, oracle, q, field, asc):
        rows = sorted_hits_df(
            spark, tiny_index[0], q, k=10, sort_field=field, ascending=asc
        ).collect()
        assert [r["docid"] for r in rows] == _ground_truth(oracle, q, 10, field, asc), q

    @pytest.mark.parametrize("q,field,asc", QUERIES)
    def test_sql_oracle_matches(self, parquet, oracle, q, field, asc):
        rows = duckdb.sql(
            sorted_hits_sql(parquet, q, k=10, sort_field=field, ascending=asc)
        ).df()
        assert list(rows["docid"]) == _ground_truth(oracle, q, 10, field, asc), q

    def test_bad_field_rejected(self, spark, tiny_index):
        with pytest.raises(ValueError, match="sort_field"):
            sorted_hits_df(spark, tiny_index[0], "error", sort_field="norm")
