"""Named queries (percolate.named_search_df): scoring identity with the
boolean OR, per-hit matched_queries correctness vs the frozen oracle's
per-subquery match sets, and the DuckDB rendering."""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.percolate import (
    named_search_df,
    named_search_sql,
)

QUERIES = {
    "err": "error",
    "creset": '"connection reset"',
    "noto": "refused AND NOT timeout",
    "pfx": "w0004*",
}


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


class TestNamedQueries:
    def test_scores_equal_bool_or_and_names_equal_match_sets(
        self, spark, tiny_index, oracle
    ):
        rows = named_search_df(spark, tiny_index[0], QUERIES, k=10).collect()
        overall = " OR ".join(f"({QUERIES[n]})" for n in sorted(QUERIES))
        exp = [(h.docid, h.score) for h in oracle.search(overall, k=10)]
        assert [(int(r["docid"]), np.float32(r["score"])) for r in rows] == exp
        # matched names == the oracle's per-subquery membership
        sets = {
            n: {h.docid for h in oracle.search(QUERIES[n], k=10**9)}
            for n in QUERIES
        }
        for r in rows:
            want = sorted(n for n in QUERIES if int(r["docid"]) in sets[n])
            assert r["matched_queries"] == ",".join(want), r
            assert r["matched_queries"]  # every hit matched >= 1 name

    def test_sql_oracle(self, tmp_path, tiny_corpus_pdf, spark, tiny_index):
        p = str(tmp_path / "c.parquet")
        tiny_corpus_pdf.to_parquet(p)
        got = [
            (int(r["docid"]), round(float(r["score"]), 3), r["matched_queries"])
            for r in named_search_df(spark, tiny_index[0], QUERIES, k=10).collect()
        ]
        exp = [
            (int(d), float(s), m)
            for d, s, m in duckdb.sql(named_search_sql(p, QUERIES, k=10)).fetchall()
        ]
        assert got == exp

    def test_empty_queries_rejected(self, spark, tiny_index):
        with pytest.raises(ValueError, match="no queries"):
            named_search_df(spark, tiny_index[0], {})
