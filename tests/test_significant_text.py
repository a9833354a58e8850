"""significant_text — JLH-scored over-represented terms in the text of a
query's match set vs the corpus background (per-doc foreground counts,
dictionary-df background)."""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions.analysis import tokenize
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    significant_text_df,
)
from siem_on_amazon_opensearch_service_spark.operators.sqloracle import (
    significant_text_sql,
)

QUERIES = [
    "timeout",
    "error AND timeout",
    '"connection reset"',
    "error AND role:assistant",
    '"connection re"* AND error',
]


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("st") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


class TestSignificantText:
    @pytest.mark.parametrize("q", QUERIES)
    def test_spark_matches_sql_oracle(self, spark, tiny_index, parquet, q):
        got = [
            (r["term"], r["fg_cnt"], r["bg_cnt"], float(r["score_r"]))
            for r in significant_text_df(spark, tiny_index[0], q, n=10).collect()
        ]
        exp = [
            (t, int(f), int(b), float(s))
            for t, f, b, s in duckdb.sql(significant_text_sql(parquet, q, n=10)).fetchall()
        ]
        assert got == exp, q

    def test_counts_hand_checked(self, spark, tiny_index, tiny_corpus_pdf):
        """fg_cnt/bg_cnt re-derived from the raw corpus with the frozen
        tokenizer (independent of both the engine and DuckDB)."""
        orc = LuceneOracle(tiny_corpus_pdf)
        match = {h.docid for h in orc.search("timeout", k=10**9)}
        toksets = [set(tokenize(t)) for t in tiny_corpus_pdf.sort_values(
            ["conv_id", "turn_idx"], kind="mergesort")["text"]]
        rows = significant_text_df(spark, tiny_index[0], "timeout", n=10).collect()
        assert rows, "no significant terms — vacuous test"
        for r in rows:
            fg = sum(1 for d in match if r["term"] in toksets[d])
            bg = sum(1 for ts in toksets if r["term"] in ts)
            assert (r["fg_cnt"], r["bg_cnt"]) == (fg, bg), r["term"]

    def test_query_term_is_most_significant(self, spark, tiny_index):
        """The query term itself appears in 100% of the foreground — it
        must top the JLH ranking (sanity of the score direction)."""
        rows = significant_text_df(spark, tiny_index[0], "timeout", n=10).collect()
        assert rows[0]["term"] == "timeout"
