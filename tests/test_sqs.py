"""``simple_query_string(...)`` atom: the OpenSearch simple_query_string
query (Lucene SimpleQueryParser) — the end-user search-box syntax that
never throws on malformed input.  ``+``/``|``/``-``/``( )``/``"..."~N``/
trailing ``*``/``word~N``, applied strictly left to right, rewritten at
parse time into the existing leaf algebra.  These tests pin the rewrite,
the leniency contract, and end-to-end parity with the Lucene oracle and
the DuckDB SQL oracle."""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators import sqloracle as so
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import (
    And,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Term,
    Wildcard,
    parse,
)


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


class TestParseRewrite:
    def test_default_or(self):
        assert parse("simple_query_string(connection reset)") == Or(
            (Term("connection"), Term("reset"))
        )

    def test_default_operator_and(self):
        assert parse(
            "simple_query_string(default_operator=and connection reset)"
        ) == And((Term("connection"), Term("reset")))

    def test_plus_is_and_pipe_is_or(self):
        assert parse("simple_query_string(a + b)") == And((Term("a"), Term("b")))
        assert parse("simple_query_string(a | b)") == Or((Term("a"), Term("b")))

    def test_left_to_right_no_precedence(self):
        # SimpleQueryParser: a | b + c == (a OR b) AND c
        assert parse("simple_query_string(a | b + c)") == And(
            (Or((Term("a"), Term("b"))), Term("c"))
        )

    def test_adjacent_operators_no_space(self):
        assert parse("simple_query_string(a+b|c)") == Or(
            (And((Term("a"), Term("b"))), Term("c"))
        )

    def test_negation_joins_as_and_not(self):
        assert parse("simple_query_string(error -timeout)") == And(
            (Term("error"), Not(Term("timeout")))
        )
        # negation binds regardless of the pending operator
        assert parse("simple_query_string(a | -b)") == And((Term("a"), Not(Term("b"))))

    def test_mid_word_dash_is_text_not_negation(self):
        assert parse("simple_query_string(foo-bar)") == Or(
            (Term("foo"), Term("bar"))
        )

    def test_group(self):
        assert parse("simple_query_string(err + (timeout | refused))") == And(
            (Term("err"), Or((Term("timeout"), Term("refused"))))
        )

    def test_phrase_and_slop(self):
        assert parse('simple_query_string("connection reset")') == Phrase(
            ("connection", "reset")
        )
        assert parse('simple_query_string("connection reset"~2)') == Phrase(
            ("connection", "reset"), slop=2
        )

    def test_prefix_star(self):
        assert parse("simple_query_string(err*)") == Wildcard("err*")

    def test_fuzzy_suffix(self):
        assert parse("simple_query_string(timeout~1)") == Fuzzy("timeout", 1)
        # bare ~ = SimpleQueryParser's default 2 edits; N clamps to 2
        assert parse("simple_query_string(timeout~)") == Fuzzy("timeout", 2)
        assert parse("simple_query_string(timeout~9)") == Fuzzy("timeout", 2)

    def test_punctuation_analyzes_away(self):
        assert parse("simple_query_string(Connection, RESET!!)") == Or(
            (Term("connection"), Term("reset"))
        )


class TestLeniency:
    """SimpleQueryParser's contract: malformed input degrades, never
    raises (the engine's own loud contracts — zero terms, pure-negative
    coverage — are the only errors)."""

    def test_dangling_operators_drop(self):
        assert parse("simple_query_string(a + | b)") == Or((Term("a"), Term("b")))
        assert parse("simple_query_string(+ a)") == Term("a")
        assert parse("simple_query_string(a |)") == Term("a")

    def test_stray_close_paren_ignored(self):
        # the ATOM ends at the first unbalanced ')' (the outer DQL owns
        # it), so the stray-close leniency lives in the body parser
        from siem_on_amazon_opensearch_service_spark.plans.query import _sqs_parse

        assert _sqs_parse("a ) b", "or") == Or((Term("a"), Term("b")))

    def test_empty_group_drops(self):
        assert parse("simple_query_string(a ( ) b)") == Or((Term("a"), Term("b")))

    def test_unclosed_quote_takes_rest(self):
        assert parse('simple_query_string("connection reset)') == Phrase(
            ("connection", "reset")
        )

    def test_zero_terms_is_loud(self):
        with pytest.raises(ValueError, match="no terms"):
            parse("simple_query_string(!!! ...)")

    def test_pure_negative_is_loud_downstream(self, tiny_index, spark):
        with pytest.raises(ValueError):
            search_df(
                spark, tiny_index[0], "simple_query_string(-error)", k=10
            ).collect()


SQS_QUERIES = [
    "simple_query_string(error timeout)",
    "simple_query_string(default_operator=and error timeout)",
    "simple_query_string(error + timeout | refused)",
    'simple_query_string("connection reset"~2 -denied)',
    "simple_query_string(err* + (timeout | refused))",
    "simple_query_string(w00042~1 error)",
]


class TestEngineParity:
    """The rewrite reuses the existing leaf algebra, so rank/score
    identity vs the frozen Lucene oracle and the DuckDB SQL oracle must
    hold on every path."""

    @pytest.mark.parametrize("q", SQS_QUERIES)
    def test_local_rank_identity(self, local, oracle, q):
        got = [(d, np.float32(s)) for d, s in local.search(q, k=10)]
        exp = [(h.docid, h.score) for h in oracle.search(q, k=10)]
        assert got == exp, q

    @pytest.mark.parametrize("q", SQS_QUERIES)
    def test_distributed_rank_identity(self, spark, tiny_index, oracle, q):
        got = [
            (r["docid"], np.float32(r["score"]))
            for r in search_df(spark, tiny_index[0], q, k=10).collect()
        ]
        exp = [(h.docid, h.score) for h in oracle.search(q, k=10)]
        assert got == exp, q

    def test_sql_oracle_identity(self, spark, tiny_index, tiny_corpus_pdf, tmp_path):
        path = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(path)
        for q in SQS_QUERIES[:4]:
            got = [
                (r["docid"], round(float(r["score"]), 3))
                for r in search_df(spark, tiny_index[0], q, k=10).collect()
            ]
            exp = [
                (int(d), round(float(s), 3))
                for d, s in duckdb.sql(so.bm25_sql(path, q, k=10)).fetchall()
            ]
            assert got == exp, q
