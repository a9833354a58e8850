"""span_multi — Lucene SpanMultiTermQueryWrapper over wildcard / fuzzy /
regexp atoms (DQL surface ``span_multi(re*)``).

Frozen semantics (plans/query.py SpanMulti docstring): expansion rewrites
the wrapper into the SpanOr of its dictionary matches — the span-OR
rewrite, ONE grouped SimWeight pooling all expansions — in contrast to
the bare atom's SCORING_BOOLEAN_REWRITE (per-term idfs, per-term
saturation).  Singleton expansion collapses to Term; zero expansions
match nothing; expansion is maxClauseCount-capped.

Every path — LocalIndex, cold search_df, warm QuerySession, SQL oracle,
percolate — is checked against LuceneOracle, plus the structural
theorems: match-set equality with the bare atom, score equality with the
explicit span_or of the expansions.
"""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    match_count_df,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import (
    Fuzzy,
    Regexp,
    SpanMulti,
    SpanOr,
    Term,
    Wildcard,
    expand_multiterm,
    parse,
)


class TestParse:
    def test_wildcard_inner(self):
        assert parse("span_multi(re*)") == SpanMulti(Wildcard("re*"))

    def test_fuzzy_inner(self):
        assert parse("span_multi(error~1)") == SpanMulti(Fuzzy("error", 1))

    def test_regexp_inner(self):
        assert parse("span_multi(/w000[45][0-9]/)") == SpanMulti(
            Regexp("w000[45][0-9]")
        )

    def test_inner_boost_folds_into_wrapper(self):
        a = parse("span_multi(re*^2)")
        b = parse("span_multi(re*)^2")
        assert a == b == SpanMulti(Wildcard("re*"), boost=2.0)

    def test_stacked_boosts_multiply(self):
        assert parse("span_multi(re*^2)^3").boost == 6.0

    def test_fuzzy_zero_edits_degenerates_to_term(self):
        # FuzzyQuery(maxEdits=0) is a legal MultiTermQuery whose span
        # rewrite is the single SpanTermQuery == the plain Term
        assert parse("span_multi(error~0)") == Term("error")

    @pytest.mark.parametrize(
        "bad",
        [
            "span_multi(error)",      # plain term is not a MultiTermQuery
            "span_multi()",           # empty
            "span_multi(a* b*)",      # two atoms
            "span_multi(a*",          # missing ')'
            'span_multi("a b")',      # phrase is not a bare multiterm atom
        ],
    )
    def test_rejections(self, bad):
        with pytest.raises(ValueError):
            parse(bad)


class TestExpansion:
    def test_multi_expansion_is_sorted_span_or(self):
        got = expand_multiterm(
            parse("span_multi(re*)^2"), lambda lf: ["read", "retry", "reset"]
        )
        assert got == SpanOr(("read", "reset", "retry"), boost=2.0)

    def test_singleton_collapses_to_term(self):
        assert expand_multiterm(
            parse("span_multi(rea*)"), lambda lf: ["read"]
        ) == Term("read")

    def test_zero_expansion_absent_sentinel(self):
        got = expand_multiterm(parse("span_multi(zz*)"), lambda lf: [])
        assert got == Term("zz*")  # '*' can never appear in an analyzed token

    def test_expander_receives_the_inner_atom(self):
        seen = []

        def exp(lf):
            seen.append(lf)
            return ["a", "b"]

        expand_multiterm(parse("span_multi(error~1)"), exp)
        assert seen == [Fuzzy("error", 1)]

    def test_max_clause_count(self):
        with pytest.raises(ValueError, match="too_many_clauses"):
            expand_multiterm(
                parse("span_multi(w*)"),
                lambda lf: [f"w{i}" for i in range(2000)],
            )


FAMILY_QUERIES = [
    "span_multi(re*)",
    "span_multi(re*) AND error",
    "span_multi(conn*)",                 # singleton -> Term
    "span_multi(zzznope*)",              # zero expansion -> matches nothing
    "span_multi(timeout~1)",
    "span_multi(/re(set|try)/)",
    "span_multi(re*)^2 OR timeout",
    "error AND NOT span_multi(refus*)",
]


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


def _expect(oracle, q, k=10):
    return [(h.docid, h.score) for h in oracle.search(q, k=k)]


class TestEnginePaths:
    @pytest.mark.parametrize("q", FAMILY_QUERIES)
    def test_local_vs_oracle(self, local, oracle, q):
        got = [(int(d), np.float32(s)) for d, s in local.search(q, k=10)]
        assert got == _expect(oracle, q), q

    @pytest.mark.parametrize("q", FAMILY_QUERIES)
    def test_cold_search_df_vs_oracle(self, spark, tiny_index, oracle, q):
        got = [
            (int(r["docid"]), np.float32(r["score"]))
            for r in search_df(spark, tiny_index[0], q, k=10).collect()
        ]
        assert got == _expect(oracle, q), q

    def test_warm_session_vs_oracle(self, spark, tiny_index, oracle):
        sess = QuerySession(spark, tiny_index[0])
        try:
            for q in FAMILY_QUERIES:
                got = [
                    (int(r["docid"]), np.float32(r["score"]))
                    for r in sess.search(q, k=10).collect()
                ]
                assert got == _expect(oracle, q), q
        finally:
            sess.close()

    def test_match_count(self, spark, tiny_index, oracle):
        q = "span_multi(re*) AND error"
        got = match_count_df(spark, tiny_index[0], q).collect()[0]["n_matches"]
        assert got == len(oracle.search(q, k=10**9))

    def test_same_match_set_as_bare_atom(self, oracle):
        """The span rewrite pools scores but matches the same docs as the
        bare wildcard (both = docs holding any expansion)."""
        a = _expect(oracle, "span_multi(re*)", k=10**9)
        b = _expect(oracle, "re*", k=10**9)
        assert {d for d, _ in a} == {d for d, _ in b}
        assert a != b  # pooled grouped weight vs per-term idfs

    def test_equals_explicit_span_or(self, oracle, local):
        """span_multi(re*) must score EXACTLY like the span_or of its
        dictionary matches — the rewrite is definitional."""
        terms = sorted(
            t for t in ("read", "refused", "request", "reset", "response",
                        "result", "retry")
        )
        q_or = f"span_or({' '.join(terms)})"
        assert _expect(oracle, "span_multi(re*)", k=10**9) == _expect(
            oracle, q_or, k=10**9
        )
        got_a = [(int(d), np.float32(s)) for d, s in local.search("span_multi(re*)", k=10**9)]
        got_b = [(int(d), np.float32(s)) for d, s in local.search(q_or, k=10**9)]
        assert got_a == got_b


class TestSqlOracle:
    @pytest.mark.parametrize(
        "q",
        [
            "span_multi(re*)",
            "span_multi(timeout~1)",
            "span_multi(/re(set|try)/)",
            "span_multi(re*)^2 OR timeout",
            "span_multi(zzznope*)",
        ],
    )
    def test_bm25_sql(self, tmp_path, tiny_corpus_pdf, oracle, q):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        got = duckdb.sql(bm25_sql(p, q, k=10)).fetchall()
        exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
        assert [(int(d), float(s)) for d, s in got] == exp, q


class TestPercolate:
    def test_percolate_equals_index_match_set(self, spark, tiny_corpus_pdf, tiny_index, oracle):
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
            tokens_col,
        )

        full = spark.createDataFrame(tiny_corpus_pdf)
        for q in ["span_multi(re*)", "span_multi(timeout~1) AND error"]:
            pred = compile_predicate(q)
            got = {
                (r["conv_id"], r["turn_idx"])
                for r in full.filter(
                    pred(tokens_col(F.col("text")), F.col("role"), F.col("tool"), F.col("ts"))
                ).collect()
            }
            docs = {h.docid for h in oracle.search(q, k=10**9)}
            want = {
                (r["conv_id"], r["turn_idx"])
                for r in spark.read.parquet(tiny_index[0] + "/docs")
                .filter(F.col("docid").isin([int(d) for d in docs]))
                .collect()
            }
            assert got == want, q
