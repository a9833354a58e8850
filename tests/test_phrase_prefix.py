"""match_phrase_prefix (``"connection re"*``) — Lucene MultiPhraseQuery
semantics, identical across every execution path:

- parse: ``"a b"*`` -> PhrasePrefix (boosted ``*^N`` form included); a
  slop token after the ``*`` is rejected;
- expansion: the LAST word's prefix expands against the term dictionary,
  first ``max_expansions`` (50) terms in dictionary order — Lucene
  TRUNCATES, it does not raise maxClauseCount; all-singleton expansions
  collapse to a plain Phrase/Term; zero expansions match nothing;
- scoring: frequency = exact adjacency over the UNION of each slot's
  term positions; weight = bm25.grouped_weight (per-slot sequential idf
  subtotals — the association the SQL oracle reproduces with textual
  fixed-slot sums plus an ordered list_reduce fold);
- LocalIndex (exhaustive), cold search_df, warm + sharded QuerySession,
  match_count_df, explain, and both oracles agree rank/score-identically.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.functions import bm25
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    match_count_df,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import (
    MultiPhrase,
    Phrase,
    PhrasePrefix,
    Term,
    expand_multiterm,
    parse,
)

PP_QUERIES = [
    '"connection re"*',
    '"re"*',
    '"connection re"* AND error',
    '"connection zz"* OR timeout',
    'error OR "connection re"*^2',
    'text:"connection re"*',
    '"w0004"*',
    '"connection reset"~2 OR "connection re"*',
]


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


def _hits(rows):
    return [(int(r["docid"]), np.float32(r["score"])) for r in rows]


def _expect(oracle, q, k=10):
    return [(h.docid, h.score) for h in oracle.search(q, k=k)]


class TestParse:
    def test_basic(self):
        n = parse('"connection re"*')
        assert isinstance(n, PhrasePrefix)
        assert n.terms == ("connection", "re") and n.max_expansions == 50

    def test_single_word(self):
        assert parse('"re"*') == PhrasePrefix(("re",))

    def test_boosted_star_token(self):
        assert parse('"re"*^2').boost == 2.0

    def test_text_scoped(self):
        n = parse('text:"connection re"*')
        assert isinstance(n, PhrasePrefix)

    def test_slop_after_star_rejected(self):
        with pytest.raises(ValueError, match="slop on a phrase prefix"):
            parse('"connection re"* ~2')


class TestExpansion:
    def test_expansion_truncates_in_dict_order(self):
        vocab = [f"t{i:03d}" for i in range(80)]
        pp = PhrasePrefix(("x", "t"), max_expansions=10)
        node = expand_multiterm(pp, lambda lf: sorted(vocab))
        assert isinstance(node, MultiPhrase)
        assert node.slots[0] == ("x",)
        assert node.slots[1] == tuple(sorted(vocab)[:10])

    def test_single_expansion_collapses_to_phrase(self):
        pp = PhrasePrefix(("x", "uniq"))
        node = expand_multiterm(pp, lambda lf: ["unique"])
        assert node == Phrase(("x", "unique"))

    def test_single_word_single_expansion_is_term(self):
        node = expand_multiterm(PhrasePrefix(("uniq",)), lambda lf: ["unique"])
        assert node == Term("unique")

    def test_zero_expansion_matches_nothing(self):
        node = expand_multiterm(PhrasePrefix(("x", "zz")), lambda lf: [])
        assert isinstance(node, MultiPhrase) and node.slots[1] == ()

    def test_grouped_weight_singleton_equals_clause_weight(self):
        assert bm25.grouped_weight([[3], [7]], 100) == bm25.clause_weight([3, 7], 100)


class TestEnginePaths:
    @pytest.mark.parametrize("q", PP_QUERIES)
    def test_local_vs_oracle(self, local, oracle, q):
        got = [(int(d), np.float32(s)) for d, s in local.search(q, k=10)]
        assert got == _expect(oracle, q), q

    @pytest.mark.parametrize("q", PP_QUERIES)
    def test_cold_search_df_vs_oracle(self, spark, tiny_index, oracle, q):
        got = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
        assert got == _expect(oracle, q), q

    def test_prefix_differs_from_exact_phrase(self, oracle):
        """Vacuity guard: the expansion must admit docs the exact phrase
        doesn't ('connection reset', 'connection refused', ... all match
        the 're' prefix)."""
        exact = {h.docid for h in oracle.search('"connection reset"', k=500)}
        pref = {h.docid for h in oracle.search('"connection re"*', k=500)}
        assert exact < pref

    @pytest.mark.parametrize("q", PP_QUERIES[:5])
    def test_warm_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0])
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    @pytest.mark.parametrize("q", PP_QUERIES[:5])
    def test_sharded_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0], broadcast_cap=0)
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    def test_with_filters(self, spark, tiny_index, oracle):
        q = '"connection re"*'
        kw = {"role": "assistant"}
        got = _hits(search_df(spark, tiny_index[0], q, k=10, **kw).collect())
        exp = [(h.docid, h.score) for h in oracle.search(q, k=10, **kw)]
        assert got == exp

    def test_match_count(self, spark, tiny_index, oracle):
        q = '"connection re"* AND error'
        n = match_count_df(spark, tiny_index[0], q).collect()[0]["n_matches"]
        assert n == len(oracle.search(q, k=10**9))

    def test_explain(self, local):
        q = '"connection re"* AND error'
        top = local.search(q, k=1)
        ex = local.explain(q, top[0][0])
        assert ex["matches"] is True
        assert ex["total"] == top[0][1]
        mp = ex["clauses"][0]
        assert mp["kind"] == "multiphrase" and "|" in mp["terms"]

    def test_wand_refuses(self, local):
        with pytest.raises(ValueError, match="WAND handles term trees"):
            local.search_wand('"connection re"* OR error', k=10)


class TestSqlOracle:
    @pytest.fixture(scope="class")
    def parquet(self, tmp_path_factory, tiny_corpus_pdf):
        p = str(tmp_path_factory.mktemp("pp") / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        return p

    @pytest.mark.parametrize("q", PP_QUERIES[:5] + PP_QUERIES[6:])
    def test_bm25_sql(self, parquet, oracle, q):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        got = duckdb.sql(bm25_sql(parquet, q, k=10)).fetchall()
        exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
        assert [(int(d), float(s)) for d, s in got] == exp, q

    def test_match_count_sql(self, parquet, oracle):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import (
            match_count_sql,
        )

        q = '"connection re"* AND error'
        (n,) = duckdb.sql(match_count_sql(parquet, q)).fetchall()[0]
        assert int(n) == len(oracle.search(q, k=10**9))
