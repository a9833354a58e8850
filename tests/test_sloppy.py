"""Sloppy phrase ("a b"~N / match_phrase slop) — Lucene SloppyPhraseMatcher
greedy-sweep semantics, identical across every execution path:

- functions/sloppy.sloppy_freq: the frozen per-doc sweep (hand-derived
  Lucene cases + the slop=0 == adjacency-count theorem for distinct terms);
- sloppy_freqs_flat: the flat-array batch shape used by every engine path;
- sloppy_sim_sql_2: the DuckDB recursive-CTE rendering (SQL oracle);
- LocalIndex (exhaustive), cold search_df, warm + sharded QuerySession,
  match_count_df — all rank/score-identical to LuceneOracle;
- parse-time rejection of repeated terms under slop > 0.
"""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions.sloppy import (
    sloppy_freq,
    sloppy_freqs_flat,
    sloppy_sim_sql_2,
)
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    match_count_df,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import parse


class TestSloppyFreqUnit:
    @pytest.mark.parametrize(
        "pos_lists,slop,expect",
        [
            # adjacent pair, exact window
            ([[0], [1]], 0, 1.0),
            # one-gap pair: matchLength 1 -> 1/(1+1)
            ([[0], [2]], 1, 0.5),
            ([[0], [2]], 0, 0.0),
            # reversed order: adj positions (2, -1) -> matchLength 3 -> 1/4
            ([[2], [0]], 3, 0.25),
            # repeated windows: (0,1) exact then (4,1 adj 0) len 2 window
            # 2-4 -> emit 1.0 + final 1/(1+2)
            ([[0, 2, 4], [1]], 2, float(np.float32(1.0) + np.float32(1.0 / 3.0))),
            # interleaved wide windows: 3 emissions 1/5 + 1/7 + 1/5
            (
                [[0, 10], [5, 15]],
                10,
                float(
                    np.float32(
                        np.float32(np.float32(0.2) + np.float32(1.0 / 7.0))
                        + np.float32(0.2)
                    )
                ),
            ),
            # a term with no positions -> no match
            ([[0, 1], []], 5, 0.0),
            # 3-term exact adjacency
            ([[0], [1], [2]], 0, 1.0),
            # 3-term with one displacement
            ([[0], [1], [3]], 1, 0.5),
        ],
    )
    def test_hand_cases(self, pos_lists, slop, expect):
        got = sloppy_freq([np.asarray(p, dtype=np.int64) for p in pos_lists], slop)
        assert got == np.float32(expect)

    def test_slop0_equals_adjacency_count(self):
        """For distinct terms, the greedy sweep at slop=0 emits exactly the
        exact-adjacency matches with weight 1 — the theorem that lets the
        engine keep its cheaper intersection path for slop=0."""
        rng = np.random.RandomState(0)
        for _ in range(300):
            a = np.unique(rng.randint(0, 30, size=rng.randint(1, 8)))
            b = np.unique(rng.randint(0, 30, size=rng.randint(1, 8)))
            adj = len(np.intersect1d(a + 1, b))
            assert float(sloppy_freq([a, b], 0)) == float(adj), (a, b)

    def test_slop0_equals_adjacency_count_3(self):
        rng = np.random.RandomState(1)
        for _ in range(200):
            a = np.unique(rng.randint(0, 25, size=rng.randint(1, 7)))
            b = np.unique(rng.randint(0, 25, size=rng.randint(1, 7)))
            c = np.unique(rng.randint(0, 25, size=rng.randint(1, 7)))
            adj = len(np.intersect1d(np.intersect1d(a + 1, b), c - 1))
            assert float(sloppy_freq([a, b, c], 0)) == float(adj), (a, b, c)

    def test_monotone_in_slop(self):
        """A wider slop can only add windows (never remove): freq is
        non-decreasing in slop."""
        rng = np.random.RandomState(2)
        for _ in range(100):
            a = np.unique(rng.randint(0, 40, size=rng.randint(1, 10)))
            b = np.unique(rng.randint(0, 40, size=rng.randint(1, 10)))
            prev = -1.0
            for slop in (0, 1, 2, 4, 8, 64):
                f = float(sloppy_freq([a, b], slop))
                assert f >= prev, (a, b, slop)
                prev = f


class TestSloppyFreqsFlat:
    def test_matches_per_doc_sweep(self):
        rng = np.random.RandomState(3)
        docs0, pos0, docs1, pos1 = [], [], [], []
        expect = {}
        for d in range(200):
            a = np.unique(rng.randint(0, 40, size=rng.randint(0, 9)))
            b = np.unique(rng.randint(0, 40, size=rng.randint(0, 9)))
            docs0 += [d] * a.size
            pos0 += a.tolist()
            docs1 += [d] * b.size
            pos1 += b.tolist()
            if a.size and b.size:
                f = float(sloppy_freq([a, b], 3))
                if f > 0:
                    expect[d] = f
        # shuffle input order: the function must sort internally
        o0 = rng.permutation(len(docs0))
        o1 = rng.permutation(len(docs1))
        got_d, got_f = sloppy_freqs_flat(
            [np.asarray(docs0)[o0], np.asarray(docs1)[o1]],
            [np.asarray(pos0)[o0], np.asarray(pos1)[o1]],
            3,
        )
        assert dict(zip(got_d.tolist(), got_f.tolist())) == expect
        assert np.all(np.diff(got_d) > 0)  # ascending docids

    def test_empty_slot(self):
        d, f = sloppy_freqs_flat(
            [np.array([1, 2]), np.array([], dtype=np.int64)],
            [np.array([0, 0]), np.array([], dtype=np.int64)],
            5,
        )
        assert d.size == 0 and f.size == 0


class TestSloppySqlCte:
    def test_cte_matches_python_sweep(self):
        """The DuckDB recursive CTE replicates the sweep (float32
        accumulation included) on random 2-term position lists."""
        rng = np.random.RandomState(7)
        rows, expect = [], {}
        for docid in range(300):
            a = np.unique(rng.randint(0, 40, size=rng.randint(1, 10)))
            b = np.unique(rng.randint(0, 40, size=rng.randint(1, 10)))
            rows.append((docid, [int(x) for x in a], [int(x) for x in b - 1]))
            f = np.float32(sloppy_freq([a, b], 2))
            if f > 0:
                expect[docid] = f
        con = duckdb.connect()
        con.execute("CREATE TABLE cand (docid INT, la BIGINT[], lb BIGINT[])")
        con.executemany("INSERT INTO cand VALUES (?, ?, ?)", rows)
        sql = (
            "WITH RECURSIVE "
            + sloppy_sim_sql_2("la", "lb", "cand", 2).strip()
            + " SELECT docid, freq FROM sim WHERE done AND freq > 0 ORDER BY docid"
        )
        got = {d: np.float32(f) for d, f in con.sql(sql).fetchall()}
        assert got == expect


SLOPPY_QUERIES = [
    '"connection reset"~1',
    '"connection reset"~2',
    '"reset connection"~4',
    '"connection reset"~2 AND error',
    '"connection reset"~1 OR timeout',
    '"the a to"~3',
    'error AND NOT "connection reset"~2',
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


class TestSloppyEnginePaths:
    @pytest.mark.parametrize("q", SLOPPY_QUERIES)
    def test_local_vs_oracle(self, local, oracle, q):
        got = [(int(d), np.float32(s)) for d, s in local.search(q, k=10)]
        assert got == _expect(oracle, q), q

    @pytest.mark.parametrize("q", SLOPPY_QUERIES)
    def test_cold_search_df_vs_oracle(self, spark, tiny_index, oracle, q):
        got = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
        assert got == _expect(oracle, q), q

    def test_sloppy_changes_results(self, oracle):
        """Guard against the suite passing vacuously: slop must admit more
        docs than the exact phrase on this corpus."""
        exact = {h.docid for h in oracle.search('"connection reset"', k=200)}
        sloppy = {h.docid for h in oracle.search('"connection reset"~2', k=200)}
        assert exact < sloppy

    @pytest.mark.parametrize("q", SLOPPY_QUERIES[:5])
    def test_warm_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0])
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    @pytest.mark.parametrize("q", SLOPPY_QUERIES[:5])
    def test_sharded_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0], broadcast_cap=0)
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    def test_sloppy_with_filters(self, spark, tiny_index, oracle):
        q = '"connection reset"~2'
        kw = {"role": "assistant"}
        got = _hits(search_df(spark, tiny_index[0], q, k=10, **kw).collect())
        exp = [(h.docid, h.score) for h in oracle.search(q, k=10, **kw)]
        assert got == exp

    def test_match_count(self, spark, tiny_index, oracle):
        q = '"connection reset"~2 AND error'
        n = match_count_df(spark, tiny_index[0], q).collect()[0]["n_matches"]
        assert n == len(oracle.search(q, k=10**9))


class TestSloppySqlOracle:
    def test_bm25_sql_sloppy(self, tmp_path, tiny_corpus_pdf, oracle):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        for q in ['"connection reset"~2', '"connection reset"~1 OR timeout']:
            got = duckdb.sql(bm25_sql(p, q, k=10)).fetchall()
            exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
            assert [(int(d), float(s)) for d, s in got] == exp, q

    def test_match_count_sql_sloppy(self, tmp_path, tiny_corpus_pdf, oracle):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import (
            match_count_sql,
        )

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        q = '"connection reset"~2 AND error'
        (n,) = duckdb.sql(match_count_sql(p, q)).fetchall()[0]
        assert int(n) == len(oracle.search(q, k=10**9))

    def test_wide_sloppy_sql_refused(self, tmp_path, tiny_corpus_pdf):
        """The SQL oracle renders 2-term sloppy phrases only; wider ones
        refuse loudly (they are covered by the frozen Python oracle)."""
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        with pytest.raises(NotImplementedError, match="2 terms"):
            bm25_sql(p, '"the a to"~3', k=10)


class TestSloppyParse:
    def test_parse_slop(self):
        node = parse('"connection reset"~2')
        assert node.slop == 2 and node.terms == ("connection", "reset")

    def test_slop_zero_is_exact(self):
        assert parse('"connection reset"~0').slop == 0

    def test_repeated_terms_rejected(self):
        with pytest.raises(ValueError, match="repeated"):
            parse('"error error"~1')

    def test_repeated_terms_exact_ok(self):
        assert parse('"error error"').slop == 0
