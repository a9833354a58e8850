"""span_containing / span_within — the last two Lucene span relations.

Frozen contract (functions/spans.span_contain_freq): big spans are the
span_near candidate enumeration (chain/sweep) filtered by slop; a
candidate [s, e) contains little position q iff s <= q < e.
emit='big' (containing) folds 1/(1+width) over containing candidates;
emit='little' (within) counts contained little positions once each.
Match SETS of the two coincide (same existential over candidates);
frequencies differ.  Percolation REFUSES both (the any-selection
containment existential over-matches the iterator's candidates in both
modes — found by the random-layout property test, recorded here)."""

import itertools
import random

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions.spans import (
    span_contain_freq,
    span_contain_sql_2,
    span_freq,
)
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import (
    SpanContaining,
    SpanWithin,
    parse,
)


def _rand_case(rng, k):
    univ = list(range(0, 16))
    rng.shuffle(univ)
    sizes = [rng.randint(1, 4) for _ in range(k)] + [rng.randint(1, 3)]
    chunks, off = [], 0
    for sz in sizes:
        chunks.append(sorted(univ[off:off + sz]))
        off += sz
    return chunks[:k], chunks[k]


class TestKernel:
    def test_match_sets_coincide_and_within_counts(self):
        rng = random.Random(17)
        agree = nonempty = 0
        for _ in range(800):
            big, little = _rand_case(rng, rng.choice([2, 3]))
            slop = rng.randint(0, 6)
            for in_order in (False, True):
                fb = span_contain_freq(
                    [np.array(x) for x in big], np.array(little),
                    slop, in_order, "big")
                fl = span_contain_freq(
                    [np.array(x) for x in big], np.array(little),
                    slop, in_order, "little")
                assert (fb > 0) == (fl > 0)
                if fl > 0:
                    assert float(fl) == int(fl) and 1 <= fl <= len(little)
                    nonempty += 1
                agree += 1
        assert nonempty > 200

    def test_containing_bounded_by_near(self):
        """containing's candidates are a SUBSET of span_near's, so its
        freq never exceeds the near freq over the same big clauses."""
        rng = random.Random(23)
        for _ in range(500):
            big, little = _rand_case(rng, 2)
            slop = rng.randint(0, 6)
            for in_order in (False, True):
                fb = span_contain_freq(
                    [np.array(x) for x in big], np.array(little),
                    slop, in_order, "big")
                fn = span_freq([np.array(x) for x in big], slop, in_order)
                assert float(fb) <= float(fn) + 1e-6

    def test_full_coverage_little_equals_near(self):
        """a little position inside EVERY candidate window makes
        containing == span_near exactly."""
        big = [np.array([0, 10]), np.array([2, 12])]
        little = np.array([1, 11])
        for slop in (1, 3):
            for in_order in (False, True):
                fb = span_contain_freq(big, little, slop, in_order, "big")
                fn = span_freq(big, slop, in_order)
                assert float(fb) == float(fn)

    def test_sql_matches_kernel(self):
        rng = random.Random(5)
        con = duckdb.connect()
        con.execute("CREATE TABLE src(docid BIGINT, la BIGINT[], lb BIGINT[], ll BIGINT[])")
        cases = []
        for d in range(150):
            (a, b), l = _rand_case(rng, 2)
            cases.append((d, a, b, l))
            con.execute("INSERT INTO src VALUES (?, ?, ?, ?)", [d, a, b, l])
        for emit in ("big", "little"):
            for in_order in (True, False):
                for slop in (0, 2, 5):
                    sql = (
                        "WITH "
                        + span_contain_sql_2(
                            "la", "lb", "ll", "src", slop, in_order, emit,
                            "scf", "x")[1:]
                        + "\nSELECT docid, freq FROM scf ORDER BY docid"
                    )
                    got = dict(con.sql(sql).fetchall())
                    for d, a, b, l in cases:
                        kf = span_contain_freq(
                            [np.asarray(a), np.asarray(b)], np.asarray(l),
                            slop, in_order, emit)
                        if kf > 0:
                            assert d in got and got[d] == pytest.approx(float(kf)), (
                                d, a, b, l, slop, in_order, emit)
                        else:
                            assert d not in got


CONTAIN_QUERIES = [
    "span_containing(slop=4 little=reset connection error)",
    "span_containing(slop=6 in_order=true little=timeout error refused)",
    "span_within(slop=4 little=reset connection error)",
    "span_within(slop=6 in_order=true little=timeout error refused)",
    "span_containing(slop=8 little=the error timeout) OR refused",
    "error AND span_within(slop=8 little=a connection timeout)",
    "span_containing(slop=5 little=file read write)^2 OR denied",
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
    @pytest.mark.parametrize("q", CONTAIN_QUERIES)
    def test_local_vs_oracle(self, local, oracle, q):
        got = [(int(d), np.float32(s)) for d, s in local.search(q, k=10)]
        assert got == _expect(oracle, q), q

    @pytest.mark.parametrize("q", CONTAIN_QUERIES)
    def test_cold_search_df_vs_oracle(self, spark, tiny_index, oracle, q):
        got = [
            (int(r["docid"]), np.float32(r["score"]))
            for r in search_df(spark, tiny_index[0], q, k=10).collect()
        ]
        assert got == _expect(oracle, q), q

    def test_warm_session_vs_oracle(self, spark, tiny_index, oracle):
        sess = QuerySession(spark, tiny_index[0])
        try:
            for q in CONTAIN_QUERIES[:4]:
                got = [
                    (int(r["docid"]), np.float32(r["score"]))
                    for r in sess.search(q, k=10).collect()
                ]
                assert got == _expect(oracle, q), q
        finally:
            sess.close()

    def test_nonvacuous_and_sets_coincide(self, oracle):
        c = _expect(oracle, CONTAIN_QUERIES[0], k=10**9)
        w = _expect(oracle, CONTAIN_QUERIES[2], k=10**9)
        assert c and w
        assert {d for d, _ in c} == {d for d, _ in w}
        assert c != w  # scored differently (big vs little spans)


class TestSqlOracle:
    @pytest.mark.parametrize("q", CONTAIN_QUERIES[:5])
    def test_bm25_sql(self, tmp_path, tiny_corpus_pdf, oracle, q):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        got = duckdb.sql(bm25_sql(p, q, k=10)).fetchall()
        exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
        assert [(int(d), float(s)) for d, s in got] == exp, q

    def test_wide_big_refused(self, tmp_path, tiny_corpus_pdf):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "c.parquet")
        tiny_corpus_pdf.to_parquet(p)
        with pytest.raises(NotImplementedError, match="2 big clauses"):
            bm25_sql(p, "span_containing(slop=2 little=a the to error)", k=10)


class TestParseAndPercolate:
    def test_parse(self):
        assert parse("span_containing(slop=3 little=reset connection error)") == \
            SpanContaining(("connection", "error"), "reset", slop=3)
        n = parse("span_within(slop=2 in_order=true little=x a b)^2")
        assert isinstance(n, SpanWithin) and n.in_order and n.boost == 2.0

    @pytest.mark.parametrize(
        "bad",
        [
            "span_containing(slop=2 connection error)",     # no little
            "span_containing(little=x solo)",               # 1 big clause
            "span_containing(slop=-1 little=x a b)",
            "span_within(little=a a b)",                    # little in big
            "span_within(little=x a a)",                    # dup big
        ],
    )
    def test_rejections(self, bad):
        with pytest.raises(ValueError):
            parse(bad)

    def test_percolate_refuses(self):
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
        )

        with pytest.raises(NotImplementedError, match="span-iterator"):
            compile_predicate("span_containing(slop=2 little=reset connection error)")
