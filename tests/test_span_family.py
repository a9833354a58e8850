"""span_first / span_not / span_or — the rest of the Lucene span family
over single-term clauses (span_near landed separately; see
tests/test_spans.py).

Frozen semantics (functions/spans.py + plans/query.py docstrings):

- span_first(end=N t): positions p with p + 1 <= end; width-0 spans, so
  freq = qualifying count; weight = the term's FULL-df idf.
- span_not(dist=N inc exc): include positions with no exclude position
  within +/- dist; exclude NOT required and contributes no idf.
- span_or(t1 t2 ...): union of the terms' spans as ONE clause; freq =
  total occurrences of any term; weight = grouped single-slot idf fold
  over the sorted terms (rides the MultiPhrase machinery engine-side).

Every path — kernel vs brute force, LocalIndex, cold search_df, warm
QuerySession, SQL oracle, percolate — is checked against LuceneOracle.
"""

import random

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions.spans import (
    SPAN_NOT_MAX_DIST,
    span_first_freqs_flat,
    span_not_freqs_flat,
)
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    match_count_df,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import (
    SpanFirst,
    SpanNot,
    SpanOr,
    parse,
)


class TestKernelsVsBruteForce:
    def test_span_first_flat(self):
        rng = random.Random(11)
        docs, pos = [], []
        per_doc = {}
        for d in range(50):
            ps = sorted(rng.sample(range(0, 30), rng.randint(0, 6)))
            per_doc[d] = ps
            docs += [d] * len(ps)
            pos += ps
        for end in (1, 3, 10, 40):
            ds, fs = span_first_freqs_flat(
                np.asarray(docs), np.asarray(pos), end
            )
            want = {
                d: float(sum(1 for p in ps if p < end))
                for d, ps in per_doc.items()
                if sum(1 for p in ps if p < end)
            }
            assert dict(zip(ds.tolist(), fs.tolist())) == want, end

    def test_span_not_flat(self):
        rng = random.Random(12)
        inc_d, inc_p, exc_d, exc_p = [], [], [], []
        inc, exc = {}, {}
        for d in range(60):
            a = sorted(rng.sample(range(0, 40), rng.randint(0, 5)))
            b = sorted(rng.sample(range(0, 40), rng.randint(0, 5)))
            inc[d], exc[d] = a, b
            inc_d += [d] * len(a)
            inc_p += a
            exc_d += [d] * len(b)
            exc_p += b
        for dist in (0, 1, 3, 8):
            ds, fs = span_not_freqs_flat(
                np.asarray(inc_d), np.asarray(inc_p),
                np.asarray(exc_d), np.asarray(exc_p), dist,
            )
            want = {}
            for d in inc:
                c = sum(
                    1
                    for p in inc[d]
                    if not any(abs(q - p) <= dist for q in exc[d])
                )
                if c:
                    want[d] = float(c)
            assert dict(zip(ds.tolist(), fs.tolist())) == want, dist

    def test_span_not_exclude_absent_keeps_all(self):
        ds, fs = span_not_freqs_flat(
            np.asarray([3, 3, 7]), np.asarray([0, 5, 2]),
            np.asarray([], dtype=np.int64), np.asarray([], dtype=np.int64), 4,
        )
        assert dict(zip(ds.tolist(), fs.tolist())) == {3: 2.0, 7: 1.0}

    def test_span_not_dist_cap(self):
        with pytest.raises(ValueError, match="dist"):
            span_not_freqs_flat(
                np.asarray([0]), np.asarray([0]),
                np.asarray([0]), np.asarray([1]), SPAN_NOT_MAX_DIST + 1,
            )


class TestParse:
    def test_span_first(self):
        assert parse("span_first(end=3 error)") == SpanFirst("error", end=3)

    def test_span_not_defaults(self):
        assert parse("span_not(error timeout)") == SpanNot("error", "timeout", dist=0)
        assert parse("span_not(dist=2 error timeout)") == SpanNot(
            "error", "timeout", dist=2
        )

    def test_span_or_sorts(self):
        assert parse("span_or(timeout error)") == SpanOr(("error", "timeout"))

    def test_boosts(self):
        assert parse("span_first(end=3 error)^2").boost == 2.0
        assert parse("span_or(a b)^1.5").boost == 1.5

    @pytest.mark.parametrize(
        "bad",
        [
            "span_first(error)",            # no end
            "span_first(end=0 error)",      # end < 1
            "span_first(end=3 a b)",        # two terms
            "span_not(error)",              # one term
            "span_not(dist=-1 a b)",        # bad dist
            "span_not(dup dup)",            # include == exclude
            "span_not(dist=999999 a b)",    # dist over cap
            "span_or(solo)",                # < 2 terms
            "span_or(dup dup)",             # duplicates
            "span_or(a b",                  # missing ')'
        ],
    )
    def test_rejections(self, bad):
        with pytest.raises(ValueError):
            parse(bad)


FAMILY_QUERIES = [
    "span_first(end=3 error)",
    "span_first(end=1 the)",
    "span_first(end=8 connection) AND timeout",
    "span_not(dist=2 error timeout)",
    "span_not(dist=0 error timeout)",   # no-op exclusion: = plain term tf
    "span_not(dist=5 connection reset)",
    "span_not(dist=3 error w00042)",    # exclude mostly absent
    "span_or(error timeout)",
    "span_or(timeout refused denied)",
    "span_or(error zzznoterm)",         # zero-df alternative still weighs
    "span_or(connection reset) OR span_first(end=4 error)",
    "error AND NOT span_not(dist=1 timeout error)",
    "span_first(end=5 error)^2 OR timeout",
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
            for q in FAMILY_QUERIES[:10]:
                got = [
                    (int(r["docid"]), np.float32(r["score"]))
                    for r in sess.search(q, k=10).collect()
                ]
                assert got == _expect(oracle, q), q
        finally:
            sess.close()

    def test_match_count(self, spark, tiny_index, oracle):
        q = "span_not(dist=2 error timeout)"
        got = match_count_df(spark, tiny_index[0], q).collect()[0]["n_matches"]
        assert got == len(oracle.search(q, k=10**9))

    def test_span_not_dist0_equals_term_tf(self, oracle):
        """distinct terms never share a position, so dist=0 span_not
        scores EXACTLY like the bare include term."""
        a = _expect(oracle, "span_not(dist=0 error timeout)", k=50)
        b = _expect(oracle, "error", k=50)
        assert a == b

    def test_span_or_differs_from_bool_or(self, oracle):
        """span_or is ONE summed-idf clause; boolean OR scores per-term
        idfs — the rankings must differ somewhere on this corpus."""
        a = _expect(oracle, "span_or(error timeout)", k=10**9)
        b = _expect(oracle, "error OR timeout", k=10**9)
        assert {d for d, _ in a} == {d for d, _ in b}  # same match set
        assert a != b  # but scored differently


class TestSqlOracle:
    @pytest.mark.parametrize(
        "q",
        [
            "span_first(end=3 error)",
            "span_not(dist=2 error timeout)",
            "span_not(dist=3 error w00042)",
            "span_or(timeout refused denied)",  # 3 terms: oracle is general
            "span_or(error zzznoterm)",
            "span_first(end=5 error)^2 OR timeout",
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
        for q in [
            "span_first(end=3 error)",
            "span_not(dist=2 error timeout)",
            "span_or(timeout refused denied)",
        ]:
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
