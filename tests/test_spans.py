"""span_near (the Lucene span family over single-term clauses) — frozen
semantics identical across every execution path:

- functions/spans.span_freq: the frozen per-doc kernel (ordered
  stretch/shrink chain, unordered smallest-range sweep configurations);
  proved equal to the 2-clause CLOSED FORMS (adjacent A-then-B cross
  pairs / merge-path pairs) and membership-equivalent to the brute-force
  existential for 2..4 clauses;
- span_freqs_flat: the flat-array batch shape every engine path uses;
- span_sql_2: the DuckDB closed-form rendering (SQL oracle);
- LocalIndex (exhaustive), cold search_df, warm + sharded QuerySession,
  match_count_df, percolate — all rank/score-identical to LuceneOracle;
- parse-time validation of the span_near(...) atom.
"""

import itertools
import random

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions.spans import (
    span_freq,
    span_freqs_flat,
    span_sql_2,
)
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    match_count_df,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.plans.query import SpanNear, parse


class TestSpanFreqUnit:
    @pytest.mark.parametrize(
        "lists,slop,in_order,expect",
        [
            # adjacent ordered pair, width 0
            ([[0], [1]], 0, True, 1.0),
            # reversed pair: no ordered match, unordered width 0
            ([[1], [0]], 0, True, 0.0),
            ([[1], [0]], 0, False, 1.0),
            # gap of 1: width 1 -> 1/2 at slop>=1
            ([[0], [2]], 0, True, 0.0),
            ([[0], [2]], 1, True, 0.5),
            # ordered chain: A=[1,2], B=[3] -> only the shrunk pair (2,3)
            ([[1, 2], [3]], 5, True, 1.0),
            # unordered sweep visits (1,3) width 1 AND (2,3) width 0
            ([[1, 2], [3]], 5, False, float(np.float32(np.float32(0.5) + np.float32(1.0)))),
            # 3 clauses ordered, exact run
            ([[0], [1], [2]], 0, True, 1.0),
            # 3 clauses unordered, any permutation within the window
            ([[2], [0], [1]], 0, False, 1.0),
            ([[2], [0], [1]], 0, True, 0.0),
            # missing clause -> 0
            ([[0, 1], []], 5, True, 0.0),
        ],
    )
    def test_hand_cases(self, lists, slop, in_order, expect):
        got = span_freq([np.asarray(x, dtype=np.int64) for x in lists], slop, in_order)
        assert float(got) == pytest.approx(expect, abs=0), (lists, slop, in_order)

    def test_ordered_closed_form_2(self):
        """2-clause ordered chain == adjacent A-then-B cross pairs of the
        merged order (the independent closed form the SQL oracle renders)."""
        rng = random.Random(7)
        for _ in range(800):
            a = sorted(rng.sample(range(0, 30, 2), rng.randint(1, 6)))
            b = sorted(rng.sample(range(1, 31, 2), rng.randint(1, 6)))
            slop = rng.randint(0, 8)
            merged = sorted([(p, 0) for p in a] + [(p, 1) for p in b])
            want = np.float32(0.0)
            for (p1, s1), (p2, s2) in zip(merged, merged[1:]):
                if s1 == 0 and s2 == 1 and (p2 - p1 - 1) <= slop:
                    want = np.float32(want + np.float32(1.0 / (1.0 + (p2 - p1 - 1))))
            got = span_freq([np.asarray(a), np.asarray(b)], slop, True)
            assert got == want, (a, b, slop)

    def test_unordered_closed_form_2(self):
        """2-clause unordered sweep == merge-path pairs."""
        rng = random.Random(8)
        for _ in range(800):
            a = sorted(rng.sample(range(0, 30, 2), rng.randint(1, 6)))
            b = sorted(rng.sample(range(1, 31, 2), rng.randint(1, 6)))
            slop = rng.randint(0, 8)
            i = j = 0
            want = np.float32(0.0)
            while True:
                w = abs(a[i] - b[j]) - 1
                if w <= slop:
                    want = np.float32(want + np.float32(1.0 / (1.0 + w)))
                if a[i] < b[j]:
                    i += 1
                    if i >= len(a):
                        break
                else:
                    j += 1
                    if j >= len(b):
                        break
            got = span_freq([np.asarray(a), np.asarray(b)], slop, False)
            assert got == want, (a, b, slop)

    def test_membership_equals_bruteforce_exists(self):
        """freq > 0 iff SOME selection satisfies the mode's window test —
        the existential the percolator predicate compiles."""
        rng = random.Random(11)
        for _ in range(1500):
            k = rng.randint(2, 4)
            pool = list(range(40))
            rng.shuffle(pool)
            lists = []
            for _i in range(k):
                n = rng.randint(1, 4)
                lists.append(sorted(pool.pop() for _ in range(n)))
            slop = rng.randint(0, 6)
            arrs = [np.asarray(x) for x in lists]
            exists_o = any(
                all(c[i + 1] > c[i] for i in range(k - 1))
                and (c[-1] - c[0] - (k - 1)) <= slop
                for c in itertools.product(*lists)
            )
            exists_u = any(
                (max(c) - min(c) + 1 - k) <= slop
                for c in itertools.product(*lists)
            )
            assert (span_freq(arrs, slop, True) > 0) == exists_o, (lists, slop)
            assert (span_freq(arrs, slop, False) > 0) == exists_u, (lists, slop)

    def test_flat_matches_per_doc(self):
        rng = random.Random(3)
        docs = {}
        for d in range(40):
            a = sorted(rng.sample(range(0, 30, 2), rng.randint(0, 4)))
            b = sorted(rng.sample(range(1, 31, 2), rng.randint(0, 4)))
            docs[d] = (a, b)
        da = np.concatenate([[d] * len(a) for d, (a, _) in docs.items()]).astype(np.int64)
        pa = np.concatenate([a for a, _ in docs.values()]).astype(np.int64)
        db = np.concatenate([[d] * len(b) for d, (_, b) in docs.items()]).astype(np.int64)
        pb = np.concatenate([b for _, b in docs.values()]).astype(np.int64)
        for in_order in (True, False):
            ds, fs = span_freqs_flat([da, db], [pa, pb], 2, in_order)
            want = {
                d: float(span_freq([np.asarray(a), np.asarray(b)], 2, in_order))
                for d, (a, b) in docs.items()
                if a and b and span_freq([np.asarray(a), np.asarray(b)], 2, in_order) > 0
            }
            assert dict(zip(ds.tolist(), fs.tolist())) == want


class TestSpanSql2:
    def test_sql_matches_kernel(self):
        rng = random.Random(5)
        con = duckdb.connect()
        con.execute("CREATE TABLE src(docid BIGINT, la BIGINT[], lb BIGINT[])")
        cases = []
        for d in range(120):
            a = sorted(rng.sample(range(0, 40, 2), rng.randint(1, 5)))
            b = sorted(rng.sample(range(1, 41, 2), rng.randint(1, 5)))
            cases.append((d, a, b))
            con.execute("INSERT INTO src VALUES (?, ?, ?)", [d, a, b])
        for in_order in (True, False):
            for slop in (0, 1, 4):
                sql = (
                    "WITH "
                    + span_sql_2("la", "lb", "src", slop, in_order, "spanf", "x")[1:]
                    + "\nSELECT docid, freq FROM spanf ORDER BY docid"
                )
                got = dict(con.sql(sql).fetchall())
                for d, a, b in cases:
                    kf = span_freq([np.asarray(a), np.asarray(b)], slop, in_order)
                    if kf > 0:
                        assert d in got and got[d] == float(kf), (d, a, b, slop, in_order)
                    else:
                        assert d not in got, (d, a, b, slop, in_order)


SPAN_QUERIES = [
    "span_near(slop=0 in_order=true connection reset)",
    "span_near(slop=2 connection reset)",
    "span_near(slop=3 in_order=true error timeout)",
    "span_near(slop=3 error timeout)",
    "span_near(slop=1 in_order=true the error) OR timeout",
    "error AND span_near(slop=2 network reset)",
    "error AND NOT span_near(slop=2 connection reset)",
    "span_near(slop=4 in_order=true the a to)",  # 3 clauses
    "span_near(slop=2 read file)^2 OR error",
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


class TestSpanEnginePaths:
    @pytest.mark.parametrize("q", SPAN_QUERIES)
    def test_local_vs_oracle(self, local, oracle, q):
        got = [(int(d), np.float32(s)) for d, s in local.search(q, k=10)]
        assert got == _expect(oracle, q), q

    @pytest.mark.parametrize("q", SPAN_QUERIES)
    def test_cold_search_df_vs_oracle(self, spark, tiny_index, oracle, q):
        got = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
        assert got == _expect(oracle, q), q

    def test_modes_differ_and_nonvacuous(self, oracle):
        """ordered is a restriction of unordered: fewer-or-equal docs, and
        on this corpus strictly fewer for 'connection reset'-adjacent
        words; both non-empty."""
        o = {h.docid for h in oracle.search("span_near(slop=3 in_order=true connection reset)", k=10**6)}
        u = {h.docid for h in oracle.search("span_near(slop=3 connection reset)", k=10**6)}
        assert o and u and o <= u and o != u

    def test_span_vs_sloppy_phrase_differ(self, oracle):
        """span_near unordered is NOT sloppy match_phrase: different
        candidate enumeration (every sweep configuration vs overtake
        emissions) must yield different scores somewhere on this corpus."""
        a = {(h.docid, h.score) for h in oracle.search("span_near(slop=2 connection reset)", k=10**6)}
        b = {(h.docid, h.score) for h in oracle.search('"connection reset"~2', k=10**6)}
        assert a != b

    @pytest.mark.parametrize("q", SPAN_QUERIES[:5])
    def test_warm_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0])
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    @pytest.mark.parametrize("q", SPAN_QUERIES[:3])
    def test_sharded_equals_cold(self, spark, tiny_index, q):
        qs = QuerySession(spark, tiny_index[0], broadcast_cap=0)
        try:
            cold = _hits(search_df(spark, tiny_index[0], q, k=10).collect())
            warm = _hits(qs.search(q, k=10).collect())
            assert cold == warm, q
        finally:
            qs.close()

    def test_with_filters(self, spark, tiny_index, oracle):
        q = "span_near(slop=2 connection reset)"
        kw = {"role": "assistant"}
        got = _hits(search_df(spark, tiny_index[0], q, k=10, **kw).collect())
        exp = [(h.docid, h.score) for h in oracle.search(q, k=10, **kw)]
        assert got == exp

    def test_match_count(self, spark, tiny_index, oracle):
        q = "span_near(slop=2 connection reset) AND error"
        n = match_count_df(spark, tiny_index[0], q).collect()[0]["n_matches"]
        assert n == len(oracle.search(q, k=10**9))

    def test_explain_totals(self, local):
        q = "span_near(slop=2 connection reset) OR error"
        for d, s in local.search(q, k=5):
            ex = local.explain(q, int(d))
            assert np.float32(ex["total"]) == s


class TestSpanSqlOracle:
    def test_bm25_sql_span(self, tmp_path, tiny_corpus_pdf, oracle):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        for q in [
            "span_near(slop=2 in_order=true connection reset)",
            "span_near(slop=3 error timeout) OR refused",
        ]:
            got = duckdb.sql(bm25_sql(p, q, k=10)).fetchall()
            exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
            assert [(int(d), float(s)) for d, s in got] == exp, q

    def test_wide_span_sql_refused(self, tmp_path, tiny_corpus_pdf):
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        with pytest.raises(NotImplementedError, match="2 clauses"):
            bm25_sql(p, "span_near(slop=2 the a to)", k=10)


class TestSpanPercolate:
    def test_percolate_equals_index_match_set(self, spark, tiny_corpus_pdf, tiny_index, oracle):
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
            tokens_col,
        )

        full = spark.createDataFrame(tiny_corpus_pdf)
        for q in [
            "span_near(slop=2 in_order=true connection reset)",
            "span_near(slop=3 error timeout)",
            "span_near(slop=4 in_order=true the a to)",
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


class TestSpanParse:
    def test_parse_defaults(self):
        n = parse("span_near(slop=2 error timeout)")
        assert n == SpanNear(("error", "timeout"), slop=2, in_order=False)

    def test_parse_ordered_boost(self):
        n = parse("span_near(slop=1 in_order=true a b)^3")
        assert n.in_order and n.boost == 3.0

    @pytest.mark.parametrize(
        "bad",
        [
            "span_near(slop=1 solo)",
            "span_near(slop=1 dup dup)",
            "span_near(slop=-1 a b)",
            "span_near(in_order=banana a b)",
            "span_near(slop=x a b)",
            "span_near(slop=1 a b",
        ],
    )
    def test_parse_rejections(self, bad):
        with pytest.raises(ValueError):
            parse(bad)

    def test_positions_off_rejected(self, spark, tiny_corpus_pdf, tmp_path):
        from siem_on_amazon_opensearch_service_spark.operators.build import build_index

        out = str(tmp_path / "nopos")
        build_index(
            spark, spark.createDataFrame(tiny_corpus_pdf), out,
            n_shards=4, n_salts=2, positions=False,
        )
        with pytest.raises(ValueError, match="positions"):
            LocalIndex(out).search("span_near(slop=1 error timeout)", k=5)
