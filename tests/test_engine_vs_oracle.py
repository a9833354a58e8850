"""Rank-identity gate: Spark engine (distributed + local + WAND) must match
the frozen Lucene-semantics oracle exactly — docids AND float32 scores —
on every query class the reference's dashboards use (SURVEY.md §5.2)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex, search_df

QUERIES = [
    "error",
    "timeout",
    "assistant",
    "w00042",
    "nonexistentterm",
    "error AND timeout",
    "error AND w00100",
    "error OR refused",
    "timeout OR refused OR denied",
    '"connection reset"',
    "error AND NOT timeout",
    '(error OR timeout) AND connection',
    '"connection reset" OR timeout',
    "(error AND NOT timeout) OR refused",
    "connection AND (error OR NOT timeout)",
    "NOT error",
    "error OR NOT timeout",
]


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


def _assert_hits_equal(got, expect, label):
    got = [(int(d), np.float32(s)) for d, s in got]
    exp = [(h.docid, h.score) for h in expect]
    assert [g[0] for g in got] == [e[0] for e in exp], f"{label}: docids differ"
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == es, f"{label}: score mismatch doc {gd}: {gs!r} != {es!r}"


class TestStatsParity:
    def test_corpus_stats(self, tiny_index, oracle):
        _, stats = tiny_index
        assert stats["n_docs"] == oracle.n_docs
        assert stats["doc_count"] == oracle.doc_count
        assert stats["sum_dl"] == oracle.sum_dl


class TestLocalVsOracle:
    @pytest.mark.parametrize("q", QUERIES)
    def test_rank_identity(self, local, oracle, q):
        _assert_hits_equal(local.search(q, k=20), oracle.search(q, k=20), q)

    def test_keyword_filters(self, local, oracle):
        for kw in [{"role": "assistant"}, {"role": "user"}, {"tool": "bash"}]:
            got = local.search("error", k=15, **kw)
            exp = oracle.search("error", k=15, **kw)
            _assert_hits_equal(got, exp, f"error+{kw}")

    def test_time_range_filter(self, local, oracle, tiny_corpus_pdf):
        mid = tiny_corpus_pdf["ts"].quantile(0.5)
        got = local.search("error", k=15, ts_max=mid)
        exp = oracle.search("error", k=15, ts_max=mid)
        _assert_hits_equal(got, exp, "error+ts_max")


class TestWandVsOracle:
    @pytest.mark.parametrize(
        "q",
        [
            "error",
            "timeout OR refused OR denied",
            "error OR refused",
            "w00042",
            # general-tree path (r2): AND / mixed / NOT shapes
            "error AND timeout",
            "error AND connection AND timeout",
            "error AND NOT timeout",
            "(error AND NOT timeout) OR refused",
            "(error OR timeout) AND connection",
            "connection AND (error OR NOT timeout)",
            "error AND nonexistentterm",
        ],
    )
    def test_wand_rank_identity(self, local, oracle, q):
        _assert_hits_equal(local.search_wand(q, k=10), oracle.search(q, k=10), f"wand:{q}")

    def test_wand_matches_exhaustive_many(self, local):
        for q in ["error OR timeout", "assistant OR w00007 OR w00123", "connection OR reset"]:
            assert local.search_wand(q, k=25) == local.search(q, k=25)

    def test_wand_rejects_uncovered_and_phrase(self, local):
        with pytest.raises(ValueError, match="positive"):
            local.search_wand("NOT error")
        with pytest.raises(ValueError, match="phrase"):
            local.search_wand('"connection reset" AND error')


class TestDistributedVsOracle:
    @pytest.mark.parametrize(
        "q",
        [
            "error",
            "error AND timeout",
            "error OR refused",
            '"connection reset"',
            # NOT mixed with OR: the negated term must NOT contribute score
            # to docs matching via the other branch (ADVICE r1)
            "(error AND NOT timeout) OR refused",
            "(refused AND NOT error) OR timeout",
            "connection AND (error OR NOT timeout)",
            # repeated leaf: Lucene scores each clause occurrence
            "timeout OR (error AND timeout)",
        ],
    )
    def test_rank_identity(self, spark, tiny_index, oracle, q):
        rows = search_df(spark, tiny_index[0], q, k=10).collect()
        got = [(r["docid"], np.float32(r["score"])) for r in rows]
        _assert_hits_equal(got, oracle.search(q, k=10), f"df:{q}")

    def test_sql_oracle_repeated_leaf(self, tmp_path, tiny_corpus_pdf, oracle):
        """The DuckDB SQL oracle must weight repeated positive clauses by
        multiplicity, like every other implementation."""
        import duckdb

        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        q = "timeout OR (error AND timeout)"
        got = duckdb.sql(bm25_sql(p, q, k=10)).fetchall()
        exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
        assert [(int(d), float(s)) for d, s in got] == exp

    @pytest.mark.parametrize("q", ["NOT error", "error OR NOT timeout"])
    def test_uncovered_negative_rejected(self, spark, tiny_index, q):
        """Queries whose match set is not covered by positive terms can't be
        answered from postings; both distributed entry points fail loudly."""
        from siem_on_amazon_opensearch_service_spark.operators.search import match_count_df

        with pytest.raises(ValueError, match="positive"):
            search_df(spark, tiny_index[0], q, k=10)
        with pytest.raises(ValueError, match="positive"):
            match_count_df(spark, tiny_index[0], q)

    def test_match_count_not_shape_rejected(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import match_count_df

        with pytest.raises(ValueError, match="direct child of"):
            match_count_df(spark, tiny_index[0], "connection AND (error OR NOT timeout)")

    def test_filters(self, spark, tiny_index, oracle):
        rows = search_df(spark, tiny_index[0], "error", k=10, role="assistant").collect()
        got = [(r["docid"], np.float32(r["score"])) for r in rows]
        _assert_hits_equal(got, oracle.search("error", k=10, role="assistant"), "df:filter")

    def test_phrase_with_filter_and_bool(self, spark, tiny_index, oracle, tiny_corpus_pdf):
        """Phrase + keyword filter + mixed boolean through the distributed
        path in one query (the dashboard investigation shape)."""
        mid = tiny_corpus_pdf["ts"].quantile(0.5)
        cases = [
            ('"connection reset" AND error', {}),
            ('"connection reset" OR timeout', {"role": "assistant"}),
            ("error", {"role": "user", "ts_max": mid}),
        ]
        for q, kw in cases:
            rows = search_df(spark, tiny_index[0], q, k=10, **kw).collect()
            got = [(r["docid"], np.float32(r["score"])) for r in rows]
            _assert_hits_equal(got, oracle.search(q, k=10, **kw), f"df:{q}:{kw}")

    def test_k_exceeds_matches_and_zero_matches(self, spark, tiny_index, oracle):
        rows = search_df(spark, tiny_index[0], "w00042", k=500).collect()
        got = [(r["docid"], np.float32(r["score"])) for r in rows]
        _assert_hits_equal(got, oracle.search("w00042", k=500), "df:k>matches")
        assert search_df(spark, tiny_index[0], "nonexistentterm", k=10).collect() == []


class TestPerTurnInvariant:
    def test_text_equality_under_stable_order(self, tiny_index, tiny_corpus_pdf):
        """BASELINE.json per-row invariant: per-turn text equality under
        stable (conv_id, turn_idx) ordering between ingest input and the
        stored docs table."""
        import duckdb

        docs = duckdb.sql(
            f"SELECT conv_id, turn_idx, text FROM read_parquet('{tiny_index[0]}/docs/*.parquet') ORDER BY docid"
        ).df()
        src = (
            tiny_corpus_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)[["conv_id", "turn_idx", "text"]]
        )
        src["turn_idx"] = src["turn_idx"].astype(docs["turn_idx"].dtype)
        pd.testing.assert_frame_equal(docs, src)


class TestWandStress:
    def test_wand_equals_exhaustive_random_disjunctions(self, local):
        """Block-max WAND must equal the exhaustive path on a broad random
        battery (hot + tail terms, several k values)."""
        import random

        rng = random.Random(7)
        vocab = ["error", "timeout", "refused", "denied", "connection",
                 "assistant", "file", "request"] + [f"w{rng.randrange(3000):05d}" for _ in range(40)]
        for trial in range(40):
            nt = rng.choice([1, 2, 3, 4])
            terms = rng.sample(vocab, nt)
            q = " OR ".join(terms)
            k = rng.choice([1, 5, 10, 50])
            assert local.search_wand(q, k=k) == local.search(q, k=k), (q, k)

    def test_wand_equals_exhaustive_random_trees(self, local):
        """General-tree WAND battery: random And/Or trees with occasional
        NOT leaves (kept coverage-valid: NOT only inside AND beside a
        positive term)."""
        import random

        rng = random.Random(23)
        vocab = ["error", "timeout", "refused", "denied", "connection",
                 "assistant", "file", "request", "reset"] + [
            f"w{rng.randrange(3000):05d}" for _ in range(30)
        ]

        def rand_tree(depth: int) -> str:
            if depth == 0 or rng.random() < 0.4:
                return rng.choice(vocab)
            op = rng.choice(["AND", "OR"])
            n = rng.choice([2, 3])
            parts = [rand_tree(depth - 1) for _ in range(n)]
            if op == "AND" and rng.random() < 0.4:
                parts.append("NOT " + rng.choice(vocab))
            return "(" + f" {op} ".join(parts) + ")"

        for trial in range(40):
            q = rand_tree(2)
            k = rng.choice([1, 5, 10, 50])
            assert local.search_wand(q, k=k) == local.search(q, k=k), (q, k)

    def test_wand_equals_exhaustive_random_boosted_trees(self, local, oracle):
        """r4b hardening: random trees with random boosts on random
        leaves — WAND == exhaustive == frozen oracle, and random msm on
        flat disjunctions across all three."""
        import random

        rng = random.Random(41)
        vocab = ["error", "timeout", "refused", "denied", "connection",
                 "assistant", "file", "request", "reset"] + [
            f"w{rng.randrange(3000):05d}" for _ in range(20)
        ]

        def leaf() -> str:
            t = rng.choice(vocab)
            if rng.random() < 0.5:
                t += "^" + rng.choice(["2", "3", "0.5", "1.5"])
            return t

        def rand_tree(depth: int) -> str:
            if depth == 0 or rng.random() < 0.4:
                return leaf()
            op = rng.choice(["AND", "OR"])
            parts = [rand_tree(depth - 1) for _ in range(rng.choice([2, 3]))]
            if op == "AND" and rng.random() < 0.3:
                parts.append("NOT " + rng.choice(vocab))
            return "(" + f" {op} ".join(parts) + ")"

        for trial in range(30):
            q = rand_tree(2)
            k = rng.choice([1, 5, 10])
            got = local.search_wand(q, k=k)
            assert got == local.search(q, k=k), (q, k)
            assert got == [(h.docid, h.score) for h in oracle.search(q, k=k)], q

        for trial in range(20):
            nt = rng.choice([3, 4, 5])
            terms = rng.sample(vocab, nt)
            m = rng.randrange(2, nt + 1)
            q = " OR ".join(terms)
            got = local.search(q, k=10, minimum_should_match=m)
            exp = [(h.docid, h.score)
                   for h in oracle.search(q, k=10, minimum_should_match=m)]
            assert got == exp, (q, m)
            assert local.search_wand(q, k=10, minimum_should_match=m) == got, (q, m)


class TestWarmQuerySession:
    """QuerySession (warm path): cached stats/dfs/docs/postings + the
    broadcast-norms fast-score stage must stay rank- AND score-identical
    to cold search_df for every query shape, including filters (mask
    path), phrases (falls back to the docs join), and NOT semantics."""

    @pytest.fixture(scope="class")
    def session(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        qs = QuerySession(spark, tiny_index[0])
        yield qs
        qs.close()

    @pytest.mark.parametrize(
        "q,kw",
        [
            ("error", {}),
            ("error AND timeout", {}),
            ("error OR refused", {}),
            ('"connection reset"', {}),
            ("(error AND NOT timeout) OR refused", {}),
            ("timeout OR (error AND timeout)", {}),
            ("error", {"role": "assistant"}),
            ("error AND timeout", {"role": "user"}),
            ("error", {"ts_min": "2025-06-05 00:00:00", "ts_max": "2025-06-20 00:00:00"}),
            ("error AND timeout", {"tool": "bash", "ts_min": "2025-06-01 00:00:00"}),
        ],
    )
    def test_warm_equals_cold(self, spark, tiny_index, session, q, kw):
        cold = search_df(spark, tiny_index[0], q, k=10, **kw).collect()
        warm = session.search(q, k=10, **kw).collect()
        assert [(r["docid"], np.float32(r["score"])) for r in cold] == [
            (r["docid"], np.float32(r["score"])) for r in warm
        ], q

    @pytest.mark.parametrize(
        "q",
        ["error AND timeout", "error OR refused", '"connection reset"',
         "(error AND NOT timeout) OR refused"],
    )
    def test_warm_full_match_set_equals_cold(self, spark, tiny_index, session, q):
        """r4e: k=None (full scored match set) through the shard-local
        warm path must equal the cold k=None set exactly (unordered
        contract -> compare as sorted sets)."""
        cold = search_df(spark, tiny_index[0], q, k=None).collect()
        warm = session.search(q, k=None).collect()
        key = lambda rows: sorted((r["docid"], np.float32(r["score"])) for r in rows)  # noqa: E731
        assert key(warm) == key(cold), q
        assert len(warm) > 10  # a real match set, not a page

    def test_warm_repeat_uses_prune_memo(self, session):
        a = session.search("error", k=10).collect()
        b = session.search("error", k=10).collect()  # memoized prune plan
        assert [(r["docid"], r["score"]) for r in a] == [(r["docid"], r["score"]) for r in b]
        assert len(session._prune_memo) >= 1


DQL_QUERIES = [
    # wildcard / prefix term expansion (SCORING_BOOLEAN_REWRITE)
    ("w0004*", {}),
    ("conn*", {}),
    ("err* AND timeout", {}),
    ("timeout OR w0004?", {}),
    ("w000*", {}),  # wide expansion, many rare terms
    ("zzznomatch*", {}),  # zero dictionary matches
    # field-scoped filters / exists (the reference's saved-search filters)
    ("role:assistant AND (error OR timeout)", {}),
    ("tool:* AND file", {}),
    ("role:tool AND tool:bash AND error", {}),
    ("err* AND role:assistant", {}),  # wildcard + filter combined
    ("text:error AND timeout", {}),  # text:-scoped atom == bare term
    # DQL filter merged with explicit kwargs
    ("role:assistant AND error", {"tool": None}),
    ("err*", {"role": "assistant"}),
    # fuzzy term queries (r4b): multi-match, degenerate single-match,
    # AUTO ladder, zero-match, fuzzy + filter combined
    ("w00042~1", {}),
    ("w00042~2", {}),
    ("timeout~1 AND error", {}),
    ("timeout~", {}),
    ("zzzznomatch~2", {}),
    ("w00042~1 AND role:assistant", {}),
    ("refused~1 OR denied~1", {}),
    # is-one-of / negated filters (r4b; the reference's phrases and
    # negate:true saved-search filters)
    ("error AND role:(user OR assistant)", {}),
    ("error AND NOT role:assistant", {}),
    ("error AND NOT tool:*", {}),
    ("timeout AND NOT role:(system OR tool)", {}),
    ("file AND tool:* AND NOT tool:bash", {}),
    ("error AND role:(user OR assistant) AND NOT tool:web", {}),
    ("text:(error OR timeout) AND role:user", {}),
    ("error AND NOT role:assistant", {"ts_min": "2025-06-05 00:00:00"}),
    ("error", {"role_not": ("assistant",)}),
    ("error", {"role": ("user", "assistant")}),
    ('role:"assistant" AND error', {}),  # quoted == bare keyword value
    ('error AND NOT role:"no such role"', {}),  # spacey value excludes nothing
    ('text:"connection reset" AND error', {}),  # field-scoped phrase
    # query-time boosts (r4b): term / phrase / wildcard / fuzzy /
    # fractional / repeated-with-different-boosts
    ("error^2 OR timeout", {}),
    ("error^2 AND timeout", {}),
    ('"connection reset"^2 OR error', {}),
    ("w0004*^2 AND error", {}),
    ("error^0.5", {}),
    ("timeout~1^2 AND error", {}),
    ("error^2 OR error^3", {}),
    ("error^2 AND role:assistant", {}),
    # minimum_should_match (r4b): >=m of the should clauses
    ("timeout OR refused OR denied", {"minimum_should_match": 2}),
    ("timeout OR refused OR denied OR error", {"minimum_should_match": 3}),
    ("error OR w0004* OR timeout", {"minimum_should_match": 2}),
    ("timeout OR refused", {"minimum_should_match": 2}),  # m=n -> AND
    ("timeout^2 OR refused OR error", {"minimum_should_match": 2}),  # + boost
    ("timeout OR refused OR denied", {"minimum_should_match": 2, "role": "user"}),
    # regexp term queries (r4c): anchored full-term match, expanded like
    # wildcards; classes, alternation, quantifiers, boost, zero-match
    ("/w000[45][0-9]/", {}),
    ("/err.r/", {}),
    ("/time(out|r)/ AND error", {}),
    ("/w0004[0-9]/ OR timeout", {}),
    ("/conn.*/ AND role:assistant", {}),
    ("/zzz[0-9]+nomatch/", {}),
    ("/err(or|ors)/^2 OR timeout", {}),
    ("text:/time.ut/", {}),
]


class TestDQL:
    """r4 (VERDICT r3 item 1): the reference's real DQL surface — field
    filters (role:/tool:), exists (field:*), and wildcard/prefix term
    queries — rank/score-identical across every execution path."""

    @pytest.mark.parametrize("q,kw", DQL_QUERIES)
    def test_local_rank_identity(self, local, oracle, q, kw):
        _assert_hits_equal(local.search(q, k=10, **kw), oracle.search(q, k=10, **kw), f"local:{q}")

    @pytest.mark.parametrize("q,kw", DQL_QUERIES)
    def test_distributed_rank_identity(self, spark, tiny_index, oracle, q, kw):
        rows = search_df(spark, tiny_index[0], q, k=10, **kw).collect()
        got = [(r["docid"], np.float32(r["score"])) for r in rows]
        _assert_hits_equal(got, oracle.search(q, k=10, **kw), f"df:{q}")

    @pytest.mark.parametrize(
        "q", ["w0004*", "err* AND timeout", "timeout OR w0004?", "w00042~1",
              "error^2 OR timeout", "error^2", "error^2 AND w00042",
              "/w000[45][0-9]/", "/err.r/ AND timeout"]
    )
    def test_wand_rank_identity(self, local, q):
        assert local.search_wand(q, k=10) == local.search(q, k=10)

    def test_wand_rejects_field_filters(self, local):
        with pytest.raises(ValueError, match="field filters"):
            local.search_wand("role:assistant AND error")

    def test_sql_oracle_dql(self, tmp_path, tiny_corpus_pdf, oracle):
        import duckdb

        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        for q in ["w0004*", "role:assistant AND (error OR timeout)",
                  "tool:* AND file", "err* AND timeout",
                  "w00042~1", "timeout~1 AND error",
                  "error AND NOT role:assistant",
                  "error AND role:(user OR assistant)",
                  "error AND NOT tool:*",
                  "/w000[45][0-9]/", "/time(out|r)/ AND error"]:
            got = duckdb.sql(bm25_sql(p, q, k=10)).fetchall()
            exp = [(h.docid, round(float(h.score), 3)) for h in oracle.search(q, k=10)]
            assert [(int(d), float(s)) for d, s in got] == exp, q

    def test_match_count_with_filters(self, spark, tiny_index, tiny_corpus_pdf, tmp_path):
        import duckdb

        from siem_on_amazon_opensearch_service_spark.operators.search import match_count_df
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import match_count_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        for q in ["tool:* AND file", "role:assistant AND (error OR timeout)",
                  "err* AND timeout", "w00042~1 AND error",
                  "error AND NOT role:assistant",
                  "file AND role:(user OR assistant)"]:
            got = match_count_df(spark, tiny_index[0], q).first()[0]
            exp = duckdb.sql(match_count_sql(p, q)).fetchone()[0]
            assert got == exp, q

    def test_warm_session_dql(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        qs = QuerySession(spark, tiny_index[0])
        try:
            for q in ["w0004*", "tool:* AND file",
                      "role:assistant AND (error OR timeout)", "w00042~1",
                      "error AND NOT role:assistant",
                      "error AND role:(user OR assistant)",
                      "/w000[45][0-9]/ AND error"]:
                cold = search_df(spark, tiny_index[0], q, k=10).collect()
                warm = qs.search(q, k=10).collect()
                warm2 = qs.search(q, k=10).collect()  # memoized expansion
                key = lambda rows: [(r["docid"], np.float32(r["score"])) for r in rows]
                assert key(warm) == key(cold) == key(warm2), q
            assert len(qs._expand_memo) >= 1
        finally:
            qs.close()

    def test_parser_rejections(self):
        from siem_on_amazon_opensearch_service_spark.plans.query import extract_filters, parse

        for bad, msg in [
            # r4b: NOT role:x as a top-level conjunct became legal (the
            # reference's negate:true filters); deeper placements still raise
            ("error OR NOT role:assistant", "top-level AND conjunct"),
            ("error AND NOT NOT role:assistant", "top-level AND conjunct"),
            ("error OR role:assistant", "top-level AND conjunct"),
            ("role:assistant", "no scoring clause"),
            ("NOT role:assistant", "no scoring clause"),
            ("role:a AND role:b AND error", "conflicting"),
            ("badfield:x AND error", "unknown field"),
            ("*** AND error", "no literal characters"),
            ("role:(a AND b) AND error", "OR-separated keyword values"),
            ("role:() AND error", "empty value group"),
        ]:
            with pytest.raises(ValueError, match=msg):
                extract_filters(parse(bad), bad)

    def test_kwarg_filter_conflict(self, spark, tiny_index):
        with pytest.raises(ValueError, match="conflicts"):
            search_df(spark, tiny_index[0], "role:assistant AND error", k=10, role="user")

    def test_max_clause_count(self):
        from siem_on_amazon_opensearch_service_spark.plans.query import (
            expand_multiterm,
            parse,
        )

        with pytest.raises(ValueError, match="too_many_clauses"):
            expand_multiterm(parse("w*"), lambda lf: [f"w{i}" for i in range(10)], max_clauses=5)

    def test_explain_totals_equal_search_scores(self, local):
        """explain()'s float32 total must equal the score search() ranks
        by, clause for clause, for every hit of several query shapes."""
        for q in ["error", "error AND timeout", "timeout OR refused",
                  '"connection reset" OR error', "error^2 AND timeout"]:
            for docid, score in local.search(q, k=5):
                ex = local.explain(q, docid)
                assert ex["matches"] is True
                assert ex["total"] == score, (q, docid)
                tot = np.float32(sum(
                    c["boost_weight"] * np.float64(c["score"]) for c in ex["clauses"]
                ))
                assert tot == score, (q, docid)
        # a non-matching doc explains as unmatched with total 0
        hits = {d for d, _ in local.search("w00042", k=100000)}
        miss = next(d for d in range(200) if d not in hits)
        ex = local.explain("w00042", miss)
        assert ex["matches"] is False and ex["total"] == np.float32(0.0)

    def test_msm_semantics(self, local, oracle):
        """minimum_should_match: matches need >= m should clauses; every
        matching clause still scores; WAND falls back exhaustively with
        identical results; invalid m raises."""
        q = "timeout OR refused OR denied"
        base = {d for d, _ in local.search(q, k=1000)}
        msm2 = local.search(q, k=1000, minimum_should_match=2)
        assert {d for d, _ in msm2} < base  # strictly fewer matches
        assert local.search_wand(q, k=10, minimum_should_match=2) == local.search(
            q, k=10, minimum_should_match=2
        )
        with pytest.raises(ValueError, match="top-level OR"):
            local.search("error AND timeout", k=5, minimum_should_match=2)
        with pytest.raises(ValueError, match="exceeds"):
            local.search("error OR timeout", k=5, minimum_should_match=3)

    def test_boost_parse_semantics(self):
        from siem_on_amazon_opensearch_service_spark.plans.query import (
            Fuzzy,
            Phrase,
            Term,
            Wildcard,
            parse,
        )

        assert parse("error^2") == Term("error", 2.0)
        assert parse("error^0.5") == Term("error", 0.5)
        assert parse('"connection reset"^2') == Phrase(("connection", "reset"), 2.0)
        assert parse("err*^2") == Wildcard("err*", 2.0)
        assert parse("timeout~1^2") == Fuzzy("timeout", 1, 2.0)
        for bad, msg in [
            ("error^0", "must be positive"),
            ("error^-1", "bad boost syntax"),
            ("error^2^3", "bad boost syntax"),
            ("(error OR timeout)^2", "terms and phrases only"),
            ("role:assistant^2 AND error", "boost on keyword filter"),
        ]:
            with pytest.raises(ValueError, match=msg):
                parse(bad)

    def test_boost_scales_scores(self, local, oracle):
        """error^2's scores must be exactly 2x error's (same docs, same
        order), on both the local engine and the frozen oracle."""
        base = local.search("error", k=10)
        boosted = local.search("error^2", k=10)
        assert [d for d, _ in base] == [d for d, _ in boosted]
        for (d1, s1), (d2, s2) in zip(base, boosted):
            assert s2 == np.float32(np.float64(s1) * 2.0), (d1, s1, s2)
        ob = oracle.search("error^2", k=10)
        assert [(h.docid, h.score) for h in ob] == boosted

    def test_fuzzy_parse_semantics(self):
        from siem_on_amazon_opensearch_service_spark.plans.query import (
            Fuzzy,
            Term,
            parse,
        )

        assert parse("w00042~1") == Fuzzy("w00042", 1)
        assert parse("timeout~") == Fuzzy("timeout", 2)  # AUTO: len>=6 -> 2
        assert parse("abcd~") == Fuzzy("abcd", 1)  # AUTO: 3-5 -> 1
        assert parse("ab~") == Term("ab")  # AUTO: <3 -> exact
        assert parse("error~0") == Term("error")  # maxEdits=0 == TermQuery
        for bad, msg in [
            ("foo~3", "exceeds the supported maximum"),
            ("~1", "bad fuzzy atom"),
            ("err*~1", "cannot combine"),
        ]:
            with pytest.raises(ValueError, match=msg):
                parse(bad)

    def test_levenshtein_within_matches_duckdb(self):
        import duckdb

        from siem_on_amazon_opensearch_service_spark.plans.query import (
            levenshtein_within,
        )

        words = ["w00042", "w00043", "w10042", "timeout", "timeouts", "time",
                 "reset", "restt", "ab", "ba", "abc", ""]
        for a in words:
            for b in words:
                if not a or not b:
                    continue
                d = duckdb.sql(f"SELECT levenshtein('{a}','{b}')").fetchone()[0]
                for e in (1, 2):
                    assert levenshtein_within(a, b, e) == (d <= e), (a, b, e)

    def test_fuzzy_expansion_against_dictionary(self, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            _expand_leaf,
        )
        from siem_on_amazon_opensearch_service_spark.plans.query import Fuzzy

        terms = _expand_leaf(tiny_index[0], Fuzzy("w00042", 1))
        assert "w00042" in terms  # distance 0: the term itself
        assert terms == sorted(terms)
        assert all(len(t) in (5, 6, 7) for t in terms)


class TestShardedQuerySession:
    """r4 (VERDICT r3 item 2): past the broadcast cap the session must
    hold NO O(corpus) driver state — norms/filters resolve per shard,
    executor-side — and stay rank/score-identical to cold on every query
    shape, including phrases (item 8) and filters."""

    @pytest.fixture(scope="class")
    def sharded(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        qs = QuerySession(spark, tiny_index[0], broadcast_cap=0)
        yield qs
        qs.close()

    def test_no_corpus_state(self, sharded):
        assert sharded.sharded is True
        assert sharded.norms_bc is None
        assert sharded.docs is None
        assert sharded._role is None

    @pytest.mark.parametrize(
        "q,kw",
        [
            ("error", {}),
            ("error AND timeout", {}),
            ("timeout OR refused OR denied", {}),
            ('"connection reset"', {}),
            ('"connection reset" OR timeout', {}),
            ("(error AND NOT timeout) OR refused", {}),
            ("timeout OR (error AND timeout)", {}),
            ("error", {"role": "assistant"}),
            ("error AND timeout", {"tool": "bash", "ts_min": "2025-06-01 00:00:00"}),
            ("w0004*", {}),
            ("tool:* AND file", {}),
            ("role:assistant AND (error OR timeout)", {}),
            ("w00042~1", {}),
            ("timeout~1 AND error", {}),
            ("error AND NOT role:assistant", {}),
            ("error AND role:(user OR assistant)", {}),
            ("error AND NOT tool:*", {}),
            ("error^2 OR timeout", {}),
            ('"connection reset"^2 OR error', {}),
            ("timeout OR refused OR denied", {"minimum_should_match": 2}),
        ],
    )
    def test_sharded_equals_cold(self, spark, tiny_index, sharded, q, kw):
        cold = search_df(spark, tiny_index[0], q, k=10, **kw).collect()
        warm = sharded.search(q, k=10, **kw).collect()
        assert [(r["docid"], np.float32(r["score"])) for r in cold] == [
            (r["docid"], np.float32(r["score"])) for r in warm
        ], q

    def test_warm_phrase_shard_local(self, spark, tiny_index):
        """item 8: warm phrase queries run (and match cold) through the
        shard-local plan in BROADCAST mode too."""
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        qs = QuerySession(spark, tiny_index[0])
        try:
            for q in ['"connection reset"', '"connection reset" AND error']:
                cold = search_df(spark, tiny_index[0], q, k=10).collect()
                warm = qs.search(q, k=10).collect()
                assert [(r["docid"], np.float32(r["score"])) for r in cold] == [
                    (r["docid"], np.float32(r["score"])) for r in warm
                ], q
        finally:
            qs.close()


class TestDQLTimeRange:
    """ts>=/ts<= atoms compile to the inclusive ts_min/ts_max filters on
    every path; strict bounds are rejected loudly."""

    Q = "error AND ts>=2025-06-05T00:00:00 AND ts<=2025-06-20T00:00:00"

    def test_local_and_distributed(self, spark, tiny_index, local, oracle):
        exp = oracle.search(
            "error", k=10, ts_min="2025-06-05 00:00:00", ts_max="2025-06-20 00:00:00"
        )
        _assert_hits_equal(local.search(self.Q, k=10), exp, "local:tsrange")
        rows = search_df(spark, tiny_index[0], self.Q, k=10).collect()
        got = [(r["docid"], np.float32(r["score"])) for r in rows]
        _assert_hits_equal(got, exp, "df:tsrange")

    def test_warm(self, spark, tiny_index):
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        qs = QuerySession(spark, tiny_index[0])
        try:
            cold = search_df(spark, tiny_index[0], self.Q, k=10).collect()
            warm = qs.search(self.Q, k=10).collect()
            assert [(r["docid"], np.float32(r["score"])) for r in cold] == [
                (r["docid"], np.float32(r["score"])) for r in warm
            ]
        finally:
            qs.close()

    def test_sql_oracle(self, tmp_path, tiny_corpus_pdf, oracle):
        import duckdb

        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        got = duckdb.sql(bm25_sql(p, self.Q, k=10)).fetchall()
        exp = [
            (h.docid, round(float(h.score), 3))
            for h in oracle.search(
                "error", k=10, ts_min="2025-06-05 00:00:00", ts_max="2025-06-20 00:00:00"
            )
        ]
        assert [(int(d), float(s)) for d, s in got] == exp

    def test_strict_bound_rejected(self):
        from siem_on_amazon_opensearch_service_spark.plans.query import extract_filters, parse

        with pytest.raises(ValueError, match="inclusive"):
            extract_filters(parse("error AND ts>2025-06-05"), "q")


class TestReviewRegressions:
    """r4 review findings: match_count ts filters, falsy filter values in
    prune seeding, keyword-wildcard rejection, ts kwarg/DQL type merge."""

    def test_match_count_applies_ts_filters(self, spark, tiny_index, tiny_corpus_pdf, tmp_path):
        import duckdb

        from siem_on_amazon_opensearch_service_spark.operators.search import match_count_df
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import match_count_sql

        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        q = "error AND ts>=2025-06-05T00:00:00 AND ts<=2025-06-20T00:00:00"
        got = match_count_df(spark, tiny_index[0], q).first()[0]
        exp = duckdb.sql(match_count_sql(p, q)).fetchone()[0]
        unfiltered = match_count_df(spark, tiny_index[0], "error").first()[0]
        assert got == exp
        assert got < unfiltered  # the range actually constrains

    def test_empty_string_filter_value_constrains_prune(self, spark, tiny_index, oracle):
        # role="" matches nothing in this corpus; a truthiness gate would
        # seed theta unfiltered and could prune the (empty) result set
        # inconsistently — the correct result is simply empty
        rows = search_df(spark, tiny_index[0], "error", k=10, role="").collect()
        assert rows == []
        assert oracle.search("error", k=10, role="") == []

    def test_keyword_wildcard_rejected(self):
        from siem_on_amazon_opensearch_service_spark.plans.query import parse

        with pytest.raises(ValueError, match="wildcard in keyword filter"):
            parse("role:assist* AND error")

    def test_ts_kwarg_and_dql_equal_instants_merge(self, spark, tiny_index):
        import pandas as pd

        q = "error AND ts>=2025-06-05T00:00:00"
        a = search_df(spark, tiny_index[0], q, k=10,
                      ts_min=pd.Timestamp("2025-06-05 00:00:00")).collect()
        b = search_df(spark, tiny_index[0], q, k=10).collect()
        assert [(r["docid"], r["score"]) for r in a] == [(r["docid"], r["score"]) for r in b]
        with pytest.raises(ValueError, match="conflicts"):
            search_df(spark, tiny_index[0], q, k=10, ts_min="2025-06-06 00:00:00")


class TestShardedSingleTermZeroExchange:
    def test_plan_has_no_exchange_and_matches_cold(self, spark, tiny_index):
        """r4: the sharded warm mode keeps the zero-exchange fused plan
        for single-term queries (ranged norm fetch inside the decode)."""
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        qs = QuerySession(spark, tiny_index[0], broadcast_cap=0)
        try:
            df = qs.search("error", k=10)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            cold = search_df(spark, tiny_index[0], "error", k=10).collect()
            assert [(r["docid"], np.float32(r["score"])) for r in df.collect()] == [
                (r["docid"], np.float32(r["score"])) for r in cold
            ]
        finally:
            qs.close()

    def test_search_after_pages_tile_the_ranking(self, spark, tiny_index):
        """OpenSearch search_after semantics: concatenating size-5 pages
        through the (score, docid) cursor must equal the top-20 ranking,
        on both the cold path and a warm session (where the cursor also
        disables theta pruning — pruned scoring would cut the very docs
        the cursor asks for)."""
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        for q in ["error", "error AND timeout", "timeout OR refused OR denied"]:
            full = search_df(spark, tiny_index[0], q, k=20).collect()
            pages, cursor = [], None
            for _ in range(4):
                page = search_df(spark, tiny_index[0], q, k=5, search_after=cursor).collect()
                if not page:
                    break
                pages += page
                cursor = (float(page[-1]["score"]), int(page[-1]["docid"]))
            key = lambda rows: [(r["docid"], np.float32(r["score"])) for r in rows]
            assert key(pages) == key(full), q

        qs = QuerySession(spark, tiny_index[0])
        try:
            full = search_df(spark, tiny_index[0], "error", k=20).collect()
            p1 = qs.search("error", k=10).collect()
            cur = (float(p1[-1]["score"]), int(p1[-1]["docid"]))
            p2 = qs.search("error", k=10, search_after=cur).collect()
            key = lambda rows: [(r["docid"], np.float32(r["score"])) for r in rows]
            assert key(p1 + p2) == key(full)
        finally:
            qs.close()

    def test_multi_index_rotation_merge(self, spark, tiny_index, tiny_corpus_pdf, tmp_path):
        """Alias search over day-rotated sub-indexes: each index scores
        with its OWN stats (same doc scores differently than in the full
        index), docids stay dense per index despite boundary-split
        conversations, and the merged top-k equals the python merge of
        per-index results."""
        import numpy as np

        from siem_on_amazon_opensearch_service_spark.operators.build import build_index
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            search_df,
            search_multi_df,
        )

        from pyspark.sql import functions as F

        full = spark.createDataFrame(tiny_corpus_pdf)
        days = sorted(tiny_corpus_pdf["ts"].dt.floor("D").unique())[:3]
        dirs = []
        for i, day in enumerate(days):
            sub = full.filter(F.date_trunc("day", F.col("ts")) == F.lit(day))
            out = str(tmp_path / f"day{i}")
            build_index(spark, sub, out, n_salts=2, validate_dense=False)
            dirs.append(out)
        # dense-docid invariant per sub-index
        import duckdb

        for d in dirs:
            lo, hi, n = duckdb.sql(
                f"SELECT min(docid), max(docid), count(*) FROM read_parquet('{d}/docs/*.parquet')"
            ).fetchone()
            assert (lo, hi) == (0, n - 1), d

        q = "error AND timeout"
        per = []
        for i, d in enumerate(dirs):
            for r in search_df(spark, d, q, k=10).collect():
                per.append((i, r["docid"], np.float32(r["score"])))
        exp = sorted(per, key=lambda t: (-float(t[2]), t[0], t[1]))[:10]
        got = [
            (r["index_ord"], r["docid"], np.float32(r["score"]))
            for r in search_multi_df(spark, dirs, q, k=10).collect()
        ]
        assert got == exp
        # per-index stats differ from the full index's (idf locality)
        full_scores = {
            r["docid"]: np.float32(r["score"])
            for r in search_df(spark, tiny_index[0], q, k=50).collect()
        }
        assert any(s not in set(full_scores.values()) for _, _, s in got)

    def test_highlight_wraps_expanded_terms(self, spark, tiny_index):
        """highlight_df must wrap every analyzed token in the query's
        EXPANDED term set — including wildcard/fuzzy dictionary matches —
        and nothing else."""
        import re

        from siem_on_amazon_opensearch_service_spark.operators.search import highlight_df

        rows = highlight_df(spark, tiny_index[0], "w0004* AND error", k=5).collect()
        assert rows
        for r in rows:
            marked = re.findall(r"<em>([a-z0-9_]+)</em>", r["highlight"])
            assert marked, r  # a hit must contain at least one match
            assert all(m == "error" or m.startswith("w0004") for m in marked), marked
            # round-trip: stripping tags yields the analyzed token stream
            assert "<em>" not in re.sub(r"</?em>", "", r["highlight"])

    def test_filtered_single_term_stays_zero_exchange(self, spark, tiny_index):
        """r4b: filtered single terms keep the fused plan in sharded mode —
        the filter evaluates inside the generator's ranged norm fetch
        (one read serves norms AND the filter columns)."""
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        qs = QuerySession(spark, tiny_index[0], broadcast_cap=0)
        try:
            for q, kw in [
                ("error AND role:assistant", {}),
                ("error", {"role": "assistant", "ts_min": "2025-06-01 00:00:00"}),
                ("error AND NOT role:assistant", {}),
                ("error AND role:(user OR assistant)", {}),
            ]:
                df = qs.search(q, k=10, **kw)
                plan = df._jdf.queryExecution().executedPlan().toString()
                assert "Exchange" not in plan, q
                cold = search_df(spark, tiny_index[0], q, k=10, **kw).collect()
                assert [(r["docid"], np.float32(r["score"])) for r in df.collect()] == [
                    (r["docid"], np.float32(r["score"])) for r in cold
                ], q
        finally:
            qs.close()


class TestShardLocalCoLocation:
    """r5 regression: the salted merge concatenates a (term, salt) group's
    per-shard encodings into one row whose shard_min is only the FIRST
    covered shard, so hashing merged rows on shard_min does not co-locate
    all terms' evidence for a docid — wide rare-term expansions silently
    dropped/under-scored docs whose clause evidence straddled partitions
    (warm AND cold shard-local paths alike).  Fixed by the query-time
    per-shard row split (segments.split_rows_by_shard)."""

    WIDE = ["w000*", "w00042~2", "w0004* OR w0005*", "w00042~1 OR w00055~1"]

    def test_warm_wide_expansion_rank_identity(self, spark, tiny_index, oracle):
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        for cap in (None, 0):  # broadcast mode and sharded mode
            kw = {} if cap is None else {"broadcast_cap": 0}
            qs = QuerySession(spark, tiny_index[0], **kw)
            try:
                for q in self.WIDE:
                    got = [
                        (r["docid"], np.float32(r["score"]))
                        for r in qs.search(q, k=10).collect()
                    ]
                    _assert_hits_equal(got, oracle.search(q, k=10), f"warm(cap={cap}):{q}")
            finally:
                qs.close()

    def test_split_rows_round_trip(self, spark, tiny_index):
        """Every split sub-row decodes, its docids all fall inside the
        sub-row's single shard, and the concatenation over sub-rows equals
        the unsplit row's full decode."""
        import json

        from siem_on_amazon_opensearch_service_spark.operators import segments

        idx = tiny_index[0]
        with open(os.path.join(idx, "_build.json")) as f:
            shard_size = int(json.load(f)["shard_size"])
        pdf = (
            spark.read.parquet(os.path.join(idx, "postings"))
            .filter(F.col("df") >= 2)
            .limit(400)
            .toPandas()
        )
        # a term has one row per SALT; keep single-row terms so sub-rows
        # map back to exactly one original row by term
        pdf = pdf[pdf.groupby("term")["term"].transform("size") == 1]
        assert len(pdf)
        cols = ["term", "shard_min", "docs_bytes", "tfs_bytes", "pos_bytes",
                "blk_n", "blk_first", "blk_last", "blk_doc_off", "blk_tf_off",
                "blk_pos_off"]
        split = segments.split_rows_by_shard(pdf[cols], shard_size, True)
        multi = 0
        for _, orig in pdf.iterrows():
            d0, t0 = segments.decode_docs_tfs(orig)
            subs = split[split["term"] == orig["term"]]
            parts_d, parts_t = [], []
            for _, sub in subs.iterrows():
                d, t = segments.decode_docs_tfs(sub)
                assert (d // shard_size == sub["shard_min"]).all()
                parts_d.append(d)
                parts_t.append(t)
            multi += int(len(subs) > 1)
            assert (np.concatenate(parts_d) == d0).all()
            assert (np.concatenate(parts_t) == t0).all()
        assert multi > 0  # the fixture index genuinely has multi-shard rows

    def test_warm_positions_false_multishard(
        self, spark, tiny_corpus_pdf, tmp_path_factory
    ):
        """ADVICE r5: on a positions=False index the pin-time pre-split
        kept the (empty) pos columns but split_rows_by_shard emitted
        multi-shard sub-rows without them -> KeyError('pos_bytes') on the
        first warm query.  Warm must run and match cold on such an index."""
        from siem_on_amazon_opensearch_service_spark.operators.build import build_index
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            QuerySession,
            search_df,
        )

        df = spark.createDataFrame(tiny_corpus_pdf)
        out = str(tmp_path_factory.mktemp("nopos_ms") / "idx")
        build_index(spark, df, out, n_shards=4, n_salts=2, positions=False)
        exp = [
            (r["docid"], np.float32(r["score"]))
            for r in search_df(spark, out, "error AND timeout", k=10).collect()
        ]
        for cap in (None, 0):  # broadcast mode and sharded mode
            kw = {} if cap is None else {"broadcast_cap": 0}
            qs = QuerySession(spark, out, **kw)
            try:
                assert qs._presplit  # the crash path is the pre-split listing
                got = [
                    (r["docid"], np.float32(r["score"]))
                    for r in qs.search("error AND timeout", k=10).collect()
                ]
            finally:
                qs.close()
            assert got == exp and got, f"cap={cap}"


class TestSplitCoLocationProperty:
    """Randomized geometry battery for segments.split_rows_by_shard:
    random (n_shards, n_salts) builds x random hot/rare mixed queries,
    cold AND warm results must match the frozen oracle exactly.  The
    r5 co-location bug hid behind fixed geometry (sf0.01 = 1 shard) and
    hot-term-only queries; this pins the fix across geometries."""

    def test_random_geometries(self, spark, tiny_corpus_pdf, tmp_path_factory):
        import random

        from siem_on_amazon_opensearch_service_spark.operators.build import build_index
        from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
        from siem_on_amazon_opensearch_service_spark.operators.search import QuerySession

        oracle = LuceneOracle(tiny_corpus_pdf)
        df = spark.createDataFrame(tiny_corpus_pdf)
        rnd = random.Random(20260819)
        queries = [
            "w000*",
            "w0004* OR error",
            "error AND w00042~1",
            "w00042~2",
            "(w0001* AND error) OR timeout",
            'w0003* OR "connection reset"',
        ]
        for n_shards, n_salts in [(3, 2), (8, 4), (13, 8), (5, 5)]:
            out = str(tmp_path_factory.mktemp("geom") / f"idx_{n_shards}_{n_salts}")
            build_index(spark, df, out, n_shards=n_shards, n_salts=n_salts)
            qs = QuerySession(spark, out)
            try:
                for q in rnd.sample(queries, 3):
                    exp = [
                        (h.docid, np.float32(h.score))
                        for h in oracle.search(q, k=10)
                    ]
                    cold = [
                        (r["docid"], np.float32(r["score"]))
                        for r in search_df(spark, out, q, k=10).collect()
                    ]
                    warm = [
                        (r["docid"], np.float32(r["score"]))
                        for r in qs.search(q, k=10).collect()
                    ]
                    assert cold == exp, (n_shards, n_salts, q, "cold")
                    assert warm == exp, (n_shards, n_salts, q, "warm")
            finally:
                qs.close()
