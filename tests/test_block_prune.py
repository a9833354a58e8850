"""Distributed block-max pruning gate: the plan must actually fire on the
sf0.01 corpus (tight pareto impact bounds), and the pruned distributed
path must stay rank- and score-identical to the unpruned local scorer."""

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark import entry as ent
from siem_on_amazon_opensearch_service_spark.operators import search
from siem_on_amazon_opensearch_service_spark.plans.query import parse


@pytest.fixture(scope="module")
def idx(spark):
    return ent.ensure_index(spark, "0.01")


class TestPrunePlan:
    def test_plan_fires_and_drops_ranges(self, idx):
        stats = search._load_stats(idx)
        ast = parse("error")
        leaves = search._leaves(ast)
        dfs = search._load_dfs(idx, ["error"])
        plan = search._plan_block_prune(idx, ast, leaves, dfs, stats, 10)
        assert plan is not None, "prune plan should fire for a hot term at sf0.01"
        covered = int((plan["hi"] - plan["lo"] + 1).sum())
        assert covered < 0.9 * stats["n_docs"]
        assert (plan["lo"] <= plan["hi"]).all()
        assert (plan["lo"][1:] > plan["hi"][:-1]).all()  # disjoint ascending

    def test_plan_skipped_with_filters_and_phrases(self, idx):
        stats = search._load_stats(idx)
        ast = parse('"connection reset"')
        assert (
            search._plan_block_prune(idx, ast, search._leaves(ast), {}, stats, 10) is None
        )

    @pytest.mark.parametrize("q,k", [("error", 10), ("w00042", 10), ("error OR w00042", 10)])
    def test_pruned_equals_local(self, spark, idx, q, k):
        li = search.LocalIndex(idx)
        exp = li.search(q, k=k)
        rows = search.search_df(spark, idx, q, k=k).collect()
        got = [(int(r["docid"]), np.float32(r["score"])) for r in rows]
        assert got == [(d, np.float32(s)) for d, s in exp], q


class TestTightBounds:
    def test_pareto_ub_bounds_all_achieved_scores(self, idx):
        """Per-block pareto upper bounds must dominate every achieved score
        in the block (validity) and be no looser than the legacy
        (max_tf, min_norm) bound (tightness)."""
        import duckdb

        from siem_on_amazon_opensearch_service_spark.functions import bm25
        from siem_on_amazon_opensearch_service_spark.operators import segments

        stats = search._load_stats(idx)
        dfs = search._load_dfs(idx, ["error"])
        cache = bm25.norm_inverse_cache(stats["avgdl"])
        w = bm25.clause_weight([dfs["error"]], stats["doc_count"])
        rows = duckdb.sql(
            f"SELECT * FROM read_parquet('{idx}/postings/**/*.parquet') WHERE term = 'error'"
        ).df().to_dict("records")
        norms = duckdb.sql(
            f"SELECT norm FROM read_parquet('{idx}/docs/*.parquet') ORDER BY docid"
        ).df()["norm"].to_numpy()
        checked = 0
        for r in rows:
            ubs = search._row_block_ubs(r, w, cache)
            loose = bm25.score_tf(
                np.asarray(r["blk_max_tf"], dtype=np.int64),
                np.asarray(r["blk_min_norm"], dtype=np.int64),
                w,
                cache,
            ).astype(np.float64)
            assert (ubs <= loose + 1e-12).all()
            docids, tfs = segments.decode_docs_tfs(r)
            sc = bm25.score_tf(tfs, norms[docids].astype(np.int64), w, cache).astype(np.float64)
            bounds = np.repeat(ubs, np.asarray(r["blk_n"], dtype=np.int64))
            assert (sc <= bounds + 1e-12).all()
            checked += len(docids)
        assert checked > 1000


class TestIntersectionPrune:
    def test_required_terms(self):
        for q, exp in [
            ("a AND b", {"a", "b"}),
            ("a OR b", set()),
            ("(a AND b) OR (a AND c)", {"a"}),
            ("a AND NOT b", {"a"}),
            ('"x y" AND z', {"x", "y", "z"}),
            ("a AND (b OR c)", {"a"}),
        ]:
            assert search._required_terms(parse(q)) == exp, q

    def test_plan_fires_for_hot_and_rare(self, idx):
        stats = search._load_stats(idx)
        dfs = search._load_dfs(idx, ["error", "w00042"])
        plan = search._plan_intersection_prune(idx, parse("error AND w00042"), stats, dfs)
        assert plan is not None
        covered = int((plan["hi"] - plan["lo"] + 1).sum())
        assert covered < 0.25 * stats["n_docs"]  # hot term's decode collapses

    def test_absent_required_term_yields_empty_plan(self, idx):
        stats = search._load_stats(idx)
        plan = search._plan_intersection_prune(
            idx, parse("error AND zzznosuchterm"), stats, {"error": 10000}
        )
        assert plan is not None and plan["lo"].size == 0

    @pytest.mark.parametrize(
        "q", ["error AND w00042", '"connection reset" AND error', "error AND NOT timeout"]
    )
    def test_intersection_pruned_equals_local(self, spark, idx, q):
        li = search.LocalIndex(idx)
        exp = li.search(q, k=10)
        rows = search.search_df(spark, idx, q, k=10).collect()
        got = [(int(r["docid"]), np.float32(r["score"])) for r in rows]
        assert got == [(d, np.float32(s)) for d, s in exp], q

    def test_impossible_conjunction_is_empty(self, spark, idx):
        assert search.search_df(spark, idx, "error AND zzznosuchterm", k=10).collect() == []


class TestGeneralTreePrune:
    """r3 (VERDICT r2 item 4): pruning for general boolean trees —
    per-branch structural coverage for Or-of-Ands, and theta seeding from
    sufficient terms in mixed trees like '(a AND b) OR c'."""

    def test_sufficient_terms(self):
        for q, exp in [
            ("a", {"a"}),
            ("a OR b", {"a", "b"}),
            ("(a AND b) OR c", {"c"}),
            ("(a AND b) OR (c AND d)", set()),
            ("a AND b", set()),
            ("a OR (b OR c)", {"a", "b", "c"}),
            ("a OR NOT b", {"a"}),
        ]:
            assert search._sufficient_terms(parse(q)) == exp, q

    def test_or_of_ands_coverage_fires(self, idx):
        stats = search._load_stats(idx)
        dfs = search._load_dfs(idx, ["error", "w00042", "timeout", "w00043"])
        plan = search._plan_intersection_prune(
            idx, parse("(error AND w00042) OR (timeout AND w00043)"), stats, dfs
        )
        assert plan is not None
        covered = int((plan["hi"] - plan["lo"] + 1).sum())
        # each branch collapses to its rare term's docids
        assert covered < 0.25 * stats["n_docs"]

    def test_or_branch_with_absent_term_empties_only_that_branch(self, idx):
        stats = search._load_stats(idx)
        dfs = search._load_dfs(idx, ["error", "w00042"])
        plan = search._plan_intersection_prune(
            idx, parse("(error AND zzznosuchterm) OR w00042"), stats, dfs
        )
        # left branch is provably empty; coverage = w00042's docids
        assert plan is not None and plan["lo"].size > 0
        covered = int((plan["hi"] - plan["lo"] + 1).sum())
        assert covered < 0.25 * stats["n_docs"]

    def test_theta_fires_for_mixed_or(self, idx):
        """'(rare AND rare) OR hot': theta seeds from the sufficient hot
        term, and the rare terms contribute exact singleton intervals to
        the envelope instead of corpus-spanning blocks (which would add
        their large idf bound everywhere and defeat pruning)."""
        stats = search._load_stats(idx)
        terms = ["error", "w00042", "w00043"]
        dfs = search._load_dfs(idx, terms)
        ast = parse("(w00042 AND w00043) OR error")
        plan = search._plan_block_prune(idx, ast, search._leaves(ast), dfs, stats, 10)
        assert plan is not None
        covered = int((plan["hi"] - plan["lo"] + 1).sum())
        assert covered < 0.9 * stats["n_docs"]

    def test_theta_skipped_when_hot_term_not_sufficient(self, idx):
        """'(hot AND rare) OR hot2': timeout's envelope adds everywhere a
        doc could pair it with w00042, and only 'error' can seed — the
        planner must decline rather than prune incorrectly."""
        stats = search._load_stats(idx)
        dfs = search._load_dfs(idx, ["error", "timeout", "w00042"])
        ast = parse("(timeout AND w00042) OR error")
        plan = search._plan_block_prune(idx, ast, search._leaves(ast), dfs, stats, 10)
        assert plan is None

    @pytest.mark.parametrize(
        "q",
        [
            "(error AND w00042) OR (timeout AND w00043)",
            "(timeout AND w00042) OR error",
            "(error AND NOT timeout) OR (refused AND w00042)",
            "(error AND w00042) OR zzznosuchterm",
            '("connection reset" AND error) OR w00042',
        ],
    )
    def test_general_tree_pruned_equals_local(self, spark, idx, q):
        li = search.LocalIndex(idx)
        exp = li.search(q, k=10)
        rows = search.search_df(spark, idx, q, k=10).collect()
        got = [(int(r["docid"]), np.float32(r["score"])) for r in rows]
        assert got == [(d, np.float32(s)) for d, s in exp], q


class TestCoverageRangesProperty:
    """Soundness property of the recursive structural coverage: for random
    boolean trees, EVERY doc the frozen oracle matches must fall inside
    the planner's surviving docid ranges (coverage may over-approximate,
    never under)."""

    def test_random_trees_coverage_superset_of_matches(self, spark, idx):
        import random

        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle

        pdf = pd.read_parquet("/root/repo/_generated/transcripts_sf0.01.parquet")
        oracle = LuceneOracle(pdf)
        stats = search._load_stats(idx)

        rng = random.Random(91)
        vocab = ["error", "timeout", "refused", "denied", "connection",
                 "assistant", "file", "request"] + [
            f"w{rng.randrange(3000):05d}" for _ in range(20)
        ]

        def rand_tree(depth: int) -> str:
            if depth == 0 or rng.random() < 0.4:
                return rng.choice(vocab)
            op = rng.choice(["AND", "OR"])
            parts = [rand_tree(depth - 1) for _ in range(rng.choice([2, 3]))]
            if op == "AND" and rng.random() < 0.3:
                parts.append("NOT " + rng.choice(vocab))
            return "(" + f" {op} ".join(parts) + ")"

        checked = 0
        for _ in range(30):
            q = rand_tree(2)
            ast = parse(q)
            terms = sorted({t for lf in search._leaves(ast)
                            for t in ([lf.term] if hasattr(lf, "term") else lf.terms)})
            dfs = search._load_dfs(idx, terms)
            plan = search._plan_intersection_prune(idx, ast, stats, dfs)
            if plan is None:
                continue
            checked += 1
            mask, _ = oracle._eval(ast)
            import numpy as np_

            match_docids = np_.nonzero(mask)[0].astype(np_.int64)
            if match_docids.size:
                inside = search._in_ranges(match_docids, plan["lo"], plan["hi"])
                assert inside.all(), (q, int(match_docids[~inside][0]))
        assert checked >= 5, f"only {checked} trees produced a plan — battery too weak"


class TestConjunctionTheta:
    """r3 late: theta seeding for trees with NO sufficient term ('hot AND
    hot') — candidates from the rarest required term, exact membership
    verification of every leaf term (including NOT leaves), exact engine
    totals as seeds."""

    def test_hot_and_hot_fires(self, idx):
        stats = search._load_stats(idx)
        dfs = search._load_dfs(idx, ["error", "timeout"])
        ast = parse("error AND timeout")
        plan = search._plan_block_prune(idx, ast, search._leaves(ast), dfs, stats, 10)
        assert plan is not None
        covered = int((plan["hi"] - plan["lo"] + 1).sum())
        assert covered < 0.9 * stats["n_docs"]

    def test_and_not_fires_with_not_membership(self, idx):
        """'a AND NOT b': the seeder must verify candidates do NOT contain
        b — an unverified NOT would admit non-matching docs to the seed
        pool and overshoot theta."""
        stats = search._load_stats(idx)
        dfs = search._load_dfs(idx, ["error", "timeout"])
        ast = parse("error AND NOT timeout")
        plan = search._plan_block_prune(idx, ast, search._leaves(ast), dfs, stats, 10)
        assert plan is not None
        covered = int((plan["hi"] - plan["lo"] + 1).sum())
        assert covered < 0.5 * stats["n_docs"]

    def test_conj_theta_valid_lower_bound(self, idx):
        """theta must never exceed the true k-th matching total: compare
        against the frozen oracle's sorted totals."""
        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle

        pdf = pd.read_parquet("/root/repo/_generated/transcripts_sf0.01.parquet")
        oracle = LuceneOracle(pdf)
        stats = search._load_stats(idx)
        for q, k in [("error AND timeout", 10), ("error AND NOT timeout", 10),
                     ("error AND timeout", 50)]:
            ast = parse(q)
            terms = sorted({t for lf in search._leaves(ast)
                            for t in ([lf.term] if hasattr(lf, "term") else lf.terms)})
            dfs = search._load_dfs(idx, terms)
            plan = search._plan_block_prune(idx, ast, search._leaves(ast), dfs, stats, k)
            if plan is None:
                continue
            hits = oracle.search(q, k=k)
            assert len(hits) >= k
            kth = float(hits[-1].score)
            # every oracle top-k doc must live inside the surviving ranges
            docids = np.asarray([h.docid for h in hits], dtype=np.int64)
            assert search._in_ranges(docids, plan["lo"], plan["hi"]).all(), q

    @pytest.mark.parametrize(
        "q", ["error AND timeout", "error AND NOT timeout",
              "timeout AND refused", "connection AND (error OR timeout)"]
    )
    def test_conjunction_pruned_equals_local(self, spark, idx, q):
        li = search.LocalIndex(idx)
        exp = li.search(q, k=10)
        rows = search.search_df(spark, idx, q, k=10).collect()
        got = [(int(r["docid"]), np.float32(r["score"])) for r in rows]
        assert got == [(d, np.float32(s)) for d, s in exp], q


class TestSeedPoolEmptyGuard:
    """ADVICE r5: the seed-candidate disambiguation can reject every
    chosen row (sl None for all) — the planner must return None, not
    raise ValueError from np.concatenate on an empty pool."""

    def test_all_seeds_rejected_returns_none(self, idx, monkeypatch):
        from siem_on_amazon_opensearch_service_spark.operators import segments

        stats = search._load_stats(idx)
        ast = parse("error")
        leaves = search._leaves(ast)
        dfs = search._load_dfs(idx, ["error"])
        # force every candidate row to fail the first-docid disambiguation
        monkeypatch.setattr(segments, "first_docid", lambda b: -1)
        assert (
            search._plan_block_prune(idx, ast, leaves, dfs, stats, 10) is None
        )
