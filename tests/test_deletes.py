"""Soft deletes: _delete_by_query tombstones, live search (pre-merge
Lucene semantics), and expunge (physical merge with stable docids)."""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import deletes as dl
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    search_df,
)

DELQ = "timeout"
Q = "error OR timeout"


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("deletes") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


@pytest.fixture(scope="module")
def del_index(spark, tiny_index, tmp_path_factory):
    """A private copy of the tiny index with 'timeout' docs tombstoned."""
    src, _ = tiny_index
    out = str(tmp_path_factory.mktemp("del") / "index")
    shutil.copytree(src, out)
    info = dl.delete_by_query(spark, out, DELQ)
    assert info["deleted"] > 0
    yield out, info
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def xp_index(spark, del_index, tmp_path_factory):
    """The deleted copy, expunged (physical merge)."""
    src, _ = del_index
    out = str(tmp_path_factory.mktemp("xp") / "index")
    shutil.copytree(src, out)
    info = dl.expunge_deletes(spark, out)
    yield out, info
    shutil.rmtree(out, ignore_errors=True)


def _pairs(df):
    rows = df.select(
        "docid", F.round(F.col("score").cast("double"), 3).alias("s")
    ).collect()
    return [(int(r["docid"]), float(r["s"])) for r in rows]


class TestDeleteByQueryIndexPath:
    """r6: delete_by_query resolves its match set from the postings
    (match_docids_df) instead of a full docs-text scan.  The tombstone
    SET and counts must be identical to the percolator scan for every
    shape the posting algebra covers, and the uncovered shapes
    (pure-negative, NOT outside AND) must still work via the scan."""

    SHAPES = [
        "timeout",
        "error AND timeout",
        "error OR refused",
        "error AND NOT timeout",
        "error AND role:assistant",
        '"connection reset"',
        "w0004*",
        "NOT error",           # pure-negative: algebra refuses -> scan
        "error OR NOT timeout",  # NOT outside AND: algebra refuses -> scan
    ]

    @pytest.mark.parametrize("q", SHAPES)
    def test_index_path_matches_scan_path(
        self, spark, tiny_index, tmp_path_factory, q, monkeypatch
    ):
        src, _ = tiny_index
        a = str(tmp_path_factory.mktemp("dqa") / "index")
        b = str(tmp_path_factory.mktemp("dqb") / "index")
        shutil.copytree(src, a)
        shutil.copytree(src, b)
        try:
            ia = dl.delete_by_query(spark, a, q)
            from siem_on_amazon_opensearch_service_spark.operators import search as se

            def _refuse(*args, **kwargs):
                raise ValueError("forced scan path")

            monkeypatch.setattr(se, "match_docids_df", _refuse)
            ib = dl.delete_by_query(spark, b, q)
            assert ia == ib, q
            ta = set() if dl.deleted_docids(spark, a) is None else {
                r["docid"] for r in dl.deleted_docids(spark, a).collect()
            }
            tb = set() if dl.deleted_docids(spark, b) is None else {
                r["docid"] for r in dl.deleted_docids(spark, b).collect()
            }
            assert ta == tb, q
        finally:
            shutil.rmtree(a, ignore_errors=True)
            shutil.rmtree(b, ignore_errors=True)


def _files(d):
    return sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )


class TestDeleteByQuery:
    def test_idempotent(self, spark, del_index):
        idx, info = del_index
        before = _files(os.path.join(idx, dl.DELETES_SUBDIR))
        again = dl.delete_by_query(spark, idx, DELQ)
        assert again["deleted"] == 0
        assert again["total_tombstones"] == info["total_tombstones"]
        assert _files(os.path.join(idx, dl.DELETES_SUBDIR)) == before

    def test_pure_negative_delete_valid(self, spark, tiny_index, tmp_path_factory):
        """Deletion is filter context over a scan, so NOT-only queries
        are legal (OpenSearch accepts must_not in _delete_by_query) —
        unlike search_df, which needs positive postings coverage."""
        out = str(tmp_path_factory.mktemp("neg") / "index")
        shutil.copytree(tiny_index[0], out)
        try:
            total = spark.read.parquet(os.path.join(out, "docs")).count()
            n_err = dl.delete_by_query(spark, out, "error")["deleted"]
            # tombstone the complement too: everything is now deleted
            info = dl.delete_by_query(spark, out, "NOT error")
            assert info["total_tombstones"] == total
            assert info["deleted"] == total - n_err
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def test_tombstones_match_percolator_set(self, spark, del_index, tiny_index):
        idx, info = del_index
        # tombstones == docs whose token set contains the term
        docs = spark.read.parquet(os.path.join(tiny_index[0], "docs"))
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
            tokens_col,
        )

        pred = compile_predicate(DELQ)
        exp = {
            r["docid"]
            for r in docs.filter(
                pred(tokens_col(F.col("text")), F.col("role"), F.col("tool"), F.col("ts"))
            ).select("docid").collect()
        }
        got = {
            r["docid"] for r in dl.deleted_docids(spark, idx).collect()
        }
        assert got == exp and len(got) == info["total_tombstones"]


class TestLiveSearch:
    def test_excludes_deleted_scores_unchanged(self, spark, tiny_index, del_index):
        """THEOREM: live top-k == tombstone-blind full match set, python-
        filtered by the tombstones, ranked (score desc, docid asc)."""
        idx, _ = del_index
        dels = {r["docid"] for r in dl.deleted_docids(spark, idx).collect()}
        # rank on the RAW float32 score (the engine's sort key), round
        # only for the comparison — 3dp rounding can tie distinct raws
        full = [
            (int(r["docid"]), float(np.float32(r["score"])))
            for r in search_df(spark, tiny_index[0], Q, k=None).collect()
        ]
        exp = [
            (d, round(s, 3))
            for d, s in sorted(
                [(d, s) for d, s in full if d not in dels],
                key=lambda t: (-t[1], t[0]),
            )[:10]
        ]
        got = _pairs(dl.search_live_df(spark, idx, Q, k=10))
        assert got == exp
        assert dels & {d for d, _ in got} == set()

    def test_live_pruned_shapes_match_reference(self, spark, tiny_index, del_index):
        """The pruned live plan == python-filtered unpruned reference for
        every prunable query shape, including ones whose natural top-k is
        dominated by tombstoned docs (the delete term itself in an OR)."""
        idx, _ = del_index
        dels = {r["docid"] for r in dl.deleted_docids(spark, idx).collect()}
        for q in ["error", "timeout OR refused OR denied",
                  "error AND refused", "(error AND refused) OR denied"]:
            full = [
                (int(r["docid"]), float(np.float32(r["score"])))
                for r in search_df(spark, tiny_index[0], q, k=None).collect()
            ]
            exp = [
                (d, round(s, 3))
                for d, s in sorted(
                    [(d, s) for d, s in full if d not in dels],
                    key=lambda t: (-t[1], t[0]),
                )[:10]
            ]
            got = _pairs(dl.search_live_df(spark, idx, q, k=10))
            assert got == exp, q

    def test_live_prune_plan_engages(self, spark, del_index):
        """Tombstones must not silently disable an engaging planner —
        except when every seed is tombstoned (all matches deleted), where
        declining is the correct exact answer."""
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            _leaves,
            _load_dfs,
            _load_stats,
            _plan_block_prune,
        )
        from siem_on_amazon_opensearch_service_spark.plans.query import parse

        idx, _ = del_index
        xdir = os.path.join(idx, dl.DELETES_SUBDIR)
        stats = _load_stats(idx)

        def plans(q):
            ast = parse(q)
            leaves = _leaves(ast)
            dfs = _load_dfs(idx, sorted({lf.term for lf in leaves}))
            base = _plan_block_prune(idx, ast, leaves, dfs, stats, 10)
            excl = _plan_block_prune(idx, ast, leaves, dfs, stats, 10,
                                     exclude_dir=xdir)
            return base, excl

        # 'error' matches are mostly live: exclusion keeps whatever the
        # base planner decided (engaged stays engaged)
        base, excl = plans("error")
        assert base is None or excl is not None
        # every 'timeout' match is tombstoned: no live seeds can exist,
        # the planner must decline rather than emit a bogus theta
        _, excl_dead = plans(DELQ)
        assert excl_dead is None

    def test_matches_sql_oracle(self, spark, del_index, parquet):
        idx, _ = del_index
        got = _pairs(dl.search_live_df(spark, idx, Q, k=10))
        exp = [
            (int(d), float(s))
            for d, s in duckdb.sql(dl.live_bm25_sql(parquet, Q, DELQ, k=10)).fetchall()
        ]
        assert got == exp

    def test_no_tombstones_is_plain_search(self, spark, tiny_index):
        got = _pairs(dl.search_live_df(spark, tiny_index[0], Q, k=10))
        exp = _pairs(search_df(spark, tiny_index[0], Q, k=10))
        assert got == exp

    def test_delete_everything_matching(self, spark, del_index):
        idx, _ = del_index
        assert dl.search_live_df(spark, idx, DELQ, k=10).count() == 0

    def test_warm_session_live(self, spark, del_index):
        """Warm live == cold live for the fused single-term path (anti-
        join after in-generator scoring) AND the multi-clause path (r5:
        shard-local with the broadcast tombstone set fused before the
        per-partition top-k)."""
        idx, _ = del_index
        sess = QuerySession(spark, idx)
        try:
            warm = _pairs(dl.search_live_df(spark, idx, Q, k=10, session=sess))
            warm_t = _pairs(dl.search_live_df(spark, idx, "error", k=10, session=sess))
            warm_a = _pairs(dl.search_live_df(
                spark, idx, "error AND refused", k=10, session=sess))
        finally:
            sess.close()
        assert warm == _pairs(dl.search_live_df(spark, idx, Q, k=10))
        assert warm_t == _pairs(dl.search_live_df(spark, idx, "error", k=10))
        assert warm_a == _pairs(dl.search_live_df(spark, idx, "error AND refused", k=10))

    def test_warm_live_multiclause_stays_shard_local(self, spark, del_index):
        """r5 (r4 verdict item 5): warm live multi-clause/phrase queries
        keep the fused shard-local plan — tombstones drop inside the
        generator via the session's broadcast, so the plan has NO
        anti-join and exactly ONE exchange — and results equal cold live
        for every shape."""
        idx, _ = del_index
        sess = QuerySession(spark, idx)
        try:
            for q in [Q, "error AND refused", '"connection reset"',
                      "(error AND NOT refused) OR denied"]:
                df = dl.search_live_df(spark, idx, q, k=10, session=sess)
                plan = df._jdf.queryExecution().executedPlan().toString()
                assert "LeftAnti" not in plan, q
                assert plan.count("Exchange") == 1, (q, plan)
                assert _pairs(df) == _pairs(dl.search_live_df(spark, idx, q, k=10)), q
        finally:
            sess.close()

    def test_cold_live_multiclause_stays_shard_local(
        self, spark, del_index, monkeypatch
    ):
        """r6: the COLD live path broadcasts the tombstone array too, so
        multi-clause live queries keep the fused shard-local plan (no
        LeftAnti, one Exchange) — and the results equal the anti-join
        plan (forced via EXCLUDE_BROADCAST_CAP=0)."""
        from siem_on_amazon_opensearch_service_spark.operators import search as se

        idx, _ = del_index
        for q in [Q, "error AND refused", '"connection reset"',
                  "(error AND NOT refused) OR denied"]:
            df = dl.search_live_df(spark, idx, q, k=10)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "LeftAnti" not in plan, q
            assert plan.count("Exchange") == 1, (q, plan)
            fused = _pairs(df)
            monkeypatch.setattr(se, "EXCLUDE_BROADCAST_CAP", -1)
            try:
                anti = dl.search_live_df(spark, idx, q, k=10)
                assert "LeftAnti" in anti._jdf.queryExecution().executedPlan().toString()
                assert fused == _pairs(anti), q
            finally:
                monkeypatch.setattr(
                    se, "EXCLUDE_BROADCAST_CAP", 10_000_000
                )

    def test_warm_live_sharded_mode(self, spark, del_index):
        """Past the norms broadcast cap (broadcast_cap=0) the tombstone
        broadcast is independent: warm live multi-clause still runs and
        matches cold live."""
        idx, _ = del_index
        sess = QuerySession(spark, idx, broadcast_cap=0)
        try:
            got = _pairs(dl.search_live_df(spark, idx, Q, k=10, session=sess))
        finally:
            sess.close()
        assert got == _pairs(dl.search_live_df(spark, idx, Q, k=10))

    def test_warm_live_past_exclude_cap_falls_back(
        self, spark, del_index, monkeypatch
    ):
        """A tombstone set past EXCLUDE_BROADCAST_CAP must not broadcast:
        the session returns no bc and the multi-clause plan falls back to
        the cold anti-join — same results."""
        from siem_on_amazon_opensearch_service_spark.operators import search as se

        idx, _ = del_index
        monkeypatch.setattr(se, "EXCLUDE_BROADCAST_CAP", 0)
        sess = QuerySession(spark, idx)
        try:
            df = dl.search_live_df(spark, idx, Q, k=10, session=sess)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "LeftAnti" in plan  # the fallback anti-join IS present
            assert _pairs(df) == _pairs(dl.search_live_df(spark, idx, Q, k=10))
        finally:
            sess.close()

    def test_warm_prune_memo_not_stale_after_more_deletes(
        self, spark, tiny_index, tmp_path_factory
    ):
        """REGRESSION (r4 advice): the prune-plan memo keyed on the
        tombstone-log PATH only.  A warm session that searches, then
        appends more tombstones via delete_by_query, then searches again
        got a memo hit whose theta was seeded against the OLD (smaller)
        tombstone set — the stale theta can exceed the new live k-th
        total, the block sweep cuts the replacement docs, and the
        anti-join cannot restore them: silently short/missing results.
        The memo key now fingerprints the tombstone file listing."""
        out = str(tmp_path_factory.mktemp("stale") / "index")
        shutil.copytree(tiny_index[0], out)
        sess = QuerySession(spark, out)
        try:
            # round 1: some tombstones, then a pruned live query seeds
            # the memo against THIS tombstone set
            assert dl.delete_by_query(spark, out, "timeout")["deleted"] > 0
            first = _pairs(dl.search_live_df(spark, out, Q, k=5, session=sess))
            assert first  # non-degenerate
            # round 2: grow the log — docs in/near the live top-k vanish,
            # so the fresh live top-5 needs docs BELOW the old frontier
            # (exactly what a replayed stale theta would have cut)
            assert dl.delete_by_query(spark, out, "refused")["deleted"] > 0
            warm2 = _pairs(dl.search_live_df(spark, out, Q, k=5, session=sess))
            cold2 = _pairs(dl.search_live_df(spark, out, Q, k=5))
            assert warm2 == cold2
        finally:
            sess.close()
            shutil.rmtree(out, ignore_errors=True)


class TestExpunge:
    def test_stats_shrink_and_tombstones_cleared(self, spark, tiny_index, del_index, xp_index):
        idx, info = xp_index
        assert not dl.has_deletes(idx)
        n_del = del_index[1]["total_tombstones"]
        assert info["expunged"] == n_del
        full = spark.read.parquet(os.path.join(tiny_index[0], "docs")).count()
        assert info["n_docs"] == full - n_del

    def test_partials_rewritten_from_survivors(self, spark, del_index, xp_index):
        """partials are the canonical re-derivation source (crash recovery
        and build resume rebuild postings from them) — expunge must leave
        them survivor-only, neither stale nor missing."""
        from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
            _refresh_postings_dict_full,
        )

        idx, _ = xp_index
        assert os.path.exists(os.path.join(idx, "partials"))
        dels = {r["docid"] for r in dl.deleted_docids(spark, del_index[0]).collect()}
        before = _pairs(search_df(spark, idx, Q, k=10))
        # the recovery slow path (rebuild postings+dict from partials)
        # must reproduce the expunged store exactly
        _refresh_postings_dict_full(spark, idx)
        assert _pairs(search_df(spark, idx, Q, k=10)) == before
        assert not dels & {d for d, _ in before}

    def test_append_after_expunge(self, spark, xp_index, tiny_corpus_pdf, tmp_path_factory):
        """Streaming appends keep working on an expunged store: new docids
        continue from the ORIGINAL docid space (stable-key contract), and
        the appended docs are searchable alongside survivors."""
        import json as _json

        from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
            append_batch,
        )

        out = str(tmp_path_factory.mktemp("xpa") / "index")
        shutil.copytree(xp_index[0], out)
        try:
            with open(os.path.join(out, "_build.json")) as f:
                base = _json.load(f)["total_docs"]
            batch = pd.DataFrame(
                {
                    "conv_id": ["zz_new_conv"] * 2,
                    "turn_idx": [0, 1],
                    "role": ["user", "assistant"],
                    "text": ["totally novel timeout words", "error timeout zz"],
                    "tool": [None, "grep"],
                    "ts": [pd.Timestamp("2025-07-01 00:00:00"),
                           pd.Timestamp("2025-07-01 00:01:00")],
                }
            )
            r = append_batch(spark, spark.createDataFrame(batch), out, batch_id=7)
            assert r["appended"] == 2
            ids = {
                row["docid"]
                for row in search_df(spark, out, "zz", k=5).collect()
            }
            assert ids and all(d >= base for d in ids)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def test_second_cycle_expunged_count(self, spark, xp_index, tmp_path_factory):
        """REGRESSION (r4 advice): 'expunged' was computed against
        _build.json total_docs, which is the docid-SPACE size and never
        shrinks — a second delete->expunge cycle re-counted the first
        cycle's holes.  The count now diffs the pre-expunge live n_docs
        from the stats store."""
        out = str(tmp_path_factory.mktemp("xp2") / "index")
        shutil.copytree(xp_index[0], out)
        try:
            live_before = spark.read.parquet(os.path.join(out, "docs")).count()
            info_d = dl.delete_by_query(spark, out, "refused")
            assert info_d["deleted"] > 0
            info_x = dl.expunge_deletes(spark, out)
            assert info_x["expunged"] == info_d["total_tombstones"]
            assert info_x["n_docs"] == live_before - info_d["total_tombstones"]
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def test_interrupted_swap_rolls_forward(
        self, spark, tiny_index, monkeypatch, tmp_path_factory
    ):
        """REGRESSION (r4 advice): a crash mid-swap (after some stores
        replaced, before others) left survivor docs beside pre-expunge
        partials with no recovery trigger.  Expunge now writes a swap
        marker before the replace loop; complete_expunge_swap (invoked by
        has_deletes, expunge resume, and streaming recovery) rolls the
        swap forward to the exact full-expunge state."""
        ref = str(tmp_path_factory.mktemp("xpr") / "index")
        out = str(tmp_path_factory.mktemp("xpc") / "index")
        shutil.copytree(tiny_index[0], ref)
        shutil.copytree(tiny_index[0], out)
        try:
            dl.delete_by_query(spark, ref, DELQ)
            exp_info = dl.expunge_deletes(spark, ref)
            exp_hits = _pairs(search_df(spark, ref, Q, k=10))

            dl.delete_by_query(spark, out, DELQ)
            real_replace = os.replace
            calls = {"n": 0}

            def crashing_replace(src, dst):
                # call 1 = the marker commit; call 2 = the first store
                # (partials); crash before the second store swaps
                if calls["n"] >= 2 and dst.startswith(out):
                    raise OSError("simulated crash mid-swap")
                if dst.startswith(out):
                    calls["n"] += 1
                return real_replace(src, dst)

            monkeypatch.setattr(dl.os, "replace", crashing_replace)
            with pytest.raises(OSError, match="simulated crash"):
                dl.expunge_deletes(spark, out)
            monkeypatch.setattr(dl.os, "replace", real_replace)

            assert os.path.exists(os.path.join(out, dl.SWAP_MARKER))
            # half-swapped: partials are new, docs/postings still old
            assert os.path.isdir(os.path.join(out, "docs_xp"))
            # the tombstone read path rolls the swap forward
            assert not dl.has_deletes(out)
            assert not os.path.exists(os.path.join(out, dl.SWAP_MARKER))
            assert not os.path.isdir(os.path.join(out, "docs_xp"))
            assert _pairs(search_df(spark, out, Q, k=10)) == exp_hits
            st = spark.read.parquet(os.path.join(out, "stats")).collect()[0]
            assert int(st["n_docs"]) == exp_info["n_docs"]
            # idempotent second call
            assert not dl.complete_expunge_swap(out)
        finally:
            shutil.rmtree(ref, ignore_errors=True)
            shutil.rmtree(out, ignore_errors=True)

    def test_deleted_docids_gone_from_store(self, spark, del_index, xp_index):
        idx, _ = xp_index
        dels = {r["docid"] for r in dl.deleted_docids(spark, del_index[0]).collect()}
        docs_ids = {
            r["docid"]
            for r in spark.read.parquet(os.path.join(idx, "docs")).select("docid").collect()
        }
        assert dels & docs_ids == set()

    def test_docids_stable_text_equal(self, spark, tiny_index, xp_index):
        idx, _ = xp_index
        old = {
            r["docid"]: r["text"]
            for r in spark.read.parquet(os.path.join(tiny_index[0], "docs")).collect()
        }
        for r in spark.read.parquet(os.path.join(idx, "docs")).collect():
            assert old[r["docid"]] == r["text"]

    def test_matches_survivor_oracle(self, spark, xp_index, parquet):
        idx, _ = xp_index
        got = _pairs(search_df(spark, idx, Q, k=10))
        exp = [
            (int(d), float(s))
            for d, s in duckdb.sql(
                dl.expunged_bm25_sql(parquet, Q, DELQ, k=10)
            ).fetchall()
        ]
        assert got == exp

    def test_localindex_hole_tolerant(self, spark, xp_index):
        idx, _ = xp_index
        li = LocalIndex(idx)
        exp = _pairs(search_df(spark, idx, Q, k=10))
        got = [(int(d), round(float(s), 3)) for d, s in li.search(Q, k=10)]
        assert got == exp

    def test_warm_equals_cold_on_expunged(self, spark, xp_index):
        idx, _ = xp_index
        sess = QuerySession(spark, idx)
        try:
            warm = _pairs(sess.search("error AND timeout", k=10))
            warm_f = _pairs(sess.search(Q, k=10, role="assistant"))
        finally:
            sess.close()
        cold = _pairs(search_df(spark, idx, "error AND timeout", k=10))
        cold_f = _pairs(search_df(spark, idx, Q, k=10, role="assistant"))
        assert warm == cold and warm_f == cold_f

    def test_sharded_warm_on_expunged(self, spark, xp_index):
        """Past the broadcast cap the session resolves norms/filters from
        per-shard ranged reads — those scatter over docid holes too."""
        idx, _ = xp_index
        sess = QuerySession(spark, idx, broadcast_cap=0)
        try:
            assert sess.sharded
            warm = _pairs(sess.search(Q, k=10))
            warm_t = _pairs(sess.search("error", k=10, role="assistant"))
        finally:
            sess.close()
        assert warm == _pairs(search_df(spark, idx, Q, k=10))
        assert warm_t == _pairs(search_df(spark, idx, "error", k=10, role="assistant"))

    def test_expunge_noop_when_clean(self, spark, tiny_index, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("clean") / "index")
        shutil.copytree(tiny_index[0], out)
        try:
            info = dl.expunge_deletes(spark, out)
            assert info["expunged"] == 0
        finally:
            shutil.rmtree(out, ignore_errors=True)


class TestOracleShapes:
    def test_delete_query_shape_rejected(self):
        with pytest.raises(ValueError):
            dl.live_bm25_sql("x.parquet", Q, '"connection reset"')
        with pytest.raises(ValueError):
            dl.live_bm25_sql("x.parquet", Q, "error AND timeout")

    def test_or_of_terms_accepted(self, parquet):
        sql = dl.live_bm25_sql(parquet, "error", "timeout OR refused")
        assert "delset" in sql and duckdb.sql(sql) is not None


class TestDocidIndexed:
    def test_dense_identity_and_holes(self):
        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators.search import (
            _docid_indexed,
        )

        dense = pd.DataFrame(
            {"docid": [0, 1, 2], "norm": [3, 4, 5], "role": ["a", "b", "c"]}
        )
        a = _docid_indexed(dense, ["norm", "role"])
        assert a["norm"].dtype == np.uint8 and list(a["norm"]) == [3, 4, 5]
        holey = pd.DataFrame(
            {"docid": [0, 2, 5], "norm": [3, 4, 5], "role": ["a", "b", "c"],
             "ts": pd.to_datetime(["2025-01-01", "2025-01-02", "2025-01-03"])}
        )
        b = _docid_indexed(holey, ["norm", "role", "ts"])
        assert len(b["norm"]) == 6
        assert b["norm"][2] == 4 and b["norm"][1] == 0
        assert b["role"][5] == "c" and b["role"][3] is None
        assert np.isnat(b["ts"][1]) and not np.isnat(b["ts"][2])
        with pytest.raises(ValueError):
            _docid_indexed(
                pd.DataFrame({"docid": [1, 1], "norm": [1, 2]}), ["norm"]
            )


class TestDecodeRebuildEquivalence:
    """r6: expunge rebuilds partials by decoding the existing postings
    and re-assembling the surviving entries (no re-tokenize).  The
    decode path must produce the SAME row set (every column, bytes
    included) as the tokenize-from-survivors path, and expunge must fall
    back cleanly past the broadcast caps."""

    def _canon(self, df):
        pdf = df.toPandas()
        def key(row):
            return (row["term"], int(row["salt"]), int(row["shard_min"]),
                    bytes(row["docs_bytes"]))
        rows = sorted(pdf.to_dict("records"), key=key)
        out = []
        for r in rows:
            out.append(tuple(
                bytes(v) if isinstance(v, (bytes, bytearray)) else
                tuple(np.asarray(v).tolist()) if hasattr(v, "__len__") and not isinstance(v, str) else v
                for v in (r[c] for c in sorted(r))
            ))
        return out

    def test_partials_row_set_identical(self, spark, del_index):
        import json

        idx, _ = del_index
        with open(os.path.join(idx, "_build.json")) as f:
            params = json.load(f)
        dels = dl.deleted_docids(spark, idx)
        assert dels is not None
        survivors = spark.read.parquet(os.path.join(idx, "docs")).join(
            dels, "docid", "left_anti"
        )
        from siem_on_amazon_opensearch_service_spark.operators.build import (
            _partials_stage,
        )

        decode, prepart = dl._survivor_partials(
            spark, idx, dels, params, survivors,
            params["positions"], params["n_salts"],
        )
        assert prepart  # decode path: no (term, salt) reshuffle needed
        tokenize = _partials_stage(
            survivors, params["positions"], params["n_salts"]
        )
        assert self._canon(decode) == self._canon(tokenize)

    def test_fallback_past_caps(self, spark, del_index, monkeypatch):
        import json

        idx, _ = del_index
        with open(os.path.join(idx, "_build.json")) as f:
            params = json.load(f)
        dels = dl.deleted_docids(spark, idx)
        survivors = spark.read.parquet(os.path.join(idx, "docs")).join(
            dels, "docid", "left_anti"
        )
        monkeypatch.setattr(dl, "EXPUNGE_DECODE_DELS_CAP", 0)
        fb, prepart = dl._survivor_partials(
            spark, idx, dels, params, survivors,
            params["positions"], params["n_salts"],
        )
        # row-set equality decode==tokenize is proven above; past the cap
        # the tokenize stage must engage and still yield the partials
        assert not prepart
        assert fb.count() > 0
