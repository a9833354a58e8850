"""msearch_df — N DQL queries answered from ONE postings scan (the
OpenSearch ``_msearch`` request shape: a dashboard refresh fires one
query per panel).  Contract under test:

- per-query results are IDENTICAL (docids + float32 scores) to running
  each query through ``search_df`` separately — cold, warm (broadcast)
  and sharded-warm QuerySession modes;
- the DuckDB UNION-ALL oracle (``sqloracle.msearch_sql``) value-matches;
- the shared decode is pruned to the UNION of per-query coverage ranges
  (results unchanged with pruning active vs disabled);
- the batch genuinely shares work: one postings scan / one decode stage
  in the executed plan, regardless of batch size.
"""

import re

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators import sqloracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    QuerySession,
    msearch_df,
    search_df,
)

# every distributed-path query shape in one batch: plain/AND/OR-NOT
# trees, phrases (slot decode + resolution), shared leaves across
# queries ('error' and 'timeout' each appear in several), boosts
# (multiplicity fold), DQL field + time filters, and wildcard expansion
BATCH = {
    "plain": "error",
    "conj": "error AND timeout",
    "or_not": "(error OR refused) AND NOT retry",
    "phrase": '"connection reset"',
    "boosted": "error^2 OR timeout",
    "filtered": "error AND role:assistant",
    "wild": "err* AND connection",
}


def _per_query(spark, idx, queries, k=10):
    return {
        qid: [
            (r["docid"], np.float32(r["score"]))
            for r in search_df(spark, idx, q, k=k).collect()
        ]
        for qid, q in queries.items()
    }


def _grouped(rows):
    out = {}
    for r in rows:
        out.setdefault(r["qid"], []).append((r["docid"], np.float32(r["score"])))
    return out


class TestMsearchVsPerQuery:
    def test_cold_matches_search_df(self, spark, tiny_index):
        idx, _ = tiny_index
        got = _grouped(msearch_df(spark, idx, BATCH, k=10).collect())
        exp = _per_query(spark, idx, BATCH, k=10)
        assert set(got) <= set(BATCH)
        for qid in BATCH:
            assert got.get(qid, []) == exp[qid], qid

    def test_prune_disabled_identical(self, spark, tiny_index):
        """Union-coverage pruning must be invisible in the values: k=None
        disables the prune planner (and the top-k window), so comparing
        its top-k re-sort against the pruned k=10 run exercises both."""
        idx, _ = tiny_index
        pruned = _grouped(msearch_df(spark, idx, BATCH, k=10).collect())
        full = _grouped(msearch_df(spark, idx, BATCH, k=None).collect())
        for qid in pruned:
            top = sorted(full[qid], key=lambda h: (-h[1], h[0]))[: len(pruned[qid])]
            assert pruned[qid] == top, qid

    def test_single_query_batch(self, spark, tiny_index):
        idx, _ = tiny_index
        got = _grouped(msearch_df(spark, idx, {"only": "error AND timeout"}).collect())
        exp = _per_query(spark, idx, {"only": "error AND timeout"})
        assert got["only"] == exp["only"]

    def test_empty_match_query_in_batch(self, spark, tiny_index):
        """A query matching nothing yields no rows for its qid and leaves
        the rest of the batch untouched."""
        idx, _ = tiny_index
        batch = {"hit": "error", "miss": "zzzqqqxyzzy"}
        got = _grouped(msearch_df(spark, idx, batch, k=10).collect())
        assert "miss" not in got
        assert got["hit"] == _per_query(spark, idx, {"hit": "error"})["hit"]

    def test_rejects_bad_args(self, spark, tiny_index):
        idx, _ = tiny_index
        with pytest.raises(ValueError, match="at least one"):
            msearch_df(spark, idx, {})
        with pytest.raises(ValueError, match="positive int"):
            msearch_df(spark, idx, {"a": "error"}, k=0)
        with pytest.raises(ValueError, match="positive"):
            msearch_df(spark, idx, {"bad": "NOT error", "ok": "error"})


class TestMsearchOracle:
    def test_sql_oracle_values(self, spark, tiny_index, tiny_corpus_pdf, tmp_path):
        idx, _ = tiny_index
        p = str(tmp_path / "corpus.parquet")
        tiny_corpus_pdf.to_parquet(p)
        # the SQL renderer has no dictionary, so wildcard atoms render as
        # grouped term-set CTEs — keep the oracle batch wildcard-free to
        # compare the plain scoring surface (wildcards covered above)
        batch = {k: v for k, v in BATCH.items() if k != "wild"}
        got = [
            (q, int(d), float(s))
            for q, d, s in duckdb.sql(sqloracle.msearch_sql(p, batch, k=10)).fetchall()
        ]
        rows = msearch_df(spark, idx, batch, k=10).collect()
        eng = [
            (r["qid"], int(r["docid"]), round(float(np.float32(r["score"])), 3))
            for r in rows
        ]
        assert sorted(eng) == sorted(got)


class TestMsearchWarm:
    def test_warm_broadcast_mode(self, spark, tiny_index):
        idx, _ = tiny_index
        exp = _per_query(spark, idx, BATCH, k=10)
        sess = QuerySession(spark, idx)
        try:
            got = _grouped(sess.msearch(BATCH, k=10).collect())
            for qid in BATCH:
                assert got.get(qid, []) == exp[qid], qid
            # second call reuses the memoized prune/expansion state
            again = _grouped(sess.msearch(BATCH, k=10).collect())
            assert again == got
        finally:
            sess.close()

    def test_warm_sharded_mode(self, spark, tiny_index):
        idx, _ = tiny_index
        exp = _per_query(spark, idx, BATCH, k=10)
        sess = QuerySession(spark, idx, broadcast_cap=0)
        try:
            assert sess.sharded
            got = _grouped(sess.msearch(BATCH, k=10).collect())
            for qid in BATCH:
                assert got.get(qid, []) == exp[qid], qid
        finally:
            sess.close()


class TestMsearchPlan:
    def test_one_decode_stage(self, spark, tiny_index):
        """The whole batch must share ONE postings decode: the Python-stage
        count must not grow with the number of queries riding the batch
        (r6 fused shard-local plan: one per-shard split pass + one decode/
        score generator — a fixed 2 on multi-shard indexes — vs 2 per
        query if the batch were planned per panel)."""
        idx, _ = tiny_index

        def n_python_stages(batch):
            plan = (
                msearch_df(spark, idx, batch, k=10)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            return len(re.findall(r"MapInPandas|MapInArrow", plan))

        one = n_python_stages({"a": "error"})
        three = n_python_stages(
            {"a": "error", "b": "error AND timeout", "c": "refused OR timeout"}
        )
        assert one <= 2
        assert three == one, "decode stages must not scale with batch size"

    def test_random_batches_vs_per_query(self, spark, tiny_index):
        """Randomized batch composition: leaves shared across queries in
        every combination must not cross-contaminate scores."""
        idx, _ = tiny_index
        rng = np.random.default_rng(7)
        pool = [
            "error",
            "timeout",
            "error AND timeout",
            "error OR refused",
            '"connection reset"',
            "connection AND (error OR NOT timeout)",
            "timeout OR (error AND timeout)",
            "error^2 OR refused",
            "error AND role:assistant",
        ]
        for trial in range(4):
            picks = rng.choice(len(pool), size=4, replace=False)
            batch = {f"q{i}": pool[j] for i, j in enumerate(picks)}
            got = _grouped(msearch_df(spark, idx, batch, k=8).collect())
            exp = _per_query(spark, idx, batch, k=8)
            for qid in batch:
                assert got.get(qid, []) == exp[qid], (trial, qid, batch[qid])
