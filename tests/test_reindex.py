"""reindex (r4e): rebuild an index from its own docs store with different
settings or restricted to conversations matching a DQL query — the
OpenSearch _reindex ops API over our segment layout."""

import os

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.build import build_index, reindex
from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex


class TestReindex:
    def test_full_reindex_is_search_identical(self, spark, tiny_index, tmp_path):
        dst = str(tmp_path / "re")
        st = reindex(spark, tiny_index[0], dst)
        a, b = LocalIndex(tiny_index[0]), LocalIndex(dst)
        assert a.stats == b.stats
        for q in ["error AND timeout", '"connection reset"', "w0004*"]:
            assert a.search(q, k=10) == b.search(q, k=10), q
        assert st["params"]["total_docs"] == a.stats["n_docs"]

    def test_positions_off_shrinks_and_rejects_phrases(self, spark, tiny_index, tmp_path):
        dst = str(tmp_path / "nopos")
        reindex(spark, tiny_index[0], dst, positions=False)
        a, b = LocalIndex(tiny_index[0]), LocalIndex(dst)
        assert a.search("error AND timeout", k=10) == b.search("error AND timeout", k=10)
        with pytest.raises(ValueError, match="positions"):
            b.search('"connection reset"', k=5)

        def du(d):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(os.path.join(d, "postings"))
                for f in fs
            )

        assert du(dst) < du(tiny_index[0])

    def test_query_reindex_equals_fresh_build_over_subset(
        self, spark, tiny_corpus_pdf, tiny_index, tmp_path
    ):
        """Conversation-level export: reindex(query=...) must equal a fresh
        build over exactly the matching conversations' turns."""
        q = '"connection reset" AND tool:bash'
        dst = str(tmp_path / "sub")
        reindex(spark, tiny_index[0], dst, query=q)

        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
            tokens_col,
        )

        full = spark.createDataFrame(tiny_corpus_pdf)
        pred = compile_predicate(q)
        convs = (
            full.filter(
                pred(tokens_col(F.col("text")), F.col("role"), F.col("tool"), F.col("ts"))
            )
            .select("conv_id")
            .distinct()
        )
        subset = full.join(convs, "conv_id", "left_semi")
        fresh = str(tmp_path / "fresh")
        build_index(spark, subset, fresh, n_shards=8, n_salts=4)

        a, b = LocalIndex(dst), LocalIndex(fresh)
        assert a.stats == b.stats
        for query in ["error", '"connection reset"', "timeout OR refused"]:
            assert a.search(query, k=10) == b.search(query, k=10), query
        # and the subset is smaller than the source but non-trivial
        src_docs = LocalIndex(tiny_index[0]).stats["n_docs"]
        assert 0 < a.stats["n_docs"] < src_docs

    def test_query_reindex_keeps_whole_conversations(self, spark, tiny_index, tmp_path):
        dst = str(tmp_path / "whole")
        reindex(spark, tiny_index[0], dst, query='"connection reset" AND tool:bash')
        got = spark.read.parquet(os.path.join(dst, "docs"))
        spans = got.groupBy("conv_id").agg(
            F.min("turn_idx").alias("mn"),
            F.max("turn_idx").alias("mx"),
            F.count("*").alias("n"),
        )
        bad = spans.filter(
            (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
        ).count()
        assert bad == 0


class TestForceMerge:
    def test_compacts_after_appends_and_preserves_results(
        self, spark, tiny_corpus_pdf, tmp_path
    ):
        """Grow an index with several small appends (file count per bucket
        grows), force_merge, and require (a) fewer postings files, (b)
        identical search results, (c) identical stats."""
        from siem_on_amazon_opensearch_service_spark.operators.build import force_merge
        from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
            append_batch,
        )

        convs = sorted(tiny_corpus_pdf["conv_id"].unique())
        parts = [convs[: len(convs) // 2]] + [
            convs[len(convs) // 2 + i : len(convs) // 2 + i + 3]
            for i in range(0, len(convs) - len(convs) // 2, 3)
        ]
        out = str(tmp_path / "grown")
        for i, cs in enumerate(p for p in parts if p):
            batch = tiny_corpus_pdf[tiny_corpus_pdf["conv_id"].isin(cs)]
            append_batch(spark, spark.createDataFrame(batch), out, batch_id=i)

        a = LocalIndex(out)
        before_stats = a.stats
        before_hits = {
            q: a.search(q, k=10)
            for q in ["error AND timeout", '"connection reset"', "timeout OR refused"]
        }

        r = force_merge(spark, out)
        assert r["files_after"]["postings"] < r["files_before"]["postings"]

        b = LocalIndex(out)
        assert b.stats == before_stats
        for q, want in before_hits.items():
            assert b.search(q, k=10) == want, q


class TestTurnLevelReindex:
    """scope='turn': only matching turns survive, turn_idx compacted to a
    dense rank, provenance through (conv_id, ts) text equality."""

    Q = "error AND role:assistant"

    def test_only_matching_turns_copied(self, spark, tiny_corpus_pdf, tiny_index, tmp_path):
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
            tokens_col,
        )

        dst = str(tmp_path / "turns")
        reindex(spark, tiny_index[0], dst, query=self.Q, scope="turn")
        got = spark.read.parquet(os.path.join(dst, "docs"))

        full = spark.createDataFrame(tiny_corpus_pdf)
        pred = compile_predicate(self.Q)
        want = full.filter(
            pred(tokens_col(F.col("text")), F.col("role"), F.col("tool"), F.col("ts"))
        )
        assert got.count() == want.count() > 0
        # per-turn text equality under (conv_id, ts) provenance keys
        g = {(r["conv_id"], r["ts"]): r["text"] for r in got.collect()}
        w = {(r["conv_id"], r["ts"]): r["text"] for r in want.collect()}
        assert g == w

    def test_turn_idx_compacted_dense(self, spark, tiny_index, tmp_path):
        dst = str(tmp_path / "turns2")
        reindex(spark, tiny_index[0], dst, query=self.Q, scope="turn")
        got = spark.read.parquet(os.path.join(dst, "docs"))
        spans = got.groupBy("conv_id").agg(
            F.min("turn_idx").alias("mn"),
            F.max("turn_idx").alias("mx"),
            F.count("*").alias("n"),
        )
        assert spans.filter(
            (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
        ).count() == 0
        # compaction preserves original relative order: ts ascending
        # within each conversation implies turn_idx ascending too
        from pyspark.sql import Window
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        mono = got.withColumn("prev_ts", F.lag("ts").over(w)).filter(
            F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts"))
        )
        assert mono.count() == 0

    def test_search_equals_fresh_build_over_turns(
        self, spark, tiny_corpus_pdf, tiny_index, tmp_path
    ):
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
            tokens_col,
        )
        from pyspark.sql import Window

        dst = str(tmp_path / "turns3")
        reindex(spark, tiny_index[0], dst, query=self.Q, scope="turn")

        full = spark.createDataFrame(tiny_corpus_pdf)
        pred = compile_predicate(self.Q)
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        subset = full.filter(
            pred(tokens_col(F.col("text")), F.col("role"), F.col("tool"), F.col("ts"))
        ).withColumn("turn_idx", F.row_number().over(w) - 1)
        fresh = str(tmp_path / "fresh3")
        build_index(spark, subset, fresh, n_shards=8, n_salts=4)

        a, b = LocalIndex(dst), LocalIndex(fresh)
        assert a.stats == b.stats
        for query in ["error", "timeout OR refused", '"connection reset"']:
            assert a.search(query, k=10) == b.search(query, k=10), query

    def test_bad_scope_rejected(self, spark, tiny_index, tmp_path):
        with pytest.raises(ValueError, match="scope"):
            reindex(spark, tiny_index[0], str(tmp_path / "x"), query="error",
                    scope="paragraph")
