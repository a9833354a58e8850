"""Incremental/streaming index maintenance + multimodal plumbing tests."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.build import build_index
from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex
from siem_on_amazon_opensearch_service_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
    append_batch,
    incremental_index_stream,
)

QUERIES = ["error", "error AND timeout", '"connection reset"', "timeout OR refused"]


class TestIncrementalAppend:
    def test_append_equals_oneshot(self, spark, tiny_corpus_pdf, tmp_path):
        """Index grown in two appends answers every query identically to a
        one-shot build over the same rows (scores depend on content+stats,
        not segment layout)."""
        convs = sorted(tiny_corpus_pdf["conv_id"].unique())
        cut = convs[len(convs) // 2]
        first = tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] < cut]
        second = tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] >= cut]

        oneshot = str(tmp_path / "oneshot")
        build_index(spark, spark.createDataFrame(tiny_corpus_pdf), oneshot, n_shards=8, n_salts=4)

        grown = str(tmp_path / "grown")
        build_index(spark, spark.createDataFrame(first), grown, n_shards=8, n_salts=4)
        r = append_batch(spark, spark.createDataFrame(second), grown)
        assert r["appended"] == len(second)
        assert r["total_docs"] == len(tiny_corpus_pdf)

        a, b = LocalIndex(oneshot), LocalIndex(grown)
        assert a.stats == b.stats
        # NOTE: docids differ between the two (different insertion order),
        # but per-(conv,turn) scores must match; compare via conv/turn keys
        import duckdb

        def keyed(idx, path, q):
            hits = idx.search(q, k=15)
            d = duckdb.sql(
                f"SELECT docid, conv_id, turn_idx FROM read_parquet('{path}/docs/*.parquet')"
            ).df().set_index("docid")
            return sorted(
                ((d.loc[h[0], "conv_id"], int(d.loc[h[0], "turn_idx"]), float(h[1])) for h in hits)
            )

        for q in QUERIES:
            assert keyed(a, oneshot, q) == keyed(b, grown, q), q

    def test_idempotent_dedup(self, spark, tiny_corpus_pdf, tmp_path):
        out = str(tmp_path / "idx")
        df = spark.createDataFrame(tiny_corpus_pdf)
        build_index(spark, df, out, n_shards=4, n_salts=2)
        # redelivery of the same rows with dedupe_existing: nothing appended
        r = append_batch(spark, df.limit(50), out, dedupe_existing=True)
        assert r["appended"] == 0

    def _halves(self, tiny_corpus_pdf):
        convs = sorted(tiny_corpus_pdf["conv_id"].unique())
        cut = convs[len(convs) // 2]
        return (
            tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] < cut],
            tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] >= cut],
        )

    def test_append_merges_only_affected_groups(self, spark, tiny_corpus_pdf, tmp_path):
        """VERDICT r1 item 3: per-batch merge cost must be O(batch terms),
        not O(index) — an append rewrites strictly fewer (term, salt)
        groups than the postings store holds."""
        import duckdb

        first, second = self._halves(tiny_corpus_pdf)
        out = str(tmp_path / "grown")
        build_index(spark, spark.createDataFrame(first), out, n_shards=8, n_salts=4)
        r = append_batch(spark, spark.createDataFrame(second), out)
        total_groups = duckdb.sql(
            f"SELECT count(*) FROM (SELECT DISTINCT term, salt FROM read_parquet('{out}/postings/*.parquet'))"
        ).fetchone()[0]
        assert 0 < r["merged_groups"] < total_groups

    def test_replay_same_batch_id_is_noop(self, spark, tiny_corpus_pdf, tmp_path):
        """foreachBatch at-least-once replay: a committed batch id is
        skipped without touching the index (ADVICE r1 item 4)."""
        first, second = self._halves(tiny_corpus_pdf)
        out = str(tmp_path / "grown")
        build_index(spark, spark.createDataFrame(first), out, n_shards=8, n_salts=4)
        r1 = append_batch(spark, spark.createDataFrame(second), out, batch_id=7)
        assert r1["appended"] == len(second)
        r2 = append_batch(spark, spark.createDataFrame(second), out, batch_id=7)
        assert r2.get("skipped_replay") is True
        idx = LocalIndex(out)
        assert idx.stats["n_docs"] == len(tiny_corpus_pdf)
        assert len(idx.search("error", k=5)) == 5

    def test_crash_recovery_rolls_back_uncommitted_append(self, spark, tiny_corpus_pdf, tmp_path):
        """Crash AFTER the data writes but BEFORE the _build.json commit:
        the replayed batch must first roll back the orphan docids, then
        apply cleanly — final index equals a one-shot build (ADVICE r1)."""
        import json as _json

        first, second = self._halves(tiny_corpus_pdf)
        oneshot = str(tmp_path / "oneshot")
        build_index(spark, spark.createDataFrame(tiny_corpus_pdf), oneshot, n_shards=8, n_salts=4)

        out = str(tmp_path / "grown")
        build_index(spark, spark.createDataFrame(first), out, n_shards=8, n_salts=4)
        with open(os.path.join(out, "_build.json")) as f:
            pre_commit = f.read()
        append_batch(spark, spark.createDataFrame(second), out, batch_id=1)
        # simulate the crash: restore the pre-append params (commit undone)
        with open(os.path.join(out, "_build.json"), "w") as f:
            f.write(pre_commit)

        r = append_batch(spark, spark.createDataFrame(second), out, batch_id=1)
        assert r["recovered"] is True
        assert r["appended"] == len(second)
        assert _json.load(open(os.path.join(out, "_build.json")))["total_docs"] == len(tiny_corpus_pdf)

        a, b = LocalIndex(oneshot), LocalIndex(out)
        assert a.stats == b.stats
        import duckdb

        def keyed(idx, path, q):
            hits = idx.search(q, k=15)
            d = duckdb.sql(
                f"SELECT docid, conv_id, turn_idx FROM read_parquet('{path}/docs/*.parquet')"
            ).df().set_index("docid")
            return sorted(
                ((d.loc[h[0], "conv_id"], int(d.loc[h[0], "turn_idx"]), float(h[1])) for h in hits)
            )

        for q in QUERIES:
            assert keyed(a, oneshot, q) == keyed(b, out, q), q


class TestStreamingDriver:
    def test_available_now_stream_builds_index(self, spark, tiny_corpus_pdf, tmp_path):
        src = str(tmp_path / "arrivals")
        os.makedirs(src)
        convs = sorted(tiny_corpus_pdf["conv_id"].unique())
        cut = convs[len(convs) // 2]
        spark.createDataFrame(tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] < cut]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] >= cut]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        out = str(tmp_path / "sidx")
        q = incremental_index_stream(
            spark, src, out, TRANSCRIPT_SCHEMA, str(tmp_path / "ckpt")
        )
        q.awaitTermination(300)
        idx = LocalIndex(out)
        assert idx.stats["n_docs"] == len(tiny_corpus_pdf)
        assert len(idx.search("error", k=5)) == 5


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import multimodal as mm

        docs = spark.createDataFrame(
            [(i, f"payload text {i} " * (i + 1)) for i in range(9)], "doc_id long, text string"
        )
        media = mm.synthetic_media(spark, docs)
        got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
        exp = [(f.name, f.dataType.simpleString()) for f in mm.MEDIA_SCHEMA.fields]
        assert got == exp  # nullability is representation detail
        feats = mm.extract_features(media, fake=True).collect()
        assert len(feats) == 9
        assert all(len(r["feature"]) == mm.FEATURE_DIM for r in feats)
        # deterministic
        again = mm.extract_features(mm.synthetic_media(spark, docs), fake=True).collect()
        assert sorted((r["media_id"], tuple(r["feature"])) for r in feats) == sorted(
            (r["media_id"], tuple(r["feature"])) for r in again
        )

    def test_real_decode_is_stubbed(self):
        from siem_on_amazon_opensearch_service_spark.operators import multimodal as mm

        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG")

    def test_frame_sampling(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators import multimodal as mm

        docs = spark.createDataFrame(
            [(2, "v" * 5000)], "doc_id long, text string"  # doc_id 2 -> kind video
        )
        media = mm.synthetic_media(spark, docs)
        frames = mm.frame_sample(media, every_n_bytes=1024, max_frames=3).collect()
        assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]
        assert all(len(r["frame"]) == 1024 for r in frames)


class TestSessionize:
    def _toy(self, spark):
        import datetime as dt

        base = dt.datetime(2025, 6, 1, 10, 0, 0)
        rows = [
            ("c1", base),
            ("c1", base + dt.timedelta(minutes=10)),
            ("c1", base + dt.timedelta(minutes=70)),   # > 30 min gap -> new session
            ("c1", base + dt.timedelta(minutes=75)),
            ("c2", base + dt.timedelta(minutes=5)),
        ]
        return spark.createDataFrame(rows, "conv_id string, ts timestamp")

    def test_batch_gap_split(self, spark):
        from siem_on_amazon_opensearch_service_spark.streaming.sessionize import sessionize_batch

        got = sessionize_batch(self._toy(spark), gap_minutes=30).collect()
        as_tuples = [(r["conv_id"], r["session_idx"], r["n_turns"]) for r in got]
        assert as_tuples == [("c1", 0, 2), ("c1", 1, 2), ("c2", 0, 1)]

    def test_stream_equals_batch_closed_sessions(self, spark, tmp_path):
        """applyInPandasWithState sessionization must emit, for every
        session it closes, exactly the batch formulation's row."""
        from siem_on_amazon_opensearch_service_spark.streaming.sessionize import (
            sessionize_batch,
            sessionize_stream,
        )

        toy = self._toy(spark)
        src = str(tmp_path / "turns")
        toy.coalesce(1).write.parquet(src)
        batch = {
            (r["conv_id"], r["session_idx"]): (r["n_turns"], r["t_start"], r["t_end"])
            for r in sessionize_batch(toy, gap_minutes=30).collect()
        }
        stream = spark.readStream.schema("conv_id string, ts timestamp").parquet(src)
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
            .writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.sql("SELECT * FROM sess_out").collect()
        assert len(got) > 0  # at least the in-stream-closed session
        for r in got:
            key = (r["conv_id"], r["session_idx"])
            assert key in batch, key
            assert (r["n_turns"], r["t_start"], r["t_end"]) == batch[key], key


class TestDistributedSearchOnGrownIndex:
    def test_search_df_equals_local_after_appends(self, spark, tiny_corpus_pdf, tmp_path):
        """The distributed path (incl. the r2 pruning planners, which read
        per-row block metadata) must stay exact over an index grown by
        appends — multi-batch (term, salt) rows with boundary-shard
        collisions included."""
        from siem_on_amazon_opensearch_service_spark.operators.search import search_df

        convs = sorted(tiny_corpus_pdf["conv_id"].unique())
        cut = convs[len(convs) // 2]
        first = tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] < cut]
        second = tiny_corpus_pdf[tiny_corpus_pdf["conv_id"] >= cut]
        out = str(tmp_path / "grown")
        build_index(spark, spark.createDataFrame(first), out, n_shards=8, n_salts=4)
        append_batch(spark, spark.createDataFrame(second), out, batch_id=1)
        li = LocalIndex(out)
        for q in QUERIES + ["error AND w00042"]:
            exp = [(d, float(s)) for d, s in li.search(q, k=10)]
            rows = search_df(spark, out, q, k=10).collect()
            got = [(int(r["docid"]), float(np.float32(r["score"]))) for r in rows]
            assert got == [(d, float(np.float32(s))) for d, s in exp], q
