"""Checkpoint-resume and parallelism-determinism gates
(BASELINE.json north_rule; SURVEY.md §5.2 items 5-6)."""

import os
import shutil

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.build import assign_docids, build_index
from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex


def _postings_df(path):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{path}/postings/**/*.parquet') ORDER BY term, salt, shard_min"
    ).df()


def _norm_cell(v):
    return tuple(v) if isinstance(v, (list, np.ndarray)) else v


def _assert_frames_equal(pa, pb):
    assert len(pa) == len(pb)
    for col in pa.columns:
        va = [_norm_cell(x) for x in pa[col]]
        vb = [_norm_cell(x) for x in pb[col]]
        assert va == vb, f"postings column {col} differs"


def _filter_parquet_dir(d: str, keep_where: str) -> None:
    tmp = d + "_new"
    os.makedirs(tmp, exist_ok=True)
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{d}/*.parquet') WHERE {keep_where}) "
        f"TO '{tmp}/part-0.parquet' (FORMAT PARQUET)"
    )
    shutil.rmtree(d)
    os.rename(tmp, d)
    open(os.path.join(d, "_SUCCESS"), "w").close()


class TestResume:
    def test_resume_produces_identical_index(self, spark, tiny_corpus_pdf, tmp_path):
        a = str(tmp_path / "clean")
        b = str(tmp_path / "resumed")
        df = spark.createDataFrame(tiny_corpus_pdf)
        build_index(spark, df, a, n_shards=8, n_salts=4)
        shutil.copytree(a, b)

        # simulate a crash after shards 0-3: drop later shards from the
        # manifest and their partial segments
        _filter_parquet_dir(os.path.join(b, "manifest"), "shard < 4")
        _filter_parquet_dir(os.path.join(b, "partials"), "shard_min < 4")
        os.remove(os.path.join(b, "postings", "_SUCCESS"))

        stats = build_index(spark, df, b, resume=True)
        assert stats["shards_built"] == 4  # only the missing half re-ran

        _assert_frames_equal(_postings_df(a), _postings_df(b))

        la, lb = LocalIndex(a), LocalIndex(b)
        for q in ["error", "error AND timeout", '"connection reset"']:
            assert la.search(q, k=20) == lb.search(q, k=20)

    def test_resume_crash_between_partials_and_manifest(self, spark, tiny_corpus_pdf, tmp_path):
        """ADVICE r1 crash window: partials are appended BEFORE the manifest
        marks shards complete.  Simulate a crash between the two commits —
        partials contain shards 4-7 but the manifest doesn't — so the resume
        re-runs those shards and appends their partials a SECOND time.  The
        merged postings must still be identical to a clean build (replayed
        byte-identical partial rows deduped in the merge)."""
        a = str(tmp_path / "clean")
        b = str(tmp_path / "crashed")
        df = spark.createDataFrame(tiny_corpus_pdf)
        build_index(spark, df, a, n_shards=8, n_salts=4)
        shutil.copytree(a, b)

        # trim ONLY the manifest (partials keep all 8 shards)
        _filter_parquet_dir(os.path.join(b, "manifest"), "shard < 4")
        os.remove(os.path.join(b, "postings", "_SUCCESS"))

        stats = build_index(spark, df, b, resume=True)
        assert stats["shards_built"] == 4
        # the replay really did append duplicates upstream of the merge
        n_dup = duckdb.sql(
            f"SELECT count(*) FROM (SELECT term, salt, shard_min, docs_bytes, count(*) AS c "
            f"FROM read_parquet('{b}/partials/*.parquet') GROUP BY ALL HAVING c > 1)"
        ).fetchone()[0]
        assert n_dup > 0

        _assert_frames_equal(_postings_df(a), _postings_df(b))
        la, lb = LocalIndex(a), LocalIndex(b)
        for q in ["error", "error AND timeout", '"connection reset"']:
            assert la.search(q, k=20) == lb.search(q, k=20)

    def test_resume_crash_before_stats(self, spark, tiny_corpus_pdf, tmp_path):
        """Crash after the manifest commit but before the stats write: all
        shards complete, stats dir missing.  Resume must still produce
        stats (and a queryable index)."""
        out = str(tmp_path / "idx")
        df = spark.createDataFrame(tiny_corpus_pdf)
        build_index(spark, df, out, n_shards=4, n_salts=2)
        shutil.rmtree(os.path.join(out, "stats"))
        os.remove(os.path.join(out, "postings", "_SUCCESS"))
        stats = build_index(spark, df, out, resume=True)
        assert stats["shards_built"] == 0
        assert stats["n_docs"] == len(tiny_corpus_pdf)
        LocalIndex(out).search("error", k=5)

    def test_noop_resume(self, spark, tiny_corpus_pdf, tmp_path):
        out = str(tmp_path / "idx")
        df = spark.createDataFrame(tiny_corpus_pdf)
        build_index(spark, df, out, n_shards=4, n_salts=2)
        stats = build_index(spark, df, out, resume=True)
        assert stats["shards_built"] == 0


class TestParallelismDeterminism:
    def test_docids_independent_of_partitioning(self, spark, tiny_corpus_pdf):
        df = spark.createDataFrame(tiny_corpus_pdf)
        a, _, _c1 = assign_docids(df.repartition(3), num_buckets=2)
        b, _, _c2 = assign_docids(df.repartition(17), num_buckets=9)
        pa = a.select("conv_id", "turn_idx", "docid").orderBy("docid").toPandas()
        pb = b.select("conv_id", "turn_idx", "docid").orderBy("docid").toPandas()
        assert pa.equals(pb)
        n = len(pa)
        assert list(pa["docid"]) == list(range(n))  # dense 0..N-1

    def test_index_identical_across_partitioning(self, spark, tiny_corpus_pdf, tmp_path):
        df = spark.createDataFrame(tiny_corpus_pdf)
        a = str(tmp_path / "p3")
        b = str(tmp_path / "p17")
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            build_index(spark, df.repartition(3), a, n_shards=8, n_salts=4)
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            build_index(spark, df.repartition(17), b, n_shards=8, n_salts=4)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        _assert_frames_equal(_postings_df(a), _postings_df(b))
        la, lb = LocalIndex(a), LocalIndex(b)
        for q in ["error", "timeout OR refused", '"connection reset"']:
            assert la.search(q, k=25) == lb.search(q, k=25)


class TestGeneratorSparkParity:
    def test_spark_equals_pandas(self, spark, tiny_corpus_pdf):
        from siem_on_amazon_opensearch_service_spark.sources.transcripts import generate_spark

        got = (
            generate_spark(spark, 0.001)
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        exp = tiny_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert got["text"].tolist() == exp["text"].tolist()
        assert got["role"].tolist() == exp["role"].tolist()
        assert list(got["ts"]) == list(exp["ts"])
        assert got["tool"].fillna("·").tolist() == exp["tool"].fillna("·").tolist()


class TestPositionsOptional:
    def test_positionless_index_smaller_and_guarded(self, spark, tiny_corpus_pdf, tmp_path):
        """positions=False: term/bool queries identical, phrase rejected,
        index smaller (SURVEY.md §7 watchlist: positions ~2-3x size)."""
        import pytest as _pytest

        from siem_on_amazon_opensearch_service_spark.operators.build import build_index

        df = spark.createDataFrame(tiny_corpus_pdf)
        with_pos = str(tmp_path / "withpos")
        no_pos = str(tmp_path / "nopos")
        build_index(spark, df, with_pos, n_shards=4, n_salts=2, positions=True)
        build_index(spark, df, no_pos, n_shards=4, n_salts=2, positions=False)

        a, b = LocalIndex(with_pos), LocalIndex(no_pos)
        for q in ["error", "error AND timeout", "timeout OR refused"]:
            assert a.search(q, k=15) == b.search(q, k=15)
        with _pytest.raises(ValueError, match="positional"):
            b.search('"connection reset"', k=5)

        def psize(d):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(os.path.join(d, "postings"))
                for f in files
                if f.endswith(".parquet")
            )

        assert psize(no_pos) < psize(with_pos)
