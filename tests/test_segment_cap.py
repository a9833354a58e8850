"""``max_segment_bytes`` — the 10^12-turn row-width knob (SCALE.md §8):
cap a merged (term, salt) row's docs_bytes so hot terms emit one row per
~cap-sized shard-run instead of one row concatenating the whole residue
class.  Runs split at shard boundaries, so every reader (cold fused,
warm sessions, LocalIndex, WAND, the prune planner's seed fetch) must
work unchanged over the multi-row geometry."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.build import build_index
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    search_df,
)

CAP = 64  # well under a hot term's per-salt bytes at sf0.001 -> real splits


@pytest.fixture(scope="module")
def capped_index(spark, tiny_corpus_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cap") / "index")
    df = spark.createDataFrame(tiny_corpus_pdf)
    build_index(spark, df, out, n_shards=8, n_salts=4, max_segment_bytes=CAP)
    return out


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


QUERIES = [
    "error",
    "error AND timeout",
    "timeout OR refused OR denied",
    '"connection reset"',
    "(error AND NOT timeout) OR refused",
    "w000*",
    "error AND w00042~1",
]


class TestCappedGeometry:
    def test_cap_persisted_and_rows_split(self, spark, capped_index):
        with open(os.path.join(capped_index, "_build.json")) as f:
            assert json.load(f)["max_segment_bytes"] == CAP
        post = spark.read.parquet(os.path.join(capped_index, "postings"))
        per_key = (
            post.groupBy("term", "salt").count().filter(F.col("count") > 1).count()
        )
        assert per_key > 0, "no (term, salt) split into runs — cap ineffective"

    def test_bytes_and_stats_conserved_vs_uncapped(
        self, spark, capped_index, tiny_corpus_pdf, tmp_path_factory
    ):
        """The cap changes row GEOMETRY only: total postings bytes, df,
        cttf per term are identical to an uncapped build."""
        out = str(tmp_path_factory.mktemp("nocap") / "index")
        build_index(
            spark, spark.createDataFrame(tiny_corpus_pdf), out,
            n_shards=8, n_salts=4,
        )

        def per_term(p):
            return {
                r["term"]: (r["b"], r["df"], r["cttf"])
                for r in spark.read.parquet(os.path.join(p, "postings"))
                .groupBy("term")
                .agg(
                    F.sum(F.octet_length("docs_bytes")).alias("b"),
                    F.sum("df").alias("df"),
                    F.sum("cttf").alias("cttf"),
                )
                .collect()
            }

        assert per_term(capped_index) == per_term(out)

    @pytest.mark.parametrize("q", QUERIES)
    def test_cold_rank_identity(self, spark, capped_index, oracle, q):
        got = [
            (r["docid"], np.float32(r["score"]))
            for r in search_df(spark, capped_index, q, k=10).collect()
        ]
        exp = [(h.docid, h.score) for h in oracle.search(q, k=10)]
        assert got == exp, q

    def test_warm_and_local_and_wand(self, spark, capped_index, oracle):
        local = LocalIndex(capped_index)
        qs = QuerySession(spark, capped_index)
        try:
            for q in QUERIES[:5]:
                exp = [(h.docid, h.score) for h in oracle.search(q, k=10)]
                assert [
                    (d, np.float32(s)) for d, s in local.search(q, k=10)
                ] == exp, f"local:{q}"
                assert [
                    (r["docid"], np.float32(r["score"]))
                    for r in qs.search(q, k=10).collect()
                ] == exp, f"warm:{q}"
            for q in ["error", "timeout OR refused OR denied", "error AND timeout"]:
                exp = [(h.docid, h.score) for h in oracle.search(q, k=10)]
                assert [
                    (d, np.float32(s)) for d, s in local.search_wand(q, k=10)
                ] == exp, f"wand:{q}"
        finally:
            qs.close()

    def test_expunge_keeps_geometry(self, spark, tiny_corpus_pdf, tmp_path_factory):
        from siem_on_amazon_opensearch_service_spark.operators import deletes as dl

        out = str(tmp_path_factory.mktemp("capx") / "index")
        df = spark.createDataFrame(tiny_corpus_pdf)
        build_index(spark, df, out, n_shards=8, n_salts=4, max_segment_bytes=CAP)
        dl.delete_by_query(spark, out, "refused")
        dl.expunge_deletes(spark, out)
        post = spark.read.parquet(os.path.join(out, "postings"))
        assert (
            post.groupBy("term", "salt").count().filter(F.col("count") > 1).count()
            > 0
        ), "expunge merge lost the row-width cap"
        # post-expunge search still exact vs an oracle over the survivors
        surv = tiny_corpus_pdf[
            ~tiny_corpus_pdf["text"].str.contains(r"\brefused\b", regex=True)
        ]
        # survivor oracle must keep ORIGINAL docids: rebuild corpus order
        oracle = LuceneOracle(tiny_corpus_pdf)
        got = {
            r["docid"]
            for r in search_df(spark, out, "error AND timeout", k=10).collect()
        }
        assert got  # non-empty and every hit is a survivor
        deleted = {
            h.docid for h in oracle.search("refused", k=10**6)
        }
        assert not (got & deleted)
