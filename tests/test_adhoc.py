"""Index-free BM25 (operators/adhoc.bm25_adhoc_df) + RRF hybrid fusion.

The load-bearing theorem: ad-hoc scoring over a raw table is
rank/score-IDENTICAL to building an index over the same rows and
querying it — proved on the transcripts corpus (ids = the index's
stable docids).  Cross-engine exactness vs the DuckDB rendering
(bm25_adhoc_sql) on the documents table.  RRF fusion checked against
rrf_sql and a hand-computed case.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators.adhoc import (
    bm25_adhoc_df,
    rrf_fuse,
)
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.operators.sqloracle import (
    bm25_adhoc_sql,
    rrf_sql,
)

ADHOC_QUERIES = [
    "error",
    "error AND timeout",
    "timeout OR refused OR denied",
    "error AND NOT timeout",
    '"connection reset"',
    '"connection reset" OR (error AND timeout)',
    "span_first(end=3 error)",
    "span_not(dist=2 error timeout)",
    "span_or(timeout refused)",
    "error^2 OR timeout^0.5",
]


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return LuceneOracle(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def transcripts_with_docids(spark, tiny_corpus_pdf):
    """Transcripts with the INDEX's stable docid as an id column —
    row_number over (conv_id, turn_idx), same as assign_docids."""
    from pyspark.sql import Window, functions as F

    df = spark.createDataFrame(tiny_corpus_pdf)
    w = Window.orderBy("conv_id", "turn_idx")
    return df.withColumn("docid", F.row_number().over(w) - 1).persist()


class TestAdhocEqualsIndex:
    @pytest.mark.parametrize("q", ADHOC_QUERIES)
    def test_adhoc_equals_oracle(self, transcripts_with_docids, oracle, q):
        got = [
            (int(r["docid"]), np.float32(r["score"]))
            for r in bm25_adhoc_df(
                transcripts_with_docids, q, k=10, id_col="docid", text_col="text"
            ).collect()
        ]
        exp = [(h.docid, h.score) for h in oracle.search(q, k=10)]
        assert got == exp, q

    def test_k_none_full_match_set(self, transcripts_with_docids, oracle):
        rows = bm25_adhoc_df(
            transcripts_with_docids, "error AND timeout", k=None,
            id_col="docid", text_col="text",
        ).collect()
        exp = oracle.search("error AND timeout", k=10**9)
        assert {int(r["docid"]) for r in rows} == {h.docid for h in exp}

    def test_msm(self, transcripts_with_docids, oracle):
        q = "timeout OR refused OR denied"
        got = [
            (int(r["docid"]), np.float32(r["score"]))
            for r in bm25_adhoc_df(
                transcripts_with_docids, q, k=10, id_col="docid",
                text_col="text", minimum_should_match=2,
            ).collect()
        ]
        exp = [
            (h.docid, h.score)
            for h in oracle.search(q, k=10, minimum_should_match=2)
        ]
        assert got == exp


class TestAdhocVsDuck:
    @pytest.mark.parametrize(
        "q",
        [
            "spark AND table",
            '"slow query" OR scan',
            "span_or(spark query)",
            "query AND NOT vector",
        ],
    )
    def test_documents_engine_equals_sql(self, spark, q):
        path = "/root/testdata/sf0.001/documents.parquet"
        df = spark.read.parquet(path)
        got = (
            bm25_adhoc_df(df, q, k=10)
            .toPandas()
            .assign(score_r=lambda d: d["score"].astype("float64").round(3))
            [["doc_id", "score_r"]]
        )
        exp = duckdb.sql(bm25_adhoc_sql(path, q, k=10)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True),
            check_dtype=False,
        )


class TestAdhocImplParity:
    """impl='arrow' (default, one Arrow facts pass) must be row-identical
    to impl='column' (the pure-Column reference) — full match sets, every
    supported leaf type, and the truncation boundary."""

    @pytest.mark.parametrize("q", ADHOC_QUERIES)
    def test_full_match_set_identical(self, transcripts_with_docids, q):
        def rows(impl):
            return sorted(
                (int(r["docid"]), np.float32(r["score"]))
                for r in bm25_adhoc_df(
                    transcripts_with_docids, q, k=None,
                    id_col="docid", text_col="text", impl=impl,
                ).collect()
            )

        assert rows("arrow") == rows("column"), q

    def test_truncation_boundary(self, spark):
        """A text past TRUNCATE_BYTES must tokenize identically in both
        impls (char-based truncation + marker)."""
        from siem_on_amazon_opensearch_service_spark.functions import analysis

        long = ("alpha beta " * (analysis.TRUNCATE_BYTES // 10 + 10)).strip()
        assert len(long) > analysis.TRUNCATE_BYTES
        df = spark.createDataFrame(
            [(0, long), (1, "alpha beta alpha"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        def rows(impl):
            return sorted(
                (int(r["doc_id"]), np.float32(r["score"]))
                for r in bm25_adhoc_df(
                    df, "alpha AND beta", k=None, impl=impl
                ).collect()
            )

        assert rows("arrow") == rows("column")

    def test_bad_impl_rejected(self, spark):
        df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="impl"):
            bm25_adhoc_df(df, "a", impl="bogus")

    def test_re2_boundary_counts_match_lookarounds(self):
        """The r6c facts pass counts term occurrences with RE2
        (pyarrow count/match_substring_regex, pattern \\bterm\\b); it
        must accept exactly the language of the r6b CPython lookaround
        pattern (?<![A-Za-z0-9_])term(?![A-Za-z0-9_]) — RE2's \\b is
        the ASCII [0-9A-Za-z_] word boundary, and terms are \\w-only
        tokens.  Randomized texts incl. punctuation seams, adjacent
        repeats, substring-containing words, underscores, long runs,
        non-ASCII and empty rows."""
        import re

        import pyarrow as pa
        import pyarrow.compute as pc

        rng = np.random.default_rng(7)
        vocab = [
            "error", "errors", "error_", "_error", "timeout", "the",
            "w00042", "a" * 300, "naïve", "Ünïcode", "x,y", "0err0",
        ]
        seps = [" ", ",", "...", "\n\t", "!", ""]
        texts = [
            "".join(
                w + s
                for w, s in zip(
                    rng.choice(vocab, size=rng.integers(0, 25)),
                    rng.choice(seps, size=25),
                )
            )
            for _ in range(4000)
        ] + ["", "error", "error error", "error,error", "errorerror"]
        low = pd.Series(texts).str.lower()
        arr = pa.Array.from_pandas(low)
        for term in ["error", "the", "w00042", "a" * 300]:
            py = re.compile(
                r"(?<![A-Za-z0-9_])" + re.escape(term) + r"(?![A-Za-z0-9_])"
            )
            want = low.str.count(py).to_numpy(np.int64)
            got = (
                pc.count_substring_regex(
                    arr, pattern=r"\b" + re.escape(term) + r"\b"
                )
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            assert np.array_equal(want, got), term
            want_hit = low.str.contains(py).to_numpy(bool)
            got_hit = (
                pc.match_substring_regex(
                    arr, pattern=r"\b" + re.escape(term) + r"\b"
                )
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            assert np.array_equal(want_hit, got_hit), term


class TestAdhocRejections:
    def test_field_filter_rejected(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with pytest.raises(ValueError, match="field filters"):
            bm25_adhoc_df(df, "error AND role:assistant")

    @pytest.mark.parametrize("q", ["err*", "error~1", '"slow qu"*', '"a b"~2',
                                   "span_near(slop=2 a b)"])
    def test_unsupported_leaves_rejected(self, spark, q):
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with pytest.raises(NotImplementedError):
            bm25_adhoc_df(df, q)
        with pytest.raises(NotImplementedError):
            bm25_adhoc_sql("/x.parquet", q)


class TestRrf:
    def test_hand_case(self, spark):
        a = spark.createDataFrame(
            [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
        )
        b = spark.createDataFrame(
            [(3, 0.9), (4, 0.8)], "doc_id long, score double"
        )
        got = {
            int(r["doc_id"]): r["rrf_score"]
            for r in rrf_fuse([a, b], k=10).collect()
        }
        assert got == {
            1: 1.0 / 61,
            2: 1.0 / 62,
            3: 1.0 / 63 + 1.0 / 61,
            4: 1.0 / 62,
        }

    def test_engine_equals_sql(self, spark, tmp_path):
        rng = np.random.default_rng(7)
        pa = pd.DataFrame({
            "doc_id": np.arange(40), "score": rng.random(40).round(4)
        })
        pb = pd.DataFrame({
            "doc_id": rng.permutation(60)[:35], "score": rng.random(35).round(4)
        })
        fa, fb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
        pa.to_parquet(fa)
        pb.to_parquet(fb)
        got = [
            (int(r["doc_id"]), round(float(r["rrf_score"]), 9))
            for r in rrf_fuse(
                [spark.read.parquet(fa), spark.read.parquet(fb)],
                k=15, rank_window=20,
            ).collect()
        ]
        sql = rrf_sql(
            [(f"SELECT * FROM read_parquet('{fa}')", "doc_id", "score"),
             (f"SELECT * FROM read_parquet('{fb}')", "doc_id", "score")],
            k=15, rank_window=20,
        )
        exp = [(int(d), round(float(s), 9)) for d, s in duckdb.sql(sql).fetchall()]
        assert got == exp

    def test_hybrid_legs_compose(self, spark):
        """The driver row's shape: lexical adhoc leg + cosine vector leg
        over aligned ids, engine == SQL end-to-end."""
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators import similarity

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        lex = bm25_adhoc_df(docs, "spark AND table", k=50)
        vec = (
            similarity.cosine_topk(emb, [0], k=50)
            .select(
                F.col("vec_id").alias("doc_id"),
                F.round(F.col("cos"), 6).alias("score"),
            )
        )
        got = [
            (int(r["doc_id"]), round(float(r["rrf_score"]), 9))
            for r in rrf_fuse([lex, vec], k=10, rank_window=50).collect()
        ]
        cos_sql = f"""
WITH q AS (SELECT embedding AS qvec FROM read_parquet('{sf}/embeddings.parquet') WHERE vec_id = 0)
SELECT e.vec_id AS doc_id,
       round(list_sum(list_transform(generate_series(1, len(e.embedding)),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(generate_series(1, len(q.qvec)),
                i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
         6) AS score
FROM read_parquet('{sf}/embeddings.parquet') e, q WHERE e.vec_id <> 0
ORDER BY score DESC, doc_id ASC LIMIT 50"""
        sql = rrf_sql(
            [(bm25_adhoc_sql(f"{sf}/documents.parquet", "spark AND table",
                             k=50, rounded=False), "doc_id", "score"),
             (cos_sql, "doc_id", "score")],
            k=10, rank_window=50,
        )
        exp = [(int(d), round(float(s), 9)) for d, s in duckdb.sql(sql).fetchall()]
        assert got == exp
        assert len(got) == 10


class TestMultiMatch:
    @pytest.fixture(scope="class")
    def two_field_df(self, spark):
        rows = [
            (1, "alpha beta gamma", "news"),
            (2, "alpha alpha delta", "blog"),
            (3, "epsilon zeta", "news"),
            (4, "beta beta beta", "wiki"),
            (5, "no match here", "alpha"),   # matches only via field 2
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, src string")

    def test_best_fields_is_max(self, two_field_df):
        from siem_on_amazon_opensearch_service_spark.operators.adhoc import bm25_adhoc_df, multi_match_df

        legs = {}
        for fld in ["text", "src"]:
            import pyspark.sql.functions as F
            leg = bm25_adhoc_df(
                two_field_df.select("doc_id", F.col(fld).alias("text")),
                "alpha OR news", k=None)
            legs[fld] = {int(r["doc_id"]): float(r["score"]) for r in leg.collect()}
        got = multi_match_df(two_field_df, "alpha OR news", ["text", "src"], k=10)
        for r in got.collect():
            d = int(r["doc_id"])
            exp = max(legs["text"].get(d, 0.0), legs["src"].get(d, 0.0))
            assert abs(float(r["score"]) - exp) < 1e-6
        # doc 5 matches only through the src field but is still returned
        assert 5 in {int(r["doc_id"]) for r in got.collect()}

    def test_most_fields_is_sum(self, two_field_df):
        from siem_on_amazon_opensearch_service_spark.operators.adhoc import bm25_adhoc_df, multi_match_df
        import pyspark.sql.functions as F

        legs = {}
        for fld in ["text", "src"]:
            leg = bm25_adhoc_df(
                two_field_df.select("doc_id", F.col(fld).alias("text")),
                "alpha OR news", k=None)
            legs[fld] = {int(r["doc_id"]): float(r["score"]) for r in leg.collect()}
        got = multi_match_df(
            two_field_df, "alpha OR news", ["text", "src"], k=10,
            match_type="most_fields")
        for r in got.collect():
            d = int(r["doc_id"])
            exp = np.float32(legs["text"].get(d, 0.0) + legs["src"].get(d, 0.0))
            assert abs(float(r["score"]) - float(exp)) < 1e-6

    def test_tie_breaker_interpolates(self, two_field_df):
        from siem_on_amazon_opensearch_service_spark.operators.adhoc import multi_match_df

        best = {int(r["doc_id"]): float(r["score"]) for r in multi_match_df(
            two_field_df, "alpha OR news", ["text", "src"], k=10).collect()}
        most = {int(r["doc_id"]): float(r["score"]) for r in multi_match_df(
            two_field_df, "alpha OR news", ["text", "src"], k=10,
            match_type="most_fields").collect()}
        half = {int(r["doc_id"]): float(r["score"]) for r in multi_match_df(
            two_field_df, "alpha OR news", ["text", "src"], k=10,
            tie_breaker=0.5).collect()}
        for d, s in half.items():
            assert best[d] - 1e-6 <= s <= most[d] + 1e-6

    def test_rejects_bad_args(self, two_field_df):
        from siem_on_amazon_opensearch_service_spark.operators.adhoc import multi_match_df

        with pytest.raises(ValueError):
            multi_match_df(two_field_df, "alpha", ["text"], k=5)
        with pytest.raises(ValueError):
            multi_match_df(two_field_df, "alpha", ["text", "src"], match_type="cross_fields")

    def test_matches_duckdb(self, two_field_df, tmp_path):
        from siem_on_amazon_opensearch_service_spark.operators.adhoc import multi_match_df
        from siem_on_amazon_opensearch_service_spark.operators.sqloracle import multi_match_sql
        import pyspark.sql.functions as F

        p = str(tmp_path / "two_field.parquet")
        two_field_df.toPandas().to_parquet(p)
        for mt, tb in [("best_fields", 0.0), ("best_fields", 0.3), ("most_fields", 0.0)]:
            got = [
                (int(r["doc_id"]), round(float(r["score"]), 3))
                for r in multi_match_df(
                    two_field_df, "alpha OR news", ["text", "src"], k=10,
                    match_type=mt, tie_breaker=tb).collect()
            ]
            sql = multi_match_sql(f"'{p}'", "alpha OR news", ["text", "src"],
                                  k=10, match_type=mt, tie_breaker=tb)
            exp = [(int(d), float(s)) for d, s in duckdb.sql(sql).fetchall()]
            assert got == exp, (mt, tb)
