"""Percolator (reverse search): saved DQL queries compiled to pure column
predicates over the frozen-analyzer token array, matched against raw
transcript rows — engine vs the per-query SQL-oracle union, plus the
reference saved-search tie-in and streaming-plan compatibility."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators.percolate import (
    compile_predicate,
    percolate_df,
    percolate_sql,
    tokens_col,
)

QUERIES = {
    "err_timeout": "error AND timeout",
    "reset_phrase": '"connection reset"',
    "assistant_err": "error AND role:assistant",
    "w_prefix": "w0004*",
    "fuzzy_req": "request~1",
    "pp": '"connection re"*',
    "msm_or": "timeout OR refused OR denied",
    "not_q": "error AND NOT timeout",
    "regex": "/time(out|r)/",
    "ts_gate": "error AND ts>=2025-06-05T00:00:00",
    "sloppy2": '"connection reset"~2',
}


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("perc") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


@pytest.fixture(scope="module")
def tdf(spark, tiny_corpus_pdf):
    return spark.createDataFrame(tiny_corpus_pdf)


class TestPercolate:
    def test_engine_matches_sql_oracle(self, tdf, parquet):
        got = [
            (r["conv_id"], int(r["turn_idx"]), r["query_name"])
            for r in percolate_df(tdf, QUERIES)
            .orderBy("conv_id", "turn_idx", "query_name")
            .collect()
        ]
        exp = [
            (a, int(b), c)
            for a, b, c in duckdb.sql(percolate_sql(parquet, QUERIES)).fetchall()
        ]
        assert got == exp and len(got) > 100

    def test_matches_equal_index_match_sets(self, tdf, tiny_index, spark):
        """Percolation of a query == the index-side match set of the same
        query (two completely different evaluation strategies)."""
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            match_docids_df,
        )

        for q in [
            "error AND timeout",
            '"connection reset"',
            "w0004*",
            '"connection reset"~2',
            '"reset connection"~3',
        ]:
            perc = percolate_df(tdf, {"q": q})
            docs = spark.read.parquet(os.path.join(tiny_index[0], "docs"))
            perc_ids = {
                (r["conv_id"], r["turn_idx"]) for r in perc.collect()
            }
            idx_ids = {
                (r["conv_id"], r["turn_idx"])
                for r in docs.join(
                    match_docids_df(spark, tiny_index[0], q), "docid", "left_semi"
                ).collect()
            }
            assert perc_ids == idx_ids, q

    def test_nested_field_filter_allowed(self, tdf):
        """Index search restricts filters to top-level AND; percolation has
        no such constraint — OR over field filters evaluates directly."""
        n = percolate_df(tdf, {"q": "error AND (role:assistant OR tool:bash)"}).count()
        a = percolate_df(tdf, {"q": "error AND role:assistant"}).count()
        b = percolate_df(tdf, {"q": "error AND tool:bash"}).count()
        assert 0 < max(a, b) <= n <= a + b

    def test_sloppy_membership_matches_sweep(self, spark):
        """r4e: sloppy percolation == (sloppy_freq > 0) of the index-side
        greedy sweep, on randomized position layouts (the nested-exists
        min/max expression is the smallest-range existential)."""
        import random

        import numpy as np

        from siem_on_amazon_opensearch_service_spark.functions.sloppy import sloppy_freq

        rng = random.Random(42)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        rows = []
        for i in range(200):
            n = rng.randint(0, 12)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        tdf = spark.createDataFrame(rows, "doc_id long, text string")

        for terms, slop in [
            (["aa", "bb"], 0),
            (["aa", "bb"], 1),
            (["bb", "aa"], 2),
            (["aa", "bb", "cc"], 2),
            (["cc", "aa", "dd"], 4),
            (["aa", "bb", "cc", "dd"], 6),
        ]:
            q = '"' + " ".join(terms) + '"~' + str(slop)
            got = {
                r["doc_id"]
                for r in percolate_df(
                    tdf.withColumnRenamed("doc_id", "conv_id")
                    .withColumn("turn_idx", F.lit(0))
                    .withColumn("role", F.lit("user"))
                    .withColumn("tool", F.lit(None).cast("string"))
                    .withColumn("ts", F.current_timestamp()),
                    {"q": q},
                )
                .selectExpr("conv_id AS doc_id")
                .collect()
            }
            want = set()
            for i, text in rows:
                toks = text.split()
                pls = [
                    np.asarray([p for p, t in enumerate(toks) if t == term])
                    for term in terms
                ]
                if all(pl.size for pl in pls) and sloppy_freq(pls, slop) > 0:
                    want.add(i)
            assert got == want, (terms, slop)

    def test_streaming_plan_builds(self, spark, tiny_corpus_pdf, tmp_path):
        src = str(tmp_path / "stream_src")
        tiny_corpus_pdf.head(500).to_parquet(src + ".parquet")
        os.makedirs(src, exist_ok=True)
        os.rename(src + ".parquet", os.path.join(src, "part.parquet"))
        sdf = (
            spark.readStream.schema(
                spark.createDataFrame(tiny_corpus_pdf.head(2)).schema
            ).parquet(src)
        )
        out = percolate_df(sdf, {"q": "error AND timeout"})
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("perc_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT count(*) c FROM perc_stream").collect()[0]["c"]
        batch = percolate_df(
            spark.createDataFrame(tiny_corpus_pdf.head(500)), {"q": "error AND timeout"}
        ).count()
        assert rows == batch

    def test_tokens_col_matches_frozen_analyzer(self, tdf, tiny_corpus_pdf):
        from siem_on_amazon_opensearch_service_spark.functions.analysis import tokenize

        rows = (
            tdf.select("conv_id", "turn_idx", tokens_col(F.col("text")).alias("t"))
            .orderBy("conv_id", "turn_idx")
            .limit(50)
            .collect()
        )
        src = tiny_corpus_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        for r, (_, s) in zip(rows, src.iterrows()):
            assert list(r["t"]) == tokenize(s["text"])


REF_SAVED = "/root/reference/source/saved_objects"


@pytest.mark.skipif(not os.path.isdir(REF_SAVED), reason="reference not present")
class TestWithTokensArrow:
    """The arrow tokenize pass must be row-identical to the JVM column
    rendering — it is the corpus-scale default for every percolation
    scan (delete_by_query / update_by_query / reindex / percolate_df)."""

    def test_token_arrays_identical(self, tdf):
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            with_tokens,
        )

        a = with_tokens(tdf, impl="arrow").select("conv_id", "turn_idx", "__toks")
        c = with_tokens(tdf, impl="column").select("conv_id", "turn_idx", "__toks")
        key = lambda r: (r["conv_id"], r["turn_idx"])
        am = {key(r): list(r["__toks"]) for r in a.collect()}
        cm = {key(r): list(r["__toks"]) for r in c.collect()}
        assert am == cm

    def test_percolate_impls_identical(self, tdf):
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            percolate_df,
        )

        qs = {
            "q1": "error AND role:assistant",
            "q2": '"connection reset"',
            "q3": "timeout OR refused",
            "q4": "err*",
        }
        rows = lambda impl: sorted(
            map(tuple, percolate_df(tdf, qs, impl=impl).collect())
        )
        assert rows("arrow") == rows("column")

    def test_bad_impl_rejected(self, tdf):
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            with_tokens,
        )

        with pytest.raises(ValueError):
            with_tokens(tdf, impl="nope")


class TestReferenceSavedSearchPercolation:
    def test_compiled_saved_searches_percolate(self, tdf):
        """The saved-search compiler's DQL output percolates directly —
        the reference's saved investigations as streaming alert rules."""
        import json

        from siem_on_amazon_opensearch_service_spark.plans.savedsearch import (
            compile_search_source,
        )

        field_map = {"event.outcome": "role", "user.name": "tool"}
        compiled: dict[str, str] = {}
        base = os.path.join(REF_SAVED, "each-indexpattern-search")
        for fn in sorted(os.listdir(base))[:40]:
            for line in open(os.path.join(base, fn)):
                try:
                    obj = json.loads(line)
                    ss = json.loads(
                        obj["attributes"]["kibanaSavedObjectMeta"]["searchSourceJSON"]
                    )
                    dql = compile_search_source(ss, field_map=field_map)
                except Exception:
                    continue
                if dql:
                    try:
                        # only queries on mapped/engine fields percolate;
                        # others parse-fail (unknown field) — skip those
                        compile_predicate(dql)
                    except (ValueError, NotImplementedError):
                        continue
                    compiled[f"q{len(compiled)}"] = dql
                if len(compiled) >= 5:
                    break
            if len(compiled) >= 5:
                break
        if not compiled:
            pytest.skip("no compilable saved searches in sample")
        # values reference fields/terms absent from the synthetic corpus —
        # the assertion is that compilation + percolation RUN end-to-end
        percolate_df(tdf, compiled).count()


class TestPercolateRandomTrees:
    """r4e hardening: percolation == index match sets on random mixed-leaf
    boolean trees (terms, phrases, sloppy phrases, phrase prefixes,
    boosts, NOT) — two completely different evaluation strategies."""

    def test_random_trees_match_index(self, spark, tiny_corpus_pdf, tiny_index):
        import random

        from tests.test_mixed_stress import _tree
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            match_docids_df,
        )

        tdf = spark.createDataFrame(tiny_corpus_pdf)
        docs = spark.read.parquet(os.path.join(tiny_index[0], "docs"))
        rng = random.Random(7331)
        ran = nonempty = 0
        while ran < 15:
            q = _tree(rng, 2)
            try:
                idx_ids = {
                    (r["conv_id"], r["turn_idx"])
                    for r in docs.join(
                        match_docids_df(spark, tiny_index[0], q), "docid", "left_semi"
                    ).collect()
                }
            except ValueError:
                continue  # index-side coverage-invalid shape
            perc_ids = {
                (r["conv_id"], r["turn_idx"])
                for r in percolate_df(
                    tdf, {"q": q}, index_dir=tiny_index[0]
                ).collect()
            }
            assert perc_ids == idx_ids, q
            ran += 1
            nonempty += bool(perc_ids)
        assert nonempty >= 8, f"only {nonempty} non-empty — battery too weak"

    def test_phrase_prefix_truncation_bridge(self, spark, tiny_corpus_pdf, tiny_index):
        """'w000' has ~100 dictionary expansions; the index truncates to
        the first 50 (Lucene max_expansions), index-free percolation
        matches the full prefix.  With index_dir the percolator adopts
        the dictionary truncation and the sets are identical."""
        from siem_on_amazon_opensearch_service_spark.operators.search import (
            match_docids_df,
        )

        q = '"error w000"*'
        tdf = spark.createDataFrame(tiny_corpus_pdf)
        docs = spark.read.parquet(os.path.join(tiny_index[0], "docs"))
        idx_ids = {
            (r["conv_id"], r["turn_idx"])
            for r in docs.join(
                match_docids_df(spark, tiny_index[0], q), "docid", "left_semi"
            ).collect()
        }
        free = {
            (r["conv_id"], r["turn_idx"])
            for r in percolate_df(tdf, {"q": q}).collect()
        }
        bridged = {
            (r["conv_id"], r["turn_idx"])
            for r in percolate_df(tdf, {"q": q}, index_dir=tiny_index[0]).collect()
        }
        assert bridged == idx_ids
        assert free >= idx_ids  # untruncated is a superset by construction
