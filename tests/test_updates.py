"""update_by_query: metadata-only updates that leave every search
artifact byte-identical."""

import os
import shutil

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import updates as up
from siem_on_amazon_opensearch_service_spark.operators.search import search_df

UPQ = "refused"
SET = {"tool": "quarantine"}


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("updates") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


def _tree(d):
    return sorted(
        (os.path.relpath(os.path.join(r, f), d), os.path.getsize(os.path.join(r, f)))
        for r, _, fs in os.walk(d)
        for f in fs
    )


@pytest.fixture(scope="module")
def up_index(spark, tiny_index, tmp_path_factory):
    src, _ = tiny_index
    out = str(tmp_path_factory.mktemp("upd") / "index")
    shutil.copytree(src, out)
    before = {s: _tree(os.path.join(out, s)) for s in ("postings", "dict", "stats")}
    info = up.update_by_query(spark, out, UPQ, dict(SET))
    assert info["updated"] > 0
    # every scoring artifact byte-identical (metadata updates never touch
    # postings/dict/stats)
    for s, t in before.items():
        assert _tree(os.path.join(out, s)) == t, s
    yield out, info
    shutil.rmtree(out, ignore_errors=True)


class TestUpdateByQuery:
    def test_only_matches_changed(self, spark, tiny_index, up_index):
        old = {
            r["docid"]: (r["role"], r["tool"], r["text"])
            for r in spark.read.parquet(os.path.join(tiny_index[0], "docs")).collect()
        }
        from siem_on_amazon_opensearch_service_spark.operators.percolate import (
            compile_predicate,
            tokens_col,
        )

        pred = compile_predicate(UPQ)
        hits = {
            r["docid"]
            for r in spark.read.parquet(os.path.join(tiny_index[0], "docs"))
            .filter(pred(tokens_col(F.col("text")), F.col("role"), F.col("tool"), F.col("ts")))
            .select("docid")
            .collect()
        }
        idx, info = up_index
        assert info["updated"] == len(hits)
        for r in spark.read.parquet(os.path.join(idx, "docs")).collect():
            role0, tool0, text0 = old[r["docid"]]
            assert r["text"] == text0 and r["role"] == role0
            if r["docid"] in hits:
                assert r["tool"] == "quarantine"
            else:
                assert r["tool"] == tool0

    def test_scores_unchanged(self, spark, tiny_index, up_index):
        idx, _ = up_index
        a = [(r["docid"], float(np.float32(r["score"])))
             for r in search_df(spark, tiny_index[0], "error OR timeout", k=10).collect()]
        b = [(r["docid"], float(np.float32(r["score"])))
             for r in search_df(spark, idx, "error OR timeout", k=10).collect()]
        assert a == b

    def test_filtered_search_matches_oracle(self, spark, up_index, parquet):
        idx, _ = up_index
        got = [
            (int(r["docid"]), round(float(r["score"]), 3))
            for r in search_df(spark, idx, "error AND tool:quarantine", k=10).collect()
        ]
        sql = up.updated_bm25_sql(
            parquet, "error AND tool:quarantine", UPQ, dict(SET), k=10
        )
        exp = [(int(d), float(s)) for d, s in duckdb.sql(sql).fetchall()]
        assert got == exp and got

    def test_clear_field(self, spark, tiny_index, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("clr") / "index")
        shutil.copytree(tiny_index[0], out)
        try:
            info = up.update_by_query(spark, out, UPQ, {"tool": None})
            docs = spark.read.parquet(os.path.join(out, "docs"))
            from siem_on_amazon_opensearch_service_spark.operators.percolate import (
                compile_predicate,
                tokens_col,
            )

            pred = compile_predicate(UPQ)
            still = docs.filter(
                pred(tokens_col(F.col("text")), F.col("role"), F.col("tool"), F.col("ts"))
                & F.col("tool").isNotNull()
            ).count()
            assert still == 0 and info["updated"] > 0
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def test_rejects_bad_fields(self, spark, tiny_index):
        with pytest.raises(ValueError):
            up.update_by_query(spark, tiny_index[0], UPQ, {"text": "x"})
        with pytest.raises(ValueError):
            up.update_by_query(spark, tiny_index[0], UPQ, {"ts": "2024-01-01"})
        with pytest.raises(ValueError):
            up.update_by_query(spark, tiny_index[0], UPQ, {})
        with pytest.raises(ValueError):
            up.updated_bm25_sql("x.parquet", "error", UPQ, {"ts": "x"})
