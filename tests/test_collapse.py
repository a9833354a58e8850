"""Field collapsing (OpenSearch ``collapse``): one best hit per field
value — best = (score desc, docid asc) inside the group — then the
normal (score desc, docid asc) page.  Identical across cold search_df,
warm/sharded QuerySession, LocalIndex, and the bm25_sql QUALIFY
rendering."""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    QuerySession,
    search_df,
)
from siem_on_amazon_opensearch_service_spark.operators.sqloracle import bm25_sql

QUERIES = [
    "error",
    "error AND timeout",
    '"connection reset" OR timeout',
    "error AND role:assistant",
    "w0004*",
]


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("col") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


def _sql(parquet, q, k=10, field="conv_id"):
    return [
        (int(d), float(s))
        for d, s in duckdb.sql(bm25_sql(parquet, q, k=k, collapse=field)).fetchall()
    ]


class TestCollapse:
    @pytest.mark.parametrize("q", QUERIES)
    def test_cold_matches_sql(self, spark, tiny_index, parquet, q):
        got = [
            (r["docid"], round(float(np.float32(r["score"])), 3))
            for r in search_df(spark, tiny_index[0], q, k=10, collapse="conv_id").collect()
        ]
        assert got == _sql(parquet, q), q

    @pytest.mark.parametrize("q", QUERIES)
    def test_local_matches_sql(self, local, parquet, q):
        got = [(int(d), round(float(s), 3)) for d, s in local.search(q, k=10, collapse="conv_id")]
        assert got == _sql(parquet, q), q

    def test_warm_and_sharded_match_cold(self, spark, tiny_index):
        cold = search_df(
            spark, tiny_index[0], "error AND timeout", k=10, collapse="conv_id"
        ).collect()
        for kw in ({}, {"broadcast_cap": 0}):
            qs = QuerySession(spark, tiny_index[0], **kw)
            try:
                warm = qs.search("error AND timeout", k=10, collapse="conv_id").collect()
                assert [(r["docid"], np.float32(r["score"])) for r in cold] == [
                    (r["docid"], np.float32(r["score"])) for r in warm
                ], kw
            finally:
                qs.close()

    def test_groups_unique_and_best(self, spark, tiny_index, local):
        rows = search_df(spark, tiny_index[0], "error", k=50, collapse="conv_id").collect()
        convs = [r["conv_id"] for r in rows]
        assert len(convs) == len(set(convs))
        # each returned hit is its conversation's best raw hit
        raw = local.search("error", k=10**6)
        best: dict = {}
        for d, s in raw:
            c = local.conv[d]
            if c not in best:
                best[c] = (d, s)  # raw comes (score desc, docid asc)
        for r in rows:
            assert best[r["conv_id"]][0] == r["docid"]

    def test_collapse_on_role(self, spark, tiny_index, parquet):
        got = [
            (r["docid"], round(float(np.float32(r["score"])), 3))
            for r in search_df(spark, tiny_index[0], "error", k=10, collapse="role").collect()
        ]
        assert got == _sql(parquet, "error", field="role")
        assert len(got) <= 4  # at most one hit per role value

    def test_bad_field_rejected(self, spark, tiny_index):
        with pytest.raises(ValueError, match="collapse supports"):
            search_df(spark, tiny_index[0], "error", collapse="norm")

    def test_sql_collapse_cursor_refused(self, parquet):
        with pytest.raises(NotImplementedError, match="collapse \\+ search_after"):
            bm25_sql(parquet, "error", k=10, collapse="conv_id", search_after=(1.0, 0))
