"""more_like_this — term selection (tf*idf, tf >= min_term_freq,
df >= min_doc_freq, top max_query_terms), msm = 30% floor, source-doc
exclusion — identical across more_like_this_df (distributed),
LocalIndex.more_like_this, and the fully-SQL-derived mlt_sql oracle."""

import duckdb
import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions import bm25
from siem_on_amazon_opensearch_service_spark.functions.analysis import tokenize
from siem_on_amazon_opensearch_service_spark.operators.search import (
    LocalIndex,
    more_like_this_df,
    more_like_this_terms,
)
from siem_on_amazon_opensearch_service_spark.operators.sqloracle import mlt_sql


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("mlt") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


@pytest.fixture(scope="module")
def local(tiny_index):
    return LocalIndex(tiny_index[0])


def _docs_with_selection(index_dir, want=4):
    out = []
    d = 0
    while len(out) < want and d < 3000:
        if more_like_this_terms(index_dir, d):
            out.append(d)
        d += 97  # stride: varied doc shapes
    assert len(out) == want
    return out


class TestSelection:
    def test_selection_respects_thresholds(self, tiny_index, tiny_corpus_pdf, local):
        docs = _docs_with_selection(tiny_index[0], want=4)
        for d in docs:
            sel = more_like_this_terms(tiny_index[0], d)
            toks = tokenize(tiny_corpus_pdf.iloc[d]["text"])
            for t, score in sel:
                assert toks.count(t) >= 2, (d, t)
                df = local._term_postings(t)[0].size
                assert df >= 5, (d, t, df)
                expect = float(toks.count(t)) * bm25.idf(df, local.stats["doc_count"])
                assert score == expect

    def test_selection_ordered_and_capped(self, tiny_index):
        d = _docs_with_selection(tiny_index[0], want=1)[0]
        sel = more_like_this_terms(tiny_index[0], d, max_query_terms=3)
        full = more_like_this_terms(tiny_index[0], d)
        assert sel == full[:3]
        assert all(
            (a[1], b[0]) >= (b[1], a[0]) for a, b in zip(full, full[1:])
        )  # score desc, term asc

    def test_empty_selection_raises(self, spark, tiny_index):
        with pytest.raises(ValueError, match="yields no query terms"):
            more_like_this_df(spark, tiny_index[0], 7, k=10)

    def test_missing_doc_raises(self, tiny_index):
        with pytest.raises(ValueError, match="not in index"):
            more_like_this_terms(tiny_index[0], 10**9)


class TestEngineVsSqlOracle:
    def test_all_paths_agree(self, spark, tiny_index, parquet, local):
        docs = _docs_with_selection(tiny_index[0], want=4)
        for d in docs:
            exp = [
                (int(x), float(s))
                for x, s in duckdb.sql(mlt_sql(parquet, d, k=10)).fetchall()
            ]
            got = [
                (r["docid"], round(float(np.float32(r["score"])), 3))
                for r in more_like_this_df(spark, tiny_index[0], d, k=10).collect()
            ]
            loc = [
                (int(x), round(float(s), 3)) for x, s in local.more_like_this(d, k=10)
            ]
            assert got == exp, d
            assert loc == exp, d

    def test_source_doc_excluded(self, tiny_index, local):
        for d in _docs_with_selection(tiny_index[0], want=4):
            assert d not in [x for x, _ in local.more_like_this(d, k=50)]

    def test_msm_filters_weak_matches(self, tiny_index, local):
        """With msm at 100% every hit must contain ALL selected terms."""
        d = _docs_with_selection(tiny_index[0], want=1)[0]
        sel = [t for t, _ in more_like_this_terms(tiny_index[0], d)]
        hits = local.more_like_this(d, k=50, msm_pct=100)
        for docid, _ in hits:
            row = local.search(" AND ".join(f'"{t}"' for t in sel), k=10**6)
            assert docid in [x for x, _ in row]
