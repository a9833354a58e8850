"""Unit tests for the frozen numeric core (SURVEY.md §5.2 item 1)."""

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.functions import bm25, varint
from siem_on_amazon_opensearch_service_spark.functions.analysis import (
    TRUNCATE_MARK,
    tokenize,
    truncate_big_field,
)
from siem_on_amazon_opensearch_service_spark.functions.smallfloat import (
    LENGTH_TABLE,
    byte4_to_int,
    decode_norms,
    encode_lengths,
    int_to_byte4,
)
from siem_on_amazon_opensearch_service_spark.plans.query import (
    And, Not, Or, Phrase, Term, parse,
)


class TestSmallFloat:
    def test_free_values_identity(self):
        for i in range(24):
            assert int_to_byte4(i) == i
            assert byte4_to_int(i) == i

    def test_published_lucene_values(self):
        # Known SmallFloat.intToByte4 behavior: 4 significant bits above 24.
        # Round-trip is idempotent and monotone, decoded <= input.
        for i in [0, 1, 23, 24, 25, 39, 40, 41, 100, 255, 1000, 65535, 10**6]:
            b = int_to_byte4(i)
            assert 0 <= b <= 255
            d = byte4_to_int(b)
            assert d <= i
            assert int_to_byte4(d) == b  # idempotent
        # monotone, and max byte decodes large
        assert byte4_to_int(255) > 10**9

    def test_quantization_buckets(self):
        # 24..31 are exactly representable (24 + values < 8)
        for i in range(24, 32):
            assert byte4_to_int(int_to_byte4(i)) == i
        # 4-bit mantissa: 24 + 16..17 share a bucket? verify bucketing is
        # the floor of the decode table
        for i in range(0, 5000):
            b = int_to_byte4(i)
            assert LENGTH_TABLE[b] <= i
            if b < 255:
                assert i < LENGTH_TABLE[b + 1]

    def test_vectorized_matches_scalar(self):
        lens = np.array([0, 1, 23, 24, 100, 12345, 2**21, 2**30])
        enc = encode_lengths(lens)
        assert [int(x) for x in enc] == [int_to_byte4(int(v)) for v in lens]
        dec = decode_norms(enc)
        assert [int(x) for x in dec] == [byte4_to_int(int_to_byte4(int(v))) for v in lens]

    def test_length_table_monotone(self):
        assert (np.diff(LENGTH_TABLE) > 0).all()


class TestVarint:
    def test_roundtrip_small(self):
        v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40])
        assert list(varint.decode(varint.encode(v))) == list(v)

    def test_roundtrip_random(self):
        rng = np.random.RandomState(7)
        v = rng.randint(0, 2**40, size=10000).astype(np.uint64)
        out = varint.decode(varint.encode(v))
        np.testing.assert_array_equal(out, v)

    def test_empty(self):
        assert varint.encode(np.array([], dtype=np.uint64)) == b""
        assert varint.decode(b"").size == 0

    def test_delta_roundtrip(self):
        docids = np.array([3, 7, 8, 100, 10**7], dtype=np.uint64)
        buf = varint.delta_encode(docids)
        np.testing.assert_array_equal(varint.delta_decode(buf), docids)
        buf2 = varint.delta_encode(docids, first_base=3)
        np.testing.assert_array_equal(varint.delta_decode(buf2, first_base=3), docids)


class TestTokenizer:
    def test_basic(self):
        assert tokenize("Hello, World!") == ["hello", "world"]
        assert tokenize("foo_bar baz-qux") == ["foo_bar", "baz", "qux"]
        assert tokenize("a1b2 C3") == ["a1b2", "c3"]

    def test_empty_and_none(self):
        assert tokenize("") == []
        assert tokenize(None) == []
        assert tokenize("-") == []
        assert tokenize("...") == []

    def test_max_token_split(self):
        long = "x" * 600
        toks = tokenize(long)
        assert toks == ["x" * 255, "x" * 255, "x" * 90]

    def test_truncation_rule(self):
        # reference rule: >32,766 bytes -> 32,753 bytes + marker
        text = "word " * 10000  # 50,000 bytes
        t = truncate_big_field(text)
        assert t.endswith(TRUNCATE_MARK)
        assert len(t.encode()) == 32753 + len(TRUNCATE_MARK)
        assert truncate_big_field("short") == "short"
        # tokenization applies truncation first
        assert len(tokenize(text)) < 10000

    def test_utf8_safe(self):
        text = "é" * 20000  # 40,000 bytes, 2 bytes each -> cut at odd byte
        t = truncate_big_field(text)
        assert t.endswith(TRUNCATE_MARK)
        t.encode("utf-8")  # must not raise


class TestQueryParser:
    def test_term(self):
        assert parse("Error") == Term("error")

    def test_and_or_precedence(self):
        q = parse("a AND b OR c")
        assert q == Or((And((Term("a"), Term("b"))), Term("c")))

    def test_parens(self):
        q = parse("a AND (b OR c)")
        assert q == And((Term("a"), Or((Term("b"), Term("c")))))

    def test_phrase(self):
        assert parse('"connection reset"') == Phrase(("connection", "reset"))
        assert parse('"Error"') == Term("error")

    def test_not(self):
        assert parse("a AND NOT b") == And((Term("a"), Not(Term("b"))))

    def test_errors(self):
        with pytest.raises(ValueError):
            parse("a AND")
        with pytest.raises(ValueError):
            parse("(a OR b")


class TestBm25Math:
    def test_idf_positive_decreasing(self):
        assert bm25.idf(1, 1000) > bm25.idf(100, 1000) > bm25.idf(999, 1000) > 0

    def test_score_monotone_tf(self):
        cache = bm25.norm_inverse_cache(25.0)
        nb = encode_lengths(np.array([25]))
        w = np.float32(2.0)
        s1 = bm25.score_tf(np.array([1]), nb, w, cache)
        s2 = bm25.score_tf(np.array([5]), nb, w, cache)
        assert 0 < s1[0] < s2[0] < w

    def test_score_decreasing_doclen(self):
        cache = bm25.norm_inverse_cache(25.0)
        w = np.float32(2.0)
        short = bm25.score_tf(np.array([2]), encode_lengths(np.array([10])), w, cache)
        long = bm25.score_tf(np.array([2]), encode_lengths(np.array([100])), w, cache)
        assert short[0] > long[0]

    def test_float32_contract(self):
        cache = bm25.norm_inverse_cache(30.0)
        s = bm25.score_tf(np.array([3]), encode_lengths(np.array([17])), np.float32(1.7), cache)
        assert s.dtype == np.float32
        c = bm25.combine([s, s])
        assert c.dtype == np.float32


class TestTokenCountsFastPath:
    def test_matches_tokenize(self):
        import pandas as pd
        from siem_on_amazon_opensearch_service_spark.operators.segments import token_counts

        texts = pd.Series([
            "hello world", "", None, "-", "a_b c-d", "x" * 600,
            "word " * 10000,  # truncation row
            "tok " * 3 + "y" * 300,  # long-run row
        ])
        got = list(token_counts(texts))
        exp = [len(tokenize(t)) for t in texts.fillna("")]
        assert got == exp


class TestRangeAgg:
    """ADVICE r2 item 3: single-edge crash + lexical label ordering."""

    def _df(self, spark):
        return spark.createDataFrame([(v,) for v in [5, 25, 40, 60, 150, 250]], "v int")

    def test_single_edge_is_open_tail_only(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators.aggs import range_agg

        rows = range_agg(self._df(spark), "v", [100]).collect()
        assert [(r["range_key"], r["cnt"]) for r in rows] == [("100-*", 2)]

    def test_buckets_sort_numerically_not_lexically(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators.aggs import range_agg

        rows = range_agg(self._df(spark), "v", [30, 70, 100, 200]).collect()
        # '100-200' < '30-70' lexically; order must be numeric by lo
        # (empty buckets are not emitted, OpenSearch-with-min_doc_count=1 style)
        assert [(r["range_key"], r["cnt"]) for r in rows] == [
            ("30-70", 2),
            ("100-200", 1),
            ("200-*", 1),
        ]

    def test_empty_edges_rejected(self, spark):
        import pytest as _pytest

        from siem_on_amazon_opensearch_service_spark.operators.aggs import range_agg

        with _pytest.raises(ValueError):
            range_agg(self._df(spark), "v", [])


class TestSignificantRareComposite:
    """r4b agg additions: significant_terms (JLH), rare_terms, composite
    pagination, extended_stats."""

    def _ev(self, spark):
        # term 'a' dominates the foreground (flag=1), 'b' the background
        rows = [("a", 1)] * 6 + [("a", 0)] * 2 + [("b", 1)] * 1 + [("b", 0)] * 11 + [("c", 0)] * 4
        return spark.createDataFrame(rows, "term string, flag int")

    def test_significant_terms_jlh(self, spark):
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators.aggs import significant_terms

        got = significant_terms(
            self._ev(spark), "term", F.col("flag") == 1, n=5, min_doc_count=1
        ).collect()
        # only 'a' is over-represented in the foreground: p_fg=6/7 vs
        # p_bg=8/24; 'b' (1/7 < 12/24) and 'c' (0 fg) are dropped
        assert [r["term"] for r in got] == ["a"]
        p_fg, p_bg = 6 / 7, 8 / 24
        assert got[0]["score_r"] == round((p_fg - p_bg) * (p_fg / p_bg), 6)
        assert (got[0]["fg_cnt"], got[0]["bg_cnt"]) == (6, 8)

    def test_rare_terms(self, spark):
        from siem_on_amazon_opensearch_service_spark.operators.aggs import rare_terms

        got = rare_terms(self._ev(spark), "term", max_doc_count=8).collect()
        assert [(r["term"], r["cnt"]) for r in got] == [("c", 4), ("a", 8)]

    def test_composite_pages_tile_the_full_listing(self, spark):
        """Concatenating size-3 pages through the after cursor must equal
        the unpaginated composite listing — the pagination invariant."""
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators.aggs import composite_agg

        df = self._ev(spark)
        srcs = [("term", F.col("term")), ("flag", F.col("flag"))]
        full = composite_agg(df, srcs, size=100)
        all_rows = [(r["term"], r["flag"], r["cnt"]) for r in full.collect()]
        pages, after = [], None
        while True:
            page = composite_agg(df, srcs, size=3, after=after).collect()
            if not page:
                break
            pages += [(r["term"], r["flag"], r["cnt"]) for r in page]
            after = (page[-1]["term"], page[-1]["flag"])
        assert pages == all_rows
        assert len(all_rows) == 5  # a0 a1 b0 b1 c0

    def test_composite_cursor_arity_checked(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from siem_on_amazon_opensearch_service_spark.operators.aggs import composite_agg

        with _pytest.raises(ValueError, match="after cursor"):
            composite_agg(self._ev(spark), [("term", F.col("term"))], after=("a", 1))

    def test_extended_stats_matches_numpy(self, spark):
        import numpy as np

        from siem_on_amazon_opensearch_service_spark.operators.aggs import extended_stats

        vals = [1.0, 2.0, 4.0, 8.0, 16.0]
        df = spark.createDataFrame([(v,) for v in vals], "value double")
        r = extended_stats(df, "value").collect()[0]
        a = np.array(vals)
        assert r["cnt"] == 5 and r["min_r"] == 1.0 and r["max_r"] == 16.0
        assert r["avg_r"] == round(float(a.mean()), 6)
        assert r["variance_r"] == round(float((a * a).mean() - a.mean() ** 2), 6)
        assert r["std_upper_r"] == round(float(a.mean() + 2 * np.sqrt((a * a).mean() - a.mean() ** 2)), 6)
