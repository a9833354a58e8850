"""Repetition metrics (sorted-run max multiplicity) + PII stats/redaction."""

import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators import textstats


class TestRepetition:
    def test_hand_computed(self, spark):
        pdf = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [
                "a b a b a c",        # bigrams: ab,ba,ab,ba,ac -> top 'a b'x2 of 5
                "x y",                # one bigram
                "solo",               # no bigrams
            ],
        })
        r = {row["doc_id"]: row for row in
             textstats.repetition_metrics(spark.createDataFrame(pdf)).collect()}
        assert (r[1]["n_bigrams"], r[1]["top_bigram_count"]) == (5, 2)
        assert r[1]["top_bigram_frac_r"] == round(2 / 5, 6)
        # distinct bigrams: ab, ba, ac -> dup frac (5-3)/5
        assert r[1]["dup_bigram_frac_r"] == round(2 / 5, 6)
        assert (r[2]["n_bigrams"], r[2]["top_bigram_count"]) == (1, 1)
        assert (r[3]["n_bigrams"], r[3]["top_bigram_frac_r"]) == (0, 0.0)

    def test_max_run_equals_pandas_mode(self, spark, tiny_corpus_pdf):
        """The fold's max-run must equal the true max bigram multiplicity
        (independent pandas recount) on real text."""
        from siem_on_amazon_opensearch_service_spark.functions.analysis import tokenize

        sample = tiny_corpus_pdf.head(300).copy()
        sample["doc_id"] = range(len(sample))
        df = spark.createDataFrame(sample[["doc_id", "text"]])
        got = {r["doc_id"]: r["top_bigram_count"]
               for r in textstats.repetition_metrics(df).collect()}
        from collections import Counter

        for i, t in enumerate(sample["text"]):
            toks = tokenize(t)
            bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            exp = max(Counter(bgs).values()) if bgs else 0
            assert got[i] == exp, i


class TestPII:
    def test_counts(self, spark):
        pdf = pd.DataFrame({
            "doc_id": [1],
            "text": ["a.b@x.io c@d.org 10.0.0.1 999.1.1.1 123-45-6789 "
                     "(555)123-4567 555 123-4567"],
        })
        row = textstats.pii_stats(spark.createDataFrame(pdf)).collect()[0]
        assert row["n_email"] == 2
        assert row["n_ipv4"] == 2  # the pattern is shape-only, 999 matches
        assert row["n_ssn"] == 1
        assert row["n_phone"] == 2

    def test_matches_duckdb(self, spark, tiny_corpus_pdf):
        """Cross-engine regex-dialect check on real text: Spark
        regexp_count == DuckDB regexp_extract_all length for every
        pattern."""
        import duckdb

        sample = tiny_corpus_pdf.head(500).copy()
        sample["doc_id"] = range(len(sample))
        df = spark.createDataFrame(sample[["doc_id", "text"]])
        got = textstats.pii_stats(df).toPandas().set_index("doc_id")
        con = duckdb.connect()
        con.register("t", sample[["doc_id", "text"]])
        for name, pat in textstats.PII_PATTERNS.items():
            exp = con.sql(
                f"SELECT doc_id, len(regexp_extract_all(text, '{pat}')) AS c "
                f"FROM t ORDER BY doc_id"
            ).df().set_index("doc_id")["c"]
            assert (got[f"n_{name}"] == exp).all(), name

    def test_redaction(self, spark):
        pdf = pd.DataFrame({
            "doc_id": [1],
            "text": ["mail a.b@x.io ssn 123-45-6789 phone (555)123-4567"],
        })
        out = textstats.pii_redact(spark.createDataFrame(pdf)).collect()[0]["text"]
        assert "[EMAIL]" in out and "[SSN]" in out and "[PHONE]" in out
        assert "a.b@x.io" not in out and "123-45-6789" not in out

    def test_ssn_redacted_before_phone(self, spark):
        """Rule order: the SSN rule types 3-2-4 spans before the phone
        rule can touch them."""
        pdf = pd.DataFrame({"doc_id": [1], "text": ["id 123-45-6789 end"]})
        out = textstats.pii_redact(spark.createDataFrame(pdf)).collect()[0]["text"]
        assert out == "id [SSN] end"


class TestLmScore:
    """r4e: Stupid Backoff bigram LM quality score."""

    def test_hand_computed_two_docs(self, spark):
        import math

        import numpy as np
        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators import textstats

        # corpus: "a b a b" and "a c"  -> ttf: a=3 b=2 c=1, total=6
        # bigrams: (a,b)=2 (b,a)=1 (a,c)=1
        pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a b a b", "a c"]})
        got = textstats.lm_score(spark.createDataFrame(pdf)).toPandas()

        def f32log10(x):
            return float(np.float32(math.log10(x)))

        d1 = [3 / 6, 2 / 3, 1 / 2, 2 / 3]  # P(a), P(b|a), P(a|b), P(b|a)
        d2 = [3 / 6, 1 / 3]  # P(a), P(c|a)
        want1 = round(sum(f32log10(p) for p in d1) / 4, 6)
        want2 = round(sum(f32log10(p) for p in d2) / 2, 6)
        assert got.n_tokens.tolist() == [4, 2]
        assert got.lm_logprob_r.tolist() == [want1, want2]

    def test_unseen_bigram_backs_off(self, spark):
        import math

        import numpy as np
        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators import textstats

        # score "b a" against ref "a b": bigram (b,a) unseen -> backoff
        ref = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": ["b a"]}))
        got = textstats.lm_score(df, ref=ref).toPandas()
        p = [1 / 2, 0.4 * 1 / 2]  # P(b), backoff 0.4*ttf(a)/total
        want = round(sum(float(np.float32(math.log10(x))) for x in p) / 2, 6)
        assert got.lm_logprob_r.tolist() == [want]

    def test_empty_doc_scores_null(self, spark):
        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators import textstats

        pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", ""]})
        got = textstats.lm_score(spark.createDataFrame(pdf)).toPandas()
        assert got.n_tokens.tolist() == [2, 0]
        assert pd.isna(got.lm_logprob_r[1])

    def test_oov_under_external_ref_raises(self, spark):
        import pandas as pd
        import pytest as _pt

        from siem_on_amazon_opensearch_service_spark.operators import textstats

        ref = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": ["zz"]}))
        with _pt.raises(Exception, match="OOV"):
            textstats.lm_score(df, ref=ref).collect()

    def test_repetitive_doc_scores_higher(self, spark):
        """Degenerate repetition inflates bigram probabilities — the
        high-end filter signal."""
        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators import textstats

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["spam spam spam spam spam spam", "the quick brown fox jumps high"],
            }
        )
        got = textstats.lm_score(spark.createDataFrame(pdf)).toPandas()
        by = dict(zip(got.id, got.lm_logprob_r))
        assert by[1] > by[2]
