"""Arrow vs column impl parity for the corpus-scale textstats ops
(text_metrics, token_estimates) — the r4g bandwidth lesson applied: the
facts move to one Arrow pass, the ratio/aggregate arithmetic stays in
shared column expressions, so parity is exact by construction and
asserted here row-for-row."""

import numpy as np
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark, tiny_corpus_pdf):
    pdf = tiny_corpus_pdf[["text"]].copy().reset_index()
    pdf.columns = ["doc_id", "text"]
    # adversarial rows: empty, punctuation-only, tabs/newlines (the Java
    # \s class), long token, stopword-dense
    extra = pd.DataFrame({
        "doc_id": [90001, 90002, 90003, 90004, 90005],
        "text": ["", "!!! ??? ...", "a\tb\nc\r d", "x" * 37,
                 "the a an and or of to in is it"],
    })
    return spark.createDataFrame(pd.concat([pdf, extra], ignore_index=True))


class TestImplParity:
    def test_text_metrics(self, docs):
        a = textstats.text_metrics(docs, impl="arrow").orderBy("doc_id").toPandas()
        c = textstats.text_metrics(docs, impl="column").orderBy("doc_id").toPandas()
        pd.testing.assert_frame_equal(a, c)

    def test_token_estimates(self, docs):
        a = textstats.token_estimates(docs, impl="arrow").toPandas()
        c = textstats.token_estimates(docs, impl="column").toPandas()
        pd.testing.assert_frame_equal(a, c)

    def test_unknown_impl_rejected(self, docs):
        with pytest.raises(ValueError, match="impl"):
            textstats.text_metrics(docs, impl="rdd")
        with pytest.raises(ValueError, match="impl"):
            textstats.token_estimates(docs, impl="rdd")

    def test_bpe_hand_values(self, spark):
        # "hello world!" -> ceil(5/4)+ceil(5/4)=4 word units + 1 punct
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": ["hello world!"]}))
        for impl in ("arrow", "column"):
            row = textstats.token_estimates(df, impl=impl).collect()[0]
            assert row["bpe_tokens"] == 5, impl
            assert row["word_tokens"] == 2, impl
