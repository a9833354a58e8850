"""Oracle scorer sanity tests on a tiny hand-checkable corpus
(SURVEY.md §5.2 items 1-2)."""

import math

import numpy as np
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.functions.smallfloat import (
    byte4_to_int,
    int_to_byte4,
)
from siem_on_amazon_opensearch_service_spark.operators.oracle import LuceneOracle
from siem_on_amazon_opensearch_service_spark.sources.transcripts import generate_pandas


def corpus(rows):
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": [r[2] for r in rows],
            "text": [r[3] for r in rows],
            "tool": [None] * len(rows),
            "ts": pd.to_datetime(["2025-06-01"] * len(rows)),
        }
    )


@pytest.fixture
def tiny():
    return LuceneOracle(
        corpus(
            [
                ("c1", 0, "system", "error timeout error"),
                ("c1", 1, "user", "connection reset by peer"),
                ("c2", 0, "user", "error"),
                ("c2", 1, "assistant", "timeout while waiting for connection"),
                ("c2", 2, "assistant", ""),
                ("c3", 0, "user", "reset connection reset"),
            ]
        )
    )


class TestOracleBasics:
    def test_docids_stable_order(self, tiny):
        # (conv_id, turn_idx) lexicographic order
        assert list(tiny.meta["conv_id"]) == ["c1", "c1", "c2", "c2", "c2", "c3"]
        assert tiny.n_docs == 6
        assert tiny.doc_count == 5  # empty-text doc excluded from docCount

    def test_term_search_hand_computed(self, tiny):
        hits = tiny.search("error", k=10)
        # doc0: tf=2, dl=3 edges out doc2: tf=1, dl=1 (avgdl=3.2)
        assert [h.docid for h in hits] == [0, 2]
        # hand check doc 2: df=2, N=5 -> idf = ln(1+(5-2+.5)/(2.5))
        idf = math.log(1 + 3.5 / 2.5)
        w = np.float32(idf)
        dl = byte4_to_int(int_to_byte4(1))
        avgdl = tiny.sum_dl / 5
        k_ = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
        expect = np.float32(float(w) - float(w) / (1 + 1.0 * (1.0 / k_)))
        got = {h.docid: h.score for h in hits}
        assert got[2] == pytest.approx(float(expect), abs=0)

    def test_and_or(self, tiny):
        and_hits = tiny.search("error AND timeout", k=10)
        assert [h.docid for h in and_hits] == [0]
        or_hits = tiny.search("error OR timeout", k=10)
        assert sorted(h.docid for h in or_hits) == [0, 2, 3]
        # OR score on doc0 = error + timeout clause scores > AND-only doc
        assert or_hits[0].docid == 0

    def test_not(self, tiny):
        hits = tiny.search("connection AND NOT reset", k=10)
        assert [h.docid for h in hits] == [3]

    def test_phrase(self, tiny):
        hits = tiny.search('"connection reset"', k=10)
        # doc5 (dl=3) outranks doc1 (dl=4); both pf=1
        assert [h.docid for h in hits] == [5, 1]
        # doc5 has "reset connection reset": one adjacency at pos 1->2
        hits2 = tiny.search('"reset connection"', k=10)
        assert [h.docid for h in hits2] == [5]

    def test_filters(self, tiny):
        hits = tiny.search("error", k=10, role="user")
        assert [h.docid for h in hits] == [2]

    def test_tie_break_ascending_docid(self):
        o = LuceneOracle(
            corpus([("a", 0, "u", "same text here"), ("a", 1, "u", "same text here")])
        )
        hits = o.search("same", k=2)
        assert [h.docid for h in hits] == [0, 1]
        assert hits[0].score == hits[1].score


class TestGenerator:
    def test_deterministic(self):
        a = generate_pandas(0.001)
        b = generate_pandas(0.001)
        pd.testing.assert_frame_equal(a, b)

    def test_shape_and_properties(self):
        df = generate_pandas(0.001)
        assert 1500 < len(df) < 2600
        assert set(df.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
        # dense turn_idx per conversation
        g = df.groupby("conv_id")["turn_idx"]
        assert (g.max() + 1 == g.count()).all()
        assert (g.min() == 0).all()
        # hot terms present, phrase present, empty + giant texts present
        joined = " ".join(df["text"].fillna(""))
        assert "error" in joined and "connection reset" in joined
        assert (df["text"] == "").any()
        assert (df["text"] == "-").any()
        # ts monotone within conversation
        assert df.groupby("conv_id")["ts"].apply(lambda s: s.is_monotonic_increasing).all()

    def test_giant_texts_at_larger_sf(self):
        df = generate_pandas(0.01)
        assert (df["text"].str.len() > 32766).any()
