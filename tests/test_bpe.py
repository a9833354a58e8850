"""Distributed BPE training/encoding (operators/bpe) vs the frozen
20-line reference implementation — merge lists equal on real and random
corpora, encode equal to replaying the merges, determinism."""

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_word,
    bpe_train,
    bpe_train_py,
    word_freqs,
)


def _wf_dict(spark_df, text_col="text"):
    return {
        r["word"]: r["freq"] for r in word_freqs(spark_df, text_col).collect()
    }


class TestTrain:
    def test_hand_case(self, spark):
        """The canonical Sennrich example shape: 'low lower lowest' family
        — first merges must follow the weighted pair counts."""
        rows = [(i, t) for i, t in enumerate(
            ["low low low", "lower lower", "lowest", "newer newer newer", "new"]
        )]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = bpe_train(df, n_merges=6)
        exp = bpe_train_py(_wf_dict(df), 6)
        assert merges == exp
        # 'lo'/'ow' or 'er'/'ne' families dominate; first merge is the
        # global max pair of the weighted counts
        counts = {}
        for w, f in _wf_dict(df).items():
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + f
        assert merges[0] == min(counts, key=lambda p: (-counts[p], p))

    def test_matches_reference_on_corpus(self, spark, tiny_corpus_pdf):
        df = spark.createDataFrame(tiny_corpus_pdf[["text"]].head(300))
        merges = bpe_train(df, n_merges=25)
        exp = bpe_train_py(_wf_dict(df), 25)
        assert merges == exp and len(merges) == 25

    def test_random_corpora(self, spark):
        rng = np.random.default_rng(11)
        for trial in range(3):
            alphabet = list("abc")
            texts = [
                " ".join(
                    "".join(rng.choice(alphabet, size=rng.integers(1, 7)))
                    for _ in range(rng.integers(1, 12))
                )
                for _ in range(40)
            ]
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
            )
            merges = bpe_train(df, n_merges=12)
            assert merges == bpe_train_py(_wf_dict(df), 12), trial

    def test_early_stop(self, spark):
        """Single-char words exhaust pairs immediately."""
        df = spark.createDataFrame(
            [(0, "a b c a b")], "doc_id long, text string"
        )
        assert bpe_train(df, n_merges=5) == []

    def test_deterministic(self, spark, tiny_corpus_pdf):
        df = spark.createDataFrame(tiny_corpus_pdf[["text"]].head(100))
        a = bpe_train(df, n_merges=8)
        b = bpe_train(df.repartition(7), n_merges=8)
        assert a == b


class TestEncode:
    def test_encode_equals_merge_replay(self, spark):
        """bpe_encode_word's lowest-rank-first loop == replaying the merge
        list in order (the standard equivalence) on random words."""
        rng = np.random.default_rng(5)
        texts = [
            " ".join(
                "".join(rng.choice(list("abcd"), size=rng.integers(2, 9)))
                for _ in range(8)
            )
            for _ in range(30)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        wf = _wf_dict(df)
        merges = bpe_train_py(wf, 15)
        ranks = {p: i for i, p in enumerate(merges)}

        def replay(word):
            syms = list(word)
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        for w in wf:
            assert bpe_encode_word(w, ranks) == replay(w), w

    def test_encode_df(self, spark):
        df = spark.createDataFrame(
            [(0, "lowest lower low"), (1, None), (2, "")],
            "doc_id long, text string",
        )
        merges = bpe_train(df, n_merges=4)
        ranks = {p: i for i, p in enumerate(merges)}
        rows = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
        exp0 = [
            s for w in ["lowest", "lower", "low"] for s in bpe_encode_word(w, ranks)
        ]
        assert list(rows[0]["tokens"]) == exp0
        assert rows[0]["n_tokens"] == len(exp0)
        assert rows[1]["n_tokens"] == 0 and rows[2]["n_tokens"] == 0

    def test_tokens_reconstruct_words(self, spark, tiny_corpus_pdf):
        """Concatenating a word's BPE tokens reproduces the word."""
        df = spark.createDataFrame(tiny_corpus_pdf[["text"]].head(50))
        wf = _wf_dict(df)
        merges = bpe_train_py(wf, 10)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in list(wf)[:200]:
            assert "".join(bpe_encode_word(w, ranks)) == w
