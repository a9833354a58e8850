"""Phrase suggester: model build, Stupid Backoff scoring, oracle identity."""

import duckdb
import pytest

from siem_on_amazon_opensearch_service_spark.functions.analysis import tokenize
from siem_on_amazon_opensearch_service_spark.operators import suggest


@pytest.fixture(scope="module")
def parquet(tmp_path_factory, tiny_corpus_pdf):
    p = str(tmp_path_factory.mktemp("suggest") / "corpus.parquet")
    tiny_corpus_pdf.to_parquet(p)
    return p


@pytest.fixture(scope="module")
def model(spark, tiny_index):
    return suggest.build_suggest_model(spark, tiny_index[0])


class TestModel:
    def test_counts_match_python(self, model, tiny_corpus_pdf):
        uni = duckdb.sql(
            f"SELECT term, ttf FROM read_parquet('{model}/unigrams/*.parquet')"
        ).df()
        bi = duckdb.sql(
            f"SELECT w1, w2, cnt FROM read_parquet('{model}/bigrams/*.parquet')"
        ).df()
        from collections import Counter

        u, b = Counter(), Counter()
        for t in tiny_corpus_pdf["text"]:
            toks = tokenize(t)
            u.update(toks)
            b.update(zip(toks, toks[1:]))
        got_u = dict(zip(uni["term"], uni["ttf"]))
        assert got_u == dict(u)
        got_b = {(r.w1, r.w2): r.cnt for r in bi.itertuples()}
        assert got_b == dict(b)

    def test_total_tokens(self, model):
        import json, os

        with open(os.path.join(model, "_model.json")) as f:
            total = json.load(f)["total_tokens"]
        s = duckdb.sql(
            f"SELECT sum(ttf) FROM read_parquet('{model}/unigrams/*.parquet')"
        ).fetchone()[0]
        assert total == s

    def test_idempotent(self, spark, tiny_index, model):
        assert suggest.build_suggest_model(spark, tiny_index[0]) == model


class TestSuggest:
    def test_corrects_misspelling(self, spark, tiny_index, model):
        got = suggest.phrase_suggest(spark, tiny_index[0], "connektion reset")
        assert got, "no suggestions"
        assert got[0][0].startswith("connection ")

    def test_matches_oracle(self, spark, tiny_index, parquet, model):
        for text in ["connektion reset", "connection resef", "errir timeout"]:
            eng = [
                (s, round(p, 8))
                for s, p in suggest.phrase_suggest(spark, tiny_index[0], text)
            ]
            orc = duckdb.sql(suggest.phrase_suggest_sql(parquet, text)).fetchall()
            assert eng == [(s, float(p)) for s, p in orc], text

    def test_seen_bigram_beats_backoff(self, spark, tiny_index, model):
        # 'connection reset' is a corpus phrase: the correct sequence must
        # outrank any candidate pair never seen adjacent
        got = suggest.phrase_suggest(spark, tiny_index[0], "connektion resett")
        assert got[0][0] == "connection reset"

    def test_three_words_engine_only(self, spark, tiny_index, model):
        got = suggest.phrase_suggest(spark, tiny_index[0], "connektion reset error")
        assert got and all(len(s.split()) == 3 for s, _ in got)

    def test_empty_input_raises(self, spark, tiny_index):
        with pytest.raises(ValueError):
            suggest.phrase_suggest(spark, tiny_index[0], "...")

    def test_no_candidates_returns_empty(self, spark, tiny_index, model):
        assert suggest.phrase_suggest(spark, tiny_index[0], "zzzzqqqqxxxx reset") == []

    def test_sequence_guard(self, spark, tiny_index, model):
        # w00042~1 has >5 dictionary variants, so each position carries the
        # full num_candidates=5 -> 5^6 sequences > the 10k guard
        with pytest.raises(ValueError, match="sequences"):
            suggest.phrase_suggest(
                spark, tiny_index[0], " ".join(["w00042"] * 6), num_candidates=5
            )
