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
            f"SELECT term, ttf FROM {suggest._gram_sources(model, 'unigrams')}"
        ).df()
        bi = duckdb.sql(
            f"SELECT w1, w2, cnt FROM {suggest._gram_sources(model, 'bigrams')}"
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
            f"SELECT sum(ttf) FROM {suggest._gram_sources(model, 'unigrams')}"
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


class TestSuggestAppend:
    """r4e: suggest-model freshness under streaming appends — the gram
    stores are bucketed like dict/postings and appends fold counts in
    with touched-bucket IO (NOTES r4d round-5 candidate 2)."""

    def _halves(self, pdf):
        convs = sorted(pdf["conv_id"].unique())
        cut = convs[len(convs) // 2]
        return pdf[pdf["conv_id"] < cut], pdf[pdf["conv_id"] >= cut]

    def _model_counts(self, model):
        uni = duckdb.sql(
            f"SELECT term, ttf FROM {suggest._gram_sources(model, 'unigrams')} ORDER BY term"
        ).fetchall()
        bi = duckdb.sql(
            f"SELECT w1, w2, cnt FROM {suggest._gram_sources(model, 'bigrams')} ORDER BY w1, w2"
        ).fetchall()
        import json, os

        with open(os.path.join(model, "_model.json")) as f:
            total = json.load(f)["total_tokens"]
        return uni, bi, total

    def test_append_refreshes_model_counts(self, spark, tiny_corpus_pdf, tmp_path):
        from siem_on_amazon_opensearch_service_spark.operators.build import build_index
        from siem_on_amazon_opensearch_service_spark.streaming.incremental import append_batch

        first, second = self._halves(tiny_corpus_pdf)

        oneshot = str(tmp_path / "oneshot")
        build_index(spark, spark.createDataFrame(tiny_corpus_pdf), oneshot, n_shards=8, n_salts=4)
        want = self._model_counts(suggest.build_suggest_model(spark, oneshot))

        grown = str(tmp_path / "grown")
        build_index(spark, spark.createDataFrame(first), grown, n_shards=8, n_salts=4)
        model = suggest.build_suggest_model(spark, grown)
        append_batch(spark, spark.createDataFrame(second), grown)
        assert self._model_counts(model) == want

        # and the query surface agrees end-to-end
        a = suggest.phrase_suggest(spark, oneshot, "connektion reset")
        b = suggest.phrase_suggest(spark, grown, "connektion reset")
        assert a == b

    def test_small_append_touches_few_gram_buckets(self, spark, tiny_corpus_pdf, tmp_path):
        import os

        import pandas as pd

        from siem_on_amazon_opensearch_service_spark.operators.build import build_index
        from siem_on_amazon_opensearch_service_spark.streaming.incremental import append_batch

        out = str(tmp_path / "idx")
        build_index(spark, spark.createDataFrame(tiny_corpus_pdf), out, n_shards=8, n_salts=4)
        model = suggest.build_suggest_model(spark, out)

        def snapshot(sub):
            base = os.path.join(model, sub)
            return {
                (os.path.relpath(os.path.join(root, f), base),
                 os.path.getsize(os.path.join(root, f)),
                 os.stat(os.path.join(root, f)).st_mtime_ns)
                for root, _, files in os.walk(base)
                for f in files
                if f.endswith(".parquet")
            }

        uni_before, bi_before = snapshot("unigrams"), snapshot("bigrams")
        assert len(uni_before) >= 8, "bucketed store expected, bound vacuous otherwise"

        batch = pd.DataFrame(
            {
                "conv_id": ["zz_sg"] * 2,
                "turn_idx": [0, 1],
                "role": ["user", "assistant"],
                "tool": [None, None],
                "ts": pd.to_datetime(["2025-06-01 10:00", "2025-06-01 10:01"]),
                "text": ["qqgramterm qqgramterm", "qqgramterm"],
            }
        )
        r = append_batch(spark, spark.createDataFrame(batch), out)
        assert r["appended"] == 2
        uni_changed = len(snapshot("unigrams") - uni_before)
        bi_changed = len(snapshot("bigrams") - bi_before)
        assert uni_changed / len(uni_before) < 0.5, f"{uni_changed}/{len(uni_before)}"
        assert bi_changed / max(1, len(bi_before)) < 0.5
        # the new unigram is visible with the right count
        got = duckdb.sql(
            f"SELECT ttf FROM {suggest._gram_sources(model, 'unigrams')} "
            "WHERE term = 'qqgramterm'"
        ).fetchone()
        assert got == (3,)

    def test_no_model_append_is_noop(self, spark, tiny_corpus_pdf, tmp_path):
        import os

        from siem_on_amazon_opensearch_service_spark.operators.build import build_index
        from siem_on_amazon_opensearch_service_spark.streaming.incremental import append_batch

        first, second = self._halves(tiny_corpus_pdf)
        out = str(tmp_path / "idx")
        build_index(spark, spark.createDataFrame(first), out, n_shards=8, n_salts=4)
        append_batch(spark, spark.createDataFrame(second), out)
        assert not os.path.exists(os.path.join(out, "suggest"))

    def test_crash_recovery_drops_model(self, spark, tiny_corpus_pdf, tmp_path, monkeypatch):
        """A crash between the suggest fold and the commit point must not
        leave half-folded gram counts readable: the next append's recovery
        drops the model (derived state, rebuilt on demand)."""
        import os

        from siem_on_amazon_opensearch_service_spark.operators.build import build_index
        from siem_on_amazon_opensearch_service_spark.streaming import incremental

        first, second = self._halves(tiny_corpus_pdf)
        out = str(tmp_path / "idx")
        build_index(spark, spark.createDataFrame(first), out, n_shards=8, n_salts=4)
        suggest.build_suggest_model(spark, out)

        real = incremental._write_params

        def boom(path, params):
            raise RuntimeError("injected crash before commit")

        monkeypatch.setattr(incremental, "_write_params", boom)
        with pytest.raises(RuntimeError, match="injected"):
            incremental.append_batch(spark, spark.createDataFrame(second), out)
        monkeypatch.setattr(incremental, "_write_params", real)

        r = incremental.append_batch(spark, spark.createDataFrame(second), out)
        assert r["recovered"] is True
        assert not os.path.exists(os.path.join(out, "suggest"))

        # rebuilt on demand, with the full post-append corpus counts
        oneshot = str(tmp_path / "oneshot")
        build_index(spark, spark.createDataFrame(tiny_corpus_pdf), oneshot, n_shards=8, n_salts=4)
        want = suggest.phrase_suggest(spark, oneshot, "connektion reset")
        assert suggest.phrase_suggest(spark, out, "connektion reset") == want
