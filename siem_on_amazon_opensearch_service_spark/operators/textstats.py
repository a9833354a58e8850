"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the per-document text metrics a training-data
pipeline computes alongside dedup (all SQL-expressible, no UDFs, so the
DuckDB oracles can replicate them exactly)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "this", "that"]
STOPWORDS_DE = ["der", "die", "das", "und", "oder", "von", "zu", "in", "ist", "es", "ein", "eine", "mit", "als", "auf"]
STOPWORDS_ES = ["el", "la", "los", "las", "y", "o", "de", "a", "en", "es", "un", "una", "con", "como", "que", "por"]
STOPWORDS_FR = ["le", "la", "les", "et", "ou", "de", "un", "une", "en", "est", "avec", "comme", "que", "pour", "dans"]

FINGERPRINT_MOD = 2**31


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def _stop_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def text_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, punct_ratio, stopword_ratio, quality) —
    quality is a deterministic [0,1] blend: length saturation, low
    punctuation, healthy stopword share (the length/punct/stopword-ratio
    heuristic family)."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alnum = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9_ ]", ""))
    punct_ratio = F.when(n_chars > 0, F.round((n_chars - alnum) / n_chars, 6)).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, F.round(_stop_hits(toks, STOPWORDS_EN) / n_tok, 6)).otherwise(0.0)
    quality = F.round(
        0.4 * F.least(n_tok / F.lit(50.0), F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(stop_ratio * 4.0, F.lit(1.0)),
        6,
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID by stopword-hit counts (en/de/es/fr; tie order
    en > de > es > fr; 'und' = undetermined when no list hits)."""
    toks = tokens_col(F.col(text_col))
    en = _stop_hits(toks, STOPWORDS_EN)
    de = _stop_hits(toks, STOPWORDS_DE)
    es = _stop_hits(toks, STOPWORDS_ES)
    fr = _stop_hits(toks, STOPWORDS_FR)
    best = F.greatest(en, de, es, fr)
    lang = (
        F.when(best == 0, "und")
        .when(en == best, "en")
        .when(de == best, "de")
        .when(es == best, "es")
        .otherwise("fr")
    )
    return df.select(F.col(id_col), lang.alias("lang_pred"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling-hash fingerprint over the token stream:
    acc = (acc*31 + tokval) mod 2^31, tokval from token length + boundary
    chars — pure arithmetic so engine and oracle agree bit-for-bit."""
    toks = tokens_col(F.col(text_col))
    tokval = lambda t: (
        F.length(t) * 131
        + F.ascii(F.substring(t, 1, 1)) * 7
        + F.ascii(t.substr(F.length(t), F.lit(1)))
    )
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + tokval(t)) % F.lit(FINGERPRINT_MOD),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
