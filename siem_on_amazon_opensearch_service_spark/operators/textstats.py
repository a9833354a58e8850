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


def _text_facts_arrow(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars, n_alnum, n_stop) integer facts in ONE
    Arrow pass — a Python mirror of the column facts (same analyzer
    regex, same char classes).  The column path reads the text through
    three separate JVM regex/array expressions; the single vectorized
    pass wins on bandwidth-bound hosts (the chunking/c4 impl="arrow"
    lesson, BENCH/scaling_r4g.md).  Downstream ratio/quality arithmetic
    stays in shared column expressions over these INTEGER facts, so
    impl parity needs no float recipe at all."""
    import re as _re

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    split = _re.compile(r"[^A-Za-z0-9_]+")
    not_alnum_space = _re.compile(r"[^A-Za-z0-9_ ]")
    stop = set(STOPWORDS_EN)
    id_field = df.schema[id_col]
    schema = StructType([
        id_field,
        StructField("n_tokens", IntegerType()),
        StructField("n_chars", LongType()),
        StructField("n_alnum", LongType()),
        StructField("n_stop", IntegerType()),
    ])
    src = df.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__text"))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            nt, nc, na, ns = [], [], [], []
            for t in pdf["__text"].values:
                toks = [x for x in split.split(t.lower()) if x]
                nt.append(len(toks))
                nc.append(len(t))
                na.append(len(not_alnum_space.sub("", t)))
                ns.append(sum(1 for x in toks if x in stop))
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "n_tokens": nt, "n_chars": nc, "n_alnum": na, "n_stop": ns,
            })

    return src.mapInPandas(gen, schema)


def text_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """(id, n_tokens, n_chars, punct_ratio, stopword_ratio, quality) —
    quality is a deterministic [0,1] blend: length saturation, low
    punctuation, healthy stopword share (the length/punct/stopword-ratio
    heuristic family).

    Two implementations produce IDENTICAL rows (equality-tested):
    ``impl="arrow"`` (default) computes the integer facts in one Arrow
    pass; ``impl="column"`` is the oracle-shaped column reference (three
    JVM text scans — projection collapse re-reads the text per fact).
    Ratios and the quality blend are the SAME column expressions over
    the integer facts in both modes."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    if impl == "arrow":
        facts = _text_facts_arrow(df, id_col, text_col)
    elif impl == "column":
        toks = tokens_col(t)
        facts = df.select(
            F.col(id_col),
            F.size(toks).alias("n_tokens"),
            F.length(t).cast("long").alias("n_chars"),
            F.length(F.regexp_replace(t, "[^A-Za-z0-9_ ]", "")).cast("long").alias("n_alnum"),
            _stop_hits(toks, STOPWORDS_EN).alias("n_stop"),
        )
    else:
        raise ValueError(f"text_metrics: unknown impl {impl!r}")
    n_tok = F.col("n_tokens")
    n_chars = F.col("n_chars")
    punct_ratio = F.when(
        n_chars > 0, F.round((n_chars - F.col("n_alnum")) / n_chars, 6)
    ).otherwise(0.0)
    stop_ratio = F.when(
        n_tok > 0, F.round(F.col("n_stop") / n_tok, 6)
    ).otherwise(0.0)
    quality = F.round(
        0.4 * F.least(n_tok / F.lit(50.0), F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(stop_ratio * 4.0, F.lit(1.0)),
        6,
    )
    return facts.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_pred_col(text: Column, toks: Column | None = None) -> Column:
    """Heuristic language prediction by stopword-hit counts (en/de/es/fr;
    tie order en > de > es > fr; 'und' when no list hits) as a pure
    Column — composable into single-scan pipelines (pass a materialized
    ``toks`` to avoid per-reference re-tokenization; see
    gopher_rule_cols)."""
    toks = tokens_col(text) if toks is None else toks
    en = _stop_hits(toks, STOPWORDS_EN)
    de = _stop_hits(toks, STOPWORDS_DE)
    es = _stop_hits(toks, STOPWORDS_ES)
    fr = _stop_hits(toks, STOPWORDS_FR)
    best = F.greatest(en, de, es, fr)
    return (
        F.when(best == 0, "und")
        .when(en == best, "en")
        .when(de == best, "de")
        .when(es == best, "es")
        .otherwise("fr")
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID by stopword-hit counts (en/de/es/fr; tie order
    en > de > es > fr; 'und' = undetermined when no list hits)."""
    return df.select(
        F.col(id_col), lang_pred_col(F.col(text_col)).alias("lang_pred")
    )


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


#: the Gopher quality-filter stopword list (Rae et al. 2021, "Scaling
#: Language Models: ... Gopher", App. A — the public MassiveWeb rules)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, App. A),
    re-expressed as pure column algebra — the standard pre-training
    corpus filter pass.  Per-doc booleans:

      r_wordcount  50 <= word count <= 100,000
      r_wordlen    3 <= mean word length <= 10
      r_symbol     (#-chars + '...'-occurrences) / words <= 0.1
      r_alpha      >= 80% of words contain an alphabetic character
      r_stopword   >= 2 hits from the 8-word Gopher stop list
      r_bullet     <= 90% of lines start with a bullet
      r_ellipsis   <= 30% of lines end with '...'
      r_dupline    duplicate non-empty line fraction <= 0.3
      passes       AND of all rules

    All thresholds compare doubles produced by exact integer divisions,
    so the SQL oracle agrees bit-for-bit.  (On single-line corpora the
    three line rules are trivially true; they are kept for parity with
    the published rule set.)"""
    r = gopher_rule_cols(F.col(text_col))
    passes = None
    for c in r.values():  # fold from the SAME dict — don't rebuild the
        passes = c if passes is None else (passes & c)  # expression tree
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in r.items()],
        passes.alias("passes"),
    )


def gopher_rule_cols(text: Column, toks: Column | None = None) -> dict:
    """The eight Gopher rule booleans as pure Columns keyed by rule name
    — composable into single-scan pipelines (gopher_rules wraps them).

    Pass ``toks`` (a MATERIALIZED token-array column, e.g. from an
    explode(array()) generator boundary) when composing with other
    token-consuming expressions: each rule references the token array
    several times and Catalyst's projection collapse re-inlines a raw
    tokens_col(text) PER REFERENCE (the first c4 pipeline formulation
    paid ~20 tokenizations/row: 533 s at sf1/local[32] vs 81 s with the
    boundary — measured, BENCH/scaling_r4g.md)."""
    toks = tokens_col(text) if toks is None else toks
    n_tok = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_len = F.when(n_tok > 0, sum_len.cast("double") / n_tok)
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellip = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)
    sym_ratio = F.when(n_tok > 0, (n_hash + n_ellip).cast("double") / n_tok)
    n_alpha = F.size(F.filter(toks, lambda t: F.lower(t) != F.upper(t)))
    alpha_frac = F.when(n_tok > 0, n_alpha.cast("double") / n_tok)
    stop_hits = _stop_hits(toks, GOPHER_STOPWORDS)
    lines = F.filter(F.split(text, "\n"), lambda x: x != "")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda x: x.startswith("- ") | x.startswith("* ") | x.startswith("•"))
    )
    ellip_end = F.size(F.filter(lines, lambda x: x.endswith("...")))
    n_distinct = F.size(F.array_distinct(lines))
    dup_frac = F.when(n_lines > 0, (n_lines - n_distinct).cast("double") / n_lines)

    r = {
        "r_wordcount": (n_tok >= 50) & (n_tok <= 100_000),
        "r_wordlen": F.coalesce((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(False)),
        "r_symbol": F.coalesce(sym_ratio <= 0.1, F.lit(False)),
        "r_alpha": F.coalesce(alpha_frac >= 0.8, F.lit(False)),
        "r_stopword": stop_hits >= 2,
        "r_bullet": F.coalesce(
            bullet.cast("double") / F.when(n_lines > 0, n_lines) <= 0.9, F.lit(True)
        ),
        "r_ellipsis": F.coalesce(
            ellip_end.cast("double") / F.when(n_lines > 0, n_lines) <= 0.3, F.lit(True)
        ),
        "r_dupline": F.coalesce(dup_frac <= 0.3, F.lit(True)),
    }
    return r


def gopher_passes_col(text: Column, toks: Column | None = None) -> Column:
    """AND of all eight Gopher rules as one Column."""
    passes = None
    for c in gopher_rule_cols(text, toks).values():
        passes = c if passes is None else (passes & c)
    return passes


def gopher_summary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-row corpus summary of gopher_rules: doc counts passing overall
    plus per-rule failure counts (the triage view a pipeline dashboards)."""
    r = gopher_rules(df, id_col, text_col)
    rule_cols = [c for c in r.columns if c.startswith("r_")]
    return r.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_pass"),
        *[
            F.sum(F.when(~F.col(c), 1).otherwise(0)).alias(f"fail_{c[2:]}")
            for c in rule_cols
        ],
    )


def _bigrams_col(text: Column) -> Column:
    toks = tokens_col(text)
    n = F.size(toks)
    zipped = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("a"), F.slice(toks, 2, n - 1).alias("b")
    )
    sh = F.transform(zipped, lambda s: F.concat_ws(" ", s["a"], s["b"]))
    return F.when(n >= 2, sh).otherwise(F.array().cast("array<string>"))


def repetition_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics on word 2-grams: the fraction of
    bigram slots taken by the single most frequent bigram, and the
    duplicate-bigram fraction (1 - distinct/total).

    The max multiplicity is computed WITHOUT a per-doc explode+groupBy:
    sort the bigram array and fold once tracking the longest equal run
    (array_sort + aggregate with a struct accumulator — linear per doc,
    whole-stage codegen, no shuffle).  The SQL oracle computes the same
    number by unnest+groupBy; only the RESULT is the contract, not the
    mechanics."""
    sh = _bigrams_col(F.col(text_col))
    n = F.size(sh)
    srt = F.array_sort(sh)
    best = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_distinct = F.size(F.array_distinct(sh))
    top_frac = F.when(n > 0, F.round(best.cast("double") / n, 6)).otherwise(0.0)
    dup_frac = F.when(
        n > 0, F.round((n - n_distinct).cast("double") / n, 6)
    ).otherwise(0.0)
    return df.select(
        F.col(id_col),
        n.alias("n_bigrams"),
        F.when(n > 0, best).otherwise(0).alias("top_bigram_count"),
        top_frac.alias("top_bigram_frac_r"),
        dup_frac.alias("dup_bigram_frac_r"),
    )


#: PII patterns in the RE2/Java-regex common dialect (no backrefs, no
#: lookaround) so Spark regexp_count and DuckDB regexp_extract_all agree;
#: both engines match greedy leftmost non-overlapping.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"\(?[0-9]{3}\)?[ -]?[0-9]{3}-[0-9]{4}",
}


def pii_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc PII hit counts (email / ipv4 / ssn / phone) — the scrub
    pass a training-data pipeline runs before release.  Pure
    regexp_count columns; no UDFs."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        *[
            F.regexp_count(text, F.lit(p)).alias(f"n_{name}")
            for name, p in PII_PATTERNS.items()
        ],
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with a typed placeholder ([EMAIL] etc.),
    applying patterns in the frozen dict order (ssn before phone matters:
    the dialect-common phone pattern would otherwise claim SSN-shaped
    spans that an earlier rule already typed)."""
    out = F.col(text_col)
    for name, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, f"[{name.upper()}]")
    return df.withColumn(text_col, out)


LM_BACKOFF = 0.4


def lm_score(
    df: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score: per document, the mean
    log10 probability of its token stream under a Stupid Backoff bigram
    model trained on ``ref`` (default: the scored corpus itself — the
    self-perplexity outlier detector).  Low scores flag boilerplate-free
    gibberish; high scores flag degenerate repetition — both ends are
    filter candidates.

    Columns: (id, n_tokens, lm_logprob_r); empty docs score NULL.

    Model + scoring are pure DataFrame algebra (no driver-side model):
    unigram/bigram counts are corpus aggregations joined back to the
    per-position token stream; a doc's first token scores ttf/total and
    every next token c(prev,cur)/ttf(prev), backing off to
    0.4*ttf(cur)/total when the bigram is unseen.  Cross-engine
    exactness: each per-position log10 is cast to FLOAT32 (absorbing JVM
    vs libm last-ulp differences), and the per-doc sum is an ORDERED
    fold over the position-sorted list — both engines add in the same
    order, so the rounded mean is bit-identical.  Out-of-vocabulary
    tokens cannot occur when ref == df; with an external ref they raise
    via a loud null-check rather than scoring -inf silently."""
    ref = df if ref is None else ref
    from pyspark.sql.window import Window

    rtok = ref.select(
        F.col(id_col).alias("rid"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "w"),
    )
    uni = rtok.groupBy("w").agg(F.count("*").alias("ttf"))
    total = float(uni.agg(F.sum("ttf")).collect()[0][0] or 0)
    if total == 0:
        raise ValueError("lm_score: reference corpus has no tokens")
    rw = Window.partitionBy("rid").orderBy("pos")
    big = (
        rtok.withColumn("wprev", F.lag("w").over(rw))
        .filter(F.col("wprev").isNotNull())
        .groupBy(F.col("wprev").alias("w1"), F.col("w").alias("w2"))
        .agg(F.count("*").alias("cnt"))
    )

    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(tokens_col(F.col(text_col))).alias("pos", "w")
    )
    toks = toks.withColumn(
        "wprev", F.lag("w").over(Window.partitionBy("id").orderBy("pos"))
    )

    j = (
        toks.join(uni.withColumnRenamed("w", "w_"), F.col("w") == F.col("w_"), "left")
        .drop("w_")
        .withColumnRenamed("ttf", "ttf_cur")
        .join(
            uni.select(F.col("w").alias("wp_"), F.col("ttf").alias("ttf_prev")),
            F.col("wprev") == F.col("wp_"),
            "left",
        )
        .drop("wp_")
        .join(
            big,
            (F.col("wprev") == F.col("w1")) & (F.col("w") == F.col("w2")),
            "left",
        )
    )
    p = F.when(
        F.col("pos") == 0, F.col("ttf_cur").cast("double") / F.lit(total)
    ).otherwise(
        F.when(
            F.col("cnt").isNotNull(),
            F.col("cnt").cast("double") / F.col("ttf_prev").cast("double"),
        ).otherwise(
            F.lit(LM_BACKOFF) * F.col("ttf_cur").cast("double") / F.lit(total)
        )
    )
    scored = j.select(
        "id", "pos", F.log10(p).cast("float").alias("val"), F.col("ttf_cur")
    )
    # loud OOV guard (only reachable with an external ref)
    scored = scored.withColumn(
        "val",
        F.when(
            F.col("ttf_cur").isNull(),
            F.raise_error(F.lit("lm_score: OOV token under external ref")),
        ).otherwise(F.col("val")),
    )
    folded = scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "val"))),
            F.lit(0.0),
            lambda acc, x: acc + x["val"],
        ).alias("s"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(folded, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(F.col("s") / F.col("n_tokens"), 6).alias("lm_logprob_r"),
        )
        .orderBy("id")
    )


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate without a merges table: analyzer
    words cost ceil(len/4) subword units (the ~4-chars-per-BPE-piece rule
    of thumb for English), every non-word non-space character costs one
    token (punctuation is rarely merged).  Deterministic, pure column
    arithmetic — the corpus-budget estimator a training pipeline runs
    over 100 TB before committing to a real tokenizer pass."""
    toks = tokens_col(text)
    word_units = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9_\s]", ""))
    return (word_units + punct.cast("long")).alias("bpe_tokens")


def _token_facts_arrow(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, nt, nb, nc) in ONE Arrow pass: analyzer token count, BPE-ish
    estimate (ceil(len/4) word units + punctuation singletons with the
    exact Java \\s class [ \\t\\n\\x0B\\f\\r] — Python's \\s
    would also eat unicode whitespace), chars.  Mirror of the column
    facts below, equality-tested."""
    import re as _re

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    split = _re.compile(r"[^A-Za-z0-9_]+")
    not_word_ws = _re.compile(r"[^A-Za-z0-9_ \t\n\x0B\f\r]")
    id_field = df.schema[id_col]
    schema = StructType([
        id_field,
        StructField("nt", IntegerType()),
        StructField("nb", LongType()),
        StructField("nc", IntegerType()),
    ])
    src = df.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__text"))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            nt, nb, nc = [], [], []
            for t in pdf["__text"].values:
                toks = [x for x in split.split(t.lower()) if x]
                nt.append(len(toks))
                units = sum((len(x) + 3) // 4 for x in toks)
                nb.append(units + len(not_word_ws.findall(t)))
                nc.append(len(t))
            yield pd.DataFrame({id_col: pdf[id_col].values, "nt": nt, "nb": nb, "nc": nc})

    return src.mapInPandas(gen, schema)


def token_estimates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """Corpus token-budget summary: whitespace-analyzer count vs the
    BPE-ish estimate, total and mean (round-6), chars per BPE token.
    impl="arrow" (default) computes the per-doc facts in one Arrow pass
    (the corpus-scale path); impl="column" is the oracle-shaped column
    reference — identical results, equality-tested."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    if impl == "arrow":
        per = _token_facts_arrow(df, id_col, text_col)
    elif impl == "column":
        per = df.select(
            F.col(id_col),
            token_count(t).alias("nt"),
            bpe_token_estimate(t).alias("nb"),
            F.length(t).alias("nc"),
        )
    else:
        raise ValueError(f"token_estimates: unknown impl {impl!r}")
    return per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("long").alias("word_tokens"),
        F.sum("nb").cast("long").alias("bpe_tokens"),
        F.round(F.avg("nb"), 6).alias("avg_bpe_tokens"),
        F.round(F.sum("nc") / F.sum("nb"), 6).alias("chars_per_bpe_token"),
    )


def c4_pipeline_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """C4-style corpus filter pipeline, end to end in ONE scan: language
    gate (lang_pred == 'en') -> Gopher quality gate -> exact dedup (one
    survivor per md5(text) group; identical text means identical metrics,
    so the keeper choice is immaterial).  One row out: input size,
    per-gate survivor counts, unique-survivor count, surviving token
    budget.

    Scale shape: every gate is a pure column over the single text scan
    (the column builders exist precisely so this composition does NOT
    become three scans + two joins); dedup is one hash aggregation on the
    md5 key; 2 exchanges total."""
    if impl == "arrow":
        # the chunking lesson (BENCH/scaling_r4g.md): one Python pass over
        # Arrow batches beats the JVM per-expression regex/array traffic on
        # bandwidth-bound hosts (sf1/local[32]: 81 s column -> see tests)
        per = _c4_facts_arrow(df.select(F.col(text_col)), text_col)
    elif impl == "column":
        text = F.col(text_col)
        # tokenize ONCE per row behind a generator boundary; every gate
        # then references the materialized array (without it this
        # projection re-tokenized ~20x/row)
        bound = df.select(
            text.alias("__text"),
            F.explode(F.array(tokens_col(text))).alias("__toks"),
        )
        txt, tk = F.col("__text"), F.col("__toks")
        per = bound.select(
            F.md5(txt).alias("h"),
            F.size(tk).alias("nt"),
            (lang_pred_col(txt, tk) == "en").alias("is_en"),
            gopher_passes_col(txt, tk).alias("q"),
        )
    else:
        raise ValueError(f"c4_pipeline_stats: unknown impl {impl!r}")
    # rows sharing an md5 group share text, hence identical nt/is_en/q —
    # so gate tallies AND dedup both fall out of ONE hash aggregation on
    # the md5 key followed by one global fold (2 exchanges, 1 scan)
    groups = per.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("nt").alias("nt"),
        F.first("is_en").alias("is_en"),
        F.first("q").alias("q"),
    )
    keep = F.col("is_en") & F.col("q")
    return groups.agg(
        F.sum("cnt").cast("long").alias("n_input"),
        F.sum(F.when(F.col("is_en"), F.col("cnt")).otherwise(0))
        .cast("long").alias("n_en"),
        F.sum(F.when(keep, F.col("cnt")).otherwise(0))
        .cast("long").alias("n_quality"),
        F.count(F.when(keep, 1)).alias("n_survivors"),
        F.coalesce(F.sum(F.when(keep, F.col("nt"))), F.lit(0))
        .cast("long").alias("survivor_tokens"),
    )


def _c4_facts_arrow(df: DataFrame, text_col: str) -> DataFrame:
    """Arrow-batched (h, nt, is_en, q) facts for the C4 pipeline: a Python
    mirror of the column gates (same analyzer regex, same thresholds, same
    occurrence-counting stopword hits), vectorized per batch.  The JVM
    column path re-reads the text through several regex/array expressions;
    on bandwidth-bound hosts the single Python pass wins (the chunking
    impl="arrow" lesson, BENCH/scaling_r4g.md).  Equality with the column
    path is asserted in tests."""
    import re as _re

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    split = _re.compile(r"[^A-Za-z0-9_]+")
    en, de = set(STOPWORDS_EN), set(STOPWORDS_DE)
    es, fr = set(STOPWORDS_ES), set(STOPWORDS_FR)
    gopher = set(GOPHER_STOPWORDS)
    schema = StructType(
        [
            StructField("h", StringType()),
            StructField("nt", IntegerType()),
            StructField("is_en", BooleanType()),
            StructField("q", BooleanType()),
        ]
    )

    def gen(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            hs, nts, ens, qs = [], [], [], []
            for txt in pdf["__text"].values:
                t = txt or ""
                toks = [x for x in split.split(t.lower()) if x]
                n = len(toks)
                hs.append(hashlib.md5(t.encode("utf-8")).hexdigest())
                nts.append(n)
                c_en = sum(1 for x in toks if x in en)
                c_de = sum(1 for x in toks if x in de)
                c_es = sum(1 for x in toks if x in es)
                c_fr = sum(1 for x in toks if x in fr)
                best = max(c_en, c_de, c_es, c_fr)
                ens.append(best > 0 and c_en == best)
                if n == 0:
                    qs.append(False)
                    continue
                mean_len = sum(len(x) for x in toks) / n
                n_sym = t.count("#") + t.count("...")
                stop_hits = sum(1 for x in toks if x in gopher)
                n_alpha = sum(1 for x in toks if x.lower() != x.upper())
                lines = [l for l in t.split("\n") if l != ""]
                nl = len(lines)
                bullet_ok = (
                    nl == 0
                    or sum(1 for l in lines if l.startswith(("- ", "* ", "•"))) / nl <= 0.9
                )
                ellip_ok = (
                    nl == 0 or sum(1 for l in lines if l.endswith("...")) / nl <= 0.3
                )
                dup_ok = nl == 0 or (nl - len(set(lines))) / nl <= 0.3
                qs.append(
                    50 <= n <= 100_000
                    and 3.0 <= mean_len <= 10.0
                    and n_sym / n <= 0.1
                    and n_alpha / n >= 0.8
                    and stop_hits >= 2
                    and bullet_ok
                    and ellip_ok
                    and dup_ok
                )
            yield pd.DataFrame({"h": hs, "nt": nts, "is_en": ens, "q": qs})

    return df.select(F.col(text_col).alias("__text")).mapInPandas(gen, schema)
