"""Distributed BPE tokenizer training + encoding (LLM-pipeline surface).

Byte-pair encoding (Sennrich et al. 2016, the published algorithm) over
the corpus's analyzer words, Spark-first:

1. ``word_freqs``: ONE corpus scan + one vocabulary-sized shuffle —
   analyzer-split words aggregated to (word, freq).  Everything after
   runs on this frame, which is vocab-sized (~10^7 rows at web scale),
   NOT corpus-sized — the standard reason BPE training is feasible at
   100 TB at all.
2. ``bpe_train``: K merge iterations on the symbol-array frame.  Each
   iteration is (a) adjacent-pair counts weighted by word freq — one
   partial-aggregated groupBy, (b) a driver-side argmax (count desc,
   pair asc tie-break — deterministic), (c) a pure-Column left-to-right
   non-overlapping merge fold over each word's symbol array.  The frame
   is localCheckpoint'ed every few iterations to keep the lineage flat.
   K driver round-trips are inherent to exact BPE (each merge depends on
   the last); batching heuristics exist but change the result — refused
   here, exactness first.
3. ``bpe_encode``: apply learned merges to any text column in one Arrow
   pass (per-word memoized python encode — the trained-tokenizer upgrade
   over textstats' BPE-ish estimator).

Simplifications vs the paper, frozen as this engine's contract (tested
against ``bpe_train_py``, the 20-line reference implementation):
no end-of-word marker, no minimum pair count, ties broken
lexicographically.  Words are the frozen analyzer's tokens
([a-z0-9_]+ after lowering), so symbols are single ASCII chars and a
merged symbol is the literal concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the analyzer's word runs — one scan, one
    vocab-sized shuffle."""
    from ..functions.analysis import SQL_SPLIT_RE

    w = F.explode(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), SQL_SPLIT_RE)
    ).alias("word")
    return (
        df.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_col(syms, a: str, b: str):
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b as a
    pure Column fold: append x unless the accumulator's last symbol is an
    UNCONSUMED ``a`` and x == b.  Non-overlap falls out of the fold: the
    merged symbol a+b no longer equals a, so it can't merge again with a
    following b (matches the reference implementation's re-scan-after-
    the-pair behavior; asserted against bpe_train_py on random corpora)."""
    ab = F.lit(a + b)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_counts(syms_df: DataFrame) -> DataFrame:
    """(a, b, cnt) adjacent-symbol pair counts weighted by word freq —
    the per-iteration aggregate (and the driver row's SQL-oracled
    shape for the first iteration, where symbols are single chars)."""
    # guard single-symbol rows: Spark's sequence(1, 0) is DESCENDING
    # ([1, 0]), not empty — it would fabricate out-of-range pairs
    pairs = syms_df.filter(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").alias("cnt")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list [(a, b), ...].  Stops early when no adjacent pair remains.
    Deterministic: argmax by (count desc, a asc, b asc)."""
    wf = word_freqs(df, text_col)
    syms_df = wf.select(
        "freq",
        F.filter(F.split(F.col("word"), ""), lambda c: c != "").alias("syms"),
    ).filter(F.size("syms") >= 2).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(int(n_merges)):
        top = (
            pair_counts(syms_df)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .first()
        )
        if top is None:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b))
        syms_df = syms_df.select(
            "freq", _merge_col(F.col("syms"), a, b).alias("syms")
        ).filter(F.size("syms") >= 2)
        if (i + 1) % int(checkpoint_every) == 0:
            syms_df = syms_df.localCheckpoint(eager=True)
    return merges


def bpe_train_py(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Frozen reference implementation (the published algorithm with this
    module's tie-break) — the oracle for bpe_train / bpe_encode tests."""
    words = {w: list(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b) = min(counts, key=lambda p: (-counts[p], p))
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with the learned merges (lowest-rank pair first —
    the standard BPE encode order, equivalent to replaying the merges)."""
    syms = list(word)
    while len(syms) >= 2:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_tokens int, tokens array<string>) — encode each text
    with the trained tokenizer in one Arrow pass (per-word memo: Zipfian
    corpora re-encode few distinct words per batch)."""
    import re as _re

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from ..functions.analysis import SQL_SPLIT_RE

    ranks = {p: i for i, p in enumerate(merges)}
    split = _re.compile(SQL_SPLIT_RE)
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_tokens", IntegerType()),
            StructField("tokens", ArrayType(StringType())),
        ]
    )
    src = df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__text")
    )

    def gen(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            nt, toks = [], []
            for t in pdf["__text"].values:
                out: list[str] = []
                for w in split.split(t.lower()):
                    if not w:
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = bpe_encode_word(w, ranks)
                    out.extend(enc)
                nt.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "n_tokens": nt, "tokens": toks}
            )

    return src.mapInPandas(gen, schema)
