"""Lucene-compatible BM25 scoring math (frozen numerics).

The reference never overrides ``similarity`` in any OpenSearch index
template (/root/reference/source/lambda/deploy_es/data.ini — verified by
grep), so its search layer scores with Lucene's default BM25:

    idf(t)   = ln(1 + (docCount - df + 0.5) / (df + 0.5))
    K(d)     = k1 * (1 - b + b * dl'(d) / avgdl),  k1=1.2, b=0.75
    s(t, d)  = weight - weight / (1 + tf * (1/K(d)))        # == w*tf/(tf+K)
    weight   = float32(idf)          (boost = 1)
    dl'(d)   = byte4ToInt(intToByte4(dl))   -- lossy SmallFloat norm
    avgdl    = sumTotalTermFreq / docCount  (true lengths, float64)

Frozen rounding contract (engine == oracle == SQL oracles, bit-exact):
per-(term,doc) score is computed in float64 from the float32 weight and the
float64 norm-inverse, then rounded once to float32; a multi-clause score is
the float64 sum of the per-clause float32 scores, rounded once to float32.
Ties in top-k break by ascending docID (Lucene TopScoreDocCollector).

docCount counts documents with at least one token (Lucene field docCount);
a phrase clause's weight is float32(sum of its terms' float64 idfs) and its
tf is the phrase frequency (Lucene PhraseWeight).
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE

K1 = 1.2
B = 0.75


def idf(df: int, doc_count: int) -> float:
    """float64 idf; callers round to float32 when forming a clause weight.

    Computed as log(1 + x) — NOT log1p(x) — to match Lucene's
    ``Math.log(1 + ...)`` and SQL ``ln(1 + ...)`` bit-for-bit."""
    return float(np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)))


def clause_weight(dfs: list[int], doc_count: int) -> np.float32:
    """weight for a term (one df) or phrase (sum of term idfs)."""
    return np.float32(sum(idf(d, doc_count) for d in dfs))


def grouped_weight(slot_dfs: list[list[int]], doc_count: int) -> np.float32:
    """MultiPhrase (match_phrase_prefix) weight: per-slot float64 idf
    subtotal (sequential fold from 0.0 over the slot's terms in order),
    then a sequential fold of the subtotals across slots.  This grouped
    association — NOT a flat sum over all terms — is what the SQL oracle
    reproduces (fixed singleton slots as a textual left-associated sum,
    the expansion slot as an ordered list_reduce fold), so engine and
    oracle stay bit-identical.  For all-singleton slots the grouping is
    a no-op ((0.0 + x) == x in IEEE) and this equals ``clause_weight``."""
    total = 0.0
    for dfs in slot_dfs:
        sub = 0.0
        for d in dfs:
            sub += idf(d, doc_count)
        total += sub
    return np.float32(total)


def norm_inverse_cache(avgdl: float) -> np.ndarray:
    """256-entry float64 cache: 1 / K(decoded_length) per norm byte."""
    return 1.0 / (K1 * ((1.0 - B) + B * LENGTH_TABLE.astype(np.float64) / float(avgdl)))


def score_tf(tf: np.ndarray, norm_bytes: np.ndarray, weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """Vectorized per-doc clause score -> float32 array."""
    ninv = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    w = np.float64(weight)
    s = w - w / (1.0 + np.asarray(tf, dtype=np.float64) * ninv)
    return s.astype(np.float32)


def combine(clause_scores: list[np.ndarray]) -> np.ndarray:
    """Sum float32 clause scores in float64, round once to float32."""
    acc = np.zeros(clause_scores[0].shape, dtype=np.float64)
    for s in clause_scores:
        acc += s.astype(np.float64)
    return acc.astype(np.float32)


def sql_score_expr(tf_expr: str, dl_expr: str, weight_expr: str, avgdl_expr: str) -> str:
    """DuckDB-SQL rendering of the same frozen arithmetic.

    ``dl_expr`` must already be the lossy-decoded length (see
    smallfloat.sql_decode_case).  Produces a FLOAT (float32) column.

    normInverse = 1/K is computed first and then multiplied by tf — the
    same operation order as Lucene's cached normInverse and score_tf();
    (tf * (1/K)) and (tf / K) can differ in the last ulp.
    """
    k = f"({K1} * ((1 - {B}) + {B} * CAST({dl_expr} AS DOUBLE) / ({avgdl_expr})))"
    return (
        f"CAST(CAST({weight_expr} AS DOUBLE) - CAST({weight_expr} AS DOUBLE) / "
        f"(1 + CAST({tf_expr} AS DOUBLE) * (1.0 / {k})) AS FLOAT)"
    )


def sql_idf_expr(df_expr: str, doc_count_expr: str) -> str:
    """float32 clause weight for a single term in SQL."""
    return (
        f"CAST(ln(1 + (CAST({doc_count_expr} AS DOUBLE) - {df_expr} + 0.5) / "
        f"({df_expr} + 0.5)) AS FLOAT)"
    )
