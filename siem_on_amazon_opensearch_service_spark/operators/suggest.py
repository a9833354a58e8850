"""OpenSearch phrase suggester (did-you-mean), Spark-first.

The reference's dashboards sit on OpenSearch, whose phrase suggester
re-ranks spelling-candidate sequences with a Stupid Backoff n-gram model
over the index's own term statistics.  Re-expression here:

* **model build** (offline, per index): one distributed pass over the docs
  store tokenizes with the frozen analyzer and partial-counts unigram
  ``ttf`` (total term frequency) and adjacent-bigram counts inside each
  Arrow batch (map-side combine in numpy), then a groupBy-sum — the
  shuffle carries distinct (bi)gram keys, not token instances.  Persisted
  as ``<index>/suggest/{unigrams,bigrams}`` parquet + ``_model.json``.
* **query time** (k-row-sized): candidates per input word come from the
  term dictionary (levenshtein <= max_edits, ranked df desc / term asc,
  top ``num_candidates`` — the ES direct-generator defaults), sequences
  are the cross product (bounded), and each sequence scores

      P(w1) * prod_i P(w_i | w_{i-1})

  with Stupid Backoff: ``bigram/ttf_prev`` when the bigram was seen, else
  ``0.4 * ttf_i / total_tokens``.  All counts are integers and the
  divisions/multiplications run left-to-right in float64, so the DuckDB
  oracle (same arithmetic textually) is bit-identical.
"""

from __future__ import annotations

import itertools
import json
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..functions.analysis import tokenize
from . import segments

BACKOFF = 0.4
MAX_SEQUENCES = 10_000


# ---------------------------------------------------------------------------
# model build

def build_suggest_model(spark: SparkSession, index_dir: str) -> str:
    """Build (or reuse) the Stupid Backoff model for an index.  Idempotent:
    returns the model dir if both tables already exist."""
    out = os.path.join(index_dir, "suggest")
    uni_p, bi_p = os.path.join(out, "unigrams"), os.path.join(out, "bigrams")
    meta_p = os.path.join(out, "_model.json")
    if (
        os.path.exists(os.path.join(uni_p, "_SUCCESS"))
        and os.path.exists(os.path.join(bi_p, "_SUCCESS"))
        and os.path.exists(meta_p)
    ):
        return out

    docs = spark.read.parquet(os.path.join(index_dir, "docs")).select("text")

    def count_batches(batches):
        for pdf in batches:
            toks = segments.tokenize_series(pdf["text"])
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
            if lens.sum() == 0:
                continue
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
            u, uc = np.unique(flat, return_counts=True)
            uni = pd.DataFrame({"w1": u, "w2": None, "cnt": uc})
            # adjacent pairs, masking the seam between consecutive docs
            if len(flat) >= 2:
                keep = np.ones(len(flat) - 1, dtype=bool)
                seams = np.cumsum(lens[lens > 0])[:-1] - 1
                keep[seams] = False
                a, b = flat[:-1][keep], flat[1:][keep]
                if len(a):
                    pair = pd.DataFrame({"w1": a, "w2": b})
                    bi = (
                        pair.groupby(["w1", "w2"], sort=False)
                        .size()
                        .reset_index(name="cnt")
                    )
                    yield pd.concat([uni, bi], ignore_index=True)
                    continue
            yield uni

    counted = (
        docs.mapInPandas(count_batches, schema="w1 string, w2 string, cnt long")
        .groupBy("w1", "w2")
        .agg({"cnt": "sum"})
        .withColumnRenamed("sum(cnt)", "cnt")
    )
    counted.persist()
    counted.filter("w2 IS NULL").selectExpr("w1 AS term", "cnt AS ttf").write.mode(
        "overwrite"
    ).parquet(uni_p)
    counted.filter("w2 IS NOT NULL").write.mode("overwrite").parquet(bi_p)
    import duckdb

    total = duckdb.sql(
        f"SELECT CAST(sum(ttf) AS BIGINT) FROM read_parquet('{uni_p}/*.parquet')"
    ).fetchone()[0]
    counted.unpersist()
    with open(meta_p, "w") as f:
        json.dump({"total_tokens": int(total)}, f)
    return out


# ---------------------------------------------------------------------------
# query time

def _candidates(index_dir: str, word: str, max_edits: int, num: int) -> list[str]:
    import duckdb

    from .search import _dict_sources

    q = word.replace("'", "''")
    rows = duckdb.sql(
        f"SELECT term FROM {_dict_sources(index_dir)} "
        f"WHERE abs(length(term) - {len(word)}) <= {max_edits} "
        f"AND levenshtein(term, '{q}') <= {max_edits} "
        f"ORDER BY df DESC, term ASC LIMIT {num}"
    ).fetchall()
    return [r[0] for r in rows]


def phrase_suggest(
    spark: SparkSession,
    index_dir: str,
    text: str,
    max_edits: int = 1,
    num_candidates: int = 5,
    n: int = 5,
) -> list[tuple[str, float]]:
    """Top-``n`` (suggestion, score) corrections for ``text``.  Driver-side
    after the candidate/count lookups: the model and dictionary reads are
    pushed-down IN/levenshtein scans; sequence enumeration is bounded by
    num_candidates^words (MAX_SEQUENCES guard)."""
    import duckdb

    words = tokenize(text)
    if not words:
        raise ValueError("phrase_suggest: empty input after analysis")
    model = build_suggest_model(spark, index_dir)
    cands = [_candidates(index_dir, w, max_edits, num_candidates) for w in words]
    if any(not c for c in cands):
        return []
    n_seq = 1
    for c in cands:
        n_seq *= len(c)
    if n_seq > MAX_SEQUENCES:
        raise ValueError(
            f"phrase_suggest: {n_seq} candidate sequences exceeds {MAX_SEQUENCES}; "
            f"lower num_candidates or shorten the input"
        )
    with open(os.path.join(model, "_model.json")) as f:
        total = float(json.load(f)["total_tokens"])
    all_terms = sorted({t for c in cands for t in c})
    tl = ",".join("'" + t.replace("'", "''") + "'" for t in all_terms)
    uni = dict(
        duckdb.sql(
            f"SELECT term, ttf FROM read_parquet('{model}/unigrams/*.parquet') "
            f"WHERE term IN ({tl})"
        ).fetchall()
    )
    pairs = [
        (a, b)
        for i in range(len(cands) - 1)
        for a in cands[i]
        for b in cands[i + 1]
    ]
    bi: dict[tuple[str, str], int] = {}
    if pairs:
        pl = ",".join(
            "('" + a.replace("'", "''") + "','" + b.replace("'", "''") + "')"
            for a, b in sorted(set(pairs))
        )
        bi = {
            (a, b): c
            for a, b, c in duckdb.sql(
                f"SELECT w1, w2, cnt FROM read_parquet('{model}/bigrams/*.parquet') "
                f"WHERE (w1, w2) IN ({pl})"
            ).fetchall()
        }
    scored = []
    for seq in itertools.product(*cands):
        p = float(uni.get(seq[0], 0)) / total
        for prev, cur in zip(seq, seq[1:]):
            c = bi.get((prev, cur), 0)
            if c > 0:
                p = p * (float(c) / float(uni[prev]))
            else:
                p = p * (BACKOFF * float(uni.get(cur, 0)) / total)
        scored.append((" ".join(seq), p))
    # page on the ROUNDED score (the display contract) so the top-n cut
    # is identical to the oracle's ORDER BY score_r
    scored.sort(key=lambda t: (-round(t[1], 8), t[0]))
    return scored[:n]


def phrase_suggest_df(
    spark: SparkSession,
    index_dir: str,
    text: str,
    max_edits: int = 1,
    num_candidates: int = 5,
    n: int = 5,
) -> DataFrame:
    rows = [
        (s, round(p, 8))
        for s, p in phrase_suggest(
            spark, index_dir, text, max_edits, num_candidates, n
        )
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["suggestion", "score_r"]).astype(
            {"suggestion": "string", "score_r": "float64"}
        )
    )


# ---------------------------------------------------------------------------
# SQL oracle (2-word form; wider inputs are pytest-verified engine-side)

def phrase_suggest_sql(
    path: str,
    text: str,
    max_edits: int = 1,
    num_candidates: int = 5,
    n: int = 5,
) -> str:
    """DuckDB oracle deriving the WHOLE pipeline independently from the
    corpus parquet: analyzer CTEs -> df-ranked levenshtein candidates per
    position -> bigram/unigram counts -> Stupid Backoff product.  Returns
    (suggestion VARCHAR, score_r DOUBLE)."""
    from .sqloracle import _base_ctes

    words = tokenize(text)
    if len(words) != 2:
        raise NotImplementedError("SQL oracle renders the 2-word form")
    w0 = words[0].replace("'", "''")
    w1 = words[1].replace("'", "''")
    return f"""WITH RECURSIVE {_base_ctes(path)},
uni AS (SELECT term, count(*) AS ttf FROM tok GROUP BY term),
total AS (SELECT CAST(sum(ttf) AS DOUBLE) AS t FROM uni),
vocab AS (SELECT term, count(DISTINCT docid) AS df FROM tok GROUP BY term),
big AS (
  SELECT a.term AS w1, b.term AS w2, count(*) AS cnt
  FROM tok a JOIN tok b ON a.docid = b.docid AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
c0 AS (SELECT term FROM vocab
       WHERE abs(length(term) - {len(words[0])}) <= {max_edits}
         AND levenshtein(term, '{w0}') <= {max_edits}
       ORDER BY df DESC, term ASC LIMIT {num_candidates}),
c1 AS (SELECT term FROM vocab
       WHERE abs(length(term) - {len(words[1])}) <= {max_edits}
         AND levenshtein(term, '{w1}') <= {max_edits}
       ORDER BY df DESC, term ASC LIMIT {num_candidates}),
seqs AS (
  SELECT c0.term AS t0, c1.term AS t1,
         (SELECT CAST(ttf AS DOUBLE) FROM uni WHERE term = c0.term) AS ttf0,
         (SELECT CAST(ttf AS DOUBLE) FROM uni WHERE term = c1.term) AS ttf1,
         (SELECT CAST(cnt AS DOUBLE) FROM big
           WHERE w1 = c0.term AND w2 = c1.term) AS bg
  FROM c0 CROSS JOIN c1
)
SELECT suggestion, score_r FROM (
  SELECT t0 || ' ' || t1 AS suggestion,
         round(CAST(
           (ttf0 / (SELECT t FROM total)) *
           (CASE WHEN bg IS NOT NULL AND bg > 0 THEN bg / ttf0
                 ELSE {BACKOFF!r} * ttf1 / (SELECT t FROM total) END)
         AS DOUBLE), 8) AS score_r
  FROM seqs
  ORDER BY score_r DESC, suggestion ASC
  LIMIT {n}
)"""
