"""Sequence packing: bin documents into fixed-token-budget training
sequences.

LLM pretraining consumes fixed-length context windows; feeding one short
document per window wastes most of the budget, so pipelines PACK
documents into sequences near the token capacity (the "sequence
packing" / "example packing" step; greedy next-fit is the standard
streaming heuristic — see e.g. the T5 and GPT-NeoX data pipelines).

Packing is inherently sequential (each placement depends on the running
fill), so the distributed form shards the corpus into deterministic
md5 hash buckets (operators/sampling conventions) and packs WITHIN each
bucket independently — embarrassingly parallel across buckets, stable
under reruns/repartitioning/appends-at-the-tail, and the per-bucket
sequential pass is the unavoidable core of the semantics.  At 10^12
docs: choose n_buckets ~ cluster cores x small constant; each bucket's
pass is a single Arrow batch stream through applyInPandas.

Frozen next-fit contract (mirrored step-for-step by the recursive-CTE
DuckDB oracle): within a bucket, docs in ascending id order; place the
doc in the current bin unless it would overflow a NON-EMPTY bin, else
open a new bin.  Oversized docs (n_tokens > capacity) therefore always
open (and overflow) their own bin — they are flagged, not truncated;
truncation policy belongs upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_bucket(id_col: Column, n_buckets: int) -> Column:
    """First 8 md5 hex digits of the id's string form, mod n_buckets —
    the sampling module's arithmetic, reproduced verbatim in SQL."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % n_buckets).cast("int")


def pack_sequences(
    df: DataFrame,
    capacity: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str | None = None,
) -> DataFrame:
    """(id_col, n_tokens, bucket, bin_id) — next-fit packing per hash
    bucket.  ``length_col`` supplies precomputed token counts; otherwise
    tokens = the frozen analyzer's token array length over ``text_col``
    (the same count the index's doc lengths use)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if length_col is not None:
        n_tok = F.col(length_col).cast("long")
    else:
        from .percolate import tokens_col

        n_tok = F.size(tokens_col(F.col(text_col))).cast("long")
    base = df.select(
        F.col(id_col).alias("__id"),
        n_tok.alias("n_tokens"),
        _md5_bucket(F.col(id_col), n_buckets).alias("bucket"),
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        sizes = pdf["n_tokens"].to_numpy(dtype=np.int64)
        bins = np.empty(len(sizes), dtype=np.int64)
        bin_id, fill = 0, 0
        for i, n in enumerate(sizes):
            if fill > 0 and fill + n > capacity:
                bin_id += 1
                fill = 0
            bins[i] = bin_id
            fill += n
        pdf["bin_id"] = bins
        return pdf

    out = base.groupBy("bucket").applyInPandas(
        pack, schema="__id long, n_tokens long, bucket int, bin_id long"
    )
    return out.select(
        F.col("__id").alias(id_col), "n_tokens", "bucket", "bin_id"
    )


def packing_stats(
    packed: DataFrame, capacity: int, id_col: str = "doc_id"
) -> DataFrame:
    """One-row packing summary: docs, bins, mean bin fill fraction
    (round-6), max docs in a bin, and the oversized-doc count."""
    bins = packed.groupBy("bucket", "bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("docs")
    )
    return bins.agg(
        F.sum("docs").alias("n_docs"),
        F.count("*").alias("n_bins"),
        F.round(
            F.sum("fill").cast("double") / (F.count("*") * F.lit(float(capacity))), 6
        ).alias("avg_fill"),
        F.max("docs").alias("max_bin_docs"),
        F.sum(F.when(F.col("fill") > capacity, 1).otherwise(0)).alias("overflow_bins"),
    )


def pack_sql(
    source: str,
    capacity: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB CTE chain ending in ``packed(docid, n_tokens, bucket,
    bin_id)`` — the recursive next-fit, one step per doc per bucket, the
    exact engine contract.  ``source`` is a relation name or .parquet
    path."""
    from ..functions.analysis import SQL_SPLIT_RE, sql_truncate_expr

    rel = f"read_parquet('{source}')" if source.endswith(".parquet") else source
    trunc = sql_truncate_expr(text_col)
    return f"""
pk_base AS (
  SELECT {id_col} AS docid,
         len(list_filter(string_split_regex(lower(coalesce({trunc}, '')),
             '{SQL_SPLIT_RE}'), x -> x <> '')) AS n_tokens,
         CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)) AS BIGINT)
           % {int(n_buckets)} AS bucket
  FROM {rel}
),
pk_t AS (
  SELECT docid, n_tokens, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY docid) AS rn
  FROM pk_base
),
pk_r AS (
  SELECT bucket, rn, docid, n_tokens,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
  FROM pk_t WHERE rn = 1
  UNION ALL
  SELECT t.bucket, t.rn, t.docid, t.n_tokens,
         CASE WHEN r.fill > 0 AND r.fill + t.n_tokens > {int(capacity)}
              THEN r.bin_id + 1 ELSE r.bin_id END,
         CASE WHEN r.fill > 0 AND r.fill + t.n_tokens > {int(capacity)}
              THEN t.n_tokens ELSE r.fill + t.n_tokens END
  FROM pk_r r JOIN pk_t t ON t.bucket = r.bucket AND t.rn = r.rn + 1
),
packed AS (SELECT docid, n_tokens, bucket, bin_id FROM pk_r)"""


#: span-corruption start-threshold denominator: u(doc,pos) is a 32-bit
#: md5-derived integer, compared against floor(rate * 2^32) — integer
#: comparison, no float thresholds to diverge cross-engine
_U_SPACE = 1 << 32


def denoising_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
    mean_span: int = 3,
) -> DataFrame:
    """T5-shaped span-corruption pairs: (id, input_text, target_text,
    n_spans, n_masked) — the denoising-objective example constructor of
    an LLM training pipeline, DETERMINISTIC per (doc, position) so the
    corpus re-masks identically under reruns, repartitioning, and
    appends.

    Frozen contract (T5-SHAPED, not byte-parity with T5's sequential
    RNG — the randomness source is documented md5 arithmetic instead):

    * u(doc, pos) = int(first 8 md5 hex of "<id>:<pos>"), a 32-bit
      uniform; position pos STARTS a span iff u < floor(start_rate *
      2^32) with start_rate = mask_rate / mean_span (expected masked
      fraction ~= mask_rate before overlap merging).
    * a position is MASKED iff some start lies in the preceding
      mean_span positions (fixed span length; overlaps merge into runs).
    * run k (1-based, in position order) renders as sentinel
      ``<extra_id_{k-1}>`` — once in the input (replacing the run) and
      once in the target (prefixing the run's tokens).  No trailing
      final sentinel (T5 appends one; documented divergence).
    * docs with zero analyzer tokens are dropped.

    Execution: u and start flags are JVM column arithmetic (one md5 per
    token); run merging / sentinel numbering / string assembly is a
    vectorized Arrow stage (numpy cumsum — sequential only in the sense
    every per-doc op is).  One tokenize pass, one shuffle-free
    mapInPandas; the DuckDB oracle derives the identical pairs with
    window functions."""
    from .percolate import tokens_col

    if not 0.0 < mask_rate < 1.0:
        raise ValueError(f"mask_rate {mask_rate} outside (0, 1)")
    if mean_span < 1:
        raise ValueError(f"mean_span must be >= 1, got {mean_span}")
    thresh = int((mask_rate / mean_span) * _U_SPACE)
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col).cast("long").alias("__id"), toks.alias("__toks")
    ).filter(F.size("__toks") > 0)
    ids = F.col("__id").cast("string")
    starts = F.transform(
        F.col("__toks"),
        lambda x, i: (
            F.conv(
                F.substring(F.md5(F.concat(ids, F.lit(":"), i.cast("string"))), 1, 8),
                16, 10,
            ).cast("long")
            < F.lit(thresh)
        ).cast("int"),
    )
    staged = base.withColumn("__starts", starts)

    L = int(mean_span)

    def assemble(batches):
        for pdf in batches:
            rows = []
            for _id, tk, st in zip(pdf["__id"], pdf["__toks"], pdf["__starts"]):
                tk = list(tk)
                st = np.asarray(st, dtype=np.int64)
                n = len(tk)
                flag = np.zeros(n, dtype=bool)
                for j in range(L):
                    flag[j:] |= st[: n - j].astype(bool)
                runstart = flag & ~np.concatenate(([False], flag[:-1]))
                k = np.cumsum(runstart)
                inp, tgt = [], []
                for p in range(n):
                    if not flag[p]:
                        inp.append(tk[p])
                        continue
                    if runstart[p]:
                        s = f"<extra_id_{int(k[p]) - 1}>"
                        inp.append(s)
                        tgt.append(s)
                    tgt.append(tk[p])
                rows.append(
                    (int(_id), " ".join(inp), " ".join(tgt),
                     int(runstart.sum()), int(flag.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["__id", "input_text", "target_text", "n_spans", "n_masked"],
            )

    out = staged.mapInPandas(
        assemble,
        schema="__id long, input_text string, target_text string, "
               "n_spans long, n_masked long",
    )
    return out.select(
        F.col("__id").alias(id_col),
        "input_text", "target_text", "n_spans", "n_masked",
    )


def denoising_sql(
    source: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
    mean_span: int = 3,
) -> str:
    """DuckDB CTE chain ending in ``dn_pairs(docid, input_text,
    target_text, n_spans, n_masked)`` — the identical contract via
    window functions (flag = windowed max of starts, runs via lag,
    sentinel ids via running sum, strings via ordered string_agg)."""
    from ..functions.analysis import SQL_SPLIT_RE, sql_truncate_expr

    rel = f"read_parquet('{source}')" if source.endswith(".parquet") else source
    trunc = sql_truncate_expr(text_col)
    thresh = int((mask_rate / mean_span) * _U_SPACE)
    L = int(mean_span)
    return f"""
dn_tok AS (
  SELECT docid, term, row_number() OVER (PARTITION BY docid ORDER BY pre_pos) - 1 AS pos
  FROM (
    SELECT {id_col} AS docid, unnest(t) AS term, generate_subscripts(t, 1) AS pre_pos
    FROM (
      SELECT {id_col},
             list_filter(string_split_regex(lower(coalesce({trunc}, '')),
                 '{SQL_SPLIT_RE}'), x -> x <> '') AS t
      FROM {rel}
    )
  )
),
dn_u AS (
  SELECT docid, term, pos,
         (CAST(concat('0x', substr(md5(docid || ':' || pos), 1, 8)) AS BIGINT)
          < {thresh}) AS start
  FROM dn_tok
),
dn_f AS (
  SELECT *, max(CAST(start AS INT)) OVER (
           PARTITION BY docid ORDER BY pos
           ROWS BETWEEN {L - 1} PRECEDING AND CURRENT ROW) = 1 AS flag
  FROM dn_u
),
dn_r AS (
  SELECT *, flag AND NOT coalesce(lag(flag) OVER (
           PARTITION BY docid ORDER BY pos), FALSE) AS runstart
  FROM dn_f
),
dn_k AS (
  SELECT *, sum(CASE WHEN runstart THEN 1 ELSE 0 END) OVER (
           PARTITION BY docid ORDER BY pos) AS k
  FROM dn_r
),
dn_pairs AS (
  SELECT docid,
         coalesce(string_agg(CASE WHEN NOT flag THEN term
                       WHEN runstart THEN '<extra_id_' || (k - 1) || '>'
                       END, ' ' ORDER BY pos), '') AS input_text,
         coalesce(string_agg(CASE WHEN runstart
                       THEN '<extra_id_' || (k - 1) || '> ' || term
                       WHEN flag THEN term END, ' ' ORDER BY pos), '') AS target_text,
         sum(CASE WHEN runstart THEN 1 ELSE 0 END) AS n_spans,
         sum(CASE WHEN flag THEN 1 ELSE 0 END) AS n_masked
  FROM dn_k GROUP BY docid
)"""
