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
