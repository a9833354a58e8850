"""Sliding-window document chunking — the training-data op that turns long
documents into fixed-token-window chunks with overlap (stride < window), as
fed to embedding models and context-window packers.

Semantics (frozen so the DuckDB oracle can replay them):
- tokens = the repo's frozen analyzer stream (dedup.tokens_col);
- chunk starts at 0, stride, 2*stride, ...;
- chunk c covers tokens [c*stride, c*stride + window);
- a document yields ``1 + max(0, ceil((n_tokens - window) / stride))``
  chunks, so the final chunk is the first one whose window reaches the last
  token (shorter than ``window`` when the tail is short); an empty document
  yields one empty chunk (deterministic in both engines).

Scale: tokenize once per row, build the start list with
``sequence``/``transform`` (no join, no UDF), ``posexplode`` to chunk rows —
row growth is the chunk count, the shuffle-free map-side shape you want for
a 100 TB corpus; downstream groupBys are the caller's.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from .dedup import tokens_col

_TOKEN_SPLIT = re.compile(r"[^A-Za-z0-9_]+")


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text: Column,
    window: int = 64,
    stride: int = 48,
    impl: str = "arrow",
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) rows, one per sliding window.

    ``stride <= window`` keeps coverage gap-free; ``stride == window`` is
    non-overlapping chunking.  The chunk-count ceil runs on small-integer
    doubles (exact — the quotient is only ever within one ulp of an integer
    when it IS one).

    Two implementations produce IDENTICAL rows (equality-tested):

    - ``impl="arrow"`` (default): mapInPandas with a Python re.split
      mirror of the frozen analyzer.  The JVM ``split()`` path allocates
      a java.lang.String per token, and on a memory-bandwidth-bound host
      that allocation stream saturates DRAM at ONE core (measured sf1:
      column path 59 s at local[1] and 75 s at local[32] — inverse
      scaling — vs arrow tokenize 20 s / 6.6 s; BENCH/scaling_r4g.md).
      Arrow batches + vectorized lowering keep the byte traffic a
      fraction of the JVM path's, so this is the corpus-scale default.
    - ``impl="column"``: pure column expressions (tokenize once behind an
      explode(array()) generator boundary, sequence/posexplode starts) —
      zero Python, the plan-shape reference the SQL oracle mirrors."""
    if not (0 < stride <= window):
        raise ValueError(f"chunking: need 0 < stride {stride} <= window {window}")
    if impl == "arrow":
        return _chunk_documents_arrow(df, id_col, text, window, stride)
    if impl != "column":
        raise ValueError(f"chunking: unknown impl {impl!r}")
    # explode(array(toks)) is a 1:1 generator boundary: Catalyst cannot
    # collapse the projection through Generate, so tokenization runs ONCE
    # per row even though three downstream expressions consume it (the
    # repo's projection-collapse-re-evaluates lesson, NOTES_r4).
    bound = df.select(
        F.col(id_col), F.explode(F.array(tokens_col(text))).alias("toks")
    )
    n = F.size(F.col("toks"))
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n - F.lit(window)) / F.lit(float(stride))).cast("int")
    )
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride)
    out = bound.select(
        F.col(id_col), F.posexplode(starts).alias("chunk_idx", "start"), F.col("toks")
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, window)
    return out.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def _chunk_documents_arrow(
    df: DataFrame, id_col: str, text: Column, window: int, stride: int
) -> DataFrame:
    """Arrow-batched chunker: same rows as the column path, tokenized by
    the Python mirror of the frozen analyzer (ASCII corpora: identical
    token streams — the same equivalence every dedup oracle relies on)."""
    id_type = df.select(F.col(id_col)).schema[0].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("chunk_idx", IntegerType()),
            StructField("n_tokens", IntegerType()),
            StructField("chunk_text", StringType()),
        ]
    )
    src = df.select(F.col(id_col), text.alias("__text"))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, ns, texts = [], [], [], []
            for i, txt in zip(pdf[id_col].values, pdf["__text"].values):
                toks = [t for t in _TOKEN_SPLIT.split((txt or "").lower()) if t]
                n = len(toks)
                nc = 1 + max(0, math.ceil((n - window) / stride))
                for c in range(nc):
                    piece = toks[c * stride : c * stride + window]
                    ids.append(i)
                    idxs.append(c)
                    ns.append(len(piece))
                    texts.append(" ".join(piece))
            yield pd.DataFrame(
                {id_col: ids, "chunk_idx": idxs, "n_tokens": ns, "chunk_text": texts}
            )

    return src.mapInPandas(gen, schema)


def chunk_sql(
    table: str, id_col: str, text_sql: str, window: int = 64, stride: int = 48,
    toks_sql: str | None = None,
) -> str:
    """DuckDB replay of chunk_documents over ``table`` (same arithmetic;
    ``toks_sql`` defaults to the frozen-analyzer token list expression and
    must match tokens_col)."""
    toks = toks_sql or (
        "list_filter(string_split_regex(lower(coalesce(" + text_sql + ", '')),"
        " '[^A-Za-z0-9_]+'), x -> x <> '')"
    )
    return f"""
WITH t AS (SELECT {id_col}, {toks} AS toks FROM {table}),
c AS (SELECT {id_col}, toks,
             1 + greatest(0, CAST(ceil((len(toks) - {window}) / {float(stride)}) AS INT)) AS nc
      FROM t)
SELECT {id_col}, i - 1 AS chunk_idx,
       len(toks[(i - 1) * {stride} + 1 : (i - 1) * {stride} + {window}]) AS n_tokens,
       array_to_string(toks[(i - 1) * {stride} + 1 : (i - 1) * {stride} + {window}], ' ') AS chunk_text
FROM c, UNNEST(generate_series(1, nc)) AS u(i)
"""


def chunk_stats(chunks: DataFrame, id_col: str) -> DataFrame:
    """Corpus-level chunking summary: one row — total chunks, docs, tokens,
    mean tokens per chunk (round-6), max chunks per doc.

    Single chunk-frame pass: per-doc partial aggregates (map-side
    combinable) feed one global aggregate — the chunk frame is scanned
    once (the first formulation recomputed it for a separate max pass;
    avg over chunks == sum(tokens)/sum(chunks) exactly, so nothing is
    lost by aggregating through the per-doc level)."""
    per_doc = chunks.groupBy(id_col).agg(
        F.count("*").alias("nc"), F.sum("n_tokens").alias("st")
    )
    return per_doc.agg(
        F.sum("nc").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("st").cast("long").alias("total_tokens"),
        F.round(F.sum("st") / F.sum("nc"), 6).alias("avg_chunk_tokens"),
        F.max("nc").cast("long").alias("max_chunks_per_doc"),
    )
