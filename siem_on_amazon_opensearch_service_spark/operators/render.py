"""Conversation -> training-document rendering (the chat-template stage
of an LLM data pipeline) with loss-mask accounting.

Each conversation's turns render as ``<|role|> text\\n`` in turn order and
concatenate into one training document; the op reports, per conversation,
the exact rendered length, the assistant-span character budget (the bytes
a loss mask would train on), the turn count, and the md5 of the full
rendered string — the hash pins the exact byte sequence for the
cross-engine oracle without shipping megabyte documents through the
driver compare.

Scale: one groupBy(conv_id) shuffle; ordering is sort_array over the
collected (turn_idx, ...) structs — turn_idx is unique within a
conversation, so the render is deterministic under any partitioning
(collect_list order is not relied on).  Rendering + totals are pure
column expressions over the sorted array; no UDF, no window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def turn_render_col(role: Column, text: Column) -> Column:
    """One turn's rendered form: ``<|role|> text\\n``."""
    return F.concat(F.lit("<|"), role, F.lit("|> "), text, F.lit("\n"))


def chat_render_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    mask_role: str = "assistant",
) -> DataFrame:
    """(conv_id, n_turns, n_chars, mask_chars, doc_md5) per conversation;
    ``mask_chars`` counts the rendered characters of ``mask_role`` turns
    (what a loss mask keeps)."""
    per = df.select(
        F.col(conv_col).alias("conv_id"),
        F.struct(
            F.col(idx_col).alias("i"),
            turn_render_col(F.col(role_col), F.col(text_col)).alias("r"),
            F.col(role_col).alias("role"),
        ).alias("t"),
    )
    g = per.groupBy("conv_id").agg(F.sort_array(F.collect_list("t")).alias("ts"))
    doc = F.array_join(F.transform(F.col("ts"), lambda t: t["r"]), "")
    mask = F.aggregate(
        F.col("ts"),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(t["role"] == mask_role, F.length(t["r"])).otherwise(F.lit(0)),
    )
    return g.select(
        "conv_id",
        F.size("ts").cast("long").alias("n_turns"),
        F.length(doc).cast("long").alias("n_chars"),
        mask.alias("mask_chars"),
        F.md5(doc).alias("doc_md5"),
    ).orderBy("conv_id")


def chat_render_sql(
    path: str,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    mask_role: str = "assistant",
) -> str:
    """DuckDB replay: string_agg in turn order + filtered length sum."""
    return f"""
WITH t AS (
  SELECT {conv_col} AS conv_id, {idx_col} AS i, {role_col} AS role,
         '<|' || {role_col} || '|> ' || {text_col} || chr(10) AS r
  FROM read_parquet('{path}')
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(length(string_agg(r, '' ORDER BY i)) AS BIGINT) AS n_chars,
       CAST(coalesce(sum(length(r)) FILTER (WHERE role = '{mask_role}'), 0) AS BIGINT) AS mask_chars,
       md5(string_agg(r, '' ORDER BY i)) AS doc_md5
FROM t GROUP BY conv_id ORDER BY conv_id
"""
