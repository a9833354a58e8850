"""OpenSearch ``_update_by_query`` for non-text metadata fields.

Lucene's update is delete+reindex per doc; OpenSearch ``_update_by_query``
wraps that behind a query + script.  This engine's docid is the stable
(conv_id, turn_idx) rank and its postings derive ONLY from ``text``, so a
metadata update (``role``/``tool`` — the triage idiom: tag a tool,
reclassify a role) never touches postings, norms, dict,
or stats: it is a rewrite of the docs store alone, with every search
artifact byte-identical before and after.  ``text`` updates are refused —
changing indexed content IS reindexing, and ``build.reindex`` is that
operation (`/root/reference` delegates both to OpenSearch; see
``_update_by_query`` usage in SIEM triage workflows).

Scale shape: match resolution is the percolator's index-free column
predicate (one scan); the rewrite is one full docs-store pass written
back range-partitioned by docid (at 10^12 turns a docs store laid out as
``shard=K/`` partition dirs would confine the rewrite to touched shards
— the store is a flat dir today, so the honest cost is O(docs); the
postings — the expensive 10^12-scale artifact — are untouched either
way).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .percolate import compile_predicate, with_tokens
from . import sqloracle as _so

UPDATABLE_FIELDS = ("role", "tool")


def update_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    set_fields: dict[str, str | None],
) -> dict:
    """Set ``set_fields`` (column -> new literal value, None clears) on
    every doc matching the DQL ``query``.  Only keyword metadata fields
    are updatable; anything else raises (text => use ``build.reindex``).
    Returns the matched-doc count."""
    bad = sorted(set(set_fields) - set(UPDATABLE_FIELDS))
    if bad:
        raise ValueError(
            f"update_by_query supports {UPDATABLE_FIELDS}, got {bad} "
            "(text changes are reindexing — use build.reindex)"
        )
    if not set_fields:
        raise ValueError("update_by_query needs at least one field to set")
    pred = compile_predicate(query, index_dir)
    docs_path = os.path.join(index_dir, "docs")
    docs = with_tokens(spark.read.parquet(docs_path))
    hit = pred(F.col("__toks"), F.col("role"), F.col("tool"), F.col("ts"))
    out = docs.withColumn("_hit", hit).drop("__toks")
    for fld, val in set_fields.items():
        new = F.lit(val).cast("string") if val is not None else F.lit(None).cast("string")
        out = out.withColumn(fld, F.when(F.col("_hit"), new).otherwise(F.col(fld)))
    n = out.filter(F.col("_hit")).count()
    with open(os.path.join(index_dir, "_build.json")) as f:
        params = json.load(f)
    n_shards = max(1, -(-params["total_docs"] // params["shard_size"]))
    tmp = docs_path + "_up"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        out.drop("_hit")
        .repartitionByRange(n_shards, "docid")
        .sortWithinPartitions("docid")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    shutil.rmtree(docs_path, ignore_errors=True)
    os.replace(tmp, docs_path)
    open(os.path.join(docs_path, "_SUCCESS"), "a").close()
    return {"updated": n}


def updated_bm25_sql(
    path: str,
    query: str,
    update_query_term: str,
    set_fields: dict[str, str | None],
    k: int = 10,
) -> str:
    """Oracle for a search AFTER ``update_by_query(update_query_term,
    set_fields)``: the standard bm25 statement with ``d``'s updated
    columns rewritten as CASE over the update match set (single-term
    update queries — the SQL-renderable shape, like the delete oracle).
    Scoring CTEs are untouched: metadata updates never move scores."""
    for fld in set_fields:
        if fld not in UPDATABLE_FIELDS:
            raise ValueError(f"oracle supports {UPDATABLE_FIELDS}, got {fld!r}")
    ast, dqlf = _so.extract_filters(_so.parse(query), query)
    filt = _so.merge_filters(query, {}, dqlf)
    leaves: list = []

    def collect(n) -> None:
        if isinstance(n, _so.LEAVES):
            if n not in leaves:
                leaves.append(n)
        elif isinstance(n, (_so.And, _so.Or, _so.AtLeast)):
            for c in n.children:
                collect(c)
        elif isinstance(n, _so.Not):
            collect(n.child)

    collect(ast)
    fsql = _so._filters_sql(filt)
    cols = []
    for fld in ("role", "tool"):
        if fld in set_fields:
            val = set_fields[fld]
            new = _so._q(val) if val is not None else "NULL"
            cols.append(
                f"CASE WHEN d0.docid IN (SELECT docid FROM updset) "
                f"THEN {new} ELSE d0.{fld} END AS {fld}"
            )
        else:
            cols.append(f"d0.{fld}")
    upd_d = f"""
d0 AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS docid,
         conv_id, turn_idx, role, tool, ts, text
  FROM raw
),
updset AS (
  SELECT DISTINCT docid
  FROM (
    SELECT docid, unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '{_so.SQL_SPLIT_RE}'), x -> x <> '')) AS term
    FROM d0
  )
  WHERE term = {_so._q(update_query_term)}
),
d AS (
  SELECT d0.docid, d0.conv_id, d0.turn_idx, {', '.join(cols)}, d0.ts, d0.text
  FROM d0
)"""
    trunc = _so.sql_truncate_expr("text")
    base = f"""
raw AS (
  SELECT conv_id, turn_idx, role, tool, ts, {trunc} AS text
  FROM read_parquet('{path}')
),{upd_d},
tok0 AS (
  SELECT docid,
         list_filter(string_split_regex(lower(coalesce(text, '')), '{_so.SQL_SPLIT_RE}'),
                     x -> x <> '') AS toks
  FROM d
),
dl AS (SELECT docid, len(toks) AS dl FROM tok0),
stats AS (
  SELECT count(*) FILTER (WHERE dl > 0) AS doc_count,
         CAST(sum(dl) AS DOUBLE) / count(*) FILTER (WHERE dl > 0) AS avgdl
  FROM dl
),
dln AS (SELECT docid, {_so.sql_decode_case('dl')} AS dl_dec FROM dl),
tok AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY pre_pos) - 1 AS pos
  FROM (
    SELECT docid, unnest(toks) AS term, generate_subscripts(toks, 1) AS pre_pos
    FROM tok0
  )
)"""
    return f"""WITH RECURSIVE {base},
{_so._leaf_ctes(leaves)},
combined AS ({_so._combine_sql(ast, leaves)})
SELECT docid, round(CAST(s AS DOUBLE), 3) AS score_r
FROM (
  SELECT c.docid, c.s
  FROM combined c JOIN d USING (docid){fsql}
  ORDER BY c.s DESC, c.docid ASC
  LIMIT {k}
)"""
