"""Index State Management: retention / rollover planning over rotated
index stores.

The reference deploys exactly this lifecycle: ``index_rotation``
(yearly/monthly/weekly/daily time-bucketed indexes, or ``auto`` = ISM
rollover — `/root/reference/source/lambda/es_loader/aws.ini:103-119`)
plus the shipped ISM policy (`deploy_es/data.ini
[index_state_management_policies]`: rollover by size) and index deletion
when retention lapses (`deploy_es/index.py:506-508`).  Re-expression
over this engine's rotated index dirs (``entry.ensure_rotated_indexes``
— one self-contained index per time bucket, own stats/docids):

* ``lifecycle_plan`` is PURE planning: per index, (n_docs from the
  stats store, newest event ts from the docs store) -> age vs ``as_of``
  -> action.  ``delete`` when the index's newest doc is older than
  ``retain_days``; the ACTIVE index (newest bucket) instead gets
  ``rollover`` when it exceeds ``max_docs`` (the policy's size
  trigger re-expressed in docs — byte sizes are layout-dependent).
  All metadata-scale driver work: one stats row + one MAX(ts) parquet
  statistics probe per index, never a corpus scan.
* ``apply_retention`` executes the plan's deletes (rmtree of whole
  index dirs — index-level deletion is the reference's retention
  mechanism; doc-level deletes are operators/deletes.py).
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

PLAN_SCHEMA = (
    "index string, n_docs long, newest_ts timestamp, age_days double, "
    "action string"
)


def _as_dt(s: str) -> datetime:
    return datetime.fromisoformat(s)


def lifecycle_plan(
    spark: SparkSession,
    index_dirs: list[str],
    as_of: str,
    retain_days: float,
    max_docs: int,
) -> DataFrame:
    """One plan row per rotated index: (index basename, n_docs,
    newest_ts, age_days, action).  age_days = microsecond-exact
    (as_of - newest_ts)/86400, rounded to 6 (the SQL oracle replays the
    identical integer arithmetic).  Actions: ``delete`` (age >
    retain_days), ``rollover`` (active index over max_docs),
    ``retain``."""
    import duckdb

    if not index_dirs:
        raise ValueError("lifecycle_plan needs at least one index dir")
    as_of_dt = _as_dt(as_of)
    rows = []
    for d in index_dirs:
        st = duckdb.sql(
            f"SELECT n_docs FROM read_parquet('{d}/stats/*.parquet')"
        ).fetchone()
        newest = duckdb.sql(
            f"SELECT max(ts) FROM read_parquet('{d}/docs/*.parquet')"
        ).fetchone()[0]
        if newest is None:
            # an empty docs store has no age: planning over it would
            # compare None vs datetime below — refuse loudly rather than
            # silently retaining or deleting an index of unknown age
            raise ValueError(
                f"lifecycle_plan: index {d!r} has no docs (max(ts) is NULL); "
                "remove it from index_dirs or repair the store"
            )
        rows.append((os.path.basename(d.rstrip("/")), int(st[0]), newest))
    # ACTIVE = every index sharing the max newest_ts (ties possible when
    # two buckets end on the same instant) — matches the oracle's
    # 'newest = (SELECT max(newest) ...)' predicate, which marks ALL
    # tied indexes rollover-eligible
    active_ts = max(r[2] for r in rows)
    out = []
    for name, n_docs, newest in rows:
        # exact integer microseconds, ONE division — the identical op
        # sequence as the oracle's date_diff('microsecond')/86400e6
        delta = as_of_dt - newest
        age_us = delta.days * 86_400_000_000 + delta.seconds * 1_000_000 + delta.microseconds
        age_days = round(age_us / 86400e6, 6)
        if age_days > retain_days:
            action = "delete"
        elif newest == active_ts and n_docs >= max_docs:
            action = "rollover"
        else:
            action = "retain"
        out.append((name, n_docs, newest, age_days, action))
    out.sort(key=lambda r: r[2])
    return spark.createDataFrame(out, PLAN_SCHEMA)


def apply_retention(spark: SparkSession, index_dirs: list[str], plan: DataFrame) -> dict:
    """Execute the plan's deletes: rmtree every index whose plan action
    is ``delete``.  Returns the deleted basenames."""
    doomed = {
        r["index"] for r in plan.filter(plan["action"] == "delete").collect()
    }
    by_name = {os.path.basename(d.rstrip("/")): d for d in index_dirs}
    deleted = []
    for name in sorted(doomed):
        d = by_name.get(name)
        if d and os.path.isdir(d):
            shutil.rmtree(d)
            deleted.append(name)
    return {"deleted": deleted}


def lifecycle_plan_sql(
    path: str,
    interval: str,
    name_prefix: str,
    as_of: str,
    retain_days: float,
    max_docs: int,
) -> str:
    """DuckDB oracle: recompute the plan from the RAW corpus — time
    buckets mirror the rotated indexes (the engine's per-index stats and
    newest ts must equal the bucket aggregates), ages replay the same
    microsecond integer arithmetic, the action CASE is textual."""
    return f"""
WITH b AS (
  SELECT date_trunc('{interval}', ts) AS wk, count(*) AS n_docs, max(ts) AS newest
  FROM read_parquet('{path}')
  GROUP BY 1
),
mx AS (SELECT max(newest) AS m FROM b)
SELECT '{name_prefix}' || strftime(wk, '%Y%m%d') AS index,
       n_docs,
       newest AS newest_ts,
       round(date_diff('microsecond', newest, TIMESTAMP '{as_of}') / 86400000000.0, 6)
         AS age_days,
       CASE
         WHEN round(date_diff('microsecond', newest, TIMESTAMP '{as_of}') / 86400000000.0, 6)
              > {float(retain_days)!r} THEN 'delete'
         WHEN newest = (SELECT m FROM mx) AND n_docs >= {int(max_docs)} THEN 'rollover'
         ELSE 'retain'
       END AS action
FROM b
ORDER BY newest
"""