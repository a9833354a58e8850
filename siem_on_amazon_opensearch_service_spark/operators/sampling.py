"""Deterministic hash-based sampling and dataset splits.

The reproducibility primitives a training-data pipeline needs: every
assignment is a pure function of the row's id (md5-derived bucket in
[0, 10^4)), so splits are stable under reruns, repartitioning, cluster
size, and incremental appends — a new document lands in the same split
forever, and train/val/test never bleed when the corpus grows.  Contrast
``DataFrame.sample``, whose output depends on partitioning.

Pure column expressions (no UDFs, no shuffle — a projection + filter the
optimizer pushes into the scan), and the md5 arithmetic is reproduced
verbatim by the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space for split/sample rates: rates are exact multiples of
#: 1/10^4 (0.01% granularity)
HASH_BUCKETS = 10_000


def hash_bucket(id_col: Column) -> Column:
    """Stable bucket in [0, HASH_BUCKETS): the first 8 md5 hex digits of
    the id's string form, as an integer, mod 10^4."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % HASH_BUCKETS).cast("int")


def sample_by_hash(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Deterministic ~rate sample: rows whose hash bucket < rate * 10^4.
    The SAME rows come back on every run at any parallelism, and a
    rate=0.1 sample is a subset of the rate=0.2 sample (nested samples
    for scaling-law runs)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return df.filter(hash_bucket(F.col(id_col)) < int(round(rate * HASH_BUCKETS)))


def split_by_hash(df: DataFrame, id_col: str, weights: dict[str, float]) -> DataFrame:
    """Add a ``split`` column assigning each row to one named split with
    ~weight proportions (weights must sum to 1 within bucket
    granularity).  Assignment is by contiguous bucket ranges in the
    ORDER THE DICT DEFINES, so adding a later split never moves rows
    between earlier ones."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    b = hash_bucket(F.col(id_col))
    edges: list[tuple[str, int]] = []
    acc = 0.0
    for name, wt in weights.items():
        acc += wt
        edges.append((name, int(round(acc * HASH_BUCKETS))))
    if edges[-1][1] != HASH_BUCKETS:
        raise ValueError(
            f"weights quantize to {edges[-1][1]}/{HASH_BUCKETS} buckets; "
            "use rates that are multiples of 1/10000"
        )
    expr = None
    for name, hi in edges:
        expr = F.when(b < hi, name) if expr is None else expr.when(b < hi, name)
    return df.withColumn("split", expr)


def temperature_rates(
    counts: dict[str, int], alpha: float = 0.5, target_frac: float = 0.5
) -> dict[str, int]:
    """Temperature-weighted mixture rates as hash-bucket thresholds.

    The multilingual-pretraining re-balancing rule (mBERT/XLM-R style):
    group g gets mixture weight w_g = n_g^alpha / sum(n^alpha), flattening
    the head and up-weighting the tail as alpha -> 0.  The kept count
    targets target_frac of the corpus distributed by w, capped at taking
    a group whole: rate_g = min(1, target_frac * N * w_g / n_g).

    Rates quantize to HASH_BUCKETS thresholds with half-up flooring —
    floor(r * 10^4 + 0.5) — the same arithmetic the SQL oracle renders
    textually.  All floating steps are order-fixed (sqrt is IEEE
    exact-rounded; the weight denominator folds over groups in sorted
    key order), so engine and oracle derive IDENTICAL thresholds from
    the counts alone.  alpha=0.5 uses sqrt explicitly; other alphas use
    pow (last-ulp cross-engine risk documented — the driver row pins
    alpha=0.5)."""
    import math

    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac {target_frac} outside (0, 1]")
    if any(g is None for g in counts):
        raise ValueError(
            "temperature_rates: null group key — fill or filter the "
            "group column first (a null group has no mixture weight)"
        )
    keys = sorted(counts)
    n_total = 0
    for g in keys:
        n_total += counts[g]
    powed = {
        g: (math.sqrt(float(counts[g])) if alpha == 0.5
            else float(counts[g]) ** alpha)
        for g in keys
    }
    tot = 0.0
    for g in keys:  # sorted-key fold order, mirrored by the SQL oracle
        tot += powed[g]
    out = {}
    for g in keys:
        r = min(1.0, target_frac * n_total * (powed[g] / tot) / counts[g])
        out[g] = int(math.floor(r * HASH_BUCKETS + 0.5))
    return out


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Deterministic temperature-mixture sample: one count aggregate
    (map-side partial; group cardinality is tiny by construction), then
    a pure hash-threshold filter — same stability contract as
    sample_by_hash, per group."""
    counts = {
        r[group_col]: int(r["n"])
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    }
    th = temperature_rates(counts, alpha, target_frac)
    b = hash_bucket(F.col(id_col))
    expr = None
    for g in sorted(th):
        cond = (F.col(group_col) == g) & (b < th[g])
        expr = cond if expr is None else expr | cond
    return df.filter(expr)


def temperature_sample_sql(
    source: str,
    group_col: str = "lang",
    id_col: str = "doc_id",
    target_frac: float = 0.5,
) -> str:
    """DuckDB CTE chain ending in ``tsample`` = the kept rows — derives
    counts, sqrt-weights (alpha = 0.5 only), thresholds, and the hash
    filter entirely in SQL with the engine's exact arithmetic: sorted-key
    list_reduce fold for the weight denominator, half-up floor
    quantization, the sampling module's md5 bucket."""
    rel = f"read_parquet('{source}')" if source.endswith(".parquet") else source
    bucket = (
        f"CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {HASH_BUCKETS}"
    )
    return f"""
ts_counts AS (SELECT {group_col} AS g, count(*) AS n FROM {rel} GROUP BY 1),
ts_tot AS (
  SELECT (SELECT sum(n) FROM ts_counts) AS n_total,
         (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(sqrt(CAST(n AS DOUBLE)) ORDER BY g)), (a, b) -> a + b)
          FROM ts_counts) AS wtot
),
ts_th AS (
  SELECT g, CAST(floor(
           least(1.0, {target_frac!r} * n_total *
                 (sqrt(CAST(n AS DOUBLE)) / wtot) / n)
           * {HASH_BUCKETS} + 0.5) AS BIGINT) AS th
  FROM ts_counts, ts_tot
),
tsample AS (
  SELECT d.* FROM {rel} d JOIN ts_th ON d.{group_col} = ts_th.g
  WHERE {bucket} < ts_th.th
)"""
