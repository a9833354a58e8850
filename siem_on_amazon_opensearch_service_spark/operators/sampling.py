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
