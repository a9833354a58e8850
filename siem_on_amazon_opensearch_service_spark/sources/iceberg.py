"""Iceberg-or-parquet table adapter.

The north_rule targets Iceberg transcript tables (BASELINE.json); this
sandbox image ships no Iceberg runtime jars, so every reader/writer in the
engine goes through this adapter: Iceberg when the catalog is available,
parquet otherwise, same DataFrame either way.  On a real cluster the only
config needed is the usual spark.sql.catalog.* Iceberg settings.

Write-path notes for the 10^12-turn table (applies when Iceberg is on):
- docs/postings become partitioned Iceberg tables (docs partitioned by
  bucket(docid), postings by term bucket) — the manifest stays, but
  snapshot metadata subsumes its resume role;
- the incremental append's affected-groups postings rewrite maps to
  MERGE INTO postings ... WHEN MATCHED THEN UPDATE (copy-on-write on the
  touched files only), which is exactly the shape append_batch computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is configured and loadable."""
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier_or_path: str) -> DataFrame:
    """Read an Iceberg table by identifier (catalog.db.table) when the
    runtime is present and the identifier is not a filesystem path; else
    read parquet at the path."""
    if "/" not in identifier_or_path and iceberg_available(spark):
        return spark.read.format("iceberg").load(identifier_or_path)
    return spark.read.parquet(identifier_or_path)


def write_table(df: DataFrame, identifier_or_path: str, mode: str = "append") -> None:
    spark = df.sparkSession
    if "/" not in identifier_or_path and iceberg_available(spark):
        df.writeTo(identifier_or_path).append() if mode == "append" else df.writeTo(
            identifier_or_path
        ).createOrReplace()
        return
    df.write.mode(mode).parquet(identifier_or_path)
