"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship BM25 investigation query over the sf0.001
synthetic transcript corpus; queries()/oracle_sql() expose every
implemented operator from SURVEY.md §2 with DuckDB oracles (see
siem_on_amazon_opensearch_service_spark/entry.py for the registry).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from siem_on_amazon_opensearch_service_spark import entry as _registry

# the DuckDB oracles over the synthetic transcript corpus need the parquet
# to exist before the driver runs the SQL side — generate eagerly (cheap,
# deterministic, pandas path; ~seconds at sf<=0.01)
for _label in ("0.001", _registry.ORACLE_SF):
    try:
        _registry.ensure_corpus(_label)
    except Exception:  # pragma: no cover - generation failure surfaces later
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on the sf0.001 transcript corpus (rows > 0)."""
    return _registry.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries_map()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql_map()
