"""Exclusion filters (SURVEY.md §2.3) — the reference's three suppression
mechanisms as DataFrame filters.

1. CSV exclusion patterns: per-logtype {dotted.field: regex} maps,
   ``re.match`` semantics (anchored at start), text vs regex pattern types
   (siem/utils.py:859-876, 1028-1086).
2. JMESPath exclusion conditions with EXCLUDE / COUNT actions
   (siem/utils.py:669-718; siem/__init__.py:995-1031) — COUNT keeps the
   rows but reports how many matched (the reference emits a metric).
3. Own-log self-noise suppression — just (1) with built-in patterns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _anchored(regex: str) -> str:
    """Python re.match anchors at start only; Spark rlike anchors nowhere."""
    return regex if regex.startswith("^") else "^(?:" + regex + ")"


def exclude_patterns(df: DataFrame, patterns: dict[str, str], pattern_type: str = "regex") -> DataFrame:
    """Drop rows where EVERY pattern field matches (the reference requires
    all listed fields of one exclusion row to match: utils.py:1028-1086)."""
    conds: list[Column] = []
    for field, pat in patterns.items():
        col = F.col(field.replace(".", "_")) if field.replace(".", "_") in df.columns else F.col(field)
        if pattern_type == "text":
            conds.append(col.cast("string") == pat)
        else:
            conds.append(col.cast("string").rlike(_anchored(pat)))
    if not conds:
        return df
    match_all = conds[0]
    for c in conds[1:]:
        match_all = match_all & c
    return df.filter(~F.coalesce(match_all, F.lit(False)))


def jmespath_exclusion(
    df: DataFrame,
    condition: str,
    action: str = "EXCLUDE",
    json_col: str | None = None,
) -> tuple[DataFrame, Column]:
    """JMESPath condition over each row (rows serialized to JSON when no
    ``json_col`` given), evaluated in an Arrow-batched UDF.  Returns
    (filtered_df, matched_count_aggregate) — with action=COUNT the rows are
    kept and only the count matters, mirroring the reference's COUNT
    action."""
    import jmespath

    compiled_src = condition

    @F.pandas_udf(T.BooleanType())
    def matches(js: pd.Series) -> pd.Series:
        import json as _json

        expr = jmespath.compile(compiled_src)
        out = []
        for v in js:
            try:
                out.append(bool(expr.search(_json.loads(v))))
            except Exception:
                out.append(False)
        return pd.Series(out)

    src = F.col(json_col) if json_col else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    flagged = df.withColumn("__excl", matches(src))
    matched = F.sum(F.col("__excl").cast("long")).alias("n_matched")
    if action == "EXCLUDE":
        return flagged.filter(~F.col("__excl")).drop("__excl"), matched
    return flagged.drop("__excl"), matched
