"""ECS field-mapping operators (SURVEY.md §2.2) — the reference's
config-driven projection family as DataFrame transforms.

The reference compiles each aws.ini logtype section into: rename ->
ECS coalesce-projection -> static constants -> multi-value union/dedupe/
sort -> field prefixing (/root/reference/source/lambda/es_loader/siem/
__init__.py:710-836).  Here each step is a pure column expression; the
"config DSL" is a plain dict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _path(df: DataFrame, dotted: str) -> Column:
    """Dotted source path -> column (nested struct access)."""
    return F.col(dotted)


def ecs_map(df: DataFrame, mapping: dict[str, list[str]], keep: list[str] | None = None) -> DataFrame:
    """ECS projection: each target field = first non-empty of its source
    paths (siem/__init__.py:745-776; e.g. aws.ini:386-421 vpcflowlogs).
    Empty string and '-' count as missing, like the reference."""

    def nonempty(c: Column) -> Column:
        return F.when((c.cast("string") != "") & (c.cast("string") != "-"), c)

    cols = [F.coalesce(*[nonempty(_path(df, p)) for p in paths]).alias(tgt.replace(".", "_"))
            for tgt, paths in mapping.items()]
    return df.select(*(keep or []), *cols)


def ecs_map_list(df: DataFrame, target: str, paths: list[str]) -> DataFrame:
    """List-valued ECS field (e.g. related.ip, aws.ini:420): union of the
    source values, deduped + sorted (siem/__init__.py:757-773)."""
    arr = F.array_sort(
        F.array_distinct(
            F.filter(F.array(*[F.col(p).cast("string") for p in paths]), lambda x: x.isNotNull())
        )
    )
    return df.withColumn(target.replace(".", "_"), arr)


def rename_fields(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """renamed_newfields (siem/__init__.py:710-721): new = old, old dropped."""
    out = df
    for old, new in renames.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    return out


def static_constants(df: DataFrame, consts: dict[str, str]) -> DataFrame:
    """Static ECS constants like event.kind=event (siem/__init__.py:831-836)."""
    out = df
    for k, v in consts.items():
        out = out.withColumn(k.replace(".", "_"), F.lit(v))
    return out


def json_to_text(df: DataFrame, fields: list[str]) -> DataFrame:
    """Force multi-typed fields to strings (siem/__init__.py:723-743;
    aws.ini:441-474): struct/map values serialized with to_json."""
    out = df
    for f_ in fields:
        dt = dict(df.dtypes).get(f_, "string")
        out = out.withColumn(
            f_, F.to_json(F.col(f_)) if dt.startswith(("struct", "map", "array")) else F.col(f_).cast("string")
        )
    return out


def field_prefix(df: DataFrame, prefix: str, cols: list[str]) -> DataFrame:
    """Move original fields under a namespace struct
    (siem/__init__.py:979-993)."""
    keep = [c for c in df.columns if c not in cols]
    return df.select(*keep, F.struct(*[F.col(c) for c in cols]).alias(prefix))


def transform_registry() -> dict:
    """Per-logtype transform hooks (SURVEY.md §2.11): the reference ships 40
    sf_<logtype>.transform(logdata) row-UDFs (siem/sf_*.py, loader
    siem/utils.py:721-748); ours are DataFrame->DataFrame transforms keyed
    the same way.  Two exemplars (the graft payload is transcripts, so the
    remaining 38 AWS-specific ones are intentionally out of scope —
    SURVEY.md §7 phase 5)."""
    from .scalars import action_outcome, protocol_name

    def vpcflowlogs(df: DataFrame) -> DataFrame:
        out = df
        if "protocol" in df.columns:
            out = out.withColumn("network_transport", protocol_name(F.col("protocol")))
        if "action" in df.columns:
            out = out.withColumn("event_outcome", action_outcome(F.col("action")))
        return out

    def cloudtrail(df: DataFrame) -> DataFrame:
        out = df
        if "errorCode" in df.columns:
            out = out.withColumn(
                "event_outcome",
                F.when(F.col("errorCode").isNotNull(), "failure").otherwise("success"),
            )
        return out

    return {"vpcflowlogs": vpcflowlogs, "cloudtrail": cloudtrail}


def apply_transform(df: DataFrame, logtype: str) -> DataFrame:
    """Dispatch like the reference's sf_ module loader: unknown logtype is
    a no-op (siem/__init__.py:838-846)."""
    return transform_registry().get(logtype, lambda d: d)(df)
