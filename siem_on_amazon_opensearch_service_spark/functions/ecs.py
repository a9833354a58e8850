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


#: GuardDuty finding-type decomposition
#: (sf_guardduty.py:14-18 RE_GD_TYPE): ThreatPurpose:ResourceTypeAffected/
#: ThreatFamilyName[.DetectionMechanism][!Artifact]
GD_TYPE_RE = (
    r"^(\w*):(\w*)/([\w&]*)(?:\.(\w*))?(?:!(\w*))?"
)
#: SecurityHub ASFF finding-type decomposition (sf_securityhub.py:18-21
#: RE_GD_MACIE_TYPE): namespace[/category]/[ThreatPurpose:]Resource(sep)Family...
ASFF_TYPE_RE = (
    r"^([^/]*)(?:/([^/]*))?/(?:(\w*):)?(\w*)(?:/|-|\.)([\w&]*)(?:\.(\w*))?(?:!(\w*))?"
)


def _severity_label(sev) -> Column:
    """GuardDuty numeric severity -> label (sf_guardduty.py:23-28; the
    reference leaves >8.9 unset because GuardDuty caps at 8.9 — mapped to
    'critical' here so the column is total)."""
    return (
        F.when(sev <= 3.9, "low")
        .when(sev <= 6.9, "medium")
        .when(sev <= 8.9, "high")
        .otherwise("critical")
    )


def sf_guardduty(df: DataFrame) -> DataFrame:
    """GuardDuty finding normalization (sf_guardduty.py:21-62), column
    re-expression over flat fields: rule_name, severity, type,
    action_type, connection_direction, source_ip, destination_ip."""
    out = df
    if "rule_name" in out.columns:
        out = out.withColumn("rule_name", F.regexp_replace(F.trim("rule_name"), r"\.+$", ""))
    if "severity" in out.columns:
        out = out.withColumn("severitylabel", _severity_label(F.col("severity")))
    for i, name in enumerate(
        ["ThreatPurpose", "ResourceTypeAffected", "ThreatFamilyName", "DetectionMechanism", "Artifact"],
        start=1,
    ):
        out = out.withColumn(name, F.regexp_extract(F.col("type"), GD_TYPE_RE, i))
    is_file = F.col("ThreatFamilyName").isin("SuspiciousFile", "MaliciousFile")
    direction = (
        F.when(F.col("action_type") == "NETWORK_CONNECTION", F.col("connection_direction"))
        .when(F.col("action_type") == "DNS_REQUEST", F.lit("OUTBOUND"))
        .when(is_file, F.lit(None).cast("string"))
        .otherwise(F.lit("INBOUND"))
    )
    out = out.withColumn("network_direction", F.lower(direction))
    # OUTBOUND findings swap source/destination (sf_guardduty.py:50-56)
    if "source_ip" in out.columns and "destination_ip" in out.columns:
        outb = F.col("network_direction") == "outbound"
        src, dst = F.col("source_ip"), F.col("destination_ip")
        # simultaneous swap: sequential withColumn would read the already-
        # overwritten source for the destination expression
        out = out.withColumns(
            {
                "source_ip": F.when(outb, dst).otherwise(src),
                "destination_ip": F.when(outb, src).otherwise(dst),
            }
        )
    malware = F.col("ThreatPurpose").isin("Backdoor", "CryptoCurrency", "Trojan") | is_file
    return out.withColumn("event_category", F.when(malware, "malware"))


def sf_securityhub(df: DataFrame) -> DataFrame:
    """SecurityHub ASFF type split (sf_securityhub.py:35-63): the two-regex
    fallback (new ASFF style, else the legacy GuardDuty-style type) and
    the ThreatPurpose <- category(spaces removed) fallback."""
    t = F.col("type")
    new_style = t.rlike(ASFF_TYPE_RE)
    ns = F.regexp_extract(t, ASFF_TYPE_RE, 1)
    cat = F.regexp_extract(t, ASFF_TYPE_RE, 2)
    tp = F.regexp_extract(t, ASFF_TYPE_RE, 3)
    out = df.withColumn(
        "asff_type_namespace", F.when(new_style, F.when(ns != "", ns))
    )
    # category falls back to ThreatPurpose; legacy style has no namespace
    legacy_tp = F.regexp_extract(t, GD_TYPE_RE, 1)
    out = out.withColumn(
        "asff_type_category",
        F.when(new_style, F.coalesce(F.when(cat != "", cat), F.when(tp != "", tp))).otherwise(
            F.when(legacy_tp != "", legacy_tp)
        ),
    )
    out = out.withColumn(
        "ThreatPurpose",
        F.when(new_style & (tp != ""), tp).otherwise(
            F.when(new_style, F.regexp_replace(F.col("asff_type_category"), " ", "")).otherwise(legacy_tp)
        ),
    )
    for i, name in enumerate(
        ["ResourceTypeAffected", "ThreatFamilyName", "DetectionMechanism", "Artifact"], start=4
    ):
        out = out.withColumn(
            name,
            F.when(new_style, F.regexp_extract(t, ASFF_TYPE_RE, i)).otherwise(
                F.regexp_extract(t, GD_TYPE_RE, i - 2)
            ),
        )
    if "severity" in df.columns:
        out = out.withColumn("severitylabel", _severity_label(F.col("severity")))
    return out


def sf_alb(df: DataFrame) -> DataFrame:
    """ALB access log: url.full = 2nd token of the request line
    (sf_alb.py:12-13)."""
    return df.withColumn("url_full", F.split(F.col("request"), " ").getItem(1))


def sf_waf(df: DataFrame) -> DataFrame:
    """WAF log normalization (sf_waf.py:12-44): header array -> lowered
    underscore map (authorization dropped), host/user-agent/referer
    promotion, WAFv2-vs-v1 webaclId decomposition, http version."""
    hdrs = F.filter(
        F.transform(
            F.col("headers"),
            lambda h: F.struct(
                F.lower(F.regexp_replace(h["name"], "-", "_")).alias("key"),
                h["value"].alias("value"),
            ),
        ),
        lambda h: h["key"] != "authorization",
    )
    out = df.withColumn("http_request_header", F.map_from_entries(hdrs))
    out = (
        out.withColumn("url_domain", F.try_element_at(F.col("http_request_header"), F.lit("host")))
        .withColumn(
            "user_agent_original",
            F.try_element_at(F.col("http_request_header"), F.lit("user_agent")),
        )
        .withColumn(
            "http_request_referrer",
            F.try_element_at(F.col("http_request_header"), F.lit("referer")),
        )
    )
    parts = F.split(F.col("webaclId"), ":")
    is_v2 = F.size(F.split(F.col("webaclId"), "/")) >= 3
    out = out.withColumn(
        "rule_ruleset",
        F.when(is_v2, F.split(F.col("webaclId"), "/").getItem(2)).otherwise(F.col("webaclId")),
    )
    region_type = F.split(parts.getItem(5), "/").getItem(0)
    out = out.withColumn(
        "cloud_region",
        F.when(is_v2, F.when(region_type == "global", "global").otherwise(parts.getItem(3))),
    ).withColumn("cloud_account_id", F.when(is_v2, parts.getItem(4)))
    return out.withColumn("http_version", F.split(F.col("httpVersion"), "/").getItem(1))


def sf_route53resolver(df: DataFrame) -> DataFrame:
    """Route53 resolver: strip trailing dots off DNS names/answers
    (sf_route53resolver.py:12-21)."""
    out = df
    for c in ("dns_question_name", "dns_answers_data"):
        if c in out.columns:
            out = out.withColumn(c, F.regexp_replace(F.col(c), r"\.+$", ""))
    return out


def add_basic_fields(
    df: DataFrame,
    message_col: str,
    timestamp_col: str,
    log_type: str,
    ingested_ts: str,
    id_suffix_col: str | None = None,
) -> DataFrame:
    """The reference's basic-fields bundle (siem/__init__.py:683-706 +
    set_skip_normalization): @message (raw record), @id (MD5 of message,
    optionally suffixed like doc_id_suffix), @timestamp, @log_type,
    @ingested (pass a deterministic ingest time, never wall clock)."""
    out = (
        df.withColumn("@message", F.col(message_col).cast("string"))
        .withColumn("@id", F.md5(F.col(message_col).cast("string")))
        .withColumn("@timestamp", F.col(timestamp_col))
        .withColumn("@log_type", F.lit(log_type))
        .withColumn("@ingested", F.lit(ingested_ts).cast("timestamp"))
    )
    if id_suffix_col is not None:
        out = out.withColumn(
            "@id",
            F.when(
                F.col(id_suffix_col).isNotNull(),
                F.concat_ws("_", F.col("@id"), F.col(id_suffix_col).cast("string")),
            ).otherwise(F.col("@id")),
        )
    return out


ROTATION_FORMATS = {
    "daily": "-yyyy-MM-dd",
    "weekly": "-yyyy-'w'ww",
    "monthly": "-yyyy-MM",
    "yearly": "-yyyy",
}


def index_name_rotated(
    base: Column,
    ts: Column,
    rotation: str = "monthly",
    index_suffix: str | None = None,
    index_tz: str | None = None,
) -> Column:
    """Computed index-routing name (siem/__init__.py:618-656 indexname):
    base[-suffix][-<date part by rotation>], with the rotation date taken
    from the event time (optionally shifted into index_tz).  'auto' and
    'aoss' rotations don't date-partition (aoss appends the suffix or
    -001)."""
    if index_suffix:
        base = F.concat(base, F.lit(f"-{index_suffix}"))
    if rotation == "aoss":
        return base if index_suffix else F.concat(base, F.lit("-001"))
    if rotation == "auto":
        return base
    fmt = ROTATION_FORMATS[rotation]
    dt = F.from_utc_timestamp(ts, index_tz) if index_tz else ts
    return F.concat(base, F.date_format(dt, fmt))


def _merge_struct(a: Column, b: Column, a_type, b_type) -> Column:
    from pyspark.sql import types as T

    a_fields = {f.name: f for f in a_type.fields}
    b_fields = {f.name: f for f in b_type.fields}
    cols = []
    for name in list(a_fields) + [n for n in b_fields if n not in a_fields]:
        if name in a_fields and name in b_fields:
            fa, fb = a_fields[name], b_fields[name]
            if isinstance(fa.dataType, T.StructType) and isinstance(fb.dataType, T.StructType):
                cols.append(
                    _merge_struct(a[name], b[name], fa.dataType, fb.dataType).alias(name)
                )
            else:
                cols.append(F.coalesce(b[name], a[name]).alias(name))
        elif name in b_fields:
            cols.append(b[name].alias(name))
        else:
            cols.append(a[name].alias(name))
    return F.struct(*cols)


def struct_deep_merge(df: DataFrame, a_col: str, b_col: str, out_col: str) -> DataFrame:
    """Recursive struct merge, right side wins on leaf conflicts — the
    column analogue of the reference's merge_dicts
    (siem/utils.py merge_dicts, used by every sf_ transform).  Nested
    struct fields merge field-wise; scalar conflicts coalesce(b, a)."""
    a_type = df.schema[a_col].dataType
    b_type = df.schema[b_col].dataType
    return df.withColumn(out_col, _merge_struct(F.col(a_col), F.col(b_col), a_type, b_type))


def transform_registry() -> dict:
    """Per-logtype transform hooks (SURVEY.md §2.11): the reference ships 40
    sf_<logtype>.transform(logdata) row-UDFs (siem/sf_*.py, loader
    siem/utils.py:721-748); ours are DataFrame->DataFrame transforms keyed
    the same way.  Seven here — vpcflowlogs/cloudtrail plus the five
    high-traffic security logtypes (guardduty, securityhub, alb, waf,
    route53resolver) proving the registry carries the reference's real
    per-logtype complexity (type-split regex fallbacks, severity mapping,
    header-map normalization, source/destination swap); the rest of the
    40 are AWS-specific and out of declared scope (SURVEY.md §7 ph. 5)."""
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

    return {
        "vpcflowlogs": vpcflowlogs,
        "cloudtrail": cloudtrail,
        "guardduty": sf_guardduty,
        "securityhub": sf_securityhub,
        "alb": sf_alb,
        "waf": sf_waf,
        "route53resolver": sf_route53resolver,
    }


def apply_transform(df: DataFrame, logtype: str) -> DataFrame:
    """Dispatch like the reference's sf_ module loader: unknown logtype is
    a no-op (siem/__init__.py:838-846)."""
    return transform_registry().get(logtype, lambda d: d)(df)
