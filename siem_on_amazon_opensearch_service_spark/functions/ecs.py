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


# sshd / sudo syslog-message extraction cascades: first matching pattern
# wins, named groups fill (action, user, source_ip, source_port) —
# behavioral spec from sf_linux_os_syslog.py:15-31 (RE_LIST_SSHD/SUDO)
SSHD_PATTERNS = [
    r"(?P<action>Accepted|Failed|failure|Invalid user|invalid user)\s.*?((publickey|password|none) for )?(invalid user )?(?P<user>\S+)(\s+from.*?(?P<source_ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}))?(\s+port\s+(?P<source_port>\d+))?",
    r"^(?P<action>(Disconnected|Received disconnect)) from (?P<source_ip>[^ ]*) port (?P<source_port>\d+)",
    r"^(?P<action>error): AuthorizedKeysCommand \S+ (?P<user>\S+) (SHA|RSA)",
    r"^pam_unix(\S+): (?P<action>session closed) for user (?P<user>\S+)",
    r"^pam_unix(\S+): (?P<action>session opened) for user \S+ by (?P<user>\S*)\(",
    r"^(?P<action>Connection (reset|closed))\s+by\s+(?P<source_ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})\s+port\s+(?P<source_port>\d+)",
    r".+\s+(from|with)\s+(?P<source_ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})\s+port\s+(?P<source_port>\d+)",
    r"^(?P<action>reverse mapping checking).*\[(?P<source_ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})\]",
    r"\s(?P<source_ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})\s",
]
SUDO_PATTERNS = [
    r"^(?P<user>\S+) : .*COMMAND=(?P<action>.*)",
    r"^pam_unix(\S+): (?P<action>session closed) for user (?P<user>\S+)",
    r"^pam_unix(\S+): (?P<action>session opened) for user \S+ by (?P<user>\S*)\(",
]


def _cascade_extract_udf(patterns: list[str]):
    """Arrow-batched first-match named-group extraction (the reference's
    per-logtype regex cascade is inherently per-row; this is its
    vectorized re-expression — an ingest-side transform, not a query-path
    operator)."""
    import re

    import pandas as pd
    from pyspark.sql import types as T

    compiled = [re.compile(p) for p in patterns]
    schema = T.StructType(
        [
            T.StructField("action", T.StringType()),
            T.StructField("user", T.StringType()),
            T.StructField("source_ip", T.StringType()),
            T.StructField("source_port", T.StringType()),
        ]
    )

    # no type hints: `from __future__ import annotations` stringifies
    # them and PySpark's inference rejects the signature; hint-less
    # pandas_udf defaults to the scalar eval type we want
    @F.pandas_udf(schema)
    def extract(msgs):
        out = {"action": [], "user": [], "source_ip": [], "source_port": []}
        for msg in msgs.fillna(""):
            row = {k: None for k in out}
            for rx in compiled:
                m = rx.search(msg)
                if m:
                    for k, v in m.groupdict().items():
                        row[k] = v
                    break
            for k in out:
                out[k].append(row.get(k))
        return pd.DataFrame(out)

    return extract


def _ssh_outcome(action: Column) -> Column:
    """sshd action -> event.outcome (sf_linux_os_syslog.py:59-70)."""
    a = F.lower(action)
    return (
        F.when(action.isNull(), F.lit(None).cast("string"))
        .when(a.contains("accept") | a.contains("opened"), "success")
        .when(a.contains("fail") | a.contains("invalid") | a.contains("err"), "failure")
        .when(a.contains("disconnect") | a.contains("reset") | a.contains("close"), F.lit(None).cast("string"))
        .otherwise("unknown")
    )


def sf_linux_secure(df: DataFrame) -> DataFrame:
    """Linux secure-log normalization (sf_linux_secure.py + the
    sf_linux_os_syslog extractors): sshd/sudo first-match regex cascade
    over syslog_message keyed on proc, authentication outcome mapping,
    related ip/user."""
    is_sshd = F.col("proc").contains("sshd")
    is_sudo = F.col("proc").contains("sudo")
    sshd = _cascade_extract_udf(SSHD_PATTERNS)(F.col("syslog_message"))
    sudo = _cascade_extract_udf(SUDO_PATTERNS)(F.col("syslog_message"))
    ext = F.when(is_sshd, sshd).when(is_sudo, sudo)
    out = (
        df.withColumn("_x", ext)
        .withColumn("user_name", F.col("_x.user"))
        .withColumn("source_ip", F.col("_x.source_ip"))
        .withColumn("source_port", F.col("_x.source_port"))
        .withColumn("event_action", F.col("_x.action"))
        .withColumn("event_module", F.when(is_sshd | is_sudo, "secure"))
        .withColumn(
            "event_outcome",
            F.when(is_sshd, _ssh_outcome(F.col("_x.action"))).when(
                is_sudo & F.col("_x.action").isNotNull(), "success"
            ),
        )
        .withColumn(
            "event_category", F.when(is_sshd & F.col("_x.action").isNotNull(), "authentication")
        )
        .drop("_x")
    )
    return out.withColumn("related_user", F.col("user_name")).withColumn(
        "related_ip", F.col("source_ip")
    )


AWS_REGION_RE = r"(global|(?:us|ap|ca|eu|me|sa|af)-[a-zA-Z]+-[0-9])"


def sf_s3accesslog(df: DataFrame) -> DataFrame:
    """S3 access log (sf_s3accesslog.py:15-26): user.name = last ARN path
    segment; unknown region recovered from the endpoint host."""
    out = df
    if "user_name" in out.columns:
        out = out.withColumn("user_name", F.element_at(F.split(F.col("user_name"), "/"), -1))
    if "cloud_region" in out.columns and "EndPoint" in out.columns:
        rec = F.regexp_extract(F.col("EndPoint"), AWS_REGION_RE, 1)
        out = out.withColumn(
            "cloud_region",
            F.when((F.col("cloud_region") == "unknown") & (rec != ""), rec).otherwise(
                F.col("cloud_region")
            ),
        )
    return out


CF_DIST_ID_RE = r"/([0-9A-Z]{12,14})\."


def sf_cloudfront_standard(df: DataFrame) -> DataFrame:
    """CloudFront standard log (sf_cloudfront_standard.py:15-39): url.full
    reassembly, http version, percent-decoded UA, distribution id from
    the s3 key, tab fixup in date_time."""
    from .scalars import _unquote_once

    q = F.when(F.col("cs_uri_query") != "-", F.concat(F.lit("?"), F.col("cs_uri_query"))).otherwise(
        F.lit("")
    )
    out = df.withColumn(
        "url_full",
        F.concat(F.col("cs_protocol"), F.lit("://"), F.col("x_host_header"), F.col("cs_uri_stem"), q),
    ).withColumn("http_version", F.split(F.col("cs_protocol_version"), "/").getItem(1))
    if "user_agent_original" in out.columns:
        out = out.withColumn("user_agent_original", _unquote_once(F.col("user_agent_original")))
    if "log_s3key" in out.columns:
        d = F.regexp_extract(F.col("log_s3key"), CF_DIST_ID_RE, 1)
        out = out.withColumn("distribution_id", F.when(d != "", d).otherwise("unknown"))
    if "date_time" in out.columns:
        out = out.withColumn("date_time", F.regexp_replace(F.col("date_time"), "\t", " "))
    return out


#: raw combined-log fields the reference deletes after ECS projection
#: (sf_apache_access.py:84-98).  The nginx del-list (sf_nginx_access.py:
#: 84-97) is the same MINUS request_bytes/response_bytes — nginx keeps
#: those two (VERDICT r3: the plain alias silently dropped them).
_APACHE_RAW_DEL = (
    "authuser", "datetime", "ident", "request_bytes", "request_method",
    "request_path", "request_raw", "request_version", "referer",
    "remotehost", "response_body_bytes", "response_bytes",
    "response_status", "useragent", "xff",
)


def sf_apache_access(df: DataFrame, _keep: tuple[str, ...] = ()) -> DataFrame:
    """Apache access log (sf_apache_access.py:32-98): the full http/url
    field bundle via http_url_decompose, service.name from the s3 key,
    scheme from the log group, then the raw combined-log fields dropped
    (the reference del-list; ``_keep`` lets the nginx variant retain its
    two divergent fields)."""
    from .scalars import http_url_decompose

    out = df.withColumn(
        "web",
        http_url_decompose(
            F.col("request_method"),
            F.col("request_path"),
            F.col("request_version"),
            F.col("request_raw") if "request_raw" in df.columns else F.lit(None).cast("string"),
        ),
    )
    if "log_s3key" in out.columns:
        svc = F.regexp_extract(F.col("log_s3key"), r"/web-site-name=([^/]*?)/", 1)
        out = out.withColumn("service_name", F.when(svc != "", svc))
    if "log_group" in out.columns:
        out = out.withColumn(
            "url_scheme",
            F.when(F.col("log_group").contains("ssl"), "https").when(
                F.col("log_group").contains("access"), "http"
            ),
        )
    drop = [c for c in _APACHE_RAW_DEL if c in out.columns and c not in _keep]
    return out.drop(*drop) if drop else out


def sf_nginx_access(df: DataFrame) -> DataFrame:
    """nginx access log (sf_nginx_access.py:32-97): byte-identical to the
    apache transform EXCEPT the del-list keeps request_bytes and
    response_bytes (the reference's nginx module omits those two dels —
    diff apache:87,95)."""
    return sf_apache_access(df, _keep=("request_bytes", "response_bytes"))


def camel_to_snake_columns(df: DataFrame) -> DataFrame:
    """camelCase -> snake_case column renaming (sf_okta.py
    str_camel_to_snake/dict_camel_to_snake, flattened-column form)."""
    import re

    out = df
    for c in df.columns:
        snake = re.sub(r"([a-z0-9])([A-Z])", lambda m: m.group(1) + "_" + m.group(2).lower(), c)
        if snake != c:
            out = out.withColumnRenamed(c, snake)
    return out


def sf_okta(df: DataFrame) -> DataFrame:
    """Okta system-log normalization (sf_okta.py:65-90): outcome.result ->
    event.outcome (success/allow, failure/deny, else unknown), User-actor
    email split into user name/domain/email, display-name fan-out to
    client/source/related user fields, camelCase fields snaked."""
    out = camel_to_snake_columns(df)
    if "outcome_result" in out.columns:
        r = F.lower(F.col("outcome_result"))
        out = out.withColumn(
            "event_outcome",
            F.when(r.isin("success", "allow"), "success")
            .when(r.isin("failure", "deny"), "failure")
            .when(r.isNotNull(), "unknown"),
        )
    if "actor_type" in out.columns and "actor_alternate_id" in out.columns:
        is_user = F.col("actor_type") == "User"
        email = F.col("actor_alternate_id")
        has_at = email.rlike(r"^.*@.*$")
        out = (
            out.withColumn("user_name", F.when(is_user & has_at, F.regexp_extract(email, r"^(.*)@(.*)$", 1)))
            .withColumn("user_domain", F.when(is_user & has_at, F.regexp_extract(email, r"^(.*)@(.*)$", 2)))
            .withColumn("user_email", F.when(is_user & has_at, email))
        )
        if "actor_display_name" in out.columns:
            dn = F.when(is_user, F.col("actor_display_name"))
            out = (
                out.withColumn("client_user_full_name", dn)
                .withColumn("source_user_full_name", dn)
                .withColumn("related_user", dn)
            )
    return out


#: Deep Security CEF extension key -> ECS field (sf_deepsecurity.py:44-60)
DEEPSEC_ECS_KEYS = {
    "destination_ip": "dst",
    "destination_port": "dpt",
    "destination_mac": "dmac",
    "destination_bytes": "out",
    "source_ip": "src",
    "source_port": "spt",
    "source_mac": "smac",
    "source_bytes": "in",
    "network_transport": "proto",
    "file_path": "fname",
    "event_action": "act",
}


def sf_deepsecurity(df: DataFrame) -> DataFrame:
    """Trend Micro Deep Security CEF normalization (sf_deepsecurity.py):
    takes read_cef output — agent.name from the vendor/product/version
    header, rule.name from signature+name, '\\=' -escaped extension values
    handled, act 'IDS:Reset' softened to 'DetectOnly:NotReset', extension
    keys mapped to ECS fields."""
    # re-derive the pairs map with backslash-= protection (the reference
    # substitutes '\\=' before splitting on '='); the sentinel is \x01 —
    # a control character that cannot appear in CEF text, unlike a
    # guessable printable token
    _sent = "\x01"
    pairs = F.expr(
        r"map_from_entries(transform(regexp_extract_all("
        r"regexp_replace(ext, '\\\\=', '" + _sent + r"'), "
        r"'(\\w+)=([^=]*?)(?=\\s+\\w+=|$)', 0), "
        r"p -> struct(split(p, '=', 2)[0] as k, "
        r"replace(split(p, '=', 2)[1], '" + _sent + r"', '=') as v)))"
    )
    out = (
        df.withColumn("pairs", pairs)
        .withColumn(
            "agent_name",
            F.concat_ws(" ", F.col("device_vendor"), F.col("device_product"), F.col("device_version")),
        )
        .withColumn("rule_name", F.concat_ws(" ", F.col("signature_id"), F.col("name")))
        .withColumn("event_severity", F.col("severity"))
    )
    for ecs_field, key in DEEPSEC_ECS_KEYS.items():
        v = F.try_element_at(F.col("pairs"), F.lit(key))
        if key == "act":
            # IDS:Reset only alerts, it does not drop packets — the
            # reference renames it to avoid implying enforcement
            v = F.regexp_replace(v, "IDS:Reset", "DetectOnly:NotReset")
        out = out.withColumn(ecs_field, v)
    return out.drop("pairs")


def sf_networkfirewall(df: DataFrame) -> DataFrame:
    """AWS Network Firewall normalization (sf_networkfirewall.py:12-22):
    event.proto -> network.transport (lowercased); alert events get
    event.kind=alert + event.category=intrusion_detection."""
    out = df
    if "event_proto" in out.columns:
        out = out.withColumn("network_transport", F.lower(F.col("event_proto")))
    if "event_event_type" in out.columns:
        is_alert = F.col("event_event_type") == "alert"
        out = out.withColumn("event_kind", F.when(is_alert, "alert")).withColumn(
            "event_category", F.when(is_alert, "intrusion_detection")
        )
    return out


#: CloudFront distribution id in the S3 key (sf_cloudfront_realtime.py:14)
_CF_DIST_ID_RE = r"((?=[0-9]{0,13}[A-Z])[A-Z0-9]{12,14})"


def sf_cloudfront_realtime(df: DataFrame) -> DataFrame:
    """CloudFront realtime-log normalization (sf_cloudfront_realtime.py:17-35):
    url.path loses its query string, url.full reassembled from
    protocol/host/uri-stem, http.version from 'HTTP/1.1', user agent
    percent-unquoted (urllib parity), distribution id extracted from the
    S3 key (else 'unknown')."""
    from .scalars import _unquote_once

    out = df
    if "url_path" in out.columns:
        out = out.withColumn("url_path", F.split(F.col("url_path"), r"\?")[0])
    if all(c in out.columns for c in ("cs_protocol", "cs_host", "cs_uri_stem")):
        out = out.withColumn(
            "url_full",
            F.concat(F.col("cs_protocol"), F.lit("://"), F.col("cs_host"), F.col("cs_uri_stem")),
        )
    if "cs_protocol_version" in out.columns:
        out = out.withColumn("http_version", F.split(F.col("cs_protocol_version"), "/")[1])
    if "user_agent_original" in out.columns:
        out = out.withColumn("user_agent_original", _unquote_once(F.col("user_agent_original")))
    if "log_s3key" in out.columns:
        m = F.regexp_extract(F.col("log_s3key"), _CF_DIST_ID_RE, 1)
        out = out.withColumn("distribution_id", F.when(m != "", m).otherwise("unknown"))
    return out


#: permissive schema over the parts of the Config `configuration` JSON the
#: ip extraction needs (sf_config_snapshot.py:196-296)
_CONFIG_IP_SCHEMA = (
    "privateIpAddress string, "
    "networkInterfaces array<struct<privateIpAddresses array<struct<"
    "privateIpAddress string, association struct<publicIp string>>>>>, "
    "privateIpAddresses array<struct<privateIpAddress string, "
    "association struct<publicIp string>>>, "
    "natGatewayAddresses array<struct<publicIp string, privateIp string>>, "
    "`AWS:Network` struct<Content array<struct<IPV4 string, IPV6 string>>>"
)


def sf_config_snapshot(df: DataFrame) -> DataFrame:
    """AWS Config snapshot normalization — the reference's largest sf_
    transform (siem/sf_config_snapshot.py, 307 LoC of per-resourceType
    dict surgery), re-expressed as column algebra:

    - update_doc_ids (:19-31): ``@id`` = md5(account+region+resourceType+
      resourceId); ``__doc_id_suffix`` = strftime(ts)_md5(module+ruleARN)[:4].
    - extract_host (:207-227): EC2/SSM instance ids -> cloud_instance_id +
      related_hosts; ResourceCompliance 'Type/id' targets split (including
      the reference's own quirk of routing an EC2 compliance target to
      user.id — replicated faithfully).
    - extract_user (:230-248): IAM users/roles -> user_id/user_name +
      related_user (name first, then id, skipping empties).
    - extract_ip (:251-296): the `configuration` JSON parsed with a
      permissive schema; EIP / EC2 ENI / NIC / NatGateway / SSM-inventory
      addresses collected, de-duped, ''-stripped, sorted -> related_ip.
    - rename_config_field_name (:98-193): the ES-mapping scalar renames
      surfaced as columns (configuration_owner_id, state_code/state_name,
      status/status_message, endpoint_address).  The dict->list rewrites
      (:34-95) guard OpenSearch dynamic mappings against key explosion; a
      columnar sink keeps `configuration` as an opaque JSON string, so
      they are intentionally not replicated.

    Expects JSON-scan columns (camelCase accepted) with ``configuration``
    as a JSON string and ``ts`` as the snapshot timestamp."""
    out = camel_to_snake_columns(df)

    def col_named(*cands):
        canon = {c.replace("_", "").lower(): c for c in out.columns}
        for cand in cands:
            hit = canon.get(cand.replace("_", "").lower())
            if hit:
                return F.col(hit)
        return F.lit(None).cast("string")

    acct, region = col_named("aws_account_id"), col_named("aws_region")
    rtype, rid = col_named("resource_type"), col_named("resource_id")
    rname = col_named("resource_name")
    rule_arn = col_named("config_rule_arn", "configRuleARN")
    module = col_named("event_module")

    out = out.withColumn("@id", F.md5(F.concat(acct, region, rtype, rid)))
    if "ts" in out.columns:
        out = out.withColumn(
            "__doc_id_suffix",
            F.concat(
                F.date_format(F.col("ts"), "yyyyMMdd_HHmmss"),
                F.lit("_"),
                F.substring(F.md5(F.concat(F.coalesce(module, F.lit("")), F.coalesce(rule_arn, F.lit("")))), 1, 4),
            ),
        )

    # --- host
    target = F.split(rid, "/")
    compliance_2part = (rtype == "AWS::Config::ResourceCompliance") & (F.size(target) == 2)
    instance_id = (
        F.when(rtype.isin("AWS::EC2::Instance", "AWS::SSM::ManagedInstanceInventory"), rid)
        .when(
            rtype.isin("AWS::SSM::AssociationCompliance", "AWS::SSM::PatchCompliance"),
            F.element_at(target, -1),
        )
    )
    out = out.withColumn("cloud_instance_id", instance_id).withColumn(
        "related_hosts", F.when(instance_id.isNotNull(), F.array(instance_id))
    )

    # --- user (incl. the faithful extract_host EC2-compliance quirk)
    user_id = (
        F.when(rtype.isin("AWS::IAM::User", "AWS::IAM::Role"), rid)
        .when(compliance_2part & F.element_at(target, 1).isin("AWS::IAM::Role", "AWS::IAM::User", "AWS::EC2::Instance"), F.element_at(target, 2))
    )
    user_name = F.when(rtype.isin("AWS::IAM::User", "AWS::IAM::Role"), F.coalesce(rname, F.lit("")))
    out = (
        out.withColumn("user_id", user_id)
        .withColumn("user_name", user_name)
        .withColumn(
            "related_user",
            F.when(
                user_id.isNotNull(),
                F.filter(F.array(user_name, user_id), lambda x: x.isNotNull() & (x != "")),
            ),
        )
    )

    # --- ip
    if "configuration" in out.columns:
        cfg = F.from_json(F.col("configuration"), _CONFIG_IP_SCHEMA)
        nic_ips = lambda nics: F.flatten(
            F.transform(
                nics,
                lambda nic: F.filter(
                    F.array(nic["privateIpAddress"], nic["association"]["publicIp"]),
                    lambda x: x.isNotNull(),
                ),
            )
        )
        ips = (
            F.when(rtype == "AWS::EC2::EIP", F.array(rname, cfg["privateIpAddress"]))
            .when(
                rtype == "AWS::EC2::Instance",
                F.flatten(F.transform(cfg["networkInterfaces"], lambda eni: nic_ips(eni["privateIpAddresses"]))),
            )
            .when(rtype == "AWS::EC2::NetworkInterface", nic_ips(cfg["privateIpAddresses"]))
            .when(
                rtype == "AWS::EC2::NatGateway",
                F.array(
                    F.element_at(cfg["natGatewayAddresses"], 1)["publicIp"],
                    F.element_at(cfg["natGatewayAddresses"], 1)["privateIp"],
                ),
            )
            .when(
                rtype == "AWS::SSM::ManagedInstanceInventory",
                F.flatten(
                    F.transform(
                        cfg["`AWS:Network`".strip("`")]["Content"],
                        lambda c: F.array(c["IPV6"], c["IPV4"]),
                    )
                ),
            )
        )
        clean = F.array_sort(
            F.array_distinct(F.filter(ips, lambda x: x.isNotNull() & (x != "")))
        )
        out = out.withColumn("related_ip", F.when(F.size(clean) > 0, clean))
        # --- scalar renames out of the configuration JSON
        out = (
            out.withColumn("configuration_owner_id", F.get_json_object(F.col("configuration"), "$.owner.id"))
            .withColumn("state_code", F.get_json_object(F.col("configuration"), "$.state.code"))
            .withColumn("state_name", F.get_json_object(F.col("configuration"), "$.state.name"))
            .withColumn("status_message", F.get_json_object(F.col("configuration"), "$.status.message"))
            .withColumn(
                "endpoint_address",
                F.coalesce(
                    F.get_json_object(F.col("configuration"), "$.endpoint.address"),
                    F.when(
                        ~F.get_json_object(F.col("configuration"), "$.endpoint").startswith("{"),
                        F.get_json_object(F.col("configuration"), "$.endpoint"),
                    ),
                ),
            )
        )
    return out


#: EC2 instance id anywhere in text (reference siem/utils.py:97-98)
INSTANCE_ID_RE = r"(?:\W|_|^)(i-(?:[0-9a-z]{8}|[0-9a-z]{17}))(?:\W|_|$)"


def sf_linux_os_syslog(df: DataFrame) -> DataFrame:
    """Linux OS syslog routing (sf_linux_os_syslog.py:103-124): instance
    id mined from the CloudWatch log stream -> cloud.instance.id +
    related.hosts [hostname, instance]; sshd/sudo/su lines route to the
    secure index and get the sf_linux_secure sshd/sudo extraction."""
    out = sf_linux_secure(df)
    proc = F.col("proc")
    secure = proc.contains("sshd") | proc.contains("sudo") | (proc == "su")
    out = out.withColumn("__index_name", F.when(secure, "log-linux-secure"))
    if "log_stream" in out.columns:
        iid = F.regexp_extract(F.col("log_stream"), INSTANCE_ID_RE, 1)
        iid = F.when(iid != "", iid)
        out = out.withColumn("cloud_instance_id", iid)
        if "hostname" in out.columns:
            out = out.withColumn(
                "related_hosts",
                F.when(iid.isNotNull(), F.array(F.col("hostname"), iid)),
            )
        else:
            out = out.withColumn("related_hosts", F.when(iid.isNotNull(), F.array(iid)))
    return out


def _named_extract_udf(pattern: str, fields: list[str]):
    """Arrow-batched named-group extraction for one pattern (generic
    sibling of _cascade_extract_udf)."""
    import re

    import pandas as pd
    from pyspark.sql import types as T

    rx = re.compile(pattern)
    schema = T.StructType([T.StructField(f, T.StringType()) for f in fields])

    @F.pandas_udf(schema)
    def extract(msgs):
        out = {f: [] for f in fields}
        for msg in msgs.fillna(""):
            m = rx.search(msg)
            g = m.groupdict() if m else {}
            for f in fields:
                out[f].append(g.get(f))
        return pd.DataFrame(out)

    return extract


#: nginx error-log message decomposition (sf_nginx_error.py:16-23)
NGINX_ERROR_MSG_RE = (
    r"client: (?P<client_ip>[0-9a-f.:]+), server: (-|(?P<server>[^ ]*?))"
    r"(?:, request: \"((?P<request_method>[^ ]+) (?P<request_path>[^ ]+) "
    r"HTTP/(?P<request_version>[^ ]+)|(?P<request_raw>.*?))\")?"
    r"(?:, upstream: \"(?P<upstream>.+?)\")?"
    r"(?:, host: \"(?P<host>[^ ]+?)\")?"
    r"(?:, referrer: \"(?P<referrer>[^ ]+?)\")?$"
)


def sf_nginx_error(df: DataFrame) -> DataFrame:
    """nginx error log (sf_nginx_error.py:39-116): message decomposed into
    client ip / request / host / referrer, the http+url bundle via
    http_url_decompose, service.name from the s3 key, scheme from the
    log group, instance id from the log stream, connection id namespaced;
    raw line-parse columns dropped like the reference."""
    from .scalars import http_url_decompose

    ext = _named_extract_udf(
        NGINX_ERROR_MSG_RE,
        ["client_ip", "server", "request_method", "request_path",
         "request_version", "request_raw", "upstream", "host", "referrer"],
    )(F.col("message"))
    out = df.withColumn("_m", ext)
    out = (
        out.withColumn("source_ip", F.col("_m.client_ip"))
        .withColumn("source_address", F.col("_m.client_ip"))
        .withColumn("related_ip", F.col("_m.client_ip"))
        .withColumn("http_request_referrer", F.col("_m.referrer"))
        .withColumn(
            "web",
            http_url_decompose(
                F.col("_m.request_method"), F.col("_m.request_path"),
                F.col("_m.request_version"), F.col("_m.request_raw"),
            ),
        )
    )
    host_parts = F.split(F.col("_m.host"), ":")
    out = out.withColumn(
        "url_domain", F.when(F.col("_m.host").isNotNull(), host_parts[0])
    ).withColumn("url_port", F.when(F.size(host_parts) == 2, host_parts[1]))
    if "log_s3key" in out.columns:
        svc = F.regexp_extract(F.col("log_s3key"), r"/web-site-name=([^/]*?)/", 1)
        out = out.withColumn("service_name", F.when(svc != "", svc))
    if "log_group" in out.columns:
        out = out.withColumn(
            "url_scheme",
            F.when(F.col("log_group").contains("ssl"), "https").when(
                F.col("log_group").contains("error"), "http"
            ),
        )
    if "log_stream" in out.columns:
        iid = F.regexp_extract(F.col("log_stream"), INSTANCE_ID_RE, 1)
        out = out.withColumn("cloud_instance_id", F.when(iid != "", iid))
    if "connection_id" in out.columns:
        out = out.withColumn("nginx_error_connection_id", F.col("connection_id"))
    drop = [c for c in ("_m", "connection_id", "datetime", "message", "process_id", "thread_id", "severity") if c in out.columns or c == "_m"]
    return out.drop(*drop)


def _rds_identifiers(df: DataFrame) -> DataFrame:
    """RDS cluster/instance identifiers from the CloudWatch log group +
    stream (reference utils.py:143-174): /aws/rds/{instance|cluster}/
    {identifier}/... — 'instance' -> instance id only; 'cluster' ->
    cluster id + the log stream's first dotted segment as instance id."""
    if "log_group" not in df.columns or "log_stream" not in df.columns:
        return df
    parts = F.split(F.col("log_group"), "/")
    kind4 = F.element_at(parts, 4)
    ident5 = F.element_at(parts, 5)
    stream0 = F.element_at(F.split(F.col("log_stream"), r"\."), 1)
    return df.withColumn(
        "rds_cluster_identifier", F.when(kind4 == "cluster", ident5)
    ).withColumn(
        "rds_instance_identifier",
        F.when(kind4 == "instance", ident5).when(kind4 == "cluster", stream0),
    )


#: rds_postgresql message classifiers (sf_rds_postgresql.py:15-22)
PG_SESSION_TIME_RE = r"disconnection: session time: (\d+):(\d{2}):([\d.]+)"
PG_STATEMENT_RE = r"^statement:\s+(\w+.*)"
PG_DURATION_RE = r"^duration:\s+([\d.]+)\s+ms(?:\s*(parse|bind|execute)?.*?:\s+(.*))?"


def sf_rds_postgresql(df: DataFrame) -> DataFrame:
    """RDS PostgreSQL log normalization (sf_rds_postgresql.py:26-90):
    cluster/instance identifiers from the CloudWatch log group/stream,
    then the log_level-keyed cascade — STATEMENT -> rds.query, FATAL
    auth failures / LOG authorizations -> authentication events,
    disconnection session time (the reference computes hours*60*24 —
    faithfully replicated), duration/statement slow-log extraction."""
    msg = F.col("postgresql_message")
    lvl = F.col("postgresql_log_level")
    out = _rds_identifiers(df)
    auth_fail = (lvl == "FATAL") & msg.contains("authentication failed")
    auth_ok = (lvl == "LOG") & msg.contains("connection authorized")
    out = (
        out.withColumn("event_category", F.when(auth_fail | auth_ok, "authentication"))
        .withColumn("event_type", F.when(auth_fail | auth_ok, "start"))
        .withColumn("event_action", F.when(auth_fail, "failed").when(auth_ok, "authorized"))
        .withColumn("event_outcome", F.when(auth_fail, "failure").when(auth_ok, "success"))
    )
    sess_h = F.regexp_extract(msg, PG_SESSION_TIME_RE, 1)
    sess_m = F.regexp_extract(msg, PG_SESSION_TIME_RE, 2)
    sess_s = F.regexp_extract(msg, PG_SESSION_TIME_RE, 3)
    has_sess = (lvl == "LOG") & ~auth_ok & (sess_s != "")
    # NOTE: hours multiply by 60*24 in the reference (sf_rds_postgresql.py:81
    # — looks like a bug for *3600, replicated for parity)
    sess_total = (
        sess_s.cast("double")
        + F.when(sess_m.cast("int") > 0, sess_m.cast("double") * 60).otherwise(0.0)
        + F.when(sess_h.cast("int") > 0, sess_h.cast("double") * 60 * 24).otherwise(0.0)
    )
    out = out.withColumn("postgresql_session_time_seconds", F.when(has_sess, sess_total))
    stmt = F.regexp_extract(msg, PG_STATEMENT_RE, 1)
    dur = F.regexp_extract(msg, PG_DURATION_RE, 1)
    dur_step = F.regexp_extract(msg, PG_DURATION_RE, 2)
    dur_stmt = F.regexp_extract(msg, PG_DURATION_RE, 3)
    is_stmt_lvl = lvl == "STATEMENT"
    slow_ok = (lvl == "LOG") & ~auth_ok & ~has_sess
    has_stmt = slow_ok & (stmt != "")
    has_dur = slow_ok & (stmt == "") & (dur != "")
    out = (
        out.withColumn(
            "rds_query",
            F.when(is_stmt_lvl, msg)
            .when(has_stmt, F.regexp_replace(stmt, ";+$", ""))
            .when(has_dur & (dur_step != ""), dur_stmt),
        )
        .withColumn(
            "postgresql_query_step",
            F.when(has_stmt, "execute").when(
                has_dur, F.when(dur_step != "", dur_step).otherwise("execute")
            ),
        )
        .withColumn("postgresql_duration_ms", F.when(has_dur, dur.cast("double")))
        .withColumn("rds_query_time", F.when(has_dur, dur.cast("double") / 1000.0))
    )
    return out


def sf_clientvpn(df: DataFrame) -> DataFrame:
    """Client VPN connection log (sf_clientvpn.py:10-51): outcome from the
    attempt status, error.message from the failure reason, 'NA' client ip
    nulled, bytes/packets totals, ' ' -> 'T' + '+00:00' timestamp fixups,
    duration seconds -> event.duration nanoseconds."""
    st = F.col("connection_attempt_status")
    out = df.withColumn(
        "event_outcome",
        F.when(st == "successful", "success").when(st == "failed", "failure"),
    )
    if "connection_attempt_failure_reason" in df.columns:
        r = F.col("connection_attempt_failure_reason")
        out = out.withColumn("error_message", F.when(r != "NA", r))
    if "client_ip" in out.columns:
        out = out.withColumn("client_ip", F.when(F.col("client_ip") != "NA", F.col("client_ip")))
    b = sum(
        (F.coalesce(F.col(c).cast("long"), F.lit(0)) for c in ("egress_bytes", "ingress_bytes") if c in df.columns),
        F.lit(0).cast("long"),
    )
    pk = sum(
        (F.coalesce(F.col(c).cast("long"), F.lit(0)) for c in ("egress_packets", "ingress_packets") if c in df.columns),
        F.lit(0).cast("long"),
    )
    out = out.withColumn("network_bytes", F.when((b != 0) | (pk != 0), b)).withColumn(
        "network_packets", F.when((b != 0) | (pk != 0), pk)
    )
    for c in ("connection_start_time", "connection_end_time", "connection_last_update_time"):
        if c in out.columns:
            fixed = F.concat(F.regexp_replace(F.col(c), " ", "T"), F.lit("+00:00"))
            out = out.withColumn(c, F.when(F.col(c) != "NA", fixed))
    if "connection_duration_seconds" in out.columns:
        d = F.col("connection_duration_seconds")
        out = out.withColumn(
            "event_duration",
            F.when(d != "NA", d.cast("long") * 1000 * 1000 * 1000),
        )
    return out


#: MSK broker log s3-key and ConsumerLag line (sf_msk.py:14-19)
MSK_CLUSTER_RE = r"/([\w-]+)-(\w{8}-\w{4}-\w{4}-\w{4}-\w{12}-\w{1})/.*/Broker-(\d+)_"
MSK_CONSUMER_LAG_RE = (
    r"ConsumerLag for groupId=([\w.-]+) topic=([\w.-]+) : SumLag=(\d+) "
    r"MaxLag=(\d+) TimeLag=(\d+)"
)


def sf_msk(df: DataFrame) -> DataFrame:
    """MSK broker log (sf_msk.py:23-37): cluster name + broker id from the
    s3 key, ConsumerLag line decomposition."""
    out = df
    if "log_s3key" in out.columns:
        cl = F.regexp_extract(F.col("log_s3key"), MSK_CLUSTER_RE, 1)
        br = F.regexp_extract(F.col("log_s3key"), MSK_CLUSTER_RE, 3)
        out = out.withColumn("msk_cluster_name", F.when(cl != "", cl)).withColumn(
            "msk_broker_id", F.when(br != "", br)
        )
    lag = [F.regexp_extract(F.col("msk_message"), MSK_CONSUMER_LAG_RE, i) for i in range(1, 6)]
    has = lag[0] != ""
    return (
        out.withColumn("msk_log_type", F.when(has, "ConsumerLag"))
        .withColumn("msk_group_id", F.when(has, lag[0]))
        .withColumn("msk_topic", F.when(has, lag[1]))
        .withColumn("msk_sum_lag", F.when(has, lag[2]))
        .withColumn("msk_max_lag", F.when(has, lag[3]))
        .withColumn("msk_time_lag", F.when(has, lag[4]))
    )


_IPV4_RE = r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
_IPV6ISH_RE = r"^[0-9A-Fa-f:]+:[0-9A-Fa-f:]*$"


def sf_trustedadvisor(df: DataFrame) -> DataFrame:
    """Trusted Advisor check result (sf_trustedadvisor.py:10-105):
    event.kind=alert on warning/error statuses, service + ARN recovered
    by positional lookup of the check metadata headers in the flagged
    resource metadata, EC2 instance id from the ARN resource part,
    category mapping, related ip (IP-shaped metadata entries) and hosts.
    Expects flattened columns: result_status, flagged_status,
    check_metadata array<string>, result_metadata array<string>."""
    out = df
    kind = F.when(
        F.col("result_status").isin("warning", "error")
        | F.col("flagged_status").isin("warning", "error"),
        "alert",
    ).otherwise("event")
    out = out.withColumn("event_kind", kind)

    cm, rm = F.col("check_metadata"), F.col("result_metadata")
    svc_pos = F.array_position(cm, "Service")
    res_pos = F.array_position(cm, "Resource")
    wl_pos = F.array_position(cm, "Workload ARN")
    arn = F.coalesce(
        F.when(wl_pos > 0, F.element_at(rm, wl_pos.cast("int"))),
        F.when(res_pos > 0, F.element_at(rm, res_pos.cast("int"))),
        F.lit(""),
    )
    arn_parts = F.split(arn, ":")
    svc = F.when(F.size(arn_parts) > 2, F.lower(F.element_at(arn_parts, 3))).otherwise(
        F.when(svc_pos > 0, F.lower(F.element_at(rm, svc_pos.cast("int")))).otherwise(
            "trustedadvisor"
        )
    )
    # arn:partition:service:region:account:resource-type/resource-id
    res_part = F.when(F.size(arn_parts) > 5, F.element_at(arn_parts, 6))
    rt = F.split(res_part, "/")
    is_ec2_inst = (svc == "ec2") & (F.size(rt) > 1) & (rt[0] == "instance")
    svc_final = F.when(is_ec2_inst, "ec2").when(
        (svc == "ec2") & (F.size(rt) > 1), rt[0]
    ).otherwise(svc)
    out = (
        out.withColumn("cloud_service_name", svc_final)
        .withColumn("cloud_instance_id", F.when(is_ec2_inst, rt[1]))
        .withColumn(
            "event_category",
            F.when(svc_final.isin("rds", "dynamodb", "s3", "ebs", "redshift", "elasticache"), "database")
            .when(svc_final.isin("iam", "cloudtrail"), "iam")
            .when(
                svc_final.isin("vpc", "route53", "elasticloadbalancing", "network-acl", "subnet", "secuirty-group"),
                "network",
            )
            .otherwise("configuration"),
        )
    )
    ips = F.filter(rm, lambda x: x.rlike(_IPV4_RE) | x.rlike(_IPV6ISH_RE))
    out = out.withColumn("related_ip", F.when(F.size(ips) > 0, F.slice(ips, -1, 1)))
    return out.withColumn(
        "related_hosts",
        F.when(F.col("cloud_instance_id").isNotNull(), F.array(F.col("cloud_instance_id"))),
    )


def sf_rds_mysql_audit(df: DataFrame) -> DataFrame:
    """RDS MySQL/MariaDB audit log (sf_rds_mysql_audit.py:13-48):
    identifiers, micro-epoch timestamp to seconds, quoted+escaped query
    unwrapped, CONNECT/FAILED_CONNECT/DISCONNECT auth events, retcode
    outcome."""
    out = _rds_identifiers(df)
    if "mysql_timestamp" in out.columns:
        ts = F.col("mysql_timestamp").cast("double")
        # strictly > 10^15, like the reference (utils.py:375)
        out = out.withColumn(
            "mysql_timestamp",
            F.when(ts > F.lit(1000000000000000.0), ts / 1e6).otherwise(ts),
        )
    if "mysql_object" in out.columns:
        q = F.regexp_replace(F.col("mysql_object"), ";+$", "")
        # the reference unicode-unescapes then strips the surrounding
        # quotes; the common case is \'-escaped quotes inside
        q = F.regexp_replace(q, r"\\\'", "'")
        q = F.regexp_replace(q, r'\\\"', '"')
        out = out.withColumn("rds_query", q.substr(F.lit(2), F.length(q) - 2))
    if "mysql_operation" in out.columns:
        op = F.col("mysql_operation")
        out = (
            out.withColumn(
                "event_category",
                F.when(op.isin("FAILED_CONNECT", "CONNECT", "DISCONNECT"), "authentication"),
            )
            .withColumn(
                "event_type",
                F.when(op.isin("FAILED_CONNECT", "CONNECT"), "start").when(op == "DISCONNECT", "end"),
            )
            .withColumn(
                "event_action",
                F.when(op == "FAILED_CONNECT", "failed")
                .when(op == "CONNECT", "authorized")
                .when(op == "DISCONNECT", "disconnected"),
            )
        )
    if "mysql_retcode" in out.columns:
        out = out.withColumn(
            "event_outcome",
            F.when(F.col("mysql_retcode") == 0, "success").when(
                F.col("mysql_retcode").isNotNull(), "failure"
            ),
        )
    return out


#: mysql error-log auth patterns (sf_rds_mysql_error.py:16-20)
MYSQL_AUTH_FAILED_RE = r"Access denied for user '([^']*)'@'([^']*)'"
MYSQL_UNKNOWN_DB_RE = r"Unknown database '([^']*)'"


def sf_rds_mysql_error(df: DataFrame) -> DataFrame:
    """RDS MySQL error log (sf_rds_mysql_error.py:22-66): identifiers,
    access-denied user/host extraction (host doubles as source.ip when
    IP-shaped), unknown-database failures."""
    out = _rds_identifiers(df)
    msg = F.col("mysql_message")
    user = F.regexp_extract(msg, MYSQL_AUTH_FAILED_RE, 1)
    host = F.regexp_extract(msg, MYSQL_AUTH_FAILED_RE, 2)
    db = F.regexp_extract(msg, MYSQL_UNKNOWN_DB_RE, 1)
    denied = msg.rlike(MYSQL_AUTH_FAILED_RE)
    unknown = msg.rlike(MYSQL_UNKNOWN_DB_RE)
    ipish = host.rlike(_IPV4_RE) | host.rlike(_IPV6ISH_RE)
    return (
        out.withColumn("event_category", F.when(denied | unknown, "authentication"))
        .withColumn("event_type", F.when(denied | unknown, "start"))
        .withColumn("event_action", F.when(denied | unknown, "failed"))
        .withColumn("event_outcome", F.when(denied | unknown, "failure"))
        .withColumn("mysql_username", F.when(denied, user))
        .withColumn("user_name", F.when(denied, user))
        .withColumn("mysql_host", F.when(denied, host))
        .withColumn("source_address", F.when(denied, host))
        .withColumn("source_ip", F.when(denied & ipish, host))
        .withColumn("mysql_database", F.when(unknown, db))
        .withColumn("rds_database_name", F.when(unknown, db))
    )


def sf_rds_mysql_general(df: DataFrame) -> DataFrame:
    """RDS MySQL general log (sf_rds_mysql_general.py): identifiers only."""
    return _rds_identifiers(df)


#: mysql slow-query decomposition (sf_rds_mysql_slowquery.py:15-18)
MYSQL_SLOW_DB_RE = r"^use ([^ ]*?);"
MYSQL_SLOW_QUERY_RE = r"(?im)^(?!(?:use|set))[\s\S]*"


def sf_rds_mysql_slowquery(df: DataFrame) -> DataFrame:
    """RDS MySQL slow-query log (sf_rds_mysql_slowquery.py:20-36):
    identifiers, query time, database from the 'use' line, the query
    body minus use/set preamble."""
    out = _rds_identifiers(df)
    if "mysql_query_time" in out.columns:
        out = out.withColumn("rds_query_time", F.col("mysql_query_time"))
    q = F.col("mysql_query")
    db = F.regexp_extract(q, MYSQL_SLOW_DB_RE, 1)
    body = F.regexp_extract(q, MYSQL_SLOW_QUERY_RE, 0)
    return out.withColumn("rds_database_name", F.when(db != "", db)).withColumn(
        "rds_query", F.when(body != "", F.regexp_replace(body, ";+$", ""))
    )


def sf_elasticache_redis_slowlog(df: DataFrame) -> DataFrame:
    """ElastiCache Redis slow log (sf_elasticache_redis_slowlog.py:11-22):
    ClientAddress 'ip:port' split (rsplit — IPv6-safe) into source
    fields + related.ip."""
    addr = F.col("ClientAddress")
    ip = F.regexp_extract(addr, r"^(.*):(\d+)$", 1)
    port = F.regexp_extract(addr, r"^(.*):(\d+)$", 2)
    has = addr.isNotNull() & (ip != "")
    return (
        df.withColumn("source_ip", F.when(has, ip))
        .withColumn("source_address", F.when(has, ip))
        .withColumn("source_port", F.when(has, port))
        .withColumn("related_ip", F.when(has, F.array(ip)))
    )


def sf_windows_event(df: DataFrame, eventid_lookup: DataFrame | None = None) -> DataFrame:
    """Windows event log (sf_windows_event.py:13-28): EventID ->
    (action, outcome) via the broadcast TSV lookup (enrich.
    winevt_eventid_lookup) and instance id from the log stream.
    sf_directory_service.py is the identical transform for AD logs —
    registered as an alias."""
    from ..operators.enrich import winevt_eventid_lookup

    out = df
    if eventid_lookup is not None and "event_id" in df.columns:
        out = winevt_eventid_lookup(out, eventid_lookup)
    if "log_stream" in out.columns:
        iid = F.regexp_extract(F.col("log_stream"), INSTANCE_ID_RE, 1)
        out = out.withColumn("cloud_instance_id", F.when(iid != "", iid))
    return out


def sf_cloudtrail(df: DataFrame) -> DataFrame:
    """CloudTrail normalization (sf_cloudtrail.py:73-120 — the queryable
    core): outcome from errorCode/errorMessage presence, assumed-role
    user.name collapsed to its last path segment, and the instance-id
    extraction paths (SSM StartSession/GetConnectionStatus target, SSM
    PutComplianceItems resourceId when instance-shaped, STS role session
    from EC2, CloudHSM cluster/hsm ids -> related.hosts).

    The remainder of the reference transform (sf_cloudtrail.py:121-245)
    coerces string-vs-object union fields (credentials/tags/policy/
    status/...) so OpenSearch dynamic mappings don't explode; a columnar
    sink keeps requestParameters/responseElements as opaque JSON strings,
    so those coercions are intentionally not replicated.  Expects
    requestParameters / responseElements as JSON string columns."""
    out = df
    has_err = None
    for c in ("errorCode", "error_code"):
        if c in out.columns:
            has_err = F.col(c).isNotNull()
    for c in ("errorMessage", "error_message"):
        if c in out.columns:
            e = F.col(c).isNotNull()
            has_err = e if has_err is None else (has_err | e)
    out = out.withColumn(
        "event_outcome",
        F.lit("success") if has_err is None else F.when(has_err, "failure").otherwise("success"),
    )
    if "user_name" in out.columns:
        n = F.col("user_name")
        tail = F.element_at(F.split(F.element_at(F.split(n, ":"), -1), "/"), -1)
        out = out.withColumn("user_name", F.when(n.contains(":"), tail).otherwise(n))
    req = F.col("requestParameters") if "requestParameters" in out.columns else F.lit(None).cast("string")
    res = F.col("responseElements") if "responseElements" in out.columns else F.lit(None).cast("string")
    src = F.col("eventSource") if "eventSource" in out.columns else F.lit(None).cast("string")
    name = F.col("eventName") if "eventName" in out.columns else F.lit(None).cast("string")
    ua = F.col("userAgent") if "userAgent" in out.columns else F.lit(None).cast("string")
    ssm_target = F.get_json_object(req, "$.target")
    ssm_res = F.get_json_object(req, "$.resourceId")
    sts_session = F.get_json_object(req, "$.roleSessionName")
    hsm_cluster = F.get_json_object(req, "$.clusterId")
    hsm_id = F.coalesce(
        F.get_json_object(res, "$.hsmId"), F.get_json_object(res, "$.hsm.hsmId")
    )
    instance_id = (
        F.when((src == "ssm.amazonaws.com") & name.isin("StartSession", "GetConnectionStatus"), ssm_target)
        .when(
            (src == "ssm.amazonaws.com") & (name == "PutComplianceItems"),
            F.when(ssm_res.rlike(r"^i-(?:[0-9a-z]{8}|[0-9a-z]{17})"), ssm_res),
        )
        .when((src == "sts.amazonaws.com") & (ua == "ec2.amazonaws.com"), sts_session)
        .when(src == "cloudhsm.amazonaws.com", hsm_id)
    )
    out = out.withColumn("cloud_instance_id", instance_id)
    hsm_hosts = F.filter(F.array(hsm_cluster, hsm_id), lambda x: x.isNotNull())
    return out.withColumn(
        "related_hosts", F.when(src == "cloudhsm.amazonaws.com", hsm_hosts)
    )


def sf_apache_error(df: DataFrame) -> DataFrame:
    """Apache error log (sf_apache_error.py:33-75): instance id + hosts,
    service.name from the s3 key, referer from the message, scheme from
    the log group, log level -> event.type, raw parse columns dropped."""
    out = df
    if "log_stream" in out.columns:
        iid = F.regexp_extract(F.col("log_stream"), INSTANCE_ID_RE, 1)
        iid = F.when(iid != "", iid)
        out = out.withColumn("cloud_instance_id", iid)
        hosts = (
            F.when(F.col("hostname").isNotNull(), F.array(F.col("hostname"), iid)).otherwise(F.array(iid))
            if "hostname" in out.columns
            else F.array(iid)
        )
        out = out.withColumn("related_hosts", F.when(iid.isNotNull(), hosts))
    if "log_s3key" in out.columns:
        svc = F.regexp_extract(F.col("log_s3key"), r"/web-site-name=([^/]*?)/", 1)
        out = out.withColumn("service_name", F.when(svc != "", svc))
    if "message" in out.columns:
        ref = F.regexp_extract(F.col("message"), r"referer:\s*(http[^ ]*)", 1)
        out = out.withColumn("http_request_referrer", F.when(ref != "", ref))
    if "log_group" in out.columns:
        out = out.withColumn(
            "url_scheme",
            F.when(F.col("log_group").contains("ssl"), "https").when(
                F.col("log_group").contains("error"), "http"
            ),
        )
    if "log_level" in out.columns:
        lv = F.col("log_level")
        out = out.withColumn(
            "event_type",
            F.when(lv == "info", "info").when(
                lv.isin("emerg", "alert", "crit", "error", "warn"), "error"
            ),
        )
    drop = [c for c in ("client_ip", "client_port", "datetime", "debug_message",
                        "log_level", "message", "message_code", "module", "pid", "tid")
            if c in out.columns]
    return out.drop(*drop)


def sf_clb(df: DataFrame) -> DataFrame:
    """Classic ELB access log (sf_clb.py:11-16): url.full = the request
    line's second token."""
    if "request" not in df.columns:
        return df
    return df.withColumn("url_full", F.split(F.col("request"), " ")[1])


#: CloudHSM audit-log opcodes that carry acting vs target user fields
_HSM_SELF_OPS = ("CN_LOGIN", "CN_LOGOUT", "CN_APP_FINALIZE", "CN_CLOSE_SESSION")
_HSM_TARGET_OPS = (
    "CN_CREATE_USER", "CN_CREATE_CO", "CN_CREATE_APPLIANCE_USER",
    "CN_DELETE_USER", "CN_SET_M_VALUE", "CN_CHANGE_PSWD", "CN_APPROVE_TOKEN",
)


def _transform_hsm(df: DataFrame, cluster_id, hsm_id) -> DataFrame:
    """Shared CloudHSM body (sf_cloudhsm.py:22-76): @id from hsm +
    sequence + usec, *_v2 renames, hex counters to ints, per-opcode
    user/target mapping, outcome from hsm_return presence."""
    out = df
    if all(c in out.columns for c in ("sequence_no", "timestamp_usec")):
        out = out.withColumn(
            "@id", F.concat(F.coalesce(hsm_id, F.lit("")), F.col("sequence_no"), F.col("timestamp_usec"))
        )
    if "opcode_v2" in out.columns:
        out = out.withColumn(
            "opcode", F.coalesce(F.col("opcode_v2"), F.col("opcode") if "opcode" in out.columns else F.lit(None))
        ).drop("opcode_v2")
        if "opcode_hex_v2" in out.columns:
            out = out.withColumn("opcode_hex", F.col("opcode_hex_v2")).drop("opcode_hex_v2")
    if "priv_secret_key_handle_v2" in out.columns:
        out = out.withColumn("priv_secret_key_handle", F.col("priv_secret_key_handle_v2")).drop(
            "priv_secret_key_handle_v2"
        )
    out = out.withColumn("cloudhsm_cluster_id", cluster_id).withColumn("cloudhsm_hsm_id", hsm_id)
    out = out.withColumn("cloud_instance_id", hsm_id).withColumn(
        "related_hosts", F.filter(F.array(cluster_id, hsm_id), lambda x: x.isNotNull())
    )
    for c in ("sequence_no", "reboot_counter"):
        if c in out.columns:
            # int(x, 16) accepts an optional 0x prefix; F.conv does not
            hexv = F.regexp_replace(F.col(c), "^0[xX]", "")
            out = out.withColumn(c, F.conv(hexv, 16, 10).cast("long"))
    if "opcode" in out.columns:
        op = F.col("opcode")
        if "user_name" in out.columns:
            out = out.withColumn(
                "ecs_user_name", F.when(op.isin(*_HSM_SELF_OPS), F.col("user_name"))
            ).withColumn(
                "ecs_user_roles", F.when(op.isin(*_HSM_SELF_OPS), F.col("user_type"))
            )
        if "target_user_name" in out.columns:
            tn = F.coalesce(
                F.when(F.col("target_user_name") != "", F.col("target_user_name")), F.col("user_name")
            )
            tt = F.coalesce(
                F.when(F.col("target_user_type") != "", F.col("target_user_type")), F.col("user_type")
            )
            out = out.withColumn(
                "user_target",
                F.when(
                    op.isin(*_HSM_TARGET_OPS),
                    F.struct(tn.alias("name"), tt.alias("roles"), F.col("target_user_id").alias("id")),
                ),
            )
    if "hsm_return" in out.columns:
        out = out.withColumn(
            "event_outcome",
            F.when(F.col("hsm_return").isNotNull() & (F.col("hsm_return") != ""), "success").otherwise("failure"),
        )
    return out


def sf_cloudhsm(df: DataFrame) -> DataFrame:
    """CloudHSM audit log via CloudWatch group/stream ids
    (sf_cloudhsm.py:11-19 + transform_hsm)."""
    cluster = (
        F.element_at(F.split(F.col("log_group"), "/"), 4) if "log_group" in df.columns else F.lit(None).cast("string")
    )
    hsm = F.col("log_stream") if "log_stream" in df.columns else F.lit(None).cast("string")
    return _transform_hsm(df, cluster, hsm)


#: cluster/hsm ids inside the S3 key (sf_cloudhsm_cwl.py:14-15)
HSM_S3KEY_RE = r"\W(cluster-[1-9a-z]{11})\W.*/(hsm-[1-9a-z]{11})\W"


def sf_cloudhsm_cwl(df: DataFrame) -> DataFrame:
    """CloudHSM audit log delivered via the CWL->S3 path: ids recovered
    from the S3 key (sf_cloudhsm_cwl.py:18-31)."""
    cl = F.regexp_extract(F.col("log_s3key"), HSM_S3KEY_RE, 1)
    hs = F.regexp_extract(F.col("log_s3key"), HSM_S3KEY_RE, 2)
    return _transform_hsm(df, F.when(cl != "", cl), F.when(hs != "", hs))


def sf_config_rules(df: DataFrame) -> DataFrame:
    """AWS Config rule evaluation (sf_config_rules.py:13-34): the
    config_snapshot id/host/user/ip extraction plus compliance ->
    event.outcome.  Expects the evaluation's complianceType flattened as
    ``compliance_type`` (or inside newEvaluationResult JSON)."""
    out = sf_config_snapshot(df)
    if "compliance_type" in out.columns:
        comp = F.col("compliance_type")
    elif "newEvaluationResult" in df.columns:
        comp = F.get_json_object(F.col("newEvaluationResult"), "$.complianceType")
    else:
        comp = F.lit(None).cast("string")
    return out.withColumn(
        "event_outcome",
        F.when(comp == "COMPLIANT", "success")
        .when(comp == "NON_COMPLIANT", "failure")
        .when(comp.isNotNull(), "unknown"),
    )


def sf_inspector(df: DataFrame) -> DataFrame:
    """Inspector v2 finding (sf_inspector.py:14-54): @id = md5(findingArn),
    doc suffix = epoch of updatedAt ('MMM d, yyyy, h:mm:ss a'), ECR
    container findings drop host linkage, rule.id composed per finding
    type, description merged with the remediation text."""
    out = camel_to_snake_columns(df)
    if "finding_arn" in out.columns:
        out = out.withColumn("@id", F.md5(F.col("finding_arn")))
    if "updated_at" in out.columns:
        ts = F.to_timestamp(F.col("updated_at"), "MMM d, yyyy, h:mm:ss a")
        out = out.withColumn(
            "__doc_id_suffix", F.unix_timestamp(ts).cast("long").cast("string")
        )
    is_ecr = (
        F.col("vulnerability_category").contains("AWS_ECR_CONTAINER_IMAGE")
        if "vulnerability_category" in out.columns
        else F.lit(False)
    )
    if "related_hosts" in out.columns:
        out = out.withColumn("related_hosts", F.when(~is_ecr, F.col("related_hosts")))
    if "cloud_instance_id" in out.columns:
        out = out.withColumn("cloud_instance_id", F.when(~is_ecr, F.col("cloud_instance_id")))
    if "type" in out.columns:
        rid = F.lit(None).cast("string")
        if "vulnerability_id" in out.columns:
            rid = F.when(
                F.col("type").contains("PACKAGE_VULNERABILITY"),
                F.concat(F.lit("PACKAGE_VULNERABILITY_"), F.col("vulnerability_id")),
            ).otherwise(rid)
        if all(c in out.columns for c in ("network_protocol", "port_begin", "port_end")):
            rid = F.when(
                F.col("type").contains("NETWORK_REACHABILITY"),
                F.concat_ws(
                    "_", F.lit("NETWORK_REACHABILITY"), F.col("network_protocol"),
                    F.col("port_begin"), F.col("port_end"),
                ),
            ).otherwise(rid)
        out = out.withColumn("rule_id", rid)
    if "description" in out.columns and "remediation_text" in out.columns:
        out = out.withColumn(
            "vulnerability_description",
            F.when(
                F.col("description").isNotNull() & F.col("remediation_text").isNotNull(),
                F.concat(F.col("description"), F.lit("\n\nRemediation: "), F.col("remediation_text")),
            ).otherwise(F.col("description")),
        )
    return out


def sf_opensearch_audit(df: DataFrame) -> DataFrame:
    """OpenSearch security audit log (sf_opensearch_audit.py:11-37):
    audit category -> outcome, authentication category appended,
    ParsingError rule fallback + 10k-truncation error message."""
    act = F.col("audit_category")
    out = df.withColumn(
        "event_outcome",
        F.when(act.isin("GRANTED_PRIVILEGES", "AUTHENTICATED"), "success")
        .when(act.isin("MISSING_PRIVILEGES", "FAILED_LOGIN"), "failure")
        .otherwise("unknown"),
    )
    auth = act.isin("FAILED_LOGIN", "AUTHENTICATED")
    if "event_category" in out.columns:
        out = out.withColumn(
            "event_category",
            F.when(auth, F.array_union(F.col("event_category"), F.array(F.lit("authentication")))).otherwise(
                F.col("event_category")
            ),
        )
    else:
        out = out.withColumn("event_category", F.when(auth, F.array(F.lit("authentication"))))
    has_rule = (
        F.col("rule_name").isNotNull() & (F.col("rule_name") != "")
        if "rule_name" in out.columns
        else F.lit(False)
    )
    existing_rule = F.col("rule_name") if "rule_name" in df.columns else F.lit(None).cast("string")
    # error_message BEFORE the rule_name overwrite: has_rule references the
    # rule_name column lazily, so ordering the withColumns the other way
    # would evaluate it against the already-defaulted value
    if "@message" in df.columns:
        out = out.withColumn(
            "error_message",
            F.when(
                ~has_rule & (F.length(F.col("@message")) == 10000),
                "The maximum size of each audit log message is 10,000 "
                "characters. The audit log message exceeds this limit and "
                "is truncated.",
            ),
        )
    out = out.withColumn(
        "rule_name", F.when(has_rule, existing_rule).otherwise("ParsingError")
    )
    return out


def sf_securitylake(df: DataFrame) -> DataFrame:
    """Security Lake / OCSF record routing (sf_securitylake.py:13-58):
    category name/uid -> __index_name + @log_type, findings take their
    modified/created time as the event timestamp, assumed-role user.name
    collapsed to its last path segment.  sf_ocsf_json.py delegates here —
    registered as an alias."""
    name = F.col("category_name") if "category_name" in df.columns else F.lit(None).cast("string")
    uid = (F.col("category_uid") if "category_uid" in df.columns else F.lit(None)).cast("int")
    sfx = F.when(
        name.isNotNull(), F.concat(F.lit("-"), F.lower(F.split(name, " ")[0]))
    ).otherwise(
        F.when(uid == 1, "-system")
        .when(uid == 2, "-findings")
        .when(uid == 3, "-audit")
        .when(uid == 4, "-network")
        .when(uid == 5, "-config")
        .otherwise("")
    )
    lt = F.when(
        name.isNotNull(), F.concat(F.lit("-"), F.lower(F.regexp_replace(name, " ", "-")))
    ).otherwise(
        F.when(uid == 1, "-system-activity")
        .when(uid == 2, "-findings")
        .when(uid == 3, "-audit-activity")
        .when(uid == 4, "-network-activity")
        .when(uid == 5, "-config-inventory")
        .otherwise("")
    )
    out = df.withColumn("__index_name", F.concat(F.lit("log-ocsf"), sfx)).withColumn(
        "@log_type", F.concat(F.lit("ocsf"), lt)
    )
    ftime = None
    for c in ("finding_modified_time", "finding_created_time"):
        if c in out.columns:
            e = F.col(c).cast("long")
            ftime = e if ftime is None else F.coalesce(ftime, e)
    if ftime is not None:
        out = out.withColumn(
            "@timestamp",
            F.when((uid == 2) & ftime.isNotNull(), F.timestamp_millis(ftime)).otherwise(
                F.col("@timestamp") if "@timestamp" in df.columns else F.lit(None).cast("timestamp")
            ),
        )
    if "user_name" in out.columns:
        n = F.col("user_name")
        tail = F.element_at(F.split(F.element_at(F.split(n, ":"), -1), "/"), -1)
        out = out.withColumn("user_name", F.when(n.contains(":"), tail).otherwise(n))
    return out


def transform_registry() -> dict:
    """Per-logtype transform hooks (SURVEY.md §2.11): the reference ships 41
    sf_<logtype>.transform(logdata) row-UDFs (siem/sf_*.py, loader
    siem/utils.py:721-748); ours are DataFrame->DataFrame transforms keyed
    the same way.  COMPLETE as of r3: all 41 reference logtypes — 36
    distinct transforms plus aliases that mirror genuine delegation in the
    reference (directory_service / fsx_win re-run the windows_event logic,
    config_history re-runs config_snapshot, ocsf_json delegates to
    securitylake; nginx_access is a thin wrapper on apache_access that
    keeps its two divergent byte-count fields).  The registry carries the
    reference's real per-logtype complexity: type-split regex fallbacks,
    severity mapping, header-map normalization, source/destination swap,
    regex cascades, url reassembly, raw-field del-lists."""
    from .scalars import action_outcome, protocol_name

    def vpcflowlogs(df: DataFrame) -> DataFrame:
        out = df
        if "protocol" in df.columns:
            out = out.withColumn("network_transport", protocol_name(F.col("protocol")))
        if "action" in df.columns:
            out = out.withColumn("event_outcome", action_outcome(F.col("action")))
        return out

    return {
        "vpcflowlogs": vpcflowlogs,
        "guardduty": sf_guardduty,
        "securityhub": sf_securityhub,
        "alb": sf_alb,
        "waf": sf_waf,
        "route53resolver": sf_route53resolver,
        "linux_secure": sf_linux_secure,
        "s3accesslog": sf_s3accesslog,
        "cloudfront_standard": sf_cloudfront_standard,
        "apache_access": sf_apache_access,
        # nginx = apache minus two dels: request_bytes/response_bytes
        # survive (reference sf_nginx_access.py vs sf_apache_access.py)
        "nginx_access": sf_nginx_access,
        "okta": sf_okta,
        "deepsecurity": sf_deepsecurity,
        "networkfirewall": sf_networkfirewall,
        "cloudfront_realtime": sf_cloudfront_realtime,
        "config_snapshot": sf_config_snapshot,
        "linux_os_syslog": sf_linux_os_syslog,
        "nginx_error": sf_nginx_error,
        "rds_postgresql": sf_rds_postgresql,
        "clientvpn": sf_clientvpn,
        "msk": sf_msk,
        "trustedadvisor": sf_trustedadvisor,
        "rds_mysql_audit": sf_rds_mysql_audit,
        "rds_mysql_error": sf_rds_mysql_error,
        "rds_mysql_general": sf_rds_mysql_general,
        "rds_mysql_slowquery": sf_rds_mysql_slowquery,
        "elasticache_redis_slowlog": sf_elasticache_redis_slowlog,
        "windows_event": sf_windows_event,
        # sf_directory_service.py / sf_fsx_win.py are byte-for-byte the
        # windows_event logic
        "directory_service": sf_windows_event,
        "fsx_win": sf_windows_event,
        "cloudtrail": sf_cloudtrail,
        "apache_error": sf_apache_error,
        "clb": sf_clb,
        "cloudhsm": sf_cloudhsm,
        "cloudhsm_cwl": sf_cloudhsm_cwl,
        # sf_config_history.py re-runs the full config_snapshot chain
        "config_history": sf_config_snapshot,
        "config_rules": sf_config_rules,
        "inspector": sf_inspector,
        "opensearch_audit": sf_opensearch_audit,
        "securitylake": sf_securitylake,
        # sf_ocsf_json.py delegates to sf_securitylake
        "ocsf_json": sf_securitylake,
    }


def apply_transform(df: DataFrame, logtype: str) -> DataFrame:
    """Dispatch like the reference's sf_ module loader: unknown logtype is
    a no-op (siem/__init__.py:838-846)."""
    return transform_registry().get(logtype, lambda d: d)(df)
