"""Scalar ingest functions (SURVEY.md §2.9) — Spark-column re-expressions of
the reference's per-row normalization helpers.

Each function cites the reference behavior it reproduces
(/root/reference/source/lambda/es_loader/...); all are column expressions
(JVM-side, codegen) except IPv6 int-encoding, which needs Python's
``ipaddress`` and is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_to_timestamp(col: Column) -> Column:
    """Auto-ranging epoch parse (siem/utils.py:348-365): seconds / millis /
    micros chosen by magnitude (10 / 13 / 16 digits)."""
    c = col.cast("double")
    secs = (
        F.when(c >= 1e15, c / 1e6)
        .when(c >= 1e12, c / 1e3)
        .otherwise(c)
    )
    return F.timestamp_seconds(secs)


def timestamp_nano_truncate(col: Column) -> Column:
    """ISO8601 strings with nanosecond fractions truncated to micros before
    parse (siem/utils.py:307-314) — Spark TimestampType is µs anyway."""
    trimmed = F.regexp_replace(col, r"(\.\d{6})\d+", r"$1")
    return F.to_timestamp(trimmed)


def with_fixed_tz(ts: Column, tz_offset: str) -> Column:
    """Fixed-offset timezone per logtype (siem/__init__.py:512-517;
    aws.ini timestamp_tz): interpret naive ts in tz, convert to UTC."""
    return F.to_utc_timestamp(ts, tz_offset)


def ipv4_to_int(col: Column) -> Column:
    """Pure-SQL IPv4 -> int (the reference int-encodes IPs for range
    joins, siem/ioc.py:186-190)."""
    p = F.split(col, r"\.")
    return (
        p.getItem(0).cast("long") * F.lit(16777216)
        + p.getItem(1).cast("long") * F.lit(65536)
        + p.getItem(2).cast("long") * F.lit(256)
        + p.getItem(3).cast("long")
    )


@F.pandas_udf(T.StructType([
    T.StructField("hi", T.LongType()),
    T.StructField("mid", T.LongType()),
    T.StructField("lo", T.LongType()),
    T.StructField("private", T.BooleanType()),
]))
def ipv6_to_int3(s: pd.Series) -> pd.DataFrame:
    """IPv6 -> 3-way int split (upper48/mid48/low32) exactly like the
    reference's IOC database encoding (ioc_database/lambda_function.py:
    296-315) so conjunctive band range-joins stay in int64.  ``private``
    carries ipaddress.is_private (the reference skips private IPs before
    IOC lookup, siem/ioc.py:170-172) so callers need no second parse
    pass; invalid addresses yield all-NULL fields."""
    his, mids, los, privs = [], [], [], []
    for v in s:
        try:
            a = ipaddress.IPv6Address(v)
            n = int(a)
        except (ValueError, TypeError):
            his.append(None); mids.append(None); los.append(None)
            privs.append(None)
            continue
        his.append((n >> 80) & ((1 << 48) - 1))
        mids.append((n >> 32) & ((1 << 48) - 1))
        los.append(n & ((1 << 32) - 1))
        privs.append(a.is_private)
    return pd.DataFrame({"hi": his, "mid": mids, "lo": los, "private": privs})


def is_valid_ipv4(col: Column) -> Column:
    """Syntactic IP validation (siem/utils.py:194-203)."""
    return col.rlike(r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$")


def url_decompose(col: Column) -> Column:
    """method/path decompose analogue (siem/utils.py:206-288): struct of
    url parts via parse_url + regexp."""
    return F.struct(
        col.alias("original"),
        F.parse_url(col, F.lit("HOST")).alias("domain"),
        F.parse_url(col, F.lit("PATH")).alias("path"),
        F.parse_url(col, F.lit("QUERY")).alias("query"),
        F.regexp_extract(col, r"^(\w+):", 1).alias("scheme"),
        F.regexp_extract(col, r"\.([A-Za-z0-9]+)(?:\?|$)", 1).alias("extension"),
    )


def _unquote_once(col: Column) -> Column:
    """urllib.parse.unquote equivalent (found via property testing —
    Java's URLDecoder differs in three ways):

    - url_decode is FORM decoding ('+' -> space); unquote keeps literal
      '+' — protect it as %2B first;
    - unquote leaves INVALID escapes ('%zz') untouched while decoding the
      valid ones in the same string; URLDecoder throws on them — encode
      the bare '%' of invalid escapes as %25 so they round-trip;
    - unquote(errors='strict') raises on valid escapes forming invalid
      UTF-8 (whole value kept by the reference's try/except); URLDecoder
      silently substitutes U+FFFD — detect a decoder-introduced U+FFFD
      and keep the original."""
    protected = F.regexp_replace(col, r"\+", "%2B")
    protected = F.regexp_replace(protected, r"%(?![0-9A-Fa-f]{2})", "%25")
    decoded = F.try_url_decode(protected)
    bad_utf8 = decoded.contains("�") & ~col.contains("�")
    return F.when(decoded.isNull() | bad_utf8, col).otherwise(decoded)


def http_url_decompose(
    method: Column, path: Column, version: Column, raw: Column
) -> Column:
    """Full http/url field extraction (siem/utils.py:206-288
    extract_url_http_fields_from_http_request) as one struct column:

    - absolute-URL requests split into domain[:port] + path,
    - CONNECT requests ('host:443') fill domain/port and empty the path,
    - percent-decoding applied up to TWICE (double-url-encoded payloads),
      strict: a malformed escape keeps the original,
    - #fragment split off unless it contains non-fragment chars
      (utils.py:111 RE_NOT_FRAGMENT_STR), then path?query split and the
      filename extension (no backslash) extracted."""
    method = F.coalesce(method, F.lit(""))
    p0 = F.coalesce(path, F.lit(""))
    url_original = F.when(raw.isNotNull() & (raw != ""), raw).otherwise(
        F.when((method != "") & (p0 != "") & version.isNotNull(), p0)
    )
    is_abs = p0.startswith("http://") | p0.startswith("https://")
    is_connect = (~p0.startswith("/")) & (~is_abs) & (F.lower(method) == "connect")
    abs_parts = F.split(p0, "/", 4)  # [scheme:, '', host[:port], rest]
    domain_org = F.try_element_at(abs_parts, F.lit(3))
    connect_parts = F.split(p0, ":")
    connect_ok = is_connect & (F.size(connect_parts) == 2)
    domain = F.when(is_abs, F.split(domain_org, ":").getItem(0)).otherwise(
        F.when(connect_ok, connect_parts.getItem(0))
    )
    port = F.when(
        is_abs & (F.size(F.split(domain_org, ":")) == 2),
        F.split(domain_org, ":").getItem(1),
    ).otherwise(F.when(connect_ok, connect_parts.getItem(1)))
    p1 = (
        F.when(is_abs, F.concat(F.lit("/"), F.coalesce(F.try_element_at(abs_parts, F.lit(4)), domain_org)))
        .when(connect_ok, F.lit(""))
        .otherwise(p0)
    )
    # up-to-double percent-decode (utils.py:249-262)
    d1 = F.when(p1.contains("%"), _unquote_once(p1)).otherwise(p1)
    p2 = F.when(d1.contains("%"), _unquote_once(d1)).otherwise(d1)
    # fragment (only when the tail looks like a real fragment)
    frag_parts = F.split(p2, "#")
    frag_tail = F.try_element_at(frag_parts, F.lit(2))
    frag = F.when(
        (F.size(frag_parts) == 2) & ~frag_tail.rlike(r"[&(){}@_;<>\s]"),
        frag_tail,
    )
    p3 = F.when(frag.isNotNull(), F.element_at(frag_parts, 1)).otherwise(p2)
    qsplit = F.split(p3, r"\?", 2)
    url_path = qsplit.getItem(0)
    url_query = F.try_element_at(qsplit, F.lit(2))
    filename = F.element_at(F.split(url_path, "/"), -1)
    fparts = F.split(filename, r"\.")
    ext = F.when(
        (F.size(fparts) > 1) & ~F.element_at(fparts, -1).contains("\\"),
        F.element_at(fparts, -1),
    )
    return F.struct(
        version.alias("http_version"),
        F.when(method != "", method).alias("http_request_method"),
        url_original.alias("url_original"),
        domain.alias("url_domain"),
        port.alias("url_port"),
        url_path.alias("url_path"),
        url_query.alias("url_query"),
        frag.alias("url_fragment"),
        ext.alias("url_extension"),
    )


def ts_from_formats(col: Column, formats: list[str], tz: str | None = None) -> Column:
    """Timestamp format-list fallback combinator (siem/utils.py:317-330
    convert_timestr_to_datetime_wrapper): try each pattern in order, first
    successful parse wins.  Patterns are Java DateTimeFormatter syntax
    (the Spark-native equivalent of the reference's strptime list)."""
    out = F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in formats])
    return F.to_utc_timestamp(out, tz) if tz else out


def doc_id_md5(*cols: Column) -> Column:
    """Content-derived doc id: MD5 over message (+ discriminators)
    (siem/__init__.py:683-706)."""
    return F.md5(F.concat_ws("\x00", *cols))


def del_none_value(col: Column) -> Column:
    """The reference drops empty/'-'/'null' leaves before indexing
    (siem/__init__.py:1103-1121 del_none); column analogue -> NULL."""
    return F.when(col.isin("", "-", "null", "NULL"), F.lit(None)).otherwise(col)


def safe_field_names(df):
    """'-' -> '_' in all column names (siem/utils.py:1008-1025)."""
    out = df
    for c in df.columns:
        if "-" in c:
            out = out.withColumnRenamed(c, c.replace("-", "_"))
    return out


def syslog_timestamp(col: Column, ref_year: int, ref_month: int = 12) -> Column:
    """Syslog 'MMM d HH:mm:ss' parse with year inference
    (siem/utils.py:380-412): no year in the format, so the reference picks
    the ingest year unless that would land the event in the future
    (a December log seen in January belongs to the previous year).
    ``ref_year``/``ref_month`` are the ingest-time reference (passed in —
    never wall-clock — so results are deterministic/testable).  The
    reference's Feb-29 leap case resolves to the previous leap year."""
    norm = F.regexp_replace(F.trim(col), r"\s+", " ")
    month = F.substring(norm, 1, 3)
    month_num = F.element_at(
        F.create_map(*[
            x
            for i, m in enumerate(
                ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
            )
            for x in (F.lit(m), F.lit(i + 1))
        ]),
        month,
    )
    year = F.when(month_num > ref_month, F.lit(ref_year - 1)).otherwise(F.lit(ref_year))
    # Feb 29 in a non-leap inferred year -> previous leap year (reference
    # walks back; one 4-year step covers the practical window)
    is_feb29 = norm.rlike(r"^Feb 29 ")
    leap = (year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0))
    year = F.when(is_feb29 & ~leap, year - F.when((year - 1) % 4 == 0, 1).when((year - 2) % 4 == 0, 2).otherwise(3)).otherwise(year)
    return F.to_timestamp(F.concat_ws(" ", year.cast("string"), norm), "yyyy MMM d HH:mm:ss")


_UA_BROWSERS = [
    ("Edg(?:e|A|iOS)?/([\\d.]+)", "Edge"),
    ("OPR/([\\d.]+)", "Opera"),
    ("SamsungBrowser/([\\d.]+)", "Samsung Internet"),
    ("CriOS/([\\d.]+)", "Chrome Mobile iOS"),
    ("FxiOS/([\\d.]+)", "Firefox iOS"),
    ("Chrome/([\\d.]+)", "Chrome"),
    ("Version/([\\d.]+).*Safari", "Safari"),
    ("Firefox/([\\d.]+)", "Firefox"),
    ("MSIE ([\\d.]+)", "IE"),
    ("Trident/.*rv:([\\d.]+)", "IE"),  # IE11 dropped the MSIE token
    ("aws-sdk|Boto3|aws-cli", "AWS-SDK"),
    ("Googlebot/([\\d.]+)", "Googlebot"),
    ("bingbot/([\\d.]+)", "Bingbot"),
    ("python-requests/([\\d.]+)", "python-requests"),
    ("Wget/([\\d.]+)", "Wget"),
    ("curl/([\\d.]+)", "curl"),
]
_UA_OS = [
    ("Windows NT 10", "Windows 10"),
    ("Windows NT", "Windows"),
    ("Android ([\\d.]+)", "Android"),
    ("iPhone OS ([\\d_]+)", "iOS"),
    ("iPad.*OS ([\\d_]+)", "iOS"),
    ("CrOS", "Chrome OS"),
    ("Mac OS X", "macOS"),
    ("(?i)linux", "Linux"),
]


#: Windows NT kernel -> marketing version (the ua-parser mapping subset)
_WINDOWS_NT_VERSIONS = [
    ("10.0", "10"), ("6.3", "8.1"), ("6.2", "8"),
    ("6.1", "7"), ("6.0", "Vista"), ("5.1", "XP"),
]

#: AWS service principals reported verbatim (user_agent.py:19 RE_AWS_USER_AGENT)
_AWS_UA_RE = r"^(AWS Internal|[\w.-]+?\.amazonaws\.com)$"


def user_agent_parse(col: Column) -> Column:
    """User-agent decompose to the reference's full field surface
    (siem/user_agent.py:22-54): %20-containing strings unquoted first,
    family/version from a regex table (ua-parser itself is unavailable
    in this environment — the table covers the common families), the
    AWS-internal principal special case when the family is Other, OS
    name + version + full, and the device family.

    -> struct(original, name, version, os, os_name, os_version,
              os_full, device_name); ``os`` keeps the r1 legacy label."""
    orig = F.when(col.contains("%20"), _unquote_once(col)).otherwise(col)
    name = F.lit("Other")
    version = F.lit(None).cast("string")
    for pat, label in reversed(_UA_BROWSERS):
        hit = orig.rlike(pat)
        name = F.when(hit, label).otherwise(name)
        if "(" in pat:  # group-less family patterns have no version
            version = F.when(hit, F.regexp_extract(orig, pat, 1)).otherwise(version)
        else:
            version = F.when(hit, F.lit(None).cast("string")).otherwise(version)
    # AWS Internal / *.amazonaws.com principals keep their literal name
    name = F.when((name == "Other") & orig.rlike(_AWS_UA_RE), orig).otherwise(name)
    osname = F.lit("Other")
    for pat, label in reversed(_UA_OS):
        osname = F.when(orig.rlike(pat), label).otherwise(osname)
    nt = F.regexp_extract(orig, r"Windows NT ([\d.]+)", 1)
    win_ver = F.lit(None).cast("string")
    for kernel, marketing in _WINDOWS_NT_VERSIONS:
        win_ver = F.when(nt == kernel, marketing).otherwise(win_ver)
    os_version = (
        F.when(orig.rlike(r"Windows NT"), win_ver)
        .when(orig.rlike(r"Android ([\d.]+)"), F.regexp_extract(orig, r"Android ([\d.]+)", 1))
        .when(
            orig.rlike(r"(iPhone|iPad).*OS ([\d_]+)"),
            F.regexp_replace(F.regexp_extract(orig, r"OS ([\d_]+)", 1), "_", "."),
        )
        .when(
            orig.rlike(r"Mac OS X ([\d_.]+)"),
            F.regexp_replace(F.regexp_extract(orig, r"Mac OS X ([\d_.]+)", 1), "_", "."),
        )
        .when(orig.rlike(r"CrOS \S+ ([\d.]+)"), F.regexp_extract(orig, r"CrOS \S+ ([\d.]+)", 1))
    )
    # ua-parser os.family strings ('Windows', 'Mac OS X', 'Chrome OS', ...)
    os_name = (
        F.when(orig.rlike("Windows NT"), "Windows")
        .when(orig.rlike("Android"), "Android")
        .when(orig.rlike(r"iPhone OS|iPad.*OS "), "iOS")
        .when(orig.rlike("CrOS"), "Chrome OS")
        .when(orig.rlike("Mac OS X"), "Mac OS X")
        .when(orig.rlike("(?i)linux"), "Linux")
        .otherwise("Other")
    )
    os_full = F.when(
        os_version.isNotNull() & (os_name != "Other"),
        F.concat_ws(" ", os_name, os_version),
    ).otherwise(os_name)
    device = (
        F.when(orig.contains("iPhone"), "iPhone")
        .when(orig.contains("iPad"), "iPad")
        .when(orig.rlike(r"\b(SM|GT)-[A-Za-z0-9]+"), F.regexp_extract(orig, r"\b((?:SM|GT)-[A-Za-z0-9]+)", 1))
        .when(orig.contains("Macintosh"), "Mac")
        .when(orig.rlike("(?i)bot|spider|crawler"), "Spider")
        .otherwise("Other")
    )
    return F.struct(
        orig.alias("original"),
        name.alias("name"),
        version.alias("version"),
        osname.alias("os"),
        os_name.alias("os_name"),
        os_version.alias("os_version"),
        os_full.alias("os_full"),
        device.alias("device_name"),
    )


def protocol_name(col: Column) -> Column:
    """IANA protocol number -> name (sf_vpcflowlogs.py:24-42 exemplar of the
    sf_ transform family)."""
    m = F.create_map(
        F.lit(1), F.lit("icmp"), F.lit(6), F.lit("tcp"),
        F.lit(17), F.lit("udp"), F.lit(41), F.lit("ipv6"),
        F.lit(47), F.lit("gre"), F.lit(50), F.lit("esp"),
    )
    return F.coalesce(F.element_at(m, col.cast("int")), col.cast("string"))


def action_outcome(col: Column) -> Column:
    """ACCEPT/REJECT -> event.outcome (sf_vpcflowlogs.py:16-22)."""
    return (
        F.when(col == "ACCEPT", "success")
        .when(col == "REJECT", "failure")
        .otherwise("unknown")
    )
