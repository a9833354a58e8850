"""Enrichment joins (SURVEY.md §2.4) — the reference's stream-side lookups
re-expressed as broadcast joins.

All reference joins are lookups against small local databases (MaxMind
mmdb, IOC sqlite, trusted-proxy list, WinEvt TSV) — broadcast joins in
Spark terms; the IOC/GeoIP lookups are *range* joins on int-encoded IPs
(/root/reference/source/lambda/es_loader/siem/ioc.py:165-228, geodb.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalars import ipv4_to_int, is_valid_ipv4

# RFC1918 + loopback + link-local, int-encoded — the reference skips
# private IPs before IOC lookup (siem/ioc.py:75-93)
_PRIVATE_RANGES = [
    (167772160, 184549375),      # 10.0.0.0/8
    (2886729728, 2887778303),    # 172.16.0.0/12
    (3232235520, 3232301055),    # 192.168.0.0/16
    (2130706432, 2147483647),    # 127.0.0.0/8
    (2851995648, 2852061183),    # 169.254.0.0/16
]


def is_private_ipv4(ip_int: Column) -> Column:
    cond = F.lit(False)
    for lo, hi in _PRIVATE_RANGES:
        cond = cond | ((ip_int >= lo) & (ip_int <= hi))
    return cond


#: the reference's v6 indicator band columns (ioc_database/
#: lambda_function.py:296-315): network_start/end hold the LOW 32 bits
#: for 'ipv6-addr' rows, v6_network2_* the middle 48, v6_network1_* the
#: upper 48 — three conjunctive int64 bands instead of one int128 range
_V6_BANDS = (
    "v6_network1_start", "v6_network1_end",
    "v6_network2_start", "v6_network2_end",
)


def ioc_ip_match(df: DataFrame, ioc: DataFrame, ip_col: str = "source_ip") -> DataFrame:
    """IOC IP range match (siem/ioc.py:165-228): int-encode the event IP,
    skip private ranges, broadcast-range-join the indicator table.

    v4 indicators: ``(provider, network_start, network_end, name)``
    ranges over the 32-bit int encoding.  v6 indicators (matched when the
    table carries a ``type`` column plus the reference's band columns,
    ``v6_network1_{start,end}`` = upper 48 bits and ``v6_network2_*`` =
    middle 48, with ``network_start/end`` reused for the LOW 32 bits on
    ``type='ipv6-addr'`` rows) join via the reference's three conjunctive
    int64 band predicates — an int128 range split so every comparison
    stays in long arithmetic (siem/ioc.py:296-315).  A table without the
    v6 columns matches v4 only, as before.  Both sides are broadcast
    (indicator feeds are MB-scale); the event side streams — no shuffle
    at any corpus size."""
    from ..functions.scalars import ipv6_to_int3

    has_v6 = "type" in ioc.columns and all(c in ioc.columns for c in _V6_BANDS)
    ioc4 = ioc.filter(F.col("type") == "ipv4-addr") if "type" in ioc.columns else ioc
    ip_int = ipv4_to_int(F.col(ip_col))
    cand4 = df.withColumn("ip_int", ip_int).filter(
        is_valid_ipv4(F.col(ip_col)) & ~is_private_ipv4(F.col("ip_int"))
    )
    out4 = cand4.join(
        F.broadcast(ioc4),
        (F.col("ip_int") >= F.col("network_start")) & (F.col("ip_int") <= F.col("network_end")),
        "inner",
    ).drop("ip_int")
    if not has_v6:
        return out4
    ioc6 = ioc.filter(F.col("type") == "ipv6-addr")
    v6 = ipv6_to_int3(F.col(ip_col))
    cand6 = (
        df.filter(~is_valid_ipv4(F.col(ip_col)))
        .withColumn("_v6", v6)
        .filter(F.col("_v6.hi").isNotNull() & ~F.col("_v6.private"))
    )
    out6 = cand6.join(
        F.broadcast(ioc6),
        (F.col("_v6.lo") >= F.col("network_start"))
        & (F.col("_v6.lo") <= F.col("network_end"))
        & (F.col("_v6.mid") >= F.col("v6_network2_start"))
        & (F.col("_v6.mid") <= F.col("v6_network2_end"))
        & (F.col("_v6.hi") >= F.col("v6_network1_start"))
        & (F.col("_v6.hi") <= F.col("v6_network1_end")),
        "inner",
    ).drop("_v6")
    return out4.unionByName(out6)


def geoip_lookup(df: DataFrame, geo: DataFrame, ip_col: str) -> DataFrame:
    """GeoIP lookup (siem/geodb.py): same broadcast range-join shape over a
    (net_start, net_end, country, city, lat, lon, asn) table (the mmdb
    converted to ranges)."""
    ip_int = ipv4_to_int(F.col(ip_col))
    return df.withColumn("ip_int", ip_int).join(
        F.broadcast(geo),
        (F.col("ip_int") >= F.col("net_start")) & (F.col("ip_int") <= F.col("net_end")),
        "left",
    ).drop("ip_int")


def resolve_xff_client(df: DataFrame, trusted: DataFrame, xff_col: str = "xff", id_cols: list[str] | None = None) -> DataFrame:
    """Trusted-proxy X-Forwarded-For resolution (siem/xff.py:172-216):
    walk the XFF chain right-to-left; the first IP NOT in a trusted range
    is the client.  Spark shape: posexplode the chain, broadcast-range-join
    the trust table, take the max position among untrusted entries."""
    id_cols = id_cols or ["event_id"]
    chain = F.split(F.regexp_replace(F.col(xff_col), r"\s+", ""), ",")
    ex = df.select(*id_cols, F.posexplode(chain).alias("pos", "ip"))
    ex = ex.withColumn("ip_int", ipv4_to_int(F.col("ip"))).filter(is_valid_ipv4(F.col("ip")))
    joined = ex.join(
        F.broadcast(trusted),
        (F.col("ip_int") >= F.col("net_start")) & (F.col("ip_int") <= F.col("net_end")),
        "left",
    ).withColumn("trusted", F.col("net_start").isNotNull())
    untrusted = joined.filter(~F.col("trusted"))
    w = Window.partitionBy(*id_cols).orderBy(F.col("pos").desc())
    client = (
        untrusted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*id_cols, F.col("ip").alias("client_ip"))
    )
    return df.join(client, id_cols, "left")


def ioc_domain_match(df: DataFrame, ioc_domains: DataFrame, domain_col: str = "domain") -> DataFrame:
    """IOC domain match — exact broadcast equi-join (siem/ioc.py:230-255):
    event domain against the indicator table (domain, provider, name)."""
    return df.join(
        F.broadcast(ioc_domains),
        df[domain_col] == ioc_domains["ioc_domain"],
        "left",
    ).drop("ioc_domain")


def winevt_eventid_lookup(df: DataFrame, lookup: DataFrame, event_id_col: str = "event_id") -> DataFrame:
    """WinEvt EventID -> (action, outcome) broadcast equi-join
    (siem/fileformat_winevtxml.py:26-54)."""
    return df.join(F.broadcast(lookup), df[event_id_col] == lookup["win_event_id"], "left").drop(
        "win_event_id"
    )


def threat_matched_rollup(enriched: DataFrame, id_cols: list[str], provider_col: str = "provider", name_col: str = "name") -> DataFrame:
    """Enrichment merge-back (siem/__init__.py:899-959): roll matched
    indicators up to sorted-deduped arrays per event
    (threat.matched.{providers,indicators})."""
    return enriched.groupBy(*id_cols).agg(
        F.array_sort(F.collect_set(provider_col)).alias("matched_providers"),
        F.array_sort(F.collect_set(name_col)).alias("matched_indicators"),
        F.count("*").alias("n_matches"),
    )
