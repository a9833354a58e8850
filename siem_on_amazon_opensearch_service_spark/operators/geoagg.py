"""Geo + IP aggregations (OpenSearch geotile_grid / geohash_grid /
geo_centroid / geo_bounds / geo_distance / ip_range, and CIDR term
filtering).

The reference maps GeoIP-enriched coordinates to ``geo_point`` fields
(``source.geo.location`` etc. — /root/reference/source/lambda/es_loader/
siem/geodb.py populates them from the MaxMind mmdb) and its dashboards
consume them through region maps and coordinate maps; these are the
OpenSearch aggs that run over such fields.  IP-typed fields (``source.ip``
…) get the ``ip_range`` agg and CIDR-mask term filtering (OpenSearch
``ip`` field CIDR term semantics).

Cross-engine exactness recipe: every geo cell function is generated as ONE
dialect-common SQL expression string — the Spark side evaluates it via
``F.expr`` and the DuckDB oracle embeds the identical text — so both
engines execute structurally identical IEEE arithmetic.  geohash needs no
rounding (pure add/divide/floor bit extraction, single IEEE ops);
geotile's and geo_distance's transcendental steps (ln/tan, haversine) are
rounded to 6 dp BEFORE the floor/bucket comparison to absorb last-ulp
libm differences (the repo's established round-before-argmin recipe —
see operators/relevance.py decay scoring, operators/similarity.py PQ).

Scale notes (100 TB): every agg here is a single hash aggregation over a
pure column expression — map-side partial aggregation applies, no joins,
no UDFs; the cell id is computed inside whole-stage codegen.  CIDR
filtering is an integer mask predicate that pushes down to the scan.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

#: Web-Mercator latitude clamp (OpenSearch geotile_grid domain)
MAX_MERCATOR_LAT = 85.05112878


# ---------------------------------------------------------------------------
# dialect-common expression generators (Spark F.expr == DuckDB verbatim)

def _bit_sql(v_sql: str, k: int) -> str:
    """Bit ``k`` of a nonnegative integer-valued expression, using only
    floor/divide/modulo (no ``>>``/``&``, whose spellings differ across
    dialects).  ``v / 2^k`` is exact float division for v < 2^52."""
    if k == 0:
        return f"(CAST({v_sql} AS BIGINT) % 2)"
    return f"(CAST(floor(({v_sql}) / {1 << k}) AS BIGINT) % 2)"


def geohash_cell_sql(lat_sql: str, lon_sql: str, precision: int = 4) -> str:
    """Geohash cell of ``precision`` base32 chars as one dialect-common SQL
    expression.  Geohash = successive interval halving == bit interleave
    (lon first) of the scaled integer coordinates:
    ``lon_bits = floor((lon+180)/360 * 2^nlon)`` (idem lat) — pure
    add/divide/floor single IEEE ops, so the two engines agree bit-exactly
    with NO rounding step."""
    if not 1 <= precision <= 8:
        raise ValueError(f"geohash precision must be in [1, 8], got {precision}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    # clamp the scaled index into range (lon=180 / lat=90 land on 2^n)
    lonb = (
        f"least(CAST(floor((({lon_sql}) + 180.0) / 360.0 * {1 << nlon}) AS BIGINT), "
        f"{(1 << nlon) - 1})"
    )
    latb = (
        f"least(CAST(floor((({lat_sql}) + 90.0) / 180.0 * {1 << nlat}) AS BIGINT), "
        f"{(1 << nlat) - 1})"
    )
    # interleave, lon on the even positions counting from the MSB:
    # with nbits total, bit (nbits-1) is lon's top bit, (nbits-2) lat's, ...
    terms = []
    for k in range(nlon):
        terms.append(f"{_bit_sql(lonb, k)} * {1 << (2 * k + (nbits % 2 == 0))}")
    for k in range(nlat):
        terms.append(f"{_bit_sql(latb, k)} * {1 << (2 * k + (nbits % 2 == 1))}")
    cell = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{GEOHASH_ALPHABET}', CAST((CAST(floor({cell} / {1 << (5 * (precision - 1 - i))}) "
        f"AS BIGINT) % 32) + 1 AS INTEGER), 1)"
        for i in range(precision)
    ]
    return "concat(" + ", ".join(chars) + ")"


def geotile_cell_sql(lat_sql: str, lon_sql: str, zoom: int = 6) -> str:
    """Slippy-map tile key ``'z/x/y'`` (OpenSearch geotile_grid) as one
    dialect-common SQL expression.  The Mercator y fraction uses
    ``ln(tan(r) + 1/cos(r))`` (no asinh — not dialect-common); the
    fractional tile coordinate is rounded to 6 dp BEFORE floor to absorb
    last-ulp libm differences between the JVM and C math libraries."""
    if not 0 <= zoom <= 22:
        raise ValueError(f"geotile zoom must be in [0, 22], got {zoom}")
    n = 1 << zoom
    lat_c = f"least(greatest({lat_sql}, {-MAX_MERCATOR_LAT}), {MAX_MERCATOR_LAT})"
    r = f"radians({lat_c})"
    yfrac = f"(1.0 - ln(tan({r}) + 1.0 / cos({r})) / pi()) / 2.0 * {n}"
    xfrac = f"(({lon_sql}) + 180.0) / 360.0 * {n}"
    x = f"least(greatest(CAST(floor(round({xfrac}, 6)) AS BIGINT), 0), {n - 1})"
    y = f"least(greatest(CAST(floor(round({yfrac}, 6)) AS BIGINT), 0), {n - 1})"
    return f"concat('{zoom}/', CAST({x} AS STRING), '/', CAST({y} AS STRING))"


def haversine_km_sql(lat_sql: str, lon_sql: str, origin_lat: float, origin_lon: float) -> str:
    """Great-circle distance (km) from a fixed origin as one
    dialect-common SQL expression, rounded to 6 dp (transcendental-heavy:
    sin/cos/asin/sqrt — the round absorbs libm last-ulp differences before
    any bucket-edge comparison).  Earth radius 6371.0 km (the OpenSearch
    arc default)."""
    p1 = f"radians({origin_lat!r})"
    p2 = f"radians({lat_sql})"
    dphi = f"(radians({lat_sql}) - {p1})"
    dlmb = f"(radians({lon_sql}) - radians({origin_lon!r}))"
    a = (
        f"(sin({dphi} / 2.0) * sin({dphi} / 2.0) + "
        f"cos({p1}) * cos({p2}) * sin({dlmb} / 2.0) * sin({dlmb} / 2.0))"
    )
    return f"round(2.0 * 6371.0 * asin(sqrt(least({a}, 1.0))), 6)"


def bbox_pred_sql(
    lat_sql: str, lon_sql: str, top: float, left: float, bottom: float, right: float
) -> str:
    """OpenSearch ``geo_bounding_box`` query predicate as dialect-common
    SQL.  ``left > right`` means the box crosses the antimeridian
    (OpenSearch semantics): the longitude test becomes a disjunction.
    Pure comparisons — pushes down to the scan when the coordinates are
    stored columns."""
    if not bottom <= top:
        raise ValueError(f"geo_bounding_box: bottom {bottom} > top {top}")
    lat_ok = f"(({lat_sql}) >= {bottom!r} AND ({lat_sql}) <= {top!r})"
    if left <= right:
        lon_ok = f"(({lon_sql}) >= {left!r} AND ({lon_sql}) <= {right!r})"
    else:  # antimeridian crossing: [left, 180] U [-180, right]
        lon_ok = f"(({lon_sql}) >= {left!r} OR ({lon_sql}) <= {right!r})"
    return f"({lat_ok} AND {lon_ok})"


def distance_pred_sql(
    lat_sql: str, lon_sql: str, origin_lat: float, origin_lon: float, radius_km: float
) -> str:
    """OpenSearch ``geo_distance`` query predicate (arc distance <= radius)
    as dialect-common SQL, via the round-6 haversine."""
    return f"({haversine_km_sql(lat_sql, lon_sql, origin_lat, origin_lon)} <= {radius_km!r})"


def polygon_pred_sql(
    lat_sql: str, lon_sql: str, vertices: list[tuple[float, float]]
) -> str:
    """OpenSearch ``geo_polygon`` query predicate: point-in-polygon by the
    classic even-odd ray cast (PNPOLY), unrolled over the literal vertex
    list into one dialect-common SQL expression — each edge contributes an
    indicator ``(yi > y) != (yj > y) AND x < slope-intercept``, and the
    point is inside iff the crossing count is odd.  The per-edge division
    runs on literal vertices and bit-identical derived coordinates, so
    both engines agree except on boundary points (measure zero for
    hash-derived inputs).  Vertices are (lat, lon) pairs, any winding,
    implicitly closed; planar edges (the OpenSearch legacy geo_polygon
    also treats edges as planar in lat/lon space)."""
    if len(vertices) < 3:
        raise ValueError("geo_polygon: need at least 3 vertices")
    x, y = f"({lon_sql})", f"({lat_sql})"
    terms = []
    for i in range(len(vertices)):
        yi, xi = vertices[i]
        yj, xj = vertices[(i + 1) % len(vertices)]
        if yi == yj:  # horizontal edge never crosses the horizontal ray
            continue
        cross = (
            f"(CASE WHEN (({yi!r} > {y}) <> ({yj!r} > {y})) "
            f"AND {x} < ({xj!r} - {xi!r}) * ({y} - {yi!r}) / ({yj!r} - {yi!r}) + {xi!r} "
            "THEN 1 ELSE 0 END)"
        )
        terms.append(cross)
    if not terms:
        raise ValueError(
            "geo_polygon: degenerate polygon (all edges horizontal — zero area)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


# ---------------------------------------------------------------------------
# IP helpers

def cidr_bounds(cidr: str) -> tuple[int, int]:
    """[lo, hi] inclusive integer bounds of an IPv4 CIDR block — computed
    driver-side once; the engines see only integer literals."""
    net = ipaddress.ip_network(cidr, strict=True)
    return int(net.network_address), int(net.broadcast_address)


def cidr_pred(ip_int: Column, cidr: str) -> Column:
    """OpenSearch ``ip`` term-query CIDR semantics over an integer-encoded
    IPv4 column: a pushdown-friendly range predicate (no bit ops needed —
    a CIDR block is a contiguous integer range)."""
    lo, hi = cidr_bounds(cidr)
    return (ip_int >= F.lit(lo)) & (ip_int <= F.lit(hi))


def ip_dotted(ip_int: Column) -> Column:
    """Dotted-quad rendering of an integer-encoded IPv4 column (pure
    column arithmetic; used for human-readable bucket keys)."""
    return F.concat_ws(
        ".",
        F.floor(ip_int / (1 << 24)).cast("long").cast("string"),
        (F.floor(ip_int / (1 << 16)).cast("long") % 256).cast("string"),
        (F.floor(ip_int / (1 << 8)).cast("long") % 256).cast("string"),
        (ip_int % 256).cast("string"),
    )


def ip_prefix_key_sql(ip_sql: str, length: int) -> str:
    """OpenSearch ``ip_prefix`` agg bucket key — the dotted network
    address of the ``length``-bit prefix plus ``/length`` — as one
    dialect-common SQL expression over an integer-encoded IPv4 column
    (floor-divide masks the host bits; octets by divide/modulo)."""
    if not 1 <= length <= 32:
        raise ValueError(f"ip_prefix: length must be in [1, 32], got {length}")
    block = 1 << (32 - length)
    pfx = f"(CAST(floor(({ip_sql}) / {block}) AS BIGINT) * {block})"
    octets = [
        f"CAST(CAST(floor({pfx} / {1 << 24}) AS BIGINT) % 256 AS STRING)",
        f"CAST(CAST(floor({pfx} / {1 << 16}) AS BIGINT) % 256 AS STRING)",
        f"CAST(CAST(floor({pfx} / {1 << 8}) AS BIGINT) % 256 AS STRING)",
        f"CAST({pfx} % 256 AS STRING)",
    ]
    dotted = "concat(" + ", '.', ".join(octets) + f", '/{length}')"
    return dotted


def ip_prefix_agg(df: DataFrame, ip_sql: str, length: int, n: int = 20) -> DataFrame:
    """OpenSearch ``ip_prefix``: count per network prefix, buckets in
    prefix (numeric IP) order, top ``n``.  One hash aggregation over a
    codegen'd key — no UDF, map-side combinable."""
    block = 1 << (32 - length)
    pfx_int = F.expr(f"CAST(floor(({ip_sql}) / {block}) AS BIGINT)")
    return (
        df.groupBy(
            F.expr(ip_prefix_key_sql(ip_sql, length)).alias("key"),
            pfx_int.alias("__p"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("__p")
        .limit(n)
        .select("key", "cnt")
    )


def ip_range_agg(df: DataFrame, ip_int: Column, ranges: list[tuple[str, str | None, str | None]]) -> DataFrame:
    """OpenSearch ``ip_range`` agg: named buckets with dotted ``from``
    (inclusive) / ``to`` (exclusive) edges, a doc counted in EVERY bucket
    whose range contains it (ranges may overlap, unlike histogram).  One
    conditional-count pass — no explode, no join (count-of-when rather
    than sum-of-when so both engines agree on BIGINT, matching the
    DuckDB oracle's ``count(*) FILTER``)."""
    if not ranges:
        raise ValueError("ip_range: no ranges")
    aggs = []
    for name, frm, to in ranges:
        cond = F.lit(True)
        if frm is not None:
            cond = cond & (ip_int >= int(ipaddress.ip_address(frm)))
        if to is not None:
            cond = cond & (ip_int < int(ipaddress.ip_address(to)))
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(name))
    return df.agg(*aggs)


# ---------------------------------------------------------------------------
# geo aggs (thin groupBy wrappers over the cell expressions)

def grid_agg(df: DataFrame, cell_sql: str, n: int = 20) -> DataFrame:
    """Shared geotile_grid / geohash_grid shape: count per cell, top-n
    buckets by (count desc, key asc) — the OpenSearch bucket ordering."""
    return (
        df.groupBy(F.expr(cell_sql).alias("key"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(n)
    )


def geo_centroid(df: DataFrame, by: str, lat: Column, lon: Column) -> DataFrame:
    """OpenSearch ``geo_centroid`` per bucket: arithmetic mean of lat/lon
    (the OpenSearch implementation is the plain mean over the points),
    rounded to 6 dp for the cross-engine hash."""
    return (
        df.groupBy(by)
        .agg(
            F.round(F.avg(lat), 6).alias("centroid_lat"),
            F.round(F.avg(lon), 6).alias("centroid_lon"),
            F.count("*").alias("cnt"),
        )
        .orderBy(by)
    )


def geo_bounds(df: DataFrame, by: str, lat: Column, lon: Column) -> DataFrame:
    """OpenSearch ``geo_bounds`` per bucket: the tight bounding box
    (top = max lat, bottom = min lat, west = min lon, east = max lon —
    OpenSearch's top_left/bottom_right corners, named to dodge the SQL
    LEFT/RIGHT keywords; no anti-meridian wrapping — the reference's
    dashboards don't set ``wrap_longitude``)."""
    return (
        df.groupBy(by)
        .agg(
            F.max(lat).alias("top"),
            F.min(lat).alias("bottom"),
            F.min(lon).alias("west"),
            F.max(lon).alias("east"),
        )
        .orderBy(by)
    )


def geo_distance_agg(df: DataFrame, dist_km_sql: str, edges: list[float]) -> DataFrame:
    """OpenSearch ``geo_distance`` agg: ring buckets from an origin with
    ``from`` inclusive / ``to`` exclusive edges; ``dist_km_sql`` is the
    round-6 haversine expression (haversine_km_sql).  Buckets are the
    standard ladder *-e0, e0-e1, ..., eN-* in edge order."""
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("geo_distance: edges must be strictly increasing")
    d = F.expr(dist_km_sql)
    names, aggs = [], []
    lo = None
    for i, e in enumerate(list(edges) + [None]):
        frm = lo
        to = e
        name = f"{'*' if frm is None else frm}-{'*' if to is None else to}"
        cond = F.lit(True)
        if frm is not None:
            cond = cond & (d >= float(frm))
        if to is not None:
            cond = cond & (d < float(to))
        names.append(name)
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"b{i}"))
        lo = e
    out = df.agg(*aggs)
    # long-form (bucket, cnt) frame in ladder order for a stable contract
    return out.selectExpr(
        f"inline(array(" + ", ".join(
            f"struct('{n}' AS bucket, b{i} AS cnt)" for i, n in enumerate(names)
        ) + "))"
    )
