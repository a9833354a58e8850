"""Geo/IP aggs (operators/geoagg) vs independent pure-Python references.

The entry-oracle harness (test_entry_oracles) proves Spark == DuckDB on the
shared SQL text; these tests prove the SQL text itself is RIGHT — geohash
vs a textbook interval-halving encoder, geotile vs the slippy-map formula,
haversine vs the python math module, CIDR vs ipaddress."""

import ipaddress
import math

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import geoagg
from siem_on_amazon_opensearch_service_spark.operators.aggs import categorize_text

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def py_geohash(lat, lon, prec):
    bits = ""
    lo_lat, hi_lat, lo_lon, hi_lon = -90.0, 90.0, -180.0, 180.0
    even = True
    while len(bits) < 5 * prec:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits += "1"
                lo_lon = mid
            else:
                bits += "0"
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits += "1"
                lo_lat = mid
            else:
                bits += "0"
                hi_lat = mid
        even = not even
    return "".join(
        GEOHASH_ALPHABET[int(bits[i : i + 5], 2)] for i in range(0, len(bits), 5)
    )


def py_geotile(lat, lon, z):
    lat = max(min(lat, geoagg.MAX_MERCATOR_LAT), -geoagg.MAX_MERCATOR_LAT)
    n = 1 << z
    r = math.radians(lat)
    x = int(math.floor(round((lon + 180.0) / 360.0 * n, 6)))
    y = int(math.floor(round((1 - math.log(math.tan(r) + 1 / math.cos(r)) / math.pi) / 2 * n, 6)))
    return f"{z}/{max(min(x, n - 1), 0)}/{max(min(y, n - 1), 0)}"


def py_haversine(lat, lon, olat, olon):
    p1, p2 = math.radians(olat), math.radians(lat)
    dphi = p2 - p1
    dlmb = math.radians(lon) - math.radians(olon)
    a = math.sin(dphi / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    return round(2 * 6371.0 * math.asin(math.sqrt(min(a, 1.0))), 6)


@pytest.fixture(scope="module")
def pts(spark):
    """199 deterministic points spread over the globe, incl. boundary rows."""
    rows = [
        (i, -85.0 + (i * 37 % 1700) / 10.0, -180.0 + (i * 61 % 3600) / 10.0)
        for i in range(190)
    ]
    rows += [
        (900, 0.0, 0.0),
        (901, 90.0, 180.0),
        (902, -90.0, -180.0),
        (903, 89.9999, 179.9999),
        (904, -89.9999, -179.9999),
        (905, geoagg.MAX_MERCATOR_LAT, 0.0),
        (906, -geoagg.MAX_MERCATOR_LAT, 0.0),
        (907, 35.68, 139.69),
        (908, 0.0001, -0.0001),
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


@pytest.mark.parametrize("prec", [1, 2, 4, 6, 8])
def test_geohash_matches_reference(pts, prec):
    got = pts.select(
        "id", "lat", "lon", F.expr(geoagg.geohash_cell_sql("lat", "lon", prec)).alias("gh")
    ).collect()
    for r in got:
        assert r.gh == py_geohash(r.lat, r.lon, prec), (r.id, r.lat, r.lon, prec)


@pytest.mark.parametrize("zoom", [0, 1, 6, 12])
def test_geotile_matches_reference(pts, zoom):
    got = pts.select(
        "id", "lat", "lon", F.expr(geoagg.geotile_cell_sql("lat", "lon", zoom)).alias("gt")
    ).collect()
    for r in got:
        assert r.gt == py_geotile(r.lat, r.lon, zoom), (r.id, r.lat, r.lon, zoom)


def test_haversine_matches_reference(pts):
    got = pts.select(
        "id", "lat", "lon",
        F.expr(geoagg.haversine_km_sql("lat", "lon", 35.68, 139.69)).alias("d"),
    ).collect()
    for r in got:
        assert abs(r.d - py_haversine(r.lat, r.lon, 35.68, 139.69)) < 1e-6, r.id
        assert 0.0 <= r.d <= 2 * 6371.0 * math.pi / 2 + 1


def test_bad_params_raise():
    with pytest.raises(ValueError):
        geoagg.geohash_cell_sql("lat", "lon", 0)
    with pytest.raises(ValueError):
        geoagg.geohash_cell_sql("lat", "lon", 9)
    with pytest.raises(ValueError):
        geoagg.geotile_cell_sql("lat", "lon", 23)
    with pytest.raises(ValueError):
        geoagg.geo_distance_agg(None, "x", [2.0, 1.0])
    with pytest.raises(ValueError):
        geoagg.ip_range_agg(None, F.col("x"), [])


def test_cidr_pred_matches_ipaddress(spark):
    ips = [0, 1, 0x0A000000, 0x0AFFFFFF, 0x0B000000, 0x20000000, 0x3FFFFFFF,
           0x40000000, 0xC0A80101, 0xFFFFFFFF]
    df = spark.createDataFrame([(i,) for i in ips], "ip_int long")
    for cidr in ["10.0.0.0/8", "32.0.0.0/3", "192.168.1.0/24", "0.0.0.0/0"]:
        net = ipaddress.ip_network(cidr)
        got = {
            r.ip_int
            for r in df.filter(geoagg.cidr_pred(F.col("ip_int"), cidr)).collect()
        }
        exp = {i for i in ips if ipaddress.ip_address(i) in net}
        assert got == exp, cidr


def test_ip_dotted(spark):
    df = spark.createDataFrame(
        [(0,), (0x0A000001,), (0xC0A80101,), (0xFFFFFFFF,)], "ip_int long"
    )
    got = [r[0] for r in df.select(geoagg.ip_dotted(F.col("ip_int"))).collect()]
    assert got == ["0.0.0.0", "10.0.0.1", "192.168.1.1", "255.255.255.255"]


def test_ip_range_agg_counts(spark):
    df = spark.createDataFrame(
        [(i * 0x10000000,) for i in range(16)], "ip_int long"
    )
    out = geoagg.ip_range_agg(
        df, F.col("ip_int"),
        [("lo", None, "128.0.0.0"), ("hi", "128.0.0.0", None), ("all", None, None)],
    ).collect()[0]
    assert (out.lo, out.hi, out.all) == (8, 8, 16)


def test_ip_prefix_agg(spark):
    ips = [0x0A000001, 0x0A0000FF, 0x0A010000, 0xC0A80101, 0xC0A80202, 0xFFFFFFFF]
    df = spark.createDataFrame([(i,) for i in ips], "ip_int long")
    out = geoagg.ip_prefix_agg(df, "ip_int", 16, n=10).collect()
    got = [(r.key, r.cnt) for r in out]
    assert got == [("10.0.0.0/16", 2), ("10.1.0.0/16", 1),
                   ("192.168.0.0/16", 2), ("255.255.0.0/16", 1)]
    out24 = geoagg.ip_prefix_agg(df, "ip_int", 24, n=10).collect()
    assert ("192.168.1.0/24", 1) in [(r.key, r.cnt) for r in out24]
    with pytest.raises(ValueError):
        geoagg.ip_prefix_key_sql("ip_int", 0)


def test_geo_distance_ladder(pts):
    out = geoagg.geo_distance_agg(
        pts, geoagg.haversine_km_sql("lat", "lon", 35.68, 139.69), [3000.0, 12000.0]
    ).collect()
    byname = {r.bucket: r.cnt for r in out}
    assert set(byname) == {"*-3000.0", "3000.0-12000.0", "12000.0-*"}
    assert sum(byname.values()) == pts.count()
    ref = [py_haversine(r.lat, r.lon, 35.68, 139.69) for r in pts.collect()]
    assert byname["*-3000.0"] == sum(1 for d in ref if d < 3000.0)
    assert byname["12000.0-*"] == sum(1 for d in ref if d >= 12000.0)


def test_centroid_and_bounds(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 20.0), ("a", 30.0, -40.0), ("b", -5.0, 5.0)],
        "grp string, lat double, lon double",
    )
    c = {r.grp: r for r in geoagg.geo_centroid(df, "grp", F.col("lat"), F.col("lon")).collect()}
    assert (c["a"].centroid_lat, c["a"].centroid_lon, c["a"].cnt) == (20.0, -10.0, 2)
    b = {r.grp: r for r in geoagg.geo_bounds(df, "grp", F.col("lat"), F.col("lon")).collect()}
    assert (b["a"].top, b["a"].bottom, b["a"].west, b["a"].east) == (30.0, 10.0, -40.0, 20.0)


def py_pnpoly(lat, lon, vertices):
    inside = False
    n = len(vertices)
    for i in range(n):
        yi, xi = vertices[i]
        yj, xj = vertices[(i + 1) % n]
        if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


POLY = [(50.0, -10.0), (60.0, 40.0), (10.0, 60.0), (-25.0, 20.0), (0.0, -30.0)]


def test_polygon_pred_matches_pnpoly(pts):
    got = pts.select(
        "id", "lat", "lon",
        F.expr(geoagg.polygon_pred_sql("lat", "lon", POLY)).alias("inside"),
    ).collect()
    n_in = 0
    for r in got:
        assert r.inside == py_pnpoly(r.lat, r.lon, POLY), (r.id, r.lat, r.lon)
        n_in += bool(r.inside)
    assert 0 < n_in < pts.count()  # the pentagon is neither empty nor global


def test_polygon_pred_known_points(spark):
    # unit square around the origin; horizontal edges exercise the skip
    sq = [(1.0, 1.0), (1.0, -1.0), (-1.0, -1.0), (-1.0, 1.0)]
    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 0.5, 0.9), (2, 1.5, 0.0), (3, 0.0, -1.5), (4, -0.99, 0.99)],
        "id long, lat double, lon double",
    )
    got = {r.id: r.inside for r in df.select(
        "id", F.expr(geoagg.polygon_pred_sql("lat", "lon", sq)).alias("inside")
    ).collect()}
    assert got == {0: True, 1: True, 2: False, 3: False, 4: True}
    with pytest.raises(ValueError):
        geoagg.polygon_pred_sql("lat", "lon", sq[:2])


def test_bbox_pred(pts):
    plain = geoagg.bbox_pred_sql("lat", "lon", top=40.0, left=-10.0, bottom=-10.0, right=60.0)
    wrap = geoagg.bbox_pred_sql("lat", "lon", top=40.0, left=150.0, bottom=-10.0, right=-150.0)
    got = pts.select(
        "lat", "lon", F.expr(plain).alias("p"), F.expr(wrap).alias("w")
    ).collect()
    for r in got:
        assert r.p == (-10.0 <= r.lat <= 40.0 and -10.0 <= r.lon <= 60.0)
        assert r.w == (-10.0 <= r.lat <= 40.0 and (r.lon >= 150.0 or r.lon <= -150.0))
    with pytest.raises(ValueError):
        geoagg.bbox_pred_sql("lat", "lon", top=-5.0, left=0.0, bottom=5.0, right=1.0)


def test_distance_pred(pts):
    pred = geoagg.distance_pred_sql("lat", "lon", 35.68, 139.69, 5000.0)
    got = pts.select("lat", "lon", F.expr(pred).alias("near")).collect()
    for r in got:
        assert r.near == (py_haversine(r.lat, r.lon, 35.68, 139.69) <= 5000.0)


def test_categorize_text(spark):
    msgs = [
        "User 1234 logged in from 10.0.0.5",
        "User 77 logged in from 10.0.0.9",
        "User 9 logged in from 172.16.0.1",
        "Disk /dev/sda1 at 91% capacity",
        "Disk /dev/sdb2 at 7% capacity",
        "kernel: oom-killer invoked",
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    out = categorize_text(df, F.col("msg"), n=10, n_tokens=6)
    got = {r.category: r.cnt for r in out.collect()}
    assert got["user # logged in from #"] == 3
    assert got["disk dev sda# at # capacity"] == 1
    assert got["kernel oom killer invoked"] == 1
    # top ordering: count desc then key asc
    rows = out.collect()
    assert rows[0].category == "user # logged in from #"


def test_polygon_degenerate_raises():
    with pytest.raises(ValueError, match="degenerate"):
        geoagg.polygon_pred_sql("lat", "lon", [(0.0, 0.0), (0.0, 10.0), (0.0, 20.0)])


def test_polygon_random_battery(pts):
    """20 deterministic pseudo-random polygons (3-9 vertices, convex and
    concave alike) evaluated as 20 expression columns in ONE job, every
    (polygon, point) pair checked against the PNPOLY reference."""
    import numpy as np

    rng = np.random.RandomState(42)
    polys = []
    while len(polys) < 20:
        nv = int(rng.randint(3, 10))
        vs = [(float(round(rng.uniform(-80, 80), 3)),
               float(round(rng.uniform(-170, 170), 3))) for _ in range(nv)]
        try:
            geoagg.polygon_pred_sql("lat", "lon", vs)
        except ValueError:
            continue  # degenerate draw
        polys.append(vs)
    cols = [
        F.expr(geoagg.polygon_pred_sql("lat", "lon", vs)).alias(f"p{i}")
        for i, vs in enumerate(polys)
    ]
    rows = pts.select("id", "lat", "lon", *cols).collect()
    n_inside = 0
    for r in rows:
        for i, vs in enumerate(polys):
            exp = py_pnpoly(r.lat, r.lon, vs)
            assert r[f"p{i}"] == exp, (r.id, i)
            n_inside += exp
    assert 0 < n_inside < len(rows) * len(polys)
