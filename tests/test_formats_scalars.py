"""Ingest-parity tests: file-format scans (SURVEY.md §2.1) and scalar
normalization functions (§2.9) against reference-documented behaviors."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.functions import scalars
from siem_on_amazon_opensearch_service_spark.sources import formats


@pytest.fixture(scope="module")
def tdir(tmp_path_factory):
    return tmp_path_factory.mktemp("fmt")


class TestScalars:
    def test_epoch_auto_ranging(self, spark):
        # reference siem/utils.py:348-365: 10/13/16-digit auto-ranging
        df = spark.createDataFrame(
            [(1, 1717200000), (2, 1717200000123), (3, 1717200000123456)], "id int, e long"
        )
        out = {r["id"]: r["ts"] for r in df.select("id", scalars.epoch_to_timestamp(F.col("e")).alias("ts")).collect()}
        assert out[1] == dt.datetime(2024, 6, 1, 0, 0, 0)
        assert out[2] == dt.datetime(2024, 6, 1, 0, 0, 0, 123000)
        assert out[3] == dt.datetime(2024, 6, 1, 0, 0, 0, 123456)

    def test_nano_truncation(self, spark):
        # siem/utils.py:307-314: nanos truncated to micros
        df = spark.createDataFrame([("2024-06-01 10:20:30.123456789",)], "s string")
        r = df.select(scalars.timestamp_nano_truncate(F.col("s")).alias("ts")).collect()[0]
        assert r["ts"] == dt.datetime(2024, 6, 1, 10, 20, 30, 123456)

    def test_ipv4_int_and_validation(self, spark):
        df = spark.createDataFrame([("10.0.0.1",), ("256.1.1.1",), ("1.2.3.4",)], "ip string")
        out = df.select(
            "ip",
            scalars.ipv4_to_int(F.col("ip")).alias("n"),
            scalars.is_valid_ipv4(F.col("ip")).alias("ok"),
        ).collect()
        byip = {r["ip"]: r for r in out}
        assert byip["10.0.0.1"]["n"] == 10 * 16777216 + 1
        assert byip["1.2.3.4"]["n"] == 16909060
        assert byip["256.1.1.1"]["ok"] is False
        assert byip["10.0.0.1"]["ok"] is True

    def test_ipv6_three_way_split(self, spark):
        # ioc_database/lambda_function.py:296-315 3-way split
        df = spark.createDataFrame([("2001:db8::1",)], "ip string")
        r = df.select(scalars.ipv6_to_int3(F.col("ip")).alias("s")).collect()[0]["s"]
        n = int.from_bytes(__import__("ipaddress").IPv6Address("2001:db8::1").packed, "big")
        assert r["hi"] == (n >> 80) & ((1 << 48) - 1)
        assert r["mid"] == (n >> 32) & ((1 << 48) - 1)
        assert r["lo"] == n & ((1 << 32) - 1)

    def test_protocol_and_outcome(self, spark):
        df = spark.createDataFrame([(6, "ACCEPT"), (17, "REJECT"), (99, "X")], "p int, a string")
        out = df.select(
            scalars.protocol_name(F.col("p")).alias("proto"),
            scalars.action_outcome(F.col("a")).alias("outcome"),
        ).collect()
        assert [(r["proto"], r["outcome"]) for r in out] == [
            ("tcp", "success"), ("udp", "failure"), ("99", "unknown"),
        ]

    def test_del_none_and_safe_names(self, spark):
        df = spark.createDataFrame([("-", 1), ("x", 2)], ["a-b", "n"])
        df2 = scalars.safe_field_names(df)
        assert "a_b" in df2.columns
        vals = [r["v"] for r in df2.select(scalars.del_none_value(F.col("a_b")).alias("v")).collect()]
        assert vals == [None, "x"]

    def test_doc_id_md5(self, spark):
        import hashlib

        df = spark.createDataFrame([("msg", "key")], "m string, k string")
        r = df.select(scalars.doc_id_md5(F.col("m"), F.col("k")).alias("id")).collect()[0]
        assert r["id"] == hashlib.md5(b"msg\x00key").hexdigest()


class TestFormats:
    def test_text_regex_named_groups(self, spark, tdir):
        p = os.path.join(str(tdir), "alb.log")
        with open(p, "w") as f:
            f.write("GET 200 1.5\nPOST 404 0.2\n")
        df = formats.read_text_regex(
            spark, p, r"(?P<method>\w+) (?P<status>\d+) (?P<dur>[\d.]+)"
        )
        rows = sorted((r["method"], r["status"], r["dur"]) for r in df.collect())
        assert rows == [("GET", "200", "1.5"), ("POST", "404", "0.2")]

    def test_csv_header_rename(self, spark, tdir):
        p = os.path.join(str(tdir), "x.csv")
        with open(p, "w") as f:
            f.write("user-name,bytes-sent\nalice,10\n")
        df = formats.read_csv_logs(spark, p)
        assert set(df.columns) == {"user_name", "bytes_sent"}

    def test_json_records_envelope(self, spark, tdir):
        p = os.path.join(str(tdir), "trail.json")
        with open(p, "w") as f:
            f.write(json.dumps({"Records": [{"eventName": "A"}, {"eventName": "B"}]}) + "\n")
        df = formats.read_json_records(spark, p)
        assert sorted(r["eventName"] for r in df.collect()) == ["A", "B"]

    def test_cloudwatch_envelope(self, spark, tdir):
        p = os.path.join(str(tdir), "cwl.json")
        rec = {
            "messageType": "DATA_MESSAGE",
            "owner": "123", "logGroup": "g", "logStream": "s",
            "logEvents": [
                {"id": "1", "timestamp": 1717200000000, "message": "hello"},
                {"id": "2", "timestamp": 1717200001000, "message": "world"},
            ],
        }
        with open(p, "w") as f:
            f.write(json.dumps(rec) + "\n")
            f.write(json.dumps({**rec, "messageType": "CONTROL_MESSAGE"}) + "\n")
        df = formats.unwrap_cloudwatch_logs(formats.read_ndjson(spark, p))
        rows = df.collect()
        assert len(rows) == 2  # control message dropped
        assert sorted(r["message"] for r in rows) == ["hello", "world"]

    def test_multiline_grouping(self, spark, tdir):
        p = os.path.join(str(tdir), "multi.log")
        with open(p, "w") as f:
            f.write("2024-06-01 ERROR boom\n  at line1\n  at line2\n2024-06-01 INFO ok\n")
        df = formats.read_multiline(
            spark, p, r"^\d{4}-\d{2}-\d{2}", r"(?P<date>\d{4}-\d{2}-\d{2}) (?P<level>\w+) (?P<rest>[\s\S]*)"
        )
        rows = {r["level"]: r["rest"] for r in df.collect()}
        assert "line2" in rows["ERROR"]
        assert rows["INFO"] == "ok"

    def test_cef(self, spark, tdir):
        p = os.path.join(str(tdir), "x.cef")
        with open(p, "w") as f:
            f.write("CEF:0|Vendor|Product|1.0|42|Name|5|src=10.0.0.1 dst=10.0.0.2 msg=hi there\n")
        df = formats.read_cef(spark, p)
        r = df.collect()[0]
        assert r["device_vendor"] == "Vendor"
        assert r["extensions"]["src"] == "10.0.0.1"
        assert r["extensions"]["msg"] == "hi there"

    def test_logtype_dispatch_and_key_ignore(self, spark):
        df = spark.createDataFrame(
            [("AWSLogs/123/CloudTrail/x.json.gz",), ("AWSLogs/123/vpcflowlogs/y.gz",), ("tmp/z",)],
            "s3key string",
        )
        rules = [(r"CloudTrail", "cloudtrail"), (r"vpcflowlogs", "vpcflowlogs")]
        out = df.select("s3key", formats.logtype_from_key(F.col("s3key"), rules).alias("lt"))
        got = {r["s3key"].split("/")[-1]: r["lt"] for r in out.collect()}
        assert got == {"x.json.gz": "cloudtrail", "y.gz": "vpcflowlogs", "z": "unknown"}
        kept = formats.s3_key_ignored(df, r"^tmp/").count()
        assert kept == 2


class TestSyslogAndUA:
    def test_syslog_year_inference(self, spark):
        # reference siem/utils.py:380-412: year chosen so the event is not
        # in the future relative to ingest (ref_year/ref_month injected)
        df = spark.createDataFrame(
            [(1, "Jun  1 10:20:30"), (2, "Dec 31 23:59:59"), (3, "Jan  2 00:00:01")],
            "id int, s string",
        )
        out = {
            r["id"]: r["ts"]
            for r in df.select(
                "id", scalars.syslog_timestamp(F.col("s"), ref_year=2024, ref_month=3).alias("ts")
            ).collect()
        }
        # month > ref_month -> event is from the previous year
        assert out[1].year == 2023 and out[1].month == 6
        assert out[2].year == 2023
        assert out[3].year == 2024

    def test_syslog_feb29(self, spark):
        df = spark.createDataFrame([("Feb 29 12:00:00",)], "s string")
        r = df.select(scalars.syslog_timestamp(F.col("s"), ref_year=2025, ref_month=6).alias("ts")).collect()[0]
        assert r["ts"].year == 2024 and r["ts"].month == 2 and r["ts"].day == 29

    def test_user_agent_parse(self, spark):
        df = spark.createDataFrame(
            [
                ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",),
                ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",),
                ("curl/8.4.0",),
                ("aws-sdk-go/1.44.0 (go1.19; linux; amd64)",),
                ("weird-bot/0.1",),
            ],
            "ua string",
        )
        got = [r["p"] for r in df.select(scalars.user_agent_parse(F.col("ua")).alias("p")).collect()]
        assert got[0]["name"] == "Chrome" and got[0]["version"].startswith("120") and got[0]["os"] == "Windows 10"
        assert got[1]["name"] == "Safari" and got[1]["os"] == "macOS"
        assert got[2]["name"] == "curl"
        assert got[3]["name"] == "AWS-SDK" and got[3]["os"] == "Linux"
        assert got[4]["name"] == "Other"


class TestCompression:
    def test_gzip_text(self, spark, tdir):
        import gzip

        p = os.path.join(str(tdir), "x.log.gz")
        with gzip.open(p, "wt") as f:
            f.write("GET 200\nPOST 404\n")
        df = formats.read_text_regex(spark, p, r"(?P<method>\w+) (?P<status>\d+)")
        assert sorted(r["method"] for r in df.collect()) == ["GET", "POST"]


class TestZipScan:
    def test_zip_members_to_lines(self, spark, tmp_path):
        import zipfile

        p = tmp_path / "logs.zip"
        with zipfile.ZipFile(p, "w") as z:
            z.writestr("a/access.log", "line1\nline2\n")
            z.writestr("b.log", "only\n")
            z.writestr("emptydir/", "")
        from siem_on_amazon_opensearch_service_spark.sources.formats import read_zip_lines

        rows = read_zip_lines(spark, str(p)).orderBy("member", "value").collect()
        assert [(r["member"], r["value"]) for r in rows] == [
            ("a/access.log", "line1"),
            ("a/access.log", "line2"),
            ("b.log", "only"),
        ]
        assert all(r["src_path"].endswith("logs.zip") for r in rows)


class TestTsFromFormats:
    def test_first_matching_format_wins(self, spark):
        from siem_on_amazon_opensearch_service_spark.functions.scalars import ts_from_formats

        df = spark.createDataFrame(
            [("2025/06/01 10:00:00",), ("01 Jun 2025 10:00:00",), ("garbage",)], "s string"
        )
        out = df.select(
            ts_from_formats(
                F.col("s"), ["yyyy/MM/dd HH:mm:ss", "dd MMM yyyy HH:mm:ss"]
            ).alias("ts")
        ).collect()
        got = {str(r["ts"]) for r in out}
        assert "2025-06-01 10:00:00" in got
        assert None in {r["ts"] for r in out}  # garbage -> null, no throw

    def test_tz_applied(self, spark):
        from siem_on_amazon_opensearch_service_spark.functions.scalars import ts_from_formats

        df = spark.createDataFrame([("2025/06/01 09:00:00",)], "s string")
        r = df.select(
            ts_from_formats(F.col("s"), ["yyyy/MM/dd HH:mm:ss"], tz="+09:00").alias("ts")
        ).first()
        assert str(r["ts"]) == "2025-06-01 00:00:00"


class TestHttpUrlDecompose:
    """Parity cases hand-derived from the reference's
    extract_url_http_fields_from_http_request (siem/utils.py:206-288)."""

    def _run(self, spark, method, path, version, raw=None):
        from siem_on_amazon_opensearch_service_spark.functions.scalars import http_url_decompose

        df = spark.createDataFrame(
            [(method, path, version, raw)], "m string, p string, v string, r string"
        )
        return df.select(
            http_url_decompose(F.col("m"), F.col("p"), F.col("v"), F.col("r")).alias("u")
        ).first()["u"]

    def test_plain_path(self, spark):
        u = self._run(spark, "GET", "/idx.html?a=1", "1.1")
        assert u["url_original"] == "/idx.html?a=1"
        assert u["url_path"] == "/idx.html"
        assert u["url_query"] == "a=1"
        assert u["url_extension"] == "html"
        assert u["url_domain"] is None

    def test_absolute_url_with_port(self, spark):
        u = self._run(spark, "GET", "https://ex.com:8443/a/b.php?x=2", "1.1")
        assert u["url_domain"] == "ex.com"
        assert u["url_port"] == "8443"
        assert u["url_path"] == "/a/b.php"
        assert u["url_query"] == "x=2"
        assert u["url_extension"] == "php"

    def test_connect_form(self, spark):
        u = self._run(spark, "CONNECT", "tunnel.example.net:443", "1.1")
        assert u["url_domain"] == "tunnel.example.net"
        assert u["url_port"] == "443"
        assert u["url_path"] == ""

    def test_double_url_decode(self, spark):
        # %2541 -> %41 -> A  (double-encoded), matching the reference's
        # two-pass unquote
        u = self._run(spark, "GET", "/p%2541th", "1.1")
        assert u["url_path"] == "/pAth"
        # single-encoded plus sign stays literal (unquote, not form-decode)
        u2 = self._run(spark, "GET", "/a+b%20c", "1.1")
        assert u2["url_path"] == "/a+b c"
        # malformed escape: strict decode keeps the original
        u3 = self._run(spark, "GET", "/bad%zz", "1.1")
        assert u3["url_path"] == "/bad%zz"

    def test_fragment_rules(self, spark):
        u = self._run(spark, "GET", "/doc#sec2", "1.1")
        assert u["url_fragment"] == "sec2"
        assert u["url_path"] == "/doc"
        # '&' inside the tail -> NOT a fragment (RE_NOT_FRAGMENT_STR)
        u2 = self._run(spark, "GET", "/doc#a&b", "1.1")
        assert u2["url_fragment"] is None
        assert u2["url_path"] == "/doc#a&b"


class TestIcebergAdapter:
    def test_parquet_fallback(self, spark, tmp_path):
        from siem_on_amazon_opensearch_service_spark.sources import iceberg as ib

        # this image has no Iceberg jars: adapter must report unavailable
        # and route paths through parquet transparently
        assert ib.iceberg_available(spark) is False
        p = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        ib.write_table(df, p, mode="overwrite")
        got = ib.read_table(spark, p).orderBy("id").collect()
        assert [(r["id"], r["v"]) for r in got] == [(1, "a"), (2, "b")]
        ib.write_table(df, p, mode="append")
        assert ib.read_table(spark, p).count() == 4


class TestParserReservedWords:
    def test_bare_operator_rejected(self):
        import pytest as _pytest

        from siem_on_amazon_opensearch_service_spark.plans.query import parse

        for q in ["AND", "error AND AND timeout", "OR error"]:
            with _pytest.raises(ValueError):
                parse(q)
        # quoted forms still searchable as terms
        assert parse('"and"').term == "and"


class TestUaParseExtended:
    def test_family_table_r2(self, spark):
        from siem_on_amazon_opensearch_service_spark.functions.scalars import user_agent_parse

        cases = [
            ("Mozilla/5.0 (Windows NT 10.0; Trident/7.0; rv:11.0) like Gecko", "IE", "11.0", "Windows 10"),
            ("Mozilla/5.0 (Linux; Android 13; SM-S901B) AppleWebKit/537.36 Chrome/112.0.0.0 Mobile Safari/537.36 SamsungBrowser/21.0", "Samsung Internet", "21.0", "Android"),
            ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) AppleWebKit/605.1.15 CriOS/114.0.5735.99 Mobile/15E148 Safari/604.1", "Chrome Mobile iOS", "114.0.5735.99", "iOS"),
            ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)", "Googlebot", "2.1", "Other"),
            ("python-requests/2.31.0", "python-requests", "2.31.0", "Other"),
            ("Wget/1.21.3 (linux-gnu)", "Wget", "1.21.3", "Linux"),
            ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 Chrome/112.0.0.0 Safari/537.36", "Chrome", "112.0.0.0", "Chrome OS"),
        ]
        df = spark.createDataFrame([(c[0],) for c in cases], "ua string")
        got = df.select(F.col("ua"), user_agent_parse(F.col("ua")).alias("p")).collect()
        by_ua = {r["ua"]: r["p"] for r in got}
        for ua, name, version, osname in cases:
            p = by_ua[ua]
            assert p["name"] == name, ua
            assert p["version"] == version, ua
            assert p["os"] == osname, ua


class TestHttpUrlDecomposeProperty:
    """Property parity: the column implementation must agree with a
    straightforward test-only Python rendering of the reference's rules
    (single source: siem/utils.py:206-288) across generated requests."""

    @staticmethod
    def _py_oracle(method, path, version):
        import re
        import urllib.parse

        url = {"domain": None, "port": None, "fragment": None, "extension": None, "query": None}
        p = path or ""
        if p.startswith("/"):
            pass
        elif p.startswith(("http://", "https://")):
            parts = p.split("/", 3)
            host = parts[2]
            p = "/" + parts[-1]
            hp = host.split(":")
            if len(hp) == 1:
                url["domain"] = hp[0]
            elif len(hp) == 2:
                url["domain"], url["port"] = hp
        elif method and method.lower() == "connect":
            hp = p.split(":")
            if len(hp) == 2:
                url["domain"], url["port"] = hp
                p = ""
        if "%" in p:
            try:
                p2 = urllib.parse.unquote(p, errors="strict")
                p = p2
                if "%" in p:
                    p = urllib.parse.unquote(p, errors="strict")
            except Exception:
                pass
        frag = p.rsplit("#")
        if len(frag) == 2 and not re.search(r"[&(){}@_;<>\s]", frag[1]):
            url["fragment"] = frag[1]
            p = frag[0]
        qs = p.split("?", 1)
        url["path"] = qs[0]
        if len(qs) == 2:
            url["query"] = qs[1]
        fn = url["path"].split("/")[-1].split(".")
        if len(fn) > 1 and "\\" not in fn[-1]:
            url["extension"] = fn[-1]
        return url

    def test_generated_requests(self, spark):
        import random

        from siem_on_amazon_opensearch_service_spark.functions.scalars import http_url_decompose

        rng = random.Random(11)
        segs = ["idx.html", "a", "b.php", "img%2520x.png", "x%41y", "f.tar.gz", "doc", "w%2Bv"]
        hosts = ["ex.com", "ex.com:8443", "10.0.0.1:80"]
        cases = []
        for _ in range(120):
            kind = rng.randrange(4)
            if kind == 0:
                p = "/" + "/".join(rng.sample(segs, rng.randrange(1, 3)))
                if rng.random() < 0.5:
                    p += "?k=" + rng.choice(segs)
                if rng.random() < 0.3:
                    p += "#" + rng.choice(["s1", "a&b", "frag x", "ok2"])
                cases.append(("GET", p, "1.1"))
            elif kind == 1:
                cases.append(
                    ("GET", f"{rng.choice(['http','https'])}://{rng.choice(hosts)}/"
                     + "/".join(rng.sample(segs, rng.randrange(1, 3))), "1.1")
                )
            elif kind == 2:
                cases.append(("CONNECT", rng.choice(["t.example.net:443", "weird"]), "1.1"))
            else:
                cases.append(("GET", "/bad%zz" + rng.choice(segs), "1.1"))
        df = spark.createDataFrame(
            [(i, m, p, v) for i, (m, p, v) in enumerate(cases)],
            "i long, m string, p string, v string",
        )
        got = {
            r["i"]: r["u"]
            for r in df.select(
                "i", http_url_decompose(F.col("m"), F.col("p"), F.col("v"), F.lit(None).cast("string")).alias("u")
            ).collect()
        }
        for i, (m, p, v) in enumerate(cases):
            exp = self._py_oracle(m, p, v)
            u = got[i]
            for field in ("domain", "port", "path", "query", "fragment", "extension"):
                g = u[f"url_{field}"]
                e = exp.get(field)
                assert (g or None) == (e or None), (m, p, field, g, e)


class TestUaParseFullSurface:
    """r3: the reference's full ua field surface (user_agent.py:38-54) —
    original/name/version/os.name/os.version/os.full/device.name, the
    AWS-internal principal special case, and %20 unquoting."""

    def test_full_fields(self, spark):
        from siem_on_amazon_opensearch_service_spark.functions.scalars import user_agent_parse

        cases = [
            ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/120.0.0.0 Safari/537.36",
             dict(name="Chrome", os_name="Windows", os_version="10", os_full="Windows 10", device_name="Other")),
            ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.1 Safari/605.1.15",
             dict(name="Safari", os_name="Mac OS X", os_version="10.15.7", os_full="Mac OS X 10.15.7", device_name="Mac")),
            ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) CriOS/114.0.1 Mobile Safari/604.1",
             dict(name="Chrome Mobile iOS", os_name="iOS", os_version="16.5", device_name="iPhone")),
            ("Mozilla/5.0 (Linux; Android 13; SM-S901B) Chrome/112.0.0.0 Mobile Safari/537.36",
             dict(name="Chrome", os_name="Android", os_version="13", device_name="SM-S901B")),
            ("AWS Internal", dict(name="AWS Internal")),
            ("athena.amazonaws.com", dict(name="athena.amazonaws.com")),
            ("Mozilla/5.0%20(Windows%20NT%2010.0)%20Chrome/99.0.0.0",
             dict(name="Chrome", os_name="Windows", os_version="10")),
            ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
             dict(name="Googlebot", device_name="Spider")),
        ]
        df = spark.createDataFrame([(c[0],) for c in cases], "ua string")
        from pyspark.sql import functions as F

        got = {r["ua"]: r["p"] for r in df.select(F.col("ua"), user_agent_parse(F.col("ua")).alias("p")).collect()}
        for ua, exp in cases:
            p = got[ua]
            for k, v in exp.items():
                assert p[k] == v, (ua, k, p[k], v)
        # unquoted original is carried through
        assert got["Mozilla/5.0%20(Windows%20NT%2010.0)%20Chrome/99.0.0.0"]["original"].startswith("Mozilla/5.0 (Windows")
