"""WinEvtXML scan (§2.1) and exclusion-filter (§2.3) tests."""

import os

import pytest
from pyspark.sql import functions as F

from siem_on_amazon_opensearch_service_spark.operators import exclusions
from siem_on_amazon_opensearch_service_spark.sources.winevtxml import read_winevtxml

EVT = """<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/event'>
<System><Provider Name='Microsoft-Windows-Security-Auditing'/>
<EventID>4624</EventID><Level>0</Level>
<TimeCreated SystemTime='2024-06-01T10:00:00.123Z'/>
<EventRecordID>12345</EventRecordID>
<Channel>Security</Channel><Computer>host1</Computer></System>
<EventData><Data Name='TargetUserName'>alice</Data>
<Data Name='LogonType'>3</Data><Data Name='Empty'>-</Data></EventData></Event>
<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/event'>
<System><Provider Name='P2'/><EventID Qualifiers='16384'>7036</EventID>
<Level>4</Level><TimeCreated SystemTime='2024-06-01T11:00:00Z'/>
<EventRecordID>12346</EventRecordID><Channel>System</Channel>
<Computer>host2</Computer></System>
<EventData><Data Name='param1'>svc</Data></EventData></Event>
"""


class TestWinEvtXml:
    def test_parse(self, spark, tmp_path):
        p = os.path.join(str(tmp_path), "evt.xml")
        with open(p, "w") as f:
            f.write(EVT)
        rows = {r["record_id"]: r for r in read_winevtxml(spark, p).collect()}
        assert set(rows) == {"12345", "12346"}
        r = rows["12345"]
        assert r["event_id"] == "4624"
        assert r["computer"] == "host1"
        assert r["event_data"]["TargetUserName"] == "alice"
        assert "Empty" not in r["event_data"]  # '-' dropped (del_none)
        # EventID with Qualifiers attribute -> text promoted
        assert rows["12346"]["event_id"] == "7036"
        assert rows["12346"]["event_data"]["param1"] == "svc"


class TestExclusions:
    def test_pattern_exclusion_all_fields_must_match(self, spark):
        df = spark.createDataFrame(
            [("alice", "GET"), ("alice", "PUT"), ("bob", "GET")], "user string, method string"
        )
        out = exclusions.exclude_patterns(df, {"user": "ali.*", "method": "GET"})
        kept = sorted((r["user"], r["method"]) for r in out.collect())
        assert kept == [("alice", "PUT"), ("bob", "GET")]

    def test_anchored_match_semantics(self, spark):
        # reference uses re.match (anchored): 'lice' must NOT match 'alice'
        df = spark.createDataFrame([("alice",)], "user string")
        assert exclusions.exclude_patterns(df, {"user": "lice"}).count() == 1
        assert exclusions.exclude_patterns(df, {"user": "ali"}).count() == 0

    def test_text_pattern_type(self, spark):
        df = spark.createDataFrame([("a.c",), ("abc",)], "x string")
        out = exclusions.exclude_patterns(df, {"x": "a.c"}, pattern_type="text")
        assert [r["x"] for r in out.collect()] == ["abc"]

    def test_jmespath_exclude_and_count(self, spark):
        df = spark.createDataFrame(
            [(1, "error"), (2, "ok"), (3, "error")], "id long, status string"
        )
        filtered, agg = exclusions.jmespath_exclusion(df, "status == 'error'")
        assert sorted(r["id"] for r in filtered.collect()) == [2]
        counted, agg = exclusions.jmespath_exclusion(df, "status == 'error'", action="COUNT")
        assert counted.count() == 3  # COUNT keeps rows
