"""Windows-event XML scan (SURVEY.md §2.1; reference
siem/fileformat_winevtxml.py:57-166, fileformat_xml.py:24-86).

<Event>-bounded records are grouped with the same running-count window as
the multiline reader, then parsed in an Arrow-batched UDF with xmltodict
(no native XML source in the OSS Spark distro).  Reference fixups
reproduced: EventData.Data list -> name->text map; EventID text promotion;
'-' values dropped (del_none analogue)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# pandas->Arrow cannot convert dict cells to map<> directly; the UDF emits
# parallel key/value arrays and read_winevtxml zips them with map_from_arrays.
WINEVT_SCHEMA = (
    "provider string, event_id string, level string, computer string, "
    "time_created string, channel string, record_id string, "
    "ed_keys array<string>, ed_values array<string>"
)


def _parse_events(batches):
    import xmltodict

    for pdf in batches:
        rows = {k: [] for k in ("provider", "event_id", "level", "computer",
                                "time_created", "channel", "record_id",
                                "ed_keys", "ed_values")}
        for xml in pdf["value"]:
            if "<Event" not in xml.split("\n", 1)[0]:
                continue
            try:
                doc = xmltodict.parse(xml)
            except Exception:
                continue
            ev = doc.get("Event", {})
            sys = ev.get("System", {}) or {}
            eid = sys.get("EventID")
            if isinstance(eid, dict):  # EventID with Qualifiers attr (reference :120-131)
                eid = eid.get("#text")
            prov = sys.get("Provider", {})
            prov = prov.get("@Name") if isinstance(prov, dict) else prov
            tc = sys.get("TimeCreated", {})
            tc = tc.get("@SystemTime") if isinstance(tc, dict) else tc
            data = (ev.get("EventData") or {}).get("Data")
            ed = {}
            if isinstance(data, list):  # Data list -> name->text map (:93-107)
                for d in data:
                    if isinstance(d, dict) and "@Name" in d:
                        v = d.get("#text")
                        if v not in (None, "-"):
                            ed[d["@Name"]] = v
            elif isinstance(data, dict) and "@Name" in data:
                v = data.get("#text")
                if v not in (None, "-"):
                    ed[data["@Name"]] = v
            rows["provider"].append(prov)
            rows["event_id"].append(eid)
            rows["level"].append(sys.get("Level"))
            rows["computer"].append(sys.get("Computer"))
            rows["time_created"].append(tc)
            rows["channel"].append(sys.get("Channel"))
            rows["record_id"].append(sys.get("EventRecordID"))
            rows["ed_keys"].append(list(ed.keys()))
            rows["ed_values"].append(list(ed.values()))
        if rows["provider"]:
            # object dtype everywhere: an empty/auto-inferred float column
            # would make the Arrow list<string> conversion blow up
            yield pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in rows.items()})


def read_winevtxml(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("line_id", F.monotonically_increasing_id())
        .withColumn("is_first", F.col("value").rlike("<Event[ >]").cast("int"))
    )
    w = Window.partitionBy("file").orderBy("line_id").rowsBetween(Window.unboundedPreceding, 0)
    grouped = (
        raw.withColumn("rec", F.sum("is_first").over(w))
        .groupBy("file", "rec")
        .agg(F.concat_ws("\n", F.collect_list("value")).alias("value"))
    )
    parsed = grouped.mapInPandas(_parse_events, schema=WINEVT_SCHEMA)
    return parsed.withColumn(
        "event_data", F.map_from_arrays(F.col("ed_keys"), F.col("ed_values"))
    ).drop("ed_keys", "ed_values")
