"""File-format scans (SURVEY.md §2.1) — Spark-native readers for the log
shapes the reference parses row-by-row in Python (siem/fileformat_*.py).

Each reader returns a DataFrame; decompression (gz/bz2) is native to
Spark's text/json/csv sources, matching the reference's magic-byte
sniffing (siem/__init__.py:385-446) without custom code.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import safe_field_names


def read_ndjson(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """NDJSON scan (siem/fileformat_json.py) — native spark.read.json."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_json_records(spark: SparkSession, path: str, records_key: str = "Records", schema=None) -> DataFrame:
    """CloudTrail-style record-array envelope: explode ``Records[]``
    (siem/fileformat_json.py:20-118)."""
    df = read_ndjson(spark, path, schema)
    return df.select(F.explode(F.col(records_key)).alias("r")).select("r.*")


def read_eventbridge_detail(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """EventBridge envelope strip: promote ``detail.*``
    (siem/fileformat_json.py FileFormatJson json_to_dict detail unwrap)."""
    df = read_ndjson(spark, path, schema)
    meta = [c for c in ("account", "region", "time", "detail-type") if c in df.columns]
    out = df.select(*meta, "detail.*")
    return safe_field_names(out)


def read_csv_logs(spark: SparkSession, path: str, sep: str = ",", multiline: bool = False) -> DataFrame:
    """CSV/TSV/space-delimited scan with header, '-'->'_' field renaming
    (siem/fileformat_csv.py:22-115)."""
    df = spark.read.csv(path, header=True, sep=sep, multiLine=multiline, quote='"', escape='"')
    return safe_field_names(df)


def read_text_regex(spark: SparkSession, path: str, log_pattern: str) -> DataFrame:
    """Named-group regex text scan (siem/fileformat_text.py:52-80; patterns
    like the ALB one in aws.ini:801).  Each named group becomes a column
    via JVM-side regexp_extract (group index resolved from the pattern)."""
    names = re.findall(r"\(\?P?<([A-Za-z_]\w*)>", log_pattern)
    # Java regex uses (?<name>...) — strip the Python-only P
    jpattern = log_pattern.replace("(?P<", "(?<")
    raw = spark.read.text(path).filter(F.length("value") > 0)
    cols = [
        F.regexp_extract(F.col("value"), jpattern, i + 1).alias(n)
        for i, n in enumerate(names)
    ]
    return raw.select(*cols)


def read_multiline(spark: SparkSession, path: str, firstline_re: str, log_pattern: str) -> DataFrame:
    """Multiline scan (siem/fileformat_multiline.py:73-121): group lines at
    ``firstline_re`` boundaries with a running-count window, reassemble,
    then named-group parse."""
    from pyspark.sql.window import Window

    raw = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("line_id", F.monotonically_increasing_id())
        .withColumn("is_first", F.col("value").rlike(firstline_re).cast("int"))
    )
    w = Window.partitionBy("file").orderBy("line_id").rowsBetween(Window.unboundedPreceding, 0)
    grouped = (
        raw.withColumn("rec", F.sum("is_first").over(w))
        .groupBy("file", "rec")
        .agg(F.concat_ws("\n", F.collect_list("value")).alias("value"))
    )
    names = re.findall(r"\(\?P?<([A-Za-z_]\w*)>", log_pattern)
    jpattern = log_pattern.replace("(?P<", "(?<")
    cols = [F.regexp_extract(F.col("value"), jpattern, i + 1).alias(n) for i, n in enumerate(names)]
    return grouped.select(*cols)


def read_cef(spark: SparkSession, path: str) -> DataFrame:
    """CEF scan (siem/fileformat_cef.py:37-75): 7 header fields split on
    unescaped '|', k=v extension pairs -> map column."""
    raw = spark.read.text(path).filter(F.length("value") > 0)
    hdr = F.split(F.col("value"), r"(?<!\\)\|")
    ext = F.element_at(hdr, 8)
    pairs = F.expr(
        r"map_from_entries(transform(regexp_extract_all(ext, '(\\w+)=([^=]*?)(?=\\s+\\w+=|$)', 0), "
        r"p -> struct(split(p, '=', 2)[0] as k, split(p, '=', 2)[1] as v)))"
    )
    return raw.select(
        F.element_at(hdr, 1).alias("cef_version"),
        F.element_at(hdr, 2).alias("device_vendor"),
        F.element_at(hdr, 3).alias("device_product"),
        F.element_at(hdr, 4).alias("device_version"),
        F.element_at(hdr, 5).alias("signature_id"),
        F.element_at(hdr, 6).alias("name"),
        F.element_at(hdr, 7).alias("severity"),
        ext.alias("ext"),
    ).withColumn("extensions", pairs)


def read_zip_lines(spark: SparkSession, path: str) -> DataFrame:
    """Zip-archive text scan: the reference sniffs the PK magic and
    unpacks members in-Lambda (siem/utils.py:900-914 get_mime_type,
    siem/__init__.py:385-446).  Spark's text source handles gz/bz2
    natively but not zip, so this reads whole archives via binaryFile
    and explodes member lines in an Arrow-batched mapInPandas ->
    (src_path string, member string, value string).  Archives are
    per-file parallel (one task can hold one archive's bytes — the
    reference has the same per-object memory shape)."""
    import io
    import zipfile

    import pandas as pd

    bf = spark.read.format("binaryFile").load(path).select("path", "content")

    def unzip(batches):
        for pdf in batches:
            out = {"src_path": [], "member": [], "value": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as z:
                    for name in z.namelist():
                        if name.endswith("/"):
                            continue
                        text = z.read(name).decode("utf-8", errors="replace")
                        for line in text.splitlines():
                            if line:
                                out["src_path"].append(p)
                                out["member"].append(name)
                                out["value"].append(line)
            yield pd.DataFrame(out)

    return bf.mapInPandas(unzip, schema="src_path string, member string, value string")


def unwrap_cloudwatch_logs(df: DataFrame) -> DataFrame:
    """CloudWatch Logs envelope (siem/__init__.py:311-338): explode
    ``logEvents[]`` from DATA_MESSAGE records, carry owner/group/stream."""
    return (
        df.filter(F.col("messageType") == "DATA_MESSAGE")
        .select(
            F.col("owner").alias("cwl_owner"),
            F.col("logGroup").alias("cwl_loggroup"),
            F.col("logStream").alias("cwl_logstream"),
            F.explode("logEvents").alias("e"),
        )
        .select(
            "cwl_owner", "cwl_loggroup", "cwl_logstream",
            F.col("e.id").alias("cwl_id"),
            F.col("e.timestamp").alias("cwl_timestamp"),
            F.col("e.message").alias("message"),
        )
    )


def unwrap_firelens(df: DataFrame, ignore_stderr: bool = True) -> DataFrame:
    """Firelens/ECS envelope (siem/__init__.py:340-383): container metadata
    + stderr suppression."""
    out = df
    if ignore_stderr and "source" in df.columns:
        out = out.filter(F.col("source") != "stderr")
    keep = [c for c in ("container_id", "container_name", "ecs_cluster", "ecs_task_arn", "log", "source") if c in df.columns]
    return out.select(*keep)


def s3_key_ignored(df: DataFrame, pattern: str, key_col: str = "s3key") -> DataFrame:
    """S3-key ignore filter (siem/__init__.py:101-107)."""
    return df.filter(~F.col(key_col).rlike(pattern))


def logtype_from_key(key: F.Column, rules: list[tuple[str, str]]) -> F.Column:
    """Log-type dispatch by S3 key regex (siem/utils.py:554-561): first
    matching rule wins, else 'unknown'."""
    expr = F.lit("unknown")
    for pat, logtype in reversed(rules):
        expr = F.when(key.rlike(pat), F.lit(logtype)).otherwise(expr)
    return expr
