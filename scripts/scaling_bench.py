#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The rule's N-vs-4N-executor criterion can't use a real cluster in this
sandbox, so this script runs the IDENTICAL index build via
``spark-submit --py-files`` at local[8] and local[32] over the same input
and reports throughput at both plus efficiency = (T32/T8)/(32/8),
appending the table to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [sf_label]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "siem_on_amazon_opensearch_service_spark"


def make_pyfiles_zip() -> str:
    out = os.path.join(REPO, "_generated", "engine_pyfiles.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


JOB = """
import json, os, shutil, sys, time
from pyspark.sql import SparkSession

cores = int(sys.argv[1]); label = sys.argv[2]; runs = int(sys.argv[3])
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("WARN")
from siem_on_amazon_opensearch_service_spark import entry as reg
from siem_on_amazon_opensearch_service_spark.operators.build import build_index
corpus = reg.ensure_corpus(label, spark)
tdf = spark.read.parquet(corpus)
n = tdf.count()
best = None
for r in range(runs):
    # index written to tmpfs: this microVM's single virtio disk stalls on
    # dirty-page flushes (D-state load spikes), an artifact a real cluster
    # does not have (per-node storage bandwidth scales with nodes)
    out = os.path.join("/dev/shm", f"scaling_idx_{label}_c{cores}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, tdf, out, n_shards=64, n_salts=8)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({"cores": cores, "n_turns": n, "sec": best, "turns_per_sec": n / best}))
"""


def run_level(cores: int, label: str, pyz: str, runs: int = 2) -> dict:
    job = os.path.join(REPO, "_generated", "_scaling_job.py")
    with open(job, "w") as f:
        f.write(JOB)
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", pyz,
        job, str(cores), label, str(runs),
    ]
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-5000:])
    raise RuntimeError(f"no RESULT from local[{cores}] run")


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pyz = make_pyfiles_zip()
    r8 = run_level(8, label, pyz, runs)
    r32 = run_level(32, label, pyz, runs)
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / (32 / 8)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    lines = [
        "# BENCH/BASELINE — index-build scaling (local[8] vs local[32])",
        "",
        "Sandbox stand-in for the north_rule's N vs 4N executors: identical",
        "`spark-submit --py-files` build job, same input, two parallelism levels.",
        "Index output on tmpfs: the sandbox is one microVM whose single",
        "virtio disk throttles all writers equally (D-state stalls) — a",
        "cluster's aggregate storage bandwidth scales with executors, so",
        "disk-floor numbers would understate real scaling.",
        "",
        f"corpus: synthetic transcripts sf{label} ({r8['n_turns']} turns), fresh index each run, best of {runs}",
        "",
        "| parallelism | build sec | turns/sec |",
        "|---|---|---|",
        f"| local[8]  | {r8['sec']:.2f} | {r8['turns_per_sec']:.0f} |",
        f"| local[32] | {r32['sec']:.2f} | {r32['turns_per_sec']:.0f} |",
        "",
        f"**Scaling efficiency = ({r32['turns_per_sec']:.0f} / {r8['turns_per_sec']:.0f}) / (32/8) = {eff:.3f}**"
        + ("  (>= 0.8 target met)" if eff >= 0.8 else "  (below 0.8 target — see notes)"),
        "",
    ]
    with open(md, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
