#!/usr/bin/env python3
"""Per-stage scaling profile of the bench pipeline via Spark event logs.

Runs the bench's timed region (write_routed_single_pass over build_normalized)
N warm times at a given core count with eventLog enabled, then parses the event
log: per-stage wall, task-time sum, max-task (straggler), and task count.

Usage: python scripts/stage_profile.py <cores> <rows_dir> [warms]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
data_dir = sys.argv[2]
warms = int(sys.argv[3]) if len(sys.argv) > 3 else 3

evdir = f"/dev/shm/spark-events-{cores}"
import shutil

shutil.rmtree(evdir, ignore_errors=True)
os.makedirs(evdir, exist_ok=True)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName(f"stage-profile-{cores}")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from otel_semconvprocessor_spark.operators.enrich import (  # noqa: E402
    default_semconv_mappings,
    lang_dim,
    mappings_table,
)
from otel_semconvprocessor_spark.operators.route import (  # noqa: E402
    slim_for_sink,
    write_routed_single_pass,
)
from otel_semconvprocessor_spark.plans.pipeline import build_normalized  # noqa: E402

pages = spark.read.parquet(f"{data_dir}/pages")
mappings_df = mappings_table(spark, default_semconv_mappings()).persist()
mappings_df.count()
dim = lang_dim(spark).persist()
dim.count()
# identical to bench.run_pipeline_level's timed region (slim sink included)
normalized = slim_for_sink(
    build_normalized(
        spark, pages, extractor="pandas", mappings_df=mappings_df, dims=[(dim, "lang")]
    ).drop("html", "text")
)
normalized.schema

walls = []
marks = []
for i in range(warms + 1):
    t0 = time.time()
    write_routed_single_pass(normalized, f"{data_dir}/sinks{cores}")
    walls.append(round(time.time() - t0, 2))
    marks.append(time.time())
spark.stop()

print(f"cores={cores} walls={walls} (first=cold)")

# parse the event log: stages of the LAST run only (submission time > marks[-2])
logf = sorted(glob.glob(f"{evdir}/*"))[-1]
if os.path.isdir(logf):  # Spark 4 eventlog_v2 rolling dir
    parts = sorted(p for p in glob.glob(f"{logf}/*") if "appstatus" not in p)
else:
    parts = [logf]
stages = {}
tasks = {}


def _lines():
    for p in parts:
        if p.endswith(".zstd"):
            import zstandard

            with open(p, "rb") as f:
                text = zstandard.ZstdDecompressor().stream_reader(f).read().decode()
            yield from text.splitlines()
        else:
            with open(p) as f:
                yield from f


if True:
    for line in _lines():
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            stages[sid] = {
                "name": si["Stage Name"].split(" at ")[0][:40],
                "sub": si.get("Submission Time", 0),
                "done": si.get("Completion Time", 0),
                "ntasks": si["Number of Tasks"],
            }
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            ti = e["Task Info"]
            dur = ti["Finish Time"] - ti["Launch Time"]
            tasks.setdefault(sid, []).append(dur)

last_start = marks[-2] * 1000 if len(marks) >= 2 else 0
print(f"{'stage':>5} {'name':40} {'wall_s':>7} {'ntask':>5} {'sum_s':>7} {'max_s':>6} {'med_s':>6} {'par_eff':>7}")
tot_wall = 0.0
for sid in sorted(stages):
    s = stages[sid]
    if s["sub"] < last_start:
        continue
    ts = sorted(tasks.get(sid, [0]))
    wall = (s["done"] - s["sub"]) / 1000
    tot_wall += wall
    tsum = sum(ts) / 1000
    # parallel efficiency of the stage: task-time-sum / (cores * wall)
    pe = tsum / (cores * wall) if wall > 0 else 0
    print(
        f"{sid:>5} {s['name']:40} {wall:7.2f} {s['ntasks']:>5} {tsum:7.2f} "
        f"{ts[-1]/1000:6.2f} {ts[len(ts)//2]/1000:6.2f} {pe:7.2f}"
    )
print(f"last-run wall={walls[-1]} sum-of-stage-walls={tot_wall:.2f} (gap = driver/commit/plan time)")
