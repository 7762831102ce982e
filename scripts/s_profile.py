#!/usr/bin/env python3
"""Profile the per-run serial floor S of the bench pipeline.

S = wall time of the full write job on a TINY input (same plan shape, same
partition layout, negligible W).  Components probed:
  * Catalyst phases (analysis/optimization/planning) via QueryPlanningTracker
  * the write+commit job itself
  * effect of spark.sql.constraintPropagation.enabled=false (big CASE trees
    are a known planning-time amplifier)

Usage: python scripts/s_profile.py [cores] [tiny_rows] [runs]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
tiny_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

from pyspark.sql import SparkSession  # noqa: E402

b = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName("s-profile")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    .config("spark.local.dir", "/dev/shm/spark-local")
)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from otel_semconvprocessor_spark.operators.enrich import (  # noqa: E402
    default_semconv_mappings,
    lang_dim,
    mappings_table,
)
from otel_semconvprocessor_spark.operators.route import write_routed_single_pass  # noqa: E402
from otel_semconvprocessor_spark.plans.pipeline import build_normalized  # noqa: E402
from otel_semconvprocessor_spark.sources.pages import generate_pages  # noqa: E402

base = "/dev/shm/s_profile"
tiny_path = f"{base}/pages_tiny_{tiny_rows}"
if not os.path.isdir(tiny_path):
    generate_pages(spark, tiny_rows, n_partitions=4 * cores).write.mode("overwrite").parquet(tiny_path)

pages = spark.read.parquet(tiny_path)
mappings_df = mappings_table(spark, default_semconv_mappings()).persist()
mappings_df.count()
dim = lang_dim(spark).persist()
dim.count()
normalized = build_normalized(
    spark, pages, extractor="pandas", mappings_df=mappings_df, dims=[(dim, "lang")]
).drop("html", "text")
normalized.schema


def tracker_phases(df):
    try:
        jqe = df._jdf.queryExecution()
        ph = jqe.tracker().phases()
        it = ph.iterator()
        out = {}
        while it.hasNext():
            e = it.next()
            s = e._2()
            out[e._1()] = round((s.endTimeMs() - s.startTimeMs()) / 1000.0, 3)
        return out
    except Exception as ex:  # noqa: BLE001
        return {"err": str(ex)[:120]}


def profile(tag, constraint_prop):
    spark.conf.set("spark.sql.constraintPropagation.enabled", str(constraint_prop).lower())
    walls = []
    for i in range(runs):
        t0 = time.time()
        write_routed_single_pass(normalized, f"{base}/sinks")
        w = time.time() - t0
        walls.append(round(w, 3))
    print(f"[{tag}] cores={cores} tiny_rows={tiny_rows} walls={walls} min={min(walls)}")


# also: how long does pure planning take (no execution)?
spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
t0 = time.time()
_ = normalized._jdf.queryExecution().executedPlan()
print(f"planning-only (first, cp=on): {time.time()-t0:.3f}s phases={tracker_phases(normalized)}")

profile("cp=on ", True)
profile("cp=off", False)

# decompose: shuffle-only (no parquet encode / commit) via noop sink
from pyspark.sql import functions as F  # noqa: E402
from otel_semconvprocessor_spark.operators.route import assign_sink  # noqa: E402

routed = assign_sink(normalized).withColumn("warc_day", F.to_date(F.col("warc_ts")))
salt = F.pmod(F.xxhash64(F.col("url")), F.lit(1))
routed = routed.repartition(F.col("sink"), F.col("warc_day"), F.col("lang"), salt)
walls = []
for i in range(runs):
    t0 = time.time()
    routed.write.mode("overwrite").format("noop").save()
    walls.append(round(time.time() - t0, 3))
print(f"[noop-write] walls={walls} min={min(walls)}")

# count the partition dirs the real write produced
ndirs = sum(len(dirs) == 0 for _, dirs, _ in os.walk(f"{base}/sinks"))
nfiles = sum(len([f for f in fs if f.endswith('.parquet')]) for _, _, fs in os.walk(f"{base}/sinks"))
print(f"[layout] leaf_dirs~{ndirs} parquet_files={nfiles}")
spark.stop()
