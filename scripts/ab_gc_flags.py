#!/usr/bin/env python3
"""A/B: driver JVM heap flags vs the map-stage GC bill.

Event-log profiling showed the 8-core map stage paying 13-70s of JVM GC per
2M-row run (7-21% of executor time, and most of the run-to-run wall
variance).  Each arm runs in its OWN subprocess-JVM (flags are
session-fixed), cold + N warms, arms alternated round-robin so host drift
hits all arms equally; per-arm result is min-of-warms.

Usage: python scripts/ab_gc_flags.py <cores> <data_dir> [rounds]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cores = int(sys.argv[1])
data_dir = sys.argv[2]
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

ARMS = {
    "base_parallel": "-XX:+UseParallelGC",
    "xms_presized": "-Xms16g -XX:+UseParallelGC",
    "xms_young": "-Xms16g -XX:+UseParallelGC -XX:NewRatio=1",
}

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[%(cores)d]")
    .appName("ab-gc")
    .config("spark.sql.shuffle.partitions", "%(shuf)d")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    .config("spark.driver.extraJavaOptions", %(flags)r)
    .config("spark.local.dir", "/dev/shm/spark-local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from otel_semconvprocessor_spark.operators.enrich import (
    default_semconv_mappings, lang_dim, mappings_table)
from otel_semconvprocessor_spark.operators.route import slim_for_sink, write_routed_single_pass
from otel_semconvprocessor_spark.plans.pipeline import build_normalized
pages = spark.read.parquet(%(pages)r)
m = mappings_table(spark, default_semconv_mappings()).persist(); m.count()
d = lang_dim(spark).persist(); d.count()
n = slim_for_sink(build_normalized(spark, pages, extractor="pandas",
                                   mappings_df=m, dims=[(d, "lang")]).drop("html", "text"))
n.schema
walls = []
for i in range(4):
    t0 = time.monotonic()
    write_routed_single_pass(n, %(sink)r)
    walls.append(round(time.monotonic() - t0, 2))
json.dump(walls, open(%(out)r, "w"))
"""

results: dict[str, list[float]] = {k: [] for k in ARMS}
for r in range(rounds):
    for arm, flags in ARMS.items():
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out = tf.name
        code = CHILD % {
            "repo": REPO, "cores": cores, "shuf": 2 * cores, "flags": flags,
            "pages": f"{data_dir}/pages", "sink": f"{data_dir}/abgc", "out": out,
        }
        p = subprocess.run([sys.executable, "-c", code], stdout=subprocess.DEVNULL,
                           stderr=subprocess.PIPE)
        if p.returncode != 0:
            sys.stderr.write(p.stderr.decode()[-2000:])
            raise SystemExit(f"arm {arm} failed")
        walls = json.load(open(out))
        results[arm].extend(walls[1:])  # drop the cold run
        print(f"round {r} {arm:14} cold={walls[0]:6.2f} warms={walls[1:]}")
for arm, ws in results.items():
    print(f"{arm:14}: min {min(ws):6.2f}s  all {sorted(ws)}")
