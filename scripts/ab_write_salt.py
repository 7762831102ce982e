#!/usr/bin/env python3
"""A/B: write-side files_per_partition salt vs the (sink, day, lang) hash
shuffle's combo lumpiness.

The synthetic corpus spans ~4 warc days x 5 sinks x 5 langs, so the write
shuffle hashes ~100 combos into 2*cores partitions — measured row skew
11k..292k per partition at 16 partitions (2.4x median), a straggler task in
every write wave.  files_per_partition=k salts each combo over k writers;
this measures k in {1,2,4} interleaved (round-robin over warms so host drift
hits all arms equally).

Usage: python scripts/ab_write_salt.py <cores> <data_dir> [warms]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
data_dir = sys.argv[2]
warms = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName(f"ab-write-salt-{cores}")
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
normalized = slim_for_sink(
    build_normalized(
        spark, pages, extractor="pandas", mappings_df=mappings_df, dims=[(dim, "lang")]
    ).drop("html", "text")
)
normalized.schema

FPPS = [1, 2, 4]
times: dict[int, list[float]] = {k: [] for k in FPPS}
# one un-timed cold run to land codegen/JIT before any arm is timed
write_routed_single_pass(normalized, f"{data_dir}/abw", files_per_partition=1)
for w in range(warms):
    for k in FPPS:
        t0 = time.monotonic()
        write_routed_single_pass(normalized, f"{data_dir}/abw", files_per_partition=k)
        times[k].append(round(time.monotonic() - t0, 2))
for k in FPPS:
    print(f"fpp={k}: min {min(times[k]):6.2f}s  all {times[k]}")
