#!/usr/bin/env python3
"""A/B: does warming codegen/JIT on a SMALL same-shape input substitute for a
full-size cold run?  And does disabling AQE partition coalescing fix the
write-stage packing (16 tasks -> 2 even waves instead of 10 -> 8+2)?

Usage: python scripts/warmup_ab.py <cores> <data_dir> <warm_rows> [coalesce_off]
Assumes <data_dir>/pages exists (full input).  Stages <data_dir>/pages_warm.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
data_dir = sys.argv[2]
warm_rows = int(sys.argv[3])
coalesce_off = len(sys.argv) > 4 and sys.argv[4] == "1"

from pyspark.sql import SparkSession  # noqa: E402

b = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName(f"warmab-{cores}")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    .config("spark.local.dir", "/dev/shm/spark-local")
)
if coalesce_off:
    b = b.config("spark.sql.adaptive.coalescePartitions.enabled", "false")
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

warm_path = f"{data_dir}/pages_warm_{warm_rows}"
if not os.path.isdir(warm_path):
    generate_pages(spark, warm_rows, n_partitions=2 * cores).write.mode("overwrite").parquet(warm_path)

mappings_df = mappings_table(spark, default_semconv_mappings()).persist()
mappings_df.count()
dim = lang_dim(spark).persist()
dim.count()


def plan(path):
    n = build_normalized(
        spark, spark.read.parquet(path), extractor="pandas",
        mappings_df=mappings_df, dims=[(dim, "lang")],
    ).drop("html", "text")
    n.schema
    return n

warm_plan = plan(warm_path)
full_plan = plan(f"{data_dir}/pages")

t = []
for i in range(2):
    t0 = time.time()
    write_routed_single_pass(warm_plan, f"{data_dir}/sinks_warm")
    t.append(round(time.time() - t0, 2))
print(f"warm-input runs ({warm_rows} rows): {t}")

walls = []
for i in range(4):
    t0 = time.time()
    write_routed_single_pass(full_plan, f"{data_dir}/sinks_full")
    walls.append(round(time.time() - t0, 2))
print(f"full-input runs after small warm (coalesce_off={coalesce_off}): {walls}")
spark.stop()
