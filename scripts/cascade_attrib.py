#!/usr/bin/env python3
"""Attribution experiment for the r1->r2 cascade_native regression
(BENCH_r01 9.50s -> BENCH_r02 16.57s on a nominally identical ~1M-row
operator bench).

Hypotheses separated:
  A. input shape: r1 read a 1M-page parquet directly; r2 staged 2M pages and
     sliced 1M via pmod(xxhash64(url), 2) = 0 — an extra 2M-row scan + hash
     + filter inside the timed region.
  B. cascade form: r2's rules.py evaluates error-prone rules via an
     `attempt` struct (value evaluated once behind the predicate, op_name
     tested on the struct) vs r1's predicate-folding form (name_expr IS NOT
     NULL folded into the predicate, re-evaluated in the value).
  C. host-load window.

Modes (each runs in its own subprocess/JVM, 1 cold + 3 warm, min-warm
reported, exactly like bench.py's operator timings):
  direct1m_attempt   1M pages read directly, current attempt-struct cascade
  sliced1m_attempt   2M pages + pmod slice, current cascade (r2 conditions)
  direct1m_fold      1M pages read directly, r1 predicate-folding cascade

Usage: python scripts/cascade_attrib.py            # run all modes
       python scripts/cascade_attrib.py --worker MODE STAGE_DIR OUT_JSON
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("cascade-attrib")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    return b.getOrCreate()


def apply_rules_fold(df, cfg):
    """The round-1 cascade form, reconstructed: name-nullable rules fold
    `operation_name IS NOT NULL` into the predicate (the expr appears in
    both the branch condition and the value)."""
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.functions.scalars import attr
    from otel_semconvprocessor_spark.operators.rules import compile_rule_columns, finish_match

    attrs, name, kind = F.col("attrs"), F.col("name"), F.col("kind")
    compiled = compile_rule_columns(cfg, attrs, name, kind)
    no_match = F.lit(None).cast("struct<rule_id:string,op_name:string,op_type:string>")
    cascade = no_match
    for c in reversed(compiled):
        hit = F.struct(
            F.lit(c.rule_id).alias("rule_id"),
            c.operation_name.alias("op_name"),
            (c.operation_type if c.operation_type is not None else F.lit(None).cast("string")).alias("op_type"),
        )
        pred = c.predicate & c.operation_name.isNotNull() if c.name_nullable else c.predicate
        cascade = F.when(pred, hit).otherwise(cascade)
    guarded = F.when(attr(attrs, cfg.span_processing.operation_name_attribute).isNull(), cascade)
    return finish_match(df.withColumn("__match", guarded), cfg, "attrs", "name")


def worker(mode: str, stage_dir: str, out_json: str) -> None:
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.config import reference_config
    from otel_semconvprocessor_spark.operators.extract import extract_pages_native
    from otel_semconvprocessor_spark.operators.rules import apply_rules

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    cfg = reference_config()
    try:
        if mode == "sliced1m_attempt":
            pages = spark.read.parquet(f"{stage_dir}/pages2m")
            pages = pages.filter(F.pmod(F.xxhash64(F.col("url")), F.lit(2)) == 0)
        else:
            pages = spark.read.parquet(f"{stage_dir}/pages1m")
        applier = apply_rules_fold if mode == "direct1m_fold" else apply_rules
        q = applier(extract_pages_native(pages), cfg).groupBy("rule_id")

        def once():
            t0 = time.time()
            q.count().collect()
            return time.time() - t0

        cold = once()
        warms = [once() for _ in range(3)]
        with open(out_json, "w") as f:
            json.dump({"mode": mode, "cold": round(cold, 2),
                       "warms": [round(w, 2) for w in warms],
                       "min_warm": round(min(warms), 3)}, f)
    finally:
        spark.stop()


def stage(stage_dir: str) -> None:
    from otel_semconvprocessor_spark.sources.pages import generate_pages

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        generate_pages(spark, 1_000_000, n_partitions=4 * CPUS).write.mode(
            "overwrite"
        ).parquet(f"{stage_dir}/pages1m")
        generate_pages(spark, 2_000_000, n_partitions=4 * CPUS).write.mode(
            "overwrite"
        ).parquet(f"{stage_dir}/pages2m")
    finally:
        spark.stop()


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    stage_dir = tempfile.mkdtemp(prefix="cascade-attrib-", dir=base)
    try:
        subprocess.run(
            [sys.executable, __file__, "--worker", "stage", stage_dir, "/dev/null"],
            check=True,
        )
        results = {}
        for mode in ("direct1m_attempt", "sliced1m_attempt", "direct1m_fold"):
            with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
                out = tf.name
            subprocess.run(
                [sys.executable, __file__, "--worker", mode, stage_dir, out], check=True
            )
            with open(out) as f:
                results[mode] = json.load(f)
            print(json.dumps(results[mode]))
        print(json.dumps(results))
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        if sys.argv[2] == "stage":
            stage(sys.argv[3])
        else:
            worker(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
