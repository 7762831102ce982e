#!/usr/bin/env python3
"""Round-6 profiling harness: isolate each bench operator's stages with a
noop sink (guide §1.4) and min-of-warms timing, same session config as
bench.py.  Usage:

    python scripts/prof_r06.py stage <probe> [<probe> ...]   # time probes
    python scripts/prof_r06.py explain <probe>               # dump plan

Probes are registered in PROBES below.  Input pages parquet is staged once
under /dev/shm/prof_r06/pages (1M rows) and reused across invocations.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS = int(os.environ.get("PROF_ROWS", "1000000"))
WARMS = int(os.environ.get("PROF_WARMS", "3"))
PAGES = f"/dev/shm/prof_r06/pages_{ROWS}"


def _session(cores: int = CPUS):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"prof-r06-{cores}")
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    )
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    return b.getOrCreate()


def stage_pages(spark):
    if not os.path.isdir(PAGES):
        from otel_semconvprocessor_spark.sources.pages import generate_pages

        generate_pages(spark, ROWS, n_partitions=4 * CPUS).write.mode("overwrite").parquet(PAGES)
    return spark.read.parquet(PAGES)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def probe_registry(spark):
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.config import reference_config
    from otel_semconvprocessor_spark.operators.extract import extract_pages, extract_pages_native
    from otel_semconvprocessor_spark.operators.rules import apply_rules
    from otel_semconvprocessor_spark.operators.rules_broadcast import apply_rules_broadcast

    pages = stage_pages(spark)
    cfg = reference_config()
    P = {}

    P["scan_pages"] = lambda: noop(pages)
    P["scan_text_only"] = lambda: noop(pages.select("text"))

    # extraction decomposition
    P["extract_native_full"] = lambda: noop(extract_pages_native(pages))
    P["extract_pandas_full"] = lambda: noop(extract_pages(pages))

    def attrs_only():
        from otel_semconvprocessor_spark.operators.extract import ATTR_LINE_PATTERN

        text = F.col("text")
        keys = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 1)
        vals = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 2)
        noop(pages.select(keys.alias("k"), vals.alias("v")))

    P["regex_kv_only"] = attrs_only

    def attrs_map():
        from otel_semconvprocessor_spark.operators.extract import ATTR_LINE_PATTERN

        text = F.col("text")
        keys = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 1)
        vals = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 2)
        entries = F.arrays_zip(keys.alias("key"), vals.alias("value"))
        deduped = F.filter(
            entries,
            lambda e, i: ~F.exists(
                F.slice(entries, i + 2, F.size(entries)),
                lambda later: later["key"] == e["key"],
            ),
        )
        noop(pages.select(F.map_from_entries(deduped).alias("m")))

    P["attrs_map_dedup"] = attrs_map

    def attrs_map_nodedup():
        from otel_semconvprocessor_spark.operators.extract import ATTR_LINE_PATTERN

        text = F.col("text")
        keys = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 1)
        vals = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 2)
        noop(pages.select(F.map_from_arrays(keys, vals).alias("m")))

    P["attrs_map_nodedup"] = attrs_map_nodedup

    def html_greps():
        from otel_semconvprocessor_spark.operators.extract import (
            SERVER_PATTERN,
            TRACEPARENT_PATTERN,
        )

        h = F.decode(F.col("html"), "UTF-8")
        noop(
            pages.select(
                F.regexp_extract(h, SERVER_PATTERN, 1).alias("s"),
                F.regexp_extract(h, TRACEPARENT_PATTERN, 1).alias("t"),
            )
        )

    P["html_greps"] = html_greps

    # cascade on top of native extraction (the bench shape, unprunable)
    P["cascade_native_groupby"] = (
        lambda: apply_rules(extract_pages_native(pages), cfg)
        .groupBy("rule_id").count().collect()
    )
    P["cascade_broadcast_groupby"] = (
        lambda: apply_rules_broadcast(extract_pages_native(pages), cfg, id_col="url")
        .groupBy("rule_id").count().collect()
    )

    # cascade alone: pre-extracted, persisted input
    _pre = {}

    def cascade_only():
        if "pre" not in _pre:
            _pre["pre"] = (
                extract_pages_native(pages)
                .select("url", "name", "kind", "attrs")
                .persist()
            )
            _pre["pre"].count()
        apply_rules(_pre["pre"], cfg).groupBy("rule_id").count().collect()

    P["cascade_only_preextracted"] = cascade_only
    return P


def main():
    mode = sys.argv[1]
    names = sys.argv[2:]
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    probes = probe_registry(spark)
    if mode == "list":
        print("\n".join(probes))
        return
    for name in names:
        fn = probes[name]
        spark.sparkContext.setJobDescription(f"prof:{name}")
        walls = []
        for i in range(WARMS):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(walls)} walls={walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
