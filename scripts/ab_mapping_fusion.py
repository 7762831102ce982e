#!/usr/bin/env python3
"""A/B: semconv mapping map-rewrite — fused single entries pass vs the naive
three-pass form (map_filter(delete) -> map_filter(rename-conflict) ->
map_from_entries(transform(...)) rebuild).

The attrs map is the widest column in the pipeline; every extra map rebuild
copies all key+value strings.  This measures both forms over the same
synthetic wide-attrs frame (min-of-warms) and asserts output identity first.

Usage: python scripts/ab_mapping_fusion.py [rows] [cores]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .appName("ab-mapping-fusion")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from otel_semconvprocessor_spark.operators.enrich import (  # noqa: E402
    SemconvMapping,
    apply_semconv_mappings,
    mappings_table,
)


def apply_semconv_mappings_threepass(
    df: DataFrame,
    mappings_df: DataFrame,
    attrs_col: str = "attrs",
    schema_url_col: str = "schema_url",
) -> DataFrame:
    """The pre-round-5 form: delete, rename-conflict-drop and re-key as three
    separate map materializations (kept verbatim for the A/B)."""
    joined = df.join(F.broadcast(mappings_df), on=schema_url_col, how="left")
    attrs = F.col(attrs_col)
    renames = F.coalesce(F.col("renames"), F.create_map().cast("map<string,string>"))
    copies = F.coalesce(F.col("copies"), F.create_map().cast("map<string,string>"))
    deletes = F.coalesce(F.col("deletes"), F.array().cast("array<string>"))

    step1 = F.map_filter(attrs, lambda k, _: ~F.array_contains(deletes, k))
    target = lambda k: F.try_element_at(renames, k)  # noqa: E731
    step2 = F.map_filter(
        step1, lambda k, _: target(k).isNull() | F.try_element_at(step1, target(k)).isNull()
    )
    step3 = F.map_from_entries(
        F.transform(
            F.map_entries(step2),
            lambda e: F.struct(
                F.coalesce(target(e["key"]), e["key"]).alias("key"),
                e["value"].alias("value"),
            ),
        )
    )
    copy_entries = F.filter(
        F.transform(
            F.map_entries(copies),
            lambda e: F.struct(
                F.when(F.try_element_at(step3, e["value"]).isNull(), e["value"]).alias("key"),
                F.try_element_at(step3, e["key"]).alias("value"),
            ),
        ),
        lambda s: s["key"].isNotNull() & s["value"].isNotNull(),
    )
    final = F.map_concat(step3, F.map_from_entries(copy_entries))
    return joined.withColumn(attrs_col, final).drop("renames", "copies", "deletes")


# ---- synthetic wide-attrs frame (pipeline-shaped: ~10 keys, mixed widths) --
did = F.col("id")
df = (
    spark.range(rows)
    .repartition(2 * cores)
    .select(
        did.alias("doc_id"),
        F.when(did % 3 == 0, F.lit("https://opentelemetry.io/schemas/1.21.0"))
        .otherwise(F.lit("https://opentelemetry.io/schemas/1.26.0"))
        .alias("schema_url"),
        F.map_from_arrays(
            F.array(
                F.lit("http.method"), F.lit("http.request.method"), F.lit("http.target"),
                F.lit("db.statement"), F.lit("net.peer.name"), F.lit("user_agent.original"),
                F.lit("legacy.key"), F.lit("span.payload"), F.lit("k8"), F.lit("k9"),
            ),
            F.array(
                F.lit("GET"),
                F.when(did % 2 == 0, F.lit("POST")),
                F.concat(F.lit("/api/v1/users/"), did.cast("string")),
                F.concat(F.lit("SELECT * FROM t WHERE id = "), did.cast("string")),
                F.lit("db-prod-01.internal.example.com"),
                F.lit("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/120"),
                F.lit("legacy-value"),
                F.repeat(F.lit("x"), 64),
                did.cast("string"),
                (did % 97).cast("string"),
            ),
        ).alias("attrs"),
    )
)
df = df.withColumn(
    "attrs", F.map_filter(F.col("attrs"), lambda _, v: v.isNotNull())
).persist()
df.count()

mappings = [
    SemconvMapping("https://opentelemetry.io/schemas/1.21.0", "rename", "http.method", "http.request.method"),
    SemconvMapping("https://opentelemetry.io/schemas/1.21.0", "copy", "db.statement", "db.query.text"),
    SemconvMapping("https://opentelemetry.io/schemas/1.21.0", "delete", "legacy.key"),
]
mdf = mappings_table(spark, mappings).persist()
mdf.count()

# ---- identity check on a slice --------------------------------------------
slice_df = df.limit(5000)
a = {r["doc_id"]: sorted(r["attrs"].items()) for r in apply_semconv_mappings(slice_df, mdf).collect()}
b = {
    r["doc_id"]: sorted(r["attrs"].items())
    for r in apply_semconv_mappings_threepass(slice_df, mdf).collect()
}
assert a == b, "fused and three-pass outputs differ"
print(f"identity check OK on {len(a)} rows")


def bench(tag, fn, warms=4):
    times = []
    for _ in range(warms):
        t0 = time.monotonic()
        # cheap sink: forces the full map build (size needs the built map,
        # element_at probes two rewritten keys) without re-serializing it
        fn(df, mdf).select(
            F.sum(F.size("attrs")).alias("n"),
            F.count(F.try_element_at(F.col("attrs"), F.lit("http.request.method"))).alias("a"),
            F.count(F.try_element_at(F.col("attrs"), F.lit("db.query.text"))).alias("b"),
        ).collect()
        times.append(time.monotonic() - t0)
    print(f"{tag}: min {min(times):.3f}s  all {[round(t, 3) for t in times]}")
    return min(times)


t_three = bench("three-pass", apply_semconv_mappings_threepass)
t_fused = bench("fused     ", apply_semconv_mappings)
print(f"speedup: {t_three / t_fused:.2f}x  ({rows} rows, local[{cores}])")
