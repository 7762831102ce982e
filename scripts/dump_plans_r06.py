#!/usr/bin/env python3
"""Dump .explain('formatted') for every round-6-touched query shape into
plans/r06/<name>_{before,after}.txt.

'before' plans are produced from the round-start tree (git worktree at the
commit tagged/passed as argv[1], default the round-start commit); 'after'
from the current tree.  Run: python scripts/dump_plans_r06.py after
(inside the current tree) or with a worktree checkout for before.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = os.path.join(os.environ.get("PLANS_OUT", os.path.join(REPO, "plans", "r06")))
SF = "/root/testdata/sf0.1"


def main():
    from pyspark.sql import SparkSession, functions as F

    os.makedirs(OUT, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName(f"plans-r06-{SUFFIX}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from otel_semconvprocessor_spark.config import reference_config
    from otel_semconvprocessor_spark.functions.ottl import compile_ottl
    from otel_semconvprocessor_spark.operators.extract import extract_pages_native
    from otel_semconvprocessor_spark.operators.enrich import (
        default_semconv_mappings,
        lang_dim,
        mappings_table,
    )
    from otel_semconvprocessor_spark.operators.rules import apply_rules
    from otel_semconvprocessor_spark.operators.rules_broadcast import apply_rules_broadcast
    from otel_semconvprocessor_spark.operators.similarity import topk_lsh
    from otel_semconvprocessor_spark.operators.route import slim_for_sink
    from otel_semconvprocessor_spark.plans.pipeline import build_normalized
    from otel_semconvprocessor_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 1000)
    cfg = reference_config()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    mp = mappings_table(spark, default_semconv_mappings())
    dim = lang_dim(spark)

    lines = spark.range(1000).select(F.format_string("1.2.3.%d - u [10/Oct/2024:13:00:00 -0700] \"GET /x HTTP/1.1\" 200 %d \"r\" \"ua\"", F.col("id") % 250, F.col("id")).alias("line"))
    grok = compile_ottl('ExtractGrokPatterns(name, "%{COMBINEDAPACHELOG}")', name_col="line")

    shapes = {
        "extract_native": extract_pages_native(pages),
        "cascade_native": apply_rules(extract_pages_native(pages), cfg).groupBy("rule_id").count(),
        "cascade_full_output": apply_rules(extract_pages_native(pages), cfg),
        "cascade_broadcast": apply_rules_broadcast(extract_pages_native(pages), cfg, id_col="url").groupBy("rule_id").count(),
        "grok_apache": lines.select(grok.alias("m")).groupBy(F.col("m")["response"]).count(),
        "topk_lsh": topk_lsh(emb, queries, k=10, bits=4, tables=8, dim=64),
        "pipeline_normalized": slim_for_sink(
            build_normalized(spark, pages, extractor="pandas", mappings_df=mp, dims=[(dim, "lang")]).drop("html", "text")
        ),
    }
    for name, df in shapes.items():
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
