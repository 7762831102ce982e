"""Physical-plan quality gates: the properties that keep the pipeline viable
at 100 TB — column pruning on the metrics re-scan, broadcast-only joins in the
transform chain, bounded file counts from the routed write."""

import os

import pytest
from pyspark.sql import functions as F

from otel_semconvprocessor_spark.config import reference_config
from otel_semconvprocessor_spark.operators.metrics import cardinality_summary, rule_effectiveness
from otel_semconvprocessor_spark.plans.pipeline import build_normalized, run_pipeline
from otel_semconvprocessor_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def sink_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plans") / "out")
    run_pipeline(spark, generate_pages(spark, 400), out, run_id="plans")
    return f"{out}/sinks"


def test_metrics_scan_prunes_columns(spark, sink_path):
    """The aggregate stage must read only the narrow columns it needs — at
    10^12 rows re-scanning html/text for a count would be catastrophic."""
    routed = spark.read.parquet(sink_path)
    cfg = reference_config()
    plan = rule_effectiveness(routed, cfg)._jdf.queryExecution().executedPlan().toString()
    schema_line = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_line, plan
    assert "html" not in schema_line[0] and "text" not in schema_line[0]
    assert "attrs" not in schema_line[0]

    plan2 = cardinality_summary(routed, cfg)._jdf.queryExecution().executedPlan().toString()
    schema_line2 = [ln for ln in plan2.splitlines() if "ReadSchema" in ln]
    assert "html" not in schema_line2[0] and "attrs" not in schema_line2[0]


def test_transform_chain_has_no_sort_merge_join(spark):
    """Every join in the normalize chain is small-side broadcast."""
    pages = generate_pages(spark, 200)
    plan = (
        build_normalized(spark, pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # mapping table + lang dim


def test_routed_write_file_count_bounded(spark, sink_path):
    """O(partition combos), not O(tasks x combos)."""
    n_files = sum(
        1 for _, _, files in os.walk(sink_path) for f in files if f.endswith(".parquet")
    )
    combos = (
        spark.read.parquet(sink_path)
        .select("sink", "warc_day", "lang").distinct().count()
    )
    assert n_files <= combos * 2


def test_topk_has_no_per_query_window(spark, sf_dir):
    """Top-k ranking must be the two-phase partial top-k: a per-query
    row_number window materializes a query's ENTIRE candidate set in one task
    (|corpus| rows for brute force) — the one plan shape that cannot survive
    10^12 docs.  Gate: no Window node anywhere in the top-k plan; the partial
    stage (mapInPandas) and the slim merge aggregate are present instead."""
    from otel_semconvprocessor_spark.operators.similarity import (
        topk_brute_force,
        topk_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    for fn in (
        lambda: topk_brute_force(emb, queries, k=5),
        lambda: topk_lsh(emb, queries, k=5, bits=4, tables=2),
    ):
        plan = fn()._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert "MapInPandas" in plan, plan
        assert "partial_collect_list" in plan or "collect_list" in plan, plan


def test_band_join_shuffles_are_slim(spark, sf_dir):
    """The LSH bucket self-joins must shuffle only (id, band, key) — carrying
    the shingle arrays / vectors x bands through the join sides was the
    round-2 payload blowup.  Gate: no exchange that feeds the pair join
    carries the payload column."""
    from otel_semconvprocessor_spark.operators.dedup import minhash_lsh_pairs
    from otel_semconvprocessor_spark.operators.similarity import embedding_near_dup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for df, payload in (
        (minhash_lsh_pairs(docs, threshold=0.5), "__sh"),
        (embedding_near_dup_pairs(emb, threshold=0.9), "embedding"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln and ("band_key" in ln or "__sig" in ln):
                assert payload not in ln, ln


def test_predicate_pushdown_to_sink_scan(spark, sink_path):
    """Partition filters prune directories: a single-sink query must not list
    other sinks' files."""
    routed = spark.read.parquet(sink_path)
    q = routed.filter((F.col("sink") == "sink_http") & (F.col("lang") == "en"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition filters must mention both pruned columns
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "sink" in pf and "lang" in pf
