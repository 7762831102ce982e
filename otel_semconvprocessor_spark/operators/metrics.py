"""Aggregate stage: the reference's observability metrics (M1-M8,
metadata.yaml:32-90) as distributed aggregations over the normalized frame.

The reference keeps process-global ``map[string]int64`` counters filled
per-span (processor.go:32-33,193-200,312-319); here every metric is a groupBy
/ agg over columns, so it distributes and is exact at any scale (with
``approx_count_distinct`` available as the 10^12-cardinality escape hatch).

Original-name recovery: in enforce+preserve mode the pre-rule name is
``coalesce(name_original, name)`` — name_original is only written when the
name changed (processor.go:290), and unchanged/unmatched rows keep the
original in ``name``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import MODE_ENFORCE, Config

__all__ = [
    "original_name_col",
    "rule_effectiveness",
    "cardinality_summary",
    "metrics_manifest",
    "sliding_window_counts",
]


def sliding_window_counts(
    df: DataFrame,
    ts_col: str = "ts",
    *,
    window: str = "7 days",
    slide: str = "1 day",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Sliding event-time windows (the batch form of the streaming windowed
    counters, SURVEY.md §2.4/S5): count + value sum per (window start, keys).

    Uses the built-in ``window()`` generator — each row lands in
    window/slide overlapping windows (7 here), all expression work before
    one groupBy shuffle; epoch-aligned UTC window starts, so results are
    engine-reproducible (DuckDB oracle re-derives membership as the 7
    calendar days ending at date(ts))."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 3).alias("total_value"))
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("__w"), *keys)
        .agg(*aggs)
        .select(F.to_date("__w.start").alias("win_start"), *keys, "n",
                *(["total_value"] if value_col is not None else []))
    )


def original_name_col(cfg: Config) -> Column:
    if cfg.span_processing.mode == MODE_ENFORCE and cfg.span_processing.preserve_original_name:
        return F.coalesce(F.col("name_original"), F.col("name"))
    if cfg.span_processing.mode == MODE_ENFORCE:
        # without preserve_original_name the original is unrecoverable for
        # matched rows, same information loss as the reference
        return F.when(F.col("rule_id").isNull(), F.col("name"))
    return F.col("name")


def rule_effectiveness(normalized: DataFrame, cfg: Config) -> DataFrame:
    """M2: ``span_names_enforced`` counter by (rule_id, operation_type, mode)
    (processor.go:277-282,304-309) — the BENCHMARK.md:62-73 table.

    Label parity: the reference records operation_type as "" when the type
    expression was absent or errored (processor.go:256-262)."""
    return (
        normalized.filter(F.col("rule_id").isNotNull())
        .groupBy(
            F.col("rule_id"),
            F.coalesce(F.col("operation_type"), F.lit("")).alias("operation_type"),
        )
        .agg(F.count(F.lit(1)).alias("enforced_count"))
        .withColumn("mode", F.lit(cfg.span_processing.mode))
    )


def cardinality_summary(normalized: DataFrame, cfg: Config, *, approx: bool = False) -> DataFrame:
    """M1 + M4-M7: spans processed, original/reduced unique name counts and
    the reduction percentage (processor.go:154-157,378-395).

    M5 parity: reduced counts ONLY rule-matched spans (operationCount is
    filled after a match, processor.go:312-319).
    """
    orig = original_name_col(cfg)
    matched_op = F.when(F.col("rule_id").isNotNull(), F.col("operation_name"))
    cd = F.approx_count_distinct if approx else F.countDistinct
    out = normalized.agg(
        F.count(F.lit(1)).alias("spans_processed"),
        cd(orig).alias("original_name_count"),
        cd(matched_op).alias("reduced_name_count"),
    )
    return out.withColumn(
        "reduction_pct",
        F.when(
            F.col("original_name_count") > 0,
            (F.col("original_name_count") - F.col("reduced_name_count"))
            / F.col("original_name_count")
            * 100.0,
        ).otherwise(F.lit(0.0)),
    )


@dataclass
class MetricsManifest:
    summary: DataFrame  # one row
    rule_effectiveness: DataFrame
    sink_counts: DataFrame


def metrics_manifest(
    normalized: DataFrame,
    cfg: Config,
    *,
    run_id: str,
    duration_ms: float | None = None,
    approx: bool = False,
) -> MetricsManifest:
    """The aggregate-stage output bundle (FIXTURES.md §6).  ``normalized``
    should be the routed frame (with ``sink``) read back from the sink write —
    metrics then re-scan only the few columns they need (column pruning)
    instead of caching the full dataset."""
    summary = (
        cardinality_summary(normalized, cfg, approx=approx)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("duration_ms", F.lit(duration_ms).cast("double"))
    )
    effectiveness = rule_effectiveness(normalized, cfg).withColumn("run_id", F.lit(run_id))
    sink_col = F.col("sink") if "sink" in normalized.columns else F.lit("all")
    sink_counts = (
        normalized.groupBy(sink_col.alias("sink"))
        .agg(F.count(F.lit(1)).alias("row_count"))
        .withColumn("run_id", F.lit(run_id))
    )
    return MetricsManifest(summary, effectiveness, sink_counts)
