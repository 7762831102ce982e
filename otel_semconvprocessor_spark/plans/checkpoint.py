"""Checkpoint/resume: per-partition lineage manifest + idempotent restart.

The reference is a push-based stream with no resume story; the graft's batch
pipeline must "resume from per-partition checkpoints with lineage + metrics
manifests" (BASELINE.json north_star).

Design:
  * the input is split into deterministic chunks by ``pmod(xxhash64(url),
    n_chunks)`` — seed-free, so the same row lands in the same chunk on every
    run and at every parallelism level.  In production the chunk key is the
    input partition (e.g. the warc_ts day / Iceberg file group); the hash
    chunking here keeps the mechanism testable on one flat file.
  * each chunk is written to its own ``chunk=<id>`` subtree with
    mode=overwrite — a crash mid-chunk leaves a subtree that the retry simply
    overwrites, so restarts are idempotent (no dup, no missing rows).
  * the lineage manifest (one parquet row per completed chunk: run_id, chunk,
    row_count, wall seconds, finished_at) is appended strictly AFTER the
    chunk's data commit; on restart completed chunks are anti-joined away.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Config
from ..plans.pipeline import build_normalized
from ..operators.route import assign_sink

__all__ = ["SimulatedCrash", "run_with_checkpoints", "read_manifest"]


class SimulatedCrash(RuntimeError):
    """Raised by tests to kill the run between chunk commits."""


def read_manifest(spark: SparkSession, out_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(f"{out_path}/_manifest")
    except Exception:
        return None


def completed_chunks(spark: SparkSession, out_path: str) -> set[int]:
    m = read_manifest(spark, out_path)
    if m is None:
        return set()
    return {r["chunk"] for r in m.select("chunk").distinct().collect()}


def run_with_checkpoints(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    cfg: Config | None = None,
    *,
    n_chunks: int = 8,
    run_id: str = "ckpt-0",
    extractor: str = "pandas",
    fail_after_chunk: int | None = None,
) -> list[int]:
    """Process chunk-by-chunk with resume; returns chunks processed THIS call.

    Skips chunks already in the manifest (possibly from a previous crashed
    run), overwrites any partial chunk output, and appends one manifest row
    per completed chunk.
    """
    done = completed_chunks(spark, out_path)
    chunk_of = F.pmod(F.xxhash64(F.col("url")), F.lit(n_chunks))
    processed: list[int] = []
    for chunk in range(n_chunks):
        if chunk in done:
            continue
        t0 = time.time()
        sub = pages.filter(chunk_of == chunk)
        normalized = assign_sink(build_normalized(spark, sub, cfg, extractor=extractor))
        normalized = normalized.drop("html", "text").withColumn(
            "warc_day", F.to_date(F.col("warc_ts"))
        )
        # idempotent per-chunk commit: overwrite this chunk's subtree only
        normalized.write.mode("overwrite").partitionBy("sink").parquet(
            f"{out_path}/data/chunk={chunk}"
        )
        n = spark.read.parquet(f"{out_path}/data/chunk={chunk}").count()
        manifest_row = spark.createDataFrame(
            [(run_id, chunk, n, time.time() - t0, float(time.time()))],
            "run_id string, chunk int, row_count long, wall_sec double, finished_at double",
        )
        manifest_row.write.mode("append").parquet(f"{out_path}/_manifest")
        processed.append(chunk)
        if fail_after_chunk is not None and chunk == fail_after_chunk:
            raise SimulatedCrash(f"crashed after committing chunk {chunk}")
    return processed


def read_all_output(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.option("basePath", f"{out_path}/data").parquet(f"{out_path}/data/chunk=*")
