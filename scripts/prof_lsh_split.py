#!/usr/bin/env python3
"""Split topk_lsh bench-shape wall into: dim probe, plan construction,
analysis, execution.  Bench shapes: topk_lsh (bits=4 tables=8, dim probed)
and topk_lsh_5x (bits=8 tables=4, dim passed)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.prof_r06 import _session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("PROF_ROUNDS", "3"))


def main():
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.operators.similarity import topk_lsh

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)

    for r in range(ROUNDS):
        t0 = time.time()
        d = len(emb.select("embedding").first()[0])
        t1 = time.time()
        df = topk_lsh(emb, queries, k=10, bits=4, tables=8, dim=d)
        t2 = time.time()
        df.schema  # force analysis
        t3 = time.time()
        df.count()
        t4 = time.time()
        print(
            f"topk_lsh r{r}: dim_probe={t1-t0:.3f} construct={t2-t1:.3f} "
            f"analyze={t3-t2:.3f} execute={t4-t3:.3f} total={t4-t0:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
