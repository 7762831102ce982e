#!/usr/bin/env python3
"""Re-measure the brute-vs-LSH top-k crossover (TOPK_CROSSOVER_PAIRS).

Each (path, corpus, queries) cell runs in its own JVM with the DataFrame
rebuilt per run (defeats shuffle-stage reuse), 1 cold + 2 warm, min-warm
reported.  Usage: python scripts/topk_crossover.py [reps:queries ...]
default cells: 10:100 50:100 (=> 20k & 100k corpus x 100 queries on sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _session():
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    return b.getOrCreate()


def worker(path: str, reps: int, n_queries: int, out_json: str) -> None:
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.operators.similarity import (
        topk_brute_force,
        topk_brute_force_pandas,
        topk_lsh,
    )

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        big = (
            emb.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
            .select((F.col("vec_id") * reps + F.col("rep")).alias("vec_id"), "embedding")
            .persist()
        )
        n = big.count()
        queries = emb.filter(F.col("vec_id") < n_queries)

        def build():
            if path == "lsh":
                return topk_lsh(big, queries, k=10, bits=8, tables=4, dim=64, query_id="query_id")
            if path == "pandas":
                return topk_brute_force_pandas(big, queries, k=10, query_id="query_id")
            return topk_brute_force(big, queries, k=10, query_id="query_id")

        def once():
            q = build()
            t0 = time.time()
            q.count()
            return time.time() - t0

        cold = once()
        warms = [once() for _ in range(2)]
        with open(out_json, "w") as f:
            json.dump({"path": path, "corpus": n, "queries": n_queries,
                       "pairs": n * n_queries, "cold": round(cold, 2),
                       "warms": [round(w, 2) for w in warms],
                       "min_warm": round(min(warms), 3)}, f)
    finally:
        spark.stop()


def main() -> None:
    cells = sys.argv[1:] or ["10:100", "50:100"]
    for cell in cells:
        reps, nq = (int(x) for x in cell.split(":"))
        for path in os.environ.get("TOPK_PATHS", "brute,lsh").split(","):
            with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
                out = tf.name
            subprocess.run(
                [sys.executable, __file__, "--worker", path, str(reps), str(nq), out],
                check=True,
            )
            with open(out) as f:
                print(json.dumps(json.load(f)))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        main()
