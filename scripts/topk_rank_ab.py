#!/usr/bin/env python3
"""A/B: old window-based top-k rank vs the two-phase partial top-k at a
100k-vector corpus (the scale regime the window form could not survive).

Old form = row_number() OVER (PARTITION BY query_id ORDER BY score, id):
every scored candidate row of a query lands in ONE task.  New form =
per-batch partial top-k (mapInPandas) + slim merge aggregate.  Both run the
same brute-force scorer; results are asserted identical.

Usage: python scripts/topk_rank_ab.py   (quiet machine; own JVM per side)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 50
N_QUERIES = 10


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


def _rank_topk_window(scored, k, query_id, id_col):
    """The round-2 implementation, verbatim shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, F.round("score", 6).alias("score"), "rank")
    )


def worker(side: str, out_json: str) -> None:
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.operators import similarity

    if side == "window":
        similarity._rank_topk = _rank_topk_window

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        big = (
            emb.crossJoin(spark.range(REPS).select(F.col("id").alias("rep")))
            .select((F.col("vec_id") * REPS + F.col("rep")).alias("vec_id"), "embedding")
            .persist()
        )
        n = big.count()
        queries = emb.filter(F.col("vec_id") < N_QUERIES)

        def once():
            # build the DataFrame fresh each run: re-collecting the SAME
            # DataFrame object lets the DAGScheduler skip already-computed
            # shuffle map stages (cached QueryExecution -> same RDDs), which
            # times only the last stage
            q = similarity.topk_brute_force(big, queries, k=10, query_id="query_id")
            t0 = time.time()
            rows = sorted(tuple(r) for r in q.collect())
            return time.time() - t0, rows

        cold, rows = once()
        warms = []
        for _ in range(3):
            w, r2 = once()
            warms.append(w)
            assert r2 == rows
        with open(out_json, "w") as f:
            json.dump(
                {
                    "side": side,
                    "corpus": n,
                    "queries": N_QUERIES,
                    "cold": round(cold, 2),
                    "warms": [round(w, 2) for w in warms],
                    "min_warm": round(min(warms), 3),
                    "result_rows": len(rows),
                    "result_digest": __import__("hashlib").md5(repr(rows).encode()).hexdigest(),
                },
                f,
            )
    finally:
        spark.stop()


def main() -> None:
    import tempfile

    results = {}
    for side in ("window", "twophase"):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out = tf.name
        subprocess.run([sys.executable, __file__, "--worker", side, out], check=True)
        with open(out) as f:
            results[side] = json.load(f)
        print(json.dumps(results[side]))
    same = results["window"]["result_digest"] == results["twophase"]["result_digest"]
    print(json.dumps({"results_identical": same}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3])
    else:
        main()
