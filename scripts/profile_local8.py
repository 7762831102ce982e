"""Stage-by-stage wall profile of the bench pipeline at one parallelism level.

Answers: where does the local[8] steady-state wall actually go, and what did
the round-5 slim sink projection buy at each stage?  Stages are cumulative
prefixes of the real bench pipeline, each materialized with the `noop` v2
sink (everything but shuffle/encode/write) or the real partitioned write:

  scan      noop(pages)                     parquet scan only
  extract   noop(extract output)            + pandas-UDF parse
  norm      noop(normalized, pre-slim)      + mapping/enrich/cascade exprs
  slim      noop(slim_for_sink(norm))       + the r5 slim projection exprs
  write     write_routed_single_pass(slim)  + repartition shuffle + parquet
  write_fat write_routed_single_pass(norm)  same, without the slim projection

Usage: python scripts/profile_local8.py [cores] [rows] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    import bench
    from otel_semconvprocessor_spark.operators.enrich import (
        default_semconv_mappings,
        lang_dim,
        mappings_table,
    )
    from otel_semconvprocessor_spark.operators.route import (
        slim_for_sink,
        write_routed_single_pass,
    )
    from otel_semconvprocessor_spark.plans.pipeline import build_normalized
    from otel_semconvprocessor_spark.operators.extract import extract_pages

    out_dir = os.environ.get("PROFILE_DIR") or "/dev/shm/semconv-profile"
    if not os.path.isdir(f"{out_dir}/pages"):
        bench.generate_input(32, ROWS, out_dir)

    spark = bench._session(CORES)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{out_dir}/pages")
    mappings_df = mappings_table(spark, default_semconv_mappings()).persist()
    mappings_df.count()
    dim = lang_dim(spark).persist()
    dim.count()
    norm = build_normalized(
        spark, pages, extractor="pandas", mappings_df=mappings_df, dims=[(dim, "lang")]
    ).drop("html", "text")
    slim = slim_for_sink(norm)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    stages = {
        "scan": lambda: noop(pages),
        "extract": lambda: noop(extract_pages(pages).drop("html", "text")),
        "norm": lambda: noop(norm),
        "slim": lambda: noop(slim),
        "write": lambda: write_routed_single_pass(slim, f"{out_dir}/sinks"),
        "write_fat": lambda: write_routed_single_pass(norm, f"{out_dir}/sinks_fat"),
    }
    walls = {k: [] for k in stages}
    # cold pass once (codegen/JIT), then interleaved reps so host-load drift
    # hits every stage equally
    for name, fn in stages.items():
        t0 = time.time()
        fn()
        print(f"cold {name}: {time.time() - t0:.2f}s", flush=True)
    for r in range(REPS):
        for name, fn in stages.items():
            t0 = time.time()
            fn()
            w = time.time() - t0
            walls[name].append(round(w, 2))
            print(f"rep{r} {name}: {w:.2f}s", flush=True)
    mins = {k: min(v) for k, v in walls.items()}
    print(json.dumps({"cores": CORES, "rows": ROWS, "mins": mins, "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
