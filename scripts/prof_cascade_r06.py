#!/usr/bin/env python3
"""Round-6 cascade decomposition: what the 18-rule CASE chain itself costs
on a persisted, pre-extracted 1M-row input."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from scripts.prof_r06 import _session, stage_pages, noop  # noqa: E402


def main():
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.config import reference_config
    from otel_semconvprocessor_spark.operators.extract import extract_pages_native
    from otel_semconvprocessor_spark.operators.rules import apply_rules
    from otel_semconvprocessor_spark.functions.scalars import attr

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    pages = stage_pages(spark)
    cfg = reference_config()
    pre = extract_pages_native(pages).select("url", "name", "kind", "attrs").persist()
    pre.count()

    def bench(name, fn, warms=3):
        walls = []
        for _ in range(warms):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(walls)} walls={walls}", flush=True)

    bench("pre_noop", lambda: noop(pre))
    bench("pre_groupby_kind", lambda: pre.groupBy("kind").count().collect())
    # single map probe
    bench(
        "probe_1key",
        lambda: pre.groupBy(attr(F.col("attrs"), "http.method").isNull()).count().collect(),
    )
    # all 26 probes as one struct
    keys = [
        "operation.name", "http.request.method", "http.method", "http.route",
        "url.template", "http.url", "url.path", "graphql.operation.type",
        "graphql.operation.name", "db.statement", "db.system", "db.operation",
        "db.collection.name", "faas.document.collection", "faas.document.operation",
        "rpc.system", "rpc.service", "rpc.method", "messaging.operation.type",
        "messaging.operation.name", "messaging.operation", "messaging.system",
        "messaging.destination.name", "internal.operation",
    ]
    bench(
        "probe_24keys_hashagg",
        lambda: pre.select(
            F.struct(*[attr(F.col("attrs"), k).isNull().alias(f"k{i}") for i, k in enumerate(keys)]).alias("s")
        ).select(F.count(F.lit(1)), F.sum(F.when(F.col("s.k0"), 1).otherwise(0))).collect(),
    )
    bench(
        "cascade_groupby",
        lambda: apply_rules(pre, cfg).groupBy("rule_id").count().collect(),
    )
    # rule_id only, no groupBy shuffle: noop over the single column
    bench(
        "cascade_ruleid_noop",
        lambda: noop(apply_rules(pre, cfg).select("rule_id")),
    )
    # full output incl. finish_match map rebuild
    bench("cascade_full_noop", lambda: noop(apply_rules(pre, cfg)))
    spark.stop()


if __name__ == "__main__":
    main()
