#!/usr/bin/env python3
"""Isolate the cost of extract's dup-guard CASE: guard condition vs the
interpreted fallback branch vs map_filter.  Interleaved rounds so every
variant samples every load window (A/B discipline from scripts/ab_*.py)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.prof_r06 import _session, noop, stage_pages  # noqa: E402

ROUNDS = int(os.environ.get("PROF_ROUNDS", "4"))


def main():
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.operators.extract import (
        ATTR_LINE_PATTERN,
        _SPECIAL_KEYS,
    )

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    pages = stage_pages(spark)
    text = F.col("text")

    def kv():
        keys = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 1)
        vals = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 2)
        return keys, vals

    def deduped_of(keys, vals):
        entries = F.arrays_zip(keys.alias("key"), vals.alias("value"))
        return F.filter(
            entries,
            lambda e, i: ~F.exists(
                F.slice(entries, i + 2, F.size(entries)),
                lambda later: later["key"] == e["key"],
            ),
        )

    def v_bare():
        keys, vals = kv()
        noop(pages.select(F.map_from_arrays(keys, vals).alias("m")))

    def v_guard_null():
        keys, vals = kv()
        m = F.when(
            F.size(keys) == F.size(F.array_distinct(keys)),
            F.map_from_arrays(keys, vals),
        )
        noop(pages.select(m.alias("m")))

    def v_guard_full():
        keys, vals = kv()
        m = F.when(
            F.size(keys) == F.size(F.array_distinct(keys)),
            F.map_from_arrays(keys, vals),
        ).otherwise(F.map_from_entries(deduped_of(keys, vals)))
        noop(pages.select(m.alias("m")))

    def v_bare_mapfilter():
        keys, vals = kv()
        m = F.map_from_arrays(keys, vals)
        noop(pages.select(F.map_filter(m, lambda k, _: ~k.isin(*_SPECIAL_KEYS)).alias("m")))

    variants = {
        "bare": v_bare,
        "guard_null": v_guard_null,
        "guard_full": v_guard_full,
        "bare_mapfilter": v_bare_mapfilter,
    }
    walls = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"guard-ab:{name}:r{r}")
            t0 = time.time()
            fn()
            walls[name].append(round(time.time() - t0, 3))
    for name, ws in walls.items():
        print(f"{name}: min={min(ws)} walls={ws}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
