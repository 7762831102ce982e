#!/usr/bin/env python3
"""Fine-grained decomposition of extract_pages_native's assembly cost
(round-6 follow-up): which expression adds what on top of the k/v regex
arrays.  Same session config + staged input as scripts/prof_r06.py."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.prof_r06 import WARMS, _session, noop, stage_pages  # noqa: E402


def main():
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.operators.extract import (
        ATTR_LINE_PATTERN,
        SERVER_PATTERN,
        TRACEPARENT_PATTERN,
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

    def full_map():
        keys, vals = kv()
        entries = F.arrays_zip(keys.alias("key"), vals.alias("value"))
        deduped = F.filter(
            entries,
            lambda e, i: ~F.exists(
                F.slice(entries, i + 2, F.size(entries)),
                lambda later: later["key"] == e["key"],
            ),
        )
        return F.when(
            F.size(keys) == F.size(F.array_distinct(keys)),
            F.map_from_arrays(keys, vals),
        ).otherwise(F.map_from_entries(deduped))

    probes = {}

    # baseline: map with dup-guard CASE (shipped shape, no downstream)
    probes["map_guarded"] = lambda: noop(pages.select(full_map().alias("m")))

    # + map_filter special keys
    def p_mapfilter():
        full = full_map()
        attrs = F.map_filter(full, lambda k, _: ~k.isin(*_SPECIAL_KEYS))
        noop(pages.select(attrs.alias("a")))

    probes["map_guarded_plus_mapfilter"] = p_mapfilter

    # + try_element_at name/kind
    def p_lookups():
        full = full_map()
        attrs = F.map_filter(full, lambda k, _: ~k.isin(*_SPECIAL_KEYS))
        noop(
            pages.select(
                attrs.alias("a"),
                F.try_element_at(full, F.lit("span.name")).alias("n"),
                F.try_element_at(full, F.lit("span.kind")).alias("k"),
            )
        )

    probes["plus_lookups"] = p_lookups

    # + html-derived extras + map_concat (the _finish shape)
    def p_concat():
        full = full_map()
        attrs = F.map_filter(full, lambda k, _: ~k.isin(*_SPECIAL_KEYS))
        h = F.decode(F.col("html"), "UTF-8")
        server = F.regexp_extract(h, SERVER_PATTERN, 1)
        tp = F.regexp_extract(h, TRACEPARENT_PATTERN, 1)
        server = F.when(server != "", server)
        tp = F.when(tp != "", tp)
        extra = F.map_from_entries(
            F.filter(
                F.array(
                    F.struct(F.lit("http.server").alias("key"), server.alias("value")),
                    F.struct(F.lit("traceparent").alias("key"), tp.alias("value")),
                ),
                lambda e: e["value"].isNotNull(),
            )
        )
        empty = F.create_map().cast("map<string,string>")
        out = F.map_concat(F.coalesce(attrs, empty), extra)
        noop(
            pages.select(
                out.alias("a"),
                F.try_element_at(full, F.lit("span.name")).alias("n"),
                F.try_element_at(full, F.lit("span.kind")).alias("k"),
                F.substring(tp, 4, 32).alias("t"),
                F.substring(tp, 37, 16).alias("s"),
            )
        )

    probes["plus_concat_extras"] = p_concat

    # + domain regex + schema_url lookup (== full extract minus original cols)
    def p_all():
        from otel_semconvprocessor_spark.operators.extract import extract_pages_native

        noop(
            extract_pages_native(pages).select(
                "domain", "name", "kind", "attrs", "schema_url", "trace_id", "span_id"
            )
        )

    probes["extract_slim_cols"] = p_all

    names = sys.argv[1:] or list(probes)
    for name in names:
        fn = probes[name]
        spark.sparkContext.setJobDescription(f"prof-fine:{name}")
        walls = []
        for _ in range(WARMS):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(walls)} walls={walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
