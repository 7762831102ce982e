#!/usr/bin/env python3
"""A/B the _finish extras build: shipped interpreted-HOF form
(map_from_entries(filter(array(...)))) vs a pure-codegen
create_map/map_concat form.  Full extract_pages_native shape both sides;
interleaved rounds; output-identity asserted in the same session."""

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
        SERVER_PATTERN,
        TRACEPARENT_PATTERN,
        _SPECIAL_KEYS,
        extract_pages_native,
    )

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    pages = stage_pages(spark)

    def extract_codegen_extras(df):
        text = F.col("text")
        html_text = F.decode(F.col("html"), "UTF-8")
        keys = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 1)
        vals = F.regexp_extract_all(text, F.lit(ATTR_LINE_PATTERN), 2)
        entries = F.arrays_zip(keys.alias("key"), vals.alias("value"))
        deduped = F.filter(
            entries,
            lambda e, i: ~F.exists(
                F.slice(entries, i + 2, F.size(entries)),
                lambda later: later["key"] == e["key"],
            ),
        )
        full = F.when(
            F.size(keys) == F.size(F.array_distinct(keys)),
            F.map_from_arrays(keys, vals),
        ).otherwise(F.map_from_entries(deduped))
        attrs0 = F.map_filter(full, lambda k, _: ~k.isin(*_SPECIAL_KEYS))
        server = F.regexp_extract(html_text, SERVER_PATTERN, 1)
        traceparent = F.regexp_extract(html_text, TRACEPARENT_PATTERN, 1)
        server = F.when(server != "", server)
        tp = F.when(traceparent != "", traceparent)
        empty = F.create_map().cast("map<string,string>")
        extra = F.map_concat(
            F.when(server.isNotNull(), F.create_map(F.lit("http.server"), server)).otherwise(empty),
            F.when(tp.isNotNull(), F.create_map(F.lit("traceparent"), tp)).otherwise(empty),
        )
        attrs = F.map_concat(F.coalesce(attrs0, empty), extra)
        return df.withColumns(
            {
                "domain": F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1),
                "name": F.try_element_at(full, F.lit("span.name")),
                "kind": F.coalesce(F.try_element_at(full, F.lit("span.kind")), F.lit("unspecified")),
                "attrs": attrs,
                "schema_url": F.try_element_at(attrs, F.lit("schema.url")),
                "trace_id": F.substring(tp, 4, 32),
                "span_id": F.substring(tp, 37, 16),
            }
        )

    def v_shipped():
        noop(extract_pages_native(pages))

    def v_codegen():
        noop(extract_codegen_extras(pages))

    variants = {"shipped": v_shipped, "codegen_extras": v_codegen}
    walls = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"finish-ab:{name}:r{r}")
            t0 = time.time()
            fn()
            walls[name].append(round(time.time() - t0, 3))
    for name, ws in walls.items():
        print(f"{name}: min={min(ws)} walls={ws}", flush=True)

    # identity check on a deterministic sample
    a = extract_pages_native(pages).orderBy("url").limit(20000)
    b = extract_codegen_extras(pages).orderBy("url").limit(20000)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"identity_diff_rows={diff}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
