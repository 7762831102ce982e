"""Route stage: fan-out of the normalized stream to per-sink tables.

Reference analogue: the collector service wiring one processed stream into
multiple exporters (config.yaml:218-232, S4) and the batch processor sizing
batches (config.yaml:12-14, S5).

Two write strategies:

  * ``write_routed_single_pass`` (default): ONE job writes every sink —
    ``partitionBy(sink, warc_day, lang)`` — so the expensive upstream
    (pandas-UDF extraction) runs exactly once and nothing is cached.  At
    100 TB this is the only sane plan: no persist of the full dataset, no
    per-sink recompute; each sink is a partition subtree (≡ an Iceberg table
    partitioned by days(warc_ts), lang).
  * ``write_per_sink_tables``: persist + one filtered write per sink, for
    genuinely separate destination tables (Iceberg ``writeTo`` in prod).

Skew: domains are Zipf-distributed (one hot domain ~50% of rows), so any
repartition keyed by domain alone would put half the data in one task.
``salted_repartition`` adds a deterministic salt derived from xxhash64(url) —
reproducible across runs, unlike rand() — bounding the largest task at
~1/salt_buckets of the hot key (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tuning import ensure_jit_codegen

__all__ = [
    "SINKS",
    "SINK_REDUNDANT_ATTR_KEYS",
    "assign_sink",
    "route_predicates",
    "salt_expr",
    "salted_repartition",
    "slim_for_sink",
    "write_routed_single_pass",
    "write_per_sink_tables",
]

SINKS = ["sink_http", "sink_grpc", "sink_db", "sink_messaging", "sink_other"]


def sink_expr(op_type: Column, rule_id: Column) -> Column:
    """Disjoint, exhaustive sink assignment (FIXTURES.md §5): every row gets
    exactly one sink, so per-sink counts sum to the total (routed-row
    equality)."""
    return (
        F.when(rule_id.isin("database_queries", "database_operations"), F.lit("sink_db"))
        .when(op_type.isin("http", "http_client"), F.lit("sink_http"))
        .when(op_type.isin("grpc", "grpc_client"), F.lit("sink_grpc"))
        .when(op_type == "messaging", F.lit("sink_messaging"))
        .otherwise(F.lit("sink_other"))
    )


def assign_sink(df: DataFrame) -> DataFrame:
    return df.withColumn("sink", sink_expr(F.col("operation_type"), F.col("rule_id")))


def route_predicates() -> dict[str, Column]:
    """Per-sink filter predicates for the separate-tables strategy."""
    s = sink_expr(F.col("operation_type"), F.col("rule_id"))
    return {sink: s == sink for sink in SINKS}


def salt_expr(source: Column, salt_buckets: int, hash_fn: str = "xxhash64") -> Column:
    """The deterministic salt bucket: hash(source) % salt_buckets.  Seed-free
    (rand() would break resume replays).  ``md5`` mode is engine-portable so
    the bucketization rule itself is DuckDB-oracle-checkable; ``xxhash64``
    (default) is the fast JVM path used by the writes."""
    from .exporters import sample_hash

    return sample_hash(source, salt_buckets, hash_fn)


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, salt_buckets: int = 16,
    salt_source: str = "url", hash_fn: str = "xxhash64"
) -> DataFrame:
    """Repartition on (key, salt) — spreads a hot key over salt_buckets
    tasks."""
    return df.repartition(
        num_partitions, F.col(key), salt_expr(F.col(salt_source), salt_buckets, hash_fn)
    )


def _with_day(df: DataFrame) -> DataFrame:
    return df.withColumn("warc_day", F.to_date(F.col("warc_ts")))


#: attr-map keys that duplicate top-level sink columns (the enforce mode
#: materializes operation.* / name.original as columns; schema.url duplicates
#: schema_url; traceparent = "00-{trace_id}-{span_id}-01" duplicates the id
#: columns).  ``slim_for_sink`` drops an entry only when its value is EXACTLY
#: reconstructible from those columns on that row, so the projection is
#: lossless on any data (a preset operation.name with no matching column, or
#: a traceparent with unusual flags, is kept).
SINK_REDUNDANT_ATTR_KEYS = [
    "traceparent",
    "operation.name",
    "operation.type",
    "name.original",
    "schema.url",
]

_ATTR_TO_COLUMN = {
    "operation.name": "operation_name",
    "operation.type": "operation_type",
    "name.original": "name_original",
    "schema.url": "schema_url",
}


def slim_for_sink(df: DataFrame, *, binary_ids: bool = True,
                  dedup_attrs: bool = True) -> DataFrame:
    """Information-preserving sink projection, applied BEFORE the write-side
    repartition so the shuffle payload shrinks with the files.

    At 10^12 rows the sink bytes/sec IS the pipeline's bandwidth bill:

      * ``trace_id``/``span_id`` hex strings -> raw BINARY (``unhex``) — the
        OTLP-native representation (the protobuf wire carries 16/8 raw
        bytes; hex doubles them, and random bytes don't compress either
        way).  Measured: those two columns are ~29% of the sink bytes as
        hex.
      * per-row attr entries whose value EQUALS what the top-level columns
        already record are filtered out — don't store the same value twice
        per row.  The attrs map was the single widest sink column (~36%)
        and the traceparent string alone is 55 chars/row.  The comparison
        is per row, so presets that DIFFER from the columns survive; reading
        back, ``coalesce(attrs['operation.name'], operation_name)`` etc.
        recovers the original map exactly.

    Measured together: 161 MB -> 89 MB sink bytes at 1M rows (45% less
    memory-bus traffic through shuffle + parquet encode + tmpfs write).
    """
    out = df
    if dedup_attrs and "attrs" in out.columns:
        def entry_is_dup(k, v):
            cond = F.lit(False)
            if "trace_id" in df.columns and "span_id" in df.columns:
                tp_recon = F.concat_ws(
                    "-", F.lit("00"), F.col("trace_id"), F.col("span_id"), F.lit("01")
                )
                cond = cond | ((k == "traceparent") & (v == tp_recon))
            for attr_key, col_name in _ATTR_TO_COLUMN.items():
                if col_name in df.columns:
                    cond = cond | ((k == attr_key) & v.eqNullSafe(F.col(col_name)))
            return cond

        out = out.withColumn(
            "attrs", F.map_filter("attrs", lambda k, v: ~entry_is_dup(k, v))
        )
    if binary_ids:
        for c in ("trace_id", "span_id"):
            if c in out.columns:
                out = out.withColumn(c, F.unhex(F.col(c)))
    return out


def write_routed_single_pass(
    df: DataFrame,
    base_path: str,
    mode: str = "overwrite",
    *,
    files_per_partition: int = 1,
    salt_source: str = "url",
) -> None:
    """One job, all sinks: partition layout sink=/warc_day=/lang=.

    Equivalent Iceberg DDL (prod): CREATE TABLE sink_x ... PARTITIONED BY
    (days(warc_ts), lang); here each sink subtree is one such table.

    The explicit repartition on the partition columns is load-bearing: a
    naive ``partitionBy`` write makes EVERY task open a writer for every
    (sink, day, lang) combo it sees — O(tasks x combos) tiny files plus a
    per-task sort (measured 5x slower and 30x more files at local[32]).
    One hash shuffle on the partition key brings it to O(combos x
    files_per_partition) right-sized files.  Raise ``files_per_partition``
    when single partitions exceed executor-friendly sizes (the hot-domain /
    hot-day skew case): the deterministic url-hash salt spreads each combo
    over that many writers.
    """
    ensure_jit_codegen(df.sparkSession)
    routed = _with_day(assign_sink(df))
    salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(max(1, files_per_partition)))
    routed = routed.repartition(
        F.col("sink"), F.col("warc_day"), F.col("lang"), salt
    )
    routed.write.mode(mode).partitionBy("sink", "warc_day", "lang").parquet(base_path)


def write_per_sink_tables(
    df: DataFrame,
    base_path: str | None = None,
    mode: str = "overwrite",
    *,
    catalog=None,
) -> dict[str, str]:
    """Separate-tables strategy: persist the normalized frame once, then one
    filtered write per sink table — the Iceberg ``df.filter(pred).writeTo``
    shape, routed through the SinkCatalog abstraction (sources/catalog.py):
    pass an ``IcebergCatalog`` in prod, default ``ParquetDirCatalog`` here.
    Avoids recomputing the extraction UDF per sink (SURVEY.md §4 'the one
    place naive Spark recomputes').

    ``mode``: ``overwrite`` (create_or_replace) or ``append`` only — catalog
    table semantics have no non-destructive 'error'/'ignore' analogue, so any
    other mode raises instead of silently overwriting.  Returns {sink:
    catalog table name} (since the catalog refactor; was {sink: path})."""
    from ..sources.catalog import ParquetDirCatalog

    if mode not in ("overwrite", "append"):
        raise ValueError(
            f"unsupported mode {mode!r}: write_per_sink_tables supports "
            "'overwrite' or 'append' (catalog tables have no error/ignore mode)"
        )
    if catalog is None:
        assert base_path is not None, "pass base_path or a catalog"
        catalog = ParquetDirCatalog(base_path)
    routed = _with_day(assign_sink(df)).persist()
    tables = {}
    try:
        for sink in SINKS:
            sub = routed.filter(F.col("sink") == sink).drop("sink")
            if mode == "append":
                catalog.append(sub, sink, ["warc_day", "lang"])
            else:
                catalog.create_or_replace(sub, sink, ["warc_day", "lang"])
            tables[sink] = sink
    finally:
        routed.unpersist()
    return tables
