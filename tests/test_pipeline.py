"""End-to-end pipeline tests: routed-row equality, per-sink aggregate counts
vs a pure-Python reference-faithful oracle, metrics parity, and
checkpoint/resume idempotence."""

import re

import pytest
from pyspark.sql import functions as F

from otel_semconvprocessor_spark.config import reference_config
from otel_semconvprocessor_spark.plans.checkpoint import (
    SimulatedCrash,
    read_all_output,
    run_with_checkpoints,
)
from otel_semconvprocessor_spark.plans.pipeline import build_normalized, run_pipeline
from otel_semconvprocessor_spark.sources.pages import generate_pages

N = 500


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N).cache()


# ---------------------------------------------------------------------------
# A row-at-a-time pure-Python oracle that follows processor.go literally.
# Independent of every Spark expression above — catches systematic errors that
# a Spark-vs-Spark comparison would miss (SURVEY.md §5).
# ---------------------------------------------------------------------------

_UUID = re.compile(r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}")
_HEX = re.compile(r"/[0-9a-fA-F]{16,}(/|$)")
_NUM = re.compile(r"/\d+(/|$)")
_SEL = re.compile(r"(?i)^\s*SELECT\s+.*?\s+FROM\s+([^\s]+)")
_INS = re.compile(r"(?i)^\s*INSERT\s+INTO\s+(\S+)")
_UPD = re.compile(r"(?i)^\s*UPDATE\s+(\S+)")
_DEL = re.compile(r"(?i)^\s*DELETE\s+FROM\s+(\S+)")


def _py_normalize_path(p):
    p = p.split("?", 1)[0]
    p = _UUID.sub("{id}", p)
    p = _HEX.sub(r"/{id}\1", p)
    p = _NUM.sub(r"/{id}\1", p)
    return p


def _py_clean_table(t):
    t = t.strip("`\"'[]")
    parts = t.split(".")
    if len(parts) > 1:
        t = parts[-1].strip("`\"'[]")
    return t


def _py_parse_sql(s):
    s = s.strip()
    for rx, op in ((_SEL, "SELECT"), (_INS, "INSERT"), (_UPD, "UPDATE"), (_DEL, "DELETE")):
        m = rx.match(s)
        if m:
            return f"{op} {_py_clean_table(m.group(1))}"
    parts = s.split()
    return parts[0].upper() if parts else "UNKNOWN"


def _py_eval_rule(rule_id, a, kind):
    """Evaluate one reference rule; returns (op_name, op_type) or None.
    Mirrors config.yaml:56-195 / processor.go:214-323 literally."""
    fnn = lambda *ks: next((a[k] for k in ks if k in a), None)  # noqa: E731

    def cat(parts, sep):
        return sep.join("" if p is None else p for p in parts)

    m = fnn("http.request.method", "http.method")
    if rule_id == "http_server_routes":
        if kind == "server" and m is not None and "http.route" in a:
            return cat([m, a["http.route"]], " "), "http"
    elif rule_id == "http_server_method_only":
        if kind == "server" and m is not None and "http.route" not in a:
            return cat(["HTTP", m], " "), "http"
    elif rule_id == "http_client_template":
        if kind == "client" and m is not None and "url.template" in a:
            return cat([m, a["url.template"]], " "), "http_client"
    elif rule_id == "http_client_method_only":
        if kind == "client" and m is not None and "url.template" not in a:
            return cat(["HTTP", m], " "), "http_client"
    elif rule_id == "http_client_requests":
        if kind == "client" and m is not None and "http.url" in a:
            return cat([m, a["http.url"].split("?", 1)[0]], " "), "http_client"
    elif rule_id == "http_paths":
        if m is not None and "url.path" in a:
            return cat([m, _py_normalize_path(a["url.path"])], " "), "http"
    elif rule_id == "graphql_operations":
        if "graphql.operation.type" in a and "graphql.operation.name" in a:
            return cat([a["graphql.operation.type"], a["graphql.operation.name"]], " "), "graphql"
    elif rule_id == "database_queries":
        if kind == "client" and "db.statement" in a:
            return _py_parse_sql(a["db.statement"]), a.get("db.system")
    elif rule_id == "database_operations":
        if kind == "client" and "db.operation" in a and "db.collection.name" in a:
            return cat([a["db.operation"], a["db.collection.name"]], " "), a.get("db.system")
    elif rule_id == "faas_db_trigger":
        if "faas.document.collection" in a and "faas.document.operation" in a:
            return cat([a["faas.document.collection"], a["faas.document.operation"]], " "), "faas_db_trigger"
    elif rule_id == "grpc_server_operations":
        if kind == "server" and a.get("rpc.system") == "grpc" and "rpc.method" in a:
            return cat([a.get("rpc.service"), a["rpc.method"]], "/"), "grpc"
    elif rule_id == "grpc_client_operations":
        if kind == "client" and a.get("rpc.system") == "grpc" and "rpc.method" in a:
            return cat(["grpc.client", a.get("rpc.service"), a["rpc.method"]], "/"), "grpc_client"
    elif rule_id == "messaging_with_operation":
        if kind in ("producer", "consumer") and "messaging.operation.type" in a and "messaging.destination.name" in a:
            return cat([a["messaging.operation.type"], a["messaging.destination.name"]], " "), "messaging"
    elif rule_id == "messaging_operation_name":
        if kind in ("producer", "consumer") and "messaging.operation.name" in a and "messaging.destination.name" in a:
            return cat([a["messaging.operation.name"], a["messaging.destination.name"]], " "), "messaging"
    elif rule_id == "messaging_producer":
        if kind == "producer" and a.get("messaging.operation") == "publish" and "messaging.destination.name" in a:
            return cat(["publish", a["messaging.destination.name"]], " "), "messaging"
    elif rule_id == "messaging_consumer":
        if kind == "consumer" and a.get("messaging.operation") == "process" and "messaging.destination.name" in a:
            return cat(["process", a["messaging.destination.name"]], " "), "messaging"
    elif rule_id == "messaging_system":
        if kind in ("producer", "consumer") and "messaging.system" in a and "messaging.destination.name" in a:
            return cat([a["messaging.system"], a["messaging.destination.name"]], " "), "messaging"
    elif rule_id == "internal_operations":
        if kind == "internal" and "internal.operation" in a:
            return a["internal.operation"], "internal"
    return None


_ATTR_RE = re.compile(r"^([a-z][a-z0-9._]*): (.*)$", re.MULTILINE)
_RULE_ORDER = [
    "http_server_routes", "http_server_method_only", "http_client_template",
    "http_client_method_only", "http_client_requests", "http_paths",
    "graphql_operations", "database_queries", "database_operations",
    "faas_db_trigger", "grpc_server_operations", "grpc_client_operations",
    "messaging_with_operation", "messaging_operation_name",
    "messaging_producer", "messaging_consumer", "messaging_system",
    "internal_operations",
]


def _py_pipeline(rows):
    """Full row-at-a-time oracle over raw page text: extract + cascade."""
    out = []
    for url, text in rows:
        full = dict(_ATTR_RE.findall(text))
        name = full.pop("span.name", None)
        kind = full.pop("span.kind", "unspecified")
        a = full
        if "operation.name" in a:
            out.append((url, None, None, None, name))  # skip-guarded
            continue
        result = None
        for rid in _RULE_ORDER:
            # value-expr error => skip rule: only internal_operations /
            # database_queries can "error" and their conditions preclude it
            r = _py_eval_rule(rid, a, kind)
            if r is not None:
                result = (rid, r[0], r[1])
                break
        if result is None:
            out.append((url, None, None, None, name))
        else:
            rid, op_name, op_type = result
            out.append((url, rid, op_name, op_type, op_name))  # enforce mode
    return out


def test_cascade_matches_pure_python_oracle(spark, pages):
    """Spark cascade output == reference-faithful Python oracle, per url."""
    raw = [(r["url"], r["text"]) for r in pages.select("url", "text").collect()]
    oracle = {u: (rid, op_name, op_type, final_name) for u, rid, op_name, op_type, final_name in _py_pipeline(raw)}

    got = build_normalized(spark, pages, reference_config(), extractor="pandas")
    for r in got.select("url", "rule_id", "operation_name", "operation_type", "name").collect():
        o_rid, o_name, o_type, o_final = oracle[r["url"]]
        assert r["rule_id"] == o_rid, r["url"]
        assert r["operation_name"] == o_name, r["url"]
        assert r["operation_type"] == o_type, r["url"]
        if o_rid is not None:
            assert r["name"] == o_final, r["url"]


def test_run_pipeline_end_to_end(spark, pages, tmp_path):
    res = run_pipeline(spark, pages, str(tmp_path / "out"), run_id="t1")
    assert res.rows == N
    routed = spark.read.parquet(res.sink_path)
    # routed-row equality: disjoint exhaustive sinks
    assert routed.count() == N
    sinks = {r["sink"]: r["row_count"] for r in res.metrics.sink_counts.collect()}
    assert sum(sinks.values()) == N
    assert set(sinks) <= {"sink_http", "sink_grpc", "sink_db", "sink_messaging", "sink_other"}
    # every routed row keeps its url exactly once
    assert routed.select("url").distinct().count() == N

    # partition layout on disk: sink=/warc_day=/lang=
    import os

    top = os.listdir(res.sink_path)
    assert any(d.startswith("sink=") for d in top)
    sink_http_days = os.listdir(f"{res.sink_path}/sink=sink_http")
    assert sum(d.startswith("warc_day=") for d in sink_http_days) >= 3

    # cardinality reduction really happened
    summary = res.metrics.summary.collect()[0]
    assert summary["original_name_count"] > summary["reduced_name_count"] > 0
    assert 0 < summary["reduction_pct"] < 100

    eff: dict = {}
    for r in res.metrics.rule_effectiveness.collect():
        # effectiveness is keyed by (rule_id, operation_type): sum over types
        eff[r["rule_id"]] = eff.get(r["rule_id"], 0) + r["enforced_count"]
    assert sum(eff.values()) == routed.filter(F.col("rule_id").isNotNull()).count()
    # the headline rules from BENCHMARK.md:62-73 all fire
    for rid in ("http_server_method_only", "grpc_server_operations", "database_queries",
                "http_server_routes", "internal_operations"):
        assert eff.get(rid, 0) > 0, rid


def test_sink_counts_match_python_oracle(spark, pages, tmp_path):
    raw = [(r["url"], r["text"]) for r in pages.select("url", "text").collect()]
    sink_of = {}
    for url, rid, op_name, op_type, _ in _py_pipeline(raw):
        if rid in ("database_queries", "database_operations"):
            sink_of[url] = "sink_db"
        elif op_type in ("http", "http_client"):
            sink_of[url] = "sink_http"
        elif op_type in ("grpc", "grpc_client"):
            sink_of[url] = "sink_grpc"
        elif op_type == "messaging":
            sink_of[url] = "sink_messaging"
        else:
            sink_of[url] = "sink_other"
    expected = {}
    for s in sink_of.values():
        expected[s] = expected.get(s, 0) + 1

    res = run_pipeline(spark, pages, str(tmp_path / "out2"), run_id="t2")
    got = {r["sink"]: r["row_count"] for r in res.metrics.sink_counts.collect()}
    assert got == expected


@pytest.fixture(scope="module")
def pages_path(spark, pages, tmp_path_factory):
    """File-backed pages input (the production checkpoint path is chunked by
    input file, so it needs real files — 4 of them)."""
    p = str(tmp_path_factory.mktemp("ckpt-in") / "pages")
    pages.repartition(4).write.mode("overwrite").parquet(p)
    return p


def test_checkpoint_resume_no_dup_no_missing(spark, pages_path, tmp_path):
    out = str(tmp_path / "ckpt")
    cfg = reference_config()
    with pytest.raises(SimulatedCrash):
        run_with_checkpoints(spark, pages_path, out, cfg, n_chunks=4, fail_after_chunk=1)
    # partial state: some chunks done
    partial = read_all_output(spark, out).count()
    assert 0 < partial < N
    # resume: finishes only the remaining chunks
    done_second = run_with_checkpoints(spark, pages_path, out, cfg, n_chunks=4, run_id="resume")
    assert len(done_second) == 2
    final = read_all_output(spark, out)
    assert final.count() == N
    assert final.select("url").distinct().count() == N  # no dups, none missing
    # lineage manifest records each chunk's input files
    from otel_semconvprocessor_spark.plans.checkpoint import read_manifest

    manifest = {r["chunk"]: r["files"] for r in read_manifest(spark, out).collect()}
    assert len(manifest) == 4
    assert all(".parquet" in f for f in manifest.values())


def test_checkpoint_resume_scans_only_unfinished_input(spark, pages_path, tmp_path):
    """IO assertion for single-scan resume: after the crash, make the
    COMPLETED chunks' input files unreadable — the resumed run must still
    succeed because it only reads the unfinished chunks' files."""
    import os
    import shutil

    from otel_semconvprocessor_spark.plans.checkpoint import chunk_input_files, read_manifest

    # private copy of the input (we mutate it)
    in_path = str(tmp_path / "pages-in")
    shutil.copytree(pages_path, in_path)
    out = str(tmp_path / "ckpt-io")
    with pytest.raises(SimulatedCrash):
        run_with_checkpoints(spark, in_path, out, n_chunks=4, fail_after_chunk=1)
    chunks = chunk_input_files(spark, in_path, 4)
    done = {r["chunk"] for r in read_manifest(spark, out).collect()}
    assert done == {0, 1}
    for c in done:
        for f in chunks[c]:
            local = f.replace("file:", "")
            os.rename(local, local + ".hidden")  # completed input gone
    done_second = run_with_checkpoints(spark, in_path, out, n_chunks=4, run_id="resume")
    assert sorted(done_second) == [2, 3]
    assert read_all_output(spark, out).count() == N


def test_checkpoint_rerun_is_noop(spark, pages_path, tmp_path):
    out = str(tmp_path / "ckpt2")
    run_with_checkpoints(spark, pages_path, out, n_chunks=2)
    assert run_with_checkpoints(spark, pages_path, out, n_chunks=2) == []
    assert read_all_output(spark, out).count() == N


def test_deal_files_10k_listing():
    """The pure chunking rule at production listing scale: 10k files into 64
    chunks — every file assigned exactly once, chunks balanced to +-1, and
    the assignment identical regardless of input listing order."""
    from otel_semconvprocessor_spark.plans.checkpoint import deal_files

    files = [f"s3://bucket/warc/part-{i:05d}.parquet" for i in range(10_000)]
    chunks = deal_files(files, 64)
    assert len(chunks) == 64
    sizes = {len(c) for c in chunks}
    assert sizes <= {156, 157}
    flat = [f for c in chunks for f in c]
    assert sorted(flat) == files and len(set(flat)) == len(files)
    import random

    shuffled = files[:]
    random.Random(7).shuffle(shuffled)
    assert deal_files(shuffled, 64) == chunks  # listing-order independent


def test_checkpoint_day_chunking(spark, pages, tmp_path):
    """chunk_by='day': one chunk per warc_day partition of a day-partitioned
    input; lineage carries the day; crash/resume works per day."""
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.plans.checkpoint import read_manifest

    in_path = str(tmp_path / "by-day")
    staged = pages.withColumn("warc_day", F.to_date("warc_ts"))
    staged.write.mode("overwrite").partitionBy("warc_day").parquet(in_path)
    n_days = staged.select("warc_day").distinct().count()
    assert n_days >= 3

    out = str(tmp_path / "ckpt-day")
    with pytest.raises(SimulatedCrash):
        run_with_checkpoints(spark, in_path, out, chunk_by="day", fail_after_chunk=0)
    done = run_with_checkpoints(spark, in_path, out, chunk_by="day", run_id="resume")
    assert len(done) == n_days - 1
    assert read_all_output(spark, out).count() == N
    manifest = read_manifest(spark, out)
    assert manifest.count() == n_days
    lineages = [r["files"] for r in manifest.collect()]
    assert all(l.startswith("day=") for l in lineages)
    days_in_lineage = {l.split(";")[0] for l in lineages}
    assert len(days_in_lineage) == n_days


def test_checkpoint_day_chunking_requires_partitioned_input(spark, pages_path, tmp_path):
    with pytest.raises(ValueError, match="not day-partitioned"):
        run_with_checkpoints(spark, pages_path, str(tmp_path / "x"), chunk_by="day")


def test_checkpoint_corrupt_plan_raises_not_regenerates(spark, pages_path, tmp_path):
    """A non-path-not-found failure reading _plan must PROPAGATE: silently
    regenerating from the current listing would remap chunk ids already in
    the manifest to different files (dup/missing rows on resume)."""
    import os

    out = str(tmp_path / "ckpt-corrupt")
    with pytest.raises(SimulatedCrash):
        run_with_checkpoints(spark, pages_path, out, n_chunks=4, fail_after_chunk=0)
    # corrupt the persisted plan: parquet dir exists but is unreadable
    plan_dir = f"{out}/_plan"
    for f in os.listdir(plan_dir):
        if f.endswith(".parquet"):
            with open(os.path.join(plan_dir, f), "wb") as fh:
                fh.write(b"not a parquet file")
    with pytest.raises(Exception) as ei:
        run_with_checkpoints(spark, pages_path, out, n_chunks=4, run_id="resume")
    assert "PATH_NOT_FOUND" not in str(ei.value)


def test_checkpoint_dataframe_fallback(spark, pages, tmp_path):
    """In-memory (non-file-backed) inputs hash-chunk and still resume."""
    out = str(tmp_path / "ckpt3")
    with pytest.raises(SimulatedCrash):
        run_with_checkpoints(spark, pages, out, n_chunks=2, fail_after_chunk=0)
    assert run_with_checkpoints(spark, pages, out, n_chunks=2) == [1]
    assert read_all_output(spark, out).select("url").distinct().count() == N


def test_checkpoint_late_day_appends_new_chunk(spark, pages, tmp_path):
    """A day that lands in the input AFTER the first run appends as a NEW
    chunk (fresh id, plan row appended) and is processed on the next resume;
    already-done days are not rescanned."""
    from pyspark.sql import functions as F

    from otel_semconvprocessor_spark.plans.checkpoint import read_manifest

    in_path = str(tmp_path / "late-day-in")
    staged = pages.withColumn("warc_day", F.to_date("warc_ts"))
    days = sorted(r["warc_day"] for r in staged.select("warc_day").distinct().collect())
    first, late = days[:-1], days[-1]
    staged.filter(F.col("warc_day").isin(first)).write.mode("overwrite").partitionBy(
        "warc_day"
    ).parquet(in_path)

    out = str(tmp_path / "late-day-out")
    done1 = run_with_checkpoints(spark, in_path, out, chunk_by="day", run_id="r1")
    assert len(done1) == len(first)
    n1 = read_all_output(spark, out).count()

    # the late day arrives (append to the same partitioned dir)
    staged.filter(F.col("warc_day") == late).write.mode("append").partitionBy(
        "warc_day"
    ).parquet(in_path)
    done2 = run_with_checkpoints(spark, in_path, out, chunk_by="day", run_id="r2")
    assert done2 == [len(first)]  # exactly one NEW chunk id, appended at the end
    assert read_all_output(spark, out).count() == N
    assert read_all_output(spark, out).count() > n1
    man = read_manifest(spark, out)
    assert man.count() == len(days)
    late_lineage = [r["files"] for r in man.filter(F.col("chunk") == len(first)).collect()]
    assert late_lineage and late_lineage[0].startswith(f"day={late}")


def test_checkpoint_legacy_plan_format_migrates(spark, pages_path, tmp_path):
    """A _plan written by the pre-r3 format (one row per chunk, files
    ';'-joined) must still resume — it is migrated in place, not crashed on."""
    import os

    out = str(tmp_path / "ckpt-legacy")
    with pytest.raises(SimulatedCrash):
        run_with_checkpoints(spark, pages_path, out, n_chunks=4, fail_after_chunk=1)

    # rewrite the plan in the legacy shape
    plan = spark.read.parquet(f"{out}/_plan").collect()
    by_chunk = {}
    for r in plan:
        by_chunk.setdefault(r["chunk"], []).append(r["file"])
    legacy = [(c, ";".join(sorted(fs))) for c, fs in by_chunk.items()]
    spark.createDataFrame(legacy, "chunk int, files string").write.mode(
        "overwrite"
    ).parquet(f"{out}/_plan")

    done = run_with_checkpoints(spark, pages_path, out, n_chunks=4, run_id="resume")
    assert sorted(done) == [2, 3]
    assert read_all_output(spark, out).count() == N
    # and the plan is now the current one-row-per-file format
    migrated = spark.read.parquet(f"{out}/_plan")
    assert set(migrated.columns) == {"chunk", "file", "label"}


def test_slim_for_sink_is_lossless(spark):
    """The sink projection (round-5 bandwidth work) must be exactly
    reversible: binary ids hex back to the originals; attr entries are
    dropped ONLY when equal to their materialized column, so presets and
    unusual traceparent flags survive."""
    from otel_semconvprocessor_spark.operators.route import slim_for_sink

    rows = [
        # normal enforced row: all five redundant entries dropped
        (1, "ab" * 16, "cd" * 8,
         {"traceparent": "00-" + "ab" * 16 + "-" + "cd" * 8 + "-01",
          "operation.name": "HTTP GET", "operation.type": "http",
          "name.original": "orig", "schema.url": "1.26.0", "http.server": "nginx"},
         "HTTP GET", "http", "orig", "1.26.0"),
        # preset row: attrs carry values the columns DON'T — all kept
        (2, "ef" * 16, "12" * 8,
         {"traceparent": "00-" + "ef" * 16 + "-" + "12" * 8 + "-00",  # flags differ
          "operation.name": "preset-op", "operation.type": "preset-type"},
         None, None, None, "1.26.0"),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, trace_id string, span_id string, attrs map<string,string>, "
        "operation_name string, operation_type string, name_original string, schema_url string",
    )
    out = {r["id"]: r for r in slim_for_sink(df).collect()}

    r1 = out[1]
    assert bytes(r1["trace_id"]).hex() == "ab" * 16  # binary ids reversible
    assert bytes(r1["span_id"]).hex() == "cd" * 8
    assert set(r1["attrs"]) == {"http.server"}  # redundant entries gone
    # reconstruction: coalesce(attrs[k], column) recovers the original map
    assert r1["operation_name"] == "HTTP GET" and r1["schema_url"] == "1.26.0"

    r2 = out[2]
    assert r2["attrs"]["operation.name"] == "preset-op"  # preset survives
    assert r2["attrs"]["operation.type"] == "preset-type"
    assert r2["attrs"]["traceparent"].endswith("-00")  # unusual flags survive


def test_slim_for_sink_stays_expression_only(spark):
    """The projection must not add shuffles or Python stages."""
    from otel_semconvprocessor_spark.operators.route import slim_for_sink

    df = spark.createDataFrame(
        [("a", "ab" * 16, "cd" * 8, {"k": "v"})],
        "url string, trace_id string, span_id string, attrs map<string,string>",
    )
    plan = slim_for_sink(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
