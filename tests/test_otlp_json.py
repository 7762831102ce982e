"""OTLP/JSON ingestion tests (S1): 3-level flatten, kind mapping, attribute
stringification, and end-to-end cascade over the ingested spans."""

import pytest
from pyspark.sql import functions as F

from otel_semconvprocessor_spark.config import reference_config
from otel_semconvprocessor_spark.operators.rules import apply_rules
from otel_semconvprocessor_spark.sources.otlp_json import (
    read_otlp_traces,
    write_synthetic_otlp_fixture,
)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("otlp") / "traces.jsonl")
    total = write_synthetic_otlp_fixture(path, n_lines=40)
    return path, total


def test_flatten_counts_and_schema(spark, fixture):
    path, total = fixture
    spans = read_otlp_traces(spark, path)
    assert spans.count() == total
    d = dict(spans.dtypes)
    assert d["attrs"] == "map<string,string>"
    assert d["resource"] == "map<string,string>"
    kinds = {r["kind"] for r in spans.select("kind").distinct().collect()}
    assert kinds <= {"internal", "server", "client", "producer", "consumer", "unspecified"}


def test_int_values_stringified(spark, fixture):
    # processor.go:253 fmt.Sprintf("%v") analogue: intValue -> string
    path, _ = fixture
    spans = read_otlp_traces(spark, path)
    rc = spans.select(F.try_element_at("attrs", F.lit("retry.count")).alias("rc")).collect()
    assert all(r["rc"] in ("0", "1", "2") for r in rc)


def test_resource_attrs_carried(spark, fixture):
    path, _ = fixture
    spans = read_otlp_traces(spark, path)
    svc = spans.select(F.try_element_at("resource", F.lit("service.name")).alias("s"))
    assert svc.filter(F.col("s").isNull()).count() == 0


def test_cascade_over_otlp_spans(spark, fixture):
    path, _ = fixture
    spans = read_otlp_traces(spark, path)
    out = apply_rules(spans, reference_config())
    hits = {r["rule_id"] for r in out.select("rule_id").distinct().collect()}
    assert "http_server_routes" in hits or "http_server_method_only" in hits
    assert "internal_operations" in hits
    # server spans with method+route must be renamed to "METHOD route"
    renamed = out.filter(F.col("rule_id") == "http_server_routes")
    for r in renamed.select("name", "attrs").collect():
        assert r["name"].split(" ", 1)[1].startswith("/api/")
        assert r["attrs"]["operation.name"] == r["name"]
