"""ExtractGrokPatterns goldens: compile-time %{SYNTAX:SEMANTIC} expansion
(functions/grok.py) + the pure-expression extraction plan through
compile_ottl.  Pattern semantics follow the public logstash-patterns-core
base table that elastic/go-grok (what ottlfuncs delegates to) also ships."""

import re

import pytest

from otel_semconvprocessor_spark.functions.grok import (
    GROK_BASE_PATTERNS,
    grok_group_names,
    grok_to_java_regex,
)
from otel_semconvprocessor_spark.functions.ottl import OTTLSyntaxError, compile_ottl

APACHE = (
    '203.0.113.9 - frank [10/Oct/2024:13:55:36 -0700] '
    '"GET /apache_pb.gif?x=1 HTTP/1.0" 200 2326 '
    '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98)"'
)


# ---- expansion unit tests (no Spark) --------------------------------------


def test_every_base_pattern_expands_to_valid_regex():
    for name in GROK_BASE_PATTERNS:
        flat = grok_to_java_regex(f"%{{{name}}}", named_captures_only=False)
        re.compile(flat)  # must be a valid (python-re ≙ RE2-compatible) regex


def test_expansion_nested_and_naming():
    flat = grok_to_java_regex("%{IPORHOST:client} %{NONNEGINT:status}")
    gi = re.compile(flat).groupindex
    assert set(gi) == {"client", "status"}
    m = re.search(flat, "web-01.example.com 404")
    assert m.group("client") == "web-01.example.com" and m.group("status") == "404"


def test_expansion_semantic_with_dots_sanitized_but_key_preserved():
    flat = grok_to_java_regex("%{WORD:http.method}")
    assert "(?P<http_method>" in flat
    assert grok_group_names("%{WORD:http.method}") == {"http_method": "http.method"}


def test_expansion_rejects_unknown_cycle_coercion():
    with pytest.raises(ValueError):
        grok_to_java_regex("%{NOSUCHPATTERN:x}")
    with pytest.raises(ValueError):
        grok_to_java_regex("%{NUMBER:n:float}")
    with pytest.raises(ValueError):
        grok_to_java_regex("%{SELF}", _table={"SELF": "a%{SELF}b"})


def test_bare_reference_captures_only_when_asked():
    assert re.compile(grok_to_java_regex("%{LOGLEVEL}")).groupindex == {}
    gi = re.compile(
        grok_to_java_regex("%{LOGLEVEL}", named_captures_only=False)
    ).groupindex
    assert set(gi) == {"LOGLEVEL"}


def test_combined_apache_log_expansion():
    flat = grok_to_java_regex("%{COMBINEDAPACHELOG}")
    m = re.search(flat, APACHE)
    assert m is not None
    assert m.group("clientip") == "203.0.113.9"
    assert m.group("verb") == "GET"
    assert m.group("request") == "/apache_pb.gif?x=1"
    assert m.group("response") == "200"
    assert m.group("bytes") == "2326"
    assert m.group("agent") == '"Mozilla/4.08 [en] (Win98)"'


# ---- Spark extraction through the engine ----------------------------------


def test_grok_extract_apache_line(spark):
    df = spark.createDataFrame([(1, APACHE), (2, "not a log line"), (3, None)],
                               "id long, line string")
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id",
            compile_ottl(
                'ExtractGrokPatterns(name, "%{COMBINEDAPACHELOG}")', name_col="line"
            ).alias("v"),
        ).collect()
    }
    assert got[1]["clientip"] == "203.0.113.9"
    assert got[1]["timestamp"] == "10/Oct/2024:13:55:36 -0700"
    assert got[1]["response"] == "200" and got[1]["bytes"] == "2326"
    assert got[2] is None  # parse failure errors upstream -> NULL
    assert got[3] is None


def test_grok_extract_custom_pattern_and_chaining(spark):
    df = spark.createDataFrame(
        [(1, "2024-10-10T13:55:36Z ERROR user=frank ip=203.0.113.9")],
        "id long, line string",
    )
    expr = (
        'ExtractGrokPatterns(name, '
        '"%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} user=%{USER:user} ip=%{IPV4:ip}")'
    )
    row = df.select(
        compile_ottl(expr, name_col="line").alias("m"),
        compile_ottl(f'{expr}["level"]', name_col="line").alias("lvl"),
        compile_ottl(
            f'UnixSeconds(Time({expr}["ts"], "%Y-%m-%dT%H:%M:%S%z"))', name_col="line"
        ).alias("epoch"),
    ).collect()[0]
    assert row["m"]["ip"] == "203.0.113.9" and row["m"]["user"] == "frank"
    assert row["lvl"] == "ERROR"
    import calendar

    assert row["epoch"] == calendar.timegm((2024, 10, 10, 13, 55, 36))


def test_grok_compile_rejections():
    for bad in (
        'ExtractGrokPatterns(name, "%{NOPE:x}")',
        'ExtractGrokPatterns(name, "%{NUMBER:n:int}")',
        'ExtractGrokPatterns(name, "%{NUMBER}")',  # captures nothing
        'ExtractGrokPatterns(name, name)',  # non-literal pattern
    ):
        with pytest.raises(OTTLSyntaxError):
            compile_ottl(bad)
