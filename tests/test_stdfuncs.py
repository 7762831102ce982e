"""Per-function goldens for the round-5 OTTL standard-function additions
(functions/stdfuncs.py + their compile_ottl dispatch).  Semantics mirror the
public opentelemetry-collector-contrib pkg/ottl/ottlfuncs converters — the
reference merges that whole registry (ottl_functions.go:19) — with the
engine's error-as-null model for nil/unparseable inputs."""

import pytest

from otel_semconvprocessor_spark.functions.ottl import (
    OTTLSyntaxError,
    SUPPORTED_FUNCTIONS,
    compile_ottl,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "simpleString", {"k": "v one", "dur": "1h30m", "n": "42"}),
        (2, "HTTPServer", {"k": "x-y-z", "dur": "300ms", "n": "3.14"}),
        (3, "test_case word", {"dur": "bogus", "json": '{"a": 1, "b": "t", "c": {"d": 2}}'}),
        (4, None, {"dur": "-2s", "n": "-7"}),
        (5, "v2Count", {"dur": "0", "n": "notanint"}),
    ]
    return spark.createDataFrame(rows, "id long, name string, attrs map<string,string>").cache()


def _col(frame, expr):
    return {r["id"]: r["v"] for r in frame.select("id", compile_ottl(expr).alias("v")).collect()}


# ---- ConvertCase snake / camel -------------------------------------------


def test_convert_case_snake(frame):
    got = _col(frame, 'ConvertCase(name, "snake")')
    assert got[1] == "simple_string"
    assert got[2] == "http_server"  # acronym treated as one word (strcase.ToSnake)
    assert got[3] == "test_case_word"
    assert got[4] is None
    assert got[5] == "v_2_count"  # letter<->digit boundaries split (strcase)


def test_convert_case_camel(frame):
    got = _col(frame, 'ConvertCase(name, "camel")')
    assert got[1] == "SimpleString"
    assert got[3] == "TestCaseWord"
    assert got[4] is None
    assert got[5] == "V2Count"


def test_convert_case_snake_camel_round_trip(frame):
    got = _col(frame, 'ConvertCase(ConvertCase(name, "snake"), "camel")')
    assert got[1] == "SimpleString" and got[3] == "TestCaseWord"


# ---- Split / Trim ---------------------------------------------------------


def test_split(frame):
    got = _col(frame, 'Split(attributes["k"], "-")')
    assert got[2] == ["x", "y", "z"]
    assert got[1] == ["v one"]  # no delimiter -> single element (strings.Split)
    assert got[3] is None  # nil target errors upstream -> NULL
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Split(name, "")')
    with pytest.raises(OTTLSyntaxError):
        compile_ottl("Split(name, name)")


def test_split_delimiter_is_literal_not_regex(spark):
    df = spark.createDataFrame([("a.b.c",)], "s string")
    got = df.select(
        compile_ottl('Split(name, ".")', name_col="s").alias("v")
    ).first()["v"]
    assert got == ["a", "b", "c"]  # '.' must not match-any


def test_trim(spark):
    df = spark.createDataFrame([("  padded  ", "xxhixx")], "a string, b string")
    r = df.select(
        compile_ottl("Trim(name)", name_col="a").alias("t1"),
        compile_ottl('Trim(name, "x")', name_col="b").alias("t2"),
    ).first()
    assert r["t1"] == "padded"
    assert r["t2"] == "hi"
    with pytest.raises(OTTLSyntaxError):
        compile_ottl("Trim(name, name)")


# ---- ReplacePattern / ReplaceAllPatterns ---------------------------------


def test_replace_pattern_group_refs(spark):
    df = spark.createDataFrame([("GET /user/123/cart",), (None,)], "s string")
    got = [
        r["v"]
        for r in df.select(
            compile_ottl(
                'ReplacePattern(name, "/user/(\\\\d+)", "/user/{id=$1}")', name_col="s"
            ).alias("v")
        ).collect()
    ]
    assert got == ["GET /user/{id=123}/cart", None]
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('ReplacePattern(name, "(unclosed", "x")')


def test_replace_pattern_literal_dollar(spark):
    df = spark.createDataFrame([("price 5",)], "s string")
    got = df.select(
        compile_ottl('ReplacePattern(name, "price", "cost$$")', name_col="s").alias("v")
    ).first()["v"]
    assert got == "cost$ 5"


def test_replace_all_patterns_values(frame):
    got = _col(frame, 'ReplaceAllPatterns(attributes, "value", "-", "_")')
    assert got[2]["k"] == "x_y_z"
    assert got[2]["dur"] == "300ms"  # untouched values pass through


def test_replace_all_patterns_keys(frame):
    got = _col(frame, 'ReplaceAllPatterns(attributes, "key", "^k$", "key")')
    assert "key" in got[1] and "k" not in got[1]
    assert got[1]["key"] == "v one"


def test_replace_all_patterns_rejects_bad_args():
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('ReplaceAllPatterns(name, "value", "a", "b")')
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('ReplaceAllPatterns(attributes, "both", "a", "b")')


# ---- type converters ------------------------------------------------------


def test_int_converter(frame):
    got = _col(frame, 'Int(attributes["n"])')
    assert got[1] == 42 and got[4] == -7
    assert got[2] is None  # "3.14": ParseInt fails upstream -> error -> nil
    assert got[5] is None  # "notanint"
    assert got[3] is None  # missing key


def test_double_converter(frame):
    got = _col(frame, 'Double(attributes["n"])')
    assert got[1] == 42.0 and got[2] == 3.14
    assert got[5] is None


def test_string_converter(frame):
    got = _col(frame, "String(Len(name))")
    assert got[1] == "12" and got[4] is None


# ---- Duration family ------------------------------------------------------


def test_duration_parse(frame):
    ns = _col(frame, 'Duration(attributes["dur"])')
    assert ns[1] == 5.4e12  # 1h30m
    assert ns[2] == 3.0e8  # 300ms
    assert ns[3] is None  # bogus -> error-as-null
    assert ns[4] == -2.0e9  # -2s
    assert ns[5] == 0.0  # bare "0" is legal in ParseDuration


def test_duration_converters(frame):
    hours = _col(frame, 'Hours(Duration(attributes["dur"]))')
    mins = _col(frame, 'Minutes(Duration(attributes["dur"]))')
    ms = _col(frame, 'Milliseconds(Duration(attributes["dur"]))')
    assert hours[1] == 1.5 and mins[1] == 90.0 and ms[1] == 5400000
    assert ms[2] == 300 and hours[3] is None


def test_duration_fractional_and_micro(spark):
    df = spark.createDataFrame([("1.5h", "250us", "3µs")], "a string, b string, c string")
    r = df.select(
        compile_ottl("Seconds(Duration(name))", name_col="a").alias("s"),
        compile_ottl("Microseconds(Duration(name))", name_col="b").alias("us"),
        compile_ottl("Nanoseconds(Duration(name))", name_col="c").alias("ns"),
    ).first()
    assert r["s"] == 5400.0 and r["us"] == 250 and r["ns"] == 3000


def test_duration_rejects_unitless_nonzero(spark):
    df = spark.createDataFrame([("15",), ("h",), ("",)], "s string")
    got = [
        r["v"]
        for r in df.select(compile_ottl("Duration(name)", name_col="s").alias("v")).collect()
    ]
    assert got == [None, None, None]


# ---- hashes / ParseJSON ---------------------------------------------------


def test_sha1(frame):
    import hashlib

    got = _col(frame, "SHA1(name)")
    assert got[1] == hashlib.sha1(b"simpleString").hexdigest()
    assert got[4] is None


def test_parse_json(frame):
    got = _col(frame, 'ParseJSON(attributes["json"])')
    assert got[3]["a"] == "1" and got[3]["b"] == "t"
    # nested values arrive as raw JSON text (documented flat-map contract)
    assert got[3]["c"] in ('{"d": 2}', '{"d":2}')
    assert got[1] is None  # missing key -> nil target


def test_parse_json_malformed_is_null(spark):
    df = spark.createDataFrame([("{not json",)], "s string")
    got = df.select(compile_ottl("ParseJSON(name)", name_col="s").alias("v")).first()["v"]
    assert got is None


# ---- registry-level contract ---------------------------------------------


def test_supported_functions_all_dispatch():
    """Every name in SUPPORTED_FUNCTIONS must actually compile with a
    plausible invocation — the registry constant IS the conformance surface."""
    invocations = {
        "NormalizePath": "NormalizePath(name)",
        "ParseSQL": "ParseSQL(name)",
        "RemoveQueryParams": "RemoveQueryParams(name)",
        "FirstNonNil": 'FirstNonNil([name, "x"])',
        "Concat": 'Concat([name, "x"], "-")',
        "IsMatch": 'IsMatch(name, "a")',
        "Substring": "Substring(name, 0, 2)",
        "Len": "Len(name)",
        "ConvertCase": 'ConvertCase(name, "snake")',
        "Format": 'Format("%s", [name])',
        "ExtractPatterns": 'ExtractPatterns(name, "(?P<g>a)")',
        "MD5": "MD5(name)",
        "SHA1": "SHA1(name)",
        "SHA256": "SHA256(name)",
        "Split": 'Split(name, ",")',
        "Trim": "Trim(name)",
        "ReplacePattern": 'ReplacePattern(name, "a", "b")',
        "ReplaceAllPatterns": 'ReplaceAllPatterns(attributes, "value", "a", "b")',
        "Int": "Int(name)",
        "Double": "Double(name)",
        "String": "String(name)",
        "Duration": "Duration(name)",
        "ParseJSON": "ParseJSON(name)",
        "Hours": "Hours(Duration(name))",
        "Minutes": "Minutes(Duration(name))",
        "Seconds": "Seconds(Duration(name))",
        "Milliseconds": "Milliseconds(Duration(name))",
        "Microseconds": "Microseconds(Duration(name))",
        "Nanoseconds": "Nanoseconds(Duration(name))",
    }
    assert set(invocations) == set(SUPPORTED_FUNCTIONS)
    for expr in invocations.values():
        compile_ottl(expr)  # must not raise
