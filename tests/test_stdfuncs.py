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
        "Time": 'Time(name, "%Y-%m-%d")',
        "TruncateTime": 'TruncateTime(Time(name, "%Y-%m-%d"), Duration("1h"))',
        "UnixSeconds": 'UnixSeconds(Time(name, "%Y-%m-%d"))',
        "UnixMilli": 'UnixMilli(Time(name, "%Y-%m-%d"))',
        "UnixMicro": 'UnixMicro(Time(name, "%Y-%m-%d"))',
        "UnixNano": 'UnixNano(Time(name, "%Y-%m-%d"))',
        "ParseKeyValue": "ParseKeyValue(name)",
        "ToKeyValueString": "ToKeyValueString(ParseKeyValue(name))",
        "Decode": 'Decode(name, "base64")',
        "Keys": "Keys(ParseJSON(name))",
        "Values": "Values(ParseJSON(name))",
        "Hex": "Hex(name)",
        "Log": "Log(Double(name))",
        "IsString": "IsString(name)",
        "IsInt": "IsInt(Int(name))",
        "IsDouble": "IsDouble(Double(name))",
        "IsBool": 'IsBool(IsMatch(name, "x"))',
        "IsMap": "IsMap(ParseJSON(name))",
        "IsList": 'IsList(Split(name, ","))',
        "SHA512": "SHA512(name)",
        "Sort": 'Sort(Split(name, ","))',
        "Year": 'Year(Time(name, "%Y"))',
        "Month": 'Month(Time(name, "%Y"))',
        "Day": 'Day(Time(name, "%Y"))',
        "Hour": 'Hour(Time(name, "%Y"))',
        "Minute": 'Minute(Time(name, "%Y"))',
        "Second": 'Second(Time(name, "%Y"))',
        "ParseCSV": 'ParseCSV(name, "a,b")',
        "URL": "URL(name)",
        "ReplaceMatch": 'ReplaceMatch(name, "a*", "b")',
        "ReplaceAllMatches": 'ReplaceAllMatches(attributes, "a*", "b")',
        "TruncateAll": "TruncateAll(attributes, 10)",
        "ExtractGrokPatterns": 'ExtractGrokPatterns(name, "%{WORD:w}")',
    }
    assert set(invocations) == set(SUPPORTED_FUNCTIONS)
    for expr in invocations.values():
        compile_ottl(expr)  # must not raise


# ---- Time family (round-5 additions) --------------------------------------


@pytest.fixture(scope="module")
def tframe(spark):
    rows = [
        (1, "2024-03-05 07:08:09", "kv"),
        (2, "2024-12-31T23:59:58", "kv"),
        (3, "not a time", "kv"),
        (4, None, "kv"),
    ]
    return spark.createDataFrame(rows, "id long, ts string, other string").cache()


def _tcol(frame, expr):
    return {r["id"]: r["v"] for r in frame.select("id", compile_ottl(expr, name_col="ts").alias("v")).collect()}


def test_time_parses_and_errors_as_null(tframe):
    got = _tcol(tframe, 'Time(name, "%Y-%m-%d %H:%M:%S")')
    assert str(got[1]) == "2024-03-05 07:08:09"
    assert got[2] is None  # literal T does not match the space
    assert got[3] is None and got[4] is None


def test_time_literal_letter_run_is_quoted(tframe):
    # the 'T' separator is a letter literal -> must be quoted in the Java
    # pattern or DateTimeFormatter would treat it as a directive
    got = _tcol(tframe, 'Time(name, "%Y-%m-%dT%H:%M:%S")')
    assert str(got[2]) == "2024-12-31 23:59:58"
    assert got[1] is None


def test_time_with_zone_directive_is_absolute(spark):
    df = spark.createDataFrame([("2024-03-05 12:00:00 +0230",)], "ts string")
    got = df.select(
        compile_ottl('UnixSeconds(Time(name, "%Y-%m-%d %H:%M:%S %z"))', name_col="ts").alias("v")
    ).collect()[0]["v"]
    import calendar

    utc = calendar.timegm((2024, 3, 5, 9, 30, 0))
    assert got == utc


def test_time_rejects_unmapped_directive():
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Time(name, "%s")')  # epoch-seconds directive: no Java twin
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Time(name, "%Y-%m-%d %")')  # dangling %


def test_unix_converters(tframe):
    s = _tcol(tframe, 'UnixSeconds(Time(name, "%Y-%m-%d %H:%M:%S"))')
    ms = _tcol(tframe, 'UnixMilli(Time(name, "%Y-%m-%d %H:%M:%S"))')
    us = _tcol(tframe, 'UnixMicro(Time(name, "%Y-%m-%d %H:%M:%S"))')
    ns = _tcol(tframe, 'UnixNano(Time(name, "%Y-%m-%d %H:%M:%S"))')
    assert ms[1] == s[1] * 1000 and us[1] == s[1] * 1_000_000 and ns[1] == s[1] * 10**9
    assert s[3] is None and ns[4] is None


def test_truncate_time_go_zero_time_base(tframe):
    # 1h divides the zero-time->epoch offset evenly: plain hour floor
    got = _tcol(tframe, 'TruncateTime(Time(name, "%Y-%m-%d %H:%M:%S"), Duration("1h"))')
    assert str(got[1]) == "2024-03-05 07:00:00"
    # 7h does NOT divide the offset: Go time.Truncate floors to multiples of
    # 7h since year 1, not since the epoch — mirror Go's arithmetic exactly
    import calendar

    t = calendar.timegm((2024, 3, 5, 7, 8, 9))
    go_zero_off = 62135596800
    d = 7 * 3600
    expected = t - ((t + go_zero_off) % d)
    got7 = _tcol(
        tframe, 'UnixSeconds(TruncateTime(Time(name, "%Y-%m-%d %H:%M:%S"), Duration("7h")))'
    )
    assert got7[1] == expected


def test_truncate_time_nonpositive_duration_is_identity(tframe):
    got = _tcol(tframe, 'TruncateTime(Time(name, "%Y-%m-%d %H:%M:%S"), Duration("0"))')
    assert str(got[1]) == "2024-03-05 07:08:09"


# ---- ParseKeyValue / ToKeyValueString -------------------------------------


def test_parse_key_value_basic(spark):
    df = spark.createDataFrame(
        [(1, "k1=v1 k2=v2"), (2, "k1=v1   k2=v2 "), (3, "a=b=c"), (4, "k1=v1 oops"), (5, None)],
        "id long, s string",
    )
    got = {
        r["id"]: r["v"]
        for r in df.select("id", compile_ottl("ParseKeyValue(name)", name_col="s").alias("v")).collect()
    }
    assert got[1] == {"k1": "v1", "k2": "v2"}
    assert got[2] == {"k1": "v1", "k2": "v2"}  # empty segments dropped
    assert got[3] == {"a": "b=c"}  # SplitN(2): value keeps later delimiters
    assert got[4] is None  # pair without delimiter = upstream error
    assert got[5] is None


def test_parse_key_value_custom_delims_and_last_wins(spark):
    df = spark.createDataFrame([("a:1,b:2,a:3",)], "s string")
    got = df.select(
        compile_ottl('ParseKeyValue(name, ":", ",")', name_col="s").alias("v")
    ).collect()[0]["v"]
    assert got == {"a": "3", "b": "2"}  # duplicate key: LAST occurrence wins


def test_parse_key_value_rejects_bad_delims():
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('ParseKeyValue(name, "")')
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('ParseKeyValue(name, ",", ",")')


def test_to_key_value_string_round_trip(spark):
    df = spark.createDataFrame([("b=2 a=1",)], "s string")
    got = df.select(
        compile_ottl(
            'ToKeyValueString(ParseKeyValue(name), "=", " ", true)', name_col="s"
        ).alias("v")
    ).collect()[0]["v"]
    assert got == "a=1 b=2"  # sortOutput orders pairs


def test_to_key_value_string_defaults_preserve_order(spark):
    df = spark.createDataFrame([("z=9 a=1",)], "s string")
    got = df.select(
        compile_ottl("ToKeyValueString(ParseKeyValue(name))", name_col="s").alias("v")
    ).collect()[0]["v"]
    assert got == "z=9 a=1"


# ---- Decode / Keys / Values / Hex / Log -----------------------------------


def test_decode_base64(spark):
    df = spark.createDataFrame(
        [(1, "aGVsbG8="), (2, "aGVsbG8"), (3, "!!notb64!!"), (4, None)], "id long, s string"
    )
    b64 = {
        r["id"]: r["v"]
        for r in df.select("id", compile_ottl('Decode(name, "base64")', name_col="s").alias("v")).collect()
    }
    raw = {
        r["id"]: r["v"]
        for r in df.select("id", compile_ottl('Decode(name, "base64-raw")', name_col="s").alias("v")).collect()
    }
    assert b64[1] == "hello" and b64[3] is None and b64[4] is None
    assert raw[2] == "hello"  # raw variant re-pads before decoding
    assert b64[2] is None  # standard base64 requires padding


def test_decode_rejects_unknown_encoding():
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Decode(name, "rot13")')


def test_keys_values(frame):
    got = _col(frame, "Keys(ParseJSON(attributes[\"json\"]))")
    assert sorted(got[3]) == ["a", "b", "c"]
    vals = _col(frame, "Values(ParseJSON(attributes[\"json\"]))")
    assert set(vals[3]) == {"1", "t", '{"d":2}'}


def test_hex_lowercase(frame):
    got = _col(frame, "Hex(name)")
    assert got[1] == "simpleString".encode().hex()  # lowercase, Go parity


def test_log_error_as_null(spark):
    import math

    df = spark.createDataFrame([(1, "42"), (2, "-1"), (3, "0"), (4, "x")], "id long, s string")
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id", compile_ottl("Log(Double(name))", name_col="s").alias("v")
        ).collect()
    }
    assert abs(got[1] - math.log(42)) < 1e-12
    assert got[2] is None and got[3] is None and got[4] is None


def test_parse_key_value_trims_around_inner_delimiter(spark):
    df = spark.createDataFrame([("a = 1, b = 2",)], "s string")
    got = df.select(
        compile_ottl('ParseKeyValue(name, "=", ",")', name_col="s").alias("v")
    ).collect()[0]["v"]
    assert got == {"a": "1", "b": "2"}


# ---- Type predicates / SHA512 / Sort / calendar (round-5 batch 2) ---------


def test_type_predicates(frame):
    # the compiled expression's Catalyst type plays the pcommon value-type
    # role; nil -> false like upstream
    assert _col(frame, 'IsString(name)') == {1: True, 2: True, 3: True, 4: False, 5: True}
    is_int = _col(frame, 'IsInt(Int(attributes["n"]))')
    assert is_int[1] is True and is_int[5] is False and is_int[3] is False
    assert _col(frame, 'IsInt(name)')[1] is False  # string-typed: never int
    is_dbl = _col(frame, 'IsDouble(Double(attributes["n"]))')
    assert is_dbl[2] is True and is_dbl[5] is False
    assert _col(frame, 'IsBool(IsMatch(name, "simple"))')[1] is True
    assert _col(frame, 'IsMap(ParseJSON(attributes["json"]))')[3] is True
    assert _col(frame, 'IsMap(ParseJSON(attributes["json"]))')[1] is False  # missing -> nil
    assert _col(frame, 'IsList(Split(name, "_"))')[3] is True
    assert _col(frame, 'IsList(name)')[3] is False


def test_sha512(frame):
    import hashlib

    got = _col(frame, "SHA512(name)")
    assert got[1] == hashlib.sha512(b"simpleString").hexdigest()
    assert got[4] is None


def test_sort(frame):
    assert _col(frame, 'Sort(Split(name, "_"))')[3] == ["case word", "test"]
    assert _col(frame, 'Sort(Split(name, "_"), "desc")')[3] == ["test", "case word"]
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Sort(name, "sideways")')


def test_calendar_accessors(spark):
    df = spark.createDataFrame([(1, "2024-03-05 07:08:09")], "id long, ts string")
    vals = {}
    for fn in ("Year", "Month", "Day", "Hour", "Minute", "Second"):
        vals[fn] = df.select(
            compile_ottl(f'{fn}(Time(name, "%Y-%m-%d %H:%M:%S"))', name_col="ts").alias("v")
        ).collect()[0]["v"]
    assert vals == {"Year": 2024, "Month": 3, "Day": 5, "Hour": 7, "Minute": 8, "Second": 9}


# ---- ParseCSV -------------------------------------------------------------


def test_parse_csv_strict_quote_aware(spark):
    df = spark.createDataFrame(
        [
            (1, 'a,"b,with comma",c'),
            (2, "1,2,3"),
            (3, "too,few"),
            (4, "too,many,fields,here"),
            (5, None),
        ],
        "id long, s string",
    )
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id", compile_ottl('ParseCSV(name, "h1,h2,h3")', name_col="s").alias("v")
        ).collect()
    }
    assert got[1] == {"h1": "a", "h2": "b,with comma", "h3": "c"}
    assert got[2] == {"h1": "1", "h2": "2", "h3": "3"}
    assert got[3] is None  # field-count mismatch errors upstream
    assert got[4] is None
    assert got[5] is None


def test_parse_csv_ignore_quotes_and_custom_delims(spark):
    df = spark.createDataFrame([(1, 'x|"quoted|text'), (2, "a|b")], "id long, s string")
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id",
            compile_ottl(
                'ParseCSV(name, "f1;f2", "|", ";", "ignoreQuotes")', name_col="s"
            ).alias("v"),
        ).collect()
    }
    assert got[2] == {"f1": "a", "f2": "b"}
    # ignoreQuotes splits blindly: the quoted delimiter still splits, so the
    # line has 3 fields vs 2 headers -> error-as-null
    assert got[1] is None
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('ParseCSV(name, "a,b", ",", ",", "lazyQuotes")')


# ---- URL ------------------------------------------------------------------


def test_url_components(spark):
    df = spark.createDataFrame(
        [
            (1, "https://user:pw@sub.example.com:8443/api/v1/file.json?q=1&r=2#frag"),
            (2, "http://example.com/plain"),
            (3, None),
        ],
        "id long, s string",
    )
    got = {
        r["id"]: r["v"]
        for r in df.select("id", compile_ottl("URL(name)", name_col="s").alias("v")).collect()
    }
    u = got[1]
    assert u["url.scheme"] == "https"
    assert u["url.domain"] == "sub.example.com"
    assert u["url.port"] == "8443"
    assert u["url.path"] == "/api/v1/file.json"
    assert u["url.query"] == "q=1&r=2"
    assert u["url.fragment"] == "frag"
    assert u["url.extension"] == "json"
    assert u["url.user_info"] == "user:pw"
    assert u["url.original"].startswith("https://")
    # absent components omitted, like upstream
    assert set(got[2]) == {"url.original", "url.scheme", "url.domain", "url.path"}
    assert got[3] is None


# ---- ReplaceMatch / ReplaceAllMatches / TruncateAll -----------------------


def test_replace_match_glob(spark):
    df = spark.createDataFrame(
        [(1, "GET /api/users/42"), (2, "POST /admin"), (3, None)], "id long, s string"
    )
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id",
            compile_ottl(
                'ReplaceMatch(name, "GET *", "{sanitized}")', name_col="s"
            ).alias("v"),
        ).collect()
    }
    # path.Match: * does NOT cross '/' — "GET *" can't match the pathful value
    assert got[1] == "GET /api/users/42"
    assert got[2] == "POST /admin"
    assert got[3] is None
    got2 = {
        r["id"]: r["v"]
        for r in df.select(
            "id",
            compile_ottl('ReplaceMatch(name, "GET /*/*/*", "{get}")', name_col="s").alias("v"),
        ).collect()
    }
    assert got2[1] == "{get}"
    assert got2[2] == "POST /admin"
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('ReplaceMatch(name, "bad[class", "x")')


def test_replace_all_matches_and_truncate_all(frame):
    got = _col(frame, 'ReplaceAllMatches(attributes, "v *", "{v}")')
    assert got[1]["k"] == "{v}"  # "v one" matches glob "v *"
    assert got[1]["n"] == "42"
    t = _col(frame, "TruncateAll(attributes, 2)")
    assert t[1]["k"] == "v " and t[1]["dur"] == "1h"
    with pytest.raises(OTTLSyntaxError):
        compile_ottl("TruncateAll(name, 2)")


def test_parse_csv_empty_field_handling(spark):
    df = spark.createDataFrame(
        [(1, 'a,"",c'), (2, "a,b,"), (3, "a,,c")], "id long, s string"
    )
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id", compile_ottl('ParseCSV(name, "x,y,z")', name_col="s").alias("v")
        ).collect()
    }
    assert got[1] == {"x": "a", "y": "", "z": "c"}  # quoted empty is a field
    # documented divergence: UNQUOTED empty fields (interior or trailing)
    # are univocity-missing -> error-as-null; Go's encoding/csv yields ""
    assert got[2] is None
    assert got[3] is None


# ---- converter-result indexing (grammar round-5) --------------------------


def test_index_list_and_out_of_range(spark):
    df = spark.createDataFrame([("a,b,c",)], "s string")
    r = df.select(
        compile_ottl('Split(name, ",")[0]', name_col="s").alias("first"),
        compile_ottl('Split(name, ",")[2]', name_col="s").alias("last"),
        compile_ottl('Split(name, ",")[9]', name_col="s").alias("oob"),
    ).first()
    assert r["first"] == "a" and r["last"] == "c"
    assert r["oob"] is None  # out-of-range errors upstream -> null


def test_index_rejects_bad_subscripts():
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Split(name, ",")[-1]')  # negative index
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Split(name, ",")[name]')  # non-literal subscript
    with pytest.raises(OTTLSyntaxError):
        compile_ottl('Split(name, ",")[')  # unterminated
