"""OTTL standard-function builders (pure Catalyst Columns, zero UDFs).

The reference merges the whole ``ottlfuncs.StandardFuncs()`` registry into its
parser (processors/semconvprocessor/ottl_functions.go:19), so ANY standard
OTTL converter is legal in a user's rule YAML.  This module implements the
high-frequency ones the round-4 registry still rejected — each one as a pure
``pyspark.sql.Column`` expression so the rule cascade stays whole-stage
code-generated with no Python in the hot path.

Semantics are mirrored from the public opentelemetry-collector-contrib
``pkg/ottl/ottlfuncs`` sources (and, for ConvertCase, the iancoleman/strcase
library ottlfuncs delegates to), with the engine's documented error-as-null
model: where upstream OTTL *errors* (nil target, unparseable input), these
return NULL and the enclosing rule skips (processor.go:244-250 parity).

Documented divergences (see README conformance table):
  * ConvertCase "camel" preserves interior acronym casing ("HTTPServer" stays
    "HTTPServer"); newer strcase releases downcase to "HttpServer".
  * ParseJSON targets flat string maps; nested values arrive as their raw
    JSON text (Spark's JacksonParser contract), not as nested pcommon maps.
  * ReplacePattern replacement strings use Java group references ($1);
    Go-style literal "$$" is translated to an escaped literal dollar.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "to_snake_case",
    "to_camel_case",
    "ottl_split",
    "ottl_trim",
    "replace_pattern",
    "duration_ns",
    "parse_json_flat",
]


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# ConvertCase "snake" / "camel"  (ottlfuncs func_convert_case.go ->
# iancoleman/strcase ToSnake / ToCamel), as regexp_replace chains
# ---------------------------------------------------------------------------


def to_snake_case(col: Column | str) -> Column:
    """strcase.ToSnake: word boundaries at separator chars, lower→Upper,
    acronym→Word, and letter↔digit transitions; then lowercased.

    "simpleString"→"simple_string", "HTTPServer"→"http_server",
    "v2Count"→"v_2_count", "a b-c.d"→"a_b_c_d".
    """
    c = _as_col(col)
    c = F.regexp_replace(c, r"[ \-.]", "_")
    c = F.regexp_replace(c, r"([A-Z])([A-Z][a-z])", r"$1_$2")  # HTTPServer -> HTTP_Server
    c = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2")  # simpleString -> simple_String
    c = F.regexp_replace(c, r"([A-Za-z])([0-9])", r"$1_$2")  # v2 -> v_2
    c = F.regexp_replace(c, r"([0-9])([a-z])", r"$1_$2")  # 2x -> 2_x
    return F.lower(c)


def to_camel_case(col: Column | str) -> Column:
    """strcase.ToCamel (PascalCase): split on [_ -.] and digit→letter
    boundaries, uppercase each word's first letter, drop the separators.

    "test_case"→"TestCase", "foo2bar"→"Foo2Bar", "many-lots of.sep"→
    "ManyLotsOfSep".  Interior acronym casing is preserved (see module doc).
    """
    c = _as_col(col)
    sep = F.regexp_replace(c, r"([0-9])([A-Za-z])", r"$1_$2")  # capNext after digits
    words = F.split(sep, r"[ \-._]+")
    capped = F.transform(
        words,
        lambda w: F.concat(F.upper(w.substr(F.lit(1), F.lit(1))), w.substr(F.lit(2), F.length(w))),
    )
    # concat_ws renders a NULL input as "" — keep NULL-in -> NULL-out
    return F.when(c.isNotNull(), F.concat_ws("", capped))


# ---------------------------------------------------------------------------
# Split / Trim
# ---------------------------------------------------------------------------


def ottl_split(col: Column | str, delimiter: str) -> Column:
    """ottlfuncs Split(target, delimiter): plain-string split (Go
    strings.Split), NOT regex — the delimiter is \\Q..\\E-quoted so regex
    metacharacters split literally.  nil target -> NULL (error-as-null)."""
    return F.split(_as_col(col), "\\Q" + delimiter + "\\E")


def ottl_trim(col: Column | str, cutset: str = " ") -> Column:
    """ottlfuncs Trim(target[, chars]): strips any leading/trailing chars in
    the cutset (Go strings.Trim), default a single space.  Spark's btrim has
    the identical char-set contract."""
    return F.btrim(_as_col(col), F.lit(cutset))


# ---------------------------------------------------------------------------
# ReplacePattern (value-returning form of the replace_pattern editor)
# ---------------------------------------------------------------------------


def replace_pattern(col: Column | str, pattern: str, replacement: str) -> Column:
    """regexp_replace with Go→Java replacement-string translation: numeric
    group refs ($1) are identical in RE2 and java.util.regex; Go's literal
    "$$" becomes Java's escaped "\\$"."""
    java_repl = replacement.replace("$$", "\\$")
    return F.regexp_replace(_as_col(col), pattern, java_repl)


# ---------------------------------------------------------------------------
# Duration family (ottlfuncs Duration -> time.ParseDuration; Hours/Minutes/
# Seconds/Milliseconds/Microseconds/Nanoseconds convert the result)
# ---------------------------------------------------------------------------

# one Go duration atom: decimal number + unit (time.ParseDuration grammar);
# µ (U+00B5) and μ (U+03BC) both accepted, like Go
_DUR_ATOM = r"(\d+(?:\.\d*)?|\.\d+)(ns|us|µs|μs|ms|s|m|h)"
_DUR_FULL = r"^[-+]?((\d+(?:\.\d*)?|\.\d+)(ns|us|µs|μs|ms|s|m|h))+$"

_UNIT_NS = [
    ("ns", 1.0),
    ("us", 1e3),
    ("µs", 1e3),
    ("μs", 1e3),
    ("ms", 1e6),
    ("s", 1e9),
    ("m", 6e10),
    ("h", 3.6e12),
]


def _unit_multiplier(unit: Column) -> Column:
    expr = F.lit(None).cast("double")
    for name, ns in reversed(_UNIT_NS):
        expr = F.when(unit == name, F.lit(ns)).otherwise(expr)
    return expr


def duration_ns(col: Column | str) -> Column:
    """Go time.ParseDuration as a pure expression: validate the full grammar,
    regexp_extract_all the (number, unit) atoms, sum number×unit_ns.  Returns
    total nanoseconds as double; unparseable / nil -> NULL (upstream errors).

    "1h30m"→5.4e12, "300ms"→3e8, "1.5h"→5.4e12, "-2s"→-2e9, "0"→0.
    """
    c = _as_col(col)
    nums = F.regexp_extract_all(c, F.lit(_DUR_ATOM), 1)
    units = F.regexp_extract_all(c, F.lit(_DUR_ATOM), 2)
    total = F.aggregate(
        F.zip_with(nums, units, lambda n, u: n.cast("double") * _unit_multiplier(u)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    signed = F.when(c.startswith("-"), -total).otherwise(total)
    # ParseDuration's one unitless form: "0" (optionally signed)
    return F.when(c.rlike(_DUR_FULL), signed).when(
        c.rlike(r"^[-+]?0$"), F.lit(0.0)
    )


# ---------------------------------------------------------------------------
# ParseJSON (flat string-map contract — see module docstring)
# ---------------------------------------------------------------------------


def parse_json_flat(col: Column | str) -> Column:
    """ottlfuncs ParseJSON(target) -> map<string,string>: scalar values are
    coerced to their string forms, nested values arrive as raw JSON text.
    Malformed JSON -> NULL (from_json PERMISSIVE ≙ error-as-null)."""
    return F.from_json(_as_col(col), "map<string,string>")
