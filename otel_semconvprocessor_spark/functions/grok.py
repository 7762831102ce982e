"""Grok pattern support for ExtractGrokPatterns (pure expressions, no UDF).

ottlfuncs ``ExtractGrokPatterns(target, pattern[, namedCapturesOnly])``
parses log lines with grok — ``%{SYNTAX:SEMANTIC}`` references over a base
pattern library (upstream delegates to elastic/go-grok, whose default set
mirrors the public logstash-patterns-core table).  The reference merges the
whole standard registry (``ottl_functions.go:19``), so grok rules are legal
in user YAML.

This module ships a curated subset of the public base patterns (the ones
log pipelines actually hit: tokens, numbers, network, timestamps, the
Apache/Nginx combined-log building blocks) and expands a grok expression to
one flat Java regex at COMPILE time.  Named captures then lower to the same
one-``regexp_extract``-per-group plan ExtractPatterns uses — whole-stage
codegen, zero Python.

Plan note (measured, round 5): the per-capture ``regexp_extract`` form runs
the full regex once per group (15x for COMBINEDAPACHELOG), yet it BEAT a
single-pass rewrite — ``regexp_replace(line, "(?s)^.*?(?:pat).*$",
"$1\\x01$2...")`` + split — 7.4s vs 10.7s min-warm at 1M lines, local[32],
byte-identical output.  The lazy ``^.*?`` whole-string wrapper backtracks
more than the 15 ``find()`` calls, which all anchor at the first match
position immediately.  Measured-and-rejected; keep per-group extracts.

Deliberate deltas from go-grok (documented in the README table):
  * unknown ``%{NAME}`` references raise ``OTTLSyntaxError`` at load (the
    upstream parser errors at startup too; our table is the subset below).
  * type coercions (``%{NUMBER:d:float}``) are rejected — the engine's attr
    model is string-typed; coerce with ``Double()``/``Int()`` afterwards.
  * ``namedCapturesOnly=false`` (exposing bare SYNTAX names) is supported;
    duplicate semantic names keep the FIRST occurrence.
"""

from __future__ import annotations

import re

__all__ = ["GROK_BASE_PATTERNS", "grok_to_java_regex"]

# Curated from the public logstash-patterns-core grammar (grok-patterns
# file's most-used entries), expressed in RE2/Java-compatible syntax (no
# possessive quantifiers, no recursion).  Order-independent: references
# resolve recursively at expansion time.
GROK_BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?(?:[0-9]+)",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "BASE10NUM": r"[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"[+-]?(?:0x)?(?:[0-9A-Fa-f]+)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,64}(?:\.[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,62}){0,63}",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    ),
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|%{IPV4})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MONTH": (
        r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?"
        r"|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?"
        r"|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?"
        r"|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:%{HOUR}):(?:%{MINUTE})(?::(?:%{SECOND}))?",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE"
        r"|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?"
        r"|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?"
        r"|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?"
        r"|[Ee]merg(?:ency)?)"
    ),
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'|`(?:[^`\\]|\\.)*`)",
    "QS": r"%{QUOTEDSTRING}",
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+\-.]+)+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "PATH": r"(?:%{URIPATH}|%{WINPATH})",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "COMBINEDAPACHELOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} '
        r'\[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}'
        r'(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r'%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-) '
        r'%{QS:referrer} %{QS:agent}'
    ),
}

_REF_RE = re.compile(r"%\{(\w+)(?::([\w.\[\]@-]+))?(?::(\w+))?\}")


def grok_to_java_regex(
    pattern: str,
    named_captures_only: bool = True,
    _table: dict[str, str] | None = None,
) -> str:
    """Expand every ``%{SYNTAX[:SEMANTIC]}`` reference into a flat Java/RE2
    regex with ``(?P<name>...)`` groups for the captures.

    Semantic names become capture groups; bare references become
    non-capturing groups unless ``named_captures_only=False`` (then the
    SYNTAX name itself captures, first occurrence wins — go-grok parity).
    Nested references inside the base table are expanded recursively.
    Raises ``ValueError`` on unknown pattern names, cyclic references, or a
    type-coercion suffix (string-typed attr model — coerce after)."""
    table = GROK_BASE_PATTERNS if _table is None else _table
    seen_names: set[str] = set()

    def expand(src: str, stack: tuple[str, ...]) -> str:
        out: list[str] = []
        pos = 0
        for m in _REF_RE.finditer(src):
            out.append(src[pos : m.start()])
            pos = m.end()
            syntax, semantic, coercion = m.group(1), m.group(2), m.group(3)
            if coercion:
                raise ValueError(
                    f"grok type coercion %{{{syntax}:{semantic}:{coercion}}} "
                    "unsupported — the attr model is string-typed; apply "
                    "Int()/Double() to the extracted value instead"
                )
            if syntax not in table:
                raise ValueError(f"unknown grok pattern %{{{syntax}}}")
            if syntax in stack:
                raise ValueError(f"cyclic grok pattern reference %{{{syntax}}}")
            body = expand(table[syntax], stack + (syntax,))
            name = semantic if semantic else (None if named_captures_only else syntax)
            # group names must survive the Java rewrite in ottl.py (extract
            # is by NUMBER, so any unique placeholder name works); sanitize
            # dots/brackets go-grok allows in semantics
            if name is not None and name not in seen_names:
                seen_names.add(name)
                safe = re.sub(r"\W", "_", name)
                out.append(f"(?P<{safe}>{body})")
                # remember the original semantic for the caller via the
                # group-name map built in ottl.py (it re-derives from the
                # pattern; keep a 1:1 sanitized->original mapping unambiguous
                # by construction: first occurrence wins)
            else:
                out.append(f"(?:{body})")
        out.append(src[pos:])
        return "".join(out)

    return expand(pattern, ())


def grok_group_names(pattern: str, named_captures_only: bool = True) -> dict[str, str]:
    """``sanitized_group_name -> original_semantic_name`` for one grok
    pattern, in first-occurrence order (what the emitted map keys should
    be).  Mirrors the naming walk of :func:`grok_to_java_regex`."""
    names: dict[str, str] = {}

    def walk(src: str, stack: tuple[str, ...]) -> None:
        for m in _REF_RE.finditer(src):
            syntax, semantic = m.group(1), m.group(2)
            if syntax not in GROK_BASE_PATTERNS or syntax in stack:
                continue
            name = semantic if semantic else (None if named_captures_only else syntax)
            if name is not None:
                safe = re.sub(r"\W", "_", name)
                if safe not in names:
                    names[safe] = name
            else:
                walk(GROK_BASE_PATTERNS[syntax], stack + (syntax,))

    walk(pattern, ())
    return names
