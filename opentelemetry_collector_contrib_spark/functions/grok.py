"""Grok pattern expansion → plain named-group regex, at plan-build time.

The reference's ``ExtractGrokPatterns`` converter
(``pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:18-120``) delegates to
elastic/go-grok at runtime, per row. Here grok is a *compile-time* concern:
``%{NAME:field}`` references expand recursively into one flat named-group
regex on the driver, and execution is the ordinary vectorized regex parse
(operators/parsers.regex_parser) — zero per-row grok machinery.

The pattern dictionary below is an independent implementation of the
well-known public grok base patterns (same names/semantics as the
logstash/elastic sets, re-derived from their documented meaning); custom
patterns can be supplied per call (``PATTERNNAME=def`` support,
func_extract_grok_patterns.go's definitions arg).
"""

from __future__ import annotations

import re

# Base dictionary — public, well-known pattern names.
BASE_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "NONNEGINT": r"\d+",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV6": r"[0-9a-fA-F:]{2,39}",
    "IP": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[0-9a-fA-F:]{2,39})",
    "HOSTNAME": r"[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?)*",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?)*)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:\.\d+)?",
    "TIME": r"(?:2[0123]|[01]?\d):[0-5]\d:(?:[0-5]?\d)(?:\.\d+)?",
    "DATE_US": r"(?:0?[1-9]|1[0-2])[/-](?:0[1-9]|[12]\d|3[01]|[1-9])[/-](?:\d\d){1,2}",
    "DATE_EU": r"(?:0[1-9]|[12]\d|3[01]|[1-9])[./-](?:0?[1-9]|1[0-2])[./-](?:\d\d){1,2}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01]?\d)(?::?[0-5]\d)?)",
    "TIMESTAMP_ISO8601": (
        r"(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]|[1-9])"
        r"[T ](?:2[0123]|[01]?\d):?[0-5]\d(?::?(?:[0-5]?\d)(?:\.\d+)?)?"
        r"(?:Z|[+-](?:2[0123]|[01]?\d)(?::?[0-5]\d)?)?"
    ),
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|"
        r"INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|"
        r"[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|"
        r"[Ee]merg(?:ency)?)"
    ),
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2} +(?:0[1-9]|[12]\d|3[01]|[1-9]) (?:2[0123]|[01]?\d):[0-5]\d:(?:[0-5]?\d)",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "HTTPDATE": r"(?:0[1-9]|[12]\d|3[01]|[1-9])/\w{3}/(?:\d\d){1,2}:(?:2[0123]|[01]?\d):[0-5]\d:(?:[0-5]?\d) [+-]\d{4}",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
}

_GROK_REF = re.compile(r"%\{(?P<name>[A-Z0-9_]+)(?::(?P<field>[A-Za-z0-9_.\[\]@]+))?(?::(?P<type>int|float|string))?\}")


def expand_grok(
    pattern: str,
    definitions: dict[str, str] | None = None,
    named_captures_only: bool = True,
    _depth: int = 0,
) -> tuple[str, dict[str, str]]:
    """Expand a grok pattern into (python_named_group_regex, field→type map).

    ``definitions`` adds/overrides pattern names (the converter's custom
    ``PATTERNNAME=def`` list). Unnamed references expand to non-capturing
    groups when ``named_captures_only`` (the converter's namedCapturesOnly).
    Field names are sanitized to valid python group names (dots → '_').
    """
    if _depth > 20:
        raise ValueError("grok expansion too deep (recursive pattern?)")
    patterns = dict(BASE_PATTERNS)
    if definitions:
        patterns.update(definitions)
    types: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        name, field, typ = m.group("name"), m.group("field"), m.group("type")
        if name not in patterns:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        inner, inner_types = expand_grok(
            patterns[name], definitions, named_captures_only, _depth + 1
        )
        types.update(inner_types)
        if field:
            safe = re.sub(r"[^A-Za-z0-9_]", "_", field)
            types[safe] = typ or "string"
            return f"(?P<{safe}>{inner})"
        if named_captures_only:
            return f"(?:{inner})"
        return f"(?:{inner})"

    expanded = _GROK_REF.sub(repl, pattern)
    return expanded, types


def grok_parser(df, pattern: str, parse_from: str = "body", definitions=None, on_error: str = "send"):
    """ExtractGrokPatterns as a stage: expand → regex_parser, typed casts.

    Reference: ``pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:18-120``.
    """
    from pyspark.sql import functions as F

    from ..operators.parsers import regex_parser

    rx, types = expand_grok(pattern, definitions)
    df = regex_parser(df, rx, parse_from=parse_from, on_error=on_error)
    for field, typ in types.items():
        if typ == "int":
            df = df.withColumn(field, F.col(field).try_cast("long"))
        elif typ == "float":
            df = df.withColumn(field, F.col(field).try_cast("double"))
    return df
