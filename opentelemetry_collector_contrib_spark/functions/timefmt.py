"""strptime/ctime layout handling for the time parser.

The reference's ``layout_type: strptime`` layouts follow the ctimefmt
directive table (``internal/coreinternal/timeutils/internal/ctimefmt/
ctimefmt.go:31-70``) — that table is authoritative here: %s is NANOseconds,
%i/%j/%k/%w are timezone offsets (-07 / -07:00 / -07:00:00 / -070000), %q/%g
are non-padded month/day, %e/%o space-padded day/month.

Two execution paths:
- ``strptime_to_spark``: translate to a Spark (JDK) datetime pattern when
  every directive is Spark-PARSEABLE — the JVM/codegen fast path.
- ``strptime_arrow_parser``: directives Spark cannot parse (day-of-week
  %a/%A — "not allowed for parsing" per Spark's datetime-pattern doc, named
  zones %Z, space-padded %e/%o, bare-hour offset %i, 9-digit %s) fall back
  to a vectorized pandas parse with ctimefmt-faithful preprocessing. Named
  zones parse with offset 0 exactly like Go ``time.Parse`` without a
  location database.

``spark_safe_layout`` decides which path ``parsers.time_parser`` takes at
plan-build time; unsupported directives raise on the driver, never per row.
"""

from __future__ import annotations

import re

# ctimefmt directive → Spark/JDK pattern, for the Spark-parseable subset
_SPARK_MAP = {
    "%Y": "yyyy", "%y": "yy",
    "%m": "MM", "%q": "M",
    "%b": "MMM", "%h": "MMM", "%B": "MMMM",
    "%d": "dd", "%g": "d",
    "%H": "HH", "%I": "hh", "%l": "h",
    "%M": "mm", "%S": "ss",
    "%L": "SSS",        # milliseconds
    "%f": "SSSSSS",     # microseconds
    "%p": "a", "%P": "a",
    "%z": "XX",         # Z0700: Z or ±hhmm
    "%w": "XXXX",       # -070000
    "%j": "XXX",        # -07:00  (ctimefmt: tz offset, NOT day-of-year)
    "%k": "XXXXX",      # -07:00:00
    "%n": "\n", "%t": "\t",
    "%%": "%",
    # compound directives (ctimefmt.go:60-70)
    "%D": "MM/dd/yyyy", "%x": "MM/dd/yyyy",
    "%F": "yyyy-MM-dd",
    "%T": "HH:mm:ss", "%X": "HH:mm:ss",
    "%r": "hh:mm:ss a", "%R": "HH:mm",
}

# parseable only via the Arrow fallback
_ARROW_ONLY = {"%a", "%A", "%Z", "%e", "%o", "%i", "%s", "%c"}

_DIRECTIVE = re.compile(r"%.")

_YEAR_DIRECTIVES = {"%Y", "%y", "%D", "%x", "%F", "%c"}


def directives(layout: str) -> list[str]:
    return _DIRECTIVE.findall(layout)


def layout_has_year(layout: str) -> bool:
    return any(d in _YEAR_DIRECTIVES for d in directives(layout))


def spark_safe_layout(layout: str) -> bool:
    ds = directives(layout)
    if any(d in _ARROW_ONLY for d in ds):
        return False
    unknown = [d for d in ds if d not in _SPARK_MAP]
    if unknown:
        raise ValueError(f"unsupported strptime directive(s) {unknown} in {layout!r}")
    return True


def strptime_to_spark(layout: str) -> str:
    """Translate a ctimefmt strptime layout to a Spark datetime pattern.

    Literal text is quoted where it could collide with pattern letters
    (e.g. the ``T`` and ``Z`` in ISO-8601 layouts).
    """
    out: list[str] = []
    lit: list[str] = []

    def flush_literal():
        if not lit:
            return
        s = "".join(lit)
        if any(c.isalpha() for c in s):
            out.append("'" + s.replace("'", "''") + "'")
        else:
            out.append(s)
        lit.clear()

    i = 0
    while i < len(layout):
        c = layout[i]
        if c == "%" and i + 1 < len(layout):
            d = layout[i : i + 2]
            if d not in _SPARK_MAP:
                raise ValueError(f"unsupported strptime directive {d!r} in {layout!r}")
            flush_literal()
            out.append(_SPARK_MAP[d])
            i += 2
        else:
            lit.append(c)
            i += 1
    flush_literal()
    return "".join(out)


# ---------------------------------------------------------- Arrow fallback

# ctimefmt → python strptime (python is lenient about zero padding, so the
# padded/non-padded variants collapse)
_PY_MAP = {
    "%Y": "%Y", "%y": "%y",
    "%m": "%m", "%o": "%m", "%q": "%m",
    "%b": "%b", "%h": "%b", "%B": "%B",
    "%d": "%d", "%e": "%d", "%g": "%d",
    "%a": "%a", "%A": "%A",
    "%H": "%H", "%I": "%I", "%l": "%I",
    "%p": "%p", "%P": "%p",
    "%M": "%M", "%S": "%S",
    "%L": "%f", "%f": "%f", "%s": "%f",  # fraction; %s pre-truncated to 6
    "%z": "%z", "%w": "%z", "%j": "%z", "%k": "%z", "%i": "%z",
    "%Z": "%Z",  # handled by stripping (Go-without-location = offset 0)
    "%n": "\n", "%t": "\t", "%%": "%%",
    "%D": "%m/%d/%Y", "%x": "%m/%d/%Y",
    "%F": "%Y-%m-%d",
    "%T": "%H:%M:%S", "%X": "%H:%M:%S",
    "%r": "%I:%M:%S %p", "%R": "%H:%M",
    "%c": "%a %b %d %H:%M:%S %Y",
}


def _to_python_layout(layout: str) -> str:
    out = []
    i = 0
    while i < len(layout):
        if layout[i] == "%" and i + 1 < len(layout):
            d = layout[i : i + 2]
            if d not in _PY_MAP:
                raise ValueError(f"unsupported strptime directive {d!r} in {layout!r}")
            out.append(_PY_MAP[d])
            i += 2
        else:
            out.append(layout[i])
            i += 1
    return "".join(out)


_ZONE_ABBREV = re.compile(r"\b[A-Z]{3,5}\b")
_LONG_FRACTION = re.compile(r"(\.\d{6})\d+")
_BARE_HOUR_OFFSET = re.compile(r"([+-]\d{2})(?!\d|:)")


def strptime_arrow_parser(layout: str):
    """Build a pandas-vectorized parser for an Arrow-fallback layout.

    Returns ``fn(pd.Series[str]) -> pd.Series[datetime64]`` implementing the
    ctimefmt semantics Python's strptime can't express directly:
    - ``%Z`` named zone: token stripped, offset 0 (Go without a location DB)
    - ``%s`` 9-digit fraction: truncated to microseconds
    - ``%i`` bare-hour offset ``-07``: normalized to ``-0700``
    """
    ds = set(directives(layout))
    pylayout = _to_python_layout(layout.replace("%Z", "\x00Z\x00"))
    strip_zone = "%Z" in ds
    pylayout = pylayout.replace("\x00Z\x00", "").strip()

    def parse(s):
        import pandas as pd

        s = s.astype(str)
        if strip_zone:
            s = s.str.replace(_ZONE_ABBREV, "", regex=True)
            s = s.str.replace(re.compile(r"\s+"), " ", regex=True).str.strip()
        if "%s" in ds:
            s = s.str.replace(_LONG_FRACTION, r"\1", regex=True)
        if "%i" in ds:
            s = s.str.replace(_BARE_HOUR_OFFSET, r"\g<1>00", regex=True)
        out = pd.to_datetime(s, format=pylayout, errors="coerce", utc=True)
        out = out.dt.tz_localize(None)
        if not layout_has_year(layout):
            # SetMissingYear (timeutils): a layout without a year directive
            # anchors to the current year (python strptime defaults to 1900)
            import datetime as _dt

            out = out + pd.DateOffset(years=_dt.datetime.now().year - 1900)
        return out

    return parse
