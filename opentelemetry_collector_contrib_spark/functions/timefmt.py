"""strptime → Spark (JDK DateTimeFormatter) datetime pattern translation.

The reference's time parser accepts ``layout_type: strptime`` layouts
(``pkg/stanza/operator/helper/time.go:24-31,74-123``); Spark's
``to_timestamp`` wants JDK patterns. This table covers the strptime
directives the ctimefmt package supports; unsupported directives raise at
plan-build time (fail fast on the driver, never per row).
"""

from __future__ import annotations

_MAP = {
    "%Y": "yyyy", "%y": "yy",
    "%m": "MM", "%b": "MMM", "%B": "MMMM",
    "%d": "dd", "%e": "d",
    "%j": "DDD",
    "%H": "HH", "%I": "hh", "%l": "h",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",   # microseconds (python-style; stanza uses %s/%i/%ms variants too)
    "%L": "SSS",      # milliseconds
    "%s": "SSSSSS",
    "%i": "SSS",
    "%p": "a",
    "%z": "xx", "%Z": "zz",
    "%a": "EEE", "%A": "EEEE",
    "%%": "%",
}


def strptime_to_spark(layout: str) -> str:
    """Translate a strptime layout to a Spark datetime pattern.

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
            if d not in _MAP:
                raise ValueError(f"unsupported strptime directive {d!r} in {layout!r}")
            flush_literal()
            out.append(_MAP[d])
            i += 2
        else:
            lit.append(c)
            i += 1
    flush_literal()
    return "".join(out)
