"""Stanza parser operators as DataFrame stage functions.

Shared semantics rebuilt from ``pkg/stanza/operator/helper/parser.go:90-247``:
read ``parse_from`` (default ``body``), materialize fields, then run
timestamp / severity / trace sub-parsers. ``on_error`` ∈ {send, drop}
(``helper/transformer.go:142-173,214-224``) is modeled as a ``_parse_error``
flag column: ``send`` keeps flagged rows flowing (fields null), ``drop``
filters them; the pipeline tees flagged rows into an ``_errors`` side output
either way (plans/pipeline.py).

Everything is Column expressions inside whole-stage codegen — the only
Python-worker path is the optional Arrow regex mode (single-pass
``Series.str.extract``), selectable when group count makes N× regexp_extract
a loser.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.severity import severity_number_col, severity_text_col
from ..functions.timefmt import strptime_to_spark

# Default pipeline regex over the FIXTURES.md §1 line grammar; named groups as
# in the reference's regex_parser configs (operator/parser/regex/parser_test.go).
DEFAULT_LOG_PATTERN = (
    r'^(?P<ts>\S+) (?P<sev>\S+) \[(?P<component>[^\]]+)\] '
    r'user=(?P<user>\S+) ip=(?P<ip>\S+) latency_ms=(?P<latency_ms>\d+) msg="(?P<msg>.*)"$'
)


def java_regex(pattern: str) -> str:
    """Python named-group syntax → Java (Spark JVM) named-group syntax.

    Patterns are authored Python-style (``(?P<name>…)``) so the same string
    drives ``re``/pandas on the Arrow path. Java named groups reject
    underscores, and JVM extraction is positional anyway — so names are
    stripped to plain capturing groups (indices are unchanged).
    """
    return re.sub(r"\(\?P<[^>]+>", "(", pattern)


def dedup_entries_last_win(entries: Column, value_type: str | None = None) -> Column:
    """Drop all but the LAST entry per key from an array<struct<key,value>>.

    pcommon.Map upserts tolerate repeated keys (last write wins), and RFC
    5424 §6.3.2 explicitly allows repeated PARAM-NAMEs — but Spark's default
    ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` makes ``map_from_entries``
    abort the whole job on the first duplicate. Every map_from_entries over
    externally-controlled keys goes through this guard so hostile or
    legal-but-odd records degrade instead of failing the stage.

    Shape matters: a fold over the array that only ever re-touches the
    ACCUMULATOR (drop any earlier entry with this key, append the new
    one). The obvious filter+exists formulation references ``entries``
    inside its lambda, and interpreted HOFs do no CSE — when ``entries``
    is itself an expensive parse expression (the syslog structured-data
    chain) that re-evaluated the whole parse per element per probe:
    measured 4× wall on the sf0.1 syslog row. Pass ``value_type`` (the
    struct's value field type, e.g. ``"string"`` or
    ``"map<string,string>"``) so the fold seed is a cast empty-array
    LITERAL; the ``slice(entries, 1, 0)`` fallback types the seed from the
    input but costs one extra evaluation of ``entries`` per record (which
    compounds per nesting level when calls nest). The O(n²) key
    comparisons run over the tiny accumulator only.
    """
    if value_type is not None:
        seed = F.array().cast(f"array<struct<key:string,value:{value_type}>>")
    else:
        seed = F.slice(entries, 1, 0)
    return F.aggregate(
        entries,
        seed,
        lambda acc, e: F.concat(
            F.filter(acc, lambda a: a["key"] != e["key"]), F.array(e)
        ),
    )


def _apply_on_error(df: DataFrame, error_col: Column, on_error: str) -> DataFrame:
    """Attach/merge the _parse_error flag per transformer.go:142-173."""
    flag = error_col if "_parse_error" not in df.columns else (F.col("_parse_error") | error_col)
    df = df.withColumn("_parse_error", flag)
    if on_error.startswith("drop"):
        df = df.filter(~F.col("_parse_error"))
    return df


def regex_parser(
    df: DataFrame,
    pattern: str,
    parse_from: str = "body",
    on_error: str = "send",
    mode: str = "column",
    prefix: str = "",
) -> DataFrame:
    """Named-capture regex parse → one typed column per group.

    Reference: ``pkg/stanza/operator/parser/regex/parser.go:16-67``. The
    reference's memo cache (``regex/cache.go:25-74``) amortizes duplicate
    raw lines in a row-at-a-time engine; vectorized regex makes it
    unnecessary here (a distinct-join rewrite is available via
    ``dedup.distinct_parse`` if a corpus is >90% duplicates).

    mode="column": one JVM rlike (materialized ONCE — the match flag and the
                   _parse_error flag share it; re-deriving it per group
                   measured N extra full regex runs per row) + one
                   regexp_extract per group (codegen, no Python).
    mode="arrow":  single-pass vectorized extract in ONE Arrow batch UDF.
                   RE2-compatible patterns run through pyarrow's C++
                   ``pc.extract_regex`` (no GIL, no per-row Python, match
                   flag for free from struct validity); anything RE2
                   rejects (backrefs, lookaround) falls back to pandas
                   ``Series.str.extract`` with the old JVM-rlike error flag.
    """
    groups = list(re.compile(pattern).groupindex.keys())
    if not groups:
        raise ValueError("pattern must use named groups (?P<name>...)")
    src = F.col(parse_from)

    if mode == "arrow":
        import pyarrow.compute as pc

        try:  # RE2 accepts the pattern? (checked once, on the driver)
            pc.extract_regex(pa.array([], type=pa.string()), pattern)
            re2_ok = True
        except pa.ArrowInvalid:
            re2_ok = False

        fields = ", ".join(f"{prefix}{g} string" for g in groups)
        if re2_ok:
            has_dollar = "$" in pattern

            @F.pandas_udf(f"struct<{fields}, _rxm boolean>")
            def _extract(s: pd.Series) -> pd.DataFrame:
                arr = pa.Array.from_pandas(s, type=pa.string())
                res = pc.extract_regex(arr, pattern)
                out = pd.DataFrame(
                    {
                        f"{prefix}{g}": pc.struct_field(res, g).to_pandas()
                        for g in groups
                    },
                    index=s.index,
                )
                # null input -> null match flag (rlike-on-null semantics)
                matched = pd.Series(
                    pc.if_else(
                        pc.is_valid(arr), pc.is_valid(res), pa.scalar(None, pa.bool_())
                    ).to_pandas().values,
                    index=s.index,
                )
                # Exactness guard, normally a no-op: RE2 reports '' for BOTH
                # an empty-participating group and a non-participating
                # optional group (Python re: None for the latter), and `$`
                # differs on trailing-newline inputs. Rows showing either
                # ambiguity re-run through Python re so the output is
                # bit-identical to the pandas path.
                recheck = pd.Series(False, index=s.index)
                for g in groups:
                    recheck |= out[f"{prefix}{g}"] == ""
                if has_dollar:
                    recheck |= s.str.endswith("\n").fillna(False)
                if recheck.any():
                    subs = s[recheck]
                    sub = subs.str.extract(pattern)
                    sub.columns = [f"{prefix}{g}" for g in groups]
                    for c in sub.columns:
                        out.loc[recheck, c] = sub[c]
                    matched.loc[recheck] = subs.str.contains(pattern, regex=True)
                out["_rxm"] = matched
                return out

            df = df.withColumn("_rx", _extract(src))
            err = ~F.col("_rx._rxm")
        else:

            @F.pandas_udf(f"struct<{fields}>")
            def _extract(s: pd.Series) -> pd.DataFrame:
                out = s.str.extract(pattern)
                out.columns = [f"{prefix}{g}" for g in groups]
                return out

            df = df.withColumn("_rx", _extract(src))
            err = ~src.rlike(java_regex(pattern))
        for g in groups:
            df = df.withColumn(f"{prefix}{g}", F.col(f"_rx.{prefix}{g}"))
        df = _apply_on_error(df, err, on_error)
        return df.drop("_rx")
    jpat = java_regex(pattern)
    mcol = f"_rx_matched_{parse_from}"
    df = df.withColumn(mcol, src.rlike(jpat))
    matched = F.col(mcol)
    for i, g in enumerate(groups, start=1):
        df = df.withColumn(
            f"{prefix}{g}", F.when(matched, F.regexp_extract(src, jpat, i))
        )
    df = _apply_on_error(df, ~matched, on_error)
    return df.drop(mcol)


def json_parser(
    df: DataFrame,
    schema: T.StructType | str,
    parse_from: str = "body",
    parse_to: str | None = None,
    on_error: str = "send",
) -> DataFrame:
    """JSON body → typed struct / promoted columns.

    Reference: ``pkg/stanza/operator/parser/jsonparser/parser.go:29``.
    With ``parse_to=None`` the struct's fields are promoted to top-level
    columns (the common parse_to:attributes flattened model, SURVEY §1.3).
    """
    parsed = F.from_json(F.col(parse_from), schema)
    err = F.col(parse_from).isNotNull() & parsed.isNull()
    if parse_to:
        df = df.withColumn(parse_to, parsed)
    else:
        df = df.withColumn("_j", parsed)
        names = df.schema["_j"].dataType.fieldNames()
        for n in names:
            df = df.withColumn(n, F.col(f"_j.{n}"))
        df = df.drop("_j")
    return _apply_on_error(df, err, on_error)


def json_array_parser(
    df: DataFrame,
    parse_from: str = "body",
    out: str = "parsed",
    element_type: str = "string",
    header: list[str] | None = None,
    on_error: str = "send",
) -> DataFrame:
    """JSON array line → array column; with ``header`` the elements are
    zipped into a map keyed by the header names.

    Reference: ``pkg/stanza/operator/parser/jsonarray/parser.go:29`` (parse
    to slice; the with-header config assigns keys like assign_keys).
    """
    arr = F.from_json(F.col(parse_from), f"array<{element_type}>")
    err = F.col(parse_from).isNotNull() & arr.isNull()
    if header:
        df = df.withColumn(
            out, F.map_from_arrays(F.array(*[F.lit(h) for h in header]), arr)
        )
    else:
        df = df.withColumn(out, arr)
    return _apply_on_error(df, err, on_error)


def scope_name_parser(
    df: DataFrame, parse_from: str, out: str = "scope_name"
) -> DataFrame:
    """Copy a field into the instrumentation scope name.

    Reference: ``pkg/stanza/operator/parser/scope/parser.go:24``,
    ``helper/scope_name.go:26``.
    """
    return df.withColumn(out, F.col(parse_from).cast("string"))


def csv_parser(
    df: DataFrame,
    header: list[str] | None = None,
    parse_from: str = "body",
    delimiter: str = ",",
    on_error: str = "send",
    header_attribute: str | None = None,
    out: str = "attributes",
) -> DataFrame:
    """CSV line → columns named by ``header``.

    Reference: ``pkg/stanza/operator/parser/csv/parser.go:78``,
    ``config.go:41,75-79``. Static ``header`` promotes typed columns via
    ``from_csv`` (codegen). ``header_attribute`` names a COLUMN carrying the
    header per row (dynamic) — the result is a map column ``out`` keyed by
    that row's header tokens (zip of two splits, no Python).
    """
    if (header is None) == (header_attribute is None):
        raise ValueError("csv_parser needs exactly one of header / header_attribute")
    if header_attribute is not None:
        keys = F.split(F.col(header_attribute), re.escape(delimiter))
        vals = F.split(F.col(parse_from), re.escape(delimiter))
        df = df.withColumn(out, F.map_from_arrays(keys, F.slice(vals, 1, F.size(keys))))
        return _apply_on_error(
            df,
            F.col(parse_from).isNotNull() & (F.size(vals) != F.size(keys)),
            on_error,
        )
    ddl = ", ".join(f"`{h}` string" for h in header)
    parsed = F.from_csv(F.col(parse_from), ddl, {"sep": delimiter})
    df = df.withColumn("_c", parsed)
    for h in header:
        df = df.withColumn(h, F.col(f"_c.`{h}`"))
    df = df.drop("_c")
    return _apply_on_error(df, F.col(parse_from).isNotNull() & parsed.isNull(), on_error)


def split_quoted(s: str, delim: str) -> list[str] | None:
    """Port of parseutils.SplitString (parser.go:17-62): split on the
    delimiter OUTSIDE single/double quotes, strip the quotes, honor
    backslash escapes; None on an unterminated quote."""
    result: list[str] = []
    cur: list[str] = []
    dlen = len(delim)
    quote = ""
    escaped = False
    i = 0
    while i < len(s):
        if not quote and s[i : i + dlen] == delim:
            if cur:
                result.append("".join(cur))
                cur = []
            i += dlen
            continue
        ch = s[i]
        if not escaped:
            if not quote and ch in "\"'":
                quote = ch
                i += 1
                continue
            if ch == quote:
                quote = ""
                i += 1
                continue
            escaped = ch == "\\"
        else:
            escaped = False
        cur.append(ch)
        i += 1
    if quote:
        return None
    if cur:
        result.append("".join(cur))
    return result


def keyvalue_parse_py(s: str, delimiter: str, pair_delimiter: str) -> dict | None:
    """parseutils.ParseKeyValuePairs (parser.go:65-81): split pairs
    quote-aware, then each pair on the FIRST delimiter, trimming both."""
    pairs = split_quoted(s, pair_delimiter)
    if pairs is None:
        return None
    out = {}
    for p in pairs:
        kv = p.split(delimiter, 1)
        if len(kv) != 2:
            continue
        out[kv[0].strip()] = kv[1].strip()
    return out


def keyvalue_map_col(src: Column, delimiter: str = "=", pair_delimiter: str = " ") -> Column:
    """Hybrid k=v parse: rows without quotes/escapes stay on the JVM
    ``str_to_map`` fast path; quoted rows (parseutils.SplitString semantics:
    delimiters inside quotes are literal) take an Arrow fallback."""
    needs_py = src.contains('"') | src.contains("'") | src.contains("\\")
    fast = F.str_to_map(src, F.lit(pair_delimiter), F.lit(delimiter))

    @F.pandas_udf("map<string,string>")
    def slow(s: pd.Series) -> pd.Series:
        # the null-gated input means MOST values are null on typical
        # corpora — mask first so Python touches only the quoted subset
        # (a .map over the whole series costs one Python call per row even
        # when every value is None)
        mask = s.notna()
        out = pd.Series([None] * len(s), dtype=object)
        if mask.any():
            out[mask.to_numpy()] = [
                keyvalue_parse_py(v, delimiter, pair_delimiter) for v in s[mask]
            ]
        return out

    # the UDF's INPUT is null-gated: unquoted rows ship a null through Arrow
    # (cheap) instead of a string the python side would pointlessly parse —
    # pandas UDFs evaluate unconditionally regardless of the when() branch
    return F.when(needs_py, slow(F.when(needs_py, src))).otherwise(fast)


def keyvalue_parser(
    df: DataFrame,
    parse_from: str = "body",
    out: str = "attributes",
    delimiter: str = "=",
    pair_delimiter: str = " ",
) -> DataFrame:
    """k=v pairs → map<string,string>.

    Reference: ``pkg/stanza/operator/parser/keyvalue/parser.go:27`` over
    parseutils.SplitString/ParseKeyValuePairs — quote-aware via the hybrid
    ``keyvalue_map_col`` (JVM ``str_to_map`` for unquoted rows).
    """
    return df.withColumn(
        out, keyvalue_map_col(F.col(parse_from), delimiter, pair_delimiter)
    )


def time_parser(
    df: DataFrame,
    parse_from: str = "ts",
    out: str = "timestamp",
    layout: str = "%Y-%m-%dT%H:%M:%S.%fZ",
    layout_type: str = "strptime",
) -> DataFrame:
    """Event-time parse; layout_type ∈ strptime | spark | epoch_{s,ms,us,ns}.

    Reference: ``pkg/stanza/operator/helper/time.go:24-31,74-123`` with the
    ctimefmt directive table. Spark-parseable layouts run JVM-side
    (``try_to_timestamp``, failure → null, on_error: send); layouts with
    directives Spark cannot parse (%a/%A day names, %Z named zones,
    space-padded %e/%o, %i bare-hour offsets, 9-digit %s) take a vectorized
    pandas fallback with the same null-on-failure contract.
    """
    from ..functions.timefmt import spark_safe_layout, strptime_arrow_parser

    src = F.col(parse_from)
    if layout_type == "strptime" and not spark_safe_layout(layout):
        import pandas as pd  # noqa: F401

        parse = strptime_arrow_parser(layout)

        @F.pandas_udf("timestamp")
        def _parse_ts(s: pd.Series) -> pd.Series:
            return parse(s)

        return df.withColumn(out, _parse_ts(src.cast("string")))
    if layout_type == "strptime":
        from ..functions.timefmt import layout_has_year

        fmt = strptime_to_spark(layout)
        col = F.try_to_timestamp(src, F.lit(fmt))
        if not layout_has_year(layout):
            # SetMissingYear: anchor year-less layouts to the current year
            # (Spark's parser defaults them to 1970)
            import datetime as _dt

            col = col + F.make_interval(years=F.lit(_dt.datetime.now().year - 1970))
    elif layout_type == "spark":
        col = F.try_to_timestamp(src, F.lit(layout))
    elif layout_type == "epoch_s":
        col = F.timestamp_seconds(src.cast("double"))
    elif layout_type == "epoch_ms":
        col = F.timestamp_millis(src.cast("long"))
    elif layout_type == "epoch_us":
        col = F.timestamp_micros(src.cast("long"))
    elif layout_type == "epoch_ns":
        col = F.timestamp_micros((src.cast("long") / 1000).cast("long"))
    else:
        raise ValueError(f"unknown layout_type {layout_type!r}")
    return df.withColumn(out, col)


def severity_parser(
    df: DataFrame,
    parse_from: str = "sev",
    mapping: dict | None = None,
    preset: str = "default",
    overwrite_text: bool = True,
) -> DataFrame:
    """Raw token → (severity_number, severity_text).

    Reference: ``pkg/stanza/operator/helper/severity_builder.go:18-105`` and
    the SeverityConfig contract (``Preset``, ``Mapping``, ``OverwriteText``).

    ``mapping`` entries extend/OVERRIDE the builtin mapping (severity_test.go
    "override-standard"): key = level alias or enum number; value = string
    (case-insensitive), number, ``{"min": a, "max": b}`` range, HTTP "2xx"..
    "5xx" shorthand, or a list of those. ``preset="none"`` drops the builtin
    mapping entirely. ``overwrite_text=True`` emits the canonical level text
    (our engine default — routing keys on it); ``False`` keeps the raw token
    as SeverityText like the reference's default.

    Implemented as a constant-folded literal-map lookup over the normalized
    token (exact matches — aliases, enum ints, custom strings/numbers) plus
    a when-chain for range criteria. A pure when-chain is measured ~30×
    slower here: CollapseProject inlines ``lower(trim(x))`` into every
    branch (no CSE across CaseWhen branches) and the 46-branch chain falls
    out of codegen. r6: the r5 broadcast-join against a createDataFrame dim
    computed the same values but paid ~2 s of fixed driver+broadcast cost
    per query (measured flat from sf0.1 to sf1); the folded map literal has
    zero fixed cost and the same per-row lookup work.
    """
    from ..functions.severity import NUMBER_TO_CANONICAL_TEXT, SEVERITY_TEXT_TO_NUMBER

    base: dict[str, int] = {} if preset == "none" else dict(SEVERITY_TEXT_TO_NUMBER)
    if preset != "none":
        for i in range(1, 25):
            base[str(i)] = i

    def _level_number(key: str) -> int:
        k = str(key).lower()
        if k in SEVERITY_TEXT_TO_NUMBER:
            return SEVERITY_TEXT_TO_NUMBER[k]
        return int(k)

    ranges: list[tuple[int, int, int]] = []  # (lo, hi, level)
    for key, crit in (mapping or {}).items():
        level = _level_number(key)
        for c in crit if isinstance(crit, list) else [crit]:
            if isinstance(c, dict):
                ranges.append((int(c["min"]), int(c["max"]), level))
            elif isinstance(c, str) and c in ("2xx", "3xx", "4xx", "5xx"):
                lo = int(c[0]) * 100
                ranges.append((lo, lo + 99, level))
            else:
                base[str(c).lower()] = level  # custom overrides builtin

    norm = F.lower(F.trim(F.col(parse_from)))
    if base:
        # all-literal create_map constant-folds to one Literal MapData at
        # plan time; try_element_at gives the join's null-on-no-match
        # semantics regardless of the session's ANSI setting
        num_map = F.create_map(
            *[x for k, v in base.items() for x in (F.lit(k), F.lit(v).cast("int"))]
        )
        text_map = F.create_map(
            *[
                x
                for k, v in base.items()
                for x in (F.lit(k), F.lit(NUMBER_TO_CANONICAL_TEXT[v]))
            ]
        )
        df = df.withColumn("_sev_norm", norm)
        df = (
            df.withColumn("_dim_num", F.try_element_at(num_map, F.col("_sev_norm")))
            .withColumn("_dim_text", F.try_element_at(text_map, F.col("_sev_norm")))
            .drop("_sev_norm")
        )
    else:
        df = df.withColumn("_dim_num", F.lit(None).cast("int")).withColumn(
            "_dim_text", F.lit(None).cast("string")
        )
    num = F.col("_dim_num")
    as_num = F.trim(F.col(parse_from)).try_cast("double")
    for lo, hi, level in ranges:
        num = F.coalesce(num, F.when(as_num.between(lo, hi), F.lit(level)))
    df = df.withColumn("severity_number", F.coalesce(num, F.lit(0)).cast("int"))
    if overwrite_text:
        from ..functions.severity import severity_text_col

        df = df.withColumn(
            "severity_text",
            F.coalesce(F.col("_dim_text"), severity_text_col(F.col("severity_number"))),
        )
    else:
        # reference default: SeverityText = the raw token, even when the
        # level is unmapped (severity_test.go "unknown": Default + "blah")
        df = df.withColumn("severity_text", F.col(parse_from).cast("string"))
    return df.drop("_dim_num", "_dim_text")


def trace_parser(
    df: DataFrame, trace_id_from: str = "trace_id_hex", span_id_from: str | None = None
) -> DataFrame:
    """Hex strings → binary trace/span ids (``operator/parser/trace``)."""
    df = df.withColumn("trace_id", F.unhex(F.col(trace_id_from)))
    if span_id_from:
        df = df.withColumn("span_id", F.unhex(F.col(span_id_from)))
    return df


def uri_parser(df: DataFrame, parse_from: str, prefix: str = "uri_") -> DataFrame:
    """URL → scheme/host/port/path/query columns plus the parsed query-param
    map (parseutils.ParseURI queryToMap, ``internal/coreinternal/parseutils/
    uri.go:22-31,86-88``)."""
    src = F.col(parse_from)
    query = F.parse_url(src, F.lit("QUERY"))
    return (
        df.withColumn(f"{prefix}scheme", F.parse_url(src, F.lit("PROTOCOL")))
        .withColumn(f"{prefix}host", F.parse_url(src, F.lit("HOST")))
        .withColumn(f"{prefix}path", F.parse_url(src, F.lit("PATH")))
        .withColumn(f"{prefix}query", query)
        .withColumn(
            f"{prefix}query_params",
            F.when(query.isNotNull() & (query != ""), F.str_to_map(query, F.lit("&"), F.lit("="))),
        )
    )


# --- syslog parser (RFC3164 / RFC5424) ---------------------------------------
# Reference: pkg/stanza/operator/parser/syslog/parser.go:115, config.go:22-23.
_RFC3164_RE = (
    r"^<(?P<priority>\d{1,3})>(?P<ts>[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) (?P<appname>[^:\[ ]+)(?:\[(?P<pid>\d+)\])?: ?(?P<message>.*)$"
)
# one SD-ELEMENT, escape-aware: ']' inside a param value is written '\]' per
# RFC5424 §6.3.3, so the element body is runs of non-']'/non-'\' chars broken
# by escape pairs
_SD_ELEM_RX = r"\[[^\]\\]*(?:\\.[^\]\\]*)*\]"
_RFC5424_RE = (
    r"^<(?P<priority>\d{1,3})>(?P<version>\d) (?P<ts>\S+) (?P<hostname>\S+) "
    r"(?P<appname>\S+) (?P<procid>\S+) (?P<msgid>\S+) "
    r"(?P<structured>-|(?:" + _SD_ELEM_RX + r")+) ?(?P<message>.*)$"
)


def parse_structured_data(col: Column) -> Column:
    """RFC5424 STRUCTURED-DATA → ``map<sd_id, map<param, value>>``.

    The reference parses SD elements into nested attribute maps
    (``operator/parser/syslog/parser.go:115`` via go-syslog's SD rules);
    the raw ``[id k="v" ...]`` capture alone loses those fields. Pure
    Column expressions: extract elements (escape-aware), split each into
    id + ``k="v"`` params, unescape ``\\" \\] \\\\`` in values, assemble
    with map_from_entries. NILVALUE ``-`` (and empty/null) → null map.
    """
    elems = F.regexp_extract_all(col, F.lit(r"\[([^\]\\]*(?:\\.[^\]\\]*)*)\]"), 1)
    param_rx = r'[^\s=\]"]+="[^"\\]*(?:\\.[^"\\]*)*"'

    def _entry(e: Column) -> Column:
        # r6: the per-element/per-param field splits use plain string ops
        # instead of regexes — a matched PARAM is exactly k="v" with no '='
        # in k (param_rx above guarantees it), so substring math extracts k
        # and v; the unescape regexp_replace only runs when a backslash is
        # actually present. Same output, ~half the SD-parse CPU (measured).
        sd_id = F.substring_index(e, " ", 1)
        params = F.regexp_extract_all(e, F.lit("(" + param_rx + ")"), 1)

        def _val(p: Column) -> Column:
            k_len = F.length(F.substring_index(p, "=", 1))
            raw = F.substring(p, k_len + F.lit(3), F.length(p) - k_len - F.lit(3))
            return F.when(
                p.contains("\\"), F.regexp_replace(raw, r'\\([\\"\]])', r"$1")
            ).otherwise(raw)

        kv = F.transform(
            params,
            lambda p: F.struct(
                F.substring_index(p, "=", 1).alias("key"),
                _val(p).alias("value"),
            ),
        )
        # RFC 5424 §6.3.2 allows repeated PARAM-NAME — keep the last
        # (pcommon.Map upsert semantics) instead of DUPLICATED_MAP_KEY.
        return F.struct(
            sd_id.alias("key"),
            F.map_from_entries(dedup_entries_last_win(kv, "string")).alias("value"),
        )

    return F.when(
        col.isNotNull() & (col != "-") & (col != ""),
        F.map_from_entries(
            dedup_entries_last_win(F.transform(elems, _entry), "map<string,string>")
        ),
    )


def syslog_parser(
    df: DataFrame, parse_from: str = "body", protocol: str = "rfc5424", on_error: str = "send",
    mode: str = "arrow", enable_octet_counting: bool = False,
) -> DataFrame:
    """RFC3164 / RFC5424 syslog parse with severity/facility from PRI.

    severity = priority % 8 (syslog severity 0-7, mapped to the stanza enum:
    0 Emergency→23, 1 Alert→22, 2 Crit→21, 3 Error→17, 4 Warning→13,
    5 Notice→10, 6 Info→9, 7 Debug→5 — severity_builder.go's syslog table),
    facility = priority / 8.

    Defaults to the arrow regex mode: the syslog patterns carry 6-9 capture
    groups, and ONE vectorized ``str.extract`` beats N JVM
    ``regexp_extract`` evaluations of the same pattern ~2.5× at that group
    count (measured at sf0.1; pass ``mode="column"`` to stay JVM-only).
    """
    if enable_octet_counting:
        # RFC 6587 octet-counting frame: strip the `123 ` length prefix and
        # parse the remainder (parser.go:202-205, octetCountingPrefixRegex)
        df = df.withColumn(
            parse_from, F.regexp_replace(F.col(parse_from), r"^[1-9]\d*\s", "")
        )
    pat = _RFC5424_RE if protocol == "rfc5424" else _RFC3164_RE
    df = regex_parser(df, pat, parse_from=parse_from, on_error=on_error, mode=mode)
    pri = F.col("priority").try_cast("int")
    sev_map = [23, 22, 21, 17, 13, 10, 9, 5]
    sev = F.pmod(pri, F.lit(8))
    chain = None
    for i, v in enumerate(sev_map):
        chain = F.when(sev == i, v) if chain is None else chain.when(sev == i, v)
    df = df.withColumn("severity_number", F.coalesce(chain, F.lit(0)).cast("int"))
    df = df.withColumn("facility", (pri / 8).cast("int"))
    if protocol == "rfc5424":
        df = df.withColumn(
            "structured_data", parse_structured_data(F.col("structured"))
        )
        df = time_parser(df, "ts", "timestamp", "%Y-%m-%dT%H:%M:%S.%fZ")
        df = df.withColumn(
            "timestamp",
            F.coalesce(
                F.col("timestamp"),
                F.try_to_timestamp(F.col("ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
                F.try_to_timestamp(F.col("ts"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
            ),
        )
    else:
        # RFC3164 "Jan _2 15:04:05": space-padded day normalized, year-less
        # layout anchors to the current year (time_parser SetMissingYear)
        df = df.withColumn("ts", F.regexp_replace(F.col("ts"), r"(\w{3})  (\d)", r"$1 0$2"))
        df = time_parser(df, "ts", "timestamp", "%b %d %H:%M:%S")
    return df


# --- container parser (docker / containerd / cri-o auto-detect) -------------
# Reference regexes: operator/parser/container/parser.go:31-43
_CRIO_RE = r"^(?P<time>[^ Z]+Z?) (?P<stream>stdout|stderr) (?P<logtag>[PF]) ?(?P<log>.*)$"
_CONTAINERD_RE = r"^(?P<time>[^ ^Z]+Z) (?P<stream>stdout|stderr) (?P<logtag>[PF]) ?(?P<log>.*)$"
_DOCKER_MARK = r'^\{"log":'


def container_parser(df: DataFrame, parse_from: str = "body") -> DataFrame:
    """Auto-detect docker(JSON)/containerd/cri-o line format and parse.

    Reference: ``operator/parser/container/parser.go:31-43,178``. Partial-line
    recombine (logtag='P') is the ``transformers.recombine`` stage.
    """
    src = F.col(parse_from)
    jre = java_regex(_CONTAINERD_RE)
    # Materialize the parsed-JSON struct and both format flags ONCE: inlined,
    # each output column re-evaluated from_json / the CRI rlike per reference
    # (7 from_json + 8 rlike per row in the r5 plan — no CSE across
    # projection expressions). CollapseProject keeps non-cheap
    # multi-referenced aliases in their own projection, so each now runs
    # exactly once per row.
    df = df.withColumn(
        "_ct_docker", F.from_json(src, "log string, stream string, time string")
    )
    df = df.withColumn(
        "_ct_is_docker", src.rlike(_DOCKER_MARK) & F.col("_ct_docker").isNotNull()
    ).withColumn("_ct_is_cri", src.rlike(jre))
    docker = F.col("_ct_docker")
    is_docker = F.col("_ct_is_docker")
    is_cri = F.col("_ct_is_cri")
    return (
        df.withColumn(
            "container_format",
            F.when(is_docker, "docker").when(is_cri, "containerd").otherwise(None),
        )
        .withColumn(
            "log",
            F.when(is_docker, docker["log"]).when(
                is_cri, F.regexp_extract(src, jre, 4)
            ),
        )
        .withColumn(
            "stream",
            F.when(is_docker, docker["stream"]).when(
                is_cri, F.regexp_extract(src, jre, 2)
            ),
        )
        .withColumn(
            "logtag", F.when(is_cri, F.regexp_extract(src, jre, 3))
        )
        .withColumn(
            "container_time",
            F.when(is_docker, docker["time"]).when(
                is_cri, F.regexp_extract(src, jre, 1)
            ),
        )
        .drop("_ct_docker", "_ct_is_docker", "_ct_is_cri")
    )


# container log file path → k8s metadata
# (operator/parser/container/parser.go:34 logpathPattern)
_LOGPATH_RE = (
    r"^.*[\/\\](?P<namespace>[^_]+)_(?P<pod_name>[^_]+)_"
    r"(?P<uid>[a-f0-9\-]+)[\/\\](?P<container_name>[^\._]+)[\/\\]"
    r"(?P<restart_count>\d+)\.log(\.\d{8}-\d{6})?$"
)


def container_logpath_metadata(df: DataFrame, path_col: str = "_input_file") -> DataFrame:
    """Extract k8s metadata from the kubelet log path layout
    ``.../<namespace>_<pod>_<uid>/<container>/<restart>.log``
    (container/parser.go:34 + addMetadataFromFilePath)."""
    jre = java_regex(_LOGPATH_RE)
    src = F.col(path_col)
    matched = src.rlike(jre)

    def grp(i):
        return F.when(matched, F.regexp_extract(src, jre, i))

    return (
        df.withColumn("k8s_namespace_name", grp(1))
        .withColumn("k8s_pod_name", grp(2))
        .withColumn("k8s_pod_uid", grp(3))
        .withColumn("k8s_container_name", grp(4))
        .withColumn("k8s_container_restart_count", grp(5))
    )


def container_recombine_partials(
    df: DataFrame,
    source_cols: tuple[str, ...] = ("_input_file", "stream"),
    order_col: str = "_line_id",
) -> DataFrame:
    """Join CRI partial lines (logtag 'P') into the next full line
    ('F') — the container parser's internal recombine
    (container/config.go:24: ``is_last_entry: attributes.logtag == 'F'``,
    combine_with ""). docker-JSON rows (logtag null) pass through whole."""
    from .transformers import recombine

    key = F.concat_ws("\x00", *[F.col(c) for c in source_cols])
    df = df.withColumn("_recombine_src", key)
    out = recombine(
        df,
        is_last_entry=F.col("logtag").isNull() | (F.col("logtag") == "F"),
        source_col="_recombine_src",
        order_col=order_col,
        combine_field="log",
        combine_with="",
        agg_extra={
            # constant within a session (the session key concatenates them)
            **{c: F.first(c) for c in source_cols},
            "stream": F.first("stream"),
            "container_format": F.first("container_format"),
            "container_time": F.max("container_time"),
        },
    )
    return out.drop("_recombine_src")
