"""OTTL-subset → pyspark Column compiler.

The reference parses OTTL with participle into an AST and compiles closures
executed per row (``pkg/ottl/parser.go:290-374``, grammar
``pkg/ottl/grammar.go:16-520``). Here the same surface syntax compiles ONCE
on the driver into a Catalyst Column tree — execution is whole-stage-codegen
columnar, the optimizer sees through every expression.

Supported subset (tracks ``pkg/ottl/LANGUAGE.md``):
- statements  ``Editor(args...) [where <bool expr>]``
- paths       ``body``, ``attributes["k"]``, ``resource.attributes["k"]``,
              ``severity_number`` … resolved by a configurable PathResolver
              (flat typed-column model by default, SURVEY §1.3)
- literals    "str", 123, 1.5, true/false, nil, 0x0A… bytes
- operators   == != < <= > >= ; and / or / not ; + - * / ; ( )
- editors     set, delete_key, delete_matching_keys, keep_keys,
              keep_matching_keys, replace_pattern, replace_all_patterns,
              replace_match, truncate_all, limit, append
- converters  the registry below (~60 functions, each mapping to a builtin
              pyspark.sql.function — no Python UDFs)

Error modes (``pkg/ottl/config.go:12-26``): ``ignore``/``silent`` compile
casts to try_* forms (null on failure); ``propagate`` uses strict forms so a
bad row fails the task.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------- lexer

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<hexbytes>0x[0-9a-fA-F]+)
  | (?P<float>-?\d+\.\d+)
  | (?P<int>-?\d+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<op>==|!=|<=|>=|=>|=|<|>|\+|-|\*|/|%|\(|\)|\[|\]|\{|\}|:|,|\.)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
""",
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str


def tokenize(s: str) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    while i < len(s):
        m = TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"OTTL lex error at {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Tok(kind, m.group()))
    return out


# ----------------------------------------------------------------------- AST

@dataclass
class Lit:
    value: object


@dataclass
class Path:
    parts: list  # list of str | ("key", str)


@dataclass
class Call:
    name: str
    args: list
    kwargs: dict = field(default_factory=dict)  # named args (grammar.go)


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class Lambda:
    formals: list  # list[str]; "_" = blank
    body: object


@dataclass
class ListNode:
    items: list  # AST nodes; elements may be any expression


@dataclass
class Statement:
    editor: Call
    where: object | None


# -------------------------------------------------------------------- parser

class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of OTTL input")
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        t = self.next()
        if t.text != text:
            raise ValueError(f"expected {text!r}, got {t.text!r}")

    # statement := call ('where' orexpr)?
    def statement(self) -> Statement:
        call = self.call_or_path()
        if not isinstance(call, Call):
            raise ValueError("statement must start with an editor call")
        where = None
        t = self.peek()
        if t and t.text == "where":
            self.next()
            where = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing input at {self.peek().text!r}")
        return Statement(call, where)

    def or_expr(self):
        left = self.and_expr()
        while (t := self.peek()) and t.text == "or":
            self.next()
            left = BinOp("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.not_expr()
        while (t := self.peek()) and t.text == "and":
            self.next()
            left = BinOp("and", left, self.not_expr())
        return left

    def not_expr(self):
        t = self.peek()
        if t and t.text == "not":
            self.next()
            return Not(self.not_expr())
        return self.comparison()

    def comparison(self):
        left = self.addsub()
        t = self.peek()
        if t and t.text in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next().text
            return BinOp(op, left, self.addsub())
        # expr-lang word operators (stanza `if`/router/filter expressions use
        # github.com/expr-lang/expr — helper/expr_string.go); harmless
        # extension for OTTL inputs since the words never appear there
        if t and t.text in ("matches", "contains", "startsWith", "endsWith"):
            op = self.next().text
            return BinOp(op, left, self.addsub())
        return left

    def addsub(self):
        left = self.muldiv()
        while (t := self.peek()) and t.text in ("+", "-"):
            op = self.next().text
            left = BinOp(op, left, self.muldiv())
        return left

    def muldiv(self):
        left = self.unary()
        while (t := self.peek()) and t.text in ("*", "/", "%"):
            op = self.next().text
            left = BinOp(op, left, self.unary())
        return left

    def unary(self):
        t = self.peek()
        if t and t.text == "(":
            lam = self._try_lambda()
            if lam is not None:
                return lam
            self.next()
            e = self.or_expr()
            self.expect(")")
            return e
        return self.term()

    def _try_lambda(self):
        """``(k, v) => body`` / ``(acc, _, v) => body`` (LambdaExpression,
        pkg/ottl/lambda.go; ``_`` is the blank formal). Backtracks on
        non-lambda parens."""
        start = self.i
        self.next()  # '('
        formals = []
        while True:
            t = self.peek()
            if t is None or t.kind != "ident":
                self.i = start
                return None
            formals.append(self.next().text)
            t = self.peek()
            if t and t.text == ",":
                self.next()
                continue
            break
        if not (self.peek() and self.peek().text == ")"):
            self.i = start
            return None
        self.next()  # ')'
        if not (self.peek() and self.peek().text == "=>"):
            self.i = start
            return None
        self.next()  # '=>'
        return Lambda(formals, self.or_expr())

    def term(self):
        t = self.next()
        if t.text == "[":  # list expr (LANGUAGE.md lists): ["a", body, Int(x)]
            items = []
            if self.peek() and self.peek().text != "]":
                items.append(self.or_expr())
                while self.peek() and self.peek().text == ",":
                    self.next()
                    items.append(self.or_expr())
            self.expect("]")
            if all(isinstance(i, Lit) for i in items):
                return Lit([i.value for i in items])
            return ListNode(items)
        if t.text == "{":  # map literal (grammar.go map values): {"k": v}
            out = {}
            if self.peek() and self.peek().text != "}":
                while True:
                    k = self.next()
                    if k.kind != "string":
                        raise ValueError("map literal keys must be strings")
                    self.expect(":")
                    v = self.or_expr()
                    if not isinstance(v, Lit):
                        raise ValueError("map literal values must be literals")
                    out[k.text[1:-1]] = v.value
                    if self.peek() and self.peek().text == ",":
                        self.next()
                        continue
                    break
            self.expect("}")
            return Lit(out)
        if t.kind == "string":
            return Lit(t.text[1:-1].encode().decode("unicode_escape"))
        if t.kind == "int":
            return Lit(int(t.text))
        if t.kind == "float":
            return Lit(float(t.text))
        if t.kind == "hexbytes":
            return Lit(bytes.fromhex(t.text[2:]))
        if t.kind == "ident":
            if t.text == "true":
                return Lit(True)
            if t.text == "false":
                return Lit(False)
            if t.text == "nil":
                return Lit(None)
            self.i -= 1
            return self.call_or_path()
        raise ValueError(f"unexpected token {t.text!r}")

    def call_or_path(self):
        name = self.next()
        if name.kind != "ident":
            raise ValueError(f"expected identifier, got {name.text!r}")
        t = self.peek()
        if t and t.text == "(":  # function call
            self.next()
            args = []
            kwargs = {}

            def one_arg():
                # named argument: ident '=' expr (grammar.go optional args)
                if (
                    self.peek()
                    and self.peek().kind == "ident"
                    and self.i + 1 < len(self.toks)
                    and self.toks[self.i + 1].text == "="
                ):
                    k = self.next().text
                    self.next()  # '='
                    kwargs[k] = self.or_expr()
                else:
                    args.append(self.or_expr())

            if self.peek() and self.peek().text != ")":
                one_arg()
                while self.peek() and self.peek().text == ",":
                    self.next()
                    one_arg()
            self.expect(")")
            node: object = Call(name.text, args, kwargs)
            # postfix subscript on call results: SliceToMap(...)["1"],
            # SliceToMap(...)[String(x)] (grammar.go converter keys)
            while self.peek() and self.peek().text == "[":
                self.next()
                key = self.or_expr()
                self.expect("]")
                node = Call("__getitem__", [node, key])
            return node
        # path: ident ('.' ident | '[' string ']' | '[' int ']')*
        parts: list = [name.text]
        while (t := self.peek()) is not None:
            if t.text == ".":
                self.next()
                parts.append(self.next().text)
            elif t.text == "[":
                self.next()
                key = self.next()
                if key.kind == "string":
                    parts.append(("key", key.text[1:-1]))
                elif key.kind == "int":
                    parts.append(("idx", int(key.text)))  # 0-based slice index
                else:
                    raise ValueError("map keys must be strings or slice indices ints")
                self.expect("]")
            else:
                break
        return Path(parts)


def parse_statement(s: str) -> Statement:
    return Parser(tokenize(s)).statement()


def parse_condition(s: str):
    p = Parser(tokenize(s))
    e = p.or_expr()
    if p.peek() is not None:
        raise ValueError(f"trailing input at {p.peek().text!r}")
    return e


# ------------------------------------------------------------- path resolver

class PathResolver:
    """Maps OTTL paths onto the flat typed-column model (SURVEY §1.3).

    ``attributes["x"]`` → column ``x`` if promoted, else
    ``element_at(attributes, 'x')`` when an ``attributes`` MapType column
    exists. ``resource.attributes["k.e.y"]`` → column ``k_e_y``. Top-level
    names (body, severity_number, …) → same-named columns. Context prefixes
    ``log.``/``resource.`` are accepted and stripped — UNLESS the frame has
    a ``resource`` MapType column, in which case the model is two-store
    like the reference's per-context pcommon.Map (transformprocessor
    internal/common contexts): ``resource.attributes[...]`` reads/writes
    the ``resource`` map, plain/log ``attributes[...]`` the record map.
    """

    def __init__(self, df: DataFrame | None = None, overrides: dict[str, str] | None = None):
        self.columns = set(df.columns) if df is not None else None
        self.has_attr_map = bool(df is not None and "attributes" in df.columns and
                                 df.schema["attributes"].dataType.typeName() == "map")
        self.has_resource_map = bool(df is not None and "resource" in df.columns and
                                     df.schema["resource"].dataType.typeName() == "map")
        self.dtypes = dict(df.dtypes) if df is not None else {}
        self.overrides = overrides or {}

    def map_store(self, path) -> tuple[str, str] | None:
        """(map_column, key) when ``path`` addresses one entry of a live
        map-typed attribute store; None for flat/promoted columns."""
        if not isinstance(path, Path):
            return None
        parts = list(path.parts)
        if (
            self.has_resource_map
            and len(parts) == 3
            and parts[0] == "resource"
            and parts[1] == "attributes"
            and isinstance(parts[2], tuple)
        ):
            return "resource", parts[2][1]
        if parts and parts[0] in ("log", "resource", "span", "metric", "datapoint"):
            parts = parts[1:]
        if (
            self.has_attr_map
            and len(parts) == 2
            and parts[0] == "attributes"
            and isinstance(parts[1], tuple)
        ):
            name = self.column_name(path)
            if self.columns is None or name not in self.columns:
                return "attributes", parts[1][1]
        return None

    def column_name(self, path: Path) -> str:
        """The flat column an assignment targets."""
        parts = list(path.parts)
        if (
            self.has_resource_map
            and len(parts) == 2
            and parts[0] == "resource"
            and parts[1] == "attributes"
        ):
            return "resource"  # the whole resource attrs map (editor arg)
        if parts and parts[0] in ("log", "resource", "span", "metric", "datapoint"):
            parts = parts[1:]
        if not parts:
            raise ValueError("empty path")
        if parts[0] in ("attributes", "cache") and len(parts) == 2 and isinstance(parts[1], tuple):
            key = parts[1][1]
            name = self.overrides.get(key, key.replace(".", "_"))
            return name
        if len(parts) == 1 and isinstance(parts[0], str):
            return self.overrides.get(parts[0], parts[0])
        # body.field style
        flat = "_".join(p if isinstance(p, str) else str(p[1]) for p in parts)
        return self.overrides.get(flat, flat.replace(".", "_"))

    def resolve(self, path: Path) -> Column:
        # trailing [n] slice indices (grammar.go 0-based subscripts) wrap the
        # resolved prefix in element_at
        raw = list(path.parts)
        idx_suffix: list[int] = []
        while raw and isinstance(raw[-1], tuple) and raw[-1][0] == "idx":
            idx_suffix.insert(0, raw.pop()[1])
        path = Path(raw)
        if self.has_resource_map:
            ms = self.map_store(path)
            if ms is not None and ms[0] == "resource":
                col = F.element_at(F.col("resource"), ms[1])
                for i in idx_suffix:
                    col = F.element_at(col, i + 1)
                return col
        name = self.column_name(path)
        if self.columns is not None and name not in self.columns:
            parts = list(path.parts)
            if parts and parts[0] in ("log", "resource"):
                parts = parts[1:]
            if self.has_attr_map and parts and parts[0] == "attributes" and len(parts) == 2:
                col = F.element_at(F.col("attributes"), parts[1][1])
                for i in idx_suffix:
                    col = F.element_at(col, i + 1)
                return col
            if parts and parts[0] in ("attributes", "cache"):
                # missing attribute reads as nil (pcommon.Map.Get miss) —
                # e.g. Coalesce([attributes["absent"], ...]) must not fail
                return F.lit(None)
        col = F.col(name)
        for i in idx_suffix:
            col = F.element_at(col, i + 1)
        return col


# ------------------------------------------------------- converter registry

def _strict_or_try(error_mode: str, strict: str, lenient: str):
    return lenient if error_mode in ("ignore", "silent") else strict


def build_registry(error_mode: str = "ignore") -> dict:
    """Converter name → Column function. Each maps to a pyspark builtin
    (SURVEY §2.4 table); names match ``pkg/ottl/ottlfuncs`` registrations."""
    cast_mode = "try_cast" if error_mode in ("ignore", "silent") else "cast"

    def cast(c: Column, t: str) -> Column:
        return getattr(c, cast_mode)(t)

    reg: dict[str, object] = {
        # type/coercion
        "Int": lambda c: cast(c, "long"),
        "Double": lambda c: cast(c, "double"),
        "String": lambda c: c.cast("string"),
        "Bool": lambda c: cast(c, "boolean"),
        "Hex": lambda c: F.lower(F.hex(c)),
        # func_parse_int.go: base 0 ⇒ Go-style prefix detection (0x/0o/0b)
        "ParseInt": lambda c, base: _parse_int(c, _as_py(base)),
        # func_coalesce.go takes a LIST argument; varargs kept for back-compat
        "Coalesce": lambda *cs: F.coalesce(
            *[v if isinstance(v, Column) else F.lit(v)
              for v in (cs[0] if len(cs) == 1 and isinstance(cs[0], list) else cs)]
        ),
        # Is{Type} predicates are static truths in the typed-column model
        # (context_inferrer/column pruning make them compile-time): exposed
        # for statement compatibility.
        "IsString": lambda c: c.cast("string").isNotNull() | c.isNull(),
        "IsEmpty": lambda c: (F.length(c.cast("string")) == 0) | c.isNull(),
        # string
        # reference form Concat([vals], delimiter) (func_concat.go:15-18);
        # legacy varargs form Concat(delim, v1, v2, ...) kept for back-compat
        "Concat": lambda a, *rest: (
            F.concat_ws(
                _as_py(rest[0]) if rest else "",
                *[v if isinstance(v, Column) else F.lit(v) for v in a],
            )
            if isinstance(a, list)
            else F.concat_ws(
                a if isinstance(a, str) else "",
                *[v if isinstance(v, Column) else F.lit(v) for v in rest],
            )
        ),
        # func_format.go takes (fmt, [args]); varargs kept for back-compat
        "Format": lambda fmt, *cs: F.format_string(
            _as_py(fmt),
            *[v if isinstance(v, Column) else F.lit(v)
              for v in (cs[0] if len(cs) == 1 and isinstance(cs[0], list) else cs)],
        ),
        "Split": lambda c, d: F.split(c, re.escape(_as_py(d))),
        "Substring": lambda c, s, n: F.substring(c, _as_py(s) + 1, _as_py(n)),
        # func_trim.go: strings.Trim(val, cutset) — 2nd arg is a SET of
        # characters stripped from both ends (default " ")
        "Trim": lambda c, *ch: _trim_cutset(c, _as_py(ch[0])) if ch else F.trim(c),
        "TrimPrefix": lambda c, p: F.regexp_replace(c, "^" + re.escape(_as_py(p)), ""),
        "TrimSuffix": lambda c, s: F.regexp_replace(c, re.escape(_as_py(s)) + "$", ""),
        "ToLowerCase": F.lower,
        "ToUpperCase": F.upper,
        "HasPrefix": lambda c, p: c.startswith(p),
        "HasSuffix": lambda c, s: c.endswith(s),
        "Contains": lambda c, sub: c.contains(sub),
        "ContainsValue": lambda arr, v: F.array_contains(arr, v),
        "Find": lambda c, sub: F.instr(c, _as_py(sub)) - 1,
        "Len": lambda c: F.when(F.lit(True), _len_col(c)),
        # regex
        "IsMatch": lambda c, pat: c.rlike(_jre(pat)),
        "ExtractPatterns": lambda c, pat: _extract_patterns(c, _as_py(pat)),
        "ExtractGrokPatterns": lambda c, pat, *named_only: _extract_grok(c, _as_py(pat)),
        # hash / ids
        "MD5": lambda c: F.md5(c.cast("string")),
        "SHA1": lambda c: F.sha1(c.cast("string")),
        "SHA256": lambda c: F.sha2(c.cast("string"), 256),
        "SHA512": lambda c: F.sha2(c.cast("string"), 512),
        "XXH64": lambda c: F.xxhash64(c),  # JVM-side; the hot-path hash
        # exact reference digests (functions/hashes.py, pinned to the
        # reference's unit-test vectors): func_fnv.go, func_murmur3_hash.go,
        # func_murmur3_hash128.go, func_xxh3.go, func_xxh128.go,
        # func_community_id.go, func_uuidv7.go, func_trace_id.go,
        # func_span_id.go, func_profile_id.go
        "FNV": lambda c: _hashes().fnv_col(c),
        "Murmur3Hash": lambda c: _hashes().murmur3_col(c),
        "Murmur3Hash128": lambda c: _hashes().murmur3_128_col(c),
        "XXH3": lambda c: _hashes().xxh3_col(c),
        "XXH128": lambda c: _hashes().xxh128_col(c),
        "CommunityID": lambda sip, sp, dip, dp, *opt: _hashes().community_id_col(
            sip, sp, dip, dp,
            opt[0] if len(opt) > 0 else "TCP",
            _as_py(opt[1]) if len(opt) > 1 else 0,
        ),
        "UUIDv7": lambda: _hashes().uuid_v7_col(),
        # hex string → fixed-width binary id; wrong length / bad hex ⇒ null
        "TraceID": lambda c: F.when(F.length(c.cast("string")) == 32, F.unhex(c.cast("string"))),
        "SpanID": lambda c: F.when(F.length(c.cast("string")) == 16, F.unhex(c.cast("string"))),
        "ProfileID": lambda c: F.when(F.length(c.cast("string")) == 32, F.unhex(c.cast("string"))),
        # time
        "Time": lambda c, fmt: F.try_to_timestamp(c, F.lit(_strptime(_as_py(fmt)))),
        "FormatTime": lambda c, fmt: F.date_format(c, _strptime(_as_py(fmt))),
        "TruncateTime": lambda c, d: F.date_trunc(_duration_unit(_as_py(d)), c),
        "Now": lambda: F.current_timestamp(),
        "UnixSeconds": lambda c: F.unix_timestamp(c).cast("long"),
        "UnixMilli": lambda c: (F.unix_micros(c) / 1000).cast("long"),
        "UnixMicro": F.unix_micros,
        "UnixNano": lambda c: F.unix_micros(c) * 1000,
        "Hour": F.hour,
        "Minute": F.minute,
        "Second": F.second,
        "Day": F.dayofmonth,
        "Month": F.month,
        "Year": F.year,
        "Weekday": lambda c: F.dayofweek(c) - 1,
        # structured
        # ParseJSON: 1-arg form → flat map<string,string> (the dynamic-body
        # common case); 2-arg form takes a DDL schema for typed extraction.
        # ParseJSON: object → map<string,string>; a literal ARRAY document →
        # array<string> (the reference returns a pcommon.Slice); 2-arg form
        # takes a DDL schema for typed extraction.
        "ParseJSON": lambda c, schema=None: _parse_json(c, schema),
        # func_parse_csv.go: ParseCSV(target, header, delimiter?,
        # headerDelimiter?, mode?) — named args supported (grammar.go)
        "ParseCSV": lambda c, header, delimiter=",", headerDelimiter=",", mode="strict": F.from_csv(
            c,
            ", ".join(
                f"`{h}` string" for h in _as_py(header).split(_as_py(headerDelimiter))
            ),
            {"sep": _as_py(delimiter)},
        ),
        # quote-aware via the hybrid keyvalue parser (parseutils.SplitString)
        "ParseKeyValue": lambda c, d="=", p=" ": _keyvalue_map(c, _as_py(d), _as_py(p)),
        "URL": lambda c: F.struct(
            F.parse_url(c, F.lit("PROTOCOL")).alias("scheme"),
            F.parse_url(c, F.lit("HOST")).alias("host"),
            F.parse_url(c, F.lit("PATH")).alias("path"),
            F.parse_url(c, F.lit("QUERY")).alias("query"),
        ),
        # collections
        "Keys": F.map_keys,
        "Values": F.map_values,
        "Sort": lambda c, *o: F.array_sort(c) if not o or _as_py(o[0]) == "asc" else F.reverse(F.array_sort(c)),
        # func_slice_to_map.go: no key_path ⇒ stringified indices as keys;
        # with key_path the elements are structs/maps keyed by that field
        # (optionally projected to value_path)
        "SliceToMap": lambda arr, *paths: _slice_to_map(
            arr,
            _as_py(paths[0]) if len(paths) > 0 else None,
            _as_py(paths[1]) if len(paths) > 1 else None,
        ),
        # (Index / Find / Eval / __getitem__ are compiled in Compiler —
        # they need static type dispatch or lambda binding)
        # encode / misc
        "Base64Encode": lambda c, *enc: (
            F.translate(F.base64(c.cast("binary")), "+/", "-_")
            if enc and _as_py(enc[0]) == "base64-url"
            else F.base64(c.cast("binary"))
        ),
        "Base64Decode": lambda c: F.unbase64(c).cast("string"),
        "Log": lambda c: F.log(c),
        "UUID": lambda: F.uuid(),
        # registered name in the reference is IsInCIDR (func_is_in_cidr.go);
        # lower-camel alias kept for back-compat with earlier statements
        "IsInCIDR": lambda c, cidr: _is_in_cidr(c, _as_py(cidr)),
        "IsInCidr": lambda c, cidr: _is_in_cidr(c, _as_py(cidr)),
        # func_when.go: When(condition, true_value, false_value)
        "When": lambda cond, t, f: F.when(
            cond if isinstance(cond, Column) else F.lit(bool(cond)),
            t if isinstance(t, Column) else F.lit(t),
        ).otherwise(f if isinstance(f, Column) else F.lit(f)),
        # func_parse_severity.go: map value → level via literal criteria map
        "ParseSeverity": lambda c, mapping: _parse_severity_mapping(c, _as_py(mapping)),
        # casing
        "ToSnakeCase": lambda c: F.lower(F.regexp_replace(F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2"), r"[\s-]+", "_")),
        "ToCamelCase": lambda c: _to_camel(c),
        "ConvertCase": lambda c, mode: _convert_case(c, _as_py(mode)),
        # charset / time extras (func_decode.go, func_duration.go, func_unix.go,
        # func_hours.go..func_nanoseconds.go, func_nanosecond.go)
        # func_decode.go: charset decode, plus the "base64" pseudo-charset;
        # a COLUMN charset branches at runtime (base64 vs utf8 — the two the
        # reference's e2e vectors exercise dynamically)
        "Decode": lambda c, charset: (
            F.when(charset == "base64", F.unbase64(c).cast("string"))
            .otherwise(F.decode(c.cast("binary"), "UTF-8"))
            if isinstance(charset, Column)
            else (
                F.unbase64(c).cast("string")
                if _as_py(charset) == "base64"
                else F.decode(c.cast("binary"), _as_py(charset))
            )
        ),
        "Duration": lambda c: _duration_seconds(c),
        "Unix": lambda c: F.timestamp_seconds(c),
        "Nanosecond": lambda c: (F.unix_micros(c) % 1_000_000) * 1000,
        "Hours": lambda c: c / 3600.0,
        "Minutes": lambda c: c / 60.0,
        "Seconds": lambda c: c.cast("double"),
        "Milliseconds": lambda c: c * 1000.0,
        "Microseconds": lambda c: c * 1_000_000.0,
        "Nanoseconds": lambda c: (c * 1_000_000_000).cast("long"),
        # (IsBool/IsInt/IsDouble/IsList/IsMap/IsString are compiled as static
        # schema predicates in Compiler._type_predicate, not registry calls)
        # func_is_valid_luhn.go — pure HOF math, JVM-side
        "IsValidLuhn": _is_valid_luhn,
        # collections extras
        "MapKeys": F.map_keys,
        "MapValues": F.map_values,
        # (m, delimiter, pair_delimiter, sort_keys) — func_to_key_value_string.go
        "ToKeyValueString": lambda m, d="=", p=" ", sort_keys=False: F.array_join(
            (lambda arr: F.array_sort(arr) if _as_py(sort_keys) else arr)(
                F.transform(
                    F.map_entries(m),
                    lambda e: F.concat(e["key"], F.lit(_as_py(d)), e["value"]),
                )
            ),
            _as_py(p),
        ),
        # xml family (func_get_xml.go, func_parse_xml.go,
        # func_parse_simplified_xml.go, func_insert_xml.go,
        # func_remove_xml.go, func_convert_*_xml.go) — document rewrites via
        # Arrow-batched UDFs in functions/xmlfuncs.py; ParseXML /
        # ParseSimplifiedXML return the dynamic map as a JSON string
        "GetXML": lambda c, xp: _xml().get_xml(c, _as_py(xp)),
        "ParseXML": lambda c: _xml().parse_xml(c),
        "ParseSimplifiedXML": lambda c: _xml().parse_simplified_xml(c),
        "InsertXML": lambda c, xp, sub: _xml().insert_xml(c, _as_py(xp), sub),
        "RemoveXML": lambda c, xp: _xml().remove_xml(c, _as_py(xp)),
        "ConvertAttributesToElementsXML": lambda c, *xp: _xml().convert_attributes_to_elements_xml(
            c, _as_py(xp[0]) if xp else "//@*"
        ),
        "ConvertTextToElementsXML": lambda c, *a: _xml().convert_text_to_elements_xml(
            c,
            _as_py(a[0]) if len(a) > 0 else "/",
            _as_py(a[1]) if len(a) > 1 else "value",
        ),
        # user agent (func_useragent.go): minimal browser/os extraction.
        # regexp_extract returns "" (not null) on no match, so the ua-parser
        # "Other" fallback needs a length check, not coalesce.
        "UserAgent": lambda c: F.struct(
            _or_other(
                F.regexp_extract(c, r"(Firefox|Chrome|Safari|Edge|MSIE|Opera|curl|wget)[/ ]?([\d.]*)", 1)
            ).alias("user_agent_name"),
            F.regexp_extract(c, r"(?:Firefox|Chrome|Safari|Edge|MSIE|Opera|curl|wget)[/ ]?([\d.]*)", 1).alias("user_agent_version"),
            _or_other(
                F.regexp_extract(c, r"\((Windows NT [\d.]+|Macintosh|Linux|Android [\d.]*|iPhone)", 1)
            ).alias("os_name"),
        ),
    }
    return reg


_TYPE_PREDICATES = {
    "IsBool": ("boolean",),
    "IsInt": ("int", "bigint", "smallint", "tinyint"),
    "IsDouble": ("double", "float"),
    "IsString": ("string",),
    "IsList": ("array",),
    "IsMap": ("map", "struct"),
}


def _parse_json(c, schema=None) -> Column:
    ddl = None
    if schema is not None and not isinstance(schema, Column):
        ddl = _as_py(schema)
    if isinstance(c, str):  # literal document: detect array vs object
        ddl = ddl or ("array<string>" if c.lstrip().startswith("[") else "map<string,string>")
        return F.from_json(F.lit(c), ddl)
    return F.from_json(c, ddl or "map<string,string>")


def _slice_to_map(arr: Column, key_path=None, value_path=None) -> Column:
    """func_slice_to_map.go:46-86 — see registry comment."""
    if key_path is None:
        return F.map_from_entries(
            F.transform(
                arr,
                lambda v, i: F.struct(
                    i.cast("string").alias("key"), v.alias("value")
                ),
            )
        )

    def get(e, path):
        for seg in path:
            e = e[seg]
        return e

    def entry(e):
        key = get(e, key_path).cast("string")
        val = get(e, value_path) if value_path else e
        return F.struct(key.alias("key"), val.alias("value"))

    # elements whose key path is missing are skipped (extractValue error →
    # reference returns error per element; lenient mode: drop)
    kept = F.filter(arr, lambda e: get(e, key_path).isNotNull())
    return F.map_from_entries(F.transform(kept, entry))


def _parse_int(c: Column, base: int) -> Column:
    """ParseInt with Go strconv semantics: base 0 auto-detects 0x/0o/0b."""
    if base == 10:
        return c.try_cast("long")
    if base == 0:
        s = c.cast("string")
        return (
            F.when(s.startswith("0x") | s.startswith("0X"),
                   F.conv(F.substring(s, 3, 64), 16, 10).cast("long"))
            .when(s.startswith("0b") | s.startswith("0B"),
                  F.conv(F.substring(s, 3, 64), 2, 10).cast("long"))
            .when(s.startswith("0o") | s.startswith("0O"),
                  F.conv(F.substring(s, 3, 64), 8, 10).cast("long"))
            .otherwise(s.try_cast("long"))
        )
    return F.conv(c, base, 10).cast("long")


def _duration_seconds(c: Column) -> Column:
    """Duration("1h22m33s") → seconds as double (func_duration.go: Go
    time.ParseDuration subset h/m/s/ms/us/ns)."""
    num = lambda unit: F.coalesce(  # noqa: E731
        F.regexp_extract(c, r"([\d.]+)" + unit, 1).try_cast("double"), F.lit(0.0)
    )
    return (
        num(r"h") * 3600
        + num(r"m(?![s])") * 60
        + num(r"(?<![mun])s")
        + num(r"ms") / 1e3
        + num(r"us") / 1e6
        + num(r"ns") / 1e9
    )


def _is_valid_luhn(c: Column) -> Column:
    """Luhn checksum over the digit string, pure Column math.

    Reverse the digits; double every 2nd; sum digit-sums; valid iff %10==0.
    """
    digits = F.reverse(F.split(F.regexp_replace(c.cast("string"), r"\D", ""), ""))
    digits = F.filter(digits, lambda d: d != "")
    summed = F.aggregate(
        F.zip_with(
            digits,
            F.sequence(F.lit(0), F.greatest(F.size(digits) - 1, F.lit(0))),
            lambda d, i: F.when(
                i % 2 == 1,
                F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9).otherwise(d.cast("int") * 2),
            ).otherwise(d.cast("int")),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (F.length(F.regexp_replace(c.cast("string"), r"\D", "")) > 1) & (summed % 10 == 0)


def _extract_patterns(c: Column, pattern: str) -> Column:
    """ExtractPatterns: named groups → map<group, match>
    (func_extract_patterns.go)."""
    import re as _re2

    from ..operators.parsers import java_regex

    groups = list(_re2.compile(pattern).groupindex.keys())
    jpat = java_regex(pattern)
    return F.map_from_arrays(
        F.array(*[F.lit(g) for g in groups]),
        F.array(*[F.regexp_extract(c, jpat, i) for i in range(1, len(groups) + 1)]),
    )


def _extract_grok(c: Column, pattern: str) -> Column:
    """ExtractGrokPatterns: grok expand at compile time, then same shape."""
    from .grok import expand_grok

    rx, _types = expand_grok(pattern)
    return _extract_patterns(c, rx)


def _parse_severity_mapping(c: Column, mapping: dict) -> Column:
    """ParseSeverity (func_parse_severity.go): first level whose criteria
    list matches wins, in mapping order. Criteria: string/int equals,
    {"range": {"min": m, "max": M}}, and the HTTP shorthands "2xx".."5xx"."""
    expr = None
    num = c.cast("double")
    for level, criteria in mapping.items():
        cond = F.lit(False)
        for crit in criteria if isinstance(criteria, list) else [criteria]:
            if isinstance(crit, dict) and "range" in crit:
                r = crit["range"]
                cond = cond | ((num >= float(r["min"])) & (num <= float(r["max"])))
            elif isinstance(crit, str) and crit in ("2xx", "3xx", "4xx", "5xx"):
                lo = int(crit[0]) * 100
                cond = cond | ((num >= lo) & (num <= lo + 99))
            elif isinstance(crit, (int, float)):
                cond = cond | (num == float(crit))
            else:
                cond = cond | (c.cast("string") == str(crit))
        expr = F.when(cond, level) if expr is None else expr.when(cond, level)
    return expr if expr is not None else F.lit(None)


def _is_in_cidr(c: Column, cidr: str) -> Column:
    """IsInCIDR(ip_col, cidr) — IPv4 via pure bitwise Column math; IPv6 via
    an Arrow-batched ipaddress UDF (128-bit math has no Column form)."""
    if ":" in cidr:
        import ipaddress

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        net6 = ipaddress.ip_network(cidr, strict=False)

        def chk(v):
            if v is None:
                return None
            try:
                return ipaddress.ip_address(v) in net6
            except ValueError:
                return False

        def in6(s):
            return s.map(chk)

        # explicit annotations as live objects: the module-wide
        # `from __future__ import annotations` would stringify inline hints,
        # which pandas_udf can't resolve without a module-level pandas import
        in6.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf("boolean")(in6)(c.cast("string"))
    net, bits = cidr.split("/")
    bits = int(bits)
    parts = [int(x) for x in net.split(".")]
    net_int = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
    mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
    sp = F.split(c, r"\.")
    ip_int = (
        sp[0].cast("long") * 16777216
        + sp[1].cast("long") * 65536
        + sp[2].cast("long") * 256
        + sp[3].cast("long")
    )
    return ip_int.bitwiseAND(F.lit(mask)) == F.lit(net_int & mask)


def _to_camel(c: Column) -> Column:
    """PascalCase preserving inner capitals (strcase.ToCamel semantics):
    upper-case each separator-delimited word's first letter, keep the rest."""
    return F.concat_ws(
        "",
        F.transform(
            F.split(c, r"[_\s-]+"),
            lambda w: F.concat(F.upper(F.substring(w, 1, 1)), F.substring(w, 2, 1_000_000)),
        ),
    )


def _convert_case(c: Column, mode: str) -> Column:
    if mode == "lower":
        return F.lower(c)
    if mode == "upper":
        return F.upper(c)
    if mode == "snake":
        return F.lower(F.regexp_replace(F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2"), r"[\s-]+", "_"))
    if mode == "camel":
        return _to_camel(c)
    raise ValueError(f"unknown case mode {mode!r}")


def _as_py(v):
    """Literal-or-Column arg → python value (registry fns needing literals)."""
    if isinstance(v, Column):
        raise ValueError("this OTTL function requires a literal argument")
    return v


def _len_col(c: Column) -> Column:
    return F.length(c)


def _jre(pat) -> str:
    from ..operators.parsers import java_regex

    return java_regex(_as_py(pat))


def _xml():
    from . import xmlfuncs

    return xmlfuncs


def _hashes():
    from . import hashes

    return hashes


def _keyvalue_map(c: Column, d: str, p: str) -> Column:
    from ..operators.parsers import keyvalue_map_col

    return keyvalue_map_col(c, d, p)


def _or_other(extracted: Column) -> Column:
    """ua-parser fallback: empty extraction → "Other" (regexp_extract yields
    "" on no match, never null)."""
    return F.when(F.length(extracted) == 0, F.lit("Other")).otherwise(extracted)


def _trim_cutset(c: Column, cutset: str) -> Column:
    """strings.Trim semantics: strip any leading/trailing chars in cutset."""
    cls = re.escape(cutset)
    return F.regexp_replace(c, f"^[{cls}]+|[{cls}]+$", "")


def _strptime(fmt: str) -> str:
    from .timefmt import strptime_to_spark

    if "%" in fmt:
        return strptime_to_spark(fmt)
    return fmt


def _duration_unit(d: str) -> str:
    return {"1h": "hour", "1m": "minute", "1s": "second", "1d": "day"}.get(d, d)


# Positions whose arguments must stay python literals (format strings, regex
# patterns, delimiters, offsets) — everything else is lifted to Column.
LITERAL_ARG_POSITIONS: dict[str, frozenset[int]] = {
    "Concat": frozenset([0, 1]),
    "Split": frozenset([1]),
    "Substring": frozenset([1, 2]),
    "Trim": frozenset([1]),
    "TrimPrefix": frozenset([1]),
    "TrimSuffix": frozenset([1]),
    "Find": frozenset([1]),
    "IsMatch": frozenset([1]),
    "ParseInt": frozenset([1]),
    "Time": frozenset([1]),
    "FormatTime": frozenset([1]),
    "TruncateTime": frozenset([1]),
    "ParseKeyValue": frozenset([1, 2]),
    "Sort": frozenset([1]),
    "SliceToMap": frozenset([1, 2]),
    "ExtractPatterns": frozenset([1]),
    "ExtractGrokPatterns": frozenset([1]),
    "IsInCidr": frozenset([1]),
    "IsInCIDR": frozenset([1]),
    "ParseSeverity": frozenset([1]),
    "ConvertCase": frozenset([1]),
    "ParseJSON": frozenset([0, 1]),
    "Base64Encode": frozenset([1]),
    "ParseCSV": frozenset([1, 2, 3, 4]),
    "ToKeyValueString": frozenset([1, 2, 3]),
    "GetXML": frozenset([1]),
    "CommunityID": frozenset([5]),
    "InsertXML": frozenset([1]),
    "RemoveXML": frozenset([1]),
    "ConvertAttributesToElementsXML": frozenset([1]),
    "ConvertTextToElementsXML": frozenset([1, 2]),
    "Decode": frozenset([1]),
    "Coalesce": frozenset([0]),  # list form: pass the compiled list through
    "Format": frozenset([0, 1]),  # (fmt, [args]) form
}


# ------------------------------------------------------------------ compiler

class Compiler:
    def __init__(
        self,
        resolver: PathResolver | None = None,
        error_mode: str = "ignore",
    ):
        self.resolver = resolver or PathResolver()
        self.registry = build_registry(error_mode)
        self.error_mode = error_mode
        self._locals: dict[str, Column] = {}  # lambda formal bindings
        # statement-group guard (transformprocessor `conditions`,
        # internal/common/logs.go:97-116): OR of the group's conditions,
        # ANDed into every statement's `where`; the raw ASTs are kept so
        # fused runs can refuse targets the guard reads
        self.global_guard: Column | None = None
        self.global_guard_asts: list = []

    def compile_value(self, node) -> Column | object:
        """AST value → Column (or python literal for literal-arg functions)."""
        if isinstance(node, Lit):
            return node.value
        if isinstance(node, Path):
            if (
                self._locals
                and len(node.parts) == 1
                and isinstance(node.parts[0], str)
                and node.parts[0] in self._locals
            ):
                return self._locals[node.parts[0]]
            return self.resolver.resolve(node)
        if isinstance(node, Call):
            # static type predicates: resolved from the DataFrame schema, not
            # at runtime — the flat model's column types are fixed (§1.3)
            if node.name in _TYPE_PREDICATES and len(node.args) == 1:
                return self._type_predicate(node)
            if node.name in ("Filter", "MapEach", "All", "Any", "Reduce", "Find"):
                return self._lambda_call(node)
            if node.name == "__getitem__":
                # postfix subscript on a converter result: map["k"] / arr[0];
                # slice subscripts are 0-based (grammar.go), element_at is
                # 1-based — dispatch on the collection's static kind
                coll = self._as_col(self.compile_value(node.args[0]))
                key = self.compile_value(node.args[1])
                kind = self._arg_kind(node.args[0])
                if isinstance(key, int) or (
                    kind == "array" and isinstance(key, Column)
                ):
                    kcol = key if isinstance(key, Column) else F.lit(key)
                    return F.element_at(coll, kcol.cast("int") + 1)
                return F.element_at(coll, key if isinstance(key, Column) else F.lit(key))
            if node.name == "Len" and len(node.args) == 1:
                v = self.compile_value(node.args[0])
                if not isinstance(v, Column):
                    return F.lit(len(v))  # literal: fold at compile time
                kind = self._arg_kind(node.args[0])
                return F.size(v) if kind in ("array", "map") else F.length(v)
            if node.name == "String" and len(node.args) == 1:
                # pdata AsString: containers serialize as compact JSON,
                # booleans lowercase (ctxutil value stringification)
                import json as _json

                v = self.compile_value(node.args[0])
                if not isinstance(v, Column):
                    if isinstance(v, bool):
                        return F.lit("true" if v else "false")
                    if isinstance(v, (list, dict)):
                        return F.lit(_json.dumps(v, separators=(",", ":")))
                    return F.lit(str(v))
                kind = self._arg_kind(node.args[0])
                return F.to_json(v) if kind in ("array", "map") else v.cast("string")
            if node.name == "Hex" and len(node.args) == 1:
                # func_hex.go: pdata-byte formatting — int64 big-endian (16
                # hex chars), float64 IEEE bits, bool 01/00, string utf8 bytes
                import struct as _struct

                v = self.compile_value(node.args[0])
                if not isinstance(v, Column):
                    if isinstance(v, bool):
                        return F.lit("01" if v else "00")
                    if isinstance(v, int):
                        return F.lit(format(v & ((1 << 64) - 1), "016x"))
                    if isinstance(v, float):
                        return F.lit(_struct.pack(">d", v).hex())
                    if isinstance(v, bytes):
                        return F.lit(v.hex())
                    return F.lit(str(v).encode().hex())
                kind = self.resolver.dtypes.get(
                    self.resolver.column_name(node.args[0]), ""
                ) if isinstance(node.args[0], Path) else ""
                if kind in ("bigint", "int", "smallint", "tinyint", "long"):
                    return F.lpad(F.lower(F.hex(v)), 16, "0")
                return F.lower(F.hex(v))  # strings/binary: hex of the bytes
            if node.name == "Eval":
                # func_eval.go: apply a lambda to a literal argument list —
                # compile-time β-reduction
                lam = node.args[0]
                args = node.args[1]
                vals = (
                    [self._as_col(self.compile_value(a)) for a in args.items]
                    if isinstance(args, ListNode)
                    else [F.lit(v) for v in self.compile_value(args)]
                )
                if len(lam.formals) != len(vals):
                    raise ValueError("Eval arity mismatch")
                return self._with_locals(dict(zip(lam.formals, vals)), lam.body)
            if node.name == "Index":
                return self._index_call(node)
            fn = self.registry.get(node.name)
            if fn is None:
                raise ValueError(f"unsupported OTTL converter {node.name!r}")
            args = [self.compile_value(a) for a in node.args]
            lit_pos = LITERAL_ARG_POSITIONS.get(node.name, frozenset())
            conv = [
                a if (i in lit_pos or isinstance(a, Column)) else F.lit(a)
                for i, a in enumerate(args)
            ]
            # named args (grammar.go optional args) stay python literals —
            # they are config, not row data
            kw = {k: self.compile_value(v) for k, v in node.kwargs.items()}
            return fn(*conv, **kw)
        if isinstance(node, ListNode):
            return [self.compile_value(i) for i in node.items]
        if isinstance(node, BinOp):
            return self._binop(node)
        if isinstance(node, Not):
            return ~self._as_col(self.compile_value(node.expr))
        raise ValueError(f"cannot compile {node!r}")

    def _as_col(self, v) -> Column:
        return v if isinstance(v, Column) else F.lit(v)

    def _with_locals(self, bindings: dict, body) -> Column:
        """Compile a lambda body with formals bound (``_`` never binds)."""
        prev = self._locals
        self._locals = {**prev, **{k: v for k, v in bindings.items() if k != "_"}}
        try:
            return self._as_col(self.compile_value(body))
        finally:
            self._locals = prev

    def _arg_is_map(self, node) -> bool:
        if isinstance(node, Path):
            name = self.resolver.column_name(node)
            return self.resolver.dtypes.get(name, "").startswith("map<")
        if isinstance(node, Lit):
            return isinstance(node.value, dict)
        return False

    #: converters whose results are slices (for Index/Find dispatch)
    _ARRAY_RETURNING = frozenset(
        ["Split", "Keys", "Values", "MapKeys", "MapValues", "Sort", "MapEach", "Filter"]
    )

    def _arg_kind(self, node) -> str:
        """'string' | 'array' | 'map' | 'unknown' — static type of an arg."""
        if isinstance(node, Path):
            name = self.resolver.column_name(node)
            dt = self.resolver.dtypes.get(name, "")
            if dt.startswith("array"):
                return "array"
            if dt.startswith("map"):
                return "map"
            if dt == "string":
                return "string"
            if not dt and self.resolver.has_attr_map:
                return "string"  # map<string,string> value
            return "unknown"
        if isinstance(node, (ListNode,)):
            return "array"
        if isinstance(node, Lit):
            if isinstance(node.value, list):
                return "array"
            if isinstance(node.value, str):
                return "string"
            if isinstance(node.value, dict):
                return "map"
            return "unknown"
        if isinstance(node, Call) and node.name in self._ARRAY_RETURNING:
            return "array"
        return "unknown"

    def _index_call(self, node: Call) -> Column:
        """func_index.go: Index(string, substr) → first byte offset;
        Index(slice, value) → position of the first equal element; -1 when
        absent. (Element ACCESS is the subscript form ``slice[0]``.)"""
        target = self._as_col(self.compile_value(node.args[0]))
        value = self.compile_value(node.args[1])
        vcol = value if isinstance(value, Column) else F.lit(value)
        kind = self._arg_kind(node.args[0])
        if kind == "string" or (kind == "unknown" and isinstance(value, str)):
            # instr/array_position are both 1-based with 0 = not found
            return (F.instr(target, vcol) - 1).cast("long")
        return (F.array_position(target, vcol) - 1).cast("long")

    def _lambda_call(self, node: Call) -> Column:
        """Filter / MapEach / All / Any / Reduce with OTTL lambdas
        (func_filter.go, func_map_each.go, func_all.go, func_any.go,
        func_reduce.go) → Spark higher-order functions. Slice lambdas bind
        (index, value); map lambdas (key, value); Reduce prepends acc."""
        name = node.name
        coll_node = node.args[0]
        is_map = self._arg_is_map(coll_node)
        coll = self._as_col(self.compile_value(coll_node))

        if name == "Reduce":
            init = self._as_col(self.compile_value(node.args[1]))
            lam = node.args[2]
            if len(lam.formals) != 3:
                raise ValueError("Reduce lambda takes (acc, key/index, value)")
            if is_map:
                entries = F.map_entries(coll)
            else:
                entries = F.transform(
                    coll,
                    lambda v, i: F.struct(
                        i.cast("long").alias("key"), v.alias("value")
                    ),
                )
            return F.aggregate(
                entries,
                init,
                lambda acc, e: self._with_locals(
                    {lam.formals[0]: acc, lam.formals[1]: e["key"], lam.formals[2]: e["value"]},
                    lam.body,
                ),
            )

        if name == "Find":
            # func_find.go: first entry matching the predicate — the VALUE by
            # default, or mapper(key/index, value) when a 3rd lambda is given
            lam = node.args[1]
            mapper = node.args[2] if len(node.args) > 2 else None
            k_name, v_name = lam.formals
            if is_map:
                entries = F.map_entries(coll)
            else:
                entries = F.transform(
                    coll,
                    lambda v, i: F.struct(i.cast("long").alias("key"), v.alias("value")),
                )
            matched = F.filter(
                entries,
                lambda e: self._with_locals(
                    {k_name: e["key"], v_name: e["value"]}, lam.body
                ),
            )
            first = F.element_at(matched, 1)
            if mapper is None:
                return first["value"]
            mk, mv = mapper.formals
            return self._with_locals(
                {mk: first["key"], mv: first["value"]}, mapper.body
            )

        lam = node.args[1]
        if len(lam.formals) != 2:
            raise ValueError(f"{name} lambda takes (key/index, value)")
        k_name, v_name = lam.formals
        if is_map:
            def pred(k, v):
                return self._with_locals({k_name: k, v_name: v}, lam.body)

            if name == "Filter":
                return F.map_filter(coll, pred)
            if name == "MapEach":  # map → slice of per-entry results
                return F.transform(
                    F.map_entries(coll), lambda e: pred(e["key"], e["value"])
                )
            kept = F.size(F.map_keys(F.map_filter(coll, pred)))
            total = F.size(F.map_keys(coll))
            return (kept == total) if name == "All" else (kept > 0)

        def bind(v, i):
            return self._with_locals({k_name: i.cast("long"), v_name: v}, lam.body)

        if name == "Filter":
            return F.filter(coll, bind)
        if name == "MapEach":
            return F.transform(coll, bind)
        kept = F.size(F.filter(coll, bind))
        return (kept == F.size(coll)) if name == "All" else (kept > 0)

    def _type_predicate(self, node: Call) -> Column:
        """IsBool/IsInt/IsDouble/IsString/IsList/IsMap on a path: look the
        column's type up in the schema (func_is_*.go return the pcommon kind
        check; here the kind is the static column type). Non-path args fall
        back to python-type inspection of the literal."""
        arg = node.args[0]
        prefixes = _TYPE_PREDICATES[node.name]
        if isinstance(arg, Path):
            name = self.resolver.column_name(arg)
            dt = self.resolver.dtypes.get(name, "")
            if not dt and self.resolver.has_attr_map:
                dt = "string"  # map<string,string> values
            return F.lit(bool(dt) and any(dt.startswith(p) for p in prefixes))
        if isinstance(arg, Lit):
            pytypes = {"IsBool": bool, "IsInt": int, "IsDouble": float,
                       "IsString": str, "IsList": list, "IsMap": dict}
            return F.lit(isinstance(arg.value, pytypes[node.name]))
        # computed expression: fall back to the runtime registry check if one
        # exists (IsString), else statically false
        fn = self.registry.get(node.name)
        if fn is not None:
            return fn(self._as_col(self.compile_value(arg)))
        return F.lit(False)

    def _binop(self, node: BinOp) -> Column:
        if node.op in ("and", "or"):
            l, r = self._as_col(self.compile_value(node.left)), self._as_col(self.compile_value(node.right))
            return (l & r) if node.op == "and" else (l | r)
        l = self.compile_value(node.left)
        r = self.compile_value(node.right)
        # OTTL nil comparison (grammar.go nil literal): `x == nil` / `x != nil`
        # is a null CHECK, not SQL three-valued equality (col != NULL ⇒ null)
        if node.op in ("==", "!=") and (l is None or r is None):
            target = self._as_col(r if l is None else l)
            return target.isNull() if node.op == "==" else target.isNotNull()
        if node.op in ("matches", "contains", "startsWith", "endsWith"):
            lc = self._as_col(l)
            if node.op == "matches":
                return lc.rlike(_jre(r))
            if node.op == "contains":
                return lc.contains(r if isinstance(r, Column) else F.lit(r))
            if node.op == "startsWith":
                return lc.startswith(r if isinstance(r, Column) else F.lit(r))
            return lc.endswith(r if isinstance(r, Column) else F.lit(r))
        lc, rc = self._as_col(l), self._as_col(r)
        ops = {
            "==": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
            "+": lambda a, b: a + b,
            "-": lambda a, b: a - b,
            "*": lambda a, b: a * b,
            "/": lambda a, b: a / b,
            "%": lambda a, b: a % b,
        }
        return ops[node.op](lc, rc)

    def compile_condition(self, cond_str: str) -> Column:
        return self._as_col(self.compile_value(parse_condition(cond_str)))

    # ---- statement application (editors mutate the DataFrame) ----

    def apply(self, df: DataFrame, stmt_str: str) -> DataFrame:
        return self._apply_stmt(df, parse_statement(stmt_str))

    def _apply_stmt(self, df: DataFrame, stmt: Statement) -> DataFrame:
        """Execute one statement: ``Editor(args) where cond`` ⇒ conditional
        column rewrite — exactly ``StatementSequence.Execute`` semantics
        (``parser.go:407-427``): later statements see earlier results."""
        self.resolver.columns = set(df.columns)
        cond = self._stmt_cond(stmt)
        ed = stmt.editor
        name = ed.name

        def guarded(target: str, new: Column) -> DataFrame:
            if cond is None:
                return df.withColumn(target, new)
            old = F.col(target) if target in df.columns else F.lit(None)
            return df.withColumn(target, F.when(cond, new).otherwise(old))

        if name == "set":
            value = self._as_col(self.compile_value(ed.args[1]))
            # attributes["k"] on a live MapType store with no promoted flat
            # column ⇒ true map upsert (func_set.go on pcommon maps mutates
            # the map, not a sibling field); map_store also routes
            # resource.attributes["k"] to the `resource` map when the frame
            # carries the two-store model
            ms = self.resolver.map_store(ed.args[0]) if isinstance(ed.args[0], Path) else None
            if ms is not None and dict(df.dtypes).get(ms[0], "").startswith("map<"):
                mcol, key = ms
                upserted = F.map_concat(
                    F.map_filter(F.col(mcol), lambda k, v: k != key),
                    F.create_map(F.lit(key), value.cast("string")),
                )
                return guarded(mcol, upserted)
            target = self.resolver.column_name(ed.args[0])
            return guarded(target, value)
        if name in ("delete_key", "delete_matching_keys", "keep_matching_keys", "keep_keys"):
            target = self.resolver.column_name(ed.args[0])
            col = F.col(target)
            if name == "delete_key":
                key = _as_py(self.compile_value(ed.args[1]))
                new = F.map_filter(col, lambda k, v: k != key)
            elif name == "delete_matching_keys":
                pat = _jre(self.compile_value(ed.args[1]))
                new = F.map_filter(col, lambda k, v: ~k.rlike(pat))
            elif name == "keep_matching_keys":
                pat = _jre(self.compile_value(ed.args[1]))
                new = F.map_filter(col, lambda k, v: k.rlike(pat))
            else:  # keep_keys — varargs or a single list literal
                keys = []
                for a in ed.args[1:]:
                    v = _as_py(self.compile_value(a))
                    keys.extend(v) if isinstance(v, list) else keys.append(v)
                arr = F.array(*[F.lit(k) for k in keys])
                new = F.map_filter(col, lambda k, v: F.array_contains(arr, k))
            return guarded(target, new)
        if name in ("replace_pattern", "replace_match"):
            target = self.resolver.column_name(ed.args[0])
            pat = _as_py(self.compile_value(ed.args[1]))
            repl = _as_py(self.compile_value(ed.args[2]))
            if name == "replace_match":  # glob → regex
                pat = "^" + re.escape(pat).replace(r"\*", ".*") + "$"
                repl_rx = repl
            else:
                pat = _jre_str(pat)
                repl_rx = re.sub(r"\$\$(\d)", r"$\1", repl)
            return guarded(target, F.regexp_replace(F.col(target), pat, repl_rx))
        if name == "replace_all_matches":
            # func_replace_all_matches.go: glob over map VALUES — a value
            # fully matching the glob is replaced wholesale
            target = self.resolver.column_name(ed.args[0])
            glob = _as_py(self.compile_value(ed.args[1]))
            repl = self._as_col(self.compile_value(ed.args[2]))
            pat = "^" + re.escape(glob).replace(r"\*", ".*") + "$"
            new = F.transform_values(
                F.col(target), lambda k, v: F.when(v.rlike(pat), repl).otherwise(v)
            )
            return guarded(target, new)
        if name == "replace_all_patterns":
            target = self.resolver.column_name(ed.args[0])
            mode = _as_py(self.compile_value(ed.args[1]))  # "key" or "value"
            pat = _jre_str(_as_py(self.compile_value(ed.args[2])))
            repl = _as_py(self.compile_value(ed.args[3]))
            col = F.col(target)
            if mode == "value":
                new = F.transform_values(col, lambda k, v: F.regexp_replace(v, pat, repl))
            else:
                new = F.map_from_entries(
                    F.transform(
                        F.map_entries(col),
                        lambda e: F.struct(
                            F.regexp_replace(e["key"], pat, repl).alias("key"),
                            e["value"].alias("value"),
                        ),
                    )
                )
            return guarded(target, new)
        if name == "truncate_all":
            target = self.resolver.column_name(ed.args[0])
            n = _as_py(self.compile_value(ed.args[1]))
            return guarded(target, F.transform_values(F.col(target), lambda k, v: F.substring(v, 1, n)))
        if name == "limit":
            target = self.resolver.column_name(ed.args[0])
            n = _as_py(self.compile_value(ed.args[1]))
            col = F.col(target)
            keep = F.slice(F.array_sort(F.map_keys(col)), 1, n)
            return guarded(target, F.map_filter(col, lambda k, v: F.array_contains(keep, k)))
        if name == "merge_maps":
            # func_merge_maps.go: strategy ∈ upsert/insert/update
            target = self.resolver.column_name(ed.args[0])
            src = self._as_col(self.compile_value(ed.args[1]))
            strategy = _as_py(self.compile_value(ed.args[2])) if len(ed.args) > 2 else "upsert"
            tgt = F.col(target)
            if strategy == "upsert":
                new = F.map_concat(
                    F.map_filter(tgt, lambda k, v: ~F.array_contains(F.map_keys(src), k)), src
                )
            elif strategy == "insert":
                new = F.map_concat(
                    tgt, F.map_filter(src, lambda k, v: ~F.array_contains(F.map_keys(tgt), k))
                )
            elif strategy == "update":
                new = F.transform_values(tgt, lambda k, v: F.coalesce(F.element_at(src, k), v))
            else:
                raise ValueError(f"unknown merge_maps strategy {strategy!r}")
            return guarded(target, new)
        if name == "stringify_all":
            # func_stringify_all.go: every map value → string (no-op on
            # map<string,string>; meaningful for typed-value maps)
            target = self.resolver.column_name(ed.args[0])
            return guarded(target, F.transform_values(F.col(target), lambda k, v: v.cast("string")))
        if name == "flatten":
            # func_flatten.go: promote a struct column's fields one level
            target = self.resolver.column_name(ed.args[0])
            others = [c for c in df.columns if c != target]
            return df.select(*others, f"{target}.*")
        if name == "delete_index":
            # func_delete_index.go: remove slice elements [start, end) — end
            # defaults to start+1; deleting everything yields an empty slice
            target = self.resolver.column_name(ed.args[0])
            start = _as_py(self.compile_value(ed.args[1]))
            end = _as_py(self.compile_value(ed.args[2])) if len(ed.args) > 2 else start + 1
            arr = F.col(target)
            new = F.concat(
                F.slice(arr, 1, start),
                F.slice(arr, end + 1, F.greatest(F.size(arr) - end, F.lit(0))),
            )
            return guarded(target, new)
        if name == "append":
            target = self.resolver.column_name(ed.args[0])
            vals = [self._as_col(self.compile_value(a)) for a in ed.args[1:]]
            base = F.col(target) if target in df.columns else F.array()
            return guarded(target, F.concat(base, F.array(*vals)))
        raise ValueError(f"unsupported OTTL editor {name!r}")

    # ---- fused map-editor runs -------------------------------------------
    #
    # A statement group like
    #     keep_keys(attributes, [...]) ; truncate_all(attributes, N) ;
    #     set(attributes["k"], v) where cond
    # naively compiles to one full map rebuild (map_filter / transform_values
    # / map_concat) PER STATEMENT — interpreted higher-order functions with
    # no common-subexpression elimination, so a 10-statement group pays 10
    # map rebuilds per row (SCALE.md trap #6). Statement-sequence semantics
    # ("later statements see earlier results", parser.go:407-427) let a run
    # of consecutive editors over the SAME map column compile to ONE
    #     map_entries → filter/transform/append… → map_from_entries
    # chain: order is preserved by nesting, the map is hashed/built once,
    # and `where` guards fold into per-entry predicates. Only editors whose
    # effect is per-entry are fused; limit/merge_maps (need whole-map state)
    # fall back to the per-statement path.

    _FUSIBLE_EDITORS = frozenset({
        "keep_keys", "keep_matching_keys", "delete_key", "delete_matching_keys",
        "truncate_all", "replace_all_matches", "replace_all_patterns",
        "stringify_all", "merge_maps",
    })

    def _ast_refs(self, node, target: str) -> bool:
        """Does this AST read the column `target`? (A fused run must not
        evaluate a condition/value against the map it is mid-rewriting.)"""
        import dataclasses as _dc

        if node is None or isinstance(node, (str, int, float, bool, bytes)):
            return False
        if isinstance(node, Path):
            parts = list(node.parts)
            if parts and parts[0] in ("log", "resource", "span", "metric", "datapoint"):
                parts = parts[1:]
            if parts and isinstance(parts[0], str) and parts[0] == target:
                return True
            try:
                return self.resolver.column_name(node) == target
            except Exception:
                return False
        if _dc.is_dataclass(node):
            return any(self._ast_refs(getattr(node, f.name), target) for f in _dc.fields(node))
        if isinstance(node, (list, tuple)):
            return any(self._ast_refs(x, target) for x in node)
        if isinstance(node, dict):
            return any(self._ast_refs(x, target) for x in node.values())
        return False

    def _map_upsert_spec(self, df: DataFrame, ed: Call) -> tuple[str, str] | None:
        """(map_column, key) when `ed` is the map-upsert form of set()
        (same detection as _apply_stmt), else None."""
        if ed.name != "set" or len(ed.args) != 2 or not isinstance(ed.args[0], Path):
            return None
        ms = self.resolver.map_store(ed.args[0])
        if ms is None or not dict(df.dtypes).get(ms[0], "").startswith("map<"):
            return None
        return ms

    def _fuse_target(self, df: DataFrame, stmt: Statement) -> str | None:
        """The map column this statement rewrites per-entry, or None if the
        statement can't join a fused run."""
        ed = stmt.editor
        dtypes = dict(df.dtypes)
        if ed.name in self._FUSIBLE_EDITORS:
            if ed.name == "merge_maps":
                # insert needs the CURRENT key set on the source side —
                # the entries expression would be referenced twice outside
                # a lazily-evaluated branch; keep it on the per-statement path
                strategy = (
                    _as_py(self.compile_value(ed.args[2])) if len(ed.args) > 2 else "upsert"
                )
                if strategy not in ("upsert", "update"):
                    return None
            try:
                target = self.resolver.column_name(ed.args[0])
            except Exception:
                return None
            if not dtypes.get(target, "").startswith("map<string,string>"):
                return None
            config_args = ed.args[1:]
        elif ed.name == "set":
            ms = self._map_upsert_spec(df, ed)
            if ms is None:
                return None
            target = ms[0]
            if not dtypes.get(target, "").startswith("map<string,string>"):
                return None
            config_args = ed.args[1:]
        else:
            return None
        if self._ast_refs(stmt.where, target):
            return None
        if any(self._ast_refs(a, target) for a in config_args):
            return None
        # (the statement-group guard is materialized once per record into a
        # temp boolean column by transform_processor, so it can never observe
        # this run's mutations — no fusion refusal needed for it)
        return target

    def _fused_entry_step(self, cur: Column, ed: Call, cond: Column | None) -> Column:
        """One statement applied to the running entries-array expression."""

        def guard_pred(pred):
            # keep-predicate; a false/null condition skips the statement
            if cond is None:
                return pred
            return lambda e: F.when(cond, pred(e)).otherwise(F.lit(True))

        def value_xform(fn):
            vf = fn if cond is None else (
                lambda e: F.when(cond, fn(e)).otherwise(e["value"])
            )
            return F.transform(
                cur, lambda e: F.struct(e["key"].alias("key"), vf(e).alias("value"))
            )

        name = ed.name
        if name == "delete_key":
            key = _as_py(self.compile_value(ed.args[1]))
            return F.filter(cur, guard_pred(lambda e: e["key"] != key))
        if name == "delete_matching_keys":
            pat = _jre(self.compile_value(ed.args[1]))
            return F.filter(cur, guard_pred(lambda e: ~e["key"].rlike(pat)))
        if name == "keep_matching_keys":
            pat = _jre(self.compile_value(ed.args[1]))
            return F.filter(cur, guard_pred(lambda e: e["key"].rlike(pat)))
        if name == "keep_keys":
            keys: list = []
            for a in ed.args[1:]:
                v = _as_py(self.compile_value(a))
                keys.extend(v) if isinstance(v, list) else keys.append(v)
            arr = F.array(*[F.lit(k) for k in keys])
            return F.filter(cur, guard_pred(lambda e: F.array_contains(arr, e["key"])))
        if name == "truncate_all":
            n = _as_py(self.compile_value(ed.args[1]))
            return value_xform(lambda e: F.substring(e["value"], 1, n))
        if name == "stringify_all":
            return value_xform(lambda e: e["value"].cast("string"))
        if name == "replace_all_matches":
            glob = _as_py(self.compile_value(ed.args[1]))
            repl = self._as_col(self.compile_value(ed.args[2]))
            pat = "^" + re.escape(glob).replace(r"\*", ".*") + "$"
            return value_xform(
                lambda e: F.when(e["value"].rlike(pat), repl).otherwise(e["value"])
            )
        if name == "replace_all_patterns":
            mode = _as_py(self.compile_value(ed.args[1]))
            pat = _jre_str(_as_py(self.compile_value(ed.args[2])))
            repl = _as_py(self.compile_value(ed.args[3]))
            if mode == "value":
                return value_xform(lambda e: F.regexp_replace(e["value"], pat, repl))

            def new_key(e):
                nk = F.regexp_replace(e["key"], pat, repl)
                return nk if cond is None else F.when(cond, nk).otherwise(e["key"])

            return F.transform(
                cur, lambda e: F.struct(new_key(e).alias("key"), e["value"].alias("value"))
            )
        if name == "merge_maps":
            src = self._as_col(self.compile_value(ed.args[1]))
            strategy = (
                _as_py(self.compile_value(ed.args[2])) if len(ed.args) > 2 else "upsert"
            )
            if strategy == "update":
                return value_xform(
                    lambda e: F.coalesce(F.element_at(src, e["key"]), e["value"])
                )
            # upsert: drop overridden keys, append the source entries (same
            # entry order as map_concat(filtered_target, src))
            merged = F.concat(
                F.filter(cur, lambda e: ~F.array_contains(F.map_keys(src), e["key"])),
                F.map_entries(src),
            )
            return merged if cond is None else F.when(cond, merged).otherwise(cur)
        if name == "set":  # attributes-map upsert
            parts = list(ed.args[0].parts)
            if parts and parts[0] in ("log", "resource"):
                parts = parts[1:]
            key = parts[1][1]
            value = self._as_col(self.compile_value(ed.args[1])).cast("string")
            appended = F.concat(
                F.filter(cur, lambda e: e["key"] != key),
                F.array(F.struct(F.lit(key).alias("key"), value.alias("value"))),
            )
            # CaseWhen evaluates one branch per row, so `cur` appearing in
            # both arms costs nothing extra
            return appended if cond is None else F.when(cond, appended).otherwise(cur)
        raise ValueError(f"editor {name!r} is not fusible")

    def _stmt_cond(self, stmt: Statement) -> Column | None:
        """The statement's effective guard: `where` ANDed with the statement
        group's `conditions` guard (when one is set)."""
        cond = (
            self._as_col(self.compile_value(stmt.where))
            if stmt.where is not None
            else None
        )
        if self.global_guard is None:
            return cond
        return self.global_guard if cond is None else (self.global_guard & cond)

    def _apply_fused_run(self, df: DataFrame, stmts: list[Statement], target: str) -> DataFrame:
        self.resolver.columns = set(df.columns)
        cur = F.map_entries(F.col(target))
        for stmt in stmts:
            cur = self._fused_entry_step(cur, stmt.editor, self._stmt_cond(stmt))
        return df.withColumn(target, F.map_from_entries(cur))

    # ---- fused Python-converter runs --------------------------------------
    #
    # `set(t1, ParseSimplifiedXML(body)); set(t2, FNV(body)); …` naively
    # runs one pandas UDF PER STATEMENT: the source column ships through
    # Arrow once per converter, and read-only XML converters re-parse the
    # same document. A run of consecutive literal-arg set() statements
    # whose values are Python-backed converters of the SAME source column
    # compiles to ONE struct-returning pandas UDF — one Arrow round-trip,
    # one shared document parse for the read-only XML converters (mutating
    # ones still parse their own copy), per-op semantics identical to the
    # standalone wrappers (XML ops guard to None on error; hash ops never
    # swallow exceptions, exactly like their ungated forms).

    @staticmethod
    def _pyconv_registry():
        """name -> (kind, row_fn, spark_type, guard_errors).

        kind: "doc" = takes the shared parsed _Doc; "str" = raw text.
        row_fn replicates the standalone wrapper's per-value semantics.
        """
        from . import hashes as H
        from . import xmlfuncs as X

        def fnv_row(v):
            h = H.fnv1a_64(str(v).encode())
            return h - (1 << 64) if h >= (1 << 63) else h

        def murmur_row(v):
            return H.murmur3_32(str(v).encode()).to_bytes(4, "little").hex()

        def murmur128_row(v):
            h1, h2 = H.murmur3_x64_128(str(v).encode())
            return h1.to_bytes(8, "little").hex() + h2.to_bytes(8, "little").hex()

        def xxh3_row(v):
            return H.xxh3_64(str(v).encode()).to_bytes(8, "big").hex()

        def xxh128_row(v):
            lo, hi = H.xxh3_128(str(v).encode())
            return (hi << 64 | lo).to_bytes(16, "big").hex()

        return {
            "ParseXML": ("str", X.parse_xml_str, "string", True),
            "ParseSimplifiedXML": ("doc", X.parse_simplified_from_doc, "string", True),
            "GetXML": ("doc", X.get_xml_from_doc, "string", True),
            # mutating converters share the fused parse too — they deep-copy
            # the parsed doc (~4× cheaper than re-parsing the string)
            "RemoveXML": ("doc", X.remove_xml_from_doc, "string", True),
            "InsertXML": ("str", X.insert_xml_str, "string", True),
            "ConvertAttributesToElementsXML": (
                "doc", X.convert_attributes_from_doc, "string", True),
            "ConvertTextToElementsXML": (
                "str", X.convert_text_to_elements_str, "string", True),
            "FNV": ("str", fnv_row, "long", False),
            "Murmur3Hash": ("str", murmur_row, "string", False),
            "Murmur3Hash128": ("str", murmur128_row, "string", False),
            "XXH3": ("str", xxh3_row, "string", False),
            "XXH128": ("str", xxh128_row, "string", False),
        }

    def _pyconv_set_spec(self, df: DataFrame, stmt: Statement):
        """(target, source, fn_name, extra_args) when stmt is a fusible
        literal-arg Python-converter set() with no guard, else None."""
        ed = stmt.editor
        if (
            ed.name != "set"
            or stmt.where is not None
            or self.global_guard is not None
            or len(ed.args) != 2
        ):
            return None
        val = ed.args[1]
        if not isinstance(val, Call) or val.name not in self._pyconv_registry():
            return None
        if val.kwargs or not val.args or not isinstance(val.args[0], Path):
            return None
        extras = []
        for a in val.args[1:]:
            if not isinstance(a, Lit):
                return None
            extras.append(a.value)
        try:
            src = self.resolver.column_name(val.args[0])
            tgt = self.resolver.column_name(ed.args[0])
        except Exception:
            return None
        if src == tgt or dict(df.dtypes).get(src) != "string":
            return None
        return (tgt, src, val.name, tuple(extras))

    def _apply_pyconv_fused(self, df: DataFrame, specs: list[tuple]) -> DataFrame:
        import pandas as pd

        from . import xmlfuncs as X

        src = specs[0][1]
        ops = [(name, extras) for (_t, _s, name, extras) in specs]
        reg = self._pyconv_registry()
        fields = [f"c{i}" for i in range(len(ops))]
        rtype = "struct<" + ",".join(
            f"{f}:{reg[name][2]}" for f, (name, _e) in zip(fields, ops)
        ) + ">"

        # no type hints: `from __future__ import annotations` stringifies
        # them and pyspark's hint inference rejects the signature — explicit
        # returnType makes this a SCALAR pandas UDF (Series -> DataFrame
        # for struct returns)
        # hoist the per-op dispatch out of the row loop: resolved
        # (kind, fn, guard, empty-shortcut, extras, output-list) tuples —
        # the loop body then does no dict lookups or enumerate per row
        plan = [
            (
                reg[name][0],
                reg[name][1],
                reg[name][3],
                name in ("GetXML", "RemoveXML"),
                extras,
            )
            for (name, extras) in ops
        ]

        def _fused(s):
            cols: list[list] = [[] for _ in ops]
            prows = list(zip(plan, cols))
            for v in s:
                doc = None
                doc_failed = False
                if v is None:
                    for _p, out in prows:
                        out.append(None)
                    continue
                for (kind, fn, guard, empty_ok, extras), out in prows:
                    try:
                        if kind == "doc":
                            if empty_ok and not v:
                                # get_xml_str("") == "" == remove_xml_str("")
                                # (both short-circuit before parsing)
                                out.append("")
                                continue
                            if doc is None and not doc_failed:
                                try:
                                    doc = X._parse_doc(v)
                                except (X.ET.ParseError, X.XMLArgError):
                                    doc_failed = True
                            out.append(None if doc_failed else fn(doc, *extras))
                        else:
                            out.append(fn(v, *extras))
                    except Exception:
                        if not guard:
                            raise
                        out.append(None)
            return pd.DataFrame({f: c for f, c in zip(fields, cols)})

        fused = F.pandas_udf(_fused, rtype)
        tmp = "_pyconv_fused_out"
        df = df.withColumn(tmp, fused(F.col(src)))
        for i, (tgt, *_rest) in enumerate(specs):
            df = df.withColumn(tgt, F.col(tmp)[fields[i]])
        return df.drop(tmp)

    def apply_all(self, df: DataFrame, statements: list[str]) -> DataFrame:
        parsed = [parse_statement(s) for s in statements]
        i = 0
        while i < len(parsed):
            self.resolver.columns = set(df.columns)
            spec = self._pyconv_set_spec(df, parsed[i])
            if spec is not None:
                specs = [spec]
                taken = {spec[0]}
                j = i + 1
                while j < len(parsed):
                    sp = self._pyconv_set_spec(df, parsed[j])
                    # same source, fresh target, and the source isn't a
                    # column this run already wrote
                    if sp is None or sp[1] != spec[1] or sp[0] in taken or sp[1] in taken:
                        break
                    specs.append(sp)
                    taken.add(sp[0])
                    j += 1
                if len(specs) >= 2:
                    df = self._apply_pyconv_fused(df, specs)
                    i = j
                    continue
            target = self._fuse_target(df, parsed[i])
            if target is not None:
                j = i + 1
                while j < len(parsed) and self._fuse_target(df, parsed[j]) == target:
                    j += 1
                if j - i >= 2:
                    df = self._apply_fused_run(df, parsed[i:j], target)
                    i = j
                    continue
            df = self._apply_stmt(df, parsed[i])
            i += 1
        return df


def _jre_str(pat: str) -> str:
    from ..operators.parsers import java_regex

    return java_regex(pat)


def transform_processor(
    df: DataFrame,
    statements: list[str],
    error_mode: str = "ignore",
    overrides: dict[str, str] | None = None,
    conditions: list[str] | None = None,
) -> DataFrame:
    """transformprocessor analog: ordered OTTL statement group over logs.

    ``conditions`` is the statement group's guard list (logs.go:97-116):
    the conditions are OR'd and, like the reference, the disjunction is
    evaluated ONCE per record against pre-group state — materialized into a
    temp boolean column before any statement runs — then ANDed into every
    statement's ``where``. A group whose condition reads a field its own
    statements rewrite still executes the full sequence for records that
    matched on entry (reference evaluates the guard before the sequence,
    logs.go:40-46).

    Reference: ``processor/transformprocessor/internal/common/logs.go:32-122``.
    """
    c = Compiler(PathResolver(df, overrides), error_mode)
    if not conditions:
        return c.apply_all(df, statements)
    guard = None
    for s in conditions:
        node = parse_condition(s)
        c.global_guard_asts.append(node)
        col = c._as_col(c.compile_value(node))
        guard = col if guard is None else (guard | col)
    gcol = "__ottl_group_guard"
    # null guard result keeps prior semantics: when(null, x) -> otherwise
    df = df.withColumn(gcol, F.coalesce(guard, F.lit(False)))
    c.global_guard = F.col(gcol)
    return c.apply_all(df, statements).drop(gcol)


def filter_processor_ottl(
    df: DataFrame, conditions: list[str], overrides: dict[str, str] | None = None
) -> DataFrame:
    """filterprocessor with OTTL conditions (OR'd; match ⇒ DROP).

    Reference: ``processor/filterprocessor/logs.go:98-162``.
    """
    c = Compiler(PathResolver(df, overrides))
    pred = None
    for s in conditions:
        col = c.compile_condition(s)
        pred = col if pred is None else (pred | col)
    return df.filter(~(pred & pred.isNotNull()))