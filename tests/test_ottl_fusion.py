"""Fused map-editor runs must be BIT-IDENTICAL to per-statement execution.

The round-3 fusion (Compiler.apply_all collapsing consecutive same-target
map editors into one map_entries→…→map_from_entries chain) is an
optimization, not a semantics change — this file pins that: every chain is
executed through BOTH paths (apply_all = fused, _apply_stmt loop = the
original per-statement rebuilds) over the same rows and compared
key-for-key. Chains cover every fusible editor, where-guards, interleaved
non-fusible statements (which split the run), and group `conditions`.
"""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import (
    Compiler,
    PathResolver,
    parse_condition,
    parse_statement,
)


@pytest.fixture(scope="module")
def maps_df(spark):
    rows = [
        (1, 9, {"alpha": "one1", "beta": "two22", "gamma": 'q"x"', "drop_me": "zzz"}),
        (2, 17, {"alpha": "AA", "delta": "longvaluehere", "k.dotted": "v"}),
        (3, 5, {}),
        (4, 17, {"beta": "x", "gamma": "yyyyyyyy", "epsilon": "12345"}),
        (5, 13, None),
    ]
    df = spark.createDataFrame(
        rows, "id long, severity_number int, attributes map<string,string>"
    )
    return df.withColumn(
        "patch",
        F.create_map(F.lit("alpha"), F.lit("PATCHED"), F.lit("new_key"), F.lit("nv")),
    )


CHAINS = [
    # every fusible editor, unguarded
    [
        'keep_keys(attributes, ["alpha", "beta", "gamma", "epsilon"])',
        "truncate_all(attributes, 4)",
        'replace_all_patterns(attributes, "value", "[0-9]+", "N")',
        "stringify_all(attributes)",
    ],
    # where-guards per statement
    [
        'delete_key(attributes, "beta") where severity_number >= 17',
        'delete_matching_keys(attributes, "^g.*") where severity_number < 10',
        'set(attributes["sev"], "hot") where severity_number >= 13',
    ],
    # key-mode pattern rewrite followed by a key-dependent filter (order!)
    [
        'replace_all_patterns(attributes, "key", "^al", "AL")',
        'keep_matching_keys(attributes, "^(AL|be)")',
    ],
    # glob value replace + upsert + truncate chain
    [
        'replace_all_matches(attributes, "two*", "TWO")',
        'set(attributes["mark"], "m1")',
        "truncate_all(attributes, 3)",
        'set(attributes["mark"], "m2") where severity_number == 9',
    ],
    # non-fusible statement interleaved: the run must split and still match
    [
        'set(attributes["a"], "1")',
        "limit(attributes, 2)",
        'set(attributes["z"], "9")',
        'delete_key(attributes, "a")',
    ],
    # merge_maps upsert/update fuse; insert falls back per-statement
    [
        'merge_maps(attributes, patch, "upsert")',
        "truncate_all(attributes, 4)",
        'merge_maps(attributes, patch, "update") where severity_number >= 13',
        'merge_maps(attributes, patch, "insert")',
    ],
]


def _run(df, statements, fused: bool, conditions=None):
    c = Compiler(PathResolver(df))
    guard = None
    for s in conditions or []:
        node = parse_condition(s)
        c.global_guard_asts.append(node)
        col = c._as_col(c.compile_value(node))
        guard = col if guard is None else (guard | col)
    c.global_guard = guard
    if fused:
        out = c.apply_all(df, statements)
    else:
        out = df
        for s in statements:
            out = c._apply_stmt(out, parse_statement(s))
    return {
        r.id: (dict(r.attributes) if r.attributes is not None else None)
        for r in out.select("id", "attributes").collect()
    }


@pytest.mark.parametrize("chain_idx", range(len(CHAINS)))
def test_fused_equals_per_statement(spark, maps_df, chain_idx):
    chain = CHAINS[chain_idx]
    assert _run(maps_df, chain, fused=True) == _run(maps_df, chain, fused=False)


def test_fused_equals_per_statement_with_group_conditions(spark, maps_df):
    conds = ["severity_number >= 13"]
    for chain in CHAINS:
        assert _run(maps_df, chain, fused=True, conditions=conds) == _run(
            maps_df, chain, fused=False, conditions=conds
        )


def test_fusion_actually_engages(spark, maps_df):
    """Guard the guard: the first chain compiles through the fused path
    (single projection containing map_from_entries, no map_concat chain)."""
    c = Compiler(PathResolver(maps_df))
    out = c.apply_all(maps_df, CHAINS[0])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "map_from_entries" in plan


def test_xml_converter_run_fuses_and_matches(spark):
    """Consecutive XML set() statements over one source compile to ONE
    pandas UDF (single ArrowEvalPython / struct output) and produce exactly
    the per-statement results, including None for unparseable rows."""
    stmts = [
        "set(simplified, ParseSimplifiedXML(body))",
        'set(no_msg, RemoveXML(body, "/Log/Msg"))',
        'set(type_xml, GetXML(body, "/Log/Type"))',
        "set(attr_elems, ConvertAttributesToElementsXML(body))",
    ]
    df = spark.createDataFrame(
        [
            (1, '<Log id="7"><Type>warn</Type><Msg>m 1</Msg></Log>'),
            (2, "not xml at all <<<"),
            (3, None),
        ],
        "id long, body string",
    )
    c = Compiler(PathResolver(df))
    fused = c.apply_all(df, stmts)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1  # one UDF for the whole run

    c2 = Compiler(PathResolver(df))
    unfused = df
    for s in stmts:
        unfused = c2._apply_stmt(unfused, parse_statement(s))
    cols = ["id", "simplified", "no_msg", "type_xml", "attr_elems"]
    got = sorted(tuple(r) for r in fused.select(cols).collect())
    want = sorted(tuple(r) for r in unfused.select(cols).collect())
    assert got == want
    assert got[0][1] is not None  # row 1 parsed
    assert all(v is None for v in got[1][1:])  # bad xml → all None


def test_hash_converters_fuse_with_xml(spark):
    """The generalized Python-converter fusion: XML + exact-hash set()
    statements over one source share a single pandas UDF, with per-op
    results identical to the standalone per-statement wrappers (including
    the long-typed FNV)."""
    stmts = [
        "set(fnv, FNV(body))",
        "set(m3, Murmur3Hash(body))",
        "set(m128, Murmur3Hash128(body))",
        "set(x3, XXH3(body))",
        "set(x128, XXH128(body))",
        "set(simplified, ParseSimplifiedXML(body))",
    ]
    df = spark.createDataFrame(
        [
            (1, "<Log><Type>warn</Type></Log>"),
            (2, "plain text, not xml"),
            (3, None),
        ],
        "id long, body string",
    )
    c = Compiler(PathResolver(df))
    fused = c.apply_all(df, stmts)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1

    c2 = Compiler(PathResolver(df))
    unfused = df
    for s in stmts:
        unfused = c2._apply_stmt(unfused, parse_statement(s))
    cols = ["id", "fnv", "m3", "m128", "x3", "x128", "simplified"]
    got = {r.id: tuple(r)[1:] for r in fused.select(cols).collect()}
    want = {r.id: tuple(r)[1:] for r in unfused.select(cols).collect()}
    assert got == want
    assert isinstance(got[1][0], int)          # FNV stays long-typed
    assert got[2][5] == "{}"                   # fragment-wrapped text → empty map
    assert all(v is None for v in got[3])      # null input → all None
